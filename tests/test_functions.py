"""Text / dedup / similarity / multimodal function semantics on controlled
inputs (the pipeline-extension operators, BASELINE.json north-star)."""

import math
import os

import pytest
from pyspark.sql import functions as F

from sakura_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat", "a"),  # near dup
        (4, "completely different content about spark engines", "b"),
        (5, "", "b"),
        (6, "  The  QUICK   brown fox jumps over the lazy dog  ", "b"),  # canon dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_token_count(docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", text.token_count(F.col("text")).alias("n")).collect()}
    assert got[1] == 9 and got[5] == 0 and got[6] == 9


def test_quality_flags(docs):
    out = {r.doc_id: r for r in text.quality_flags(docs).collect()}
    assert out[1].quality_ok and not out[5].quality_ok
    assert out[5].digit_ratio == 0.0 and out[5].mean_token_len == 0.0
    assert 0 < out[1].stopword_ratio < 1


def test_lang_id_markers(spark):
    rows = [
        (1, "the cat and the dog of the house"),
        (2, "der hund und die katze ist hier"),
        (3, "le chat et les chiens est ici"),
        (4, "xyzzy plugh"),
        (5, "这是 中文 文本"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.lang for r in df.select("id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und", 5: "zh"}


def test_fingerprint_canonicalization(docs):
    fps = {r.doc_id: r.fp for r in docs.select("doc_id", text.fingerprint_md5(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] == fps[6]  # case/whitespace-insensitive
    assert fps[1] != fps[3]


def test_exact_dedup(docs):
    groups = dedup.exact_duplicates(docs, "doc_id").collect()
    by_rep = {r.doc_id: r.n_copies for r in groups}
    assert by_rep[1] == 3  # docs 1, 2, 6 collapse
    kept = dedup.dedup_exact(docs, "doc_id")
    assert kept.count() == 4 and kept.filter("doc_id = 2").count() == 0


def test_minhash_finds_near_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_candidate_pairs(docs, "doc_id").collect()}
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # 1-word edit: high jaccard
    assert not any(4 in p for p in pairs)  # unrelated doc stays out


def test_jaccard_pairs_exact_value(docs):
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_pairs(docs, "doc_id", group_col="source", threshold=0.01).collect()
    }
    assert out[(1, 2)] == 1.0
    # 9 tokens -> 7 distinct 3-shingles; only the final shingle ("the lazy
    # dog" vs "the lazy cat") differs -> inter=6, union=8.
    assert math.isclose(out[(1, 3)], 6 / 8)


def test_jaccard_unblocked_guard(spark, docs):
    """All-pairs jaccard without group_col refuses large inputs; the
    escape hatch and small inputs still work."""
    import pytest as _pytest

    big = spark.range(0, 20).selectExpr(
        "id as doc_id", "concat('w', id, ' x y z common tokens here') as text"
    )
    prev = dedup.JACCARD_UNBLOCKED_MAX_ROWS
    dedup.JACCARD_UNBLOCKED_MAX_ROWS = 10
    try:
        with _pytest.raises(ValueError, match="all-pairs"):
            dedup.jaccard_pairs(big, "doc_id")
        # Escape hatch for known-small candidate sets.
        dedup.jaccard_pairs(big, "doc_id", allow_unblocked=True).count()
    finally:
        dedup.JACCARD_UNBLOCKED_MAX_ROWS = prev
    # Under the limit: runs without the hatch.
    assert dedup.jaccard_pairs(docs, "doc_id", threshold=0.99).count() >= 1


def test_jaccard_selfjoin_matches_brute_force(spark):
    """Prefix filtering admits no false negatives: the exact self-join on
    a planted corpus equals a python brute force over all pairs, at two
    thresholds including an exact-boundary pair (J = 1/2)."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),   # near-dup of 1
        (3, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (4, "one two three four five six seven"),
        (5, "one two three four five six eight"),    # near-dup of 4
        (6, "totally unrelated text goes here now"),
        # J(7,8) = 2/4 = 1/2 exactly: shingle sets of size 3 sharing 2
        (7, "p q r s t"),
        (8, "p q r s u"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def brute(th):
        def sh(t):
            w = t.split()
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        out = {}
        for i, (ia, ta) in enumerate(rows):
            for ib, tb in rows[i + 1 :]:
                a, b = sh(ta), sh(tb)
                inter = len(a & b)
                uni = len(a | b)
                if uni and inter * th[1] >= uni * th[0]:
                    out[(ia, ib)] = inter / uni
        return out

    for th in [(1, 2), (9, 10)]:
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.jaccard_selfjoin(df, "doc_id", threshold=th).collect()
        }
        assert got == brute(th), th
    # boundary pair is present at exactly 1/2
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_selfjoin(df, "doc_id", threshold=(1, 2)).collect()
    }
    assert got[(7, 8)] == 0.5


def test_jaccard_selfjoin_hot_bucket_guard(spark):
    """An exact operator must fail loudly, never drop candidates: a
    prefix bucket above max_prefix_bucket raises in-plan."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    rows = [(i, "same exact shared text here") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with _pytest.raises(Exception, match="max_prefix_bucket|RAISE_ERROR|Py4J"):
        dedup.jaccard_selfjoin(
            df, "doc_id", threshold=(1, 2), max_prefix_bucket=5
        ).count()
    # within bound it runs: all 66 pairs at J=1.0
    out = dedup.jaccard_selfjoin(
        df, "doc_id", threshold=(1, 2), max_prefix_bucket=12
    ).collect()
    assert len(out) == 66 and all(r.jaccard == 1.0 for r in out)


def test_jaccard_selfjoin_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.jaccard_selfjoin(df, "doc_id", threshold=(3, 2))
    with _pytest.raises(ValueError):
        dedup.jaccard_selfjoin(df, "doc_id", threshold=(0, 1))


def test_duplicate_clusters_connected_components(spark):
    """Min-label propagation finds components, including a chain needing
    multiple passes; singletons (no edges) are absent by construction."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r.id: r.cluster for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_clusters_long_chain_converges_logarithmically(spark):
    """Pointer doubling: a 64-node path needs ~log2(64) passes, well under
    the default cap of 10 (plain propagation would need 63).
    driver_max_pairs=0 forces the DISTRIBUTED path — the default would
    route a graph this small through the driver union-find."""
    n = 64
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r.id: r.cluster
        for r in dedup.duplicate_clusters(pairs, driver_max_pairs=0).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_duplicate_clusters_raises_on_iteration_cap(spark):
    """Exhausting the cap with labels still moving must raise, never
    silently return a split clustering."""
    import pytest

    from sakura_spark import errors

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "id_a long, id_b long"
    )
    with pytest.raises(errors.ConvergenceError):
        dedup.duplicate_clusters(pairs, max_iterations=2, driver_max_pairs=0)


def test_dedup_near_end_to_end(docs):
    """Full pipeline: LSH candidates -> jaccard verify -> components ->
    min-id representative survives."""
    kept = {r.doc_id for r in dedup.dedup_near(docs, "doc_id").collect()}
    # 1,2,6 exact/canonical dups and 3 a near-dup: representative 1 stays.
    assert 1 in kept
    assert 2 not in kept and 3 not in kept
    assert 4 in kept and 5 in kept  # unrelated and empty docs untouched


def test_simhash_hamming(docs):
    cands = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_candidates(docs, "doc_id", prefix_bits=8).collect()
    }
    assert cands.get((1, 2)) == 0  # identical -> same signature


def test_cosine_topk_orders_by_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = [r.vec_id for r in similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=3).collect()]
    assert got == [0, 1, 2]
    sims = {r.vec_id: r.cosine_sim for r in similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=4).collect()}
    assert math.isclose(sims[0], 1.0) and math.isclose(sims[3], -1.0)


def test_ann_lsh_recall_on_clusters(spark):
    from sakura_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, [float(x) for x in q], k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.ann_lsh_topk(emb, [float(x) for x in q], k=10).collect()
    ]
    # multiprobe LSH should recover a majority of the true top-10
    assert len(set(exact) & set(approx)) >= 5


def test_ivf_probe_ids_tie_rule():
    """Probe selection orders by (distance, id): ties break to the lower
    cell id — the same first-match rule as ivf_assign's argmin, and the
    contract the generated SQL oracles rely on."""
    cents = [[0.0, 0.0], [0.0, 0.0], [1.0, 0.0]]
    assert similarity.ivf_probe_ids([0.0, 0.0], cents, 2) == [0, 1]
    assert similarity.ivf_probe_ids([1.0, 0.0], cents, 1) == [2]
    assert similarity.ivf_probe_ids([0.6, 0.0], cents, 3) == [2, 0, 1]


def test_ann_ivf_recall_on_clusters(spark):
    from sakura_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qv = [float(x) for x in q]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, qv, k=10).collect()]
    approx = [
        r.vec_id
        for r in similarity.ann_ivf_topk(emb, qv, k=10, n_centroids=8, n_probe=3).collect()
    ]
    assert len(set(exact) & set(approx)) >= 5
    # determinism: same seeding/iteration → identical result set
    again = [
        r.vec_id
        for r in similarity.ann_ivf_topk(emb, qv, k=10, n_centroids=8, n_probe=3).collect()
    ]
    assert approx == again


def test_ivf_assign_partitions_every_vector(spark):
    rows = [(i, [float(i % 3), float(i % 5)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.ivf_train(df, n_centroids=3, iters=2)
    assert len(cents) == 3 and all(len(c) == 2 for c in cents)
    assigned = similarity.ivf_assign(df, cents)
    assert assigned.count() == 30
    ids = {r.cluster_id for r in assigned.select("cluster_id").distinct().collect()}
    assert ids <= {0, 1, 2}


def test_ivf_assign_paths_agree(spark):
    """The literal expression-tree path and the Arrow/BLAS broadcast path
    must produce the SAME assignment on real embeddings, at a small k and
    at a k past the auto-switch point — including the ties-to-lowest-index
    contract (checked with a duplicated centroid)."""
    from sakura_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    rows = emb.limit(200).collect()
    vecs = [[float(x) for x in r["embedding"]] for r in rows]

    for k in (8, 150):
        cents = vecs[:k]
        got = {}
        for method in ("literal", "broadcast"):
            got[method] = {
                r["vec_id"]: r["cluster_id"]
                for r in similarity.ivf_assign(emb, cents, method=method).collect()
            }
        assert got["literal"] == got["broadcast"], f"paths diverge at k={k}"

    # Duplicate centroid: every point equidistant from cents[0] and its
    # copy appended at the END — both paths must pick the lower index, so
    # the duplicate index never appears.
    dup = vecs[:4] + [vecs[0]]
    for method in ("literal", "broadcast"):
        hit = (
            similarity.ivf_assign(emb, dup, method=method)
            .filter(F.col("cluster_id") == len(dup) - 1)
            .count()
        )
        assert hit == 0, f"{method} path broke ties away from lowest index"


def test_ivf_assign_auto_switch_and_large_k_plan(spark):
    """Past IVF_ASSIGN_LITERAL_MAX_K the auto path must be the Arrow
    kernel: the physical plan carries an ArrowEvalPython stage, stays
    map-only (no Exchange), and — the round-7 scale-killer — contains NO
    O(k*dim) literal subtree: its size must not grow with k (asserted at
    k=4096, SemDeDup's auto-k regime at corpus scale)."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim = 64
    big_cents = rng.rand(4096, dim).tolist()
    rows = [(i, rng.rand(dim).tolist()) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    auto = similarity.ivf_assign(df, big_cents)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, "auto path at k=4096 is not the Arrow kernel"
    assert "Exchange" not in plan  # map-only: scan -> eval -> project
    assert len(plan) < 20_000, f"plan grew with k ({len(plan)} chars)"
    # And it actually computes: every vector lands in a real cell.
    assert auto.filter(F.col("cluster_id").isNull()).count() == 0
    assert auto.count() == 10


def test_pq_exact_on_codebook_vectors(spark):
    """Vectors built FROM the codebook entries quantize with zero error,
    so ADC distances are exact and pq_search must equal brute-force
    cosine order on these l2-normalized inputs — a determinism-proof
    exactness oracle (no recall threshold to tune)."""
    import itertools

    # 2 subspaces x 2 dims; vectors = concatenations of 4 codewords each.
    words = [[1.0, 0.0], [0.0, 1.0], [0.6, 0.8], [0.8, 0.6]]
    rows = [
        (i, a + b)
        for i, (a, b) in enumerate(itertools.product(words, words))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = similarity.pq_train(df, m=2, k=4, iters=3)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    codes = {r.vec_id: list(r.codes) for r in similarity.pq_encode(df, books).collect()}
    assert all(len(c) == 2 for c in codes.values())
    # Zero quantization error: decoding the codes reproduces the vector.
    for vid, vec in rows:
        decoded = books[0][codes[vid][0]] + books[1][codes[vid][1]]
        # abs_tol covers float32 storage of the embedding column
        # (0.6 -> 0.60000002384...), not quantization error.
        assert all(math.isclose(a, b, abs_tol=1e-6) for a, b in zip(decoded, vec))
    q = [1.0, 0.0, 0.0, 1.0]
    exact = [
        r.vec_id
        for r in similarity.cosine_topk(df, q, k=4).collect()
    ]
    approx = [r.vec_id for r in similarity.pq_search(df, q, books, k=4).collect()]
    # Same top-1; the full sets agree modulo exact-tie ordering.
    assert approx[0] == exact[0]
    assert set(approx) == set(exact)


def test_pq_search_is_map_only(spark):
    rows = [(i, [float(i % 3), float(i % 5), float(i % 7), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = similarity.pq_train(df, m=2, k=4, iters=1)
    plan = (
        similarity.pq_search(df, [0.0, 1.0, 2.0, 3.0], books, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan  # codebooks are literals
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort
    assert similarity.pq_search(df, [0.0, 1.0, 2.0, 3.0], books, k=5).count() == 5


def test_embedding_near_dup_pairs(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.999, 0.001]), (2, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in similarity.embedding_near_dup_pairs(df, dim=2, threshold=0.99).collect()}
    assert (0, 1) in pairs and not any(2 in p for p in pairs)


def test_multimodal_metadata_and_features(docs):
    with_bin = multimodal.with_binary_payload(docs)
    meta = {r.doc_id: r for r in multimodal.extract_metadata(with_bin).collect()}
    assert meta[1].n_bytes == len("the quick brown fox jumps over the lazy dog".encode())
    assert meta[1].content_md5 == meta[2].content_md5
    assert meta[5].n_bytes == 0
    feats = multimodal.fake_image_features(with_bin).collect()
    assert all(len(r.features) == 8 for r in feats)
    # deterministic: same payload -> same features
    by_id = {r.doc_id: tuple(r.features) for r in feats}
    assert by_id[1] == by_id[2]


def test_image_dims_header_sniffing(spark):
    """Real header parsing: handcrafted PNG/GIF/BMP/JPEG bytes yield the
    right format and dimensions; garbage yields NULLs."""
    import struct

    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + struct.pack(">II", 640, 480) + b"\x08\x06" + b"\x00" * 10
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 100, -50) + b"\x00" * 10
    jpeg = (
        b"\xff\xd8"                                  # SOI
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9  # APP0
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 768, 1024) + b"\x00" * 10  # SOF0
    )
    rows = [(1, png), (2, gif), (3, bmp), (4, jpeg), (5, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.format, r.width, r.height) for r in multimodal.image_dims(df).collect()}
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("gif", 320, 200)
    assert got[3] == ("bmp", 100, 50)  # negative (top-down) height -> abs
    assert got[4] == ("jpeg", 1024, 768)
    assert got[5] == (None, None, None)


def test_audio_info_wav_header(spark):
    """Real WAV header parsing: a handcrafted 16-bit stereo 8kHz file with
    a 1-second data chunk yields exact metadata; non-WAV yields NULLs."""
    import struct

    channels, rate, bits = 2, 8000, 16
    byte_rate = rate * channels * bits // 8
    data = b"\x00" * byte_rate  # exactly 1 second
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * bits // 8, bits)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame([(1, wav), (2, b"mp3 junk")], "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.audio_info(df).collect()}
    assert (got[1].format, got[1].channels, got[1].sample_rate) == ("wav", 2, 8000)
    assert abs(got[1].duration_s - 1.0) < 1e-9
    assert got[2].format is None and got[2].duration_s is None


def test_png_roundtrip_and_filters():
    """_png_decode is a real decoder: encode->decode round-trips exactly,
    and scanlines filtered with each PNG filter type (Sub/Up/Average/Paeth,
    applied manually here — independent of the encoder, which only emits
    filter 0) are recovered bit-exactly."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(5, 4, ch), dtype=np.uint8)
        back = multimodal._png_decode(multimodal._png_encode(arr))
        assert np.array_equal(back, arr)

    # Hand-filter a known image with every filter type and check recovery.
    arr = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    h, w, nch = arr.shape
    stride = w * nch
    flat = arr.reshape(h, stride).astype(int)
    raw = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        prev = flat[y - 1] if y else np.zeros(stride, dtype=int)
        line = flat[y]
        filtered = np.empty(stride, dtype=int)
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            up = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (a + up) >> 1
            else:
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
            filtered[i] = (line[i] - pred) & 0xFF
        raw += bytes([ftype]) + bytes(filtered.tolist())

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal._png_decode(png), arr)

    # Known external PNG (the canonical 1x1 RGBA data-URI pixel) decodes.
    import base64

    one_px = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
        "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    assert multimodal._png_decode(one_px).shape == (1, 1, 4)


def test_multimodal_decode_real_png_and_null_fallback(docs, spark):
    """decode_image really decodes PNG payloads on executors (dims match
    the source array) and yields NULL dims for non-image payloads instead
    of failing the batch."""
    import numpy as np

    rng = np.random.default_rng(11)
    png = multimodal._png_encode(rng.integers(0, 256, (6, 9, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, png), (2, b"plain text bytes")], "doc_id long, payload binary"
    )
    got = {r.doc_id: r for r in multimodal.decode_image(df).collect()}
    assert (got[1].height, got[1].width, got[1].channels) == (6, 9, 3)
    assert got[2].height is None and got[2].channels is None


def test_frame_sample_plan(docs):
    with_bin = multimodal.with_binary_payload(docs)
    out = multimodal.frame_sample_plan(with_bin, every_n=10)
    # doc 1 is 43 bytes -> 1 fake frame -> only index 0 sampled
    assert [r.frame_index for r in out.filter("doc_id = 1").collect()] == [0]


def test_resize_real_png_and_fake(docs, spark):
    """resize_image does real pixel work for PNG: the output payload is a
    valid PNG at the target dims whose pixels are the nearest-neighbour
    sample of the source; non-PNG payloads yield NULL payloads. The
    deterministic fake keeps the identical schema for non-PNG pipelines."""
    import numpy as np

    with_bin = multimodal.with_binary_payload(docs)
    real = multimodal.resize_image(with_bin, 4, 4)
    fake = multimodal.fake_resize_image(with_bin, 4, 4)
    assert real.schema == fake.schema
    # Text payloads are not PNGs -> NULL payload rows, batch survives.
    assert all(r.payload is None for r in real.limit(5).collect())

    rng = np.random.default_rng(3)
    src = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, multimodal._png_encode(src))], "doc_id long, payload binary"
    )
    out = multimodal.resize_image(df, 4, 4).collect()[0]
    assert (out.width, out.height) == (4, 4)
    resized = multimodal._png_decode(bytes(out.payload))
    # nearest-neighbour 2x downsample == every second row/col of the source
    assert np.array_equal(resized, src[::2, ::2])

    rows = {r.doc_id: r for r in fake.collect()}
    assert all(len(r.payload) == 16 and r.width == 4 for r in rows.values())
    assert bytes(rows[1].payload) == bytes(rows[2].payload)  # same content


def test_audio_chunk_plan(docs):
    with_bin = multimodal.with_binary_payload(docs)
    out = multimodal.audio_chunk_plan(with_bin, chunk_ms=2, bytes_per_ms=16)
    # doc 1 is 43 bytes -> ceil fake duration 3ms -> chunks [0,2) [2,3)
    got = sorted(
        (r.chunk_index, r.start_ms, r.end_ms)
        for r in out.filter("doc_id = 1").collect()
    )
    assert got == [(0, 0, 2), (1, 2, 3)]


def test_winnowing_fingerprint(docs):
    out = docs.select("doc_id", text.winnowing_fingerprint(F.col("text")).alias("wf")).collect()
    by_id = {r.doc_id: tuple(r.wf) for r in out}
    # 9 tokens, window 8 -> 2 rolling hashes; keep=4 keeps both
    assert by_id[1] == by_id[2] and len(by_id[1]) == 2
    assert by_id[5] == ()


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org then 10.0.0.1 and 555-123-4567 done"),
            (2, "clean text with no identifiers at all"),
            (3, "two mails x@y.io z@w.co one ip 192.168.1.255"),
        ],
        "id long, t string",
    )
    counts = text.pii_counts(F.col("t"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            counts["email_hits"].alias("e"),
            counts["ip_hits"].alias("i"),
            counts["phone_hits"].alias("p"),
            text.redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert (out[1].e, out[1].i, out[1].p) == (1, 1, 1)
    assert out[1].red == "mail <EMAIL> then <IP> and <PHONE> done"
    assert (out[2].e, out[2].i, out[2].p) == (0, 0, 0)
    assert out[2].red == "clean text with no identifiers at all"
    assert (out[3].e, out[3].i) == (2, 1)
    assert out[3].red == "two mails <EMAIL> <EMAIL> one ip <IP>"


def test_quantize_int8_roundtrip_and_edges(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0]), (3, [2.0])],
        "id long, v array<double>",
    )
    q, scale = similarity.quantize_int8(F.col("v"))
    rows = {r.id: r for r in df.select("id", q.alias("q"), scale.alias("s")).collect()}
    # max|x|=1.0 -> scale 127; codes floor(x*127+0.5)
    assert rows[1].s == 127.0
    assert rows[1].q == [64, -127, 32]
    # all-zero vector: scale 0, zero codes (no NaN)
    assert rows[2].s == 0.0 and rows[2].q == [0, 0, 0]
    assert rows[3].q == [127]
    # dequantized values stay within half a quantization step
    for code, orig in zip(rows[1].q, [0.5, -1.0, 0.25]):
        assert abs(code / 127.0 - orig) <= 0.5 / 127.0


def test_l2_normalize(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id long, v array<double>")
    rows = {
        r.id: r.n for r in df.select("id", similarity.l2_normalize(F.col("v")).alias("n")).collect()
    }
    assert rows[1] == [0.6, 0.8]
    assert rows[2] == [0.0, 0.0]  # zero vector passes through


def test_type_token_ratio_flags_repetition(spark):
    """Planted boilerplate (one word repeated) scores near 0; fully
    diverse text scores 1.0; empty text yields NULL ratio."""
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "eight distinct words appear in this exact sentence"),
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in text.type_token_ratio(df).collect()}
    assert got[1].n_words == 8 and got[1].n_types == 1
    assert abs(got[1].ttr - 0.125) < 1e-12
    assert got[2].ttr == 1.0
    assert got[3].n_words == 0 and got[3].ttr is None


def test_gif_roundtrip_and_external_fixture():
    """_gif_decode is a real LZW decoder: our encoder's output (palette +
    uncompressed-LZW with periodic clear codes) round-trips pixel-exactly,
    including images big enough to cross sub-block and clear-code
    boundaries; the canonical external 1x1 GIF decodes; an interlaced
    variant deinterlaces correctly."""
    import base64
    import struct

    import numpy as np

    rng = np.random.default_rng(5)
    # <=256 unique colors via a coarse palette; 40x37 crosses several
    # 250-literal clear-code windows and 255-byte sub-blocks.
    arr = (rng.integers(0, 6, size=(37, 40, 3)) * 40).astype(np.uint8)
    back = multimodal._gif_decode(multimodal._gif_encode(arr))
    assert np.array_equal(back, arr)

    # grayscale input encodes as RGB
    g = rng.integers(0, 5, size=(4, 4), dtype=np.uint8) * 50
    back_g = multimodal._gif_decode(multimodal._gif_encode(g))
    assert np.array_equal(back_g, np.stack([g] * 3, axis=-1))

    # external fixture: the canonical 1x1 transparent GIF
    one_px = base64.b64decode(
        "R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
    )
    assert multimodal._gif_decode(one_px).shape == (1, 1, 3)

    # interlaced: set the interlace flag and reorder rows into pass order;
    # the decoder must undo it.
    plain = multimodal._gif_encode(arr)
    ih = arr.shape[0]
    order = []
    for start, step in multimodal._GIF_INTERLACE_PASSES:
        order.extend(range(start, ih, step))
    reordered = arr[np.array(order)]
    inter = bytearray(multimodal._gif_encode(reordered))
    # image descriptor sits right after header(13) + GCT(768); flag byte is
    # descriptor offset + 9
    flag_at = 13 + 768 + 9
    assert inter[flag_at] == 0
    inter[flag_at] = 0x40
    got = multimodal._gif_decode(bytes(inter))
    assert np.array_equal(got, arr)


def test_gif_budget_and_frame_coverage_guards():
    """Hostile-GIF guards run before LZW expansion: declared dims above the
    shared decode budget raise immediately (no multi-GB index allocation),
    and a first frame that doesn't cover the logical screen (offset or
    smaller dims, where frame pixels would misrepresent the image) stays on
    the DecodeUnavailable stub path."""
    import struct
    import time

    import numpy as np

    # 65535x65535 declared dims, tiny LZW stream claiming to expand huge.
    bomb = bytearray(b"GIF89a")
    bomb += struct.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)  # GCT, 2 entries
    bomb += b"\x00\x00\x00\xff\xff\xff"  # 2-color table
    bomb += struct.pack("<BHHHHB", 0x2C, 0, 0, 65535, 65535, 0)
    bomb += b"\x02"  # min code size
    bomb += b"\x01\x00"  # one empty-ish sub-block
    bomb += b"\x00\x3b"
    t0 = time.monotonic()
    with pytest.raises(multimodal.DecodeUnavailable, match="decode budget"):
        multimodal._gif_decode(bytes(bomb))
    assert time.monotonic() - t0 < 2.0  # header-parse cost, not expansion

    # Valid payload, then shrink/offset the first frame's descriptor: the
    # decoder must refuse rather than return non-screen dims.
    arr = (np.arange(48, dtype=np.uint8).reshape(4, 4, 3) * 5) % 250
    raw = bytearray(multimodal._gif_encode(arr))
    desc_at = 13 + 768  # header + 256-entry GCT
    assert raw[desc_at] == 0x2C
    raw[desc_at + 1 : desc_at + 9] = struct.pack("<HHHH", 1, 1, 2, 2)
    with pytest.raises(multimodal.DecodeUnavailable, match="logical screen"):
        multimodal._gif_decode(bytes(raw))


def test_jpeg_roundtrip_known_pixels():
    """_jpeg_decode is a real baseline JPEG decoder. Our encoder uses
    all-ones quant tables, so the only loss is DCT float rounding: flat
    blocks round-trip EXACTLY, arbitrary content within +/-2, grayscale
    and 4:4:4 color both supported; 4:2:0 exercises chroma upsampling
    (lossy by design — tolerance reflects subsampling). The sniffer's SOF
    dims must agree with the decoded array."""
    import numpy as np

    rng = np.random.default_rng(11)
    x = np.linspace(0, 255, 20)
    g = np.clip(np.add.outer(np.linspace(0, 200, 17), x) // 2, 0, 255).astype(np.uint8)
    rgb = np.stack([g, 255 - g, g // 2 + 60], axis=-1).astype(np.uint8)

    enc = multimodal._jpeg_encode(rgb)
    dec = multimodal._jpeg_decode(enc)
    assert dec.shape == (17, 20, 3)
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 2
    fmt, w, h = multimodal._sniff_image(enc)
    assert (fmt, w, h) == ("jpeg", 20, 17)

    # flat color: DC-only blocks, bit-exact round-trip
    flat = np.full((16, 24, 3), 77, np.uint8)
    assert (multimodal._jpeg_decode(multimodal._jpeg_encode(flat)) == flat).all()

    # grayscale single-component scan
    decg = multimodal._jpeg_decode(multimodal._jpeg_encode(g))
    assert decg.shape == (17, 20, 1)
    assert int(np.abs(decg[:, :, 0].astype(int) - g.astype(int)).max()) <= 2

    # random noise (worst case for rounding): still tight
    noise = rng.integers(0, 256, (13, 11, 3), dtype=np.uint8)
    dn = multimodal._jpeg_decode(multimodal._jpeg_encode(noise))
    assert int(np.abs(dn.astype(int) - noise.astype(int)).max()) <= 3

    # 4:2:0 chroma subsampling: luma near-exact, chroma smoothed
    d420 = multimodal._jpeg_decode(multimodal._jpeg_encode(rgb, subsample=True))
    assert d420.shape == (17, 20, 3)
    y_in = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    y_out = 0.299 * d420[..., 0] + 0.587 * d420[..., 1] + 0.114 * d420[..., 2]
    assert float(np.abs(y_in - y_out).max()) <= 4.0


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn path: encoding with restart markers (byte-aligned RST0-7
    every N MCUs, DC predictors reset per T.81) must decode to the same
    pixels as the marker-free stream — exercises the decoder's vectorized
    restart-split and per-segment predictor reset, including marker-index
    wraparound past RST7 (interval 1 over >8 MCUs) and stuffed 0xFF00
    bytes adjacent to markers."""
    import numpy as np

    rng = np.random.default_rng(23)
    # 40x32 grayscale -> 5x4 = 20 MCUs; interval 3 ends mid-stream with a
    # partial final segment, interval 1 wraps RST0..RST7 twice.
    g = rng.integers(0, 256, (32, 40), dtype=np.uint8)
    plain = multimodal._jpeg_decode(multimodal._jpeg_encode(g))
    for interval in (1, 3, 7):
        enc = multimodal._jpeg_encode(g, restart_interval=interval)
        assert b"\xff\xdd" in enc  # DRI segment present
        assert (multimodal._jpeg_decode(enc) == plain).all()

    # Color 4:2:0 with restarts: bigger MCUs, same pixels as marker-free.
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    plain_c = multimodal._jpeg_decode(multimodal._jpeg_encode(rgb, subsample=True))
    enc_c = multimodal._jpeg_encode(rgb, subsample=True, restart_interval=2)
    assert (multimodal._jpeg_decode(enc_c) == plain_c).all()


def test_jpeg_unsupported_modes_and_guards():
    """Boundary behavior: arithmetic coding (SOF9) raises DecodeUnavailable
    (the remaining documented stub — progressive SOF2 is now REAL),
    truncated entropy data raises rather than returning garbage, and
    declared dims above the budget bail before any allocation."""
    import struct

    import numpy as np

    base = multimodal._jpeg_encode(np.full((8, 8), 9, np.uint8))
    # Rewrite SOF0 -> SOF9 (arithmetic sequential): find the FFC0 marker.
    arith = bytearray(base)
    i = arith.find(b"\xff\xc0")
    assert i > 0
    arith[i + 1] = 0xC9
    with pytest.raises(multimodal.DecodeUnavailable, match="arithmetic"):
        multimodal._jpeg_decode(bytes(arith))

    # A baseline stream merely RELABELED SOF2 is not a valid progressive
    # stream (its single scan has Ss=0, Se=63 — an illegal progressive
    # band): the decoder must reject it, not misdecode it.
    prog = bytearray(base)
    prog[i + 1] = 0xC2
    with pytest.raises(multimodal.DecodeUnavailable, match="spectral"):
        multimodal._jpeg_decode(bytes(prog))

    # Truncated scan: drop the tail of the entropy data.
    with pytest.raises(multimodal.DecodeUnavailable):
        multimodal._jpeg_decode(base[:-6])

    # Budget: huge declared dims bail at header-parse time.
    bomb = bytearray(base)
    i = bomb.find(b"\xff\xc0")
    bomb[i + 5 : i + 9] = struct.pack(">HH", 65000, 65000)
    with pytest.raises(multimodal.DecodeUnavailable, match="decode budget"):
        multimodal._jpeg_decode(bytes(bomb))


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Progressive (SOF2) decode is REAL: the progressive encoder uses the
    same all-ones quant tables and DCT as the baseline encoder, so the
    quantized coefficients are identical and the progressive round-trip
    must reproduce the baseline round-trip's pixels EXACTLY — across
    grayscale/RGB, 4:2:0 subsampling, non-multiple-of-8 dims, flat images
    (multi-block EOB runs), and sparse images (ZRL + EOBRUN interplay).
    The scan script covers every decoder path: DC first/refine,
    AC first per band, AC refinement with buffered correction bits."""
    import numpy as np

    rng = np.random.RandomState(42)
    grad = np.zeros((20, 17, 3), np.uint8)
    for i in range(20):
        for j in range(17):
            grad[i, j] = [(i * 12) % 256, (j * 15) % 256, (i + j) % 256]
    sparse = np.zeros((32, 32), np.uint8)
    sparse[5, 7] = 255
    sparse[20, 29] = 128
    cases = [
        (np.full((24, 24), 100, np.uint8), False),   # flat: EOB runs
        (grad, False),
        (grad, True),                                 # 4:2:0 chroma
        (rng.randint(0, 256, (16, 16)).astype(np.uint8), False),
        (rng.randint(0, 256, (17, 9, 3)).astype(np.uint8), False),
        (sparse, False),                              # ZRL + EOBRUN
    ]
    for img, sub in cases:
        enc = multimodal._jpeg_encode_progressive(img, subsample=sub)
        fmt, w, h = multimodal._sniff_image(enc)
        assert fmt == "jpeg" and (h, w) == img.shape[:2]
        base = multimodal._jpeg_decode(multimodal._jpeg_encode(img, subsample=sub))
        prog = multimodal._jpeg_decode(enc)
        assert prog.shape == base.shape
        assert (prog == base).all(), "progressive decode diverged from baseline"


_EXTERNAL_JPEGS = [
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/site-packages/IPython/core/tests/2x2.jpg",
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/test/imghdrdata/python.jpg",
]


@pytest.mark.skipif(
    not all(os.path.exists(p) for p in _EXTERNAL_JPEGS),
    reason="external JPEG fixtures not present on this machine",
)
def test_jpeg_decodes_external_files():
    """Cross-encoder validation: files produced by standard encoders
    (their own Huffman/quant tables, JFIF markers, possibly subsampled)
    decode to arrays whose dims match the SOF header — guards against a
    self-consistent-but-wrong convention between our encoder and decoder."""
    for p in _EXTERNAL_JPEGS:
        with open(p, "rb") as fh:
            b = fh.read()
        fmt, w, h = multimodal._sniff_image(b)
        assert fmt == "jpeg"
        arr = multimodal._jpeg_decode(b)
        assert arr.shape[0] == h and arr.shape[1] == w
        assert arr.shape[2] in (1, 3)


def test_decode_image_mixed_formats(spark):
    """decode_image over a mixed PNG/GIF/JPEG corpus: every row decodes to
    real dims (no NULLs), channels reflect the container (PNG/JPEG gray=1,
    GIF normalizes to RGB=3)."""
    import numpy as np  # noqa: F401

    rows = [(i, f"doc number {i}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    imgs = multimodal.synthetic_image_payload(df, formats=("png", "gif", "jpeg"))
    got = {r.doc_id: r for r in multimodal.decode_image(imgs).collect()}
    assert len(got) == 12
    for i in range(12):
        r = got[i]
        assert (r.height, r.width) == (8, 8)
        assert r.channels == (3 if i % 3 == 1 else 1)


def test_decode_resize_report_matches_unfused(spark):
    """The fused map-only decode_resize_report must return exactly what
    the unfused decode_image(imgs) JOIN decode_image(resize_image(imgs))
    composition returns — same dims, same NULL rows for undecodable
    payloads — while evaluating the payload subtree once and shuffling
    nothing."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [
        (1, multimodal._png_encode(rng.integers(0, 256, (9, 6, 3), dtype=np.uint8))),
        (2, multimodal._gif_encode((rng.integers(0, 4, (5, 7, 3)) * 60).astype(np.uint8))),
        (3, multimodal._jpeg_encode(rng.integers(0, 256, (10, 12), dtype=np.uint8))),
        (4, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fused = {
        r.doc_id: (r.height, r.width, r.channels, r.r_height, r.r_width)
        for r in multimodal.decode_resize_report(df, 4, 3).collect()
    }
    decoded = multimodal.decode_image(df)
    resized = multimodal.decode_image(
        multimodal.resize_image(df, 4, 3).select("doc_id", "payload")
    )
    unfused = {}
    for d in decoded.collect():
        unfused[d.doc_id] = (d.height, d.width, d.channels)
    for r in resized.collect():
        unfused[r.doc_id] = unfused[r.doc_id] + (r.height, r.width)
    assert fused == unfused
    assert fused[1] == (9, 6, 3, 3, 4)
    assert fused[4] == (None, None, None, None, None)
    # map-only: the fused plan contains no Exchange
    plan = (
        multimodal.decode_resize_report(df, 4, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_decode_image_handles_gif(spark):
    import numpy as np

    rng = np.random.default_rng(9)
    arr = (rng.integers(0, 4, size=(5, 7, 3)) * 60).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, multimodal._gif_encode(arr)), (2, b"not an image")],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in multimodal.decode_image(df).collect()}
    assert (got[1].height, got[1].width, got[1].channels) == (5, 7, 3)
    assert got[2].height is None
    # resize normalizes GIF input to a PNG payload at the target dims
    out = multimodal.resize_image(df, 3, 3).filter("doc_id = 1").collect()[0]
    resized = multimodal._png_decode(bytes(out.payload))
    assert resized.shape == (3, 3, 3)


def test_decode_pixels_never_leaks_raw_exceptions():
    """The executor-side contract is 'decode or DecodeUnavailable' — a
    corrupt container (flipped bytes, truncations, lying lengths) must
    never surface zlib/struct/numpy errors that would fail a whole Arrow
    batch. Fuzz: random mutations of valid PNG/GIF payloads plus random
    prefixes with valid magic bytes."""
    import numpy as np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    rng = np.random.default_rng(13)
    png = multimodal._png_encode(rng.integers(0, 256, (6, 5, 3), dtype=np.uint8))
    gif = multimodal._gif_encode((rng.integers(0, 4, (6, 5, 3)) * 60).astype(np.uint8))

    @given(
        base=st.sampled_from(["png", "gif"]),
        cut=st.integers(min_value=0, max_value=200),
        flips=st.lists(
            st.tuples(st.integers(0, 10_000), st.integers(0, 255)), max_size=8
        ),
    )
    @settings(max_examples=80, deadline=None)
    def fuzz(base, cut, flips):
        raw = bytearray(png if base == "png" else gif)
        raw = raw[: max(1, len(raw) - cut)]
        for pos, val in flips:
            if raw:
                raw[pos % len(raw)] = val
        try:
            arr = multimodal._decode_pixels(bytes(raw))
            assert arr.ndim == 3  # survived mutation: still a pixel array
        except multimodal.DecodeUnavailable:
            pass  # the only acceptable failure mode

    fuzz()


def test_repetition_stats_known_counts(spark):
    """text.repetition_stats (Gopher repetition filters): duplicate-line
    counts and word/2-gram histogram peaks on a crafted corpus, including
    blank-line filtering, an empty document (all-zero row, not a missing
    row), and repeated bigrams."""
    rows = [
        (1, "the cat sat. the cat sat. the cat"),
        (2, "a\nb\na\n\n   \nc"),
        (3, ""),
        (4, "unique words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: tuple(r)[1:] for r in text.repetition_stats(df).collect()}
    # (n_lines, n_distinct_lines, n_words, max_word_count, n_bigrams, max_bigram_count)
    # doc 1: words [the cat sat]x2 + [the cat] -> 8 words, 'the'/'cat' x3;
    # bigrams: 'the cat' x3, 'cat sat' x2, 'sat the' x2 -> 7 total.
    assert got[1] == (1, 1, 8, 3, 7, 3)
    # doc 2: lines a/b/a/c after trimming + blank filtering.
    assert got[2] == (4, 3, 4, 2, 3, 1)
    assert got[3] == (0, 0, 0, 0, 0, 0)
    assert got[4] == (1, 1, 4, 1, 3, 1)


def test_lm_score_and_perplexity(spark):
    """text.lm_score integer hit statistics against a hand-computed LM,
    and text.lm_perplexity against a pure-Python reference of the same
    add-one-smoothed formula (top_v large enough that nothing prunes,
    then a tiny top_v to check pruning binds deterministically)."""
    import math as _math
    from collections import Counter

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "dogs bark"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def words_of(t):
        import re as _re
        return [w for w in _re.split(r"[^a-z0-9]+", t.lower()) if w]

    docs = {i: words_of(t) for i, t in rows}
    uni = Counter(w for ws in docs.values() for w in ws)
    bigrams = {i: [f"{a} {b}" for a, b in zip(ws, ws[1:])] for i, ws in docs.items()}
    bi = Counter(g for gs in bigrams.values() for g in gs)

    got = {r.doc_id: tuple(r)[1:] for r in text.lm_score(df, top_v=100).collect()}
    for i in (1, 2, 3, 4):
        gs = bigrams[i]
        expect = (
            len(gs),
            sum(1 for g in gs if bi[g] == 0),
            sum(bi[g] for g in gs),
            sum(uni[g.split(" ")[0]] for g in gs),
        )
        assert got[i] == expect, (i, got[i], expect)
    # every bigram in this corpus is seen (it came from the corpus)
    assert all(g[1] == 0 for g in got.values() if g[0] > 0)

    V = len(uni)
    perp = {r.doc_id: r for r in text.lm_perplexity(df, top_v=100).collect()}
    for i in (1, 2, 3):
        gs = bigrams[i]
        logps = [_math.log((bi[g] + 1.0) / (uni[g.split(" ")[0]] + float(V))) for g in gs]
        ce = -sum(logps) / len(logps)
        assert _math.isclose(perp[i].cross_entropy, ce, rel_tol=1e-12)
        assert _math.isclose(perp[i].perplexity, _math.exp(ce), rel_tol=1e-12)
    assert perp[4].cross_entropy is None and perp[4].n_bigrams == 0

    # pruning binds: top_v=2 keeps only the 2 most frequent grams
    # (count desc, gram asc); 'the' (3) and 'cat' (2) survive as contexts.
    pruned = {r.doc_id: tuple(r)[1:] for r in text.lm_score(df, top_v=2).collect()}
    top_uni = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:2])
    top_bi = dict(sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:2])
    for i in (1, 2, 3, 4):
        gs = bigrams[i]
        expect = (
            len(gs),
            sum(1 for g in gs if g not in top_bi),
            sum(top_bi.get(g, 0) for g in gs),
            sum(top_uni.get(g.split(" ")[0], 0) for g in gs),
        )
        assert pruned[i] == expect, (i, pruned[i], expect)


def test_remove_duplicated_spans_known_output(spark):
    """dedup.remove_duplicated_spans (ExactSubstr removal, token-level):
    a sentence shared verbatim by two docs is removed from BOTH (every
    token covered by a cross-doc duplicated 5-gram window); unique docs,
    too-short docs, and within-doc-only repetition are untouched;
    overlapping windows merge (no double counting)."""
    shared = "the quick brown fox jumps over the lazy dog"  # 9 words
    rows = [
        (1, shared + " extra tail words here"),
        (2, "prefix words go first " + shared),
        (3, "completely unrelated content about spark engines at scale"),
        (4, "too short"),
        (5, "rep rep rep rep rep rep rep rep"),  # within-doc repeats only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.remove_duplicated_spans(df, k=5).collect()}
    # Docs 1/2: the 5 shared 5-gram windows cover exactly the 9 shared
    # tokens (starts 0..4 merge into one [0,9) interval).
    assert (got[1].n_tokens, got[1].n_removed) == (13, 9)
    assert got[1].cleaned_text == "extra tail words here"
    assert (got[2].n_tokens, got[2].n_removed) == (13, 9)
    assert got[2].cleaned_text == "prefix words go first"
    assert got[3].n_removed == 0 and got[3].cleaned_text.startswith("completely")
    assert got[4] and got[4].n_removed == 0 and got[4].cleaned_text == "too short"
    assert got[5].n_removed == 0 and got[5].n_tokens == 8


def test_remove_duplicate_lines_global_first_wins(spark):
    """dedup.remove_duplicate_lines (C4-style): a line keeps only its
    corpus-wide first occurrence by (doc_id, position) — later docs lose
    it, within-doc repeats lose all but the first, blank/whitespace lines
    are dropped by normalization, and documents reassemble in original
    order."""
    rows = [
        (1, "alpha\nshared line\nbeta"),
        (2, "shared line\ngamma\nshared line"),  # loses both copies (doc 1 was first)
        (3, "delta\ndelta\n\n   \nepsilon"),  # within-doc repeat + blanks
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup.remove_duplicate_lines(df).collect()}
    assert (got[1].n_lines, got[1].n_kept) == (3, 3)
    assert got[1].cleaned_text == "alpha\nshared line\nbeta"
    assert (got[2].n_lines, got[2].n_kept) == (3, 1)
    assert got[2].cleaned_text == "gamma"
    assert (got[3].n_lines, got[3].n_kept) == (3, 2)
    assert got[3].cleaned_text == "delta\nepsilon"
    assert (got[4].n_lines, got[4].n_kept) == (0, 0) and got[4].cleaned_text == ""


def test_lm_perplexity_coherent_under_incoherent_pruning(spark):
    """The unigram and bigram tables prune independently, so a bigram can
    survive top-V while its context unigram is pruned (c2>0, c1=0).
    lm_perplexity clamps the context count to max(c1, c2) so smoothed
    probabilities stay <= 1: cross-entropy >= 0 and perplexity >= 1 even
    on corpora engineered to trigger the incoherence. Without the clamp,
    this corpus yields logp = ln((5+1)/(0+3)) > 0 and perplexity < 1."""
    # Fillers: 3 unigrams x count 10 each, in single-word docs (no
    # bigrams). Then 5 docs "x y": unigram counts x=5, y=5 are pruned at
    # top_v=3, but "x y" (count 5) is the ONLY bigram and survives.
    rows = [(i, f"w{i % 3}") for i in range(30)] + [
        (100 + j, "x y") for j in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.lm_perplexity(df, top_v=3).collect()}
    for j in range(5):
        r = out[100 + j]
        assert r.n_bigrams == 1
        # clamp: logp = ln((5+1)/(max(0,5)+3)) = ln(6/8) < 0
        assert math.isclose(r.cross_entropy, -math.log(6.0 / 8.0), rel_tol=1e-12)
        assert r.cross_entropy > 0 and r.perplexity > 1


def test_duplicated_span_stats_known_counts(spark):
    """dedup.duplicated_span_stats: cross-document k-gram overlap on a
    crafted corpus — a sentence shared verbatim by two docs is counted
    in both; unique and too-short docs report zeros; within-doc repeats
    alone do NOT count as duplicated (>= 2 distinct docs required);
    hashed=True returns identical statistics."""
    shared = "the quick brown fox jumps over the lazy dog"  # 9 words
    rows = [
        (1, shared + " extra tail words here"),
        (2, "prefix words here " + shared),
        (3, "completely unrelated content about spark engines at scale"),
        (4, "too short"),
        (5, "rep rep rep rep rep rep rep rep"),  # within-doc repeats only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: tuple(r)[1:] for r in dedup.duplicated_span_stats(df, k=5).collect()}
    # doc 1: 13 words -> 9 windows; doc 2: 12 words -> 8 windows.
    # Shared 9-word sentence -> 5 common 5-grams, present in both docs.
    assert got[1][0] == 9 and got[2][0] == 8
    assert got[1][2] == 5 and got[2][2] == 5  # n_dup_windows
    assert got[1][3] == 5 and got[2][3] == 5  # n_dup_distinct_grams
    assert got[3] == (4, 4, 0, 0)  # 8 unique words -> 4 unique windows
    assert got[4] == (0, 0, 0, 0)
    # 8x 'rep' -> 4 windows of the SAME gram, but only one doc has it.
    assert got[5] == (4, 1, 0, 0)
    hashed = {
        r.doc_id: tuple(r)[1:]
        for r in dedup.duplicated_span_stats(df, k=5, hashed=True).collect()
    }
    assert hashed == got


def test_normalize_text_cleanup_and_idempotence(spark):
    """text.normalize_text: CRLF unification, control strip, zero-width
    removal, Unicode-space folding, run collapse, paragraph-break limit,
    outer trim — and the fixpoint property (normalizing twice changes
    nothing), which guards against pass-ordering bugs."""
    messy = (
        "  \t​Title line\r\n\r\n\r\n\r\n"
        "body with\x07ctl­and emsp  \r"
        "last‍ line  "
    )
    df = spark.createDataFrame([(1, messy), (2, ""), (3, "already clean")],
                               "id long, text string")
    out = {r.id: r.n for r in df.select(
        "id", text.normalize_text(F.col("text")).alias("n")).collect()}
    assert out[1] == "Title line\n\nbody withctland emsp\nlast line"
    assert out[2] == ""
    assert out[3] == "already clean"
    again = {r.id: r.n2 for r in spark.createDataFrame(
        [(k, v) for k, v in out.items()], "id long, text string"
    ).select("id", text.normalize_text(F.col("text")).alias("n2")).collect()}
    assert again == out


def test_nfkc_normalize_compatibility_forms(spark):
    """text.nfkc_normalize (Arrow pandas UDF): ligatures, fullwidth forms,
    and compatibility digits fold to canonical forms; None passes through."""
    df = spark.createDataFrame(
        [(1, "ﬁle ＮＯ．２５"), (2, None), (3, "plain")],
        "id long, text string",
    )
    out = {r.id: r.nfkc_text for r in text.nfkc_normalize(df).collect()}
    assert out[1] == "file NO.25"
    assert out[2] is None
    assert out[3] == "plain"


def test_length_buckets_exact(spark):
    """curation.length_buckets: smallest fitting bucket, overflow class,
    integer pad accounting."""
    from sakura_spark.functions import curation

    rows = [
        (1, "one two three"),            # 3 tokens -> bucket 4
        (2, "a b c d"),                  # 4 tokens -> bucket 4
        (3, " ".join(["w"] * 7)),        # 7 tokens -> bucket 8
        (4, " ".join(["w"] * 20)),       # 20 tokens -> overflow (-1)
        (5, ""),                         # 0 tokens -> bucket 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.bucket: (r.n_docs, r.total_tokens, r.pad_tokens, r.max_tokens)
           for r in curation.length_buckets(df, boundaries=(4, 8, 16)).collect()}
    assert out[4] == (3, 7, 5, 4)
    assert out[8] == (1, 7, 1, 7)
    assert out[-1] == (1, 20, 0, 20)
    assert set(out) == {4, 8, -1}


def test_ivfpq_exact_on_planted_residuals(spark):
    """IVFADC with FIXED centroids/codebooks: vectors planted at
    centroid + codeword concatenations quantize with zero residual
    error, so the ADC distance equals the true L2 distance and the
    ranking equals brute force — exactness without recall thresholds."""
    import itertools

    cents = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 10.0, 10.0]]
    words = [[1.0, 0.0], [0.0, 1.0]]  # per 2-dim subspace, m=2
    books = [words, words]
    rows = []
    i = 0
    for c in cents:
        for a, b in itertools.product(words, words):
            res = a + b
            rows.append((i, [c[d] + res[d] for d in range(4)]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    enc = {r.vec_id: (r.cluster_id, list(r.codes))
           for r in similarity.ivfpq_encode(df, cents, books).collect()}
    for vid, vec in rows:
        cl, codes = enc[vid]
        decoded = [cents[cl][d] for d in range(4)]
        decoded = [
            x + y
            for x, y in zip(decoded, books[0][codes[0]] + books[1][codes[1]])
        ]
        assert decoded == list(map(float, vec)), (vid, decoded, vec)

    q = [0.9, 0.1, 0.2, 0.8]
    got = similarity.ann_ivfpq_topk(
        df, q, k=4, n_probe=1, rerank_factor=0, centroids=cents, codebooks=books
    ).collect()
    # probe 1 cell -> only cell-0 vectors; ADC == exact L2 on them
    def l2(v):
        return sum((a - b) ** 2 for a, b in zip(q, v))

    cell0 = sorted((l2(v), vid) for vid, v in rows[:4])
    assert [r.vec_id for r in got] == [vid for _, vid in cell0]
    for r in got:
        assert math.isclose(r.pq_dist, l2(dict(rows)[r.vec_id]), rel_tol=1e-9)


def test_ann_ivfpq_recall_and_determinism(spark):
    """End-to-end trained IVFADC on the synthetic embeddings: decent
    recall vs brute-force cosine (l2-normalized corpus -> L2 order is
    cosine order) and run-to-run determinism."""
    from sakura_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    exact = [r.vec_id for r in similarity.cosine_topk(emb, q, k=10).collect()]
    run = lambda: [
        r.vec_id
        for r in similarity.ann_ivfpq_topk(
            emb, q, k=10, n_centroids=8, n_probe=3, m=8, n_codes=32, rerank_factor=10
        ).collect()
    ]
    first = run()
    assert len(set(exact) & set(first)) >= 7
    assert first == run()


def test_ivfpq_encode_is_map_only(spark):
    rows = [(i, [float(i % 3), float(i % 5), float(i % 7), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[0.0] * 4, [5.0] * 4]
    books = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [2.0, 2.0]]]
    plan = (
        similarity.ivfpq_encode(df, cents, books)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # codebooks are literals; no shuffle
    search = similarity.ann_ivfpq_topk(
        df, [0.0, 1.0, 2.0, 3.0], k=5, n_probe=2, centroids=cents, codebooks=books
    )  # default rerank: shortlist carries the vector, still no shuffle
    splan = search._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in splan
    assert "TakeOrderedAndProject" in splan
    assert search.count() == 5


def test_ivfpq_sampled_training_deterministic(spark):
    """max_train_rows: the md5-bucket training sample is engine/run-stable,
    so two sampled trainings produce identical codebooks; a bound above
    the corpus size is a no-op (trains on everything)."""
    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(4)]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = similarity.ivfpq_train(df, n_centroids=2, m=2, k=4, iters=1, max_train_rows=40)
    b = similarity.ivfpq_train(df, n_centroids=2, m=2, k=4, iters=1, max_train_rows=40)
    assert a == b
    full = similarity.ivfpq_train(df, n_centroids=2, m=2, k=4, iters=1)
    capped = similarity.ivfpq_train(df, n_centroids=2, m=2, k=4, iters=1, max_train_rows=10_000)
    assert capped == full


def test_chunk_text_exact_windows(spark):
    """text.chunk_text: exact character windows with overlap, lossless
    reconstruction (stripping the overlap prefix of every later chunk
    rebuilds the document), and the documented edge cases — empty text
    still yields one empty chunk, n == size yields exactly one chunk,
    n == size+1 spills into a second."""
    from sakura_spark.functions import text as t

    size, overlap = 10, 4
    step = size - overlap
    docs = [
        (1, ""),                       # empty -> 1 empty chunk
        (2, "x" * 10),                 # == size -> 1 chunk
        (3, "abcdefghijk"),            # size+1 -> 2 chunks
        (4, "0123456789" * 3),         # 30 chars -> ceil(20/6)+1 = 5 chunks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = t.chunk_text(df, size=size, overlap=overlap)
    rows = out.orderBy("doc_id", "chunk_id").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)

    assert [c.chunk for c in by_doc[1]] == [""]
    assert [c.chunk for c in by_doc[2]] == ["x" * 10]
    assert [c.chunk for c in by_doc[3]] == ["abcdefghij", "ghijk"]
    assert len(by_doc[4]) == 5 and by_doc[4][0].n_chunks == 5

    # every chunk is the exact substring it claims to be, and
    # reconstruction is lossless
    for doc_id, orig in docs:
        chunks = by_doc[doc_id]
        for c in chunks:
            assert c.chunk == orig[c.chunk_id * step : c.chunk_id * step + size]
            assert c.chunk_len == len(c.chunk)
        rebuilt = chunks[0].chunk + "".join(c.chunk[overlap:] for c in chunks[1:])
        assert rebuilt == orig

    # consecutive chunks share exactly `overlap` chars of context
    c4 = by_doc[4]
    for a, b in zip(c4, c4[1:]):
        assert a.chunk[-overlap:] == b.chunk[:overlap]

    # map-only: no shuffle anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with __import__("pytest").raises(ValueError):
        t.chunk_text(df, size=4, overlap=4)


def test_semantic_dedup_planted_clusters(spark):
    """similarity.semantic_dedup: with FIXED centroids, planted duplicate
    groups collapse to their lowest id; chain components collapse onto
    the component minimum even when the endpoints are not directly
    similar; singletons survive; the pair join never degenerates to a
    cartesian product; oversized clusters raise."""
    import math

    import pytest as _pytest
    from sakura_spark.functions import similarity as sim

    cents = [[0.0, 0.0], [10.0, 10.0]]

    def unit(theta, scale=1.0, center=(0.0, 0.0)):
        return [
            center[0] + scale * math.cos(theta),
            center[1] + scale * math.sin(theta),
        ]

    # Cluster 0: ids 1,2,3 exact copies (cos=1) -> keep 1.
    # Cluster 0: ids 5,6 a chain around id 4: cos(4,5) and cos(5,6) high,
    #   cos(4,6) lower than threshold -> all collapse onto 4 anyway.
    # Cluster 1: id 9 singleton -> kept.
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [2.0, 0.0]),          # cos=1 with id 1 (colinear)
        (4, unit(1.0)),           # rotated away from ids 1-3 (cos ~= 0.54)
        (5, unit(1.28)),          # cos(4,5) ~= 0.961
        (6, unit(1.56)),          # cos(5,6) ~= 0.961, cos(4,6) ~= 0.847
        (9, [10.0, 10.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sim.semantic_dedup(df, threshold=0.95, centroids=cents)
    assert sorted(r.vec_id for r in kept.collect()) == [1, 4, 9]

    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan

    with _pytest.raises(ValueError, match="max_cluster_size"):
        sim.semantic_dedup(df, threshold=0.95, centroids=cents, max_cluster_size=3)


def test_random_projection_preserves_distances(spark):
    """JL property: with out_dim 16 over dim 64, pairwise squared
    distances are preserved within a loose multiplicative band on
    well-separated planted vectors (sanity, not a tail bound), and the
    projection is deterministic (same matrix -> same values)."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 64).astype("float64")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = similarity.rp_matrix(16, 64)
    out = (
        similarity.random_projection(df, m)
        .drop("embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    proj = out[[f"p{j}" for j in range(16)]].to_numpy()
    # same computation in numpy from the same matrix
    mat = np.array(m, dtype="float64") * np.sqrt(3.0 / 16)
    ref = vecs @ mat.T
    assert np.allclose(proj, ref, rtol=1e-9)
    # distance preservation (loose band — JL guarantees eps ~ sqrt(ln n / k))
    for a in range(0, 20, 5):
        for b in range(a + 1, 20, 7):
            d_in = float(((vecs[a] - vecs[b]) ** 2).sum())
            d_out = float(((proj[a] - proj[b]) ** 2).sum())
            assert 0.3 * d_in < d_out < 2.5 * d_in


def test_random_projection_matches_duckdb_twin(spark):
    import duckdb
    import pandas as pd

    rows = [(i, [((i * 7 + d * 3) % 11) / 11 - 0.5 for d in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = similarity.rp_matrix(4, 8, seed=3)
    got = (
        similarity.random_projection(df, m)
        .drop("embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("emb_t", pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    sql = similarity.random_projection_oracle_sql(
        "SELECT vec_id, embedding FROM emb_t", m
    )
    want = (
        con.execute(f"SELECT vec_id, p0, p1, p2, p3 FROM ({sql})")
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for j in range(4):
        assert list(got[f"p{j}"]) == list(want[f"p{j}"]), j  # bit-identical


def test_random_projection_plan_is_map_only(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8)], "vec_id long, embedding array<double>"
    )
    m = similarity.rp_matrix(4, 8)
    plan = (
        similarity.random_projection(df, m)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        similarity.random_projection(df, [])


def test_minhash_portable_estimator_and_twin(spark):
    """Portable signatures behave as MinHash (identical docs -> identical
    sigs; near-dups agree on most; unrelated agree on few) AND match the
    generated DuckDB twin bit-for-bit."""
    import duckdb
    import pandas as pd

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy cat again and again"),
        (4, "completely different content with no shared shingles at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = dedup.minhash_signatures_portable(df, "id", num_hashes=16)
    sig = {r.id: [r[f"sig{i}"] for i in range(16)] for r in out.collect()}
    assert sig[1] == sig[2]
    near = sum(a == b for a, b in zip(sig[1], sig[3]))
    far = sum(a == b for a, b in zip(sig[1], sig[4]))
    assert near >= 8 and far <= 2

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sh = (
        "CASE WHEN len(regexp_split_to_array(trim(lower(text)), '\\s+')) < 3 "
        "THEN []::VARCHAR[] ELSE list_distinct(list_transform("
        "range(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 1), "
        "i -> regexp_split_to_array(trim(lower(text)), '\\s+')[i] || ' ' || "
        "regexp_split_to_array(trim(lower(text)), '\\s+')[i+1] || ' ' || "
        "regexp_split_to_array(trim(lower(text)), '\\s+')[i+2])) END"
    )
    sql = dedup.minhash_portable_oracle_sql(
        "SELECT doc_id, text FROM docs_t", sh, num_hashes=16
    )
    want = {
        int(r[0]): list(r[1:]) for r in con.execute(sql).fetchall()
    }
    assert sig == want


def test_embedding_moments_exact_and_pca(spark):
    """Moment table equals a hand computation on a controlled frame, and
    pca_from_moments recovers the planted dominant direction."""
    import numpy as np

    X = [
        [1.0, 1.0, 0.0],
        [2.0, 2.1, 0.0],
        [-1.0, -0.9, 0.5],
        [-2.0, -2.0, -0.5],
    ]
    df = spark.createDataFrame(
        [(i, [float(v) for v in x]) for i, x in enumerate(X)],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r.i, r.j): (r.n, r.s_i, r.s_j, r.s_ij)
        for r in similarity.embedding_moments(df, dims=3, grid=2.0).collect()
    }
    Q = np.floor(np.array(X, dtype=np.float32).astype(np.float64) * 2.0 + 0.5)
    for i in range(3):
        for j in range(i, 3):
            assert out[(i, j)] == (
                4,
                int(Q[:, i].sum()),
                int(Q[:, j].sum()),
                int((Q[:, i] * Q[:, j]).sum()),
            ), (i, j)

    mean, cov, w, comps = similarity.pca_from_moments(
        [
            {"i": i, "j": j, "n": v[0], "s_i": v[1], "s_j": v[2], "s_ij": v[3]}
            for (i, j), v in out.items()
        ]
    )
    assert np.allclose(cov, np.cov(Q.T, bias=True))
    assert w[0] >= w[1] >= w[2]
    # dims 0/1 are strongly correlated: the top component loads them
    # near-equally and dominates the spectrum.
    top = comps[0] / np.sign(comps[0][0])
    assert abs(top[0] - top[1]) < 0.2 and abs(top[2]) < 0.3
    assert w[0] > 5 * w[1]


def test_hash_features_signs_duplicates_and_twin(spark):
    """Hashing-trick features: occurrences count (not distinct tokens),
    bucket/sign come from the two disjoint sha256-word slices (verified
    against a hashlib re-computation), blank docs vanish, and the
    generated DuckDB twin matches bit-for-bit."""
    import duckdb
    import hashlib
    import pandas as pd

    rows = [(1, "The quick  quick fox"), (2, ""), (3, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id, r.bucket): r.val for r in text.hash_features(df, dim=16).collect()
    }

    def hw(tok, word):
        d = hashlib.sha256(("fh\x1f" + tok).encode()).hexdigest()
        return int(d[15 * word : 15 * (word + 1)], 16)

    exp: dict = {}
    for tok in ["the", "quick", "quick", "fox"]:
        b = hw(tok, 0) % 16
        exp[(1, b)] = exp.get((1, b), 0) + (1 if hw(tok, 1) % 2 == 0 else -1)
    assert out == exp

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = text.hash_features_oracle_sql(
        "SELECT doc_id AS id, text FROM docs_t", dim=16
    )
    want = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    assert out == want


def test_hash_score_linear_inference(spark):
    """Scores equal the hand-computed sum of sign * weight over token
    occurrences; empty docs are absent; empty weights raise."""
    import hashlib as hl

    import pytest as _pytest

    rows = [(1, "Alpha beta alpha"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    W = [3, -5, 7, 11]
    got = {
        r.id: (r.n_tokens, r.score)
        for r in text.hash_score(df, W).collect()
    }

    def hw(tok, word):
        d = hl.sha256(("fh\x1f" + tok).encode()).hexdigest()
        return int(d[15 * word : 15 * (word + 1)], 16)

    score = 0
    for tok in ["alpha", "beta", "alpha"]:
        sgn = 1 if hw(tok, 1) % 2 == 0 else -1
        score += sgn * W[hw(tok, 0) % 4]
    assert got == {1: (3, score)}

    with _pytest.raises(ValueError):
        text.hash_score(df, [])


def test_corpus_overlap_estimator_and_twin(spark):
    """Per-group MinHash = MinHash of the union shingle set (min of mins),
    the pairwise estimate orders by true resemblance, and the generated
    DuckDB twin matches bit-for-bit."""
    import duckdb
    import pandas as pd

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base, "a"),
        (2, base + " lambda mu nu xi omicron pi rho", "a"),
        (3, base, "b"),  # b's shingles are a subset of a's
        (4, "totally unrelated words sharing nothing with the other sources", "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.group_a, r.group_b): (r.matching_slots, r.num_hashes, r.jaccard_est)
        for r in dedup.corpus_overlap(df, "source", num_hashes=32).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")][0] > out[("a", "c")][0]
    assert out[("a", "c")][0] <= 2 and out[("b", "c")][0] <= 2
    for m, n, est in out.values():
        assert n == 32 and est == m / 32

    # min(union) = min of mins: the group signature equals the
    # elementwise min of its documents' portable signatures.
    per_doc = [
        [r[f"sig{i}"] for i in range(32)]
        for r in dedup.minhash_signatures_portable(
            df.filter(F.col("source") == "a"), "doc_id", num_hashes=32
        ).collect()
    ]
    union_sig = [min(col) for col in zip(*per_doc)]
    grp = (
        dedup.corpus_minhash(df, "source", num_hashes=32)
        .filter(F.col("grp") == "a")
        .collect()[0]
    )
    assert [grp[f"sig{i}"] for i in range(32)] == union_sig

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    sh = (
        "CASE WHEN len(regexp_split_to_array(trim(lower(text)), '\\s+')) < 3 "
        "THEN []::VARCHAR[] ELSE list_distinct(list_transform("
        "range(1, len(regexp_split_to_array(trim(lower(text)), '\\s+')) - 1), "
        "i -> regexp_split_to_array(trim(lower(text)), '\\s+')[i] || ' ' || "
        "regexp_split_to_array(trim(lower(text)), '\\s+')[i+1] || ' ' || "
        "regexp_split_to_array(trim(lower(text)), '\\s+')[i+2])) END"
    )
    sql = dedup.corpus_overlap_oracle_sql(
        "SELECT source AS grp, text FROM docs_t", sh, num_hashes=32
    )
    want = {
        (r[0], r[1]): (r[2], r[3], r[4]) for r in con.execute(sql).fetchall()
    }
    assert out == want


def test_simhash_portable_hamming_and_twin(spark):
    """Portable SimHash behaves as SimHash (near-dups at small Hamming
    distance, unrelated docs far) AND matches the generated DuckDB twin
    bit-for-bit, including the tie-sets-the-bit rule."""
    import duckdb
    import pandas as pd

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy cat again and again"),
        (3, "completely different content with no shared word pairs at all"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r.sim for r in dedup.simhash_portable(df, "id").collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 60) - 1)).count("1")

    assert ham(out[1], out[2]) < ham(out[1], out[3])
    assert ham(out[1], out[2]) <= 20

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sh2 = (
        "CASE WHEN len(regexp_split_to_array(trim(lower(text)), '\\s+')) < 2 "
        "THEN []::VARCHAR[] ELSE list_distinct(list_transform("
        "range(1, len(regexp_split_to_array(trim(lower(text)), '\\s+'))), "
        "i -> regexp_split_to_array(trim(lower(text)), '\\s+')[i] || ' ' || "
        "regexp_split_to_array(trim(lower(text)), '\\s+')[i+1])) END"
    )
    sql = dedup.simhash_portable_oracle_sql(
        "SELECT doc_id, text FROM docs_t", sh2, bits=60
    )
    want = dict(con.execute(sql).fetchall())
    assert out == want

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.simhash_portable(df, "id", bits=64)


def test_decode_image_stats_matches_closed_forms(spark):
    """Formula-pixel PNGs: dims/checksum/probes from the REAL decoder must
    equal the oracle's closed forms for every color type (gray,
    gray+alpha, RGB) and padding-free scanline layout."""
    from sakura_spark.functions import multimodal as M

    def closed(a, n):
        full, rem = divmod(n, 256)
        s = full * 32640
        if a + rem <= 256:
            s += rem * a + rem * (rem - 1) // 2
        else:
            t1, t2 = 256 - a, rem - (256 - a)
            s += t1 * a + t1 * (t1 - 1) // 2 + t2 * (t2 - 1) // 2
        return s

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = M.decode_image_stats(M.synthetic_formula_image_payload(ids))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 24
    for i, r in rows.items():
        w, h, ch = 6 + (i % 4) * 3, 5 + (i % 3) * 4, 1 + (i % 3)
        a = (i * 29) % 256
        assert (r["height"], r["width"], r["channels"]) == (h, w, ch)
        assert r["pixel_checksum"] == closed(a, h * w * ch)
        assert r["first_pixel"] == a
        assert r["row0_sum"] == closed(a, w * ch)


def test_decode_image_stats_null_row_for_undecodable(spark):
    from sakura_spark.functions import multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nbroken")), (2, None)],
        "doc_id long, payload binary",
    )
    rows = M.decode_image_stats(df).collect()
    assert len(rows) == 2 and all(r["pixel_checksum"] is None for r in rows)


def test_decode_gif_stats_matches_closed_forms(spark):
    """Formula-pixel GIFs (round 10): the REAL LZW encoder+decoder and
    the palette indirection must reproduce the grayscale closed forms
    times 3 channels — the multimodal_gif_exact driver twin's pytest
    mirror."""
    from sakura_spark.functions import multimodal as M

    def closed(a, n):
        full, rem = divmod(n, 256)
        s = full * 32640
        if a + rem <= 256:
            s += rem * a + rem * (rem - 1) // 2
        else:
            t1, t2 = 256 - a, rem - (256 - a)
            s += t1 * a + t1 * (t1 - 1) // 2 + t2 * (t2 - 1) // 2
        return s

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = M.decode_image_stats(M.synthetic_formula_gif_payload(ids))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 24
    for i, r in rows.items():
        w, h = 6 + (i % 4) * 3, 5 + (i % 3) * 4
        a = (i * 31) % 256
        assert (r["height"], r["width"], r["channels"]) == (h, w, 3)
        assert r["pixel_checksum"] == 3 * closed(a, h * w)
        assert r["first_pixel"] == a
        assert r["row0_sum"] == 3 * closed(a, w)


def test_decode_jpeg_stats_matches_closed_forms(spark):
    """Flat-block baseline JPEGs (round 10): the lossy codec's one
    bit-exact corpus family — constant 8x8 blocks through the all-ones
    quant tables — must reproduce the block-value closed forms in every
    position (block-order-sensitive probes)."""
    from sakura_spark.functions import multimodal as M

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = M.decode_image_stats(M.synthetic_formula_jpeg_payload(ids))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 24
    for i, r in rows.items():
        bw, bh = 1 + (i % 3), 1 + (i % 2)
        v = lambda by, bx: (i * 37 + by * 11 + bx * 5) % 255 + 1
        total = sum(v(by, bx) for by in range(bh) for bx in range(bw))
        assert (r["height"], r["width"], r["channels"]) == (bh * 8, bw * 8, 1)
        assert r["pixel_checksum"] == 64 * total
        assert r["first_pixel"] == v(0, 0)
        assert r["row0_sum"] == 8 * sum(v(0, bx) for bx in range(bw))


def test_decode_resize_stats_matches_formula(spark):
    """decode -> NN-resize -> stats equals the closed-form evaluation of
    the pixel formula at the nearest-neighbour index map."""
    from sakura_spark.functions import multimodal

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = {
        r.doc_id: r
        for r in multimodal.decode_resize_stats(
            multimodal.synthetic_formula_image_payload(docs), width=4, height=4
        ).collect()
    }
    for i in range(12):
        w, h, ch = 6 + (i % 4) * 3, 5 + (i % 3) * 4, 1 + (i % 3)
        px = lambda y, x, c: (i * 29 + ((y * h // 4) * w + (x * w // 4)) * ch + c) % 256
        want_sum = sum(px(y, x, c) for y in range(4) for x in range(4) for c in range(ch))
        r = out[i]
        assert (r.height, r.width, r.channels) == (4, 4, ch)
        assert r.pixel_checksum == want_sum
        assert r.first_pixel == px(0, 0, 0)
        assert r.row0_sum == sum(px(0, x, c) for x in range(4) for c in range(ch))
