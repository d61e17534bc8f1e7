"""Property-based algebra laws and hash invariants (hypothesis), extending
the reference's example-based suite as planned in SURVEY §5."""

import pytest
from hypothesis import HealthCheck, given, settings

from conftest import diff_examples
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sakura_spark import algebra
from sakura_spark.hashing import TUPLE_HASH_COL, with_tuple_hash

ROWS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 5), st.sampled_from(["a", "b", "c"])),
    min_size=0,
    max_size=12,
)

_SETTINGS = dict(
    max_examples=diff_examples(5, 3),  # each example runs Spark jobs; keep the budget tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows or [], "k long, g long, s string")


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_select_project_commute(spark, rows):
    df = _df(spark, rows)
    a = algebra.project(algebra.select(df, F.col("k") > 10), ["k"])
    b = algebra.select(algebra.project(df, ["k"]), F.col("k") > 10)
    assert sorted(r.k for r in a.collect()) == sorted(r.k for r in b.collect())


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_union_bag_counts_add(spark, rows):
    df = _df(spark, rows)
    assert algebra.union(df, df).count() == 2 * df.count()


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_diff_self_is_empty_and_diff_empty_is_identity(spark, rows):
    df = _df(spark, rows)
    empty = _df(spark, [])
    assert algebra.diff(df, df).count() == 0
    assert sorted(map(tuple, algebra.diff(df, empty).collect())) == sorted(
        map(tuple, df.dropDuplicates().collect())
    )


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_semijoin_subset_and_idempotent(spark, rows):
    df = _df(spark, rows)
    filt = df.filter(F.col("g") >= 2).select("g")
    once = algebra.semijoin(filt, df)
    twice = algebra.semijoin(filt, once)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() <= df.count()


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_tuple_hash_column_order_invariant(spark, rows):
    """Hash covers sorted attrs: reordering columns must not change it
    (lib/hashing.ml:29-45 parity)."""
    df = _df(spark, rows)
    h1 = sorted(r[TUPLE_HASH_COL] for r in with_tuple_hash(df, "t").collect())
    h2 = sorted(
        r[TUPLE_HASH_COL] for r in with_tuple_hash(df.select("s", "k", "g"), "t").collect()
    )
    assert h1 == h2


def test_relation_hash_insertion_order_invariant(spark):
    from sakura_spark.hashing import relation_hash, schema_signature

    rows = [(1, 1, "a"), (2, 2, "b"), (3, 0, "c")]
    sig = schema_signature([("k", "integer"), ("g", "integer"), ("s", "string")])
    h1 = relation_hash(_df(spark, rows), "t", sig)
    h2 = relation_hash(_df(spark, list(reversed(rows))).repartition(3), "t", sig)
    assert h1 == h2


def test_group_checksum_reconciliation_semantics(spark):
    """Per-group checksums are row-order and duplicate insensitive (set
    semantics), and flip — in the right group only — when any value in
    any row changes."""
    from sakura_spark.hashing import group_checksum

    rows = [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]

    def cs(rs, parts=1):
        df = spark.createDataFrame(rs, "k long, g string, v string").repartition(
            parts
        )
        return {
            r.grp: (r.n_distinct, r.w0, r.w1, r.w2, r.w3)
            for r in group_checksum(df, "g", "t").collect()
        }

    base = cs(rows)
    assert set(base) == {"a", "b"} and base["a"][0] == 2 and base["b"][0] == 1
    # Reordered, repartitioned, and with a duplicated row: identical.
    assert cs(list(reversed(rows)) + [rows[0]], parts=3) == base
    # One changed value flips exactly that group's words.
    mutated = cs([(1, "a", "x"), (2, "a", "Y"), (3, "b", "z")])
    assert mutated["b"] == base["b"]
    assert mutated["a"] != base["a"] and mutated["a"][0] == 2


EDGES = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@given(edges=EDGES)
@settings(**_SETTINGS)
def test_duplicate_clusters_match_union_find(spark, edges):
    """Min-label propagation agrees with a driver-side union-find oracle on
    arbitrary small graphs (chains, cycles, stars, disjoint parts)."""
    from sakura_spark.functions.dedup import duplicate_clusters

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    # Both paths must agree with the oracle AND each other: the default
    # routes small graphs through the driver union-find; driver_max_pairs=0
    # forces the distributed pointer-doubling propagation.
    got = {r.id: r.cluster for r in duplicate_clusters(pairs).collect()}
    assert got == expected
    dist = {
        r.id: r.cluster
        for r in duplicate_clusters(pairs, driver_max_pairs=0).collect()
    }
    assert dist == expected


def test_sources_api(spark, tmp_path):
    from sakura_spark import sources

    df = _df(spark, [(1, 2, "a"), (3, 4, "b")])
    out = str(tmp_path / "p")
    sources.write_parquet(df, out, partition_by=["s"])
    back = sources.read_parquet(spark, out)
    assert back.count() == 2 and set(back.columns) == {"k", "g", "s"}
    csv_path = str(tmp_path / "c")
    df.write.option("header", True).csv(csv_path)
    back_csv = sources.read_csv(spark, csv_path, "k long, g long, s string")
    assert sorted(map(tuple, back_csv.collect())) == sorted(map(tuple, df.collect()))
    with pytest.raises(sources.ConnectorUnavailable):
        sources.read_delta(spark, "/tmp/nope")


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile ingestion -> multimodal ops end-to-end: files land as
    (doc_id, path, n_bytes, payload) and image_dims reads real headers."""
    import struct

    from sakura_spark import sources
    from sakura_spark.functions import multimodal

    d = tmp_path / "blobs"
    d.mkdir()
    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", 12, 34) + b"\x08\x06" + b"\x00" * 10
    )
    (d / "a.png").write_bytes(png)
    (d / "b.txt").write_bytes(b"hello world")
    df = sources.read_binary_files(spark, str(d))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"].n_bytes == len(png) and rows["b.txt"].doc_id >= 0
    dims = {r.doc_id: (r.format, r.width, r.height) for r in multimodal.image_dims(df).collect()}
    assert dims[rows["a.png"].doc_id] == ("png", 12, 34)
    assert dims[rows["b.txt"].doc_id] == (None, None, None)
    # glob filter restricts the listing
    assert sources.read_binary_files(spark, str(d), glob="*.png").count() == 1


def test_sketch_aggregates_track_exact(spark):
    """The sketch-based scale path (HLL distinct counts, t-digest
    percentiles) must track exact answers within documented tolerance —
    these are what replace exact distinct/percentile at 100 TB."""
    import pyspark.sql.functions as F
    from sakura_spark.session import load_table

    li = load_table(spark, "/root/testdata/sf0.01/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05
    assert abs(row.p50_approx - row.p50_exact) / row.p50_exact < 0.01


CHUNK_DOCS = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        min_size=0,
        max_size=80,
    ),
    min_size=1,
    max_size=6,
)


@given(docs=CHUNK_DOCS, size=st.integers(2, 24), overlap_frac=st.integers(0, 99))
@settings(**_SETTINGS)
def test_chunk_text_reconstruction_property(spark, docs, size, overlap_frac):
    """chunk_text laws, for arbitrary text (incl. non-ASCII, where char
    and byte offsets diverge) and arbitrary (size, overlap):
    every chunk equals the exact python slice it claims, stripping each
    later chunk's overlap prefix rebuilds the document losslessly, and
    the chunk count matches the closed form 1 + ceil((n-size)/step)."""
    from sakura_spark.functions import text as t

    overlap = (size - 1) * overlap_frac // 100  # 0 <= overlap < size
    step = size - overlap
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    rows = t.chunk_text(df, size=size, overlap=overlap).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, orig in enumerate(docs):
        chunks = by_doc[doc_id]
        n = len(orig)
        expect_k = 1 if n <= size else 1 + -((n - size) // -step)
        assert len(chunks) == expect_k == chunks[0].n_chunks
        for c in chunks:
            assert c.chunk == orig[c.chunk_id * step : c.chunk_id * step + size]
        rebuilt = chunks[0].chunk + "".join(c.chunk[overlap:] for c in chunks[1:])
        assert rebuilt == orig


SEM_VECS = st.lists(
    st.lists(st.integers(-3, 3), min_size=2, max_size=2).filter(
        lambda v: any(x != 0 for x in v)
    ),
    min_size=1,
    max_size=10,
)


@given(vecs=SEM_VECS, thresh_pct=st.integers(50, 99))
@settings(**_SETTINGS)
def test_semantic_dedup_matches_bruteforce(spark, vecs, thresh_pct):
    """Differential: similarity.semantic_dedup against a driver-side
    brute-force replay of the keep-lowest-id rule (drop i iff some j < i
    in the same argmin cluster has cos(i,j) >= threshold), over random
    small integer vectors — integer coords keep the cosine comparisons
    away from float-boundary flakiness only when the threshold is too,
    so thresholds are sampled away from any achievable cosine by using
    odd percents (cosines of +-3-bounded 2d integer vectors hit few
    exact percent values; equality at the boundary follows IEEE the
    same way in both implementations since both compute in float64)."""
    from sakura_spark.functions import similarity as sim

    threshold = thresh_pct / 100.0
    cents = [[2.0, 0.0], [-2.0, 0.0]]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]

    def l2sq(a, c):
        return sum((x - y) ** 2 for x, y in zip(a, c))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den

    cluster = {i: min(range(2), key=lambda c: (l2sq(v, cents[c]), c)) for i, v in rows}
    expect_kept = []
    for i, v in rows:
        dup = any(
            cluster[j] == cluster[i] and cos(w, v) >= threshold
            for j, w in rows
            if j < i
        )
        if not dup:
            expect_kept.append(i)

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sim.semantic_dedup(df, threshold=threshold, centroids=cents)
    assert sorted(r.vec_id for r in kept.collect()) == expect_kept


# Random tiny corpora from a 6-word vocabulary: dense shingle overlap, so
# prefix filtering actually prunes AND boundary-threshold pairs occur.
DOCS = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
             min_size=0, max_size=8),
    min_size=0,
    max_size=8,
)


@given(docs=DOCS)
@settings(**_SETTINGS)
def test_jaccard_selfjoin_matches_brute(spark, docs):
    """Prefix filtering is exact on arbitrary corpora: empty docs, docs
    below the shingle order, full duplicates, single shared grams."""
    from sakura_spark.functions import dedup

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows or [(0, "")], "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.jaccard_selfjoin(df, "doc_id", threshold=(1, 3)).collect()
    }

    def sh(t):
        w = [x for x in t.split() if x]
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    want = {}
    items = rows or [(0, "")]
    for i, (ia, ta) in enumerate(items):
        for ib, tb in items[i + 1 :]:
            a, b = sh(ta), sh(tb)
            inter, uni = len(a & b), len(a | b)
            if uni and 3 * inter >= uni:
                want[(ia, ib)] = inter / uni
    assert got == want
