"""Video stack: AVI/RIFF container codec, DIB + MJPEG frame decode,
frame sampling, and the synthetic-corpus rotation the driver oracle
reproduces (sakura_spark/functions/video.py)."""

import struct

import numpy as np
import pytest

from sakura_spark.functions import video as V
from sakura_spark.functions.multimodal import DecodeUnavailable, _jpeg_decode, _jpeg_encode


def _rand_frames(rng, n, w, h):
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


# --- container codec (no Spark) ---------------------------------------------


@pytest.mark.parametrize(
    "w,h,n",
    [
        (1, 1, 1),      # degenerate
        (4, 4, 2),      # stride already aligned (12 % 4 = 0)
        (7, 6, 3),      # pad 3
        (10, 11, 5),    # pad 2
        (13, 6, 7),     # pad 1
        (16, 9, 4),     # wide
    ],
)
def test_dib_roundtrip_bit_exact(w, h, n):
    rng = np.random.default_rng(w * 100 + h * 10 + n)
    frames = _rand_frames(rng, n, w, h)
    meta, out = V._avi_decode(V._avi_encode(frames, rate=25))
    assert meta == {
        "codec": "dib", "width": w, "height": h,
        "fps_num": 25, "fps_den": 1, "n_frames": n,
    }
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_dib_padding_bytes_do_not_leak():
    """w=7 rows carry 3 pad bytes each; a decoder that mis-strips them
    shifts every subsequent pixel. Encode a frame whose rows are
    constant-valued per row index and check each decoded row exactly."""
    w, h = 7, 5
    frame = np.stack(
        [np.full((w, 3), 10 * (y + 1), dtype=np.uint8) for y in range(h)]
    )
    _, out = V._avi_decode(V._avi_encode([frame], rate=10))
    for y in range(h):
        assert (out[0][y] == 10 * (y + 1)).all()


def test_mjpeg_frames_delegate_to_jpeg_decoder():
    rng = np.random.default_rng(7)
    frames = _rand_frames(rng, 3, 16, 8)
    jpegs = [_jpeg_encode(f) for f in frames]
    meta, out = V._avi_decode(V._avi_encode(jpegs, rate=15, codec="mjpg"))
    assert meta["codec"] == "mjpg"
    assert meta["n_frames"] == 3 and meta["width"] == 16 and meta["height"] == 8
    # Same decoder, same bytes: bit-identical to decoding the chunk alone.
    for jpg, fr in zip(jpegs, out):
        assert np.array_equal(fr, _jpeg_decode(jpg))


def test_unsupported_compression_raises():
    frames = [np.zeros((4, 4, 3), dtype=np.uint8)]
    b = bytearray(V._avi_encode(frames, rate=10))
    # Patch biCompression (strf payload offset 16) to 'XVID'.
    i = b.find(b"strf") + 8 + 16
    b[i : i + 4] = b"XVID"
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(bytes(b))


def test_idx1_disagreement_rejected():
    frames = [np.zeros((4, 4, 3), dtype=np.uint8)] * 2
    b = bytearray(V._avi_encode(frames, rate=10))
    i = b.find(b"idx1") + 8 + 8  # first entry's dwChunkOffset
    struct.pack_into("<I", b, i, struct.unpack_from("<I", b, i)[0] + 4)
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(bytes(b))


def test_strh_length_mismatch_rejected():
    frames = [np.zeros((4, 4, 3), dtype=np.uint8)] * 3
    b = bytearray(V._avi_encode(frames, rate=10))
    i = b.find(b"strh") + 8 + 32  # dwLength
    struct.pack_into("<I", b, i, 99)
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(bytes(b))


@pytest.mark.parametrize(
    "payload",
    [b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE", b"RIFF\xff\xff\xff\xffAVI "],
)
def test_malformed_payloads_rejected(payload):
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(payload)


def test_truncated_container_rejected():
    frames = [np.zeros((7, 6, 3), dtype=np.uint8)] * 3
    b = V._avi_encode(frames, rate=10)
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(b[: len(b) // 2])


# --- synthetic rotation & closed forms ---------------------------------------


def _closed_sum(a: int, n: int) -> int:
    """sum_{j=0}^{n-1} (a + j) % 256 — the oracle's closed form."""
    full, rem = divmod(n, 256)
    s = full * 32640
    if a + rem <= 256:
        s += rem * a + rem * (rem - 1) // 2
    else:
        t1, t2 = 256 - a, rem - (256 - a)
        s += t1 * a + t1 * (t1 - 1) // 2 + t2 * (t2 - 1) // 2
    return s


@pytest.mark.parametrize("i", [0, 1, 2, 3, 4, 5, 29, 254, 255, 256, 1000])
def test_synthetic_rotation_closed_forms(i):
    w, h, rate, n = V._synth_params(i)
    frames = [V._synth_frame(i, f, w, h) for f in range(n)]
    meta, out = V._avi_decode(V._avi_encode(frames, rate))
    assert meta["n_frames"] == n and meta["width"] == w and meta["height"] == h
    assert sum(int(fr.sum()) for fr in out) == sum(
        _closed_sum((i * 31 + f * 17) % 256, 3 * w * h) for f in range(n)
    )
    assert int(out[0][0, 0, 0]) == (i * 31) % 256
    assert int(out[0][0].sum()) == _closed_sum((i * 31) % 256, 3 * w)


def test_probes_detect_orientation_and_channel_errors():
    """first_pixel/row0_sum exist to catch decoders that skip the
    bottom-up flip or the BGR swap — verify those wrong decodes really
    do produce different probe values for the synth corpus."""
    i = 1
    w, h, rate, n = V._synth_params(i)
    frame = V._synth_frame(i, 0, w, h)
    right = int(frame[0, 0, 0])
    no_flip = int(frame[::-1][0, 0, 0])       # forgot bottom-up flip
    no_bgr = int(frame[:, :, ::-1][0, 0, 0])  # forgot BGR swap
    assert no_flip != right and no_bgr != right
    # ...while the permutation-blind checksum can't tell:
    assert frame[::-1].sum() == frame.sum() == frame[:, :, ::-1].sum()


# --- Spark stages -------------------------------------------------------------


@pytest.fixture(scope="module")
def video_df(spark):
    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    return V.synthetic_avi_payload(ids).cache()


def test_decode_video_matches_direct(video_df):
    rows = {r["doc_id"]: r for r in V.decode_video(video_df).collect()}
    assert len(rows) == 24
    for i, r in rows.items():
        w, h, rate, n = V._synth_params(i)
        assert (r["codec"], r["n_frames"], r["width"], r["height"]) == ("dib", n, w, h)
        assert (r["fps_num"], r["fps_den"]) == (rate, 1)
        assert r["duration_ms"] == n * 1000 // rate
        assert r["pixel_checksum"] == sum(
            _closed_sum((i * 31 + f * 17) % 256, 3 * w * h) for f in range(n)
        )
        assert r["first_pixel"] == (i * 31) % 256
        assert r["row0_sum"] == _closed_sum((i * 31) % 256, 3 * w)


def test_decode_video_null_row_for_undecodable(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not a video")), (2, None)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in V.decode_video(df).collect()}
    assert len(rows) == 2
    for r in rows.values():
        assert r["codec"] is None and r["pixel_checksum"] is None


def test_frame_stats_sampling_and_null_contract(spark, video_df):
    out = {
        (r["doc_id"], r["frame_idx"]): r
        for r in V.video_frame_stats(video_df, every_n=2).collect()
    }
    for i in range(24):
        w, h, rate, n = V._synth_params(i)
        kept = [f for f in range(n) if f % 2 == 0]
        got = sorted(f for d, f in out if d == i)
        assert got == kept
        for f in kept:
            r = out[(i, f)]
            assert r["pixel_sum"] == _closed_sum((i * 31 + f * 17) % 256, 3 * w * h)
            assert r["first_pixel"] == (i * 31 + f * 17) % 256
    # decodable-or-NULL-row contract: malformed payload -> ONE all-NULL row
    bad = spark.createDataFrame(
        [(99, bytearray(b"RIFFjunk"))], "doc_id long, payload binary"
    )
    rows = V.video_frame_stats(bad).collect()
    assert len(rows) == 1 and rows[0]["frame_idx"] is None


def test_video_pipeline_plan_map_only(video_df):
    """Payloads must never cross a shuffle: the synthesize->decode plan
    holds no Exchange after the widening repartition's round-robin (which
    carries only (doc_id) pre-payload)."""
    plan = V.decode_video(video_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


# --- A/V interleave & demux ---------------------------------------------------


def test_av_roundtrip_both_streams_exact():
    rng = np.random.default_rng(11)
    for n, ns in [(1, 7), (3, 100), (5, 999)]:
        frames = _rand_frames(rng, n, 10, 6)
        audio = rng.integers(-32768, 32767, size=ns, dtype=np.int16)
        meta, out = V._avi_decode(V._avi_encode(frames, 15, audio=(audio, 8000)))
        assert meta["n_frames"] == n and meta["n_audio_samples"] == ns
        assert meta["audio_rate"] == 8000
        assert np.array_equal(meta["audio_samples"], audio)
        for a, b in zip(frames, out):
            assert np.array_equal(a, b)


def test_av_idx1_covers_both_streams():
    """Corrupting an AUDIO chunk's idx1 entry must be caught — the index
    validation spans both streams, not just video."""
    frames = [np.zeros((6, 7, 3), dtype=np.uint8)] * 2
    audio = np.arange(50, dtype=np.int16)
    b = bytearray(V._avi_encode(frames, 10, audio=(audio, 8000)))
    i = b.find(b"idx1") + 8 + 16 + 8  # second entry (first '01wb') offset
    struct.pack_into("<I", b, i, struct.unpack_from("<I", b, i)[0] + 2)
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(bytes(b))


def test_av_auds_length_mismatch_rejected():
    frames = [np.zeros((6, 7, 3), dtype=np.uint8)] * 2
    audio = np.arange(50, dtype=np.int16)
    b = bytearray(V._avi_encode(frames, 10, audio=(audio, 8000)))
    # second strh (auds) dwLength at offset 32 of its payload
    i = b.find(b"strh", b.find(b"auds") - 12)
    struct.pack_into("<I", b, i + 8 + 32, 49)
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(bytes(b))


def test_av_non_pcm16_audio_rejected():
    frames = [np.zeros((6, 7, 3), dtype=np.uint8)]
    audio = np.arange(10, dtype=np.int16)
    b = bytearray(V._avi_encode(frames, 10, audio=(audio, 8000)))
    i = b.find(b"auds")
    j = b.find(b"strf", i)  # audio strf: wFormatTag at payload offset 0
    struct.pack_into("<H", b, j + 8, 7)  # mu-law
    with pytest.raises(DecodeUnavailable):
        V._avi_decode(bytes(b))


def test_av_synth_rotation_closed_forms():
    for i in [0, 1, 2, 3, 4, 9, 255, 256]:
        w, h, rate, n = V._synth_params(i)
        ns, arate = V._synth_audio_params(i)
        audio = V._synth_audio(i, ns)
        assert int(audio.astype(np.int64).sum()) == _closed_sum((i * 13) % 256, ns) - 128 * ns
        assert int(audio[0]) == ((i * 13) % 256) - 128
        assert arate == (8000, 16000)[i % 2]


def test_demux_av_spark_stage(spark):
    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = {r["doc_id"]: r for r in V.demux_av(V.synthetic_av_payload(ids)).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        w, h, rate, n = V._synth_params(i)
        ns, arate = V._synth_audio_params(i)
        assert (r["n_frames"], r["width"], r["height"]) == (n, w, h)
        assert (r["n_audio_samples"], r["audio_rate"]) == (ns, arate)
        assert r["audio_checksum"] == _closed_sum((i * 13) % 256, ns) - 128 * ns
        assert r["audio_first"] == ((i * 13) % 256) - 128
    # video-only payload -> NULL row (no audio stream to demux)
    vid_only = V.synthetic_avi_payload(spark.range(0, 2).withColumnRenamed("id", "doc_id"))
    out = V.demux_av(vid_only).collect()
    assert all(r["audio_checksum"] is None for r in out)


def test_frames_to_png_feeds_image_pipeline(spark):
    """Video -> PNG handoff: lossless round trip into the image stack —
    decode_image sees the right dims and _png_decode returns the exact
    DIB pixels of each sampled frame."""
    from sakura_spark.functions.multimodal import _png_decode, decode_image

    ids = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    pngs = V.frames_to_png(V.synthetic_avi_payload(ids), every_n=2)
    rows = pngs.collect()
    for r in rows:
        i, f = r["doc_id"], r["frame_idx"]
        w, h, rate, n = V._synth_params(i)
        assert f % 2 == 0
        assert np.array_equal(
            _png_decode(bytes(r["payload"])), V._synth_frame(i, f, w, h)
        )
    dims = decode_image(pngs.withColumnRenamed("frame_idx", "fidx")).collect()
    for d in dims:
        w, h, _, _ = V._synth_params(d["doc_id"])
        assert (d["height"], d["width"], d["channels"]) == (h, w, 3)


@pytest.mark.parametrize("w,h,n", [(7, 6, 3), (4, 4, 2), (13, 5, 1)])
def test_top_down_dib_roundtrip_bit_exact(w, h, n):
    """Negative-biHeight (top-down) DIB AVIs decode bit-exactly — the
    decoder honors the WinGDI sign instead of unconditionally applying
    the bottom-up flip (ADVICE r9: the old path silently returned
    vertically flipped pixels for valid external top-down files)."""
    rng = np.random.default_rng(w + h + n)
    frames = _rand_frames(rng, n, w, h)
    b = V._avi_encode(frames, rate=25, top_down=True)
    # the container really does carry a negative biHeight
    i = b.index(b"strf")
    biw, bih = struct.unpack_from("<ii", b, i + 8 + 4)
    assert (biw, bih) == (w, -h)
    meta, out = V._avi_decode(b)
    assert meta["width"] == w and meta["height"] == h and meta["n_frames"] == n
    for a, got in zip(frames, out):
        assert np.array_equal(a, got)


def test_top_down_and_bottom_up_payloads_differ():
    """Sanity: for a vertically asymmetric frame the two layouts store
    different bytes, so the round-trip above is load-bearing."""
    frame = np.zeros((2, 1, 3), dtype=np.uint8)
    frame[0, 0] = (255, 0, 0)
    assert V._dib_encode_frame(frame) != V._dib_encode_frame(frame, top_down=True)
    # and cross-decoding without honoring the sign would flip:
    assert np.array_equal(
        V._dib_decode_frame(V._dib_encode_frame(frame, top_down=True), 1, 2, top_down=False),
        frame[::-1],
    )
