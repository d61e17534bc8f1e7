"""Audio (WAV/PCM/G.711) codec + feature tests.

The audio twin of the image-codec suites in test_functions.py: pure-numpy
codec round trips, ITU-T G.711 companding laws, container robustness
(DecodeUnavailable on compressed/malformed payloads), Spark-side decode /
features / framing / resample / spectral stages, and plan shape.
"""

import struct

import numpy as np
import pytest

from sakura_spark.functions import audio
from sakura_spark.functions.multimodal import DecodeUnavailable


def _sig(n=480, ch=1):
    x = (np.arange(n * ch) * 37 % 4096 - 2048).astype(np.int16)
    return x.reshape(n, ch)


# ---------------------------------------------------------------- codecs


def test_pcm_roundtrips_bit_exact():
    s = _sig(300, 2)
    for codec, expect in [
        ("pcm16", s.astype(np.int32)),
        ("pcm24", s.astype(np.int32) << 8),
        ("pcm32", s.astype(np.int32) << 16),
        ("extensible_pcm16", s.astype(np.int32)),
    ]:
        dec, rate, bits, name = audio._wav_decode(audio._wav_encode(s, 16000, codec))
        assert rate == 16000
        assert np.array_equal(dec, expect), codec
    # pcm8 keeps the top byte (quantized to 256 levels, renormalized <<8)
    dec, _, bits, name = audio._wav_decode(audio._wav_encode(s, 8000, "pcm8"))
    assert (bits, name) == (8, "pcm8")
    assert np.array_equal(dec, (s.astype(np.int32) >> 8) << 8)


def test_float32_roundtrip():
    s = _sig(200, 1)
    dec, rate, bits, name = audio._wav_decode(audio._wav_encode(s, 44100, "float32"))
    assert (rate, bits, name) == (44100, 32, "float32")
    assert dec.dtype == np.float64
    assert np.allclose(dec[:, 0], s[:, 0] / 32768.0, atol=1e-6)


def test_g711_companding_laws():
    """The published G.711 curves: full-table idempotence, error bounds,
    sign symmetry, and the canonical zero codes."""
    mt, at = audio._mulaw_decode_table(), audio._alaw_decode_table()
    codes = np.arange(256, dtype=np.uint8)
    # A-law: every code survives decode->encode exactly.
    assert np.array_equal(audio._alaw_encode(at[codes]), codes)
    # mu-law: same, at value level (0x7F and 0xFF both decode to zero; the
    # canonical encode of zero is 0xFF).
    assert np.array_equal(mt[audio._mulaw_encode(mt[codes])], mt[codes])
    assert audio._mulaw_encode(np.array([0]))[0] == 0xFF
    # quantization error bounded by the widest segment step (1024 at 16-bit)
    x = np.arange(-32768, 32768, 13, dtype=np.int16)
    assert np.max(np.abs(mt[audio._mulaw_encode(x)] - np.clip(x, -32635, 32635))) <= 1024
    assert np.max(np.abs(at[audio._alaw_encode(x)].astype(int) - x.astype(int))) <= 1024
    # sign symmetry: decode tables are odd functions over the code pairing
    assert np.array_equal(mt[audio._mulaw_encode(x)], -mt[audio._mulaw_encode(-x.astype(np.int32))])


def test_g711_wav_roundtrip_monotone():
    s = _sig(256, 2)
    for codec in ("mulaw", "alaw"):
        dec, rate, bits, name = audio._wav_decode(audio._wav_encode(s, 8000, codec))
        assert (rate, bits, name) == (8000, 8, codec)
        assert dec.shape == s.shape
        assert np.max(np.abs(dec - np.clip(s, -32635, 32635))) <= 1024


def test_decode_unavailable_boundaries():
    s = _sig(64)
    good = audio._wav_encode(s, 8000, "pcm16")
    # MP3-in-WAV: flip the format tag to 0x55
    mp3 = bytearray(good)
    mp3[20:22] = struct.pack("<H", 0x0055)
    cases = {
        "not riff": b"OggS" + bytes(40),
        "missing data": good[:20],
        "mp3": bytes(mp3),
    }
    # unknown EXTENSIBLE GUID
    ext = bytearray(audio._wav_encode(s, 8000, "extensible_pcm16"))
    pos = ext.index(audio._EXT_GUID_TAIL)
    ext[pos] ^= 0xFF
    cases["bad guid"] = bytes(ext)
    # zero channels
    zch = bytearray(good)
    zch[22:24] = struct.pack("<H", 0)
    cases["zero channels"] = bytes(zch)
    for label, payload in cases.items():
        with pytest.raises(DecodeUnavailable):
            audio._wav_decode(payload)
    assert audio._decode_or_none(cases["mp3"]) is None  # NULL-row contract


# ------------------------------------------------------------ spark stages


@pytest.fixture(scope="module")
def wav_df(spark):
    rows = [
        (0, audio._wav_encode(_sig(400, 1), 8000, "pcm16")),
        (1, audio._wav_encode(_sig(256, 2), 16000, "mulaw")),
        (2, audio._wav_encode(_sig(300, 1), 44100, "alaw")),
        (3, audio._wav_encode(_sig(128, 2), 8000, "pcm8")),
        (4, b"not audio at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_audio_metadata(wav_df):
    got = {r.doc_id: r for r in audio.decode_audio(wav_df).collect()}
    assert (got[0].codec, got[0].n_samples, got[0].channels, got[0].sample_rate) == (
        "pcm16", 400, 1, 8000,
    )
    assert got[0].duration_ms == 400 * 1000 // 8000
    assert (got[1].codec, got[1].channels, got[1].bits) == ("mulaw", 2, 8)
    assert (got[2].codec, got[2].sample_rate) == ("alaw", 44100)
    assert got[4].codec is None and got[4].n_samples is None  # NULL row


def test_audio_features_match_numpy(wav_df):
    got = {r.doc_id: r for r in audio.audio_features(wav_df).collect()}
    for doc_id, payload in [(0, None), (2, None)]:
        raw = wav_df.filter(f"doc_id = {doc_id}").collect()[0].payload
        x = audio._wav_decode(bytes(raw))[0][:, 0].astype(np.float64)
        r = got[doc_id]
        assert r.n_samples == x.shape[0]
        assert r.peak_abs == int(np.max(np.abs(x)))
        assert r.energy_sumsq == float(np.sum(x * x))
        sign = np.where(x >= 0, 1, -1)
        assert r.zero_crossings == int(np.count_nonzero(sign[1:] != sign[:-1]))
        assert r.rms == pytest.approx(np.sqrt(np.mean(x * x)))
    assert got[4].n_samples is None


def test_frame_energy_partitions_whole(wav_df):
    frames = [r for r in audio.frame_energy(wav_df, frame_ms=25).collect() if r.doc_id == 0]
    whole = {r.doc_id: r for r in audio.audio_features(wav_df).collect()}[0]
    # 8000 Hz * 25 ms = 200-sample frames; 400 samples -> exactly 2 frames
    assert sorted(f.frame_idx for f in frames) == [0, 1]
    assert all(f.n == 200 for f in frames)
    assert sum(f.energy_sumsq for f in frames) == pytest.approx(whole.energy_sumsq)
    assert max(f.peak_abs for f in frames) == whole.peak_abs


def test_resample_nearest_exact(wav_df, spark):
    out = audio.resample_audio(wav_df, 4000)
    dec = {r.doc_id: r for r in audio.decode_audio(out).collect()}
    # 400 samples @8k -> 200 @4k, integer mapping out[i] = in[2i]
    assert (dec[0].n_samples, dec[0].sample_rate, dec[0].codec) == (200, 4000, "pcm16")
    src = audio._wav_decode(bytes(wav_df.filter("doc_id = 0").collect()[0].payload))[0]
    res = audio._wav_decode(bytes(out.filter("doc_id = 0").collect()[0].payload))[0]
    assert np.array_equal(res[:, 0], src[::2, 0])
    assert dec[4].n_samples is None  # undecodable passes through as NULL


def test_dominant_frequency_pure_sine(spark):
    n, sr, k = 512, 8000, 37
    t = np.arange(n)
    sine = np.rint(3000 * np.sin(2 * np.pi * k * t / n)).astype(np.int16)
    df = spark.createDataFrame(
        [(1, audio._wav_encode(sine, sr, "pcm16"))], "doc_id long, payload binary"
    )
    r = audio.dominant_frequency(df).collect()[0]
    assert r.peak_bin == k
    assert r.peak_hz == pytest.approx(k * sr / n)


def test_synthetic_rotation_matches_formula(spark):
    """The synthesis parameters recomputed from doc_id — the exact
    relationship the driver oracle SQL expresses."""
    rows = [(i, f"document number {i}") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in audio.decode_audio(audio.synthetic_wav_payload(docs)).collect()}
    for i in range(12):
        r = out[i]
        assert r.n_samples == 256 + (i % 4) * 64
        assert r.channels == 1 + i % 2
        assert r.sample_rate == audio.SYNTH_RATES[i % 3]
        assert r.codec == audio.SYNTH_CODECS[i % 4]
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate


def test_audio_pipeline_plan_map_only(spark):
    """decode/features/resample are map-only: no Exchange, payload pruned
    to (id, payload) at the scan."""
    df = spark.createDataFrame(
        [(1, audio._wav_encode(_sig(64), 8000, "pcm16"), "extra")],
        "doc_id long, payload binary, other string",
    )
    for stage in (audio.decode_audio(df), audio.audio_features(df),
                  audio.frame_energy(df), audio.resample_audio(df, 4000)):
        plan = stage._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "MapInPandas" in plan


# --- IMA/DVI ADPCM ------------------------------------------------------------


def test_adpcm_roundtrip_lengths_and_determinism():
    """decode(encode(x)) preserves the exact sample count through the
    fact-chunk trim for every block-boundary shape (full blocks, partial
    final block, odd nibble count, single sample), and the encoder is
    deterministic."""
    import numpy as np

    t = np.arange(1200)
    x = (8000 * np.sin(t / 9.0)).astype(np.int16)
    for n in (1, 2, 3, 504, 505, 506, 509, 1009, 1013, 1200):
        w = audio._wav_encode(x[:n], 8000, "adpcm")
        s, rate, bits, name = audio._wav_decode(w)
        assert (name, rate, bits) == ("adpcm", 8000, 4)
        assert s.shape == (n, 1), n
        assert s[0, 0] == int(x[0])  # block header carries sample 0 verbatim
        assert audio._wav_encode(x[:n], 8000, "adpcm") == w


def test_adpcm_decoder_matches_audioop_bitwise():
    """The block decoder agrees BIT-FOR-BIT with CPython's independent
    DVI/IMA implementation (audioop) on our encoder's nibble stream —
    same step/index tables, same integer successive-approximation."""
    import struct

    import numpy as np

    audioop = pytest.importorskip("audioop")
    t = np.arange(709)
    x = (9000 * np.sin(t / 7.0) + 300 * np.sin(t / 2.0)).astype(np.int16)
    wav = audio._wav_encode(x, 8000, "adpcm")
    mine, *_ = audio._wav_decode(wav)
    mine = mine.ravel()

    data, ba = None, None
    i = 12
    while i + 8 <= len(wav):
        cid = wav[i : i + 4]
        (cs,) = struct.unpack("<I", wav[i + 4 : i + 8])
        body = wav[i + 8 : i + 8 + cs]
        if cid == b"fmt ":
            ba = struct.unpack("<HHIIHH", body[:16])[4]
        if cid == b"data":
            data = body
        i += 8 + cs + (cs & 1)
    ref = []
    for b0 in range(0, len(data), ba):
        blk = data[b0 : b0 + ba]
        pred, idx, _ = struct.unpack("<hBB", blk[:4])
        ref.append(pred)
        # audioop packs the FIRST nibble HIGH; IMA WAV packs LOW first
        swapped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in blk[4:])
        lin, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
        ref.extend(int(v) for v in np.frombuffer(lin, dtype="<i2"))
    assert list(mine) == ref[: len(mine)]


def test_adpcm_quality_in_family_with_audioop_encoder():
    """On the same signal, our encoder's reconstruction error is no worse
    than audioop's own encode->decode loop (both implement the spec's
    quantizer; ties in heuristics may differ per sample)."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    t = np.arange(508)
    x = (9000 * np.sin(t / 7.0) + 300 * np.sin(t / 2.0)).astype(np.int16)
    enc, _ = audioop.lin2adpcm(x.tobytes(), 2, None)
    dec, _ = audioop.adpcm2lin(enc, 2, None)
    ref_err = np.abs(
        np.frombuffer(dec, dtype="<i2").astype(int) - x.astype(int)
    ).mean()
    s, *_ = audio._wav_decode(audio._wav_encode(x, 8000, "adpcm"))
    my_err = np.abs(s.ravel() - x.astype(int)).mean()
    assert my_err <= ref_err * 1.05


def test_adpcm_stereo_roundtrip_and_channel_independence():
    """Stereo blocks: interleaved 4-byte nibble groups, independent
    per-channel quantizer state — so each stereo channel decodes
    BIT-IDENTICALLY to its own mono encode (block boundaries align
    because block_align scales with channel count), and every frame
    count round-trips through the fact trim."""
    import numpy as np

    t = np.arange(777)
    left = (9000 * np.sin(t / 7.0)).astype(np.int16)
    right = (5000 * np.cos(t / 11.0)).astype(np.int16)
    x = np.stack([left, right], axis=1)
    for n in (1, 2, 3, 250, 505, 506, 777):
        s, rate, bits, name = audio._wav_decode(
            audio._wav_encode(x[:n], 16000, "adpcm")
        )
        assert s.shape == (n, 2) and (name, bits) == ("adpcm", 4)
        assert s[0, 0] == int(x[0, 0]) and s[0, 1] == int(x[0, 1])
    ss, *_ = audio._wav_decode(audio._wav_encode(x, 16000, "adpcm"))
    for c, mono in ((0, left), (1, right)):
        sm, *_ = audio._wav_decode(audio._wav_encode(mono, 16000, "adpcm"))
        assert (ss[:, c] == sm.ravel()).all()


def test_adpcm_synthetic_rotation_matches_formula(spark):
    rows = [(i, f"adpcm doc {i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in audio.decode_audio(audio.synthetic_adpcm_payload(docs)).collect()
    }
    for i in range(10):
        r = out[i]
        assert r.codec == "adpcm" and r.bits == 4
        assert r.channels == 1 + i % 2
        assert r.n_samples == 256 + (i % 7) * 37
        assert r.sample_rate == audio.SYNTH_RATES[i % 3]
        assert r.duration_ms == r.n_samples * 1000 // r.sample_rate


def test_resample_rescales_high_bit_depth(spark):
    # ADVICE r8: pcm24/pcm32 decode at NATIVE scale; resample must rescale
    # (>>8 / >>16) before the int16 clip or the output saturates square.
    s = _sig(400, 1)
    # _wav_encode takes 16-bit-range input and promotes to the codec's
    # native scale itself; _wav_decode returns that NATIVE scale.
    rows = [
        (0, audio._wav_encode(s, 8000, "pcm24")),
        (1, audio._wav_encode(s, 8000, "pcm32")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: bytes(r.payload) for r in audio.resample_audio(df, 4000).collect()}
    for i in (0, 1):
        dec, rate, _bits, name = audio._wav_decode(out[i])
        assert (rate, name) == (4000, "pcm16")
        # back at 16-bit scale: every other source sample, unsaturated
        assert np.array_equal(dec[:, 0], s[::2, 0])
        assert np.abs(dec).max() < 32767  # a clipped square would pin at the rail


def test_frame_energy_null_row_for_undecodable(wav_df):
    # Module contract: decodable or NULL row — doc 4 is malformed and must
    # surface as ONE all-NULL frame row, not silently vanish.
    rows = [r for r in audio.frame_energy(wav_df, frame_ms=25).collect() if r.doc_id == 4]
    assert len(rows) == 1
    r = rows[0]
    assert r.frame_idx is None and r.n is None
    assert r.peak_abs is None and r.energy_sumsq is None
