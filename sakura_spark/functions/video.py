"""Real video decode + frame sampling over binary AVI payloads.

The video leg of the multimodal stack (images: `multimodal.py`, audio:
`audio.py`): video is an opaque `binary` column; container parse / frame
decode / frame-sample run as Arrow-batched `mapInPandas` stages over only
`(id, payload)`.

The container codec is REAL, pure stdlib struct + numpy (no ffmpeg/OpenCV):

- AVI RIFF walk (word-aligned chunks): LIST hdrl -> `avih` MainAVIHeader,
  LIST strl -> `strh` AVIStreamHeader ('vids') + `strf` BITMAPINFOHEADER,
  LIST movi -> per-frame `00db`/`00dc` chunks, trailing `idx1` index
  (validated against the actual chunk offsets when present). The layouts
  are the public Microsoft "AVI RIFF File Reference" / Video-for-Windows
  structures (WinGDI BITMAPINFOHEADER, avifmt.h AVIMAINHEADER /
  AVISTREAMHEADER) — no proprietary fields.
- Uncompressed DIB frames (biCompression=0, BI_RGB, 24 bpp): bottom-up
  scanline order, BGR byte order, rows padded to 4-byte boundaries —
  decoded to top-down RGB uint8 (h, w, 3) exactly.
- MJPEG frames (biCompression='MJPG'): each `00dc` chunk is a standalone
  baseline JPEG, delegated to the in-repo T.81 decoder
  (`multimodal._jpeg_decode`) — the same codec the image stack ships.
- Any other compression fourcc (XVID, H264, ...) raises
  `DecodeUnavailable` — the honest stub boundary; those codecs' libraries
  are not in this environment.

Reference parity: the reference stores media as opaque payloads with typed
metadata (docs/architecture.org media notes) and has no codecs at all; the
decode capability is this engine's extension surface, mirrored on the
image/audio legs.

At 100 TB the design rules match the image/audio stacks: payloads never
cross a shuffle (every stage is map-only over pruned columns; frame stats
explode rows AFTER the payload is dropped), Arrow batch size governs
executor memory (spark.sql.execution.arrow.maxRecordsPerBatch), and the
executor-side contract is 'decodable or NULL row', never a failed batch on
malformed bytes. Undecodable payloads yield one all-NULL row from every
stage (including the frame exploder), so join-back callers can tell
"empty" from "malformed" — the module-wide contract the audio stack pins.

Oracle strategy (same scheme as `audio.synthetic_wav_payload`): the
synthetic corpus generator derives every parameter — dimensions, fps,
frame count, and every PIXEL value — as a pure function of the row id, so
plain SQL reproduces the decoder's outputs in closed form and a driver
hash match proves the real container encoder and the real parser/decoder
agree payload-for-payload, including scanline order (bottom-up flip), BGR
channel order, and row padding:

    width    = 7 + (id % 3) * 3          -> 7, 10, 13  (row strides 21,
                                            30, 39 bytes: pads 3, 2, 1 —
                                            every padding case exercised)
    height   = 6 + (id % 2) * 5          -> 6, 11
    fps      = (10, 15, 25)[id % 3]      (rate; scale = 1)
    n_frames = 3 + id % 5                -> 3..7
    pixel[f][y][x][c] = (id*31 + f*17 + (y*width + x)*3 + c) % 256
                        (y = 0 at the TOP, c in RGB order)

A plain sum over pixels has a closed form (the values walk 0..255
cyclically), and the probes `first_pixel` (frame f at [0, 0, R]) and
`row0_sum` (frame 0's top row) are order-SENSITIVE: a decoder that forgot
the bottom-up flip, swapped BGR->RGB, or mis-stripped padding fails the
hash even though the plain sum is permutation-blind.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from sakura_spark.functions.multimodal import DecodeUnavailable, _jpeg_decode

# Public Video-for-Windows constants (avifmt.h / WinGDI — public headers).
_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010
_BI_RGB = 0


def _pad_word(b: bytes) -> bytes:
    return b + b"\x00" * (len(b) & 1)


def _chunk(ckid: bytes, payload: bytes) -> bytes:
    return ckid + struct.pack("<I", len(payload)) + _pad_word(payload)


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def _dib_encode_frame(arr, top_down: bool = False) -> bytes:
    """(h, w, 3) top-down RGB uint8 -> BI_RGB DIB frame bytes: bottom-up
    rows (or top-down when ``top_down`` — the negative-biHeight layout),
    BGR order, each row zero-padded to a 4-byte boundary."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1] if top_down else arr[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return rows.tobytes()


def _dib_decode_frame(b: bytes, w: int, h: int, top_down: bool = False):
    """BI_RGB 24bpp DIB frame bytes -> top-down RGB uint8 (h, w, 3).
    ``top_down`` is the WinGDI negative-biHeight layout: rows already
    top-down, so the bottom-up flip is skipped (ADVICE r9: flipping
    unconditionally silently inverted valid top-down DIB AVIs).
    Rejects payloads whose size disagrees with the padded stride."""
    import numpy as np

    stride = (w * 3 + 3) & ~3
    if len(b) != stride * h:
        raise DecodeUnavailable(
            f"DIB frame size {len(b)} != stride {stride} x height {h}"
        )
    rows = np.frombuffer(b, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1] if top_down else bgr[::-1, :, ::-1]
    return rgb.copy()


def _avi_encode(
    frames,
    rate: int,
    scale: int = 1,
    codec: str = "dib",
    audio=None,
    top_down: bool = False,
) -> bytes:
    """Frames (list of top-down RGB uint8 (h, w, 3) arrays, equal dims) ->
    a REAL AVI: RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh 'vids',
    strf BITMAPINFOHEADER } [, LIST strl { strh 'auds', strf
    PCMWAVEFORMAT }] }, LIST movi { '00db'|'00dc' frames [interleaved
    with '01wb' audio] }, idx1 }. ``codec`` is 'dib' (BI_RGB frames built
    here) or 'mjpg' (each frame must already be JPEG bytes). ``audio`` is
    an optional (int16 mono samples, sample_rate) pair; samples are split
    into one '01wb' chunk per video frame and interleaved frame-by-frame
    — the layout real muxers write so players can stream without
    seeking."""
    import numpy as np

    if codec == "dib":
        h, w, _ = np.asarray(frames[0]).shape
        payloads = [_dib_encode_frame(f, top_down=top_down) for f in frames]
        ckid, compression, handler = b"00db", _BI_RGB, b"DIB "
    elif codec == "mjpg":
        first = _jpeg_decode(frames[0])
        h, w = first.shape[0], first.shape[1]
        payloads = [bytes(f) for f in frames]
        ckid = b"00dc"
        compression = struct.unpack("<I", b"MJPG")[0]
        handler = b"MJPG"
    else:
        raise ValueError(f"unknown codec {codec!r}")

    stride = (w * 3 + 3) & ~3
    n = len(payloads)
    maxbuf = max(len(p) for p in payloads)

    audio_chunks: list[bytes] = []
    if audio is not None:
        samples, audio_rate = audio
        samples = np.asarray(samples, dtype="<i2")
        n_samples = samples.shape[0]
        # One audio chunk per video frame (last one ragged), interleaved.
        per = -(-n_samples // n)
        audio_chunks = [
            samples[i * per : (i + 1) * per].tobytes() for i in range(n)
        ]

    # movi body + idx1 offsets (convention: offset of the ckid relative
    # to the 'movi' fourcc — the form Video-for-Windows itself writes).
    movi_body = b""
    idx_entries = []
    for i, p in enumerate(payloads):
        off = 4 + len(movi_body)
        idx_entries.append((ckid, off, len(p)))
        movi_body += _chunk(ckid, p)
        if audio_chunks and audio_chunks[i]:
            off = 4 + len(movi_body)
            idx_entries.append((b"01wb", off, len(audio_chunks[i])))
            movi_body += _chunk(b"01wb", audio_chunks[i])
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            ck + struct.pack("<III", _AVIIF_KEYFRAME, off, sz)
            for ck, off, sz in idx_entries
        ),
    )

    # AVIMAINHEADER (avifmt.h): 14 DWORDs after the fourcc+size.
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 * scale // rate,  # dwMicroSecPerFrame
            maxbuf * rate // scale,     # dwMaxBytesPerSec
            0,                          # dwPaddingGranularity
            _AVIF_HASINDEX,             # dwFlags
            n,                          # dwTotalFrames
            0,                          # dwInitialFrames
            2 if audio is not None else 1,  # dwStreams
            maxbuf,                     # dwSuggestedBufferSize
            w,
            h,
            0, 0, 0, 0,                 # dwReserved[4]
        ),
    )
    # AVISTREAMHEADER: fccType/fccHandler + 8 DWORDs + 2 DWORDs
    # (quality, sampleSize) + rcFrame (4 int16).
    strh = _chunk(
        b"strh",
        b"vids"
        + handler
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,      # dwFlags
            0, 0,   # wPriority, wLanguage
            0,      # dwInitialFrames
            scale,  # dwScale
            rate,   # dwRate
            0,      # dwStart
            n,      # dwLength (frames)
            maxbuf, # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,      # dwSampleSize (0: one sample per chunk)
            0, 0, w, h,  # rcFrame
        ),
    )
    # BITMAPINFOHEADER (WinGDI): biHeight POSITIVE -> bottom-up DIB,
    # NEGATIVE -> top-down (rows stored first-row-first).
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHHIIiiII",
            40, w, -h if top_down else h, 1, 24, compression,
            stride * h, 0, 0, 0, 0
        ),
    )
    strls = _list(b"strl", strh + strf)
    if audio is not None:
        samples, audio_rate = audio
        n_samples = int(np.asarray(samples).shape[0])
        a_strh = _chunk(
            b"strh",
            b"auds"
            + b"\x00\x00\x00\x00"
            + struct.pack(
                "<IHHIIIIIIII4H",
                0, 0, 0, 0,
                1,            # dwScale (1 sample)
                audio_rate,   # dwRate (samples/sec)
                0,
                n_samples,    # dwLength (samples)
                2 * n_samples // max(n, 1) + 2,
                0xFFFFFFFF,
                2,            # dwSampleSize (bytes per PCM16 mono sample)
                0, 0, 0, 0,
            ),
        )
        # PCMWAVEFORMAT (mmreg.h): the classic 16-byte PCM strf.
        a_strf = _chunk(
            b"strf",
            struct.pack("<HHIIHH", 1, 1, audio_rate, 2 * audio_rate, 2, 16),
        )
        strls += _list(b"strl", a_strh + a_strf)
    hdrl = _list(b"hdrl", avih + strls)
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_chunks(b: bytes, start: int, end: int):
    """Yield (ckid, payload_start, payload_size) over a word-aligned RIFF
    chunk span; malformed sizes raise (normalized by callers)."""
    pos = start
    while pos + 8 <= end:
        ckid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + size > end:
            raise DecodeUnavailable(f"chunk {ckid!r} overruns its parent")
        yield ckid, pos + 8, size
        pos += 8 + size + (size & 1)


def _avi_decode(b: bytes):
    """AVI payload -> (meta dict, list of top-down RGB uint8 frames).

    meta: codec ('dib'|'mjpg'), width, height, fps_num (dwRate), fps_den
    (dwScale), n_frames — plus, when the file carries an interleaved
    'auds' PCM16 stream, audio_rate / n_audio_samples / audio_samples
    (the demuxed int16 array, '01wb' chunks re-concatenated in stream
    order). Parses the REAL structures: avih, the first 'vids' strh/strf
    pair, the first 'auds' strh/strf pair, every movi chunk, and — when
    idx1 is present — validates each index entry's ckid/offset/size
    against the actual chunk layout across BOTH streams (a lying index
    is a malformed file). Unsupported video compression fourccs and
    non-PCM16-mono audio raise DecodeUnavailable."""
    import numpy as np

    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise DecodeUnavailable("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    end = min(len(b), 8 + riff_size)

    avih = None
    strh = None
    strf = None
    a_strh = None
    a_strf = None
    in_vids = in_auds = False
    stream_chunks = []  # (offset_rel_to_movi_fourcc, ckid, payload)
    idx1 = None

    for ckid, p, size in _walk_chunks(b, 12, end):
        if ckid == b"LIST":
            listtype = b[p : p + 4]
            if listtype == b"hdrl":
                for c2, p2, s2 in _walk_chunks(b, p + 4, p + size):
                    if c2 == b"avih":
                        avih = b[p2 : p2 + s2]
                    elif c2 == b"LIST" and b[p2 : p2 + 4] == b"strl":
                        in_vids = in_auds = False
                        for c3, p3, s3 in _walk_chunks(b, p2 + 4, p2 + s2):
                            if c3 == b"strh" and b[p3 : p3 + 4] == b"vids" and strh is None:
                                strh = b[p3 : p3 + s3]
                                in_vids = True
                            elif c3 == b"strh" and b[p3 : p3 + 4] == b"auds" and a_strh is None:
                                a_strh = b[p3 : p3 + s3]
                                in_auds = True
                            elif c3 == b"strf" and in_vids and strf is None:
                                strf = b[p3 : p3 + s3]
                            elif c3 == b"strf" and in_auds and a_strf is None:
                                a_strf = b[p3 : p3 + s3]
            elif listtype == b"movi":
                movi_fourcc = p  # offsets in idx1 are relative to here
                for c2, p2, s2 in _walk_chunks(b, p + 4, p + size):
                    if c2[2:4] in (b"db", b"dc", b"wb") and c2[:2].isdigit():
                        stream_chunks.append((p2 - 8 - movi_fourcc, c2, b[p2 : p2 + s2]))
        elif ckid == b"idx1":
            idx1 = b[p : p + size]

    if avih is None or strh is None or strf is None:
        raise DecodeUnavailable("missing avih/strh/strf headers")
    if len(strh) < 40 or len(strf) < 40:
        raise DecodeUnavailable("truncated stream headers")

    scale, rate, _start, length = struct.unpack_from("<IIII", strh, 20)
    biw, bih = struct.unpack_from("<ii", strf, 4)
    bitcount, compression = struct.unpack_from("<HI", strf, 14)
    if scale == 0 or rate == 0:
        raise DecodeUnavailable("zero dwScale/dwRate")

    if compression == _BI_RGB:
        if bitcount != 24:
            raise DecodeUnavailable(f"unsupported DIB bit depth {bitcount}")
        codec = "dib"
    elif struct.pack("<I", compression) in (b"MJPG", b"mjpg"):
        codec = "mjpg"
    else:
        raise DecodeUnavailable(
            f"no decoder for compression {struct.pack('<I', compression)!r}"
        )

    h = abs(bih)
    top_down = bih < 0  # WinGDI: negative biHeight -> top-down DIB
    if idx1 is not None:
        if len(idx1) != 16 * len(stream_chunks):
            raise DecodeUnavailable("idx1 entry count != movi chunk count")
        for i, (off, ckid, payload) in enumerate(stream_chunks):
            ick, _fl, ioff, isz = struct.unpack_from("<4sIII", idx1, 16 * i)
            if ick != ckid or ioff != off or isz != len(payload):
                raise DecodeUnavailable("idx1 disagrees with movi layout")

    frames = []
    audio_parts = []
    for _off, ckid, payload in stream_chunks:
        if ckid[2:4] == b"wb":
            audio_parts.append(payload)
        elif codec == "dib":
            frames.append(_dib_decode_frame(payload, biw, h, top_down=top_down))
        else:
            arr = _jpeg_decode(payload)
            if arr.ndim == 2:
                arr = arr[:, :, None].repeat(3, axis=2)
            frames.append(arr)

    if length != len(frames):
        raise DecodeUnavailable(
            f"strh dwLength {length} != decoded frame count {len(frames)}"
        )
    meta = {
        "codec": codec,
        "width": biw,
        "height": h,
        "fps_num": rate,
        "fps_den": scale,
        "n_frames": len(frames),
    }
    if a_strh is not None:
        if a_strf is None or len(a_strf) < 16 or len(a_strh) < 40:
            raise DecodeUnavailable("auds stream without a sound strf")
        wtag, nch, a_rate, _avg, _align, a_bits = struct.unpack_from(
            "<HHIIHH", a_strf, 0
        )
        if wtag != 1 or nch != 1 or a_bits != 16:
            raise DecodeUnavailable(
                f"no decoder for AVI audio format tag={wtag} ch={nch} bits={a_bits}"
            )
        a_length = struct.unpack_from("<I", a_strh, 32)[0]
        raw = b"".join(audio_parts)
        samples = np.frombuffer(raw, dtype="<i2")
        if samples.shape[0] != a_length:
            raise DecodeUnavailable(
                f"auds dwLength {a_length} != demuxed sample count {samples.shape[0]}"
            )
        meta["audio_rate"] = a_rate
        meta["n_audio_samples"] = int(samples.shape[0])
        meta["audio_samples"] = samples
    elif audio_parts:
        raise DecodeUnavailable("audio chunks without an auds stream header")
    return meta, frames


SYNTH_FPS = (10, 15, 25)


def _synth_params(i: int) -> tuple[int, int, int, int]:
    """(width, height, rate, n_frames) for row id ``i`` — the pure
    id-rotation the driver oracle reproduces in SQL."""
    return 7 + (i % 3) * 3, 6 + (i % 2) * 5, SYNTH_FPS[i % 3], 3 + i % 5


def _synth_frame(i: int, f: int, w: int, h: int):
    """Frame ``f`` of row ``i``: pixel[y][x][c] = (i*31 + f*17 +
    (y*w + x)*3 + c) % 256, top-down RGB."""
    import numpy as np

    base = i * 31 + f * 17
    return ((base + np.arange(3 * w * h)) % 256).astype(np.uint8).reshape(h, w, 3)


def synthetic_avi_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic video-corpus generator, the AVI twin of
    `audio.synthetic_wav_payload`: every parameter and every pixel is a
    pure function of the row id (see the module docstring's rotation
    table), wrapped in a REAL AVI container with uncompressed BI_RGB
    frames and a validated idx1 index. Map-only mapInPandas; widened to
    core parallelism for narrow inputs (same policy as the image/audio
    generators)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h, rate, n = _synth_params(i)
                frames = [_synth_frame(i, f, w, h) for f in range(n)]
                payloads.append(_avi_encode(frames, rate))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    src = df.select(id_col)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    return src.mapInPandas(op, schema=f"{id_col} long, payload binary")


VIDEO_META_SCHEMA = (
    "doc_id long, codec string, n_frames long, width int, height int, "
    "fps_num int, fps_den int, duration_ms long, pixel_checksum long, "
    "first_pixel long, row0_sum long"
)


def decode_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Full video decode -> integer-exact metadata + content probes:
    container fields (codec, dims, fps as rate/scale, frame count,
    duration_ms = n_frames * 1000 * scale // rate) plus three pixel
    aggregates computed from the ACTUAL decoded frames — `pixel_checksum`
    (sum of every pixel value over every frame), `first_pixel` (frame 0
    at [0, 0, R]) and `row0_sum` (frame 0's top row, all channels). The
    probes are scanline-order- and channel-order-sensitive: a decoder
    that skipped the bottom-up flip or the BGR swap produces the right
    checksum but the wrong probes. NULL row for undecodable payloads
    (module contract). Arrow-batched mapInPandas over (id, payload);
    payloads never shuffle."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                try:
                    meta, frames = _avi_decode(b)
                except DecodeUnavailable:
                    rows.append((int(i),) + (None,) * 10)
                    continue
                except Exception:
                    rows.append((int(i),) + (None,) * 10)
                    continue
                checksum = int(sum(int(fr.sum(dtype=np.int64)) for fr in frames))
                rows.append(
                    (
                        int(i),
                        meta["codec"],
                        meta["n_frames"],
                        meta["width"],
                        meta["height"],
                        meta["fps_num"],
                        meta["fps_den"],
                        meta["n_frames"] * 1000 * meta["fps_den"] // meta["fps_num"],
                        checksum,
                        int(frames[0][0, 0, 0]) if frames else None,
                        int(frames[0][0].sum(dtype=np.int64)) if frames else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "codec", "n_frames", "width", "height",
                    "fps_num", "fps_den", "duration_ms", "pixel_checksum",
                    "first_pixel", "row0_sum",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(op, schema=VIDEO_META_SCHEMA)


FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx long, width int, height int, "
    "pixel_sum long, first_pixel long"
)


def video_frame_stats(
    df: DataFrame, every_n: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling — the video analog of audio.frame_energy: decode,
    keep every ``every_n``-th frame (frame_idx % every_n == 0), one
    output row per kept frame with its dims, pixel sum and first-pixel
    probe. Undecodable payloads emit ONE all-NULL frame row (the
    module's decodable-or-NULL-row contract), so join-back callers can
    tell "no frames" from "malformed". Map-only explode: output rows ~
    n_frames/every_n per doc; the payload is pruned before any
    downstream shuffle."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                try:
                    meta, frames = _avi_decode(b)
                except Exception:
                    rows.append((int(i), None, None, None, None, None))
                    continue
                for f, fr in enumerate(frames):
                    if f % every_n:
                        continue
                    rows.append(
                        (
                            int(i),
                            f,
                            meta["width"],
                            meta["height"],
                            int(fr.sum(dtype=np.int64)),
                            int(fr[0, 0, 0]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "width", "height",
                    "pixel_sum", "first_pixel",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(op, schema=FRAME_STATS_SCHEMA)


def _synth_audio_params(i: int) -> tuple[int, int]:
    """(n_samples, audio_rate) for row id ``i`` — the audio half of the
    A/V synthesis rotation: n = 240 + (i % 5) * 40, rate in {8000, 16000}."""
    return 240 + (i % 5) * 40, (8000, 16000)[i % 2]


def _synth_audio(i: int, n: int):
    """Audio track of row ``i``: sample[j] = ((i*13 + j) % 256) - 128 —
    the same cyclic-walk family as the pixels, so sums have the same
    closed form (shifted by -128 per sample)."""
    import numpy as np

    return (((i * 13 + np.arange(n)) % 256) - 128).astype("<i2")


def synthetic_av_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic A/V corpus generator: the video rotation of
    `synthetic_avi_payload` plus an interleaved PCM16 mono 'auds' stream
    (one '01wb' chunk per frame — the streaming-friendly layout real
    muxers write). Every pixel AND every audio sample is a pure function
    of the row id, so the demuxer's outputs have plain-SQL closed forms.
    Map-only mapInPandas, widened to core parallelism."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                w, h, rate, n = _synth_params(i)
                ns, arate = _synth_audio_params(i)
                frames = [_synth_frame(i, f, w, h) for f in range(n)]
                payloads.append(
                    _avi_encode(frames, rate, audio=(_synth_audio(i, ns), arate))
                )
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    src = df.select(id_col)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < parallelism:
        src = src.repartition(parallelism)
    return src.mapInPandas(op, schema=f"{id_col} long, payload binary")


AV_DEMUX_SCHEMA = (
    "doc_id long, n_frames long, width int, height int, "
    "n_audio_samples long, audio_rate int, "
    "video_checksum long, audio_checksum long, audio_first long"
)


def demux_av(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """A/V DEMUX: split an interleaved AVI into its video and audio
    streams in one pass — per doc, the video dims/frame count and
    whole-stream pixel checksum PLUS the re-concatenated audio track's
    sample count, rate, integer-exact sample sum and first-sample probe.
    The idx1 cross-validation and the per-stream dwLength checks make a
    chunk mis-attributed to the wrong stream a decode error, not a
    silent corruption. NULL row for undecodable payloads. Arrow-batched
    mapInPandas over (id, payload); payloads never shuffle."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                try:
                    meta, frames = _avi_decode(b)
                    audio = meta["audio_samples"]
                except Exception:
                    # includes KeyError for a file with no auds stream:
                    # "no audio to demux" is a NULL row, not a failure.
                    rows.append((int(i),) + (None,) * 8)
                    continue
                rows.append(
                    (
                        int(i),
                        meta["n_frames"],
                        meta["width"],
                        meta["height"],
                        meta["n_audio_samples"],
                        meta["audio_rate"],
                        int(sum(int(fr.sum(dtype=np.int64)) for fr in frames)),
                        int(audio.astype(np.int64).sum()),
                        int(audio[0]) if audio.shape[0] else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "width", "height",
                    "n_audio_samples", "audio_rate",
                    "video_checksum", "audio_checksum", "audio_first",
                ],
            )

    return df.select(id_col, "payload").mapInPandas(op, schema=AV_DEMUX_SCHEMA)


def frames_to_png(
    df: DataFrame, every_n: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Video -> image-corpus handoff: decode the AVI, keep every
    ``every_n``-th frame, re-encode each kept frame as a standalone PNG
    payload (multimodal._png_encode — the same lossless codec the image
    stack ships), one row per frame: (id, frame_idx, png payload). The
    output feeds the image pipeline unchanged (decode_image /
    resize_image / fake_image_features), which is how a training
    pipeline turns video corpora into image training rows. PNG is
    lossless, so decode_image(frames_to_png(x)) round-trips the exact
    DIB pixels (asserted in tests). Map-only; undecodable payloads emit
    one all-NULL frame row (module contract)."""
    from sakura_spark.functions.multimodal import _png_encode

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                try:
                    _meta, frames = _avi_decode(b)
                except Exception:
                    rows.append((int(i), None, None))
                    continue
                for f, fr in enumerate(frames):
                    if f % every_n:
                        continue
                    rows.append((int(i), f, _png_encode(fr)))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "payload"])

    return df.select(id_col, "payload").mapInPandas(
        op, schema=f"{id_col} long, frame_idx long, payload binary"
    )
