"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/resize/frame-sample kernels need codec libraries that are
NOT in this container — they are stubbed behind ``_HAS_CODECS`` with a
deterministic fake, clearly marked. Everything Spark-side is real and
tested: the schema convention, the Arrow-batched ``mapInPandas``
operator shape, batch-size control, and partition-friendly layout.

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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - codec libs absent in this container
    import PIL.Image  # noqa: F401

    _HAS_CODECS = True
except ImportError:
    _HAS_CODECS = False

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
    "feature array<double>"
)


def build_media_table(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from `documents`: the text
    payload stands in for encoded bytes (the container has no codecs),
    with plausible typed metadata. Real pipelines replace this with a
    parquet/object-store scan."""
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


def _decode_features(payload: bytes, kind: str) -> list[float]:
    """Decode + featurize one payload.

    STUB: with codec libs installed this would decode the image/audio
    and emit a real feature vector. Without them we emit a
    deterministic 8-dim byte-histogram sketch so the distributed
    plumbing (batching, schema, ordering) is fully exercisable.
    """
    if _HAS_CODECS:  # pragma: no cover
        raise NotImplementedError(
            "real decode path requires PIL/librosa/av — not in this container"
        )
    if payload is None:
        return [0.0] * 8
    buckets = [0] * 8
    for b in payload:
        buckets[b & 7] += 1
    n = max(len(payload), 1)
    return [round(c / n, 6) for c in buckets]


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the payload bytes in columnar Arrow buffers
    end-to-end; one Python invocation per batch, not per row. This is
    the canonical shape for any decode-heavy multimodal pass.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "payload_md5": pdf["payload"].map(
                        lambda p: __import__("hashlib").md5(p or b"").hexdigest()
                    ),
                    "feature": pdf.apply(
                        lambda r: _decode_features(r["payload"], r["kind"]), axis=1
                    ),
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
