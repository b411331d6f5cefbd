"""Multimodal (binary) column plumbing (M7).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing here — schemas, Arrow-batched mapInPandas,
partition sizing — is real and tested; the actual media decode is
STUBBED (the container has no image/audio libraries): decode_stub
raises NotImplementedError unless ``fake=True``, in which case it
produces a deterministic fake feature vector so the pipeline shape is
testable end-to-end.

Scale notes: binary payloads dominate partition size — repartition so
``rows × avg_payload ≤ spark.sql.files.maxPartitionBytes`` before the
UDF stage; mapInPandas streams Arrow batches so peak memory is
one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text as a binary payload so the media
    pipeline has a driver-testdata input (no media files ship in the
    test set)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bucket byte sums.

    Replace with PIL/librosa/ffmpeg decode in a real deployment —
    signature and batch shape stay identical.
    """
    if not payload:
        return [0.0] * dim
    return [
        float(sum(payload[i::dim]) % 997) for i in range(dim)
    ]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The real decode path is NOT implemented (no media libs in this
    container); ``fake=True`` substitutes the deterministic fake so
    the distributed plumbing (schema, batching, nullability) is
    exercised for real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg; "
                    "run with fake=True for the deterministic stub"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(p if p is not None else b"")
                    ),
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def byte_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass (no UDF): payload sizes per mime type —
    the cheap first look any media pipeline runs before decoding."""
    return media.groupBy("mime").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(
            F.sum(F.length("payload")).cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_bytes"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Arrow-batched image resize (STUB decode: payload passes through,
    target dims computed from metadata with aspect preserved; a real
    deployment swaps the body for PIL thumbnail — batch shape, schema,
    and the metadata arithmetic are the real contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].fillna(max_side).astype("int64")
            h = pdf["height"].fillna(max_side).astype("int64")
            scale = (max_side / w.where(w >= h, h)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: no real decode
                    "width": (w * scale).astype("int32"),
                    "height": (h * scale).astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, duration_ms: int = 5000
) -> DataFrame:
    """Video frame sampling as a flatMap: each media row fans out to
    one row per sampled frame (frame_idx, frame_ts_ms). Decode is
    STUBBED — each frame's payload is a deterministic slice of the
    source payload — but the row-expansion shape (the part that
    matters for partition sizing: output rows = input × frames) is
    real. A production version bounds fan-out with maxRecordsPerBatch
    and repartitions by media_id first."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "payload": []}
            for _, r in pdf.iterrows():
                payload = r["payload"] or b""
                n = max(len(payload), 1)
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    lo = (i * 16) % n
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(ts)
                    rows["payload"].append(bytes(payload[lo : lo + 16]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
