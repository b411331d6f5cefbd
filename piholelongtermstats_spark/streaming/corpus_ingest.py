"""Streaming training-corpus ingest: documents arrive continuously,
get quality-gated and exact-deduplicated ON THE WAY IN, so the
at-rest corpus never accumulates junk or re-delivered duplicates.

The gate is `corpus.quality_gate` — the SAME expression tree the
batch `corpus_build` uses (batch ≡ stream by construction, pinned by
test). Dedup is keyed on the 60-bit content fingerprint with
`dropDuplicatesWithinWatermark`: state is bounded by the watermark
horizon (the unbounded-state trap of plain dropDuplicates on a
stream), so a re-delivered or re-crawled document inside the horizon
is suppressed; older re-sends age out of state and are the sink's
idempotency problem — exactly the contract of
`sessions.streaming_dedup` for events, applied to content identity
instead of event identity.

At 100 TB/day ingest this is the shape you want: both stages are
map-side until the dedup state lookup (hash-partitioned by
fingerprint — high cardinality, no skew), and nothing re-reads the
at-rest corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from piholelongtermstats_spark.operators.corpus import quality_gate

# documents-with-arrival-time schema: the batch `documents` table plus
# the source-assigned ingest timestamp the watermark runs on.
DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)


def streaming_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType = DOC_STREAM_SCHEMA,
    min_tokens: int = 10,
    stop_num: int = 6,
    stop_den: int = 10,
    watermark: str = "1 hour",
    classifier_gate: bool = False,
) -> DataFrame:
    """File-source streaming ingest → quality gate → (optional
    model-based keep gate) → fingerprint dedup within the watermark
    horizon. Returns the streaming DataFrame; callers attach the sink
    (append mode).

    ``classifier_gate=True`` additionally drops documents the
    hashed-linear classifier rejects (text.quality_classifier's
    integer-exact keep rule, evaluated inline on the stream — a pure
    per-row projection, so batch ≡ stream by construction, pinned by
    test). This is the heuristics-then-model gate order a production
    ingest runs: cheap rules first, model score second, dedup last
    (state is the expensive stage; feed it as little as possible)."""
    docs = spark.readStream.schema(schema).parquet(source_dir)
    gated = quality_gate(docs, min_tokens, stop_num, stop_den)
    if classifier_gate:
        from pyspark.sql import functions as F

        from piholelongtermstats_spark.operators.text import md5_hash60, tokens

        clf_sum = F.aggregate(
            tokens(F.col("text")),
            F.lit(0).cast("long"),
            lambda acc, t: acc + (md5_hash60(t) % 2001 - 1000),
        )
        gated = gated.filter(clf_sum >= 0)
    return gated.withWatermark(
        "ingest_ts", watermark
    ).dropDuplicatesWithinWatermark(["fingerprint"])
