"""Bloom-filter decontamination (Bloom 1970; the PaLM/GPT-3 style
exact-match decontamination pass run through a compact membership
summary instead of a full anti-join).

The benchmark side is summarized once into its set of Bloom bit
positions — ``n_bench * k`` positions, at most ``m`` distinct — and
broadcast; the corpus streams against it with NO shuffle of corpus
rows. A corpus document is *flagged* when all ``k`` of its positions
are set. Bloom's one-sided error holds by construction: every true
exact duplicate is flagged (no false negatives), and the operator
REPORTS its false-positive count against the exact join so the
precision trade is measured, not argued (the same audit discipline as
the ANN recall curves).

Hashing is the portable md5-chunk convention (operators/freq.py): the
j-th position of key ``x`` is the j-th disjoint 8-hex-char chunk of
md5(x) mod m, identical in DuckDB — flag decisions are deterministic
and the whole audit is oracle-checkable.

At 100 TB the bit-position relation for a benchmark of B docs is
min(B*k, m) rows — for real benchmarks (thousands of docs) this is
kilobytes against a corpus of billions, which is the entire point:
the corpus-side pass is one broadcast-join + map-side-combined
aggregation per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_M = 4096
BLOOM_K = 4


def _positions(col, k: int, m: int):
    """The k Bloom positions of a string column as an array column."""
    return F.array(
        *[
            F.conv(F.substring(F.md5(col), 1 + 8 * j, 8), 16, 10).cast("long") % m
            for j in range(k)
        ]
    )


def bench_bits(bench: DataFrame, key: str, k: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """The benchmark's set bit positions: distinct ints in [0, m)."""
    if not 1 <= k <= 4:
        raise ValueError("k must be in 1..4 (md5 has four 32-bit chunks)")
    return (
        bench.select(F.explode(_positions(F.col(key), k, m)).alias("bit"))
        .distinct()
    )


def bloom_contamination_audit(
    corpus: DataFrame,
    bench: DataFrame,
    key: str = "text",
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """One-row audit: corpus size, Bloom-flagged count, exact-duplicate
    count, and the measured false-positive count.

    ``n_false_pos = n_flagged - n_exact_dup`` is well-defined because
    Bloom has no false negatives (every exact duplicate's positions
    are all set). The exact side reuses the same broadcast pattern on
    the raw keys, so both passes stream the corpus once each with
    bounded broadcast state.
    """
    bits = bench_bits(bench, key, k, m).withColumn("_set", F.lit(True))

    fan = corpus.select(
        F.col(key).alias("_key"),
        F.explode(_positions(F.col(key), k, m)).alias("bit"),
    )
    flagged = (
        fan.join(F.broadcast(bits), "bit", "left")
        .groupBy("_key")
        .agg(
            F.count(F.lit(1)).alias("_n_pos"),
            F.sum(F.when(F.col("_set"), 1).otherwise(0)).alias("_n_hit"),
        )
        .withColumn("_flagged", F.col("_n_hit") == F.col("_n_pos"))
    )

    exact = bench.select(F.col(key).alias("_key")).distinct().withColumn(
        "_dup", F.lit(True)
    )
    audited = flagged.join(F.broadcast(exact), "_key", "left")

    return audited.agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus_keys"),
        F.sum(F.when(F.col("_flagged"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_exact_dup"),
        F.sum(F.when(F.col("_flagged") & F.col("_dup").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    )
