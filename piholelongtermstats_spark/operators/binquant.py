"""Binary (sign-bit) quantization ANN — the 1-bit-per-dimension
compression tier of the vector family (SQ8's harder sibling,
operators/pq.py's cheaper one).

Each embedding is packed to ``dim/32`` BIGINT words: bit *j* of word
*w* is 1 iff ``vec[32w+j] > 0``. Candidate generation is then pure
integer arithmetic — ``hamming(a, b) = Σ_w bit_count(a_w XOR b_w)``
— a whole-stage-codegen projection with no fp anywhere near the cut,
so Spark and the DuckDB oracle agree bit-for-bit on every candidate
decision. The exact cosine rerank over the surviving candidates uses
the house policy (round 6, vec_id tie-break) shared by the whole
similarity tier.

Why 32-bit words in BIGINTs: shifting ``1::BIGINT << 63`` flips the
sign bit, and signed-overflow behavior differs across engines;
capping shifts at 31 keeps every word non-negative and the packing
portable, at zero cost (bit_count is per-word anyway).

Scale shape (100 TB): packing is a map-side projection (64 floats →
2 longs = 32× smaller candidate state); the query block's codes are
broadcast; the hamming rank cut is a WindowGroupLimit (each map task
ships only its local top-C per query); only the ≤C·|queries|
candidate rows ever carry raw vectors into the rerank. No shuffle
touches corpus-sized data.

Reference scope: the reference dashboard has no vector tier
(SURVEY.md §2.12 extension, same scope note as operators/knn.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators.knn import _cosine, _query_corpus

N_QUERIES = 8
K = 5
N_CANDIDATES = 50
WORD_BITS = 32


def pack_signbits(vec: Column, dim: int) -> Column:
    """array<bigint> of ceil(dim/32) words; bit j of word w set iff
    vec[32w+j] > 0. Each word is ONE descending fold — iterating the
    1-based element indexes high→low, ``acc·2 + bit`` reconstructs
    Σ bit_j·2^j — so the whole packer is 2 HigherOrderFunction nodes,
    not 64 nested CaseWhens (an earlier static-sum formulation cost
    ~2.4 s of plan construction per query; this one is ~0.1 s)."""
    words = []
    for w in range(0, dim, WORD_BITS):
        nbits = min(WORD_BITS, dim - w)
        word = F.aggregate(
            F.sequence(F.lit(w + nbits), F.lit(w + 1), F.lit(-1)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(F.element_at(vec, i) > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        words.append(word)
    return F.array(*words)


def hamming(a: Column, b: Column) -> Column:
    """Σ_w bit_count(a_w XOR b_w) — integer-exact across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def binary_quant_ann(
    emb: DataFrame,
    dim: int = 64,
    n_queries: int = N_QUERIES,
    k: int = K,
    n_candidates: int = N_CANDIDATES,
) -> DataFrame:
    """Top-k per query: hamming-on-sign-bits candidate cut (integer
    rank, top n_candidates) → exact rounded-cosine rerank.

    Output: (query_id, rank, vec_id, label, hamming, cosine)."""
    q, c = _query_corpus(emb, n_queries)
    q = q.select("query_id", "qv", pack_signbits(F.col("qv"), dim).alias("qcode"))
    c = c.select(
        "vec_id", "label", "v", pack_signbits(F.col("v"), dim).alias("vcode")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        "label",
        "v",
        "qv",
        hamming(F.col("vcode"), F.col("qcode")).alias("hamming"),
    )
    cand_w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("vec_id").asc()
    )
    cand = (
        scored.withColumn("cand_rank", F.row_number().over(cand_w))
        .filter(F.col("cand_rank") <= n_candidates)
        .drop("cand_rank")
    )
    rerank_w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("cosine", _cosine(F.col("v"), F.col("qv")))
        .withColumn("rank", F.row_number().over(rerank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "label", "hamming", "cosine")
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)
