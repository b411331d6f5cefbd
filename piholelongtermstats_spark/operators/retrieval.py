"""Keyword and hybrid retrieval over the `documents` corpus — the
lexical complement to the vector tier (operators/similarity.py).

- ``bm25_topk``: Okapi BM25 scoring for a (small, broadcast) query
  term set. The plan is retrieval-shaped, not index-shaped: explode
  tokens (linear), filter to the query terms (a literal IN — Catalyst
  folds it), partial-agg tf per (doc, term), broadcast the 3-row df/idf
  table back, one final per-doc sum + TakeOrdered. At 100 TB the
  explode never shuffles raw tokens — only (doc, query-term) tf rows
  (≤ |Q| per doc) cross an exchange. A persisted inverted index would
  amortize repeated queries; for one-shot scoring this single pass IS
  the optimal plan.
- ``hybrid_rrf_topk``: reciprocal-rank fusion of the BM25 ranking and
  the brute-force cosine ranking (similarity.cosine_scores) —
  1/(C+rank) per leg, summed where the doc appears. RRF arithmetic is
  BIT-exact across engines: ranks are integers, each 1/(C+r) is one
  correctly-rounded division, and the two-term sum has a fixed order.

Float policy (NOTES.md): BM25 scores are rounded to 6 digits before
any rank/threshold decision, ties break on doc_id; the inputs are
exact integer counts, so both engines evaluate the same expression
tree with ≤1-ulp ln()/division differences — far inside the rounding
tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators.text import tokens

K1 = 1.2
B = 0.75
RRF_C = 60
DEFAULT_QUERY = ("scan", "merge", "window")


def bm25_scores(docs: DataFrame, query: tuple[str, ...] = DEFAULT_QUERY) -> DataFrame:
    """(doc_id, score) — Okapi BM25 of every matching document against
    the query term set (docs with no query term are absent)."""
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("_toks"), F.size(toks).cast("long").alias("dl"))
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    tf = (
        base.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(*query))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (K1 + 1))
                / (
                    F.col("tf")
                    + K1
                    * (
                        1
                        - B
                        + B
                        * F.col("dl")
                        / (F.col("total_dl").cast("double") / F.col("n_docs"))
                    )
                )
            ).alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(F.round(F.sum("s"), 6).alias("score"))


def bm25_topk(
    docs: DataFrame, query: tuple[str, ...] = DEFAULT_QUERY, k: int = 10
) -> DataFrame:
    """Top-k documents by rounded BM25 score (doc_id tie-break) —
    TakeOrderedAndProject, no global sort."""
    return (
        bm25_scores(docs, query)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query: tuple[str, ...] = DEFAULT_QUERY,
    query_vec_id: int = 0,
    k: int = 10,
    leg_k: int = 50,
    c: int = RRF_C,
) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 leg and the cosine leg
    (each cut to its top ``leg_k``): score = Σ 1/(c + rank_leg) over
    the legs where the doc appears. The query document itself
    (doc_id == query_vec_id) is excluded from both legs."""
    from piholelongtermstats_spark.operators.similarity import cosine_scores

    # Each leg: TakeOrderedAndProject cuts to leg_k distributed, THEN
    # ranks with a window over only those leg_k rows — the global
    # window never sees the corpus (the house rule for tiny-frame
    # global windows, operators/sequential.py).
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    bm = (
        bm25_scores(docs.filter(F.col("doc_id") != query_vec_id), query)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(leg_k)
        .withColumn("r_bm25", F.row_number().over(wb))
        .select("doc_id", "r_bm25")
    )
    wc = Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    cos = (
        cosine_scores(emb, query_vec_id)
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(leg_k)
        .select(F.col("vec_id").alias("doc_id"), "cosine")
        .withColumn("r_cos", F.row_number().over(wc))
        .select("doc_id", "r_cos")
    )
    fused = bm.join(cos, "doc_id", "full_outer").select(
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(c) + F.col("r_bm25")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("r_cos")), F.lit(0.0))
        ).alias("rrf"),
        F.coalesce("r_bm25", F.lit(0)).alias("r_bm25"),
        F.coalesce("r_cos", F.lit(0)).alias("r_cos"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc()).limit(k)


def inverted_postings_audit(docs: DataFrame, top_terms: int = 100) -> DataFrame:
    """Inverted-index build audit: for the ``top_terms`` terms by
    document frequency (df DESC, term ASC), the per-term posting-list
    summary — df, total term frequency, doc-id range, and an md5 of
    the FULL doc-ordered "doc:tf" posting string, which pins every
    (doc_id, tf) pair byte-for-byte without shipping list columns
    through the comparison harness.

    This is the search-serving materialization BM25 implies: explode →
    (term, doc) tf partial-agg → per-term fold. The posting string is
    built from the doc_id-sorted pairs (array_sort on zero-padded
    fixed-width keys — lexicographic == numeric, both engines), so the
    hash is partitioning-independent. At 100 TB postings are written
    bucketed by term; the audit costs the same two keyed shuffles as
    the build."""
    from piholelongtermstats_spark.operators.text import tokens

    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    entry = F.concat(
        F.lpad(F.col("doc_id").cast("string"), 12, "0"),
        F.lit(":"),
        F.col("tf").cast("string"),
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list(entry)))
            ).alias("postings_md5"),
        )
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(top_terms)
    )
