"""SQL rank-function surface over the client activity relation —
ntile / percent_rank / cume_dist in one audited table (the shapes a
BI layer generates constantly; SURVEY §2.6's W-family widened to the
full ANSI rank set).

Determinism: the window's total order is (cnt DESC, client) — unique
— so ntile bucket assignment (standard SQL: ⌊n/k⌋+1-sized buckets
first), percent_rank = (rank−1)/(n−1) and cume_dist = peers≤/n are
all engine-identical; the two divisions are the only fp and they are
single IEEE ops over exact integers.

Scale: the window orders the CLIENT relation (distinct clients after
one map-side-combined count agg) — key-cardinality rows, not events.
At dashboard cardinalities the single ordered window is the right
plan; past ``two_level_threshold`` clients the rank switches to the
range-partitioned two-level form (``client_rank_metrics_ranged``, the
source_token_caps prefix-sum pattern): per-range-partition
row_numbers plus ONE window over the n_parts-row size relation —
no task ever orders the whole client relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def client_rank_metrics(
    fact: DataFrame,
    buckets: int = 4,
    two_level_threshold: "int | None" = None,
    n_parts: int = 32,
) -> DataFrame:
    """(client, cnt, quartile, pct_rank, cume) — full rank-function
    panel over per-client query counts.

    ``two_level_threshold``: when set, one cheap count job sizes the
    client relation and, past the threshold, the panel is computed by
    ``client_rank_metrics_ranged`` (identical output, test-pinned; no
    unpartitioned window anywhere). The default (None) keeps the
    single ordered window — correct and cheapest at dashboard
    cardinality, and job-free at plan-construction time."""
    per = fact.groupBy("client").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    if two_level_threshold is not None and per.count() > two_level_threshold:
        return _ranked_panel(per, buckets, n_parts)
    w = Window.orderBy(F.col("cnt").desc(), F.col("client").asc())
    return per.select(
        "client",
        "cnt",
        F.ntile(buckets).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def dense_order_index(
    df: DataFrame,
    order_cols: list,
    n_parts: int = 32,
    out: str = "_rank",
    total: "str | None" = None,
) -> DataFrame:
    """Append a global 1-based dense index in ``order_cols`` order
    WITHOUT an unpartitioned window over ``df`` itself — the
    distributed total-order idiom shared by the rank panel and the
    contrastive-negative pool index (operators/corpus.py):

      1. ``repartitionByRange`` on the order key — the sampled
         RangePartitioner guarantees partition i sorts wholly before
         partition i+1, so local order + offsets = global order
         regardless of where the sampled boundaries land;
      2. row_number PARTITIONED by the physical range partition
         (parallel; each task sorts only its slice);
      3. prefix-sum offsets over the n_parts-row size relation — the
         only ordered window, n_parts rows at ANY input cardinality —
         broadcast back; index = offset + local row_number.

    ``order_cols`` must be a total order (unique key) for the index to
    be deterministic. ``total``: optionally also attach the overall
    row count under this name (used by the rank panel's closed-form
    ntile/percent_rank). Result keeps all input columns plus ``out``
    (+ ``total``); row order is unspecified.
    """
    parts = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "_dpid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_dpid").orderBy(*order_cols)
    local = parts.withColumn("_dlr", F.row_number().over(w_local).cast("long"))
    sizes = local.groupBy("_dpid").agg(
        F.count(F.lit(1)).cast("long").alias("_dsz")
    )
    w_off = Window.orderBy("_dpid").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        F.col("_dpid"),
        F.coalesce(F.sum("_dsz").over(w_off), F.lit(0))
        .cast("long")
        .alias("_doff"),
    ]
    if total is not None:
        off_cols.append(
            F.sum("_dsz")
            .over(
                Window.orderBy("_dpid").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .cast("long")
            .alias(total)
        )
    offs = sizes.select(*off_cols)
    return (
        local.join(F.broadcast(offs), "_dpid")
        .withColumn(out, (F.col("_doff") + F.col("_dlr")).cast("long"))
        .drop("_dpid", "_dlr", "_doff")
    )


def client_rank_metrics_ranged(
    fact: DataFrame, buckets: int = 4, n_parts: int = 32
) -> DataFrame:
    """The billion-client path: identical panel, computed without any
    unpartitioned window over the client relation."""
    per = fact.groupBy("client").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return _ranked_panel(per, buckets, n_parts)


def _ranked_panel(per: DataFrame, buckets: int, n_parts: int) -> DataFrame:
    """Two-level exact global rank over the unique (cnt DESC, client)
    order:

      1. ``repartitionByRange`` on the sort key — Spark's sampled
         RangePartitioner guarantees every row in partition i sorts
         before every row in partition i+1 and bounds partition skew,
         so the bucketing is monotone regardless of the (zipfian) cnt
         distribution;
      2. row_number PARTITIONED by the physical range partition
         (parallel, each task sorts only its slice);
      3. per-partition sizes → prefix-sum offsets over the tiny
         n_parts-row relation (the only ordered window — n_parts rows
         at ANY client cardinality) → broadcast join back;
      4. global rank = offset + local row_number, and ntile /
         percent_rank / cume_dist emerge in closed form from (rank, n)
         — ntile: with q = n DIV k, r = n MOD k, the first r buckets
         hold q+1 rows (the SQL standard Spark implements), so
         bucket = (rank−1) DIV (q+1) + 1 inside the first r·(q+1)
         rows and r + (rank−1−r·(q+1)) DIV q + 1 after; percent_rank =
         (rank−1)/(n−1); cume_dist = rank/n (unique order ⇒ peer
         group of one). Equality with the window variant is pinned in
         tests/test_ranks_scale.py.
    """
    ranked = dense_order_index(
        per,
        [F.col("cnt").desc(), F.col("client").asc()],
        n_parts=n_parts,
        out="_rank",
        total="_n",
    )
    n, rk = F.col("_n"), F.col("_rank")
    k = int(buckets)
    # q = n DIV k, r = n MOD k; when q = 0 (n < k) every row is in the
    # head branch (head = r = n), so the NULLIF(q,0) tail never fires.
    ntile = F.expr(
        f"CAST(CASE WHEN _rank <= (_n % {k}) * (_n DIV {k} + 1) "
        f"THEN (_rank - 1) DIV (_n DIV {k} + 1) + 1 "
        f"ELSE _n % {k} + (_rank - (_n % {k}) * (_n DIV {k} + 1) - 1) "
        f"DIV NULLIF(_n DIV {k}, 0) + 1 END AS INT)"
    )
    pct = F.when(
        n > 1, (rk - 1).cast("double") / (n - 1).cast("double")
    ).otherwise(F.lit(0.0))
    cume = rk.cast("double") / n.cast("double")
    return ranked.select(
        "client",
        "cnt",
        ntile.alias("quartile"),
        F.round(pct, 6).alias("pct_rank"),
        F.round(cume, 6).alias("cume"),
    )
