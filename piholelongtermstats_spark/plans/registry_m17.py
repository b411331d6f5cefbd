"""M17 — TPC-H suite completion: the six remaining canonical query
shapes (Q6/Q11/Q13/Q17/Q20/Q21), closing out all 22 TPC-H shapes on
the reduced star schema the testdata ships (no partsupp / container /
comment / commitdate columns — each query documents its substitution):

- Q6-shaped  forecast_revenue_change  (pure scan+filter+agg — the
             pushdown benchmark: zero joins, one partial agg)
- Q11-shaped important_parts          (group agg + global-scalar
             HAVING gate, cross-multiplied onto exact decimals)
- Q13-shaped customer_order_distribution (outer join with an ON-side
             predicate → count histogram — the two-level agg shape)
- Q17-shaped small_qty_order_revenue  (per-group avg threshold vs the
             fact — correlated-subquery shape as agg + join-back)
- Q20-shaped promo_part_suppliers     (nested semi-join chain over a
             per-(supp,part) shipped-quantity gate)
- Q21-shaped waiting_suppliers        (EXISTS + NOT EXISTS over the
             fact, reformulated as one per-order aggregate)

Policy as M12–M14: every money/quantity expression is exact
DECIMAL(18,2) arithmetic; every threshold that decides membership is
cross-multiplied onto exact decimals/integers (never a double
division); one final division (if any) is done identically in both
engines. Broadcast pins follow the r3 lesson: only true dims
(nation/region) and provably tiny derived relations (the 1-row scalar
gate) are pinned; fact edges stay AQE-planned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piholelongtermstats_spark.plans.registry import _DEC, register
from piholelongtermstats_spark.session import ensure_session_defaults
from piholelongtermstats_spark.sources.parquet import load_table


def _dec(col: str):
    return F.col(col).cast(_DEC)


# ---------------------------------------------------------------------------
# Q6-shaped: forecast revenue change. The simplest TPC-H query is the
# sharpest scan test: every predicate must reach PushedFilters on the
# lineitem scan, the plan is scan → filter → two-phase agg, and the
# discount band is compared on the DECIMAL cast (0.05 stored as a
# double would make `BETWEEN 0.05 AND 0.07` engine-dependent at the
# boundary; DECIMAL(18,2) rounds both engines to the same grid first).
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
           * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue_change", _Q6_SQL)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped filter-aggregate (SURVEY §2.4 join surface's
    degenerate base case — zero joins).

    Plan intent at 100 TB: ship-window + quantity predicates push to
    the parquet scan (year-partition-prunable under a hive layout);
    the whole query is one WholeStageCodegen span ending in a
    two-phase (partial → final) aggregate, so the only exchange is
    the 1-row SinglePartition gather of the partial sums."""
    ensure_session_defaults(spark)
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec("l_discount")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (disc >= F.lit("0.05").cast(_DEC))
            & (disc <= F.lit("0.07").cast(_DEC))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q11-shaped: important parts by shipped value. partsupp/ps_supplycost
# does not exist in the testdata, so "stock value" is the shipped
# value sum(extendedprice * quantity) per part, restricted to ASIA
# suppliers — the Q11 shape is the group agg gated against a GLOBAL
# scalar aggregate reused over its own input. TPC-H's fixed fraction
# must shrink 1/SF to stay non-trivial (the spec scales it by hand);
# this gate is SF-free instead — parts worth more than 2x the MEAN
# part value — cross-multiplied (value · n_parts > 2 · total) on
# exact decimals so no double division decides the boundary.
# ---------------------------------------------------------------------------

_Q11_SQL = """
WITH val AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,4))
           AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY 1
), tot AS (
  SELECT CAST(sum(part_value) AS DECIMAL(32,4)) AS total,
         count(*) AS n_parts
  FROM val
)
SELECT partkey, CAST(part_value AS DOUBLE) AS part_value
FROM val, tot
WHERE part_value * n_parts > 2 * total
ORDER BY part_value DESC, partkey
"""


@register("important_parts", _Q11_SQL)
def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped global-scalar HAVING gate.

    Plan intent at 100 TB: the region cut reduces supplier to a
    broadcastable key set BEFORE the fact join (nation/region pinned,
    the supplier edge semi-reduces lineitem); the per-part aggregate
    is one shuffle on partkey; the global total is a 1-row relation
    broadcast back over its own input (BroadcastNestedLoop against a
    single row — never a second shuffle). Membership is decided on
    exact decimals via cross-multiplication."""
    ensure_session_defaults(spark)
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cut = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    val = (
        li.join(F.broadcast(cut), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_quantity"))
            .cast("decimal(28,4)")
            .alias("part_value")
        )
    )
    tot = val.agg(
        F.sum("part_value").cast("decimal(32,4)").alias("total"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("part_value") * F.col("n_parts") > 2 * F.col("total"))
        .select("partkey", F.col("part_value").cast("double").alias("part_value"))
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


# ---------------------------------------------------------------------------
# Q13-shaped: customer order-count distribution. The testdata has no
# o_comment, so the ON-side exclusion is priority <> '1-URGENT' — the
# shape is what matters: the predicate must live in the JOIN condition
# (not a WHERE, which would turn the outer join inner and silently
# drop zero-order customers), then a two-level aggregate builds the
# histogram of counts.
# ---------------------------------------------------------------------------

_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("customer_order_distribution", _Q13_SQL)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped outer-join histogram.

    Plan intent at 100 TB: the priority exclusion is an ON-condition
    of the LEFT join so zero-order customers survive with c_count=0
    (count(o_orderkey) counts non-NULLs only); first aggregate
    shuffles on custkey (same key as the join — AQE coalesces), the
    histogram aggregate shuffles on the tiny c_count domain. No
    window, no driver loop."""
    ensure_session_defaults(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


# ---------------------------------------------------------------------------
# Q17-shaped: small-quantity-order revenue. The correlated scalar
# subquery (0.2 * avg qty per part) is reformulated as an aggregate
# over the SAME brand-cut join + a join-back; the membership test
# qty < 0.2 * avg = sum/(5n) is cross-multiplied to qty * 5 * n < sum
# — all exact decimal/integer, so the boundary cannot drift between
# engines. p_container does not exist; the second cut is p_size < 10.
# ---------------------------------------------------------------------------

_Q17_SQL = """
WITH fl AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23' AND p_size < 10
), agg AS (
  SELECT l_partkey AS a_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS sum_qty,
         count(*) AS n_li
  FROM fl GROUP BY 1
)
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
    AS avg_yearly,
  count(*) AS n_small_lines
FROM fl
JOIN agg ON l_partkey = a_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty
"""


@register("small_qty_order_revenue", _Q17_SQL)
def q_small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped per-group-average threshold against the fact.

    Plan intent at 100 TB: the brand/size cut prunes part first, the
    filtered fact slice is aggregated per part and joined back to
    itself — both sides of that join carry the SAME part cut, so the
    per-part aggregate is small and broadcastable; no window function
    ever sees the fact. The avg comparison never divides: qty*5*n <
    sum(qty) is exact. One final /7.0 rounded to 6 identically."""
    ensure_session_defaults(spark)
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    fl = li.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    agg = fl.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(_dec("l_quantity")).cast("decimal(28,2)").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        fl.join(F.broadcast(agg), F.col("l_partkey") == F.col("a_partkey"))
        .filter(_dec("l_quantity") * 5 * F.col("n_li") < F.col("sum_qty"))
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 6
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20-shaped: suppliers shipping significant promo-part volume. No
# partsupp/ps_availqty, so the inner gate is "shipped > 45 units of
# one PROMO part during 1997"; the outer query is the Q20 shape — a
# semi-join chain (supplier ⋉ qualifying keys) under a nation/region
# cut, never materializing the gate relation wider than its keys.
# ---------------------------------------------------------------------------

_Q20_SQL = """
WITH qual AS (
  SELECT l_suppkey, l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS shipped
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (SELECT l_suppkey FROM qual WHERE shipped > 45)
ORDER BY s_suppkey
"""


@register("promo_part_suppliers", _Q20_SQL)
def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped nested semi-join chain.

    Plan intent at 100 TB: the part-type cut and ship window prune
    the fact scan; the (supp, part) aggregate is one shuffle; the
    qualifying-supplier key set collapses to DISTINCT suppkeys (tiny
    — bounded by |supplier|) and drives a LEFT SEMI into the
    dim-side supplier relation. Supplier is never joined to the raw
    fact; the quantity gate compares exact decimals."""
    ensure_session_defaults(spark)
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    qual = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).cast("decimal(28,2)").alias("shipped"))
        .filter(F.col("shipped") > 45)
        .select("l_suppkey")
        .distinct()
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        # No cosmetic final sort (r11 VERDICT #1 / guide §2.4).
    )


# ---------------------------------------------------------------------------
# Q21-shaped: suppliers who kept orders waiting. l_commitdate /
# l_receiptdate do not exist, so "late" is the M14 Q12 substitution
# (shipped > 90 days after order). The classic EXISTS + NOT-EXISTS
# pair ("another supplier participated" / "no OTHER supplier was
# late") is reformulated as ONE per-order aggregate:
#
#   n_supp > 1 AND n_late_supp = 1  ⟺  ∃ other supplier in the order
#                                      ∧ ∄ other LATE supplier
#
# in which case max(late suppkey) IS the sole offender. The oracle
# runs the identical aggregate formulation — the equivalence to the
# EXISTS pair is the documented contract, and it turns two fact
# self-joins into one shuffle on orderkey.
# ---------------------------------------------------------------------------

_Q21_SQL = """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
              THEN 1 ELSE 0 END AS late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp,
         max(CASE WHEN late = 1 THEN l_suppkey END) AS sole_late_supp
  FROM li GROUP BY 1
)
SELECT s_name, count(*) AS numwait
FROM per_order
JOIN supplier ON sole_late_supp = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("waiting_suppliers", _Q21_SQL)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped EXISTS/NOT-EXISTS, aggregate-reformulated.

    Plan intent at 100 TB: the textbook formulation self-joins
    lineitem twice (EXISTS + NOT EXISTS) — three fact-sized shuffles.
    The per-order aggregate (distinct suppliers, distinct late
    suppliers, max late suppkey) needs ONE shuffle on orderkey and
    preserves the exact semantics: a sole late supplier among ≥2
    participants is the waiting case. Supplier joins the (small)
    offender relation, and the final top-10 is
    TakeOrderedAndProject with a pinned (numwait DESC, name) order."""
    ensure_session_defaults(spark)
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    )
    tagged = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(late, 1).otherwise(0).alias("late"),
    )
    late_supp = F.when(F.col("late") == 1, F.col("l_suppkey"))
    per_order = tagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(late_supp).alias("n_late_supp"),
        F.max(late_supp).alias("sole_late_supp"),
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("sole_late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
