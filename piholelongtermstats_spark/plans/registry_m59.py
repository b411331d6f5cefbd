"""M59 — k-group inference completion (all DuckDB-oracle-checked):

- ``weekday_anova_reply`` — one-way ANOVA F across the seven weekday
  groups of quantized reply times: the omnibus mean test the
  two-sample family (welch/MW/levene/KS) was missing.
- ``kruskal_wallis_weekday`` — the nonparametric omnibus twin: rank H
  over doubled midranks from the merged value histogram (the
  mann_whitney machinery generalized from 2 to k groups),
  tie-corrected.
- ``weekday_status_cramers_v`` — χ² independence + Cramér's V over
  the FIXED 7×3 weekday × status contingency table (the status
  domain is pinned by the fact derivation, sources/events.py).

Shared policy: groups are FIXED literals (Mon→Sun, Allowed/Blocked/
Other), so every statistic is one map-side-combined aggregate whose
fp tail is a fixed left-associative chain over exact integer moments
(BIGINT / DECIMAL(38,0) in Spark, BIGINT / HUGEINT in DuckDB) — no
fold CTEs needed, the welch_day_night convention at k groups. The
oracle SQL below is GENERATED so the chain order is identical-by-
construction to the Column expressions in operators/stattests.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import stattests
from piholelongtermstats_spark.operators.stattests import _STATUSES, _WEEKDAYS
from piholelongtermstats_spark.plans.registry import FACT_CTE, _fact, register

# ---------------------------------------------------------------------------
# weekday_anova_reply
# ---------------------------------------------------------------------------


def _anova_a_chain() -> str:
    """The Mon→Sun left-associative between-group chain Σ S_g²/n_g."""
    s = "0.0"
    for i in range(7):
        s += (
            f" + CASE WHEN n{i} > 0 THEN "
            f"CAST(CAST(s{i} AS HUGEINT) * s{i} AS DOUBLE) "
            f"/ CAST(n{i} AS DOUBLE) ELSE 0.0 END"
        )
    return s


def _k_chain(prefix: str, count: int) -> str:
    s = "CAST(0"
    for i in range(count):
        s += f" + CASE WHEN {prefix}{i} > 0 THEN 1 ELSE 0 END"
    return s + " AS BIGINT)"


def _anova_sql() -> str:
    per_day = ",\n    ".join(
        f"CAST(count(*) FILTER (WHERE day_name = '{d}') AS BIGINT) AS n{i},\n"
        f"    CAST(coalesce(sum(r) FILTER (WHERE day_name = '{d}'), 0)"
        f" AS BIGINT) AS s{i}"
        for i, d in enumerate(_WEEKDAYS)
    )
    a = _anova_a_chain()
    return (
        FACT_CTE
        + f"""
, m AS (
  SELECT CAST(round(reply_time * 1000) AS BIGINT) AS r, day_name
  FROM fact WHERE reply_time IS NOT NULL
), agg AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_total,
    CAST(coalesce(sum(r), 0) AS BIGINT) AS s_total,
    CAST(coalesce(sum(CAST(r * r AS DECIMAL(38,0))), 0)
         AS DECIMAL(38,0)) AS q_total,
    {per_day}
  FROM m
), der AS (
  SELECT n_total, s_total, CAST(q_total AS DOUBLE) AS q_total,
    {_k_chain('n', 7)} AS k_groups,
    CASE WHEN n_total > 0 THEN ({a})
      - CAST(s_total AS DOUBLE) * CAST(s_total AS DOUBLE)
        / CAST(n_total AS DOUBLE) END AS ssb,
    CASE WHEN n_total > 0 THEN CAST(q_total AS DOUBLE) - ({a}) END AS ssw
  FROM agg
)
SELECT n_total, k_groups, s_total, q_total,
  round(ssb, 6) AS ssb, round(ssw, 6) AS ssw,
  round(CASE WHEN k_groups > 1 AND n_total > k_groups AND ssw > 0 THEN
    (ssb / (CAST(k_groups AS DOUBLE) - 1.0))
    / (ssw / (CAST(n_total AS DOUBLE) - CAST(k_groups AS DOUBLE)))
  END, 6) AS f_stat
FROM der
"""
    )


@register("weekday_anova_reply", _anova_sql())
def q_weekday_anova_reply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across weekday reply-time groups
    (operators/stattests.py:weekday_anova_reply)."""
    return stattests.weekday_anova_reply(_fact(spark, sf_dir))


# ---------------------------------------------------------------------------
# kruskal_wallis_weekday
# ---------------------------------------------------------------------------


def _kw_b_chain() -> str:
    s = "0.0"
    for i in range(7):
        s += (
            f" + CASE WHEN n{i} > 0 THEN "
            f"CAST(r2_{i} * r2_{i} AS DOUBLE) / CAST(n{i} AS DOUBLE) "
            f"ELSE 0.0 END"
        )
    return s


def _kw_sql() -> str:
    per_day_hist = ",\n    ".join(
        f"CAST(count(*) FILTER (WHERE day_name = '{d}') AS BIGINT) AS c{i}"
        for i, d in enumerate(_WEEKDAYS)
    )
    per_day_sums = ",\n    ".join(
        f"CAST(sum(c{i}) AS BIGINT) AS n{i},\n"
        f"    sum(CAST(c{i} AS HUGEINT) * mr2) AS r2_{i}"
        for i in range(7)
    )
    b = _kw_b_chain()
    nd = "CAST(n_total AS DOUBLE)"
    h = f"3.0 * ({b}) / ({nd} * ({nd} + 1.0)) - 3.0 * ({nd} + 1.0)"
    c_corr = (
        f"1.0 - CAST(ties_t AS DOUBLE) / ({nd} * {nd} * {nd} - {nd})"
    )
    return (
        FACT_CTE
        + f"""
, m AS (
  SELECT CAST(round(reply_time * 1000) AS BIGINT) AS v, day_name
  FROM fact WHERE reply_time IS NOT NULL
), hist AS (
  SELECT v, CAST(count(*) AS BIGINT) AS f,
    {per_day_hist}
  FROM m GROUP BY v
), ranked AS (
  SELECT *,
    CAST(2 * coalesce(sum(f) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + f + 1 AS BIGINT) AS mr2
  FROM hist
), agg AS (
  SELECT
    CAST(coalesce(sum(f), 0) AS BIGINT) AS n_total,
    sum(CAST(f AS HUGEINT) * f * f - f) AS ties_t,
    {per_day_sums}
  FROM ranked
)
SELECT n_total,
  {_k_chain('n', 7)} AS k_groups,
  CAST(ties_t AS DOUBLE) AS ties_t,
  round(CASE WHEN {_k_chain('n', 7)} > 1 AND n_total > 1 THEN {h} END, 6)
    AS h_stat,
  round(CASE WHEN {_k_chain('n', 7)} > 1 AND n_total > 1
             AND ({c_corr}) > 0
        THEN ({h}) / ({c_corr}) END, 6) AS h_corrected
FROM agg
"""
    )


@register("kruskal_wallis_weekday", _kw_sql())
def q_kruskal_wallis_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank H across weekday reply-time groups
    (operators/stattests.py:kruskal_wallis_weekday)."""
    return stattests.kruskal_wallis_weekday(_fact(spark, sf_dir))


# ---------------------------------------------------------------------------
# weekday_status_cramers_v
# ---------------------------------------------------------------------------


def _cv_chain() -> str:
    s = "0.0"
    for i in range(7):
        for j in range(3):
            d = (
                f"CAST(CAST(n_total AS HUGEINT) * o{i}_{j} "
                f"- CAST(r{i} AS HUGEINT) * c{j} AS DOUBLE)"
            )
            rc = f"CAST(CAST(r{i} AS HUGEINT) * c{j} AS DOUBLE)"
            s += (
                f" + CASE WHEN r{i} > 0 AND c{j} > 0 THEN "
                f"{d} * {d} / {rc} ELSE 0.0 END"
            )
    return s


def _cv_sql() -> str:
    rows = ",\n    ".join(
        f"CAST(count(*) FILTER (WHERE day_name = '{d}') AS BIGINT) AS r{i}"
        for i, d in enumerate(_WEEKDAYS)
    )
    cols = ",\n    ".join(
        f"CAST(count(*) FILTER (WHERE status_type = '{s}') AS BIGINT) AS c{j}"
        for j, s in enumerate(_STATUSES)
    )
    cells = ",\n    ".join(
        f"CAST(count(*) FILTER (WHERE day_name = '{d}'"
        f" AND status_type = '{s}') AS BIGINT) AS o{i}_{j}"
        for i, d in enumerate(_WEEKDAYS)
        for j, s in enumerate(_STATUSES)
    )
    chain = _cv_chain()
    nd = "CAST(n_total AS DOUBLE)"
    kk = _k_chain("r", 7)
    mm = _k_chain("c", 3)
    mind = f"CAST(least({kk} - 1, {mm} - 1) AS DOUBLE)"
    ok = f"{kk} > 1 AND {mm} > 1 AND n_total > 0"
    return (
        FACT_CTE
        + f"""
, agg AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n_total,
    {rows},
    {cols},
    {cells}
  FROM fact
)
SELECT n_total,
  {kk} AS k_weekdays,
  {mm} AS m_statuses,
  round(CASE WHEN {ok} THEN ({chain}) / {nd} END, 6) AS chi2,
  round(CASE WHEN {ok} THEN
    sqrt((({chain}) / {nd}) / ({nd} * {mind})) END, 6) AS cramers_v
FROM agg
"""
    )


@register("weekday_status_cramers_v", _cv_sql())
def q_weekday_status_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence + Cramér's V over the 7×3 weekday × status
    table (operators/stattests.py:weekday_status_cramers_v)."""
    return stattests.weekday_status_cramers_v(_fact(spark, sf_dir))
