"""SQL-surface parity (r5 VERDICT #10): headline queries expressed as
plain Spark SQL over api.register_views' temp views must value-match
their DataFrame twins from the registry — making the SQL surface a
CHECKED contract, not a convenience.

Dialect notes the twins encode deliberately: Spark SQL bare `100.0`
is DECIMAL(4,1) while the DataFrame side's F.lit(100.0) is a double —
the SQL uses `100.0D`; the exact-decimal-sum-single-division float
policy is written out the same way on both sides so the comparison is
exact equality, not approx."""

from __future__ import annotations

import pytest

from piholelongtermstats_spark import api
from piholelongtermstats_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"

SQL_TWINS = {
    "status_counts": """
        WITH a AS (
          SELECT count(1) AS total_queries,
                 sum(CASE WHEN status_type = 'Blocked' THEN 1 ELSE 0 END) AS blocked_count,
                 sum(CASE WHEN status_type = 'Allowed' THEN 1 ELSE 0 END) AS allowed_count
          FROM events_fact)
        SELECT total_queries, blocked_count, allowed_count,
               CASE WHEN total_queries > 0
                    THEN round(blocked_count * 100.0D / total_queries, 4)
                    ELSE 0.0D END AS blocked_pct,
               CASE WHEN total_queries > 0
                    THEN round(allowed_count * 100.0D / total_queries, 4)
                    ELSE 0.0D END AS allowed_pct
        FROM a
    """,
    "daily_counts": """
        SELECT date,
               count(1) AS total_cnt,
               sum(CASE WHEN status_type = 'Blocked' THEN 1 ELSE 0 END) AS blocked_cnt,
               sum(CASE WHEN status_type = 'Allowed' THEN 1 ELSE 0 END) AS allowed_cnt
        FROM events_fact GROUP BY date
    """,
    "top_clients": """
        SELECT client, count(1) AS cnt FROM events_fact
        GROUP BY client ORDER BY cnt DESC, client ASC LIMIT 10
    """,
    "weekday_avg": """
        WITH d AS (SELECT date, day_name, count(1) AS cnt
                   FROM events_fact GROUP BY date, day_name)
        SELECT day_name,
               round(CAST(sum(cnt) AS DOUBLE) / count(1), 6) AS avg_queries
        FROM d GROUP BY day_name
    """,
    "reply_time_stats": """
        SELECT round(CAST(sum(CAST(abs(reply_time) AS DECIMAL(18,2))) AS DOUBLE)
                     / count(reply_time) * 1000, 3) AS avg_reply_ms,
               round(max(abs(reply_time)) * 1000, 3) AS max_reply_ms,
               round(min(abs(reply_time)) * 1000, 3) AS min_reply_ms
        FROM events_fact
    """,
    "uniques": """
        SELECT count(DISTINCT domain) AS unique_domains,
               count(DISTINCT client) AS unique_clients
        FROM events_fact
    """,
}


@pytest.fixture(scope="module")
def views(spark):
    names = api.register_views(spark, SF)
    assert "events_fact" in names and "hourly_rollup_view" in names
    return names


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", sorted(SQL_TWINS))
def test_sql_twin_matches_dataframe(spark, views, name):
    df = QUERIES[name](spark, SF)
    sql = spark.sql(SQL_TWINS[name])
    assert sql.columns == df.columns, (sql.columns, df.columns)
    assert _rows(sql, df.columns) == _rows(df, df.columns)


def test_rollup_view_reaggregates_to_daily_counts(spark, views):
    """The resident rollup registered as a view re-aggregates (in SQL)
    to the same per-date counts as the fact-level query — the A13
    rollup-reuse contract exposed through the SQL surface."""
    df = QUERIES["daily_counts"](spark, SF)
    sql = spark.sql(
        """
        SELECT date_trunc('DAY', hour_bucket) AS date,
               sum(cnt) AS total_cnt,
               sum(CASE WHEN status_type = 'Blocked' THEN cnt ELSE 0 END) AS blocked_cnt,
               sum(CASE WHEN status_type = 'Allowed' THEN cnt ELSE 0 END) AS allowed_cnt
        FROM hourly_rollup_view GROUP BY date_trunc('DAY', hour_bucket)
        """
    )
    assert _rows(sql, df.columns) == _rows(df, df.columns)
