"""Canonical DNS fact table over the driver's `events` parquet.

FIXTURES.md §2 maps the driver's synthetic ``events`` table onto the
Pi-hole `queries` fact table: ts→timestamp, user_id→client (as string),
props→domain, value→reply_time, and event_type bucketed into the 3-way
status_type the reference derives from the status enum
(process.py:71-77). The bucket mapping below is the fixed declaration
FIXTURES.md asks for; it is mirrored verbatim in FACT_CTE so the Spark
plan and the DuckDB oracle can never drift.

All derived time columns match functions/derive.py (process.py:60-79)
with session timezone pinned to UTC.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piholelongtermstats_spark.functions.derive import day_period, enrich_time
from piholelongtermstats_spark.sources.parquet import load_table


def _epoch_us(t: dt.datetime) -> int:
    """UTC epoch microseconds of a (naive ⇒ UTC) datetime."""
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    return int(t.timestamp() * 1_000_000)

# Fixed event_type → status_type mapping (FIXTURES.md §2).
EVENT_ALLOWED = ("view", "click", "purchase")
EVENT_BLOCKED = ("error",)
# everything else (signup) → 'Other'


def filter_raw_ts(
    ev: DataFrame,
    lo: "dt.datetime | None" = None,
    hi: "dt.datetime | None" = None,
) -> "tuple[DataFrame, F.Column]":
    """Apply [lo, hi) bounds to the RAW stored ts column and return
    (filtered frame, canonical TimestampType ts expression).

    The driver has shipped events.ts as either parquet
    TIMESTAMP(NANOS) (read as nanos-long via
    session.ensure_session_defaults) or TIMESTAMP(MICROS) without
    timezone (read as TIMESTAMP_NTZ). Handle both: truncate nanos to
    µs exactly like DuckDB's TIMESTAMP_NS → TIMESTAMP cast (integer
    DIV keeps full int64 precision), and reinterpret NTZ wall-clock
    as a UTC instant (session TZ is pinned to UTC, so derived
    date/hour/day_name match DuckDB's naive-timestamp semantics).

    Bounds compare against the raw column with literals of the SAME
    type so the comparison needs no column-side cast and reaches
    PushedFilters on the scan. Literals are built from UTC epoch
    micros — a naive-datetime literal would be converted through the
    driver OS timezone, shifting the window on a non-UTC host;
    timestamp_micros(lit) is OS-independent and constant-folds BEFORE
    pushdown, so PushedFilters still sees a plain literal.
    """
    ts = F.col("ts")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        if lo is not None:
            ev = ev.filter(F.col("ts") >= _epoch_us(lo) * 1000)
        if hi is not None:
            ev = ev.filter(F.col("ts") < _epoch_us(hi) * 1000)
        ts = F.timestamp_micros(F.expr("ts DIV 1000"))
    else:
        lit_type = "timestamp_ntz" if ts_type == "timestamp_ntz" else "timestamp"

        def _bound(t: dt.datetime):
            return F.timestamp_micros(F.lit(_epoch_us(t))).cast(lit_type)

        if lo is not None:
            ev = ev.filter(F.col("ts") >= _bound(lo))
        if hi is not None:
            ev = ev.filter(F.col("ts") < _bound(hi))
        if ts_type == "timestamp_ntz":
            ts = F.col("ts").cast("timestamp")
    return ev, ts


def dns_fact(
    spark: SparkSession,
    sf_dir: str,
    lo: "dt.datetime | None" = None,
    hi: "dt.datetime | None" = None,
) -> DataFrame:
    """Load `events` and produce the enriched DNS fact table.

    Columns: event_id, ts, client, domain, status_type, reply_time,
    date, hour, day_name, day_period. Pure projection — fuses into the
    parquet scan; no shuffle.

    ``lo``/``hi`` (UTC, end-exclusive — db.py:133/S4 contract) are
    applied to the RAW stored column, not the derived timestamp: the
    nanos→µs truncation is monotone, so ``derived >= lo ⟺ raw >=
    lo_µs·1000`` exactly (positive epochs; DIV truncation == floor).
    Filtering the raw column is what lets the predicate reach
    ``PushedFilters`` on the parquet scan and skip row groups — a
    filter on the derived column would evaluate post-scan and read
    everything at 100 TB.

    With ``SPARK_GRAFT_USE_LAYOUT`` set (bench does, r4 VERDICT #8),
    the scan routes through the date-partitioned hive layout
    (sources/layout.py) instead of the flat file: identical rows and
    schema (tests/test_scale_layout.py), but [lo, hi) additionally
    prunes whole date DIRECTORIES at plan time (PartitionFilters) —
    the physical design every events query runs against at 100 TB.
    The flag is opt-in so oracle comparisons and the driver's
    correctness runs stay on the exact files DuckDB reads.
    """
    if os.environ.get("SPARK_GRAFT_USE_LAYOUT", "").lower() in ("1", "true", "auto"):
        from piholelongtermstats_spark.sources import layout as _layout

        path = _layout.ensure_layout(spark, sf_dir)
        return _layout.scan_events_date_partitioned(spark, path, lo, hi)
    ev = load_table(spark, sf_dir, "events")
    ev, ts = filter_raw_ts(ev, lo, hi)
    df = ev.select(
        F.col("event_id"),
        ts.alias("ts"),
        F.col("user_id").cast("string").alias("client"),
        F.col("props").alias("domain"),
        (
            F.when(F.col("event_type").isin(*EVENT_ALLOWED), F.lit("Allowed"))
            .when(F.col("event_type").isin(*EVENT_BLOCKED), F.lit("Blocked"))
            .otherwise(F.lit("Other"))
        ).alias("status_type"),
        F.col("value").alias("reply_time"),
    )
    return enrich_time(df, "ts")


# DuckDB oracle prelude: the exact same fact derivation in ANSI-ish SQL.
# Every oracle query in plans/registry.py is written as
#   FACT_CTE + "SELECT ... FROM fact ..."
FACT_CTE = """
WITH fact AS (
  SELECT
    event_id,
    ts,
    CAST(user_id AS VARCHAR)               AS client,
    props                                  AS domain,
    CASE WHEN event_type IN ('view','click','purchase') THEN 'Allowed'
         WHEN event_type IN ('error')                   THEN 'Blocked'
         ELSE 'Other' END                  AS status_type,
    value                                  AS reply_time,
    date_trunc('day', ts)                  AS date,
    CAST(hour(ts) AS BIGINT)               AS hour,
    dayname(ts)                            AS day_name,
    CASE WHEN hour(ts) BETWEEN 6 AND 23 THEN 'Day' ELSE 'Night' END AS day_period
  FROM events
)
"""



def raw_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, ts, user_id, event_type) — the UNBUCKETED event
    stream for journey analytics (funnels need the raw step names the
    fact's 3-way status mapping collapses). Same nanos→µs ts handling
    as dns_fact; pure projection, fuses into the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    ev, ts = filter_raw_ts(ev, None, None)
    return ev.select(
        "event_id", ts.alias("ts"), "user_id", "event_type"
    )
