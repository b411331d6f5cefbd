"""Explicit schemas for the engine's relations.

The reference has no schema system — a hard-coded 7-column SELECT list
(piholelongtermstats/db.py:130-134) plus pandas dtype inference and
three manual downcasts (app.py:173-175). We declare the schemas once:
narrow types are then a storage/encoding concern handled by Parquet +
Tungsten (SURVEY.md §4 O4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The Pi-hole FTL `queries` table, full 13-column physical schema
# (reference: tests/conftest.py:129-145). The engine reads the 7 starred
# columns only (db.py:130-134); Catalyst prunes the rest at scan time.
QUERIES_FULL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),             # ★
        T.StructField("timestamp", T.LongType()),      # ★ unix epoch seconds
        T.StructField("type", T.IntegerType()),        # ★ DNS record type enum
        T.StructField("status", T.IntegerType()),      # ★ Pi-hole status enum
        T.StructField("domain", T.StringType()),       # ★
        T.StructField("client", T.StringType()),       # ★ IP string
        T.StructField("forward", T.StringType()),
        T.StructField("additional_info", T.StringType()),
        T.StructField("reply_type", T.IntegerType()),
        T.StructField("reply_time", T.DoubleType()),   # ★ seconds, nullable
        T.StructField("dnssec", T.IntegerType()),
        T.StructField("list_id", T.StringType()),
        T.StructField("ede", T.IntegerType()),
    ]
)

# The engine's projection (db.py:130-134).
QUERIES_COLUMNS = ["id", "timestamp", "type", "status", "domain", "client", "reply_time"]

QUERIES_SCHEMA = T.StructType([f for f in QUERIES_FULL_SCHEMA if f.name in QUERIES_COLUMNS])

# Canonical enriched fact-table columns added by functions/derive.py
# (reference preprocess_df, process.py:47-83).
DERIVED_COLUMNS = ["date", "hour", "day_period", "status_type", "day_name"]

# Driver test-data `events` table (TESTDATA.md), which FIXTURES.md §2
# maps onto the DNS fact table.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
