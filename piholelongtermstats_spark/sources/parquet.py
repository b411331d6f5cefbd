"""Parquet readers for the driver's synthetic tables (TESTDATA.md).

Replaces the reference's SQLite scan path (db.py:111-152). Parquet +
Catalyst give us for free what the reference hand-rolls: predicate
pushdown to row-group stats (db.py:130-135 → O1), column pruning
(db.py:131 → O2), and chunked reads (db.py:144-150 → partitions).

Scale note: at 100 TB the fact table would be written partitioned by
date (``partitionBy('date')``) so time-range queries become partition
pruning, and bucketed by the high-cardinality join key where relevant.
The readers here take any directory of ``<table>.parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table from ``sf_dir``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def union_all(*dfs: DataFrame) -> DataFrame:
    """Multi-source UNION ALL, duplicates kept.

    Reference: the multi-DB concat (db.py:137-152, app.py:144-154);
    duplicates deliberately retained (README.md:56) ⇒ unionByName,
    never distinct (SURVEY.md §2.1 S6).
    """
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), dfs)
