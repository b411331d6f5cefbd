"""Every registry query must execute (not crash) on EMPTY tables —
the reference's empty-DB path is a first-class contract
(tests/test_db.py:272-362; empty-schema fixture conftest.py:123-148).

Strategy: write a zero-row copy of every testdata table (schema
preserved) and run the full registry against it. Row counts are not
asserted (top-1 queries legitimately return 0 rows; spines are empty)
— only that execution completes."""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from piholelongtermstats_spark.sources.parquet import load_table

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.mode(
            "overwrite"
        ).parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_all_queries_survive_empty_inputs(spark, empty_sf_dir):
    """Includes the vector-index queries: empty corpus → empty index →
    zero-row search result (the dim/centroid probes are empty-guarded
    rather than crashing driver-side)."""
    failures = {}
    for name, fn in se.queries().items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures[name] = repr(e)[:200]
    assert not failures, failures
