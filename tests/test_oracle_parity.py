"""Differential test: every registry query vs its DuckDB oracle at
sf0.001 — the same comparison the driver's correctness gate runs at
sf0.01 (SURVEY.md §5)."""

from __future__ import annotations

import os

import duckdb
import pytest

from piholelongtermstats_spark.plans import ORACLE, QUERIES
from scripts.check_oracle import TABLES, compare

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLE:
        assert len(sdf) >= 0  # rows-only contract
        return
    ddf = duck.sql(ORACLE[name]).df()
    issues = compare(sdf, ddf)
    assert not issues, f"{name}: {issues}"
