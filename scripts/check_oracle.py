"""Local differential harness: run every queries() entry against its
oracle_sql() via DuckDB and compare row-count / schema / values —
a faithful stand-in for the driver's correctness gate.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows.

    Only representations the driver's value-hash treats as equivalent
    are canonicalized (datetime grains, integer/float width, Spark's
    object-dtype datetime.date vs DuckDB's datetime64).  Decimal
    objects are deliberately NOT coerced: the driver serializes
    Decimal('5') and 5.0 differently, so a Decimal-typed output column
    must FAIL here exactly as it fails at the driver (the round-8
    welch_day_night lesson).
    """
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif s.dtype == object:
            nonnull = s.dropna()
            v = nonnull.iloc[0] if len(nonnull) else None
            if isinstance(v, datetime.date) and not isinstance(
                v, datetime.datetime
            ):
                s = pd.to_datetime(s).astype("datetime64[us]")
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")
    return df


def _kind(s: pd.Series) -> str:
    """Canonical dtype label; object columns are labelled by the type
    of their first non-null value so Decimal-vs-float64 divergence is
    visible (dtype 'object' alone would hide it)."""
    if s.dtype != object:
        return str(s.dtype)
    nonnull = s.dropna()
    if not len(nonnull):
        return "object:empty"
    return f"object:{type(nonnull.iloc[0]).__name__}"


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    issues = []
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if list(a.columns) != list(b.columns):
        issues.append(f"columns differ: spark={list(a.columns)} duck={list(b.columns)}")
        return issues
    if len(a) != len(b):
        issues.append(f"row count differs: spark={len(a)} duck={len(b)}")
        return issues
    if len(a):  # dtype divergence = driver hash mismatch even when values ==
        for c in a.columns:
            ka, kb = _kind(a[c]), _kind(b[c])
            if ka != kb and "object:empty" not in (ka, kb):
                issues.append(f"col {c!r}: dtype divergence spark={ka} duck={kb}")
        if issues:
            return issues
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            eq = (av.isna() & bv.isna()) | (av == bv)
            if not eq.all():
                bad = (~eq).idxmax()
                issues.append(
                    f"col {c!r}: {int((~eq).sum())} mismatches, e.g. row {bad}: "
                    f"spark={av[bad]!r} duck={bv[bad]!r}"
                )
        else:
            eq = (av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object))
            if not eq.all():
                bad = (~eq).idxmax()
                issues.append(
                    f"col {c!r}: {int((~eq).sum())} mismatches, e.g. row {bad}: "
                    f"spark={av[bad]!r} duck={bv[bad]!r}"
                )
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as se
    from piholelongtermstats_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs, oracles = se.queries(), se.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        issues = compare(sdf, ddf)
        if issues:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for i in issues[:6]:
                print(f"      {i}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
