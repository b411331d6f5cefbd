"""Run one registry query from the command line and print the result.

Usage: python scripts/run_query.py <query_name> [sf_dir] [--explain]

`--explain` prints the formatted physical plan instead of rows —
the .explain("formatted")-and-iterate loop as a one-liner.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    if not args:
        import __spark_entry__ as se

        print("available queries:")
        for n in se.queries():
            print(" ", n)
        return 0
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as se
    from piholelongtermstats_spark.session import get_spark

    qs = se.queries()
    if name not in qs:
        print(f"unknown query {name!r}; run with no args to list")
        return 1
    spark = get_spark("run-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[name](spark, sf_dir)
    if explain:
        df.explain("formatted")
    else:
        df.show(50, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
