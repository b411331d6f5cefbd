"""Dump `.explain("formatted")` for a list of registry queries to
<outdir>/<query>_<tag>.txt — the r12 optimization-round evidence files
(plans/r12/*_before.txt / *_after.txt).

Usage:
    python scripts/dump_plans.py <outdir> <tag> <sf_dir> name1 name2 ...
    python scripts/dump_plans.py <outdir> <tag> <sf_dir> @listfile
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_USE_LAYOUT", "1")

from piholelongtermstats_spark.plans import QUERIES  # noqa: E402
from piholelongtermstats_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, tag, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names: list[str] = []
    for a in sys.argv[4:]:
        if a.startswith("@"):
            names += [
                ln.strip() for ln in open(a[1:]) if ln.strip()
            ]
        else:
            names.append(a)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for n in names:
        if n not in QUERIES:
            print(f"SKIP {n}: not registered")
            continue
        try:
            df = QUERIES[n](spark, sf_dir)
            s = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            s = f"ERROR building {n}: {e!r}"
        with open(os.path.join(outdir, f"{n}_{tag}.txt"), "w") as f:
            f.write(s)
        print(f"wrote {n}_{tag}.txt")


if __name__ == "__main__":
    main()
