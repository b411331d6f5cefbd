"""Subset bench: the EXACT bench.py methodology (untimed warm pass
over the subset, then N timed passes of plan-construction + collect,
per-query MIN) over a named subset of registry queries — for fast
before/after comparison while optimizing, without paying the full
308-query suite per iteration.

Usage: python scripts/bench_subset.py q1 q2 ... [--sf /root/testdata/sf0.1]
Prints one line per query: min build exec, plus the subset sum.

The full-suite numbers remain bench.py's job; this tool exists so a
single optimization can be measured in ~1 min. Shared session caches
(plans/cache.py) are warmed by the warm pass exactly as in bench.py.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_USE_LAYOUT", "1")

from piholelongtermstats_spark.plans import QUERIES  # noqa: E402
from piholelongtermstats_spark.session import get_spark  # noqa: E402

N_TIMED_PASSES = 5


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("phlts-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    if os.environ.get("SPARK_GRAFT_USE_LAYOUT", "").lower() in ("1", "true", "auto"):
        from piholelongtermstats_spark.sources.layout import ensure_layout

        ensure_layout(spark, sf_dir)
    for n in names:
        QUERIES[n](spark, sf_dir).collect()
    timings: dict[str, float] = {}
    build: dict[str, float] = {}
    execs: dict[str, float] = {}
    for _ in range(N_TIMED_PASSES):
        for n in names:
            t0 = time.perf_counter()
            df = QUERIES[n](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            t = t2 - t0
            if n not in timings or t < timings[n]:
                timings[n] = t
                build[n] = t1 - t0
                execs[n] = t2 - t1
    for n in names:
        print(
            f"{timings[n]:7.3f}  build={build[n]:6.3f} exec={execs[n]:6.3f}  {n}"
        )
    print(f"subset_sum={sum(timings.values()):.3f}")


if __name__ == "__main__":
    main()
