"""Path-keyed scan census: how many times does each query's BUILT plan
scan the same PARQUET PATH — regardless of projected schema.

Closes the r12 blind spot in sort_census/scan_census: both keyed scan
identity on the scan node's string (which embeds the column list), so
N scans of the same table with DIFFERENT projections — one per
aggregation leg, the fd_violation_profile class — were invisible. A
repeated path is the 100 TB hazard (data at rest re-read per leg);
repeated ExistingRDD/InMemory leaves are checkpoint/cache-backed and
deliberately excluded.

Known-honest survivors (mult 2, all verified): TPC-H canonical
double-references (nation in Q7/Q8, lineitem in Q17, customer in
Q22), the by-design `union_all(one, one)` source pipeline, and
rollup_delta's two DISJOINT date ranges of one path.

Usage: python scripts/path_census.py /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_USE_LAYOUT", "1")

from collections import Counter  # noqa: E402

from piholelongtermstats_spark.plans import QUERIES  # noqa: E402
from piholelongtermstats_spark.session import get_spark  # noqa: E402


def pq_paths(df) -> list:
    """Parquet-leaf locations in the built physical plan."""
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        ch = node.children()
        n = ch.size()
        if n == 0 and ("FileSourceScan" in name or "BatchScan" in name):
            s = node.toString()
            # Key on the FULL parsed path list inside the Location
            # brackets — truncating the identity string collided two
            # DIFFERENT paths sharing a long prefix into one key, a
            # false >=2 multiplicity (r12 ADVICE). Truncation is for
            # display only (main() prints counts, not keys).
            m = re.search(r"Location: \S+ \[([^\]]*)\]", s)
            if m:
                out.append(m.group(1))
                return
            m = re.search(r"file:[^\s,\]]+", s)
            out.append(m.group(0) if m else s.splitlines()[0][:80])
        for i in range(n):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("path-census")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in sorted(QUERIES.items()):
        try:
            c = Counter(pq_paths(fn(spark, sf_dir)))
            mx = max(c.values()) if c else 0
            if mx >= 2:
                rows.append((mx, sum(c.values()), name))
        except Exception as e:  # noqa: BLE001
            print("ERR", name, repr(e)[:120])
    rows.sort(reverse=True)
    print("max_mult  pq_scans  query")
    for mx, tot, name in rows:
        print(f"{mx:8d} {tot:9d}  {name}")
    print(len(rows), "queries scanning one parquet path >= 2x")


if __name__ == "__main__":
    main()
