"""One-off census: how many times does each query's plan contain the
same leaf scan subtree — i.e. how often would the shared fact (or a
derived rollup) be RE-EXECUTED by fan-out consumers if no exchange
reuse kicks in (guide §2.4: duplicated subtrees are the shuffle/scan
you pay without noticing).

Build-only: walks the pre-execution sparkPlan. Reported per query:
total leaf-scan count, distinct scan identities, and the max
multiplicity of any single identity. High max multiplicity flags the
fan-out-materialization candidates (the acf/streaks/periodogram class
fixed in r12); AQE exchange reuse can absorb SOME of these at
runtime, so every candidate is re-measured before being changed.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_USE_LAYOUT", "1")

from piholelongtermstats_spark.plans import QUERIES  # noqa: E402
from piholelongtermstats_spark.session import get_spark  # noqa: E402


def leaf_scans(df):
    """List of leaf-scan identity strings in the physical plan."""
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        ch = node.children()
        n = ch.size()
        if n == 0:
            if "Scan" in name or "RDD" in name or "InMemory" in name:
                # identity = node class + first line of its string
                # (table/path for scans, RDD id for checkpoints);
                # expression ids (#123) are per-occurrence noise
                ident = re.sub(r"#\d+", "#", node.toString().splitlines()[0])
                out.append(name + ":" + ident[:140])
            return
        for i in range(n):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark("phlts-scan-census")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        try:
            scans = leaf_scans(QUERIES[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}", file=sys.stderr)
            continue
        ident: dict[str, int] = {}
        for s in scans:
            ident[s] = ident.get(s, 0) + 1
        mx = max(ident.values(), default=0)
        rows.append((mx, len(scans), len(ident), name))
    rows.sort(reverse=True)
    print(f"{'max_mult':>8s} {'scans':>6s} {'kinds':>6s}  query")
    for mx, tot, kinds, name in rows:
        if mx > 1:
            print(f"{mx:8d} {tot:6d} {kinds:6d}  {name}")
    n_flagged = sum(1 for r in rows if r[0] > 1)
    print(f"\n{n_flagged} queries with a repeated identical leaf scan")


if __name__ == "__main__":
    main()
