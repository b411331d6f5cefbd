"""One-off census: which registry queries end in (or contain) a global
Sort over a NON-bounded relation — i.e. pay a rangepartitioning
exchange (sampling = double execution of the child) for an ordering
neither checker needs (the driver hash is order-insensitive,
check_oracle.normalize() sorts rows).

Build-only: walks the pre-execution sparkPlan, no jobs run. Bounded =
every leaf path passes through an aggregate/limit (plans/metrics
boundedness), in which case the sorted relation is counts-sized and
the sort is harmless.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from piholelongtermstats_spark.plans import QUERIES  # noqa: E402
from piholelongtermstats_spark.plans.metrics import _path_bounded  # noqa: E402
from piholelongtermstats_spark.session import get_spark  # noqa: E402


def _walk_logical(node):
    yield node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_logical(ch.apply(i))


def global_sorts(df):
    """(node, bounded) for every global Sort in the physical plan."""
    out = []

    def walk(node, under_limit):
        name = node.getClass().getSimpleName()
        if name in ("TakeOrderedAndProjectExec", "CollectLimitExec", "GlobalLimitExec"):
            under_limit = True
        if name == "SortExec" and not under_limit:
            try:
                is_global = getattr(node, "global")()
            except Exception:
                is_global = False
            if is_global:
                try:
                    ch = node.child()
                    out.append((node.toString()[:120], _path_bounded(ch)))
                except Exception:
                    pass
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), under_limit)

    walk(df._jdf.queryExecution().sparkPlan(), False)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sort-census")
    spark.sparkContext.setLogLevel("ERROR")
    flagged = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"BUILDFAIL {name}: {e!r}"[:160])
            continue
        sorts = global_sorts(df)
        unbounded = [s for s, b in sorts if not b]
        if unbounded:
            flagged.append(name)
            print(f"UNBOUNDED-SORT {name}: {unbounded[0]}")
    print(f"\n{len(flagged)} queries with an unbounded global sort")
    print(flagged)


if __name__ == "__main__":
    main()
