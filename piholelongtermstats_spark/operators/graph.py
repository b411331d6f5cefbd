"""Iterative graph analytics over the client↔domain bipartite graph.

Complements the connected-components pair (label propagation + star
contraction, operators/dedup.py) with the ITERATIVE-NUMERIC family:
PageRank by power iteration. The reference has per-client activity
panels only; ranking entities by walk centrality ("which domains
anchor the traffic graph") is the standard OLAP-graph workload this
engine should serve.

Scale shape: nodes are namespaced strings ('c:'/'d:'), edges are the
DISTINCT client↔domain pairs in both directions (so the bipartite
walk is symmetric and no sink handling is needed — every node has
out-degree ≥ 1 by construction). Each power iteration is one
edges⋈ranks hash join on src + one dst partial-agg — the same two
shuffles regardless of iteration count — with localCheckpoint every
few rounds to bound lineage/planning time (the dedup-components
lesson). Nothing is collected; the damping term is pure arithmetic.

fp: rank mass is a float sum whose accumulation order is partition-
dependent, so the registry entry is rows-only (like the trained
vector indexes) with a numpy differential test asserting agreement
to 1e-9 and the serving edge rounding to 8 digits with a pinned
(rank, node) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
N_ITER = 10


def bipartite_edges(fact: DataFrame) -> DataFrame:
    """Distinct client↔domain edges, both directions, namespaced."""
    cd = fact.select(
        F.concat(F.lit("c:"), F.col("client")).alias("src"),
        F.concat(F.lit("d:"), F.col("domain")).alias("dst"),
    ).distinct()
    return cd.unionByName(
        cd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(
    fact: DataFrame,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    top: "int | None" = 20,
) -> DataFrame:
    """(node, rank) — top-``top`` nodes by PageRank after ``n_iter``
    power iterations, rank rounded to 8 digits, (rank DESC, node ASC)
    tie-break."""
    edges = bipartite_edges(fact)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges = edges.join(deg, "src").persist()
    n = edges.select("src").distinct().count()
    if n == 0:  # empty graph: well-formed empty result (driver probe)
        edges.unpersist()
        return fact.sparkSession.createDataFrame(
            [], "node string, rank double"
        )
    ranks = edges.select("src").distinct().select(
        F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank")
    )
    base = (1.0 - damping) / n
    for i in range(n_iter):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("in_mass")).alias("rank"),
        )
        if (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint()
    # eager checkpoint truncates the remaining edges lineage, so the
    # shared edge relation can be released without a recompute at
    # consumption (no leaked persist — the dsir lesson)
    ranks = ranks.localCheckpoint()
    edges.unpersist()
    out = ranks.select(
        "node", F.round(F.col("rank"), 8).alias("rank")
    ).orderBy(F.col("rank").desc(), F.col("node").asc())
    # top=None returns the full ranking (a huge literal limit would
    # make TakeOrdered allocate a k-sized heap per partition)
    return out if top is None else out.limit(top)
