"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
SIGIR 1998) — the diversity pass a retrieval stack runs AFTER ANN:
greedily pick the candidate maximizing
    λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s),
so near-duplicate hits don't crowd the result page.

Spark-first shape: the EXPENSIVE stage (score the whole corpus
against the query, cut to n_cand) is the existing distributed
broadcast-projection + TakeOrderedAndProject plan from
similarity.cosine_scores; the greedy re-rank then runs over the tiny
candidate set as ONE catalyst fold (F.aggregate over the selection
steps, nested argmax over the candidate array) — no driver collect,
no repeated corpus scans, no Python in the loop.

fp policy (the similarity.py convention): rel and pairwise sims are
cosines ROUNDED to 6; the greedy comparison λ·rel − (1−λ)·maxsim is
one fixed IEEE expression over rounded operands with a vec_id
tie-break, replayed verbatim by the DuckDB oracle's recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def _cos(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


_CAND_T = "struct<vec_id:bigint,rel:double,v:array<double>>"


def mmr_rerank(
    emb: DataFrame,
    query_vec_id: int = 0,
    n_cand: int = 16,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """(pick_rank, vec_id, rel) — the k MMR picks in selection order
    from the top-``n_cand`` cosine candidates for ``query_vec_id``.

    Greedy ties (equal MMR score) break on smaller vec_id; the first
    pick is pure relevance (max rel, vec_id tie-break) per the MMR
    definition with an empty selected set.
    """
    v = F.col("embedding").cast("array<double>")
    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"), v.alias("v"))
    q = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv")
    )
    cands = (
        base.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "v", _cos(F.col("v"), F.col("qv")).alias("rel"))
        .orderBy(F.col("rel").desc(), F.col("vec_id").asc())
        .limit(n_cand)
    )
    # One row holding the candidate array, sorted (rel desc, vec_id):
    # ascending sort on (-rel, vec_id).
    one = cands.agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("rel")).alias("nr"), "vec_id", "rel", "v"))
        ).alias("xs")
    ).select(
        F.transform(
            "xs", lambda x: F.struct(x["vec_id"], x["rel"], x["v"])
        ).alias("cand")
    )

    def _maxsim(c: Column, sel: Column) -> Column:
        return F.aggregate(
            sel,
            F.lit(-1.0).cast("double"),
            lambda m, s: F.greatest(m, _cos(c["v"], s["v"])),
        )

    def _score(c: Column, sel: Column) -> Column:
        return F.lit(lam) * c["rel"] - F.lit(1.0 - lam) * _maxsim(c, sel)

    def _pick(sel: Column) -> Column:
        remaining = F.filter(
            F.col("cand"),
            lambda c: ~F.exists(sel, lambda s: s["vec_id"] == c["vec_id"]),
        )
        return F.aggregate(
            remaining,
            F.lit(None).cast(_CAND_T),
            lambda b, c: F.when(
                b.isNull()
                | (_score(c, sel) > _score(b, sel))
                | (
                    (_score(c, sel) == _score(b, sel))
                    & (c["vec_id"] < b["vec_id"])
                ),
                c,
            ).otherwise(b),
        )

    def _step(sel: Column, _i: Column) -> Column:
        nxt = _pick(sel)
        # stop growing when candidates are exhausted
        return F.when(nxt.isNull(), sel).otherwise(
            F.concat(sel, F.array(nxt))
        )

    first = F.slice(F.col("cand"), 1, 1)
    if k <= 1:  # sequence(2,1) would run DESCENDING — no fold at all
        picked = first
    else:
        picked = F.aggregate(F.sequence(F.lit(2), F.lit(k)), first, _step)
    return (
        one.filter(F.size("cand") > 0)
        .select(F.posexplode(picked).alias("pos", "p"))
        .select(
            (F.col("pos") + 1).cast("int").alias("pick_rank"),
            F.col("p")["vec_id"].alias("vec_id"),
            F.col("p")["rel"].alias("rel"),
        )
    )
