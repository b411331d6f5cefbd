"""Generated-SQL replay of the deterministic k-means trainers
(r10 VERDICT #4 — the register-replay playbook, applied to training).

The ``*_trained`` registry entries were rows-only since r5 with the
honest reason "iterative k-means training is not one SQL statement".
One statement, no — but a FIXED, SMALL number of unrolled iterations
is (the pagerank_top / kcore_summary graduation protocol): the
trainers (ivf.train_centroids, pq.train_pq_codebooks,
semdedup.train_spherical_centroids) are deterministic Lloyd loops
with md5-ordered seeds and a compile-time iteration count, so this
module unrolls them into DuckDB CTE chains the oracle replays
end-to-end — seeds, per-iteration assignment, member means,
empty-cell carry — and feeds the resulting centroid/codebook relation
into the SAME search body the pinned-quantizer twins already
oracle-check.

Why raw ``avg()`` is safe (no rounding contract): the trained
centroids never appear in any output column — they influence results
ONLY through integer decisions (nearest-cell assignment, probe
selection, ADC candidate cut, within-cell pair gating on
round(cosine, 6)). Spark's partial-agg avg and DuckDB's avg differ by
accumulation order only: ≤ n·ulp ≈ 1e-13 over these corpora, while
every decision margin is ≥ 1e-7 (enforced with numbers, not hope, in
tests/test_fp_determinism.py — extended to the TRAINED quantizers).
A 1e-13 perturbation therefore cannot flip any decision either
engine makes, so the integer outputs agree bit-for-bit even though
the intermediate doubles differ in their last bits.

Every generator assumes a CTE ``v(vec_id, ..., v DOUBLE[])`` over the
embeddings table is already in scope (the twins' convention).
"""

from __future__ import annotations

# DuckDB twin of text.md5_hash60 (the engine-wide seed-order key).
_H60 = "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT"


def _avg_list(col: str, dim: int) -> str:
    """[avg(col[1]), ..., avg(col[dim])] — the element-wise member
    mean, exactly F.avg per dimension (ivf.train_centroids)."""
    return "[" + ", ".join(f"avg({col}[{i + 1}])" for i in range(dim)) + "]"


def _score(metric: str, v: str, c: str) -> str:
    """The assignment score both engines maximize (ties → lowest id).

    l2: argmin |v−c|² = argmax (v·c − |c|²/2)  (ivf._assign_udf)
    cos: argmax v·ĉ = argmax v·c / |c|         (semdedup._spherical_assign_udf)
    """
    if metric == "l2":
        return (
            f"list_dot_product({v}, {c})"
            f" - 0.5 * list_dot_product({c}, {c})"
        )
    if metric == "cos":
        return (
            f"list_dot_product({v}, {c})"
            f" / sqrt(list_dot_product({c}, {c}))"
        )
    raise ValueError(metric)


def lloyd_cents_ctes(
    p: str,
    *,
    n_cells: int,
    n_iters: int,
    dim: int,
    metric: str,
    pred: str | None = None,
) -> str:
    """CTE chain replaying ivf.train_centroids /
    semdedup.train_spherical_centroids; the final relation is
    ``{p}cent(cell, c)``.

    pred: the trainer's subsample predicate over ``v`` (e.g.
    ``vec_id % 4 = 0`` for sample_mod=4), or None for the full corpus.
    """
    where = f" WHERE {pred}" if pred else ""
    parts = [
        f"""
{p}tr AS (SELECT vec_id, v FROM v{where}),
{p}c0 AS (
  SELECT CAST(rn - 1 AS INTEGER) AS cell, c FROM (
    SELECT row_number() OVER (ORDER BY {_H60}, vec_id) AS rn, v AS c
    FROM {p}tr) WHERE rn <= {n_cells})"""
    ]
    for i in range(1, n_iters + 1):
        sc = _score(metric, "t.v", "c.c")
        parts.append(
            f""",
{p}a{i} AS (
  SELECT vec_id, v, cell FROM (
    SELECT t.vec_id, t.v, c.cell,
           row_number() OVER (PARTITION BY t.vec_id
                              ORDER BY {sc} DESC, c.cell) AS rn
    FROM {p}tr t CROSS JOIN {p}c{i - 1} c) WHERE rn = 1),
{p}m{i} AS (
  SELECT cell, {_avg_list('v', dim)} AS c FROM {p}a{i} GROUP BY cell),
{p}c{i} AS (
  SELECT p.cell, coalesce(m.c, p.c) AS c
  FROM {p}c{i - 1} p LEFT JOIN {p}m{i} m USING (cell))"""
        )
    parts.append(f""",
{p}cent AS (SELECT cell, c FROM {p}c{n_iters})""")
    return "".join(parts)


def lloyd_pq_ctes(
    p: str,
    *,
    n_sub: int,
    n_codes: int,
    n_iters: int,
    dim: int,
    pred: str | None = None,
) -> str:
    """CTE chain replaying pq.train_pq_codebooks (shared md5-ordered
    seeds split per subspace, per-(s, code) Lloyd); the final relation
    is ``{p}cb(s, code, c)``."""
    sd = dim // n_sub
    where = f" WHERE {pred}" if pred else ""
    parts = [
        f"""
{p}tr AS (SELECT vec_id, v FROM v{where}),
{p}seed AS (
  SELECT CAST(rn - 1 AS INTEGER) AS code, c FROM (
    SELECT row_number() OVER (ORDER BY {_H60}, vec_id) AS rn, v AS c
    FROM {p}tr) WHERE rn <= {n_codes}),
{p}sub AS (
  SELECT vec_id, CAST(t.s AS INTEGER) AS s,
         list_slice(v, t.s * {sd} + 1, (t.s + 1) * {sd}) AS vs
  FROM {p}tr, range({n_sub}) t(s)),
{p}cb0 AS (
  SELECT CAST(t.s AS INTEGER) AS s, code,
         list_slice(c, t.s * {sd} + 1, (t.s + 1) * {sd}) AS c
  FROM {p}seed, range({n_sub}) t(s))"""
    ]
    for i in range(1, n_iters + 1):
        sc = _score("l2", "u.vs", "b.c")
        parts.append(
            f""",
{p}pa{i} AS (
  SELECT vec_id, s, vs, code FROM (
    SELECT u.vec_id, u.s, u.vs, b.code,
           row_number() OVER (PARTITION BY u.vec_id, u.s
                              ORDER BY {sc} DESC, b.code) AS rn
    FROM {p}sub u JOIN {p}cb{i - 1} b ON u.s = b.s) WHERE rn = 1),
{p}pm{i} AS (
  SELECT s, code, {_avg_list('vs', sd)} AS c
  FROM {p}pa{i} GROUP BY s, code),
{p}cb{i} AS (
  SELECT p.s, p.code, coalesce(m.c, p.c) AS c
  FROM {p}cb{i - 1} p
  LEFT JOIN {p}pm{i} m ON p.s = m.s AND p.code = m.code)"""
        )
    parts.append(f""",
{p}cb AS (SELECT s, code, c FROM {p}cb{n_iters})""")
    return "".join(parts)
