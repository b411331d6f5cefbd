r"""M7 registry: dedup / text-analysis / similarity / multimodal
queries over the `documents` and `embeddings` tables, each paired with
DuckDB oracle SQL where SQL-expressible (LSH-internal ops are
rows-only by design — the driver records the weaker check).

Shared hash primitive (bit-identical across engines):
Spark  conv(substr(md5(x),1,15), 16, 10)::long
DuckDB ('0x' || substr(md5(x),1,15))::BIGINT
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import dedup, multimodal, similarity, text
from piholelongtermstats_spark.plans.cache import shared_docs, shared_emb, shared_input
from piholelongtermstats_spark.plans.registry import register
from piholelongtermstats_spark.session import ensure_session_defaults
from piholelongtermstats_spark.sources.parquet import load_table

# DuckDB equivalents of the shared building blocks.
_TOKS = r"list_filter(string_split_regex(trim(text), '\s+'), tk -> tk <> '')"

_SHINGLE_CTE = rf"""
WITH tk AS (
  SELECT doc_id,
         unnest({_TOKS}) AS tok,
         unnest(generate_series(1, len({_TOKS}))) AS pos
  FROM documents
), sh_raw AS (
  SELECT doc_id,
         tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh_raw WHERE shingle IS NOT NULL
)
"""

_SW = "'" + "','".join(text.STOPWORDS) + "'"

# MinHash universal-hash permutations, mirrored from dedup.PERM_COEFFS
# (md5-derived at import time on the Python side; the oracle gets the
# resolved integer literals — same arithmetic, same values).
_PERM_VALUES = ",".join(
    f"({p},{a},{b})" for p, (a, b) in enumerate(dedup.PERM_COEFFS)
)
_SIG_CTE = f"""
, hbase AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {dedup.MERSENNE_P} AS h
  FROM sh
), sig AS (
  SELECT doc_id, CAST(p.perm AS BIGINT) AS perm,
         min((p.a * h + p.b) % {dedup.MERSENNE_P}) AS minhash
  FROM hbase CROSS JOIN (VALUES {_PERM_VALUES}) AS p(perm, a, b)
  GROUP BY 1, 2
)
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_defaults(spark)
    return shared_docs(spark, sf_dir)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session_defaults(spark)
    return shared_emb(spark, sf_dir)


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared persisted 3-gram shingle set — built once, reused by the
    Jaccard / MinHash / LSH tiers (each would otherwise recompute it)."""
    return shared_input(
        spark, "shingles3", sf_dir, lambda: dedup.shingles(_docs(spark, sf_dir))
    )


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared persisted LSH candidate pairs — the pair/cluster/survivor
    tier (lsh_candidate_pairs, dedup_clusters[_star], dedup_survivors)
    all consume the same banded self-join; materialize it once per
    session instead of re-running minhash + banding per query."""
    return shared_input(
        spark,
        "lsh_pairs",
        sf_dir,
        lambda: dedup.lsh_candidate_pairs(
            _docs(spark, sf_dir), sh=_shingles(spark, sf_dir)
        ),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@register(
    "exact_dedup",
    """
WITH d2 AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
SELECT count(*) AS n_rows,
       count(DISTINCT text) AS n_distinct_texts,
       count(*) - count(DISTINCT text) AS n_duplicate_rows
FROM d2
""",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup accounting over a deliberately doubled input —
    demonstrates hash-groupBy dedup with a verifiable answer."""
    docs = _docs(spark, sf_dir)
    return dedup.exact_dedup_counts(docs.unionByName(docs))


_JACCARD_ORACLE = (
    _SHINGLE_CTE
    + """
, sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 6) >= 0.8
"""
)


@register("ngram_jaccard_pairs", _JACCARD_ORACLE)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), 0.8, sh=_shingles(spark, sf_dir)
    )


@register("ngram_jaccard_capped", _JACCARD_ORACLE)
def q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stop-shingle-mitigated candidate path (df_cap) checked
    against the SAME exact-Jaccard oracle: candidates come from
    shingles with document frequency ≤ 100 only, then candidates are
    re-scored exactly — the driver proves the skew-bounded plan
    returns the identical pair set."""
    return dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), 0.8, sh=_shingles(spark, sf_dir), df_cap=100
    )


@register(
    "minhash_signatures",
    _SHINGLE_CTE + _SIG_CTE + "SELECT doc_id, perm, minhash FROM sig",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(_docs(spark, sf_dir), sh=_shingles(spark, sf_dir))


@register(
    "lsh_candidate_pairs",
    _SHINGLE_CTE
    + _SIG_CTE
    + """
, keys AS (
  SELECT doc_id, perm // 4 AS band,
         string_agg(minhash::VARCHAR, ',' ORDER BY perm) AS band_key
  FROM sig GROUP BY doc_id, band
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM keys a
JOIN keys b ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id
""",
)
def q_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir)


# Duplicate clusters: transitive closure over the LSH candidate pairs.
# DuckDB checks the iterative Spark label propagation with a recursive
# CTE (closure is fine at oracle scale: components are small near-dup
# groups). WITH RECURSIVE must head the whole chain.
_CLUSTERS_ORACLE = (
    (_SHINGLE_CTE + _SIG_CTE).replace("WITH tk AS", "WITH RECURSIVE tk AS", 1)
    + """
, keys AS (
  SELECT doc_id, perm // 4 AS band,
         string_agg(minhash::VARCHAR, ',' ORDER BY perm) AS band_key
  FROM sig GROUP BY doc_id, band
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keys a
  JOIN keys b ON a.band = b.band AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src
"""
)


@register("dedup_clusters", _CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over LSH candidate pairs → duplicate
    clusters (transitive near-dup groups); iterative min-label
    propagation checked against a DuckDB recursive-CTE closure."""
    return dedup.duplicate_clusters(_pairs(spark, sf_dir))


def _star_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared persisted star-contraction cluster labels (r4): the
    cluster/survivor tier (dedup_clusters_star, dedup_survivors) both
    consume the same components — materialize them once per session,
    the same resident-working-set model as _pairs/_shingles. The
    label-propagation variant (dedup_clusters) stays UNshared as the
    differential baseline, and dedup_scale_2x recomputes everything
    from scratch by design (it is the uncached end-to-end proof)."""
    return shared_input(
        spark,
        "clusters_star",
        sf_dir,
        lambda: dedup.duplicate_clusters_star(_pairs(spark, sf_dir)),
    )


@register("dedup_clusters_star", _CLUSTERS_ORACLE)
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via large-star/small-star contraction —
    the billion-edge scale path (edge-rewriting, O(log n) rounds) —
    checked against the same recursive-CTE closure oracle as the
    label-propagation variant."""
    return _star_clusters(spark, sf_dir)


@register(
    "simhash",
    rf"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok
), v AS (
  SELECT doc_id, bit,
         CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS bit)
), s AS (
  SELECT doc_id, bit, CAST(sum(vote) AS BIGINT) AS s FROM v GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0::BIGINT END) AS BIGINT)
         AS simhash
FROM s GROUP BY doc_id
""",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@register(
    "text_stats",
    rf"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS tok_chars,
    CAST(len(list_filter(toks, x -> x IN ({_SW}))) AS BIGINT) AS sw
  FROM t
)
SELECT doc_id, n_tokens, n_chars,
  CAST(tok_chars AS DOUBLE) / n_tokens AS avg_token_len,
  CAST(sw AS DOUBLE) / n_tokens AS stopword_ratio,
  -- exact-integer numerator over 80000*n, one float division, NOT
  -- rounded (matches operators/text.text_stats bit-for-bit; round()
  -- itself is engine-dependent at exact decimal boundaries)
  CAST(4 * least(n_tokens, 100) * 80 * n_tokens
     + 3 * (n_tokens - sw) * 8000
     + 3 * least(tok_chars, 8 * n_tokens) * 1000 AS DOUBLE)
  / (80000 * n_tokens) AS quality_score
FROM m
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.text_stats(_docs(spark, sf_dir))


@register(
    "token_count_bpe",
    rf"""
SELECT doc_id,
  CAST(len({_TOKS}) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
    AS bpe_tokens
FROM documents
""",
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_count_bpe(_docs(spark, sf_dir))


def _lang_oracle() -> str:
    score_cols = ",\n    ".join(
        "len(list_filter(toks, x -> x IN ({lst}))) AS score_{lang}".format(
            lst="'" + "','".join(markers) + "'", lang=lang
        )
        for lang, markers in sorted(text.LANG_MARKERS.items())
    )
    langs = sorted(text.LANG_MARKERS)
    great = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    whens = "\n       ".join(
        f"WHEN score_{lang} = {great} THEN '{lang}'" for lang in langs[:-1]
    )
    return rf"""
WITH t AS (
  SELECT doc_id, lang AS actual_lang,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), tk -> tk <> '') AS toks
  FROM documents
), s AS (
  SELECT doc_id, actual_lang,
    {score_cols}
  FROM t
)
SELECT doc_id, actual_lang,
  CASE WHEN {great} = 0 THEN 'und'
       {whens}
       ELSE '{langs[-1]}' END AS pred_lang,
  CAST({great} AS BIGINT) AS best_score
FROM s
"""


@register("lang_id", _lang_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.lang_id(_docs(spark, sf_dir))


@register(
    "doc_fingerprint",
    rf"""
SELECT doc_id,
  list_reduce(
    list_prepend(0::BIGINT,
      list_transform({_TOKS},
        x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 1000000007)),
    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM documents
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

@register(
    "cosine_topk",
    """
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
)
SELECT vec_id, label,
       round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cosine
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id LIMIT 10
""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_topk(_emb(spark, sf_dir), 0, 10)


# The md5-derived hyperplanes are deterministic Python-side constants
# (similarity.plane_signs), so the oracle embeds the IDENTICAL planes
# as SQL array literals and reproduces buckets bit-for-bit. Plane
# count is pinned to N_PLANES (=4) in these oracle-checked entries —
# the adaptive sizing (embedding_near_dup_pairs n_planes=None) stays
# the production default and is covered by pytest recall tests.
_EMB_DIM = 64  # driver testdata embedding dimensionality (all SFs)


def _bucket_sql(col: str, n_planes: int = similarity.N_PLANES) -> str:
    terms = []
    for p in range(n_planes):
        lit = "[" + ",".join(repr(s) for s in similarity.plane_signs(_EMB_DIM, p)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({col}, {lit}::DOUBLE[]) > 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


_BUCKETED_CTE = f"""
WITH b AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         {_bucket_sql('embedding::DOUBLE[]')} AS bucket
  FROM embeddings
)
"""


@register(
    "lsh_ann_topk",
    _BUCKETED_CTE
    + """
, q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
SELECT vec_id, label,
       round(list_cosine_similarity(v, qv), 6) AS cosine
FROM b, q
WHERE vec_id <> 0
  AND (bucket = qb OR bucket = xor(qb, 1) OR bucket = xor(qb, 2))
ORDER BY cosine DESC, vec_id LIMIT 10
""",
)
def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multiprobe=2: probe the query bucket + its two nearest
    # hamming-1 neighbors — ~3/16 of the corpus scanned, recall
    # measured ≥ single-bucket in tests.
    return similarity.lsh_ann_topk(_emb(spark, sf_dir), 0, 10, multiprobe=2)


# ---------------------------------------------------------------------------
# IVF / PQ ANN — oracle-checked with PINNED deterministic quantizers
# (r3 VERDICT #4): the index parameters are corpus-independent
# md5-derived constants (ivf.fixed_centroids / pq.fixed_codebooks,
# values j/32768−1 — exactly representable doubles), so the DuckDB
# oracle embeds the IDENTICAL literals and reproduces cell assignment
# / code assignment / probe selection / ADC candidate cut exactly.
# The data-adaptive trained quantizers (train_centroids /
# train_pq_codebooks) stay the production default — registered below
# the line as *_trained (rows-only: an iterative k-means isn't a
# static SQL string) and covered by pytest recall tests.
#
# FP caveat (r4 ADVICE): "exactly" above assumes no argmax/ordering
# decision is within floating-point error of a tie — Spark scores via
# numpy BLAS matmul, DuckDB via list_dot_product, and their
# accumulation orders differ, so an ulp-level near-tie COULD flip a
# cell/code/probe decision between engines. The assumption is
# enforced, not hoped for: tests/test_fp_determinism.py measures every
# such decision's margin against an exactly-rounded fsum reference
# (observed ≫ 1e-7 vs ~1e-13 accumulation error) on each corpus, so a
# future near-tie fails there with a number instead of surfacing as a
# mystery parity mismatch.
# ---------------------------------------------------------------------------

from piholelongtermstats_spark.operators import ivf as _ivf_mod
from piholelongtermstats_spark.operators import pq as _pq_mod

_IVF_CENTS = _ivf_mod.fixed_centroids(_EMB_DIM)
_PQ_CBS = _pq_mod.fixed_codebooks(_EMB_DIM)


def _arr(vals) -> str:
    return "[" + ",".join(repr(float(x)) for x in vals) + "]::DOUBLE[]"


_IVF_CENT_VALUES = ",".join(
    f"({i}, {_arr(c)})" for i, c in enumerate(_IVF_CENTS)
)

# assignment: argmin |v−c|² = argmax (v·c − |c|²/2), ties → lowest
# cell (np.argmax first-hit ⇔ ORDER BY score DESC, cell ASC);
# probe: nprobe centroids nearest to the query vector, ties → lowest
# cell (Python sorted on (dist, cell) ⇔ ORDER BY distance, cell).
_V_CTE = "v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)"


def _ivf_search_body(cent: str = "cent") -> str:
    """The IVF search tail (assignment → probe → cell-restricted exact
    cosine scan) over any centroid relation ``{cent}(cell, c)`` —
    shared by the pinned-quantizer oracle and the trained-replay
    oracle (oracle_train.py)."""
    return f""",
scored AS (
  SELECT v.vec_id, v.label, v.v, {cent}.cell,
         list_dot_product(v.v, {cent}.c)
           - 0.5 * list_dot_product({cent}.c, {cent}.c) AS score
  FROM v CROSS JOIN {cent}),
assigned AS (
  SELECT vec_id, label, v, cell FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
    FROM scored) WHERE rn = 1),
q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
probe AS (
  SELECT cell FROM {cent}, q
  ORDER BY list_distance(c, qv), cell LIMIT {_ivf_mod.N_PROBE})
SELECT a.vec_id, a.label,
       round(list_cosine_similarity(a.v, q.qv), 6) AS cosine
FROM assigned a, q
WHERE a.cell IN (SELECT cell FROM probe) AND a.vec_id <> 0
ORDER BY cosine DESC, a.vec_id LIMIT 10
"""


_IVF_SQL = (
    f"""
WITH {_V_CTE},
cent AS (SELECT * FROM (VALUES {_IVF_CENT_VALUES}) AS t(cell, c))"""
    + _ivf_search_body()
)


@register("ivf_ann_topk", _IVF_SQL)
def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (16 cells, probe 4) with the pinned
    deterministic quantizer — assignment, probe selection, and the
    cell-restricted exact-cosine scan are all oracle-reproduced."""
    return _ivf_mod.ivf_ann_topk(
        _emb(spark, sf_dir), 0, 10, centroids=_IVF_CENTS
    )


_SUBDIM = _EMB_DIM // _pq_mod.N_SUB
_PQ_CB_VALUES = ",".join(
    f"({s},{code},{_arr(c)})"
    for s, book in enumerate(_PQ_CBS)
    for code, c in enumerate(book)
)

def _pq_search_body(cb: str = "cb") -> str:
    """The PQ search tail (per-subspace code assignment → ADC
    candidate cut → exact re-rank) over any codebook relation
    ``{cb}(s, code, c)`` — shared by the pinned and trained-replay
    oracles."""
    return f""",
subs AS (
  SELECT vec_id,
         CAST(t.s AS INTEGER) AS s,
         list_slice(v, t.s * {_SUBDIM} + 1, (t.s + 1) * {_SUBDIM}) AS vs
  FROM v, range({_pq_mod.N_SUB}) t(s)),
assigned AS (
  SELECT vec_id, s, c FROM (
    SELECT subs.vec_id, subs.s, {cb}.c,
      row_number() OVER (PARTITION BY subs.vec_id, subs.s
        ORDER BY list_dot_product(subs.vs, {cb}.c)
                 - 0.5 * list_dot_product({cb}.c, {cb}.c) DESC, {cb}.code) AS rn
    FROM subs JOIN {cb} ON subs.s = {cb}.s) WHERE rn = 1),
q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn
      FROM v WHERE vec_id = 0),
qsubs AS (
  SELECT CAST(t.s AS INTEGER) AS s,
         list_slice(qv, t.s * {_SUBDIM} + 1, (t.s + 1) * {_SUBDIM}) AS qs
  FROM q, range({_pq_mod.N_SUB}) t(s)),
approx AS (
  SELECT a.vec_id, sum(list_dot_product(qs.qs, a.c)) AS ip
  FROM assigned a JOIN qsubs qs ON a.s = qs.s
  WHERE a.vec_id <> 0 GROUP BY a.vec_id),
cand AS (
  SELECT approx.vec_id
  FROM approx
  JOIN (SELECT vec_id, sqrt(list_dot_product(v, v)) AS vn FROM v)
    USING (vec_id), q
  ORDER BY ip / (vn * qn) DESC, vec_id LIMIT 40)
SELECT v.vec_id, v.label,
       round(list_cosine_similarity(v.v, q.qv), 6) AS cosine
FROM v JOIN cand USING (vec_id), q
ORDER BY cosine DESC, v.vec_id LIMIT 10
"""


_PQ_SQL = (
    f"""
WITH {_V_CTE},
cb AS (SELECT * FROM (VALUES {_PQ_CB_VALUES}) AS t(s, code, c))"""
    + _pq_search_body()
)


@register("pq_ann_topk", _PQ_SQL)
def q_pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (8 subspaces × 16 codes, ADC scan +
    exact re-rank over 4k=40 candidates) with the pinned deterministic
    codebooks — code assignment, the ADC candidate cut, and the exact
    re-rank are all oracle-reproduced."""
    return _pq_mod.pq_ann_topk(_emb(spark, sf_dir), 0, 10, codebooks=_PQ_CBS)


# Trained-path oracle (r10 VERDICT #4): the 2-iteration Lloyd loop on
# the vec_id % 4 subsample is unrolled into CTEs (oracle_train.py),
# then the identical search body runs over the replayed centroids.
from piholelongtermstats_spark.plans.oracle_train import (  # noqa: E402
    lloyd_cents_ctes,
    lloyd_pq_ctes,
)

_IVF_TR_SQL = (
    f"WITH {_V_CTE},"
    + lloyd_cents_ctes(
        "t_",
        n_cells=_ivf_mod.N_CELLS,
        n_iters=2,
        dim=_EMB_DIM,
        metric="l2",
        pred="vec_id % 4 = 0",
    )
    + _ivf_search_body("t_cent")
)


@register("ivf_ann_topk_trained", _IVF_TR_SQL)
def q_ivf_ann_topk_trained(
    spark: SparkSession, sf_dir: str, qv: list | None = None
) -> DataFrame:
    """The production data-adaptive IVF path (16 cells trained on a
    1/4 subsample, 2 Lloyd iterations, probe 4), centroids cached per
    (session, corpus) — train once, search many. Oracle-checked since
    r11: the trainer replays as unrolled Lloyd CTEs (oracle_train.py),
    safe because centroids reach the output only through
    margin-guarded integer decisions (tests/test_fp_determinism.py).
    ``qv`` passes a pre-fetched query vector through (the recall
    panel fetches vec_id 0 once for all three single-query legs)."""
    emb = _emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, 16, 2, 4)
    cents = _ivf_mod._CENTROID_CACHE.get(key)
    if cents is None:
        cents = _ivf_mod.train_centroids(emb, n_iters=2, sample_mod=4)
        _ivf_mod._CENTROID_CACHE[key] = cents
    return _ivf_mod.ivf_ann_topk(emb, 0, 10, centroids=cents, qv=qv)


# Trained-path oracle: the per-subspace 2-iteration Lloyd loop on the
# vec_id % 2 subsample unrolled as CTEs, then the identical ADC body.
_PQ_TR_SQL = (
    f"WITH {_V_CTE},"
    + lloyd_pq_ctes(
        "t_",
        n_sub=_pq_mod.N_SUB,
        n_codes=_pq_mod.N_CODES,
        n_iters=2,
        dim=_EMB_DIM,
        pred="vec_id % 2 = 0",
    )
    + _pq_search_body("t_cb")
)


@register("pq_ann_topk_trained", _PQ_TR_SQL)
def q_pq_ann_topk_trained(
    spark: SparkSession, sf_dir: str, qv: list | None = None
) -> DataFrame:
    """The production data-adaptive PQ path (codebooks trained with 2
    Lloyd iterations on a 1/2 subsample), cached like the IVF
    centroids. Oracle-checked since r11 via the per-subspace unrolled
    Lloyd replay (oracle_train.py). ``qv``: see
    q_ivf_ann_topk_trained."""
    emb = _emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, 8, 16, 2)
    cbs = _pq_mod._CODEBOOK_CACHE.get(key)
    if cbs is None:
        cbs = _pq_mod.train_pq_codebooks(emb, n_iters=2, sample_mod=2)
        _pq_mod._CODEBOOK_CACHE[key] = cbs
    return _pq_mod.pq_ann_topk(emb, 0, 10, codebooks=cbs, qv=qv)


@register(
    "embedding_near_dup",
    _BUCKETED_CTE
    + """
SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b2.v), 6) AS cosine
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE round(list_cosine_similarity(a.v, b2.v), 6) >= 0.4
""",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 0.4: the synthetic embeddings have no planted near-dups (max
    # pairwise cosine ≈ 0.5), so a production-style 0.95 threshold
    # would trivially return zero rows. n_planes pinned to 4 so the
    # static oracle holds at any SF (adaptive sizing tested in pytest).
    return similarity.embedding_near_dup_pairs(
        _emb(spark, sf_dir), 0.4, n_planes=similarity.N_PLANES
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

@register(
    "media_byte_stats",
    """
SELECT mime, count(*) AS n_items,
       CAST(sum(nb) AS BIGINT) AS total_bytes,
       round(CAST(CAST(sum(nb) AS BIGINT) AS DOUBLE) / count(*), 6) AS avg_bytes
FROM (SELECT 'text/plain' AS mime, octet_length(encode(text)) AS nb FROM documents)
GROUP BY mime
""",
)
def q_media_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.byte_stats(multimodal.docs_as_media(_docs(spark, sf_dir)))


@register("media_features")  # rows-only: decode is a stubbed Pandas UDF
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.docs_as_media(_docs(spark, sf_dir))
    return multimodal.extract_features(media, fake=True)


@register("media_resize")  # rows-only: stubbed decode, real metadata math
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.docs_as_media(_docs(spark, sf_dir))
    return multimodal.resize_images(media, max_side=256)


@register("media_frames")  # rows-only: stubbed decode, real fan-out shape
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.docs_as_media(_docs(spark, sf_dir)).limit(100)
    return multimodal.sample_frames(media, every_ms=1000, duration_ms=5000)


# Oracle-checked projections of the stubbed media pipelines: DuckDB
# v1.0 has no BLOB substring/md5, so raw payload bytes can't cross the
# oracle boundary — these check everything EXCEPT the bytes: the
# resize metadata arithmetic, and the frame fan-out shape + slice
# arithmetic (payload lengths), over a deterministic doc subset.

@register(
    "media_resize_check",
    """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(256 AS INTEGER) AS width, CAST(256 AS INTEGER) AS height
FROM documents
""",
)
def q_media_resize_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize_images with NULL source dims fills max_side=256 and
    scale clips to 1.0 → 256×256 passthrough; payload verified by
    length (bytes can't cross the DuckDB boundary)."""
    from pyspark.sql import functions as F

    media = multimodal.docs_as_media(_docs(spark, sf_dir))
    return multimodal.resize_images(media, max_side=256).select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        "width",
        "height",
    )


@register(
    "media_frames_check",
    """
WITH m AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS n0
  FROM documents WHERE doc_id < 100
), i AS (SELECT unnest(generate_series(0, 4)) AS frame_idx)
SELECT media_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * 1000 AS BIGINT) AS frame_ts_ms,
       CAST(greatest(least(16, n0 - ((frame_idx * 16) % greatest(n0, 1))), 0)
            AS BIGINT) AS n_bytes
FROM m CROSS JOIN i
""",
)
def q_media_frames_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample_frames fan-out over a DETERMINISTIC subset (doc_id<100 —
    the rows-only variant's limit(100) is not a stable set): 5 frames
    per item, ts = idx·1000 ms, payload = 16-byte slice at
    (idx·16) mod n — the slice-length arithmetic is reproduced in SQL."""
    from pyspark.sql import functions as F

    media = multimodal.docs_as_media(_docs(spark, sf_dir)).filter(
        F.col("media_id") < 100
    )
    return multimodal.sample_frames(media, every_ms=1000, duration_ms=5000).select(
        "media_id",
        "frame_idx",
        "frame_ts_ms",
        F.octet_length("payload").cast("long").alias("n_bytes"),
    )
