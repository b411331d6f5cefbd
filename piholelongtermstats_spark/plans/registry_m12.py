"""M12 — published-recipe data-selection tier: Gopher heuristic
quality rules (Rae et al. 2021) and DSIR importance resampling
(Xie et al. 2023).

Oracle notes: every Gopher rule is a cross-multiplied INTEGER
comparison, so the panel is exact across engines; DSIR splits at the
repo's fp-policy line — the distributed sufficient statistics
(integer bucket counts) carry a full DuckDB oracle, the log-weight
scoring edge is rows-only (log() is not IEEE-correctly-rounded; see
operators/dsir.py) with a numpy differential test instead."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import dsir as _dsir
from piholelongtermstats_spark.operators import text as _text
from piholelongtermstats_spark.plans.registry import register
from piholelongtermstats_spark.plans.registry_m9 import _docs

# ---------------------------------------------------------------------------
# Gopher quality rules (operators/text.py:gopher_rules)
# ---------------------------------------------------------------------------

_STOP_HITS_SQL = " + ".join(
    f"(CASE WHEN regexp_matches(lower(text), '\\b{w}\\b') THEN 1 ELSE 0 END)"
    for w in _text.GOPHER_STOPS
)

_GOPHER_SQL = f"""
WITH m AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\\s+'), tk -> tk <> '')) AS wc,
         length(regexp_replace(text, '\\s+', '', 'g')) AS word_chars,
         (length(text) - length(replace(text, '#', '')))
           + (length(text) - length(replace(text, '...', ''))) // 3
           + (length(text) - length(replace(text, '…', ''))) AS symbol_cnt,
         len(string_split(text, chr(10))) AS n_lines,
         len(list_filter(string_split(text, chr(10)),
             x -> regexp_matches(x, '^\\s*[-*•]'))) AS bullet_lines,
         len(list_filter(string_split(text, chr(10)),
             x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$'))) AS ellipsis_lines,
         len(list_filter(list_filter(string_split_regex(trim(text), '\\s+'), tk -> tk <> ''),
             w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
         {_STOP_HITS_SQL} AS stop_hits
  FROM documents)
SELECT doc_id,
       CAST(wc AS BIGINT) AS word_count,
       CAST(word_chars AS BIGINT) AS word_chars,
       CAST(symbol_cnt AS BIGINT) AS symbol_cnt,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(bullet_lines AS BIGINT) AS bullet_lines,
       CAST(ellipsis_lines AS BIGINT) AS ellipsis_lines,
       CAST(alpha_words AS BIGINT) AS alpha_words,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       (wc >= 50 AND wc <= 100000) AS r_wordcount,
       (3 * wc <= word_chars AND word_chars <= 10 * wc) AS r_meanlen,
       (symbol_cnt * 10 < wc) AS r_symbol,
       (bullet_lines * 10 < 9 * n_lines) AS r_bullets,
       (ellipsis_lines * 10 < 3 * n_lines) AS r_ellipsis,
       (alpha_words * 5 > 4 * wc) AS r_alpha,
       (stop_hits >= 2) AS r_stops,
       ((wc >= 50 AND wc <= 100000)
        AND (3 * wc <= word_chars AND word_chars <= 10 * wc)
        AND (symbol_cnt * 10 < wc)
        AND (bullet_lines * 10 < 9 * n_lines)
        AND (ellipsis_lines * 10 < 3 * n_lines)
        AND (alpha_words * 5 > 4 * wc)
        AND (stop_hits >= 2)) AS keep
FROM m ORDER BY doc_id
"""


@register("gopher_quality_panel", _GOPHER_SQL)
def q_gopher_quality_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule metrics + integer-exact keep gate."""
    return _text.gopher_rules(_docs(spark, sf_dir)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DSIR (operators/dsir.py)
# ---------------------------------------------------------------------------

_DSIR_COUNTS_SQL = f"""
WITH tok AS (
  SELECT lang = 'en' AS is_t,
         unnest(list_filter(string_split_regex(trim(text), '\\s+'), tk -> tk <> '')) AS w
  FROM documents),
b AS (SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT % {_dsir.B} AS bucket,
             is_t
      FROM tok)
SELECT bucket,
       CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS target_cnt,
       CAST(count(*) AS BIGINT) AS raw_cnt
FROM b GROUP BY bucket ORDER BY bucket
"""


@register("dsir_bucket_counts", _DSIR_COUNTS_SQL)
def q_dsir_bucket_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR sufficient statistics: hashed-unigram bucket counts for
    the target (en) slice vs the full corpus."""
    return _dsir.dsir_bucket_counts(_docs(spark, sf_dir))


@register("dsir_logweights")  # rows-only: log() is not IEEE-exact
def q_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance log-weights + top-25% selection
    (decimal dot-product over driver-pinned log-ratio literals)."""
    return _dsir.dsir_logweights(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# JSONL ingestion with corrupt-record quarantine (sources/jsonl.py):
# the session writes documents as JSONL with every doc_id % 97 == 0
# line deterministically torn, reads it back PERMISSIVE, and audits
# good/quarantine counts plus a text-fidelity hash sum. The oracle
# replays the membership algebra and the SAME hash sum directly on
# the documents table — equality proves the roundtrip lost and
# mangled nothing.
# ---------------------------------------------------------------------------

import hashlib as _hashlib  # noqa: E402
import os as _os  # noqa: E402
import tempfile as _tempfile  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from piholelongtermstats_spark.sources import jsonl as _jsonl  # noqa: E402

_JSONL_MOD = 97
_JSONL_READY: set = set()


def _jsonl_root(spark: SparkSession, sf_dir: str) -> str:
    digest = _hashlib.md5(_os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    root = _os.path.join(
        _tempfile.gettempdir(),
        "phlts_jsonl",
        f"{spark.sparkContext.applicationId}-{digest}",
    )
    key = (spark.sparkContext.applicationId, root)
    if key not in _JSONL_READY:
        _jsonl.write_documents_jsonl(
            _docs(spark, sf_dir), root, corrupt_mod=_JSONL_MOD
        )
        _JSONL_READY.add(key)
    return root


_JSONL_SQL = f"""
SELECT
  CAST(count(*) FILTER (WHERE doc_id % {_JSONL_MOD} <> 0) AS BIGINT) AS n_good,
  CAST(count(*) FILTER (WHERE doc_id % {_JSONL_MOD} = 0) AS BIGINT) AS n_quarantined,
  CAST(sum(doc_id) FILTER (WHERE doc_id % {_JSONL_MOD} <> 0) AS BIGINT) AS good_id_sum,
  CAST(sum(n_chars) FILTER (WHERE doc_id % {_JSONL_MOD} <> 0) AS BIGINT) AS good_chars,
  CAST(sum(('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000007)
       FILTER (WHERE doc_id % {_JSONL_MOD} <> 0) AS BIGINT) AS good_text_hashsum
FROM documents
"""


@register("jsonl_ingest_check", _JSONL_SQL)
def q_jsonl_ingest_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good/quarantine split of the torn-line JSONL export, audited
    by counts + an order-independent text hash sum."""
    root = _jsonl_root(spark, sf_dir)
    good, bad = _jsonl.read_documents_jsonl(spark, root)
    g = good.agg(
        F.count(F.lit(1)).alias("n_good"),
        F.sum("doc_id").alias("good_id_sum"),
        F.sum("n_chars").alias("good_chars"),
        F.sum(_text.md5_hash60(F.col("text")) % 1000000007).alias(
            "good_text_hashsum"
        ),
    )
    b = bad.agg(F.count(F.lit(1)).alias("n_quarantined"))
    return g.crossJoin(b).select(
        "n_good", "n_quarantined", "good_id_sum", "good_chars",
        "good_text_hashsum",
    )


# ---------------------------------------------------------------------------
# Conversion attribution — the BATCH twin of the stream-stream
# windowed join (streaming/join.py). The oracle checks the batch
# definition; tests/test_streaming_join.py pins stream ≡ batch on
# shared files, so this entry extends driver-grade checking to the
# streaming join's result contract (r6 VERDICT #3).
# ---------------------------------------------------------------------------

from piholelongtermstats_spark.sources.events import FACT_CTE as _FACT_CTE  # noqa: E402
from piholelongtermstats_spark.streaming.join import (  # noqa: E402
    attributed_conversions_batch as _conv_batch,
)

_CONV_SQL = _FACT_CTE + """
SELECT v.event_id AS view_id,
       v.ts AS view_ts,
       v.client AS client,
       v.domain AS view_domain,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts
FROM (SELECT * FROM fact WHERE status_type = 'Allowed') v
JOIN (SELECT * FROM fact WHERE status_type = 'Blocked') p
  ON v.client = p.client
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 30 MINUTE
ORDER BY view_id, purchase_id
"""


@register("conversion_attribution", _CONV_SQL)
def q_conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views matched to same-client purchases within the 30-minute
    attribution window — batch twin of the streaming join."""
    from piholelongtermstats_spark.plans.registry import _fact

    return _conv_batch(_fact(spark, sf_dir))
