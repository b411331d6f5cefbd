"""Exact set-similarity joins via prefix filtering (AllPairs / PPJoin
family — Chaudhuri et al., ICDE 2006; Bayardo et al., WWW 2007;
Xiao et al., WWW 2008).

This is the third exact-Jaccard tier next to the full token-equality
join (``dedup.ngram_jaccard_pairs``) and its df-capped variant:

- the FULL join explodes every shingle of every document into the
  candidate join — at 100 TB the frequent-shingle fan-out is quadratic;
- the ``df_cap`` variant bounds the fan-out by generating candidates
  from rare shingles only, and restores exactness with a stop-heavy
  fallback that DEGRADES TO THE FULL QUADRATIC JOIN when documents are
  mostly made of frequent shingles (dedup.py:240-300);
- PREFIX FILTERING bounds the fan-out with ZERO recall loss. Order the
  universe of shingles by ascending document frequency (rarest first;
  ties broken by the shingle string — any fixed total order works) and
  sort every document's shingle set in that order. For Jaccard
  threshold t, two sets x, y with J(x,y) ≥ t must share at least one
  shingle inside each other's first ``|x| - ⌈t·|x|⌉ + 1`` shingles
  (the *prefix*): if they shared none, the overlap is at most
  ``min(|x|,|y|) - p`` which is < t·|x∪y|. So generating candidates
  from prefixes only is provably complete, and because prefixes hold
  the RAREST shingles, the candidate join fan-out per shingle is the
  smallest possible. The PPJoin POSITIONAL filter prunes further, still
  losslessly (see the inline note in ``_candidates``).

Two shapes share the machinery:

- ``prefix_filter_pairs(sh, num, den)`` — SELF-join: all pairs within
  one corpus (near-dup discovery);
- ``prefix_filter_join(sh_a, sh_b, num, den)`` — R⋈S join: pairs
  across two corpora under a SHARED frequency order (computed over the
  union universe). This is the incremental-ingest shape: dedup a new
  batch against the existing corpus without re-joining the corpus with
  itself — the corpus side is touched once for dfs, once for its
  prefixes, once for the candidate re-score.

Scale shape (100 TB): one shuffle to count shingle document
frequencies, one shuffle to regroup per document (bounded rows per
document — a document's shingle set fits an executor by construction),
an equi-join on prefix shingles whose per-key fan-out is bounded
by construction (prefix shingles are rare), then an exact re-score of
the (few) candidate pairs. Every comparison in the accept gate is
integer cross-multiplication — no fp in the decision path.

Threshold is passed as an exact rational (num, den) so prefix lengths
and the final accept gate stay in integer arithmetic end-to-end.

Relation to ``dedup.ngram_jaccard_pairs(df_cap=...)``: both are exact.
df_cap was measured FASTER at sf0.1 on a natural corpus (its in-join
rare-intersection bound prunes the re-score to a handful of pairs; see
the trade note at operators/dedup.py:123-131), but its exactness rests
on a stop-heavy fallback that re-runs the FULL self-join over every
stop-heavy document — a cliff on boilerplate-dominated corpora — plus
an eager probe job to decide whether the cliff applies. Prefix
filtering has no cliff and no probe: candidate volume is always
Σ_doc Σ_{s ∈ prefix(doc)} df(s), which degrades smoothly because the
prefix holds each document's globally rarest shingles. Pick df_cap for
natural-language corpora, prefix filtering when shingle frequencies
are adversarial or unknown. Both are driver-checked against the
identical brute-force oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _check_threshold(threshold_num: int, threshold_den: int) -> tuple[int, int]:
    tnum, tden = int(threshold_num), int(threshold_den)
    if not (0 < tnum <= tden):
        raise ValueError("threshold must be a rational in (0, 1]")
    return tnum, tden


def _prefixes(
    sh: DataFrame, tnum: int, tden: int, extra_keys: tuple = ()
) -> DataFrame:
    """(doc_id, n_sh, pos, shingle) rows for each document's PREFIX:
    the first ``n - ⌈t·n⌉ + 1`` shingles under the (df asc, shingle)
    total order; ``pos`` is the 1-based position in the full sorted
    list. Prefix length in integers: ceil(num*n/den) == (num*n+den-1)
    div den.

    Document frequencies come from ``count() OVER (PARTITION BY
    shingle)`` — ONE shuffle of ``sh`` by shingle, fused with the df
    computation — instead of the r9-era aggregate-then-join (dfreq
    groupBy + a second full-width join of ``sh`` against it). The
    join shape flipped from broadcast to sort-merge as the shingle
    universe grew (the measured 2.65× ×8-volume slope, SCALING.md);
    the window form is a single exchange at every scale and the same
    skew class (a stop shingle's rows land in one task either way;
    WindowExec spills per group, the join sorts per key). Measured
    identical output and ~2× faster at ×2–×8 volume (r9 VERDICT #2).

    ``extra_keys``: pass-through grouping columns (the R⋈S path tags
    each side so BOTH corpora share one union-df window while doc_ids
    may collide across sides).
    """
    w = Window.partitionBy("shingle")
    withdf = sh.withColumn("dfreq", F.count(F.lit(1)).over(w))
    per_doc = (
        withdf.groupBy(*extra_keys, "doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("dfreq"), F.col("shingle")))
            ).alias("ordered"),
            F.count(F.lit(1)).alias("n_sh"),
        )
        .withColumn(
            "prefix_len",
            F.col("n_sh")
            - F.floor(
                (F.lit(tnum) * F.col("n_sh") + F.lit(tden - 1)) / F.lit(tden)
            ).cast("long")
            + F.lit(1),
        )
        .withColumn(
            "prefix",
            F.slice(F.col("ordered").getField("shingle"), 1, F.col("prefix_len")),
        )
        .select(*extra_keys, "doc_id", "n_sh", "prefix")
    )
    return per_doc.select(
        *extra_keys, "doc_id", "n_sh", F.posexplode("prefix").alias("pos0", "shingle")
    ).select(
        *extra_keys, "doc_id", "n_sh", (F.col("pos0") + 1).alias("pos"), "shingle"
    )


def _candidates(
    pref_a: DataFrame, pref_b: DataFrame, tnum: int, tden: int, self_join: bool
) -> DataFrame:
    """Equi-join on prefix shingles with two lossless pruning filters.

    - length filter: min*den >= num*max (J >= t implies min/max >= t);
    - POSITIONAL filter (PPJoin, Xiao et al. 2008): a match on a
      shingle at sorted position i of a and j of b can witness an
      overlap of at most 1 + min(n_a - i, n_b - j) (everything before
      the match in either list is non-shared for the FIRST common
      element). J >= t needs overlap >= t/(1+t)·(n_a+n_b), so rows
      with a smaller upper bound are dropped. Safe: a qualifying
      pair's first common element lies in BOTH prefixes (else the
      prefix theorem is violated) and its row always passes the bound
      — cross-multiplied to stay in integers.
    """
    a, b = pref_a.alias("a"), pref_b.alias("b")
    na, nb = F.col("a.n_sh"), F.col("b.n_sh")
    ubound = F.lit(1) + F.least(na - F.col("a.pos"), nb - F.col("b.pos"))
    cond = (
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.least(na, nb) * tden >= F.greatest(na, nb) * tnum)
        & (ubound * (tnum + tden) >= tnum * (na + nb))
    )
    if self_join:
        cond = cond & (F.col("a.doc_id") < F.col("b.doc_id"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            na.alias("n_a"),
            nb.alias("n_b"),
        )
        .distinct()
    )


def _score(
    cands: DataFrame, sh_a: DataFrame, sh_b: DataFrame, tnum: int, tden: int
) -> DataFrame:
    """Exact re-score of candidates only: each side's full shingle set
    is collected into a per-document ARRAY (one groupBy per side —
    the set fits an executor row by construction, the same bound the
    prefix build already relies on), the candidate pair joins both
    doc-array relations (candidate-count-sized joins), and the
    intersection is ONE row-local ``array_intersect`` — both inputs
    are DISTINCT (doc_id, shingle) sets, so |array_intersect| is the
    exact set intersection. The integer accept gate is unchanged:
    i*den >= num*(n_a + n_b - i).

    r10 restructure (r9 VERDICT #2): the previous form joined the
    candidates against the full shingle RELATION twice (a candidate×
    shingle intermediate of Σ_pairs n_a rows re-sorted by a wide
    string key, the measured slope driver at ×8 volume); the array
    form moves the per-pair work to a hash intersect over two
    in-row arrays. Measured identical output, ~1.3–1.5× faster at
    ×2–×8, and the candidate join's fan-out bound is untouched.
    """
    arr_a = sh_a.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("arr")
    )
    arr_b = sh_b.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("arr")
    )
    j = cands.join(
        arr_a.select(F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a")),
        "doc_a",
    ).join(
        arr_b.select(F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b")),
        "doc_b",
    )
    i = F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
    return (
        j.select("doc_a", "doc_b", "n_a", "n_b", i.alias("i"))
        .filter(
            F.col("i") * tden >= tnum * (F.col("n_a") + F.col("n_b") - F.col("i"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("i")),
                6,
            ).alias("jaccard"),
        )
    )


def prefix_filter_pairs(
    sh: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """All document pairs with Jaccard(shingles) ≥ num/den — exact.

    ``sh``: (doc_id, shingle) DISTINCT rows (dedup.shingles output).
    Returns (doc_a, doc_b, jaccard) with jaccard rounded to 6 — the
    same shape as the brute-force oracle, so the driver can prove the
    prefix-filtered plan returns the identical pair set.
    """
    tnum, tden = _check_threshold(threshold_num, threshold_den)
    pref = _prefixes(sh, tnum, tden)
    cands = _candidates(pref, pref, tnum, tden, self_join=True)
    return _score(cands, sh, sh, tnum, tden)


def prefix_filter_join(
    sh_a: DataFrame,
    sh_b: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """All CROSS-corpus pairs (a from ``sh_a``, b from ``sh_b``) with
    Jaccard ≥ num/den — exact. The shared total order comes from
    document frequencies over the UNION universe (any fixed order is
    complete; union-df keeps the prefixes rare on BOTH sides).

    The incremental-ingest shape: with ``sh_a`` = the new batch and
    ``sh_b`` = the standing corpus, the corpus is never self-joined —
    its cost in this plan is one df pass, one prefix pass, and the
    candidate re-score, all linear.
    """
    tnum, tden = _check_threshold(threshold_num, threshold_den)
    # One side-tagged union so BOTH corpora share a single union-df
    # shingle window (doc_ids may collide across sides — the tag keeps
    # the per-document groupBy keyed per corpus).
    tagged = (
        sh_a.select("doc_id", "shingle")
        .withColumn("_side", F.lit(0))
        .unionByName(
            sh_b.select("doc_id", "shingle").withColumn("_side", F.lit(1))
        )
    )
    pref = _prefixes(tagged, tnum, tden, extra_keys=("_side",))
    pref_a = pref.filter(F.col("_side") == 0).drop("_side")
    pref_b = pref.filter(F.col("_side") == 1).drop("_side")
    cands = _candidates(pref_a, pref_b, tnum, tden, self_join=False)
    return _score(cands, sh_a, sh_b, tnum, tden)


def incremental_new_docs(
    sh_batch: DataFrame,
    sh_corpus: DataFrame,
    threshold_num: int,
    threshold_den: int,
    batch_ids: DataFrame | None = None,
) -> DataFrame:
    """Per-batch-document ingest audit: (doc_id, n_matches, is_new)
    where n_matches counts corpus documents with Jaccard ≥ t and
    is_new ⇔ n_matches = 0 — the accept/reject decision of an
    incremental dedup ingest stage.

    One row per batch document. Pass ``batch_ids`` (a doc_id frame) to
    also cover documents that produced NO shingles (< 3 tokens) — they
    have Jaccard 0 against everything and come out trivially new; the
    DSIR empty-document lesson (r6 VERDICT) applied here from day one.
    """
    matches = prefix_filter_join(sh_batch, sh_corpus, threshold_num, threshold_den)
    per_doc = matches.groupBy(F.col("doc_a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_matches")
    )
    ids = (
        batch_ids.select("doc_id").distinct()
        if batch_ids is not None
        else sh_batch.select("doc_id").distinct()
    )
    return (
        ids.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            (F.coalesce("n_matches", F.lit(0)) == 0).alias("is_new"),
        )
    )
