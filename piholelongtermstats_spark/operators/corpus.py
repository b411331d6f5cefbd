"""Corpus-level pipeline operators: the end-stages of a training-data
build that turn per-document signals into a deliverable corpus.

Beyond-reference capability set (the reference has no document corpus;
these extend the M7 dedup/text tier to the operations a 100 TB
pretraining pipeline actually runs):

- `dedup_survivors`   — materialize the deduplicated corpus: one
                        canonical representative per near-dup cluster.
- `hash_sample`       — deterministic Bernoulli sampling by content
                        hash (reproducible across runs AND engines —
                        no RNG, so the sample is a pure filter).
- `stratified_sample` — exactly-k-per-group sampling with a two-level
                        tournament that never funnels a whole group
                        through one task.
- `tfidf_top_terms`   — per-document top-k TF-IDF terms.
- `contamination_overlap` — benchmark decontamination: per benchmark
                        doc, the max n-gram containment against the
                        rest of the corpus.

All operators are native Column expressions over DataFrames — no
Python UDFs — and every shuffle is keyed on high-cardinality columns
(doc_id, term, shingle) unless explicitly documented otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators.ranks import dense_order_index
from piholelongtermstats_spark.operators.text import STOPWORDS, md5_hash60, tokens


def dedup_survivors(docs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Materialize the deduplicated corpus from cluster labels.

    `clusters` is (doc_id, cluster_id) for every document that belongs
    to a near-dup component (from `dedup.duplicate_clusters` /
    `duplicate_clusters_star`, where cluster_id = min doc_id of the
    component). A document is KEPT iff it is not in any cluster, or it
    is its cluster's canonical representative (doc_id == cluster_id —
    the min-label invariant makes the representative explicit, no
    extra argmin pass needed).

    Scale: one shuffle join of the corpus against the (much smaller,
    but unbounded) cluster-label relation on doc_id. Neither side is
    broadcast — at 100 TB the label table is itself large.
    """
    lab = clusters.select("doc_id", "cluster_id")
    cid = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(lab, "doc_id", "left")
        .select(
            "doc_id",
            cid.alias("cluster_id"),
            (cid == F.col("doc_id")).cast("long").alias("kept"),
        )
    )


def hash_sample(docs: DataFrame, pct: int = 10, key: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    md5_hash60(key) % 100 < pct.

    Sampling by content hash instead of RNG makes the sample (a) a
    pure, rerunnable filter — the same rows survive on every run, on
    any cluster layout, in any engine with md5 — and (b) consistent
    across tables: sampling two tables by the same join key yields
    join-closed samples. This is the standard reproducible-subset
    primitive for pipeline debugging and held-out splits.

    Scale: a map-side filter; no shuffle, prunes at the scan when the
    predicate is on a partition column.
    """
    h = md5_hash60(F.col(key).cast("string"))
    return docs.where(h % 100 < pct)


def stratified_sample(
    docs: DataFrame,
    k: int = 20,
    group: str = "lang",
    n_buckets: int = 32,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by deterministic
    hash order (md5_hash60(doc_id), doc_id) — a reproducible stratified
    sample for building evaluation sets / balanced training mixes.

    Scale: the naive `row_number() OVER (PARTITION BY group)` funnels
    every row of a group through ONE task — with a handful of
    languages over 100 TB that is a straggler by construction.
    Instead, a two-level tournament: (1) rank within (group, bucket)
    where bucket = h % n_buckets and keep ≤k per bucket — shuffle keyed
    on n_buckets× the group cardinality, each partition bounded by the
    largest bucket; (2) re-rank the ≤ n_buckets·k survivors per group.
    The group-wide top-k by hash order is a subset of the union of
    per-bucket top-ks, so the result is EXACTLY the naive window's.
    """
    h = md5_hash60(F.col("doc_id").cast("string"))
    bucketed = docs.select(group, "doc_id").withColumn("_h", h).withColumn(
        "_b", F.col("_h") % n_buckets
    )
    w1 = Window.partitionBy(group, "_b").orderBy("_h", "doc_id")
    survivors = (
        bucketed.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    w2 = Window.partitionBy(group).orderBy("_h", "doc_id")
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("doc_id", group, "rn")
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, hot_df_threshold: int | None = None
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf · ln(N/df)), whitespace
    tokens; ties broken by (tf desc, term asc) so ranking never
    depends on float comparison of mathematically-equal scores.

    Scale: explode → two keyed shuffles (tf by (doc,term), df by term)
    → per-doc window. The document-frequency relation joins back on
    `term`; N arrives via a broadcast cross join of a 1-row aggregate,
    never a driver-side collect inside the plan.

    The tf⋈df join key is Zipf-skewed: every (doc, "the") row hashes
    to one reducer. Default posture is AQE skew-join (the join is a
    plain shuffle join, AQE splits oversized partitions at runtime).
    ``hot_df_threshold`` switches to an explicit skew-split: terms
    with df ≥ threshold join via broadcast (their dfreq slice has
    ≤ Σdf/threshold rows — at threshold 10⁶ over 10¹² tf rows that is
    ≤ 10⁶ rows, broadcastable), the cold tail joins with per-key fan
    bounded by the threshold. hot ∪ cold partitions dfreq, so the
    union is exactly the unsplit join.
    """
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    if hot_df_threshold is None:
        joined = tf.join(dfreq, "term")
    else:
        hot = dfreq.filter(F.col("df") >= hot_df_threshold)
        cold = dfreq.filter(F.col("df") < hot_df_threshold)
        joined = tf.join(F.broadcast(hot), "term").unionByName(
            tf.join(cold, "term")
        )
    scored = joined.join(F.broadcast(n_docs)).withColumn(
        "score",
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df")),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "rank",
            "term",
            "tf",
            "df",
            F.round("score", 6).alias("score"),
        )
    )


def quality_gate(
    docs: DataFrame,
    min_tokens: int = 10,
    stop_num: int = 6,
    stop_den: int = 10,
) -> DataFrame:
    """Stateless quality gate shared by `corpus_build` and the
    streaming ingest (streaming/corpus_ingest.py) — the SAME
    expression tree in both, so batch ≡ stream by construction.

    Keeps rows with n_tokens ≥ min_tokens and stopword ratio ≤
    stop_num/stop_den (integer cross-multiplication, no float
    division); appends `n_tokens` and the 60-bit content
    `fingerprint` (md5 of text). Pure map-side projection+filter —
    legal in a streaming plan (no aggregation, no state).
    """
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")
    return (
        docs.withColumn("n_tokens", n_tok)
        .withColumn("_sw", sw)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("_sw") * stop_den <= stop_num * F.col("n_tokens"))
        )
        .drop("_sw")
        .withColumn("fingerprint", md5_hash60(F.col("text")))
    )


def mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    group: str = "lang",
    key: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic training-mix downsampling: keep a row of group g
    with probability rates[g], decided by hash acceptance
    md5_hash60(key) < rate·2⁶⁰ — the way a data pipeline reweights
    sources/languages (e.g. cap web crawl at 30%, keep curated text
    at 100%) while staying reproducible across runs and engines.

    Rates must be in [0, 1] (acceptance sampling only downsamples;
    up-weighting is replication, a different operator). Thresholds are
    resolved to integer literals driver-side, so the filter is exact —
    no float arithmetic per row.

    Scale: zero-shuffle map-side filter (a literal CASE over the
    group column against the 60-bit hash).
    """
    bad = {g: r for g, r in rates.items() if not 0.0 <= r <= 1.0}
    if bad:
        raise ValueError(f"rates must be in [0, 1]: {bad}")
    thr = F.lit(int(default_rate * (1 << 60)))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group) == g, F.lit(int(r * (1 << 60)))).otherwise(thr)
    return docs.where(md5_hash60(F.col(key).cast("string")) < thr)


def corpus_delta(
    new_docs: DataFrame,
    prev_docs: DataFrame,
) -> DataFrame:
    """Incremental corpus refresh: documents in `new_docs` whose
    CONTENT (60-bit md5 fingerprint) is not present in `prev_docs` —
    the "what is new since the last build" primitive that lets a
    pipeline re-process only the delta instead of the full corpus.

    Content identity, not doc_id: a re-crawled page with a new id but
    identical text is NOT new; an updated page with the same id but
    changed text IS.

    Scale: a left-anti shuffle join keyed on the high-cardinality
    fingerprint; neither side broadcast (the previous snapshot is
    corpus-sized). Both inputs reduce to their fingerprint projection
    before the shuffle — the join carries 8-byte keys, not documents.
    """
    prev_fp = prev_docs.select(
        md5_hash60(F.col("text")).alias("fingerprint")
    ).distinct()
    return new_docs.withColumn(
        "fingerprint", md5_hash60(F.col("text"))
    ).join(prev_fp, "fingerprint", "left_anti")


def doc_repetition(
    docs: DataFrame, n: int = 3, sh: DataFrame | None = None
) -> DataFrame:
    """Intra-document repetition: the fraction of n-gram occurrences
    that are repeats of an earlier n-gram in the SAME document —
    the Gopher-style "repetitious text" quality signal (high values
    flag boilerplate, keyboard mashing, and template spam).

    rep_ratio = (total_ngrams − distinct_ngrams) / total_ngrams,
    0.0 for docs shorter than n tokens. Exact integer counts, one
    division — engine-stable without rounding.

    Scale/shape: total_ngrams is pure arithmetic on the token count —
    no n-gram materialization at all. Only the DISTINCT count needs
    an n-gram relation, built with the explode+lead shape of
    `dedup.shingles` (whole-stage codegen) and partially aggregated
    map-side. An in-row HOF variant (transform+slice building the
    gram array per row, zero shuffle) was measured 9× SLOWER at
    sf0.1 (8.5s vs 0.9s): HOF lambdas evaluate interpreted per
    element — the SimHash lesson again. Pass ``sh`` to reuse the
    shared persisted shingle relation (registry does; the distinct
    count then costs one groupBy over the cache).
    """
    from piholelongtermstats_spark.operators.dedup import shingles

    if sh is None:
        sh = shingles(docs, n)
    distinct = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("distinct_ngrams")
    )
    total = F.greatest(
        F.size(tokens(F.col("text"))) - (n - 1), F.lit(0)
    ).cast("long")
    return (
        docs.select("doc_id", total.alias("total_ngrams"))
        .join(distinct, "doc_id", "left")
        .select(
            "doc_id",
            "total_ngrams",
            F.coalesce(F.col("distinct_ngrams"), F.lit(0)).alias(
                "distinct_ngrams"
            ),
            F.when(
                F.col("total_ngrams") > 0,
                (F.col("total_ngrams") - F.coalesce("distinct_ngrams", F.lit(0)))
                .cast("double")
                / F.col("total_ngrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("rep_ratio"),
        )
    )


def corpus_build(
    docs: DataFrame,
    min_tokens: int = 10,
    stop_num: int = 6,
    stop_den: int = 10,
    k_per_lang: int | None = 50,
) -> DataFrame:
    """End-to-end training-corpus build as ONE declarative plan:

    quality gate (n_tokens ≥ min_tokens AND stopword ratio ≤
    stop_num/stop_den) → exact-fingerprint dedup (min doc_id per
    md5-of-text survives) → per-language stratified cap of k docs in
    deterministic hash order → manifest (doc_id, lang, n_tokens, rn).
    ``k_per_lang=None`` skips the cap stage entirely (no degenerate
    full-group window) and the manifest carries no rn column.

    Everything is integer arithmetic (the stopword-ratio gate is the
    cross-multiplication sw·den ≤ num·n, never a float division), so
    the manifest is bit-identical across engines and runs.

    Scale: the gate is a map-side projection+filter; fingerprint dedup
    windows over the HIGH-cardinality digest key (dup groups are tiny);
    the cap is the two-level tournament (`stratified_sample`); the
    final n_tokens stitch broadcasts the ≤ k·|langs|-row manifest —
    bounded by construction — against the survivor relation.
    """
    gated = quality_gate(docs, min_tokens, stop_num, stop_den)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    surv = (
        gated.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "lang", "n_tokens")
    )
    if k_per_lang is None:
        return surv
    sampled = stratified_sample(surv, k=k_per_lang, group="lang")
    return (
        surv.select("doc_id", "n_tokens")
        .join(F.broadcast(sampled), "doc_id")
        .select("doc_id", "lang", "n_tokens", "rn")
    )


def contamination_overlap(
    sh: DataFrame,
    bench_mod: int = 29,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: for each benchmark document (doc_id %
    bench_mod == 0 — a stand-in for a real eval-suite membership list),
    the maximum shingle CONTAINMENT against any non-benchmark corpus
    document: |shingles(b) ∩ shingles(c)| / |shingles(b)|.

    Containment (not Jaccard) is the decontamination metric: a short
    eval prompt fully embedded in a long training doc has low Jaccard
    but containment 1.0.

    Output: (bench_id, best_match, overlap) — best_match = the
    highest-overlap corpus doc (ties: smaller doc_id), or -1 with
    overlap 0.0 for benchmark docs nothing collides with. overlap is
    one exact integer division, engine-stable.

    Scale: the benchmark side is small BY CONSTRUCTION (an eval suite
    is thousands of docs against a 100 TB corpus), so its shingle set
    is broadcast and the corpus side streams map-side through the
    join — no corpus shuffle at all before the (bench_id, doc_id)
    partial-aggregated count. Set broadcast_bench=False if the
    benchmark outgrows executor memory (falls back to a shuffle join
    keyed on shingle).
    """
    is_bench = F.col("doc_id") % bench_mod == 0
    bsh = sh.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    bsize = bsh.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_b"))
    csh = sh.filter(~is_bench)
    joined = csh.join(F.broadcast(bsh) if broadcast_bench else bsh, "shingle")
    inter = joined.groupBy("bench_id", "doc_id").agg(
        F.count(F.lit(1)).alias("inter")
    )
    w = Window.partitionBy("bench_id").orderBy(
        F.col("inter").desc(), F.col("doc_id").asc()
    )
    best = (
        inter.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("bench_id", "doc_id", "inter")
    )
    # both sides of the final join are benchmark-sized; broadcast one
    # so the tiny stitch never sorts
    return (
        bsize.join(F.broadcast(best), "bench_id", "left")
        .select(
            "bench_id",
            F.coalesce(F.col("doc_id"), F.lit(-1)).alias("best_match"),
            F.round(
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / F.col("n_b"),
                6,
            ).alias("overlap"),
        )
    )


def span_dedup(
    docs: DataFrame, span: int = 10, max_df: int = 2
) -> DataFrame:
    """Repeated-span removal — the line/paragraph-level dedup a
    pretraining pipeline runs AFTER document-level dedup (the
    MassiveText "repeated passages" / C4 "three-sentence span" rule,
    adapted to this corpus's single-line documents by treating each
    consecutive ``span``-token chunk as the dedup unit).

    A chunk appearing in more than ``max_df`` DISTINCT documents is
    boilerplate: every occurrence is removed from every document, and
    each document's surviving chunks are reassembled in original
    order. Returns one row per input document:
      (doc_id, n_spans, kept_spans, removed_spans, clean_text).

    Scale shape (all native Column expressions, zero UDFs):
      1. explode → |corpus-tokens|/span rows — LINEAR in corpus size;
      2. chunk-df: one hash-groupBy shuffle keyed on chunk content
         (high cardinality — boilerplate is the rare tail by
         definition);
      3. the bad-chunk set is a left_anti join; its size is bounded
         by |chunks|/max_df, and AQE broadcasts it when small without
         pinning that assumption into the plan;
      4. reassembly: one groupBy(doc_id) whose per-group state is one
         document's own chunks — bounded by max document length, the
         same bound every per-doc operator already assumes.
    """
    # Fan the single-file corpus out BEFORE the explode (the
    # bigram_stream convention): unfanned, the whole chunk blow-up
    # ran on one task (r12; stage trace showed (0 + 1) / 1). The
    # split is projected to an ATTRIBUTE before the transform lambda
    # references it (the winnowing lesson, r12 session 5): an inlined
    # split expression re-evaluates once per chunk element.
    fan = docs.sparkSession.sparkContext.defaultParallelism
    toks = F.col("toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(span))).cast("int")
    chunked = (
        docs.repartition(fan, "doc_id")
        .select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(F.slice(toks, i * span + 1, span), " "),
                )
            ).alias("pos", "chunk"),
        )
    )
    # The chunk relation used to feed BOTH the chunk-df aggregation
    # and a left_anti join against the bad set; built lazily twice,
    # the corpus-sized explode (slice + array_join string building)
    # ran twice — two Generate subtrees, no exchange reuse (the anti
    # side broadcast, so no common shuffle). The occurrence list now
    # rides the SAME aggregation: collect_list of (doc_id, pos) per
    # chunk alongside df, keep df <= max_df, explode back (r12, guide
    # §2.3/§2.4 — the exact_substring_dedup fold). Byte-identical
    # semantics (the exploded pairs of a kept chunk are exactly the
    # anti-join's survivors); the df aggregation already shuffled
    # every chunk's text, so the fold adds only the pos ints to the
    # same exchange while deleting one full explode and the join.
    # Per-key list size = that chunk's df — df > max_df lists are
    # dropped, and a skewed hot chunk was the join's blow-up too.
    kept = (
        chunked.groupBy("chunk")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.collect_list(F.struct("doc_id", "pos")).alias("locs"),
        )
        .filter(F.col("df") <= max_df)
        .select("chunk", F.explode("locs").alias("l"))
        .select(F.col("l.doc_id").alias("doc_id"), F.col("l.pos").alias("pos"), "chunk")
    )
    # array_sort on struct(pos, chunk): pos is unique per doc, so the
    # reassembly order is the original chunk order, deterministically.
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_spans"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    n_spans = F.ceil(
        F.size(F.split(F.trim(F.col("text")), r"\s+")) / F.lit(float(span))
    ).cast("long")
    return (
        docs.select("doc_id", n_spans.alias("n_spans"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce(F.col("kept_spans"), F.lit(0)).cast("long").alias(
                "kept_spans"
            ),
            (
                F.col("n_spans")
                - F.coalesce(F.col("kept_spans"), F.lit(0))
            ).cast("long").alias("removed_spans"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def temperature_mix(
    docs: DataFrame,
    group: str = "lang",
    key: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-flattened training mix (τ-sampling): keep rows of
    group g at rate (min_cnt / cnt_g)^alpha, so over-represented
    groups are downsampled toward the flattened distribution
    p'_g ∝ p_g^alpha (the multilingual-pretraining reweighting; the
    smallest group keeps everything). Unlike ``mix_sample`` the rates
    come FROM the data — one tiny per-group count aggregate,
    broadcast back, then the same md5 hash-acceptance filter.

    Determinism (the reason alpha defaults to 1/2): every step of the
    threshold is correctly rounded and engine-independent — one
    long/long→double division, sqrt (IEEE correctly rounded
    everywhere), an EXACT power-of-two scale by 2⁶⁰, floor — so the
    integer thresholds are bit-identical in Spark and the DuckDB
    oracle. Other alphas run through pow(), which libms only
    guarantee to ~1 ulp; a boundary flip then needs a hash within a
    couple of values of the threshold (P ≈ 2⁻⁵⁸ per row) — fine in
    practice, but only alpha=1/2 is *pinned*, so only it is
    oracle-registered.

    Scale: count-agg shuffle (one row per group), broadcast of the
    group→threshold map, zero-shuffle filter.
    """
    cnts = docs.groupBy(group).agg(F.count("*").alias("cnt"))
    minc = cnts.agg(F.min("cnt").alias("min_cnt"))
    ratio = F.col("min_cnt").cast("double") / F.col("cnt")
    frac = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(alpha))
    rates = (
        cnts.crossJoin(F.broadcast(minc))
        .select(
            group,
            F.floor(frac * F.lit(float(1 << 60))).cast("long").alias("_thr"),
        )
    )
    return (
        docs.join(F.broadcast(rates), group)
        .where(md5_hash60(F.col(key).cast("string")) < F.col("_thr"))
        .drop("_thr")
    )


def source_data_card(docs: DataFrame) -> DataFrame:
    """Per-source corpus data card: the summary table a dataset release
    ships (C4/Pile/Dolma-style datasheet row per source) — document
    and unique-text counts, language spread, size totals, mean and
    exact median document length.

    Exact median WITHOUT a per-source sort of the corpus: document
    length is a bounded-cardinality value, so the median comes from a
    value histogram — groupBy(source, n_chars) count, then a window
    over the per-source DISTINCT VALUES (thousands of rows, not
    |docs|) locates the middle rank(s). At 100 TB the plan is one
    partial-agg shuffle for the histogram + one partial-agg shuffle
    for the per-source scalars; the windows order only histogram rows.
    (Contrast percentile()/quantile_cont: a full per-group sort, and
    interpolated results whose fp rounding differs across engines —
    the histogram median is pure integer arithmetic with ONE final
    division by 2, exact in both.)

    Median rule: lo = (n+1)//2, hi = (n+2)//2 ranks (1-based); median
    = (value_at(lo) + value_at(hi)) / 2 — the standard even/odd rule.
    avg_chars divides exact integer sums once, like every avg in the
    engine (NOTES.md float policy).
    """
    n_toks = F.size(tokens(F.col("text"))).cast("long")
    scalars = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(n_toks).alias("total_tokens"),
    )
    hist = docs.groupBy("source", "n_chars").agg(F.count("*").alias("cnt"))
    ws = Window.partitionBy("source")
    wc = ws.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    h = (
        hist.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("n", F.sum("cnt").over(ws))
        .withColumn("lo", (F.col("n") + 1) / 2)
        .withColumn("hi", (F.col("n") + 2) / 2)
    )
    covers = lambda r: (F.col("cum") - F.col("cnt") < F.floor(r)) & (  # noqa: E731
        F.floor(r) <= F.col("cum")
    )
    med = h.groupBy("source").agg(
        (
            (
                F.sum(F.when(covers(F.col("lo")), F.col("n_chars")).otherwise(0))
                + F.sum(F.when(covers(F.col("hi")), F.col("n_chars")).otherwise(0))
            )
            / 2.0
        ).alias("median_chars")
    )
    return (
        scalars.join(med, "source")
        .select(
            "source",
            "n_docs",
            "n_unique_texts",
            "n_langs",
            "total_chars",
            "total_tokens",
            (F.col("total_chars").cast("double") / F.col("n_docs")).alias("avg_chars"),
            "median_chars",
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def source_token_caps(
    docs: DataFrame, budget: int = 800, n_buckets: int = 64
) -> DataFrame:
    """Per-source token-budget enforcement: within every source, keep
    documents in deterministic hash order until the source's token
    budget is exhausted (the "cap each domain at X tokens" step of a
    data-mixing recipe — caps boilerplate-heavy sources without
    favoring any document ordering bias).

    Order within a source is (md5-hash, doc_id) — stable, uniform, and
    reproducible across engines. The running token total is a
    TWO-LEVEL prefix sum (the packing.concat_chunk_manifest shape):
    documents are range-bucketed by the hash's top bits, the
    within-bucket window is partitioned by (source, bucket), and only
    the ≤ ``n_buckets``-row per-source bucket summary sees an ordered
    window — no per-source window ever orders a whole source's
    documents, so a source with billions of documents cannot pin a
    single task at 100 TB.

    Returns one row per document: (doc_id, source, n_tok, cum_tok,
    kept) with kept ⇔ cum_tok ≤ budget — integer comparison, exact.
    """
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    h = md5_hash60(F.col("doc_id").cast("string"))
    m = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
        h.alias("_h"),
    ).withColumn(
        # top bits of the 60-bit hash -> n_buckets ordered ranges
        "_b",
        F.shiftright(F.col("_h"), 60 - n_buckets.bit_length() + 1),
    )
    w_in = (
        Window.partitionBy("source", "_b")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = m.withColumn("_cum_in", F.sum("n_tok").over(w_in))
    totals = m.groupBy("source", "_b").agg(F.sum("n_tok").alias("_tot"))
    w_b = (
        Window.partitionBy("source")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_b), F.lit(0))
    ).select("source", "_b", "_off")
    return (
        within.join(offsets, ["source", "_b"])
        .select(
            "doc_id",
            "source",
            "n_tok",
            (F.col("_cum_in") + F.col("_off")).alias("cum_tok"),
            ((F.col("_cum_in") + F.col("_off")) <= budget).alias("kept"),
        )
        # No final global sort on the corpus-sized relation (r11
        # VERDICT #1 / guide §2.4): the rangepartitioning exchange
        # would sample (= re-run) the cum-token windows upstream.
    )


def leakage_safe_split(
    docs: DataFrame, clusters: DataFrame, train_pct: int = 90
) -> DataFrame:
    """Group-aware train/test split: the split is assigned per
    NEAR-DUP CLUSTER, not per document, so two near-duplicate
    documents can never land on opposite sides (the eval-leakage
    failure mode of naive per-document splits).

    ``clusters``: (doc_id, cluster_id) from the dedup tier (LSH pairs
    → connected components); documents absent from it are singletons
    and become their own cluster. Assignment is the shared 60-bit md5
    hash of the cluster id mod 100 < train_pct — deterministic,
    engine-portable, and independent of data order.

    Returns one audit row per split: (split, n_docs, n_clusters,
    leaked_clusters) where leaked_clusters counts clusters observed in
    BOTH splits — structurally zero, and COMPUTED (not asserted) so
    the oracle proves the no-leak property rather than trusting it.
    """
    lab = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    bucket = md5_hash60(F.col("cluster_id").cast("string")) % 100
    assig = lab.withColumn(
        "split", F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("test"))
    )
    per_cluster = assig.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("_ns")
    )
    leaks = per_cluster.agg(
        F.sum((F.col("_ns") > 1).cast("long")).alias("leaked_clusters")
    )
    return (
        assig.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leaks))
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def contrastive_negatives(
    docs: DataFrame, k: int = 4, pool_mod: int = 5
) -> DataFrame:
    """Deterministic sampled-negative pairs for contrastive training
    (the sampled-softmax / in-batch-negatives data prep: every anchor
    document gets k pseudo-random negatives).

    The scale path mirrors how production pipelines actually do this:
    negatives are drawn from a small broadcast POOL, not from the
    full corpus (a corpus-wide uniform draw would need a dense-id
    spine — a global window). The pool is a deterministic hash sample
    (md5(doc_id) % pool_mod == 0 — the hash_sample convention), its
    dense index comes from the range-partitioned distributed form
    (ranks.dense_order_index — no unpartitioned window even though the
    pool is 1/pool_mod of the corpus), and each anchor picks its j-th
    negative as md5(doc_id:j) % pool_size — a broadcast join, zero
    corpus shuffle. Self-pairs are dropped (an anchor that hash-lands
    on itself yields k-1 negatives — deterministic, documented).

    Returns (doc_id, j, neg_doc_id); row order is unspecified (the
    full-size pair relation carries no final sort by design).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    pool = docs.filter(
        md5_hash60(F.col("doc_id").cast("string")) % pool_mod == 0
    ).select(F.col("doc_id").alias("neg_doc_id"))
    # pool is ~|docs|/pool_mod rows — smaller than the corpus but still
    # corpus-PROPORTIONAL at fixed pool_mod, so the dense index uses
    # the distributed range-partitioned form (ranks.dense_order_index),
    # never an unpartitioned window: same sort-order semantics (the
    # oracle's ROW_NUMBER OVER (ORDER BY neg_doc_id) replays it), no
    # single-partition funnel at any pool size.
    pool_idx = dense_order_index(
        pool, [F.col("neg_doc_id").asc()], out="_r"
    ).select("neg_doc_id", (F.col("_r") - 1).alias("_idx"))
    # counted off the un-indexed pool (r12, guide §2.4): the index
    # adds nothing to the count, and counting pool_idx re-ran the
    # whole range-partitioned rank a second time.
    pool_n = pool.agg(F.count(F.lit(1)).alias("_pn"))

    picks = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(pool_n))
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.lit(int(k))),
                    lambda j: F.struct(
                        j.alias("j"),
                        (
                            md5_hash60(
                                F.concat_ws(":", F.col("doc_id"), j)
                            )
                            % F.col("_pn")
                        ).alias("_idx"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.j", "p._idx")
    )
    return (
        picks.join(F.broadcast(pool_idx), "_idx")
        .filter(F.col("neg_doc_id") != F.col("doc_id"))
        .select("doc_id", "j", "neg_doc_id")
    )


def exact_substring_dedup(
    docs: DataFrame, k: int = 8, min_df: int = 2, policy: str = "remove_all"
) -> DataFrame:
    """Exact duplicated-substring removal over OVERLAPPING k-token
    windows (stride 1) — the alignment-free strengthening of
    ``span_dedup`` (which chunks at fixed offsets and therefore
    misses a shared passage that starts mid-chunk in one document).
    Semantics follow Lee et al. 2021 (arXiv:2107.06499 — suffix-array
    exact-substring dedup at fixed minimum length) with span_dedup's
    remove-everywhere policy: a window whose text occurs in >=
    ``min_df`` DISTINCT documents marks every token position it
    covers, in every document, for removal. ``policy='keep_first'``
    is Lee et al.'s actual rule as a layer over the same relation:
    the lowest-doc_id holder of each duplicated window is its
    canonical owner and keeps its text; only non-owners lose the
    covered positions (owner chosen at doc granularity — repeats
    inside the owner are the doc_repetition operator's concern).

    Returns one row per input document:
      (doc_id, n_tokens, kept_tokens, removed_tokens, clean_text).

    Scale shape (native expressions only):
      1. window explode — one row per token position (stride 1), so
         |rows| == |corpus tokens|: linear, the bigram-stream bound;
      2. window-df: one hash shuffle keyed on window text;
      3. duplicated windows → covered positions via a k-wide
         sequence explode (≤ k× the duplicated-window rows — the
         boilerplate tail, not the corpus);
      4. distinct (doc, pos) anti-joins the token stream; per-doc
         reassembly sorts each document's own surviving tokens (the
         max-doc-length bound every per-doc operator assumes).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    fan = docs.sparkSession.sparkContext.defaultParallelism
    fanned = docs.repartition(fan, "doc_id")

    # tokens() projected to an ATTRIBUTE before the window transform
    # (the winnowing lesson, r12 session 5): inlined, the
    # split+filter re-evaluated once per WINDOW element — i.e. the
    # document re-tokenized ~n_tokens times.
    toks = F.col("toks")
    wins = fanned.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - k),
                    lambda p: F.struct(
                        p.alias("p"),
                        F.array_join(F.slice(toks, p + 1, k), " ").alias("win"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<p:int,win:string>>"))
        ).alias("w"),
    ).select("doc_id", "w.p", "w.win")

    if policy not in ("remove_all", "keep_first"):
        raise ValueError(f"unknown policy: {policy!r}")
    # The window relation used to feed BOTH a window-df aggregation
    # and a wins⋈dup hit join; built lazily twice, the corpus-token-
    # sized explode (slice + array_join string building per
    # position) ran twice — the plan showed two Generate subtrees
    # and no exchange reuse (the df side aggregated, the hit side
    # broadcast-joined, so no common shuffle existed; an explicit
    # shared repartition was measured SLOWER — shuffling the window
    # strings costs more than the explode). Instead the hit
    # locations ride the SAME aggregation: collect_list of
    # (doc_id, p) per window alongside df/owner, then explode the
    # kept lists — one explode, one shuffle, no join (r12, guide
    # §2.3/§2.4). Byte-identical semantics: the exploded (doc_id, p)
    # pairs of a duplicated window are exactly the rows the old join
    # matched; the per-key list is bounded by that window's df — the
    # same rows the join produced (an all-identical-docs corpus blows
    # up either shape equally).
    hits = (
        wins.groupBy("win")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.min("doc_id").alias("owner"),
            F.collect_list(F.struct("doc_id", "p")).alias("locs"),
        )
        .filter(F.col("df") >= int(min_df))
        .select("owner", F.explode("locs").alias("l"))
        .select("owner", F.col("l.doc_id").alias("doc_id"), F.col("l.p").alias("p"))
    )
    if policy == "keep_first":
        hits = hits.filter(F.col("doc_id") != F.col("owner"))
    covered = hits.select(
        "doc_id", F.explode(F.sequence(F.col("p"), F.col("p") + k - 1)).alias("pos")
    ).distinct()

    toku = fanned.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w")
    )
    kept = toku.join(covered, ["doc_id", "pos"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        docs.select("doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("kept_tokens"), F.lit(0)))
            .cast("long")
            .alias("removed_tokens"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def weighted_sample_wor(docs: DataFrame, k: int = 25) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the k
    documents with the smallest integer priority h₃₂·10⁹ DIV w, where
    h₃₂ is the first 32-bit md5 chunk of the salted doc key and
    w = max(n_chars, 1) is the weight.

    This is priority sampling (Duffield, Lund, Thorup, JACM 2007) with
    the uniform u = h₃₂/2³² made explicit and the u/w key carried in
    exact integer arithmetic ((h·10⁹) DIV w < 2⁶³ since h < 2³²):
    P(selected) grows with w, no row is picked twice, and — like
    hash_sample — the draw is a pure function of the data, so it is
    rerunnable, engine-portable (the oracle reproduces it verbatim),
    and consistent across cluster layouts. RNG-free is the property
    that makes a 100 TB sample auditable: membership can be re-checked
    per row without replaying any stream.

    Scale: priorities are map-side md5/conv expressions inside
    codegen; the global bottom-k is TakeOrderedAndProject (per-
    partition heaps, one k-row driver merge) — never a full sort.
    """
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = F.greatest(F.col("n_chars").cast("long"), F.lit(1))
    pri = F.expr("_h * 1000000000 DIV _w")
    return (
        docs.select("doc_id", h32.alias("_h"), w.alias("_w"))
        .select(
            "doc_id",
            F.col("_w").alias("weight"),
            pri.alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(k)
    )
