"""source_data_card (operators/corpus.py): histogram-median exactness
on constructed odd/even/tied groups, and the no-per-doc-sort plan
property."""

from __future__ import annotations

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators.corpus import source_data_card


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_median_odd_even_and_ties(spark):
    rows = [
        # odd group: lengths 1,3,100 → median 3
        (0, "a", "en", "odd", 1),
        (1, "a b", "en", "odd", 3),
        (2, "x" * 5, "de", "odd", 100),
        # even group: lengths 2,4,6,8 → median 5.0
        (3, "aa", "en", "even", 2),
        (4, "bbbb", "en", "even", 4),
        (5, "cc cc", "en", "even", 6),
        (6, "dd dd dd", "en", "even", 8),
        # tied group: 5,5,5,9 → median 5
        (7, "t", "en", "tied", 5),
        (8, "t", "en", "tied", 5),
        (9, "u", "fr", "tied", 5),
        (10, "v", "fr", "tied", 9),
    ]
    out = {r.source: r for r in source_data_card(_docs(spark, rows)).collect()}
    assert out["odd"].median_chars == 3.0
    assert out["even"].median_chars == 5.0
    assert out["tied"].median_chars == 5.0
    assert out["odd"].n_docs == 3
    assert out["tied"].n_unique_texts == 3  # "t" deduped
    assert out["tied"].n_langs == 2
    assert out["even"].total_chars == 20
    assert out["even"].avg_chars == 5.0
    # token totals: whitespace split
    assert out["even"].total_tokens == 1 + 1 + 2 + 3


def test_single_doc_group(spark):
    out = source_data_card(
        _docs(spark, [(0, "only", "en", "s", 42)])
    ).collect()
    assert out[0].median_chars == 42.0
    assert out[0].avg_chars == 42.0


def test_no_per_document_sort(spark):
    """The median must come from the value histogram: no Sort over the
    raw documents relation — the only windows order histogram rows
    (post-aggregate). A Sort whose child is the parquet/LocalRelation
    scan would mean a per-source sort of the corpus."""
    df = source_data_card(_docs(spark, [(0, "a", "en", "s", 1)]))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the windows must consume the histogram aggregate's output (cnt),
    # not raw document columns — i.e. cumulative sums over cnt
    assert "windowspecdefinition" in plan.lower(), plan
    assert "sum(cnt" in plan, plan
    # and no window references the text column (a per-doc window would)
    for ln in plan.splitlines():
        if "windowspecdefinition" in ln.lower():
            assert "text" not in ln, ln


def test_exact_group_quantiles_constructed(spark):
    """Nearest-rank on a known distribution, incl. tie mass and nulls."""
    from piholelongtermstats_spark.operators.approx import exact_group_quantiles

    rows = [("a", float(v)) for v in range(1, 11)]          # 1..10
    rows += [("b", 5.0)] * 9 + [("b", 100.0), ("b", None)]  # heavy tie + null
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r.g: r for r in exact_group_quantiles(df, "g", "v").collect()}
    # group a: n=10 → p50 = value at rank 5 = 5, p90 → rank 9 = 9, p99 → rank 10 = 10
    assert (got["a"].p50, got["a"].p90, got["a"].p99) == (5.0, 9.0, 10.0)
    assert got["a"].n_rows == 10
    # group b: n=10 (null excluded); ranks 1-9 are 5.0 → p50=p90=5.0, p99 rank 10 → 100.0
    assert (got["b"].p50, got["b"].p90, got["b"].p99) == (5.0, 5.0, 100.0)


def test_exact_quantiles_match_gk_sketch_band(spark):
    """The GK sketch (rows-only registry entry) must land within its
    accuracy band of the exact histogram answer on real data."""
    from piholelongtermstats_spark.operators.approx import (
        exact_group_quantiles,
        reply_time_quantiles,
    )
    from piholelongtermstats_spark.sources.events import dns_fact

    fact = dns_fact(spark, "/root/testdata/sf0.001")
    exact = exact_group_quantiles(
        fact.withColumn("all", __import__("pyspark").sql.functions.lit(1)),
        "all",
        "reply_time",
    ).first()
    approx = reply_time_quantiles(fact).first()
    # GK p50 (ms, on |reply|) vs exact p50: same order of magnitude band;
    # reply_time here is nonnegative so |x| == x
    assert abs(approx.p50_ms - exact.p50 * 1000) <= 0.05 * max(exact.p50 * 1000, 1)


def test_exact_group_quantiles_quantize_to_bounds_cardinality(spark):
    """r6 VERDICT #7: quantize_to floors values to step multiples
    BEFORE the histogram, bounding the per-group window input for
    quasi-continuous metrics; each quantile is a lower bound within
    one step of the raw answer."""
    from pyspark.sql import functions as F

    from piholelongtermstats_spark.operators.approx import exact_group_quantiles

    # 1000 distinct quasi-continuous values in one group
    rows = [("a", 1.0 + i * 0.001) for i in range(1000)]
    df = spark.createDataFrame(rows, "g string, v double")
    q = exact_group_quantiles(df, "g", "v", quantize_to=0.1)
    # histogram cardinality is bounded: plan aggregates ≤ range/step
    # buckets (here span [1.0, 2.0) → ≤ 10+1 distinct quantized values)
    quantized = df.select(
        (F.floor(F.col("v").cast("decimal(28,10)") / F.lit("0.1").cast("decimal(20,10)"))
         * F.lit("0.1").cast("decimal(20,10)")).cast("double").alias("qv")
    )
    assert quantized.distinct().count() <= 11
    got = q.first()
    raw = exact_group_quantiles(df, "g", "v").first()
    for tag in ("p50", "p90", "p99"):
        assert got[tag] <= raw[tag] and raw[tag] - got[tag] < 0.1 + 1e-9
    # invalid step rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        exact_group_quantiles(df, "g", "v", quantize_to=0.0)


def test_reply_time_cardinality_supports_unquantized_default(spark):
    """The None-default is justified only while the metric repeats:
    pin the compression ratio the docstring claims."""
    from pyspark.sql import functions as F

    from piholelongtermstats_spark.sources.events import dns_fact

    fact = dns_fact(spark, "/root/testdata/sf0.01")
    n = fact.filter(F.col("reply_time").isNotNull()).count()
    d = fact.select("reply_time").filter(F.col("reply_time").isNotNull()).distinct().count()
    # distinct values saturate as volume grows (fixed measurement
    # precision): 1.05× at sf0.001, 1.52× at sf0.01, 5.62× at sf0.1 —
    # the histogram shrinks RELATIVE to data as data grows, which is
    # exactly the regime where the unquantized default is safe.
    assert n / d > 1.4, (n, d)
