"""M37: erasure propagation end-to-end, rolling bands vs literal
window moments, language token ratios."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import robust, text
from piholelongtermstats_spark.sources import snapshots
from tests.conftest import make_fact


def test_erasure_merge_and_compaction(spark, tmp_path):
    """The registry query's mechanics, stepwise: head loses the
    subject, history still has it, compaction purges history."""
    root = str(tmp_path / "erasure")
    prof = spark.createDataFrame(
        [("a", 3), ("b", 5), ("c", 9)], "client string, cnt long"
    )
    snapshots.write_snapshot(prof, root)
    changes = spark.createDataFrame(
        [("c", 0, "delete")], "client string, cnt long, _op string"
    )
    snapshots.merge_upsert(spark, root, changes, key="client")
    head = snapshots.read_snapshot(spark, root)
    assert head.count() == 2
    assert head.filter(F.col("client") == "c").count() == 0
    # time travel: the subject is STILL in v0 — merge is not erasure
    assert (
        snapshots.read_snapshot(spark, root, version=0)
        .filter(F.col("client") == "c")
        .count()
        == 1
    )
    snapshots.compact(root, keep_last=1)
    assert snapshots.versions(root) == [1]


def _fact_days(spark, ys, month="08"):
    rows, i = [], 0
    for d, n in enumerate(ys, start=1):
        for _ in range(n):
            rows.append((i, f"2024-{month}-{d:02d}T10:00:00", "c", "d", "Allowed", None))
            i += 1
    return make_fact(spark, rows)


def test_rolling_bands_literal(spark):
    ys = [4, 8, 6, 10, 2, 12, 7, 9, 5]
    rows = {
        r.date.day: r
        for r in robust.rolling_bands_daily(_fact_days(spark, ys), 7).collect()
    }
    for d in range(1, 10):
        win = ys[max(0, d - 7):d]
        n, s, q = len(win), sum(win), sum(v * v for v in win)
        r = rows[d]
        assert (r.win_n, r.win_sum, int(r.win_sumsq)) == (n, s, q)
        assert r.mean_w == round(s / n, 6)
        if n > 1:
            sd = math.sqrt((q - s * s / n) / (n - 1.0))
            assert r.sd_w == round(sd, 6)
            assert r.upper == round(s / n + 2.0 * sd, 6)
    assert rows[1].sd_w is None and rows[1].lower is None


def test_lang_token_stats_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "w", 13),
            (2, "vier funf", "de", "w", 9),
            (3, "  ", "en", "w", 2),  # whitespace-only: 0 tokens
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.lang: r for r in text.lang_token_stats(docs).collect()}
    en = out["en"]
    assert (en.n_docs, en.total_tokens, en.total_chars) == (2, 3, 15)
    assert en.chars_per_token == round(15 / 3, 6)
    assert en.tokens_per_doc == round(3 / 2, 6)
    de = out["de"]
    assert de.total_tokens == 2 and de.chars_per_token == round(9 / 2, 6)
