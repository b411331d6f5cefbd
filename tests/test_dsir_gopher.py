"""M12 tier: Gopher rule gate on constructed documents (the synthetic
corpus has no newlines, so the line-shape rules need built cases) and
a full numpy differential for the DSIR scoring edge — the rows-only
registry entry's independent check, mirroring the trained-index
pattern."""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import dsir
from piholelongtermstats_spark.operators.text import GOPHER_STOPS, gopher_rules

SF = "/root/testdata/sf0.001"
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _doc(i, text, lang="en"):
    return (i, text, lang, "srcT", len(text))


def test_gopher_rules_constructed_cases(spark):
    good = "the quick brown fox jumps over that lazy dog again and " * 6  # 60 words
    bullets = "\n".join(f"- item {i}" for i in range(10))
    dots = "\n".join(f"line {i} trails off..." for i in range(10))
    symbols = ("#tag " * 30) + ("word " * 30)
    nonalpha = ("123 456 789 " * 20) + "the and"
    short = "the and of"
    docs = spark.createDataFrame(
        [
            _doc(0, good),
            _doc(1, bullets),
            _doc(2, dots),
            _doc(3, symbols),
            _doc(4, nonalpha),
            _doc(5, short),
        ],
        DOC_SCHEMA,
    )
    got = {r.doc_id: r.asDict() for r in gopher_rules(docs).collect()}
    assert got[0]["keep"] is True
    assert got[1]["r_bullets"] is False and got[1]["bullet_lines"] == 10
    assert got[2]["r_ellipsis"] is False and got[2]["ellipsis_lines"] == 10
    assert got[3]["r_symbol"] is False and got[3]["symbol_cnt"] == 30
    assert got[4]["r_alpha"] is False
    assert got[5]["r_wordcount"] is False and got[5]["word_count"] == 3
    # stop-hit counting is DISTINCT stop words, not occurrences
    assert got[0]["stop_hits"] == 3  # the, that, and
    # mean-length bound is cross-multiplied ints
    assert got[0]["r_meanlen"] is True


def test_gopher_stop_hits_are_distinct_words(spark):
    docs = spark.createDataFrame(
        [_doc(0, "the the the the"), _doc(1, "the be to of and that have with")],
        DOC_SCHEMA,
    )
    got = {r.doc_id: r.stop_hits for r in gopher_rules(docs).collect()}
    assert got == {0: 1, 1: 8}


def _py_bucket(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:15], 16) % dsir.B


def test_dsir_logweights_match_numpy_reference(spark):
    """Exact equality: the Spark decimal dot-product over driver-pinned
    log-ratio literals must reproduce a pure-Python computation of the
    same pinned decimals — no tolerance."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]

    # reference: bucket counts → Laplace log-ratios → per-doc decimal dot
    tc, rc = [0] * dsir.B, [0] * dsir.B
    for _, text, lang in rows:
        for w in text.strip().split():
            b = _py_bucket(w)
            rc[b] += 1
            if lang == "en":
                tc[b] += 1
    nt, nr = sum(tc), sum(rc)
    lrs = [
        Decimal(
            f"{math.log((tc[b] + 1) / (nt + dsir.B)) - math.log((rc[b] + 1) / (nr + dsir.B)):.12f}"
        )
        for b in range(dsir.B)
    ]
    want = {}
    for doc_id, text, _ in rows:
        ws = text.strip().split()
        w_dec = sum(
            (lrs[_py_bucket(w)] for w in ws), Decimal(0)
        )
        want[doc_id] = (len(ws), round(float(w_dec), 6))

    got = {
        r.doc_id: (r.n_tokens, r.log_weight)
        for r in dsir.dsir_logweights(docs).collect()
    }
    assert got == want

    # selection: exactly ceil(q*N) docs, and they are the argmax set
    sel = {r.doc_id for r in dsir.dsir_logweights(docs).collect() if r.selected}
    k = -(-len(rows) * 25 // 100)
    assert len(sel) == k
    ranked = sorted(want, key=lambda d: (-want[d][1], d))
    assert sel == set(ranked[:k])


def test_dsir_train_log_ratios_pinned_roundtrip(spark):
    """train_log_ratios is deterministic and B-long; an explicit
    log_ratios argument bypasses training (the pinned-replay path)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = dsir.train_log_ratios(docs)
    b = dsir.train_log_ratios(docs)
    assert a == b and len(a) == dsir.B
    out1 = dsir.dsir_logweights(docs, log_ratios=a).collect()
    out2 = dsir.dsir_logweights(docs).collect()
    assert out1 == out2


def test_stop_word_list_is_the_published_eight():
    assert GOPHER_STOPS == (
        "the", "be", "to", "of", "and", "that", "have", "with",
    )


def test_dsir_logweights_one_row_per_doc_including_empty(spark):
    """r6 VERDICT #2: a token-less document (empty or whitespace-only
    text) must still emit a row — n_tokens 0, log_weight 0 (the empty
    sum) — and compete in the ⌈q·N⌉ selection it is counted toward."""
    docs = spark.createDataFrame(
        [
            _doc(0, "the cat sat on the mat"),
            _doc(1, ""),
            _doc(2, " \n\t  "),
            _doc(3, "und der das ist nicht", "de"),
        ],
        DOC_SCHEMA,
    )
    out = dsir.dsir_logweights(docs, q=0.5).collect()
    assert [r.doc_id for r in out] == [0, 1, 2, 3]
    got = {r.doc_id: r for r in out}
    assert got[1].n_tokens == 0 and got[1].log_weight == 0.0
    assert got[2].n_tokens == 0 and got[2].log_weight == 0.0
    assert sum(r.selected for r in out) == 2  # ceil(0.5 * 4)


def test_dsir_selection_k_is_exact_ceil(spark):
    """r6 ADVICE (medium): k = ceil(q·n) in exact arithmetic. As
    doubles, 0.07*100 = 7.000000000000001 → fp-ceil 8; the correct
    answer is 7."""
    docs = spark.createDataFrame(
        [_doc(i, f"word{i} the and") for i in range(100)], DOC_SCHEMA
    )
    out = dsir.dsir_logweights(docs, q=0.07).collect()
    assert sum(r.selected for r in out) == 7


def test_gopher_unicode_ellipsis_counts(spark):
    """r6 VERDICT #4: the single-char U+2026 '…' counts as an ellipsis
    in both the symbol ratio and the line-ending rule, same as the
    ASCII three-dot form."""
    uni_dots = "\n".join(f"line {i} trails off…" for i in range(10))
    uni_symbols = ("so… " * 30) + ("word " * 30)
    docs = spark.createDataFrame(
        [_doc(0, uni_dots), _doc(1, uni_symbols)], DOC_SCHEMA
    )
    got = {r.doc_id: r.asDict() for r in gopher_rules(docs).collect()}
    assert got[0]["ellipsis_lines"] == 10 and got[0]["r_ellipsis"] is False
    assert got[1]["symbol_cnt"] == 30 and got[1]["r_symbol"] is False


def test_tokens_of_empty_text_is_empty(spark):
    """r6 ADVICE: tokens('') == [] (0 tokens), matching str.split(),
    not [''] — pinned through gopher word_count."""
    docs = spark.createDataFrame(
        [_doc(0, ""), _doc(1, "   "), _doc(2, "one two")], DOC_SCHEMA
    )
    got = {r.doc_id: r.word_count for r in gopher_rules(docs).collect()}
    assert got == {0: 0, 1: 0, 2: 2}


def test_gopher_repetition_constructed_cases(spark):
    from piholelongtermstats_spark.operators.text import gopher_repetition

    clean = " ".join(f"w{i}" for i in range(60))
    dup_lines = "\n".join(["same line here"] * 8 + [f"unique {i}" for i in range(2)])
    top2_heavy = "ab cd " * 40 + " ".join(f"x{i}" for i in range(5))
    dup5 = ("one two three four five " * 10) + " ".join(f"y{i}" for i in range(5))
    empty = ""
    docs = spark.createDataFrame(
        [
            _doc(0, clean),
            _doc(1, dup_lines),
            _doc(2, top2_heavy),
            _doc(3, dup5),
            _doc(4, empty),
        ],
        DOC_SCHEMA,
    )
    got = {r.doc_id: r.asDict() for r in gopher_repetition(docs).collect()}
    assert got[0]["keep"] is True and got[0]["dup_lines"] == 0
    # 8 occurrences of one line → 7 duplicates over 10 lines = 70% > 30%
    assert got[1]["dup_lines"] == 7 and got[1]["r_dup_lines"] is False
    assert got[1]["r_dup_line_chars"] is False
    # 'ab cd' dominates: its char mass exceeds 20% of the doc
    assert got[2]["r_top2gram"] is False and got[2]["top2_cnt"] >= 40
    # repeated 5-gram block: duplicate-5-gram chars exceed 15%
    assert got[3]["r_dup5gram"] is False and got[3]["dup5_chars"] > 0
    # empty doc: all-zero counts keep trivially (0 <= 0)
    assert got[4]["keep"] is True and got[4]["n_lines"] == 0


def test_gopher_repetition_top2_tiebreak_deterministic(spark):
    """Two 2-grams with equal count and equal char mass: the (cnt,
    chars, gram)-descending tie-break must pick the lexicographically
    larger gram's mass in every engine/partitioning."""
    from piholelongtermstats_spark.operators.text import gopher_repetition

    # "aa bb" x3 and "cc dd" x3 interleaved with unique separators
    text = " ".join(
        f"aa bb u{i} cc dd v{i}" for i in range(3)
    )
    docs = spark.createDataFrame([_doc(0, text)], DOC_SCHEMA)
    one = gopher_repetition(docs).first()
    assert one.top2_cnt == 3 and one.top2_chars == 15
    two = gopher_repetition(docs.repartition(8)).first()
    assert (two.top2_cnt, two.top2_chars) == (one.top2_cnt, one.top2_chars)


def test_c4_rules_constructed_cases(spark):
    """C4 line/page heuristics on built pages (the synthetic corpus
    has no punctuation or newlines, so the gate is degenerate there —
    these cases carry the semantics)."""
    from piholelongtermstats_spark.operators.text import c4_rules

    good = "\n".join(
        [
            "This is a perfectly reasonable first sentence.",
            "Here is another sentence with enough words too!",
            'And a third one that ends with a quote."',
            "short line.",            # <5 words → dropped
            "no terminal punctuation here at all",  # dropped
        ]
    )
    lorem = "Lorem ipsum dolor sit amet, consectetur adipiscing elit."
    code = "function f() { return 1; } this page has code in it."
    blocked = "This sentence contains a badword and is long enough to pass."
    thin = "Only one real sentence lives on this page."
    docs = spark.createDataFrame(
        [
            _doc(0, good),
            _doc(1, lorem),
            _doc(2, code),
            _doc(3, blocked),
            _doc(4, thin),
        ],
        DOC_SCHEMA,
    )
    got = {r.doc_id: r.asDict() for r in c4_rules(docs).collect()}
    assert got[0]["keep"] is True
    assert got[0]["kept_lines"] == 3 and got[0]["n_lines"] == 5
    assert got[0]["n_sentences"] == 3
    assert "short line." not in got[0]["cleaned_text"]
    assert got[1]["has_lorem"] is True and got[1]["keep"] is False
    assert got[2]["has_brace"] is True and got[2]["keep"] is False
    assert got[3]["has_blocked"] is True and got[3]["keep"] is False
    assert got[4]["r_sentences"] is False and got[4]["keep"] is False


def test_bpe_pair_counts_exact_small_corpus(spark):
    from piholelongtermstats_spark.operators.text import bpe_pair_counts

    # 'abab' x2 and 'ab' once, plus a 1-char word that must not
    # fabricate pairs (Spark sequence(1,0) is descending)
    docs = spark.createDataFrame(
        [_doc(0, "abab abab ab x")], DOC_SCHEMA
    )
    got = {r.pair: r.cnt for r in bpe_pair_counts(docs).collect()}
    # abab: ab, ba, ab per occurrence (wcnt=2 → ab:4, ba:2); ab: ab:1
    assert got == {"ab": 5, "ba": 2}


def test_bpe_encode_cascade_composes(spark):
    """Merge cascade: exhaustive per-merge application in list order,
    later merges consuming earlier outputs ('t'+'a' -> 'ta', then
    'ta'+'b' -> 'tab')."""
    from piholelongtermstats_spark.operators.text import bpe_encode_vocab

    docs = spark.createDataFrame([_doc(0, "table table queue xz")], DOC_SCHEMA)
    merges = [("t", "a"), ("u", "e"), ("q", "u"), ("ta", "b"), ("qu", "e")]
    got = {r.w: (r.symbols, r.n_symbols) for r in
           bpe_encode_vocab(docs, merges).collect()}
    # table: t a b l e -> ta b l e -> tab l e
    assert got["table"] == ("tab l e", 3)
    # queue: q u e u e -> [ue] q ue ue -> [qu? 'q u' gone after ue]
    # q u e u e --ue--> q ue ue --qu: no 'q u' pair left--> q ue ue
    # --que: 'qu e' not present--> q ue ue
    assert got["queue"] == ("q ue ue", 3)
    assert got["xz"] == ("x z", 2)


def test_bpe_merge_exhaustive_on_repeat_chains(spark):
    """'ababab' under merge (a,b): the two-pass anchored replace must
    merge EVERY occurrence (a single non-overlapping pass would skip
    alternating ones), and prefix-gluing must not occur."""
    from piholelongtermstats_spark.operators.text import bpe_encode_vocab

    docs = spark.createDataFrame([_doc(0, "ababab abab qux")], DOC_SCHEMA)
    got = {r.w: r.symbols for r in
           bpe_encode_vocab(docs, [("a", "b"), ("q", "u")]).collect()}
    assert got["ababab"] == "ab ab ab"
    assert got["abab"] == "ab ab"
    assert got["qux"] == "qu x"
