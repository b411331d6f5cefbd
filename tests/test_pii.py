"""pii_scrub (operators/text.py): constructed-case redaction
semantics — cascade no-double-count, passthrough, multiplicity."""

from __future__ import annotations

from piholelongtermstats_spark.operators.text import pii_scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_types_and_counts(spark):
    rows = [
        (0, "mail a@b.co and c.d+x@e.org end"),
        (1, "call 555-123-4567 or 555.987.6543"),
        (2, "host 192.168.0.1 gateway 10.0.0.254"),
        (3, "clean text with no identifiers"),
        (4, "mixed a@b.co 555-123-4567 10.0.0.1"),
    ]
    got = {r.doc_id: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (got[0].n_emails, got[0].n_phones, got[0].n_ips) == (2, 0, 0)
    assert got[0].scrubbed == "mail <EMAIL> and <EMAIL> end"
    assert (got[1].n_emails, got[1].n_phones, got[1].n_ips) == (0, 2, 0)
    assert got[1].scrubbed == "call <PHONE> or <PHONE>"
    assert (got[2].n_emails, got[2].n_phones, got[2].n_ips) == (0, 0, 2)
    assert got[3].scrubbed == rows[3][1]  # untouched passthrough
    assert (got[3].n_emails, got[3].n_phones, got[3].n_ips) == (0, 0, 0)
    assert got[4].scrubbed == "mixed <EMAIL> <PHONE> <IP>"


def test_cascade_prevents_double_count(spark):
    # the digits inside an email's domain must not count as an IP,
    # and a phone-shaped run inside an email local part is an email
    rows = [(0, "x 1.2.3.4@mail.com y"), (1, "ip-ish mail 10.0.0.1@h.io z")]
    got = {r.doc_id: r for r in pii_scrub(_docs(spark, rows)).collect()}
    for r in got.values():
        assert r.n_emails == 1 and r.n_ips == 0 and r.n_phones == 0, r
        assert "<EMAIL>" in r.scrubbed and "<IP>" not in r.scrubbed


def test_zero_shuffle_plan(spark):
    df = pii_scrub(_docs(spark, [(0, "a@b.co")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
