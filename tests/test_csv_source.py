"""CSV ingest: byte-exact text round-trip through base64, quarantine
of type-violating rows, cache release."""

from __future__ import annotations

from piholelongtermstats_spark.sources import csvsource


def _docs_df(spark):
    rows = [
        (1, "hello world", "en", "web", 11),
        (2, 'comma, "quote", and\nnewline', "en", "web", 27),
        (17, "unicode … ellipsis", "de", "book", 18),
        (34, "another corrupt row", "en", "web", 19),
        (5, "", "en", "web", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    path = str(tmp_path / "docs_csv")
    csvsource.write_documents_csv(_docs_df(spark), path, corrupt_mod=17)
    good, bad = csvsource.read_documents_csv(spark, path)
    g = {r.doc_id: r for r in good.collect()}
    # doc_ids 17 and 34 (and 0 if present) are corrupted -> quarantined
    assert set(g) == {1, 2, 5}
    assert g[2].text == 'comma, "quote", and\nnewline'
    assert g[5].text == "" and g[1].n_chars == 11
    q = bad.collect()
    assert len(q) == 2
    assert all("x17" in r.raw_line or "x34" in r.raw_line for r in q)
    assert csvsource.release_documents_csv(spark, path) == 1


def test_csv_clean_export_has_empty_quarantine(spark, tmp_path):
    path = str(tmp_path / "docs_csv_clean")
    csvsource.write_documents_csv(_docs_df(spark), path, corrupt_mod=None)
    good, bad = csvsource.read_documents_csv(spark, path)
    assert good.count() == 5 and bad.count() == 0
    csvsource.release_documents_csv(spark, path)


def test_csv_long_text_single_line(spark, tmp_path):
    """>76-char text must stay ONE csv line (Spark's base64 is the
    MIME encoder and would wrap with CRLF, tearing the row)."""
    df = spark.createDataFrame(
        [(1, "z" * 500, "en", "web", 500)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "docs_long")
    csvsource.write_documents_csv(df, path)
    raw = spark.read.text(path).count()
    assert raw == 1
    good, bad = csvsource.read_documents_csv(spark, path)
    assert bad.count() == 0 and good.collect()[0].text == "z" * 500
    csvsource.release_documents_csv(spark, path)


def test_csv_writer_rejects_delimiter_in_unprotected_columns(spark, tmp_path):
    """r8 ADVICE: lang/source ride raw in the transport, so a comma or
    newline there must RAISE at write time instead of silently
    shifting every later field."""
    import pytest
    from pyspark.sql.utils import PythonException

    bad = spark.createDataFrame(
        [(1, "text", "en,GB", "web", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(Exception, match="delimiter|USER_RAISED"):
        csvsource.write_documents_csv(bad, str(tmp_path / "bad_csv"))
    bad2 = spark.createDataFrame(
        [(1, "text", "en", "we\nb", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(Exception, match="delimiter|USER_RAISED"):
        csvsource.write_documents_csv(bad2, str(tmp_path / "bad_csv2"))
