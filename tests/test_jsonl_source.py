"""JSONL ingestion (sources/jsonl.py): quarantine semantics for torn
lines and type-mismatched-but-valid JSON, roundtrip fidelity, and the
explicit-schema contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from piholelongtermstats_spark.sources.jsonl import (
    DOC_SCHEMA,
    read_documents_jsonl,
    write_documents_jsonl,
)


def test_quarantine_torn_and_type_mismatched_lines(spark, tmp_path):
    path = str(tmp_path / "docs.jsonl")
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}',
        '{"doc_id": 2, "text": "ok",',  # torn mid-write
        'not json at all',
        # valid JSON, doc_id type-mismatches the declared contract
        '{"doc_id": "seven", "text": "x", "lang": "en", "source": "s", "n_chars": 1}',
        '{"doc_id": 3, "text": "zweite zeile", "lang": "de", "source": "s", "n_chars": 12}',
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    good, bad = read_documents_jsonl(spark, path)
    assert good.columns == [f.name for f in DOC_SCHEMA.fields]
    assert sorted((r.doc_id, r.text) for r in good.collect()) == [
        (1, "hello world"),
        (3, "zweite zeile"),
    ]
    raws = sorted(r.raw_line for r in bad.collect())
    assert len(raws) == 3
    # the raw line is preserved verbatim for replay-after-fix
    assert lines[1] in raws and lines[2] in raws and lines[3] in raws


def test_roundtrip_with_injected_corruption(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i} with ünïcode", "en", "s", 20) for i in range(20)],
        DOC_SCHEMA,
    )
    out = str(tmp_path / "rt")
    write_documents_jsonl(docs, out, corrupt_mod=5)
    good, bad = read_documents_jsonl(spark, out)
    assert bad.count() == 4  # ids 0,5,10,15
    got = {r.doc_id: r.text for r in good.collect()}
    assert set(got) == {i for i in range(20) if i % 5 != 0}
    # unicode survives the roundtrip byte-for-byte
    assert got[1] == "text 1 with ünïcode"


def test_clean_write_roundtrips_exactly(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f't"quote\\{i}\nnewline', "en", "s", 5) for i in range(10)],
        DOC_SCHEMA,
    )
    out = str(tmp_path / "clean")
    write_documents_jsonl(docs, out)
    good, bad = read_documents_jsonl(spark, out)
    assert bad.count() == 0
    want = sorted((r.doc_id, r.text) for r in docs.collect())
    assert sorted((r.doc_id, r.text) for r in good.collect()) == want


def test_good_frame_is_analyzable_without_corrupt_column(spark, tmp_path):
    """The SPARK-21610 cache workaround: aggregating ONLY over the
    quarantine side must not raise."""
    path = str(tmp_path / "only.jsonl")
    with open(path, "w") as f:
        f.write("broken\n")
    good, bad = read_documents_jsonl(spark, path)
    assert bad.count() == 1 and good.count() == 0


def test_repeated_reads_reuse_one_cached_parse(spark, tmp_path):
    """r6 ADVICE: re-reading the same path (bench runs each registry
    query 5×) must not accumulate cached relations — the parse is
    cached once per (app, path, schema) and reused."""
    from piholelongtermstats_spark.sources.jsonl import (
        _PARSED_CACHE,
        release_documents_jsonl,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}", "en", "s", 6) for i in range(10)], DOC_SCHEMA
    )
    out = str(tmp_path / "reuse")
    write_documents_jsonl(docs, out)
    before = len(_PARSED_CACHE)
    g1, _ = read_documents_jsonl(spark, out)
    g2, _ = read_documents_jsonl(spark, out)
    g3, _ = read_documents_jsonl(spark, out)
    assert len(_PARSED_CACHE) == before + 1
    assert g1.count() == g2.count() == g3.count() == 10
    assert release_documents_jsonl(spark, out) == 1
    assert len(_PARSED_CACHE) == before
