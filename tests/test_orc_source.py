"""ORC interchange: round-trip fidelity, explicit-schema contract,
and columnar-optimization plan guards (pushdown + pruning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from piholelongtermstats_spark.sources import orcsource


def _docs_df(spark, n=50):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
        F.concat(F.lit("src_"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
        (F.col("id") * 7 % 100).alias("n_chars"),
        F.concat(F.lit("text with spaces, commas \n ok "),
                 F.col("id").cast("string")).alias("text"),
    )


def test_orc_round_trip_exact(spark, tmp_path):
    root = str(tmp_path / "docs_orc")
    docs = _docs_df(spark)
    orcsource.write_documents_orc(docs, root)
    back = orcsource.read_documents_orc(spark, root)
    # type fidelity, no inference drift (nullability aside — ORC files
    # are always read back nullable)
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in docs.schema.fields
    ]
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_orc_scan_pushes_predicate_and_prunes_columns(spark, tmp_path):
    root = str(tmp_path / "docs_orc2")
    orcsource.write_documents_orc(_docs_df(spark), root)
    q = (
        orcsource.read_documents_orc(spark, root)
        .filter(F.col("doc_id") >= 25)
        .select("doc_id", "n_chars")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(doc_id,25)" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "text" not in read_schema[0]  # pruned
    assert q.count() == 25
