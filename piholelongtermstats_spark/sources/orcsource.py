"""ORC interchange for the documents corpus — the third interchange
format next to JSONL (sources/jsonl.py) and CSV (sources/csvsource.py),
closing the row-text / row-delimited / COLUMNAR source matrix.

Unlike the text formats, ORC is self-describing and columnar, so the
ingest contract is different in kind: there is no per-row quarantine
channel (a torn ORC stripe fails the file, not the row) — what must
be verified instead is SCHEMA FIDELITY (types survive the round
trip untouched) and that the read path keeps Spark's columnar
optimizations: predicate pushdown into the stripe reader and column
pruning into the ReadSchema (asserted by tests/test_orc_source.py on
the ORC FileScan, the sources/layout.py discipline applied to an
interchange format).

Reference scope: the reference ingests SQLite only (db.py); the
interchange tier is beyond-reference surface for pipeline handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = "doc_id long, lang string, source string, n_chars long, text string"


def write_documents_orc(docs: DataFrame, root: str) -> None:
    """Export (doc_id, lang, source, n_chars, text) as ORC files.

    Columns are written in the DOC_SCHEMA order with zstd compression
    (the ORC default in Spark is snappy; zstd halves interchange size
    at equal scan speed on text-heavy corpora). Splittable by stripe
    at any file size — no one-task-per-file cliff to document, unlike
    multiLine CSV."""
    docs.select("doc_id", "lang", "source", "n_chars", "text").write.mode(
        "overwrite"
    ).option("compression", "zstd").orc(root)


def read_documents_orc(spark: SparkSession, root: str) -> DataFrame:
    """Read the ORC export with the EXPLICIT contract schema (never
    inferred — a writer-side type drift must fail loudly at analysis,
    not propagate silently: the jsonl/csv explicit-schema rule)."""
    return spark.read.schema(DOC_SCHEMA).orc(root)
