"""CSV corpus ingestion with corrupt-record quarantine — the JSONL
contract (sources/jsonl.py) applied to the other interchange format
ops teams actually ship. Same 100 TB rules:

- EXPLICIT schema, never inferSchema (inference is an extra pass and
  sample-dependent).
- PERMISSIVE + corrupt-record column: malformed rows quarantine with
  the raw line preserved; quarantine rate is a first-class metric.
- One parse, two consumers: the parsed frame is cached across the
  good/quarantine split (SPARK-21610 applies to CSV exactly as to
  JSON), with the same keyed cache so repeated reads don't leak
  resident relations.

CSV-specific transport rule: free text is BASE64-encoded in the
``text`` column. Raw text in CSV needs quoted embedded newlines,
which forces multiLine=true and makes files non-splittable — one
reader task per file at any size. Base64 keeps every line one record
(splittable scans) and round-trips the bytes exactly; decode is one
JVM expression on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from piholelongtermstats_spark.sources.jsonl import DOC_SCHEMA

_CORRUPT = "_corrupt_record"

_PARSED_CACHE: dict = {}


def write_documents_csv(
    docs: DataFrame, path: str, corrupt_mod: "int | None" = None
) -> None:
    """documents → headerless CSV (doc_id, base64(text), lang,
    source, n_chars), distributed. ``corrupt_mod`` deterministically
    mangles every doc_id % corrupt_mod == 0 line by writing 'x' +
    doc_id into the numeric n_chars slot — a type violation the
    PERMISSIVE reader must quarantine."""
    n_chars = F.col("n_chars").cast("string")
    if corrupt_mod is not None:
        n_chars = F.when(
            F.col("doc_id") % corrupt_mod == 0,
            F.concat(F.lit("x"), F.col("doc_id").cast("string")),
        ).otherwise(n_chars)
    # concat_ws SKIPS nulls (shifting columns), and the CSV reader
    # parses an empty field as NULL — so every field is null-coalesced
    # on write and text round-trips '' and NULL both as '' (documented
    # transport convention; n_chars disambiguates when it matters).
    line = F.concat_ws(
        ",",
        F.col("doc_id").cast("string"),
        # Spark's base64 is the MIME encoder: it WRAPS at 76 chars
        # with CRLF, which would tear every long doc into many CSV
        # lines. Strip the wrap; unbase64's decoder ignores it anyway.
        F.regexp_replace(
            F.base64(F.coalesce(F.col("text"), F.lit("")).cast("binary")),
            "[\\r\\n]",
            "",
        ),
        # lang/source ride RAW (only text is base64-protected): the
        # transport contract REQUIRES them delimiter-free. Enforced at
        # write time — a comma/CR/LF here would shift every later
        # field and silently mis-parse the row (r8 ADVICE); raising in
        # the writer turns a data bug into an immediate error.
        F.coalesce(_assert_no_delims("lang"), F.lit("")),
        F.coalesce(_assert_no_delims("source"), F.lit("")),
        F.coalesce(n_chars, F.lit("")),
    )
    docs.select(line.alias("value")).write.mode("overwrite").text(path)


def _assert_no_delims(col: str) -> F.Column:
    """Pass ``col`` through unchanged, raising if a value contains the
    CSV delimiter or a line break (the fields the transport convention
    leaves unprotected must be provably safe, not assumed safe)."""
    bad = F.col(col).rlike("[,\\r\\n]")
    return F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(f"csv transport: column '{col}' contains a "),
                F.lit("delimiter or newline: "),
                F.col(col),
            )
        ),
    ).otherwise(F.col(col))


def read_documents_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): parse ``path`` against the explicit doc
    schema (text still base64 in transit — decoded here). Rows whose
    fields violate the declared types land in quarantine with the
    raw line."""
    import os

    transit = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text_b64", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField(_CORRUPT, T.StringType()),
        ]
    )
    key = (spark.sparkContext.applicationId, os.path.abspath(path))
    parsed = _PARSED_CACHE.get(key)
    if parsed is None:
        parsed = (
            spark.read.schema(transit)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .option("header", "false")
            .csv(path)
            .cache()  # SPARK-21610: corrupt-column-only queries need it
        )
        _PARSED_CACHE[key] = parsed
    good = parsed.filter(F.col(_CORRUPT).isNull()).select(
        "doc_id",
        F.unbase64(F.coalesce(F.col("text_b64"), F.lit("")))
        .cast("string")
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    assert [f.name for f in DOC_SCHEMA.fields] == list(good.columns)
    quarantine = parsed.filter(F.col(_CORRUPT).isNotNull()).select(
        F.col(_CORRUPT).alias("raw_line")
    )
    return good, quarantine


def release_documents_csv(spark: SparkSession, path: "str | None" = None) -> int:
    """Unpersist cached parses (mirror of release_documents_jsonl)."""
    import os

    app = spark.sparkContext.applicationId
    keys = [
        k
        for k in _PARSED_CACHE
        if k[0] == app and (path is None or k[1] == os.path.abspath(path))
    ]
    for k in keys:
        _PARSED_CACHE.pop(k).unpersist()
    return len(keys)
