"""Date-partitioned events layout — the physical design the S4 range
scan (reference db.py:133, the date-window query) runs against at
100 TB.

The flat single-file layout serves correctness tests, and parquet
row-group statistics already skip most of an out-of-range file. But
at 100 TB a date-range query must prune ENTIRE partitions at planning
time — directory-level `PartitionFilters`, before any file footer is
opened — not just row groups inside files the scan already touched.
Hive-style `p_date=YYYY-MM-DD/` partitioning gives exactly that:

  - the [lo, hi) window becomes a p_date range predicate that Catalyst
    turns into PartitionFilters (pruned at plan time, visible in
    `.explain("formatted")`);
  - the raw-ts bounds stay as PushedFilters for the boundary days'
    row groups (sources/events.filter_raw_ts);
  - daily ingest appends one new directory — no rewrite of history,
    and retention is a directory drop.

Partition count math: ~3 years of DNS logs ≈ 1,100 partitions — far
under the ~10k where Hive-metastore listing becomes the bottleneck;
within a day the files stay row-group-sized (128 MB) via
maxRecordsPerFile at real scale.

tests/test_scale_layout.py asserts PartitionFilters appears in the
plan, the pruned scan reads only the in-range partitions, and the
result matches the flat-layout range scan row-for-row.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piholelongtermstats_spark.functions.derive import enrich_time
from piholelongtermstats_spark.sources.events import (
    EVENT_ALLOWED,
    EVENT_BLOCKED,
    _epoch_us,
    filter_raw_ts,
)
from piholelongtermstats_spark.sources.parquet import (
    invalidate_read_memo,
    load_table,
    read_parquet_memo,
)

PARTITION_COL = "p_date"


def canonical_ts(ev: DataFrame) -> DataFrame:
    """Layout writes canonicalize ts to UTC TimestampType; run the
    write under `micros_write` so it lands as INT64 micros. Spark's
    default INT96 timestamp encoding carries NO usable parquet
    statistics, and TIMESTAMP_NTZ stats are ignored by the reader's
    row-group filter (both measured in sources/zorder.py: a 2-day
    window over a ts-SORTED 16-file layout read 10000/10000 rows under
    either default, 1236 under INT64 micros). For the p_date layout
    this is what makes the BOUNDARY-day row groups skippable — the
    directory pruning never needed stats, but the raw-ts PushedFilters
    on the edge days did."""
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        return ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


class micros_write:
    """Scoped outputTimestampType=TIMESTAMP_MICROS (save/restore)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.parquet.outputTimestampType")
        self.spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.parquet.outputTimestampType", self.prev)

# One layout write per (application, path): the existence check alone
# would race a concurrent in-session write of the same path.
_LAYOUT_READY: set[tuple] = set()


def layout_path(sf_dir: str) -> str:
    """Deterministic on-disk location of the partitioned layout for a
    given source dir. Root overridable via SPARK_GRAFT_LAYOUT_DIR (the
    cluster deployment points it at the warehouse); default is a
    tmp-dir keyed by sf name + an abspath digest — basename alone
    would silently alias two different dirs that share a name (e.g.
    /a/sf0.1 and /b/sf0.1) onto one layout."""
    import hashlib

    root = os.environ.get(
        "SPARK_GRAFT_LAYOUT_DIR",
        os.path.join(tempfile.gettempdir(), "phlts_layout"),
    )
    ap = os.path.abspath(sf_dir.rstrip("/"))
    sf_name = os.path.basename(ap) or "events"
    digest = hashlib.md5(ap.encode()).hexdigest()[:8]
    return os.path.join(root, f"{sf_name}-{digest}", "events_by_date")


_META_FILE = "_PHLTS_SRC_META"
# Bumped when the layout FORMAT changes (v2: ts canonicalized to INT64
# UTC micros) so stale-format layouts from earlier sessions regenerate.
LAYOUT_VERSION = 2


def _src_stat(sf_dir: str) -> "str | None":
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
    except OSError:
        return None
    return f"v{LAYOUT_VERSION}:{st.st_mtime_ns}:{st.st_size}"


def layout_is_fresh(sf_dir: str) -> bool:
    """True iff a completed layout exists for sf_dir and was derived
    from the CURRENT source bytes. Freshness compares the source's
    (mtime_ns, size) recorded at write time — a plain mtime>=mtime
    check misses a source regenerated within the filesystem's mtime
    granularity of the layout write (staleness must never win over
    correctness)."""
    path = layout_path(sf_dir)
    marker = os.path.join(path, "_SUCCESS")
    meta = os.path.join(path, _META_FILE)
    cur = _src_stat(sf_dir)
    if cur is None or not os.path.exists(marker):
        return False
    try:
        with open(meta) as f:
            return f.read().strip() == cur
    except OSError:
        return False


def ensure_layout(spark: SparkSession, sf_dir: str) -> str:
    """Idempotently materialize the date-partitioned layout for sf_dir
    and return its path. The write runs at most once per (application,
    path); a fresh on-disk layout from an earlier session is reused
    (daily-ingest model: history directories are immutable).

    Cross-PROCESS collisions (bench + a concurrent parity run on the
    same sf) are narrowed by writing to a pid-unique staging dir and
    renaming into place: a concurrent reader sees either the old
    complete layout or the new complete layout, never a half-written
    one. (The production contract needs none of this — the warehouse
    layout is append-only daily ingest; the swap exists for the local
    regenerate-testdata loop.)"""
    import shutil

    path = layout_path(sf_dir)
    key = (spark.sparkContext.applicationId, path)
    if key in _LAYOUT_READY:
        return path
    if not layout_is_fresh(sf_dir):
        src_stat = _src_stat(sf_dir)
        staging = f"{path}.staging.{os.getpid()}"
        shutil.rmtree(staging, ignore_errors=True)
        write_events_date_partitioned(spark, sf_dir, staging)
        with open(os.path.join(staging, _META_FILE), "w") as f:
            f.write(src_stat or "")
        if layout_is_fresh(sf_dir):
            # another process completed the same layout while we wrote
            shutil.rmtree(staging, ignore_errors=True)
        else:
            shutil.rmtree(path, ignore_errors=True)
            os.rename(staging, path)
        invalidate_read_memo(spark, path)
    _LAYOUT_READY.add(key)
    return path


def write_events_date_partitioned(
    spark: SparkSession, sf_dir: str, path: str
) -> None:
    """One-time layout job: events → hive-partitioned parquet keyed by
    UTC date. Non-ts columns are preserved byte-for-byte; ts is
    canonicalized to INT64 UTC micros (canonical_ts — same µs-truncated
    instants the fact table derives, but now with USABLE parquet
    statistics, so the boundary days' raw-ts PushedFilters skip row
    groups instead of silently reading the whole edge directory)."""
    ev = canonical_ts(load_table(spark, sf_dir, "events"))
    keyed = ev.withColumn(PARTITION_COL, F.to_date(F.col("ts")))
    # Empty source (the reference's first-class empty-DB path,
    # tests/test_db.py:272-362): a zero-row partitionBy write creates
    # NO partition directories, leaving a path whose schema cannot be
    # inferred back. Write the zero-row frame unpartitioned instead —
    # p_date becomes an ordinary (empty) DATE column, so the scan path
    # reads, filters, and projects identically. isEmpty() is a
    # LIMIT-1 probe: O(first row) on any real table.
    with micros_write(spark):
        if keyed.isEmpty():
            keyed.write.mode("overwrite").parquet(path)
            return
        keyed.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(path)


def scan_events_date_partitioned(
    spark: SparkSession,
    path: str,
    lo: "dt.datetime | None" = None,
    hi: "dt.datetime | None" = None,
) -> DataFrame:
    """The S4 range scan over the partitioned layout: directory-level
    pruning on p_date plus exact raw-ts bounds for the boundary days.
    Returns the same enriched fact schema as sources/events.dns_fact.

    hi is END-EXCLUSIVE (db.py:85 contract): the last candidate
    partition is the date of (hi − 1µs), so a midnight hi does not
    touch the following day's directory at all.

    Partition bounds are taken from the UTC date of the bound INSTANT
    (r4 ADVICE): p_date is derived from UTC event time, and
    filter_raw_ts accepts tz-aware bounds, so a tz-aware bound (e.g.
    UTC+14 early morning — already the previous day in UTC) must
    prune on its UTC calendar date, not its local wall-clock date, or
    the directory holding in-range rows would be pruned away.
    """

    def _utc_date(t: dt.datetime) -> dt.date:
        return dt.datetime.fromtimestamp(
            _epoch_us(t) / 1e6, tz=dt.timezone.utc
        ).date()

    ev = read_parquet_memo(spark, path)
    if lo is not None:
        ev = ev.filter(
            F.col(PARTITION_COL) >= F.lit(_utc_date(lo).isoformat()).cast("date")
        )
    if hi is not None:
        last = _utc_date(hi - dt.timedelta(microseconds=1))
        ev = ev.filter(F.col(PARTITION_COL) <= F.lit(last.isoformat()).cast("date"))
    ev, ts = filter_raw_ts(ev, lo, hi)
    df = ev.select(
        F.col("event_id"),
        ts.alias("ts"),
        F.col("user_id").cast("string").alias("client"),
        F.col("props").alias("domain"),
        (
            F.when(F.col("event_type").isin(*EVENT_ALLOWED), F.lit("Allowed"))
            .when(F.col("event_type").isin(*EVENT_BLOCKED), F.lit("Blocked"))
            .otherwise(F.lit("Other"))
        ).alias("status_type"),
        F.col("value").alias("reply_time"),
    )
    return enrich_time(df, "ts")


def compact_partition_files(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_glob: str = "p_date=*",
) -> dict:
    """Small-file compaction for a hive-partitioned layout: rewrite
    every partition directory whose file count exceeds the byte-target
    implies (ceil(dir_bytes / target_bytes) files) down to exactly
    that many files — THE recurring 100 TB maintenance job (streaming
    and incremental ingest leave thousands of KB-scale files per
    partition; each file under-target wastes a scan task and its
    open/footer overhead, and at 10⁵ partitions the NameNode/listing
    cost compounds).

    Mechanics per oversized partition: read the partition directory
    alone (no full-table scan), coalesce(ceil(bytes/target)) — a
    NARROW repartitioning, no shuffle — and stage+rename like
    ensure_layout, so concurrent readers see the old or the new
    complete directory, never a mix. Row contents are untouched
    (identity is test-pinned); only file boundaries change. Returns
    {partition: (files_before, files_after)} for the partitions
    rewritten."""
    import glob as _glob
    import math
    import shutil

    out = {}
    for pdir in sorted(_glob.glob(os.path.join(root, partition_glob))):
        files = [
            f
            for f in _glob.glob(os.path.join(pdir, "*.parquet"))
            if os.path.isfile(f)
        ]
        if not files:
            continue
        total = sum(os.path.getsize(f) for f in files)
        want = max(1, math.ceil(total / target_bytes))
        if len(files) <= want:
            continue
        df = spark.read.parquet(pdir)
        staging = pdir + ".compact_tmp"
        shutil.rmtree(staging, ignore_errors=True)
        with micros_write(spark):
            df.coalesce(want).write.mode("overwrite").parquet(staging)
        old = pdir + ".compact_old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(pdir, old)
        os.rename(staging, pdir)
        shutil.rmtree(old, ignore_errors=True)
        invalidate_read_memo(spark, root)
        n_after = len(
            [f for f in _glob.glob(os.path.join(pdir, "*.parquet"))]
        )
        out[os.path.basename(pdir)] = (len(files), n_after)
    return out
