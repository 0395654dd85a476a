"""Table loaders for the driver test data and engine inputs.

The reference's collection scan (``ee.ImageCollection(name)`` →
``getRegion`` → header-driven pandas frame, reference
``TrendEngine/calculations/utils.py:6-35``) maps to a partitioned
Parquet scan read as a DataFrame: lazy, schema-explicit, and
filter/column pushdown reach the scan via Catalyst.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@lru_cache(maxsize=None)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Column names stored as parquet TIMESTAMP(NANOS) — a footer-only
    probe (driver-side, once per path). Spark has no nanosecond
    timestamp type, so these read as LONG under
    ``spark.sql.legacy.parquet.nanosAsLong`` and are converted back to
    microsecond timestamps after the scan."""
    import pyarrow.parquet as pq
    import pyarrow.types as pt

    target = path
    if os.path.isdir(path):
        parts = [p for p in sorted(os.listdir(path)) if p.endswith(".parquet")]
        if not parts:
            return ()
        target = os.path.join(path, parts[0])
    try:
        schema = pq.read_schema(target)
        # Arrow reports BOTH parquet TIMESTAMP(NANOS) and legacy INT96
        # timestamps as timestamp[ns]; only the former reads as LONG
        # under nanosAsLong (INT96 reads natively). Disambiguate on
        # the parquet physical type.
        phys = pq.ParquetFile(target).schema
        int96 = {
            phys.column(i).name
            for i in range(len(phys))
            if phys.column(i).physical_type == "INT96"
        }
    except Exception:
        return ()
    return tuple(
        f.name
        for f in schema
        if pt.is_timestamp(f.type) and f.type.unit == "ns" and f.name not in int96
    )


def _scan_cache(spark: SparkSession) -> dict:
    """Per-session {(sf_dir, name): analyzed scan DataFrame}. Plans are
    immutable, so handing the same object to every query is safe; the
    win is skipping the per-call file listing + parquet schema
    inference JVM roundtrips (measurable per-query constant cost in
    the bench suite).

    The dict hangs as an attribute ON the session object, so entries
    die with the session and a re-created session starts clean. A
    module-level WeakKeyDictionary cannot do this job: the cached
    DataFrames hold a strong reference back to their session
    (``df._session``), so the values would reach the key and — per the
    documented weakref caveat — the entry would never collect (ADVICE
    r4: the previous weak-keyed version was inert)."""
    per_session = getattr(spark, "_te_scan_cache", None)
    if per_session is None:
        per_session = {}
        spark._te_scan_cache = per_session
    return per_session


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (reference S1: collection scan).

    Handles parquet TIMESTAMP(NANOS) columns (which Spark cannot read
    natively): they are scanned as raw nanosecond longs and floored to
    microsecond timestamps — an integer ``div``, pushdown-friendly and
    exact (int64 arithmetic; a double division would lose precision
    above 2^53)."""
    per_session = _scan_cache(spark)
    cached = per_session.get((sf_dir, name))
    if cached is not None:
        return cached
    path = table_path(sf_dir, name)
    # pin UTC on whatever session the caller provides: the DuckDB
    # oracle is timezone-naive, so timestamp comparisons are only
    # stable with a UTC session (defensive — the driver's own session
    # config is not ours to assume)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # parquet timestamps without isAdjustedToUTC infer as
    # TIMESTAMP_NTZ (Spark 4 default) — fine for batch, but streaming
    # event-time (withWatermark/window) requires TIMESTAMP, and the
    # DuckDB oracle reads the same column as a naive timestamp. With
    # the session pinned to UTC the cast maps wall time → the same
    # instant, so values (and driver hashes) are unchanged.
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    per_session[(sf_dir, name)] = df
    return df


def _table_bytes(sf_dir: str, name: str) -> int:
    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def warm_cache(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLE_NAMES,
    cpus: int | None = None,
) -> dict[str, int]:
    """Pin tables into Spark's in-memory columnar cache (buffer pool).

    Interactive/bench profile only — an explicit opt-in, analogous to a
    warehouse buffer pool or ``CREATE TABLE AS`` ingest. Two effects:

    - skips per-query parquet decode (the steady-state cost DuckDB
      pays per query is raw-scan decode from OS page cache; Spark's
      columnar cache is the engine-native equivalent one level up);
    - restores scan parallelism on pathological layouts: the driver
      test files are single-row-group parquet, which caps a Spark scan
      at ONE task regardless of split count (row groups are assigned
      to the split holding their midpoint), so every downstream stage
      inherits a 1-partition straggler. The cache is built through a
      size-proportional ``repartition`` so cached batches spread over
      the cores.

    At 100 TB you would not call this on the fact table — you cache
    dims and hot partitions, and fix the layout at ingest (row groups
    ~128 MB); the engine's scan path needs no fan-out there, so this
    helper stays a small-input/interactive tool.

    Subsequent :func:`load_table` calls on the same (session, sf_dir)
    return the cached plan, so every query built afterwards reads the
    cache. Returns name → row count (materialization is forced).
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    counts: dict[str, int] = {}
    cached: list[tuple[str, DataFrame]] = []
    for name in names:
        df = load_table(spark, sf_dir, name)
        # ~400 KB of parquet per cached partition, capped at core count:
        # big enough that per-task overhead stays small, small enough
        # that the one big table spreads across the machine.
        parts = max(1, min(cpus, _table_bytes(sf_dir, name) // (400 * 1024) + 1))
        if parts > 1:
            df = df.repartition(parts)
        df = df.cache()
        _scan_cache(spark)[(sf_dir, name)] = df
        cached.append((name, df))
    # materialize concurrently: each build is a near-serial scan of a
    # single-row-group file, so overlapping the per-table jobs hides
    # most of the wall time
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        for name, n in zip(
            (n for n, _ in cached),
            pool.map(lambda t: t[1].count(), cached),
        ):
            counts[name] = n
    # operators' fan_out() detects cache-backed plans per input (it
    # probes the plan for InMemoryRelation), so no session-global flag
    # is needed: un-warmed scans in the same session still get the
    # single-row-group parallelism fix
    return counts


def clear_warm_cache(spark: SparkSession, sf_dir: str) -> None:
    """Undo :func:`warm_cache`: unpersist and restore raw-scan plans."""
    per_session = _scan_cache(spark)
    for name in TABLE_NAMES:
        df = per_session.pop((sf_dir, name), None)
        if df is not None:
            try:
                df.unpersist()
            except Exception:
                pass


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every test table as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
