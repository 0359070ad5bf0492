"""Parquet star-schema loader.

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file (or directory) per table under a
scale-factor directory. Loading is lazy (Spark scans are deferred) and the
schema is whatever the files carry; column pruning + predicate pushdown are
left to Catalyst, so callers should select/filter on the returned frames
directly rather than materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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

# Dimension tables small enough to broadcast at any realistic SF.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP_LTZ at µs precision.

    The driver's events parquet has carried the timestamp as either
    TIMESTAMP(NANOS) (arriving as long ns under
    spark.sql.legacy.parquet.nanosAsLong) or TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (arriving as TIMESTAMP_NTZ, which
    unix_micros/window/watermark reject). Both normalize to the same UTC
    instant DuckDB's naive timestamp uses, since the session timezone is
    pinned to UTC.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # integer `div`, not `/`: float division of an ~1.7e18 ns epoch
        # loses µs precision in double.
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp_ltz"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_ts(df)
    return df


def load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load + right-size for CPU-heavy per-row kernels (shingling, crypto
    hashing, tokenization).

    A parquet file with a single row group is unsplittable, so the scan —
    and every narrow transform fused onto it — runs as ONE task no matter
    how many cores the cluster has. When the scan yields fewer partitions
    than half the default parallelism, a round-robin repartition spreads
    rows across all cores before the expensive kernel; the shuffled bytes
    are just the raw rows, a fraction of the downstream hash work it
    unlocks. On production layouts (many files / many row groups) the
    scan is already parallel and this no-ops — the repartition only fires
    on pathological layouts, so it never adds a corpus-wide shuffle at
    100 TB.
    """
    df = load(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def parquet_column_bounds(sf_dir: str, name: str, column: str):
    """(min, max) of a column from parquet FOOTER statistics — no Spark
    job, so plan-time eligibility checks (e.g. "do these ids fit an int64
    pack?") cost ~ms even inside a timed bench run. Returns None when any
    row group lacks min/max stats or the probe fails; callers must fall
    back to an always-correct unpacked path."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    try:
        files = (
            [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
            if os.path.isdir(path)
            else [path]
        )
        lo, hi = None, None
        for f in files:
            md = pq.read_metadata(f)
            idx = md.schema.names.index(column)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        return None if lo is None else (lo, hi)
    except Exception:  # noqa: BLE001 — stats probe must never break a plan
        return None


def fixture_dir(sf_dir: str, kind: str, table: str) -> tuple[str, bool]:
    """Staging dir under /tmp keyed by the source parquet's (mtime, size)
    fingerprint. Returns ``(path, already_built)``. Driver-regenerated
    testdata changes the fingerprint, so a fresh dataset can never reuse a
    stale fixture, while repeat runs on the same dataset skip the rewrite.
    Mark completion with :func:`mark_staged` AFTER the write finishes (a
    killed mid-write run must not look built)."""
    import tempfile

    src = os.stat(table_path(sf_dir, table))
    path = os.path.join(
        tempfile.gettempdir(),
        f"icebergspark_{kind}_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{src.st_mtime_ns:x}_{src.st_size:x}",
    )
    return path, os.path.exists(os.path.join(path, "_STAGED"))


def mark_staged(path: str) -> None:
    os.makedirs(path, exist_ok=True)
    open(os.path.join(path, "_STAGED"), "w").close()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view for spark.sql access."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
