"""Parquet table loaders (reference: S5 DB read source, postgres.rs:293-303).

The reference streams rows out of Postgres; our batch source is columnar
parquet so Catalyst gets predicate pushdown + column pruning for free —
``.explain`` on any engine query shows ``PushedFilters`` reaching the scan.

At 100 TB the same loaders point at a partitioned data lake
(``summaries`` partitioned by height range, ``ati`` bucketed by account —
see ``plans.layout``); nothing above the source changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from ..session import apply_runtime_confs

#: Tables materialized by the test-data driver (TESTDATA.md).
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


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to the engine's internal contract —
    **LongType epoch nanoseconds** (F1 epoch-ms extraction is
    ``ts DIV 1e6``) — regardless of corpus vintage.

    The corpus has shipped ``ts`` three ways across driver generations:
    INT64 nanos (read via ``spark.sql.legacy.parquet.nanosAsLong``),
    ``timestamp[us]`` reading as TIMESTAMP_NTZ (Spark 4's
    ``inferTimestampNTZ``), and plain TIMESTAMP. Pure expressions only,
    so this applies identically to batch reads and streaming readers
    (both ingest paths MUST see one schema). The NTZ wall clock is
    anchored to UTC explicitly via ``make_timestamp(..., 'UTC')`` —
    session-tz independent (``to_utc_timestamp``/``unix_micros`` on NTZ
    coerce through the session zone first and silently shift the epoch
    on a foreign session whose time-zone conf could not be applied)."""
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(
            "ts",
            F.expr(
                "unix_micros(make_timestamp(year(ts), month(ts), day(ts), "
                "hour(ts), minute(ts), extract(SECOND FROM ts), 'UTC')) * 1000"
            ),
        )
    # TIMESTAMP (an absolute instant): unix_micros is tz-independent.
    return df.withColumn("ts", F.unix_micros(F.col("ts")) * F.lit(1000))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing the event-feed timestamp at the
    source, once — see :func:`normalize_events`."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
    return df


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk bytes of one table's parquet file(s) — driver-side
    metadata only (no Spark job), the engine's cheap estimate when a
    plan-time decision (e.g. a broadcast-vs-shuffled-hash hint) must be
    made before anything executes. Counts data files, skips `_`/`.`
    bookkeeping files; a table stored as a single file is its size."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, fn))
    return total
