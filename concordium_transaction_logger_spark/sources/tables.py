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
from pyspark.sql.types import LongType

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing the event-feed timestamp.

    The engine's internal contract for ``events.ts`` is **LongType epoch
    nanoseconds** (F1 epoch-ms extraction is ``ts DIV 1e6``). The corpus
    has shipped it two ways across driver generations: INT64 nanos (read
    via ``spark.sql.legacy.parquet.nanosAsLong``) and ``timestamp[us]``
    (reads as TIMESTAMP_NTZ under Spark 4's ``inferTimestampNTZ``). Both
    are normalized here — at the source, once — so every operator and the
    streaming replay see one schema regardless of corpus vintage.
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and not isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP/TIMESTAMP_NTZ -> epoch-nanos Long (session tz is UTC,
        # so the NTZ wall clock IS the epoch clock).
        df = df.withColumn(
            "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
        )
    return df


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
