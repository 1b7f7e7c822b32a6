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
    """Load one driver table. Applies runtime confs first so nanosecond
    parquet timestamps read as LongType nanos instead of erroring."""
    apply_runtime_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
