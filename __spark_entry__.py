"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real content lives in ``concordium_transaction_logger_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from concordium_transaction_logger_spark import registry
from concordium_transaction_logger_spark.operators import queries as q
from concordium_transaction_logger_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: most recent 20 transactions affecting account 7
    (the reference's marquee query, wallet-proxy-indexer/README.md:115-120)."""
    apply_runtime_confs(spark)
    return q.query_account(
        spark, "/root/testdata/sf0.001", account=7, limit=20, descending=True
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrapped(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrapped(fn) for name, fn in registry.spark_queries().items()}


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sqls()
