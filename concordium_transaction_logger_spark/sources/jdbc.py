"""JDBC source/sink — the engine's analog of the reference's Postgres wire
(S5 read source postgres.rs:293-303; K1-K4 write path main.rs:545-574,
m0002 bulk insert).

No database ships in this test environment, so these helpers are exercised
only for construction; the options they set are the load-bearing part:

- reads: ``partitionColumn/lowerBound/upperBound/numPartitions`` split the
  table scan across executors (the JDBC equivalent of file splits), and
  ``predicates`` push per-partition WHERE clauses so Postgres prunes with
  its own indexes;
- writes: ``batchsize`` mirrors the reference's 1000-row multi-VALUES
  bulk insert (m0002_acoount_public_key_binding.rs:56,107-117);
  ``isolationLevel=READ_COMMITTED`` + idempotent batch keys give the K1
  per-batch transactional contract.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BATCH_SIZE = 1000  # m0002:56


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC read. For the reference tables the natural split
    column is the monotone ``id`` (summaries) / ``(account-hash)`` (ati)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_batch_writer(
    url: str,
    table_for: Callable[[str], str],
    batchsize: int = DEFAULT_BATCH_SIZE,
    **options: str,
) -> Callable[[dict[str, DataFrame], int], None]:
    """Build a foreachBatch-style writer that appends each derived sink
    table of a micro-batch over JDBC — the streaming pipeline's JDBC twin
    of its parquet writer. ``table_for`` maps sink name -> DB table.

    Exactly-once: pair with an ``ingest_batch`` column and a unique
    (ingest_batch, id) constraint + ``ON CONFLICT DO NOTHING`` server-side,
    or route through a staging table and MERGE — the JDBC protocol itself
    has no idempotent append."""

    def write(tables: dict[str, DataFrame], batch_id: int) -> None:
        for name, df in tables.items():
            (
                df.write.format("jdbc")
                .option("url", url)
                .option("dbtable", table_for(name))
                .option("batchsize", str(batchsize))
                .options(**options)
                .mode("append")
                .save()
            )

    return write
