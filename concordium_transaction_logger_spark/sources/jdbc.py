"""JDBC source/sink — the engine's analog of the reference's Postgres wire
(S5 read source postgres.rs:293-303; K1-K4 write path main.rs:545-574,
m0002 bulk insert).

The path executes for real against embedded Derby (bundled with Spark) in
``tests/test_jdbc_derby.py`` — batched bulk insert, partitioned read-back,
and the arithmetic MERGE upsert all run on a live connection. The options
these helpers set are the load-bearing part:

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


#: Embedded Derby — the in-JVM database Spark ships with (used by its own
#: Hive metastore); lets the JDBC write/upsert path execute for real in
#: tests with zero extra installs. Production swaps url+driver for
#: Postgres; nothing else changes.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def run_sql(spark: SparkSession, url: str, *statements: str) -> None:
    """Execute DDL/DML on the JDBC target from the driver — the session
    bootstrap half of the reference (migrations at connect,
    migrations.rs): CREATE TABLE / MERGE / DELETE run here, data volume
    moves only through the executor-parallel DataFrame reader/writer.

    All statements of one call run in ONE transaction (autocommit off,
    commit at the end, rollback on failure) — the reference's per-block
    transactional contract (K1, main.rs:545-574). This is load-bearing
    for :func:`merge_supply_upsert`: MERGE and the staging DELETE must be
    atomic, else a crash between them leaves applied-but-undeleted deltas
    that a retry would double-count."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            for s in statements:
                st.execute(s)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            st.close()
    finally:
        conn.close()


def merge_supply_upsert(
    spark: SparkSession, url: str, staging: str, target: str
) -> None:
    """The reference's arithmetic upsert (main.rs:222-251: ``ON CONFLICT
    (idx, subidx, token_id) DO UPDATE SET total_supply = total_supply +
    delta``) as ANSI MERGE from a staging table — the portable spelling
    (Derby/Postgres 15+/Delta all accept it). Call per micro-batch after
    appending that batch's per-key deltas to ``staging``; the MERGE is
    O(|staging|) server-side work against the target's primary key.
    MERGE + staging DELETE commit as one transaction (see
    :func:`run_sql`), so a crashed call applies neither and a retry
    replays exactly once."""
    run_sql(
        spark,
        url,
        f"""
MERGE INTO {target} t USING {staging} s
ON t.idx = s.idx AND t.subidx = s.subidx AND t.token_id = s.token_id
WHEN MATCHED THEN UPDATE SET t.total_supply = t.total_supply + s.total_supply
WHEN NOT MATCHED THEN INSERT (idx, subidx, token_id, total_supply)
VALUES (s.idx, s.subidx, s.token_id, s.total_supply)
""",
        f"DELETE FROM {staging}",
    )
