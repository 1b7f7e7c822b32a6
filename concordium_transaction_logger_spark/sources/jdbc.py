"""JDBC source/sink — the engine's analog of the reference's Postgres wire
(S5 read source postgres.rs:293-303; K1-K4 write path main.rs:545-574,
m0002 bulk insert).

The path executes for real against embedded Derby (bundled with Spark) in
``tests/test_jdbc_derby.py`` — batched bulk insert, partitioned read-back,
the arithmetic MERGE upsert, and the replay-idempotence of both writers
all run on a live connection. The options these helpers set are the
load-bearing part:

- reads: ``partitionColumn/lowerBound/upperBound/numPartitions`` split the
  table scan across executors (the JDBC equivalent of file splits), and
  ``predicates`` push per-partition WHERE clauses so Postgres prunes with
  its own indexes;
- writes: ``batchsize`` mirrors the reference's 1000-row multi-VALUES
  bulk insert (m0002_acoount_public_key_binding.rs:56,107-117);
  exactly-once comes from batch-keyed delete+append (the JDBC analog of
  the parquet sinks' batch-keyed partition overwrite) plus, for the
  arithmetic upsert, an applied-batch ledger committed in the SAME
  transaction as the MERGE.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JVM as the literal "None" and die
            # in an opaque NumberFormatException at load()
            raise ValueError(
                "read_jdbc: partition_column requires lower_bound and "
                "upper_bound"
            )
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
    """Build a foreachBatch-style writer that lands each derived sink
    table of a micro-batch over JDBC — the streaming pipeline's JDBC twin
    of its parquet writer. ``table_for`` maps sink name -> DB table.

    Exactly-once is implemented, not advisory: every row is stamped with
    its ``ingest_batch`` and a (replayed) batch FIRST deletes its own
    rows — delete + stamped append is the JDBC analog of the parquet
    sinks' batch-keyed dynamic partition overwrite, so an at-least-once
    foreachBatch replay converges to one copy. Requires an
    ``ingest_batch BIGINT`` column on the target tables (the analog of
    the parquet partition key)."""

    def write(tables: dict[str, DataFrame], batch_id: int) -> None:
        for name, df in tables.items():
            tbl = table_for(name)
            run_sql(
                df.sparkSession,
                url,
                f"DELETE FROM {tbl} WHERE ingest_batch = {int(batch_id)}",
            )
            (
                df.withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.format("jdbc")
                .option("url", url)
                .option("dbtable", tbl)
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
    for :func:`merge_supply_upsert`: MERGE, the staging DELETE, and the
    applied-ledger INSERT must be atomic, else a crash between them
    leaves applied-but-undeleted deltas that a retry would
    double-count."""
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


def query_scalar(spark: SparkSession, url: str, sql: str) -> int:
    """One scalar SELECT on the JDBC target from the driver (control
    plane: row-count probes in tests/ops tooling; no longer on the
    replay path — the ledger INSERT's PK is the dedup point there)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            rs.next()
            return int(rs.getLong(1))
        finally:
            st.close()
    finally:
        conn.close()


def stage_supply_deltas(
    deltas: DataFrame,
    url: str,
    staging: str,
    batch_id: int,
    batchsize: int = DEFAULT_BATCH_SIZE,
    **options: str,
) -> None:
    """Append one micro-batch's per-key supply deltas to the staging
    table, replay-safely: rows are stamped with ``ingest_batch`` and a
    replayed batch first clears its own rows, so a crash between staging
    and MERGE never double-stages (requires an ``ingest_batch BIGINT``
    column on staging)."""
    run_sql(
        deltas.sparkSession,
        url,
        f"DELETE FROM {staging} WHERE ingest_batch = {int(batch_id)}",
    )
    (
        deltas.withColumn("ingest_batch", F.lit(int(batch_id)))
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("batchsize", str(batchsize))
        .options(**options)
        .mode("append")
        .save()
    )


def merge_supply_upsert(
    spark: SparkSession,
    url: str,
    staging: str,
    target: str,
    batch_id: int | None = None,
    ledger: str | None = None,
) -> None:
    """The reference's arithmetic upsert (main.rs:222-251: ``ON CONFLICT
    (idx, subidx, token_id) DO UPDATE SET total_supply = total_supply +
    delta``) as ANSI MERGE from a staging table — the portable spelling
    (Derby/Postgres 15+/Delta all accept it). Call per micro-batch after
    :func:`stage_supply_deltas`; the MERGE is O(|staging|) server-side
    work against the target's primary key.

    Source of the MERGE is the per-key AGGREGATED side table
    ``{staging}_agg``, refilled from staging inside the same transaction:
    staging may legitimately hold more than one batch's rows for a key
    after a crash between staging and merge, ANSI MERGE forbids multiple
    source rows matching one target row, and Derby additionally rejects
    aggregates anywhere in the MERGE source (even via a view) — so the
    aggregation must be materialized first. All statements share one
    transaction, so the refill+merge+drain is atomic.

    Replay idempotence (the full at-least-once story, not just the
    MERGE+DELETE atomicity): pass ``batch_id`` and an applied-batch
    ``ledger`` table (``batch_id BIGINT PRIMARY KEY``). The ledger INSERT
    is the FIRST statement of the same transaction as the MERGE and IS
    the dedup point: a replayed (or concurrent — two deliveries serialize
    on the PK) call hits the primary-key violation, the transaction rolls
    back having applied nothing, and the call only clears its re-staged
    rows — the deltas were provably applied by the committed twin. (A
    SELECT-probe-then-merge spelling would leave a window where two
    concurrent deliveries both read 'not applied' and double-apply.)
    Without these arguments the call is the bare transactional MERGE
    (caller owns replay semantics)."""
    # The inner GROUP BY collapses accidental duplicate stagings: the
    # staging contract is one row per (key, ingest_batch) — deltas are
    # pre-aggregated per batch before staging — so two rows for one
    # (key, batch) can only be two deliveries of the SAME delta racing
    # through stage_supply_deltas' delete+append (which are separate
    # transactions). MAX keeps exactly one copy per (key, batch); the
    # outer SUM then legitimately accumulates across distinct crashed
    # batches left behind by stage->merge failures. The contract itself
    # is ENFORCED, not assumed (r6 ADVICE): two DIFFERENT values for one
    # (key, batch) trip the CASE's divide-by-zero inside the SAME
    # transaction — caught below and re-raised with the contract message
    # — instead of MAX silently keeping the larger delta. (/1 on the
    # legal path is BIGINT-exact; an in-txn arithmetic fault is the one
    # portable way to make a SQL statement assert, with no TOCTOU window
    # a separate pre-check SELECT would leave.)
    refill = (
        f"DELETE FROM {staging}_agg",
        f"INSERT INTO {staging}_agg SELECT idx, subidx, token_id, "
        f"SUM(total_supply) FROM ("
        f"SELECT idx, subidx, token_id, ingest_batch, "
        # the assertion divides the CONSTANT 1, never MAX(): division is
        # strict, so NULL / 0 (an all-NULL group) would return NULL
        # silently instead of raising — the constant numerator keeps the
        # divide-by-zero loud for both holes (a NULL alongside a value,
        # and an all-NULL group)
        f"MAX(total_supply) * (1 / (CASE WHEN "
        f"COUNT(DISTINCT total_supply) = 1 "
        f"AND COUNT(*) = COUNT(total_supply) "
        f"THEN 1 ELSE 0 END)) AS total_supply FROM {staging} "
        f"GROUP BY idx, subidx, token_id, ingest_batch"
        f") s GROUP BY idx, subidx, token_id",
    )
    merge = f"""
MERGE INTO {target} t USING {staging}_agg s
ON t.idx = s.idx AND t.subidx = s.subidx AND t.token_id = s.token_id
WHEN MATCHED THEN UPDATE SET t.total_supply = t.total_supply + s.total_supply
WHEN NOT MATCHED THEN INSERT (idx, subidx, token_id, total_supply)
VALUES (s.idx, s.subidx, s.token_id, s.total_supply)
"""
    drain = (f"DELETE FROM {staging}", f"DELETE FROM {staging}_agg")
    if batch_id is None or ledger is None:
        try:
            run_sql(spark, url, *refill, merge, *drain)
        except Exception as ex:
            _reraise_staging_contract(staging, ex)
            raise
        return
    try:
        run_sql(
            spark,
            url,
            f"INSERT INTO {ledger} VALUES ({int(batch_id)})",
            *refill,
            merge,
            *drain,
        )
    except Exception as ex:
        _reraise_staging_contract(staging, ex)
        if not _is_duplicate_key(ex):
            raise
        # replay of an already-applied batch: the ledger PK refused the
        # insert and the whole transaction rolled back — the deltas are
        # in the target; drop the re-staged copy and do nothing else
        run_sql(
            spark, url, f"DELETE FROM {staging} WHERE ingest_batch = {int(batch_id)}"
        )


def _reraise_staging_contract(staging: str, ex: Exception) -> None:
    """Translate the refill's in-transaction divide-by-zero assertion
    (SQLState 22012; the only division in the statement set) into the
    contract error it encodes — the transaction has already rolled back,
    nothing was applied."""
    s = str(ex).lower()
    # Derby/py4j surface the SQLState; Postgres' PSQLException message
    # carries neither the state nor Derby's wording — it spells the
    # fault "division by zero", so match all three.
    if "22012" in s or "divide by zero" in s or "division by zero" in s:
        raise RuntimeError(
            f"supply staging contract violated: {staging} holds two "
            f"DIFFERENT total_supply values (or a NULL) for one (idx, "
            f"subidx, token_id, ingest_batch) — duplicate stagings of a "
            f"batch must be byte-identical non-NULL replays; refusing "
            f"to merge (MAX would silently drop one delta). Nothing "
            f"was applied."
        ) from ex


def _is_duplicate_key(ex: Exception) -> bool:
    """Recognize a unique/PK violation across JDBC backends: SQLState
    23505 (Derby, Postgres) or the message spelling."""
    s = str(ex)
    return "23505" in s or "duplicate key" in s.lower()


def create_supply_schema(
    spark: SparkSession, url: str, staging: str, target: str, ledger: str
) -> None:
    """DDL for the upsert trio: target (PK on the token key), batch-keyed
    staging + its per-key aggregation view (the MERGE source), and the
    applied-batch ledger."""
    run_sql(
        spark,
        url,
        f"CREATE TABLE {target} (idx BIGINT, subidx BIGINT, "
        "token_id VARCHAR(32), total_supply BIGINT, "
        "PRIMARY KEY (idx, subidx, token_id))",
        f"CREATE TABLE {staging} (idx BIGINT, subidx BIGINT, "
        "token_id VARCHAR(32), total_supply BIGINT, ingest_batch BIGINT)",
        f"CREATE TABLE {staging}_agg (idx BIGINT, subidx BIGINT, "
        "token_id VARCHAR(32), total_supply BIGINT)",
        f"CREATE TABLE {ledger} (batch_id BIGINT PRIMARY KEY)",
    )
