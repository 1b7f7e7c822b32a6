"""The JDBC write path executed against a REAL database (embedded Derby,
bundled with Spark): K4 bulk batched insert, partitioned JDBC read-back,
and the M2 arithmetic-merge upsert (main.rs:222-251) accumulating across
micro-batches. Production swaps the url/driver for Postgres; the plans
and SQL are unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concordium_transaction_logger_spark.ingest import derive
from concordium_transaction_logger_spark.sources import jdbc
from concordium_transaction_logger_spark.sources.tables import load_table


@pytest.fixture()
def derby_url(spark, tmp_path):
    # keep derby.log out of the repo root
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_bulk_insert_and_partitioned_read_roundtrip(spark, sf_dir, derby_url):
    """K4: the 1000-row batched append (m0002:56,107-117 multi-VALUES
    bulk insert) against a live connection, then the partitioned JDBC
    read (S5) splitting the scan on the monotone id."""
    feed = derive.block_feed(spark, sf_dir)
    ati = derive.ati(feed).select("id", "account", "summary")
    jdbc.run_sql(
        spark,
        derby_url,
        "CREATE TABLE ati (id BIGINT PRIMARY KEY, account BIGINT, summary BIGINT)",
    )
    (
        ati.write.format("jdbc")
        .option("url", derby_url)
        .option("driver", jdbc.DERBY_DRIVER)
        .option("dbtable", "ati")
        .option("batchsize", str(jdbc.DEFAULT_BATCH_SIZE))
        .mode("append")
        .save()
    )
    hi = ati.agg(F.max("id")).first()[0]
    back = jdbc.read_jdbc(
        spark,
        derby_url,
        "ati",
        partition_column="id",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
        driver=jdbc.DERBY_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    cols = ["id", "account", "summary"]
    assert _sorted_rows(back, cols) == _sorted_rows(ati, cols)


def test_merge_upsert_accumulates_across_batches(spark, sf_dir, derby_url):
    """M2: two micro-batches of per-key supply deltas staged and MERGEd;
    the target's running totals must equal the one-shot batch aggregation
    — i.e. the server-side ``total_supply = total_supply + delta``
    arithmetic really executed, twice, against live state."""
    jdbc.run_sql(
        spark,
        derby_url,
        "CREATE TABLE supply (idx BIGINT, subidx BIGINT, token_id VARCHAR(32), "
        "total_supply BIGINT, PRIMARY KEY (idx, subidx, token_id))",
        "CREATE TABLE supply_staging (idx BIGINT, subidx BIGINT, "
        "token_id VARCHAR(32), total_supply BIGINT)",
    )
    events = load_table(spark, sf_dir, "events")
    n_users = events.agg(F.max("user_id")).first()[0] + 1
    mid = events.agg(F.max("event_id")).first()[0] // 2
    halves = [
        events.filter(F.col("event_id") <= mid),
        events.filter(F.col("event_id") > mid),
    ]
    for half in halves:
        feed = derive.feed_from_events(half, n_users=n_users)
        deltas = (
            derive.cis2_events(feed)
            .groupBy("idx", "subidx", "token_id")
            .agg(F.sum("amount").alias("total_supply"))
        )
        (
            deltas.write.format("jdbc")
            .option("url", derby_url)
            .option("driver", jdbc.DERBY_DRIVER)
            .option("dbtable", "supply_staging")
            .option("batchsize", str(jdbc.DEFAULT_BATCH_SIZE))
            .mode("append")
            .save()
        )
        jdbc.merge_supply_upsert(spark, derby_url, "supply_staging", "supply")

    got = jdbc.read_jdbc(spark, derby_url, "supply", driver=jdbc.DERBY_DRIVER)
    want = derive.cis2_tokens(derive.block_feed(spark, sf_dir))
    cols = ["idx", "subidx", "token_id", "total_supply"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)
    # staging was drained by the merge helper (per-batch contract)
    assert (
        jdbc.read_jdbc(
            spark, derby_url, "supply_staging", driver=jdbc.DERBY_DRIVER
        ).count()
        == 0
    )


def test_run_sql_is_one_transaction(spark, derby_url):
    """A failing statement rolls back every earlier statement of the same
    run_sql call — the contract merge_supply_upsert relies on: a crash
    between MERGE and the staging DELETE must apply neither, else the
    per-micro-batch retry re-MERGEs the same staging rows and
    double-counts total_supply (the reference's ON CONFLICT upsert runs
    inside the block transaction, main.rs:545-574)."""
    jdbc.run_sql(spark, derby_url, "CREATE TABLE tx_probe (x BIGINT)")
    with pytest.raises(Exception):
        jdbc.run_sql(
            spark,
            derby_url,
            "INSERT INTO tx_probe VALUES (1)",
            "THIS IS NOT SQL",
        )
    n = jdbc.read_jdbc(spark, derby_url, "tx_probe", driver=jdbc.DERBY_DRIVER).count()
    assert n == 0, "failed call must leave no partial effects"
