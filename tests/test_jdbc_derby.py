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
    arithmetic really executed, twice, against live state. Then the
    at-least-once story: every crash window of the stage->merge pair is
    replayed and the totals must not move — double-staging before the
    merge (crash between stage and merge), and re-running stage+merge
    after the merge committed (crash before the checkpoint) — proving
    the batch-keyed staging delete and the applied-batch ledger do their
    jobs."""
    jdbc.create_supply_schema(
        spark, derby_url, "supply_staging", "supply", "supply_applied"
    )
    events = load_table(spark, sf_dir, "events")
    n_users = events.agg(F.max("user_id")).first()[0] + 1
    mid = events.agg(F.max("event_id")).first()[0] // 2
    halves = [
        events.filter(F.col("event_id") <= mid),
        events.filter(F.col("event_id") > mid),
    ]

    def deltas_for(half):
        feed = derive.feed_from_events(half, n_users=n_users)
        return (
            derive.cis2_events(feed)
            .groupBy("idx", "subidx", "token_id")
            .agg(F.sum("amount").alias("total_supply"))
        )

    for bid, half in enumerate(halves):
        d = deltas_for(half)
        jdbc.stage_supply_deltas(
            d, derby_url, "supply_staging", bid, driver=jdbc.DERBY_DRIVER
        )
        if bid == 1:
            # crash window 1: batch re-staged before the merge ran —
            # the batch-keyed delete must drop the first copy
            jdbc.stage_supply_deltas(
                d, derby_url, "supply_staging", bid, driver=jdbc.DERBY_DRIVER
            )
        jdbc.merge_supply_upsert(
            spark, derby_url, "supply_staging", "supply",
            batch_id=bid, ledger="supply_applied",
        )

    got = jdbc.read_jdbc(spark, derby_url, "supply", driver=jdbc.DERBY_DRIVER)
    want = derive.cis2_tokens(derive.block_feed(spark, sf_dir))
    cols = ["idx", "subidx", "token_id", "total_supply"]
    expect = _sorted_rows(want, cols)
    assert _sorted_rows(got, cols) == expect
    # staging was drained by the merge helper (per-batch contract)
    assert (
        jdbc.read_jdbc(
            spark, derby_url, "supply_staging", driver=jdbc.DERBY_DRIVER
        ).count()
        == 0
    )

    # crash window 2: the merge committed but the streaming checkpoint
    # didn't — the WHOLE batch replays (stage + merge). The ledger marks
    # it applied, so the replay clears its re-staged rows and totals stay.
    d = deltas_for(halves[1])
    jdbc.stage_supply_deltas(
        d, derby_url, "supply_staging", 1, driver=jdbc.DERBY_DRIVER
    )
    jdbc.merge_supply_upsert(
        spark, derby_url, "supply_staging", "supply",
        batch_id=1, ledger="supply_applied",
    )
    got2 = jdbc.read_jdbc(spark, derby_url, "supply", driver=jdbc.DERBY_DRIVER)
    assert _sorted_rows(got2, cols) == expect
    assert (
        jdbc.read_jdbc(
            spark, derby_url, "supply_staging", driver=jdbc.DERBY_DRIVER
        ).count()
        == 0
    )


def test_merge_upsert_concurrent_double_delivery(spark, sf_dir, derby_url):
    """Two CONCURRENT deliveries of one batch_id (the r5-verdict race:
    a probe-then-merge spelling would let both read 'not applied' and
    double-apply). The ledger INSERT is the first statement of the MERGE
    transaction, so the loser blocks on the winner's uncommitted PK row,
    gets the duplicate-key refusal when the winner commits, rolls back
    having applied nothing, and clears only its re-staged copy. End
    state: deltas applied exactly once, staging drained, one ledger row."""
    import threading

    jdbc.create_supply_schema(
        spark, derby_url, "supply_staging_c", "supply_c", "supply_applied_c"
    )
    feed = derive.block_feed(spark, sf_dir)
    deltas = (
        derive.cis2_events(feed)
        .groupBy("idx", "subidx", "token_id")
        .agg(F.sum("amount").alias("total_supply"))
    )
    # both deliveries stage the same batch (delete+append collapses them)
    for _ in range(2):
        jdbc.stage_supply_deltas(
            deltas, derby_url, "supply_staging_c", 0, driver=jdbc.DERBY_DRIVER
        )
    errs = []

    def deliver():
        try:
            jdbc.merge_supply_upsert(
                spark, derby_url, "supply_staging_c", "supply_c",
                batch_id=0, ledger="supply_applied_c",
            )
        except Exception as ex:  # pragma: no cover - failure detail
            errs.append(ex)

    threads = [threading.Thread(target=deliver) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = jdbc.read_jdbc(spark, derby_url, "supply_c", driver=jdbc.DERBY_DRIVER)
    cols = ["idx", "subidx", "token_id", "total_supply"]
    assert _sorted_rows(got, cols) == _sorted_rows(deltas, cols)
    assert (
        jdbc.read_jdbc(
            spark, derby_url, "supply_staging_c", driver=jdbc.DERBY_DRIVER
        ).count()
        == 0
    )
    assert (
        jdbc.query_scalar(spark, derby_url, "SELECT COUNT(*) FROM supply_applied_c")
        == 1
    )


def test_merge_upsert_collapses_racing_duplicate_staging(spark, sf_dir, derby_url):
    """The staging-side half of the concurrency story: two deliveries
    racing through stage_supply_deltas' delete+append (separate
    transactions) can leave a key's row staged TWICE for one
    ingest_batch. The refill collapses exact per-(key, batch) duplicates
    before summing across batches, so one MERGE applies the delta once —
    while a genuinely distinct crashed batch for the same key still
    accumulates."""
    jdbc.create_supply_schema(
        spark, derby_url, "supply_staging_r", "supply_r", "supply_applied_r"
    )
    jdbc.run_sql(
        spark,
        derby_url,
        # batch 0 staged twice for the same key (the interleaved race)...
        "INSERT INTO supply_staging_r VALUES (1, 0, 'tok', 70, 0)",
        "INSERT INTO supply_staging_r VALUES (1, 0, 'tok', 70, 0)",
        # ...plus a distinct crashed batch for the same key: must SUM
        "INSERT INTO supply_staging_r VALUES (1, 0, 'tok', 5, 1)",
    )
    jdbc.merge_supply_upsert(
        spark, derby_url, "supply_staging_r", "supply_r",
        batch_id=2, ledger="supply_applied_r",
    )
    assert (
        jdbc.query_scalar(
            spark, derby_url, "SELECT total_supply FROM supply_r WHERE idx = 1"
        )
        == 75
    )


def test_jdbc_batch_writer_replay_converges(spark, sf_dir, derby_url):
    """The foreachBatch JDBC writer's exactly-once contract: a replayed
    micro-batch (at-least-once delivery) deletes its own stamped rows
    before re-appending, so two deliveries of batch 7 land exactly one
    copy."""
    jdbc.run_sql(
        spark,
        derby_url,
        "CREATE TABLE ati_w (id BIGINT, account BIGINT, summary BIGINT, "
        "ingest_batch BIGINT)",
    )
    feed = derive.block_feed(spark, sf_dir)
    ati = derive.ati(feed).select("id", "account", "summary").limit(50)
    write = jdbc.jdbc_batch_writer(
        derby_url, lambda name: "ati_w", driver=jdbc.DERBY_DRIVER
    )
    write({"ati": ati}, 7)
    write({"ati": ati}, 7)  # replay
    back = jdbc.read_jdbc(spark, derby_url, "ati_w", driver=jdbc.DERBY_DRIVER)
    cols = ["id", "account", "summary"]
    assert _sorted_rows(back, cols) == _sorted_rows(ati, cols)
    assert back.filter(F.col("ingest_batch") == 7).count() == back.count()


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


def test_merge_refuses_conflicting_duplicate_stagings(spark, derby_url):
    """The r6-ADVICE silent-MAX hole: the staging contract says duplicate
    rows for one (key, ingest_batch) are byte-identical replay copies —
    if any path ever stages two DIFFERENT deltas for the same (key,
    batch), the merge must refuse loudly inside the transaction (nothing
    applied, ledger insert rolled back) instead of MAX silently keeping
    the larger value; equal duplicates must still collapse and merge."""
    jdbc.create_supply_schema(
        spark, derby_url, "supply_cv_stg", "supply_cv", "supply_cv_led"
    )
    jdbc.run_sql(
        spark,
        derby_url,
        "INSERT INTO supply_cv_stg VALUES (1, 0, 'tok', 100, 0)",
        "INSERT INTO supply_cv_stg VALUES (1, 0, 'tok', 250, 0)",
    )
    with pytest.raises(RuntimeError, match="staging contract violated"):
        jdbc.merge_supply_upsert(
            spark, derby_url, "supply_cv_stg", "supply_cv",
            batch_id=0, ledger="supply_cv_led",
        )
    # atomic refusal: no target rows, ledger insert rolled back,
    # staging intact for forensics
    assert jdbc.query_scalar(spark, derby_url, "SELECT COUNT(*) FROM supply_cv") == 0
    assert (
        jdbc.query_scalar(spark, derby_url, "SELECT COUNT(*) FROM supply_cv_led") == 0
    )
    assert (
        jdbc.query_scalar(spark, derby_url, "SELECT COUNT(*) FROM supply_cv_stg") == 2
    )
    # the legal shape — byte-identical duplicate staging — still merges
    jdbc.run_sql(
        spark,
        derby_url,
        "DELETE FROM supply_cv_stg",
        "INSERT INTO supply_cv_stg VALUES (1, 0, 'tok', 100, 0)",
        "INSERT INTO supply_cv_stg VALUES (1, 0, 'tok', 100, 0)",
    )
    jdbc.merge_supply_upsert(
        spark, derby_url, "supply_cv_stg", "supply_cv",
        batch_id=0, ledger="supply_cv_led",
    )
    assert (
        jdbc.query_scalar(
            spark, derby_url, "SELECT total_supply FROM supply_cv WHERE idx = 1"
        )
        == 100
    )


def test_merge_refuses_null_deltas(spark, derby_url):
    """The two NULL holes in the contract assertion (r7 review): a NULL
    delta alongside a real value passes COUNT(DISTINCT)=1 and MAX would
    silently drop it; an all-NULL group makes the old spelling evaluate
    NULL / 0, which strict SQL division returns as NULL without raising.
    Both must refuse loudly with the contract message, atomically."""
    jdbc.create_supply_schema(
        spark, derby_url, "supply_nv_stg", "supply_nv", "supply_nv_led"
    )
    # hole 1: NULL alongside a real value for one (key, batch)
    jdbc.run_sql(
        spark,
        derby_url,
        "INSERT INTO supply_nv_stg VALUES (1, 0, 'tok', NULL, 0)",
        "INSERT INTO supply_nv_stg VALUES (1, 0, 'tok', 100, 0)",
    )
    with pytest.raises(RuntimeError, match="staging contract violated"):
        jdbc.merge_supply_upsert(
            spark, derby_url, "supply_nv_stg", "supply_nv",
            batch_id=0, ledger="supply_nv_led",
        )
    assert jdbc.query_scalar(spark, derby_url, "SELECT COUNT(*) FROM supply_nv") == 0
    assert (
        jdbc.query_scalar(spark, derby_url, "SELECT COUNT(*) FROM supply_nv_led") == 0
    )
    # hole 2: an all-NULL group (the misreported divide-by-zero shape)
    jdbc.run_sql(
        spark,
        derby_url,
        "DELETE FROM supply_nv_stg",
        "INSERT INTO supply_nv_stg VALUES (2, 0, 'tok', NULL, 0)",
    )
    with pytest.raises(RuntimeError, match="staging contract violated"):
        jdbc.merge_supply_upsert(
            spark, derby_url, "supply_nv_stg", "supply_nv",
            batch_id=0, ledger="supply_nv_led",
        )
    assert jdbc.query_scalar(spark, derby_url, "SELECT COUNT(*) FROM supply_nv") == 0
