"""Invariant tests from the reference's documented guarantees
(SURVEY §5: ordering, id monotonicity, FK closure, supply arithmetic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concordium_transaction_logger_spark.ingest import derive


def test_ids_strictly_increasing_in_block_order(spark, sf_dir):
    """README.md:99-101: ids strictly increase in (height, tx_index) order;
    gaps allowed."""
    feed = derive.block_feed(spark, sf_dir)
    s = derive.summaries(feed).select("id", "height").collect()
    ordered = sorted(s, key=lambda r: r.id)
    heights = [r.height for r in ordered]
    assert heights == sorted(heights)
    ids = [r.id for r in ordered]
    assert len(ids) == len(set(ids))


def test_ati_fk_closure(spark, sf_dir):
    """Every ati/cti row references an existing summary (FK, m0001:17,29)."""
    feed = derive.block_feed(spark, sf_dir)
    s = derive.summaries(feed).select(F.col("id").alias("sid"))
    for idx_df in (derive.ati(feed), derive.cti(feed)):
        orphans = idx_df.join(s, idx_df["summary"] == s.sid, "left_anti")
        assert orphans.count() == 0


def test_supply_equals_mint_minus_burn(spark, sf_dir):
    feed = derive.block_feed(spark, sf_dir)
    ev = derive.cis2_events(feed)
    mint = ev.filter(F.col("amount") > 0).agg(F.sum("amount")).first()[0] or 0
    burn = ev.filter(F.col("amount") < 0).agg(F.sum("amount")).first()[0] or 0
    total = derive.cis2_tokens(feed).agg(F.sum("total_supply")).first()[0]
    assert int(total) == mint + burn


def test_counterparty_never_self(spark, sf_dir):
    feed = derive.block_feed(spark, sf_dir)
    cp = feed.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id", derive.counterparty().alias("cp")
    )
    assert cp.filter(F.col("cp") == F.col("user_id")).count() == 0


def test_bindings_latest_wins(spark, sf_dir):
    """One row per address, and it is the most recent signup's row."""
    feed = derive.block_feed(spark, sf_dir)
    latest = derive.key_bindings(feed)
    per_addr = latest.groupBy("address").count().filter("count > 1")
    assert per_addr.count() == 0

    all_b = derive.key_bindings_all(feed)
    expected = (
        all_b.groupBy("address").agg(F.max("event_id").alias("event_id"))
        .join(all_b, ["address", "event_id"])
        .drop("event_id")
    )
    assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, expected.collect()))
