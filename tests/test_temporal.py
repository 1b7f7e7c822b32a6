"""Temporal joins: as-of semantics, banded range-join semantics, and the
plan shapes that make them scale (no non-equi join node; one window
shuffle). Cross-engine value parity runs in test_oracle_parity via the
registry (DuckDB ASOF LEFT JOIN / inequality-join oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concordium_transaction_logger_spark.ingest.derive import block_feed
from concordium_transaction_logger_spark.operators import temporal
from concordium_transaction_logger_spark.plans import layout


def test_asof_matches_bruteforce(spark, sf_dir):
    """Every matched click is the max click ts_ms <= the purchase ts_ms
    for that user; purchases with no prior click carry NULLs."""
    got = temporal.asof_last_touch(spark, sf_dir)
    ev = block_feed(spark, sf_dir).select("event_id", "ts_ms", "user_id", "event_type")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts_ms").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts_ms").alias("c_ts")
    )
    expect = (
        p.join(c, [p.user_id == c.user_id, F.col("c_ts") <= F.col("p_ts")], "left")
        .groupBy("event_id")
        .agg(F.max("c_ts").alias("want_ts"))
    )
    joined = got.join(expect, "event_id", "left").collect()
    assert len(joined) > 0
    for r in joined:
        assert r.matched_ts_ms == r.want_ts, r
        if r.matched_ts_ms is not None:
            assert r.gap_ms == r.ts_ms - r.matched_ts_ms


def test_asof_plan_is_window_not_join(spark, sf_dir):
    plan = layout.explain_str(temporal.asof_last_touch(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" not in plan, "as-of is a union+window carry, not a join node"
    assert "Window" in plan


def test_burst_matches_bruteforce(spark, sf_dir):
    got = {r.event_id: r.n_follow for r in temporal.error_followup_burst(spark, sf_dir).collect()}
    ev = block_feed(spark, sf_dir).select("event_id", "ts_ms", "user_id", "event_type")
    e = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts_ms").alias("e_ts")
    )
    f = ev.select(F.col("user_id"), F.col("ts_ms").alias("f_ts"))
    expect = {
        r.event_id: r.n
        for r in (
            e.join(
                f,
                [
                    e.user_id == f.user_id,
                    F.col("f_ts") > F.col("e_ts"),
                    F.col("f_ts") <= F.col("e_ts") + F.lit(300_000),
                ],
                "left",
            )
            .groupBy("event_id")
            .agg(F.count("f_ts").alias("n"))
            .collect()
        )
    }
    assert got == expect and len(got) > 0


def test_burst_plan_has_no_nested_loop(spark, sf_dir):
    """The banding rewrite must keep every join an equi-join — a
    BroadcastNestedLoopJoin here would be quadratic at 100 TB."""
    plan = layout.explain_str(temporal.error_followup_burst(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dfcap_drops_stop_shingles(spark, sf_dir):
    """The df-capped jaccard never produces pairs supported only by
    stop-shingles, and its pair set is a subset-or-equal reweighting of
    the uncapped candidates."""
    from concordium_transaction_logger_spark.operators import dedup

    capped = dedup.ngram_jaccard_pairs(spark, sf_dir, 0, max_df=1)
    # max_df=1: every shared shingle is by definition in >= 2 docs, so no
    # pairs can survive at all — the cap's limiting behavior.
    assert capped.count() == 0
