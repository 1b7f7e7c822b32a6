"""Semantic unit tests for the reference query surface: keyset pagination,
sentinel defaults, limits, physical-plan shape (SURVEY §2.3-2.6, §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concordium_transaction_logger_spark.operators import queries as q
from concordium_transaction_logger_spark.plans import layout


def test_descending_default_sentinel_is_max(spark, sf_dir):
    """postgres.rs:315-324: Descending without start ≙ start=i64::MAX."""
    explicit = q.query_account(spark, sf_dir, 7, limit=5, descending=True, start=q.I64_MAX)
    default = q.query_account(spark, sf_dir, 7, limit=5, descending=True)
    assert [r.ati_id for r in explicit.collect()] == [r.ati_id for r in default.collect()]


def test_keyset_pagination_walks_without_overlap(spark, sf_dir):
    """Page 2 starts after page 1's last id (the README:115-120 pattern)."""
    page1 = q.query_account(spark, sf_dir, 7, limit=5, descending=True).collect()
    assert len(page1) == 5
    next_start = page1[-1].ati_id - 1
    page2 = q.query_account(
        spark, sf_dir, 7, limit=5, descending=True, start=next_start
    ).collect()
    ids1 = {r.ati_id for r in page1}
    ids2 = {r.ati_id for r in page2}
    assert not ids1 & ids2
    assert max(ids2) < min(ids1)


def test_ascending_vs_descending_orders(spark, sf_dir):
    asc = q.query_account(spark, sf_dir, 12, limit=10).collect()
    desc = q.query_account(spark, sf_dir, 12, limit=10, descending=True).collect()
    assert [r.ati_id for r in asc] == sorted(r.ati_id for r in asc)
    assert [r.ati_id for r in desc] == sorted((r.ati_id for r in desc), reverse=True)


def test_iterate_equals_unlimited_query(spark, sf_dir):
    """postgres.rs:365-374: iterate_account == ascending, limit i64::MAX."""
    it = q.iterate_account(spark, sf_dir, 12).collect()
    unlimited = q.query_account(spark, sf_dir, 12, limit=None).collect()
    assert [r.ati_id for r in it] == [r.ati_id for r in unlimited]


def test_incoming_excludes_own_sends(spark, sf_dir):
    rows = q.incoming_transactions(spark, sf_dir, 7, limit=100)
    feed_rows = rows.collect()
    assert all(
        ("special" in r.summary) or ('"type":"purchase"' in r.summary and r.id * 4 != r.ati_id)
        for r in feed_rows
    ), "every incoming row is a protocol event or someone else's send"


def test_point_lookup_plan_shape(spark, sf_dir):
    """The bounded account lookup must broadcast the keyset (no fact-table
    shuffle join) — the 100 TB point-query design."""
    df = q.query_account(spark, sf_dir, 7, limit=20, descending=True)
    assert layout.uses_broadcast_join(df)


def test_resume_offset_is_top_k(spark, sf_dir):
    df = q.resume_offset(spark, sf_dir)
    assert layout.uses_top_k(df)
    (row,) = df.collect()
    assert row.height >= 0


def test_wide_sum_beyond_decimal38_matches_python_int_oracle(spark):
    """NUMERIC(80,0) batch fidelity (m0001-initial.sql:39): the limb-summed
    wide path must agree with exact Python-int arithmetic on amounts up to
    79 digits, through sign changes and cancellation — the regime where
    both int64 and DECIMAL(38,0) overflow and DuckDB has no oracle."""
    import random

    from concordium_transaction_logger_spark.ingest.derive import wide_sum

    random.seed(11)
    rows, expected = [], {}
    for grp in range(4):
        for _ in range(100):
            mag = random.randint(1, 10 ** random.randint(1, 79))
            v = mag if random.random() < 0.6 else -mag
            rows.append((grp, str(v)))
            expected[grp] = expected.get(grp, 0) + v
    # exact cancellation in one group: totals must render "0", not "-0"
    rows += [(9, "1" + "0" * 60), (9, "-1" + "0" * 60)]
    expected[9] = 0
    df = spark.createDataFrame(rows, "grp int, amt string")
    got = {r["grp"]: r["total_supply"] for r in wide_sum(df, ["grp"], "amt").collect()}
    assert got == {g: str(v) for g, v in expected.items()}
    assert any(len(v.lstrip("-")) > 38 for v in got.values())


def test_cis2_supply_wide_agrees_with_narrow_in_range(spark, sf_dir):
    """On cent-scale corpora the wide path is value-identical to the
    narrow BIGINT path — the fidelity upgrade changes representation,
    never in-range results."""
    narrow = {
        (r["idx"], r["subidx"], r["token_id"]): r["total_supply"]
        for r in q.cis2_supply(spark, sf_dir).collect()
    }
    wide = {
        (r["idx"], r["subidx"], r["token_id"]): r["total_supply"]
        for r in q.cis2_supply_wide(spark, sf_dir).collect()
    }
    assert narrow and wide.keys() == narrow.keys()
    assert all(wide[k] == str(narrow[k]) for k in narrow)


def test_wide_sum_refuses_over_capacity_amounts(spark):
    """An amount wider than the limb capacity must raise loudly, never
    silently truncate."""
    import pytest

    from concordium_transaction_logger_spark.ingest.derive import wide_sum

    df = spark.createDataFrame([(1, "1" + "0" * 95)], "grp int, amt string")
    with pytest.raises(Exception, match="capacity"):
        wide_sum(df, ["grp"], "amt").collect()


def test_ntz_epoch_anchoring_is_session_tz_independent(spark):
    """_ntz_epoch_ms must not move when the session timezone does: a
    foreign driver session can pin a non-UTC zone that apply_runtime_confs
    cannot override, and the naive cast('timestamp') interprets the NTZ
    wall-clock in that zone — the divergence this helper exists to
    prevent."""
    from pyspark.sql import functions as F

    from concordium_transaction_logger_spark.operators import relational

    df = spark.createDataFrame([("2024-06-01 12:00:00",)], "s string").select(
        F.col("s").cast("timestamp_ntz").alias("ts")
    )
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_ms = df.select(
            relational._ntz_epoch_ms(F.col("ts")).alias("ms")
        ).first().ms
        cast_utc = df.select(
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")
        ).first().ms
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny_ms = df.select(
            relational._ntz_epoch_ms(F.col("ts")).alias("ms")
        ).first().ms
        cast_ny = df.select(
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")
        ).first().ms
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    assert utc_ms == ny_ms == cast_utc  # anchored, and == the UTC cast
    assert cast_ny != cast_utc  # the naive cast DOES shift — the fixed bug


def test_zorder_manifest_partitions_rows_and_bounds_both_dimensions(spark, sf_dir):
    """The point of the Morton layout: every shard's bounding box is
    tight in BOTH dimensions simultaneously. With shards split on the
    top 6 interleaved bits (y x y x y x), each shard is an 8x8-bucket
    grid cell of the normalized (user, time) plane, so each shard's
    user span AND time span must be at most ~1/8 of the global span
    (asserted at the loose 1/4 to stay robust to rounding at the cell
    edges) — a single-column sort can only ever bound one of the two.
    The shards also exactly partition the rows."""
    from concordium_transaction_logger_spark.operators.relational import (
        event_zorder_manifest,
    )
    from concordium_transaction_logger_spark.sources.tables import load_table

    man = event_zorder_manifest(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts DIV 1000000000").alias("ts_s")
    )
    g = ev.agg(
        F.count("*").alias("n"),
        (F.max("user_id") - F.min("user_id")).alias("uspan"),
        (F.max("ts_s") - F.min("ts_s")).alias("tspan"),
    ).first()
    assert sum(r.n_events for r in man) == g.n
    assert all(r.user_span <= g.uspan // 4 + 1 for r in man), [
        (r.shard, r.user_span) for r in man if r.user_span > g.uspan // 4 + 1
    ]
    assert all(r.ts_span_s <= g.tspan // 4 + 1 for r in man), [
        (r.shard, r.ts_span_s) for r in man if r.ts_span_s > g.tspan // 4 + 1
    ]
    assert all(r.n_users <= r.user_span + 1 for r in man)
