"""Streaming session windows: F.session_window gap sessionization must
match the batch lag-based computation, including sessions extended across
micro-batch boundaries (state carries, ST1 in-order arrival)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from concordium_transaction_logger_spark.sources.tables import load_table
from concordium_transaction_logger_spark.streaming.pipeline import (
    SessionWindowRollup,
    session_snapshot,
)

GAP_MS = 30 * 60 * 1000


@pytest.fixture()
def dirs(tmp_path):
    return {
        "source": str(tmp_path / "source"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
        "tmp": tmp_path,
    }


def _batch_sessions(spark, sf_dir):
    """Lag-based gap sessionization (the batch twin). Session end follows
    session_window semantics: last event time + gap."""
    evt = load_table(spark, sf_dir, "events").select(
        F.expr("ts DIV 1000000").alias("ts_ms"), "user_id", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = evt.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > GAP_MS),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_sess").over(w))
    rows = (
        marked.groupBy("user_id", "sid")
        .agg(
            F.min("ts_ms").alias("session_start_ms"),
            (F.max("ts_ms") + GAP_MS).alias("session_end_ms"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start_ms", "session_end_ms", "n_events")
        .collect()
    )
    return sorted(tuple(r) for r in rows)


def test_session_windows_match_batch_across_batches(spark, sf_dir, dirs):
    events = load_table(spark, sf_dir, "events")
    # Stage in two files split by event TIME (the finalized feed is
    # time-ordered across arrivals), so sessions straddle the batch
    # boundary and must merge through the state store.
    mid = events.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    events.filter(F.col("ts") <= mid).coalesce(1).write.mode("append").parquet(
        dirs["source"]
    )
    events.filter(F.col("ts") > mid).coalesce(1).write.mode("append").parquet(
        dirs["source"]
    )

    SessionWindowRollup(
        spark, dirs["source"], dirs["out"], dirs["ckpt"], max_files_per_trigger=1
    ).run_available_now()

    got = sorted(tuple(r) for r in session_snapshot(spark, dirs["out"]).collect())

    # Append mode's contract: exactly the sessions the final watermark
    # (= max event time - disorder slack) has finalized; per-user tail
    # sessions stay open in the state store.
    max_ts_ms = events.agg(F.max(F.expr("ts DIV 1000000"))).first()[0]
    all_sessions = _batch_sessions(spark, sf_dir)
    wm = max_ts_ms - SessionWindowRollup.SLACK_MS
    finalized = [s for s in all_sessions if s[2] <= wm]
    assert got == finalized
    assert len(got) < len(all_sessions), "tail sessions must remain open"


def test_session_windows_disordered_replay_matches_batch(spark, sf_dir, dirs):
    """The append-mode hazard the slack dial exists for: a mid-timeline
    slice arriving AFTER the late slice. With a 0-second watermark those
    rows are older than the advanced watermark and are silently dropped —
    and the sessions they belong to having already been finalized, the
    emitted session set is wrong FOREVER (no update-mode rewrite). With
    ``slack_ms`` covering the disorder, the streaming session set equals
    the batch twin exactly. A far-future 'closer' event then pushes the
    watermark past every original session so the full set finalizes."""
    from stream_stage import stage_ordered_files

    events = load_table(spark, sf_dir, "events")
    t50, t75 = events.agg(
        F.expr("percentile_approx(ts, 0.5)"), F.expr("percentile_approx(ts, 0.75)")
    ).first()
    early = events.filter(F.col("ts") <= t50)
    mid = events.filter((F.col("ts") > t50) & (F.col("ts") <= t75))
    late = events.filter(F.col("ts") > t75)
    assert mid.count() > 0, "mid slice empty — disorder test is vacuous"

    max_ts_ms = events.agg(F.max(F.expr("ts DIV 1000000"))).first()[0]
    slack_ms = (max_ts_ms - t50 // 1_000_000) + 60_000
    closer_ts_ms = max_ts_ms + GAP_MS + slack_ms + 60_000
    closer = (
        events.limit(1)
        .withColumn("event_id", F.lit(10_000_000).cast("long"))
        .withColumn("ts", F.lit(closer_ts_ms * 1_000_000).cast("long"))
        .withColumn("user_id", F.lit(999_999).cast("long"))
    )
    # event-time order: early, mid, late.  Arrival order: early, LATE, MID.
    src = stage_ordered_files([early, late, mid, closer], dirs["tmp"])

    SessionWindowRollup(
        spark,
        src,
        dirs["out"],
        dirs["ckpt"],
        max_files_per_trigger=1,
        slack_ms=slack_ms,
    ).run_available_now()

    got = sorted(tuple(r) for r in session_snapshot(spark, dirs["out"]).collect())
    # every original session is finalized by the closer's watermark; only
    # the closer's own session remains open in the state store.
    assert got == _batch_sessions(spark, sf_dir)
