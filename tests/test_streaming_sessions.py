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
    # (= max event time) has finalized; per-user tail sessions stay open
    # in the state store.
    max_ts_ms = events.agg(F.max(F.expr("ts DIV 1000000"))).first()[0]
    all_sessions = _batch_sessions(spark, sf_dir)
    finalized = [s for s in all_sessions if s[2] <= max_ts_ms]
    assert got == finalized
    assert len(got) < len(all_sessions), "tail sessions must remain open"
