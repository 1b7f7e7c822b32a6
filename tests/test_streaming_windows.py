"""Windowed streaming rollup + tail-follow (ST1 watermark, ST9 monitor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concordium_transaction_logger_spark.operators.relational import event_type_hourly
from concordium_transaction_logger_spark.sources.tables import load_table
from concordium_transaction_logger_spark.streaming.pipeline import (
    StreamingIngest,
    WindowedRollup,
    tail_follow,
)


def test_windowed_rollup_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(src)

    roll = WindowedRollup(spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    roll.run_available_now()

    got = spark.read.parquet(str(tmp_path / "out")).select(
        "event_type",
        F.expr("window_start_ms DIV 3600000").alias("hour_bucket"),
        "n_events",
        "value_cents",
    )
    want = event_type_hourly(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_windowed_rollup_disordered_replay_matches_batch(spark, sf_dir, tmp_path):
    """Out-of-order file replay (mid slice arrives AFTER the late slice)
    must still produce the exact batch rollup when ``slack_ms`` covers the
    disorder — with the old 0-second watermark the mid slice's rows are
    older than the already-advanced watermark and get silently dropped,
    under-counting windows."""
    from stream_stage import stage_ordered_files

    events = load_table(spark, sf_dir, "events")
    t50, t75 = events.agg(
        F.expr("percentile_approx(ts, 0.5)"), F.expr("percentile_approx(ts, 0.75)")
    ).first()
    early = events.filter(F.col("ts") <= t50)
    mid = events.filter((F.col("ts") > t50) & (F.col("ts") <= t75))
    late = events.filter(F.col("ts") > t75)
    assert mid.count() > 0, "mid slice empty — disorder test is vacuous"
    # event-time order: early, mid, late.  Arrival order: early, LATE, MID.
    src = stage_ordered_files([early, late, mid], tmp_path)

    max_ts_ms = events.agg(F.max(F.expr("ts DIV 1000000"))).first()[0]
    slack_ms = (max_ts_ms - t50 // 1_000_000) + 60_000
    WindowedRollup(
        spark,
        src,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        slack_ms=slack_ms,
    ).run_available_now()

    got = spark.read.parquet(str(tmp_path / "out")).select(
        "event_type",
        F.expr("window_start_ms DIV 3600000").alias("hour_bucket"),
        "n_events",
        "value_cents",
    )
    want = event_type_hourly(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_tail_follow_sees_only_new_rows(spark, sf_dir, tmp_path):
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    events = load_table(spark, sf_dir, "events")
    n_users = events.agg(F.max("user_id")).first()[0] + 1
    events.coalesce(1).write.parquet(src)
    StreamingIngest(spark, src, out, ck, n_users).run_available_now()

    stream = tail_follow(spark, out, from_id=900)
    q = (
        stream.writeStream.format("memory")
        .queryName("tail")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT id FROM tail").collect()
    assert rows and all(r.id > 900 for r in rows)
    assert len(rows) == events.filter(F.col("event_id") > 900).count()


def test_streaming_anomaly_matches_batch_expectation(spark, sf_dir, tmp_path):
    """The alert stream equals the batch computation of the same
    time-banded trailing ratio over the rollup sink — and re-running the
    anomaly stream is a no-op (window-keyed overwrite = idempotent)."""
    from concordium_transaction_logger_spark.streaming.pipeline import (
        StreamingAnomaly,
    )

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").coalesce(1).write.parquet(src)
    roll_out = str(tmp_path / "roll")
    WindowedRollup(spark, src, roll_out, str(tmp_path / "ck1")).run_available_now()

    alert_out = str(tmp_path / "alerts")
    anom = StreamingAnomaly(
        spark, roll_out, alert_out, str(tmp_path / "ck2"), threshold_permille=1050
    )
    anom.run_available_now()
    got = sorted(
        map(
            tuple,
            spark.read.parquet(alert_out)
            .filter("alert")
            .select("event_type", "window_start_ms", "n_events", "ratio_permille")
            .collect(),
        )
    )

    roll = spark.read.parquet(roll_out).select(
        "event_type", "window_start_ms", "n_events"
    )
    h = roll.select(
        F.col("event_type").alias("h_type"),
        F.col("window_start_ms").alias("h_start"),
        F.col("n_events").alias("h_n"),
    )
    want_df = (
        roll.join(
            h,
            (F.col("h_type") == F.col("event_type"))
            & (F.col("h_start") >= F.col("window_start_ms") - StreamingAnomaly.TRAIL_MS)
            & (F.col("h_start") < F.col("window_start_ms")),
            "left",
        )
        .groupBy("event_type", "window_start_ms", "n_events")
        .agg(F.sum("h_n").alias("t_sum"), F.count("h_n").alias("t_cnt"))
        .select(
            "event_type",
            "window_start_ms",
            "n_events",
            # the engine's one integer rounding formula (mean_millis_expr)
            F.expr(
                "(2000 * n_events * t_cnt + t_sum) DIV (2 * t_sum)"
            )
            .cast("long")
            .alias("ratio_permille"),
        )
        .filter(F.col("ratio_permille") >= 1050)
    )
    want = sorted(map(tuple, want_df.collect()))
    assert want, "fixture produced no anomalies — lower the test threshold"
    assert got == want

    # idempotency: a second run over the same (fully-consumed) rollup
    # must not change the alert set.
    anom2 = StreamingAnomaly(
        spark, roll_out, alert_out, str(tmp_path / "ck3"), threshold_permille=1050
    )
    anom2.run_available_now()
    again = sorted(
        map(
            tuple,
            spark.read.parquet(alert_out)
            .filter("alert")
            .select("event_type", "window_start_ms", "n_events", "ratio_permille")
            .collect(),
        )
    )
    assert again == want
