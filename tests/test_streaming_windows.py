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
