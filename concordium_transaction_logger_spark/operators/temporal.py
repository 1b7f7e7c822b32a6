"""Temporal join operators — as-of join and banded range join over the
event feed.

The reference has **no** as-of/range/interval joins (SURVEY §2.12 explicit
absences — verified against wallet-proxy-indexer/src/postgres.rs:89-189,
the whole query surface). These are §7-phase-4 extension operators every
log-analytics / training-data pipeline needs: attribute a conversion to the
last touch before it; collect the activity burst that follows an error.

Both are implemented as compositions of equi-joins + windows — never a
non-equi join node, which Spark can only execute as BroadcastNestedLoop
(quadratic, and the broadcast side is a fact table at 100 TB):

- **as-of join**: union both sides into one (key, time)-sorted stream and
  carry the most recent right-side row forward with
  ``last(right, ignorenulls)`` — one shuffle (the window's key
  partitioning), linear per-key state, exactly the merge-scan a
  time-series engine does. Right rows sort *before* left rows at equal
  timestamps, giving ``left.t >= right.t`` (at-or-before) semantics.
- **banded range join**: quantize time to the window width W; a follower
  in ``(t, t+W]`` lives in bucket ``t DIV W`` or ``t DIV W + 1``, so the
  probe side explodes to those two buckets and the join becomes an EQUI
  join on (key, bucket) + residual range filter. Candidate count is
  bounded by per-bucket co-occupancy instead of |left|·|right|; hot
  (key, bucket) cells are split by AQE skew-join. Each follower carries
  one bucket, so a (probe, follower) pair matches at most once — no
  post-join dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..ingest.derive import block_feed


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return block_feed(spark, sf_dir).select(
        "event_id", "ts_ms", "user_id", "event_type"
    )


def asof_last_touch(
    spark: SparkSession,
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """For each ``left_type`` event, the most recent ``right_type`` event
    by the same user at-or-before it (LEFT as-of: unmatched rows keep NULL
    match columns). Equivalent to DuckDB's ``ASOF LEFT JOIN`` on
    ``user_id`` with ``l.ts_ms >= r.ts_ms``.

    Plan shape: one shuffle (window partition by user); the carry columns
    are ``last(..., ignorenulls)`` over rows-unbounded-preceding — linear
    scan per user, no join node at all.
    """
    ev = _events(spark, sf_dir)
    tagged = ev.filter(F.col("event_type").isin(left_type, right_type)).withColumn(
        "side", F.when(F.col("event_type") == right_type, F.lit(0)).otherwise(F.lit(1))
    )
    # Right side sorts first at equal ts_ms => ">=" (at-or-before) match;
    # event_id tiebreak keeps the carry deterministic under any
    # partitioning (SURVEY §7 hard part 2).
    w = Window.partitionBy("user_id").orderBy("ts_ms", "side", "event_id")
    right_id = F.when(F.col("side") == 0, F.col("event_id"))
    right_ts = F.when(F.col("side") == 0, F.col("ts_ms"))
    carried = tagged.select(
        "*",
        F.last(right_id, ignorenulls=True).over(w).alias("matched_event_id"),
        F.last(right_ts, ignorenulls=True).over(w).alias("matched_ts_ms"),
    )
    return (
        carried.filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            "matched_event_id",
            "matched_ts_ms",
            (F.col("ts_ms") - F.col("matched_ts_ms")).alias("gap_ms"),
        )
        .orderBy("event_id")
    )


def error_followup_burst(
    spark: SparkSession, sf_dir: str, window_ms: int = 300_000
) -> DataFrame:
    """For each 'error' event (the reference's *special outcome* branch,
    main.rs:368-396): how many events the same user produced in the
    following ``window_ms`` — the range join ``f.ts_ms IN (e.ts_ms,
    e.ts_ms + W]`` executed as a banded equi-join (see module docstring).
    Errors with no follow-up are kept with ``n_follow = 0``.
    """
    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts_ms"
    )
    bucket = F.expr(f"ts_ms DIV {window_ms}")
    followers = ev.select(
        F.col("user_id"),
        F.col("ts_ms").alias("f_ts_ms"),
        bucket.alias("bucket"),
    )
    probe = errors.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    hits = probe.join(followers, ["user_id", "bucket"]).filter(
        (F.col("f_ts_ms") > F.col("ts_ms"))
        & (F.col("f_ts_ms") <= F.col("ts_ms") + window_ms)
    )
    counts = hits.groupBy("event_id").agg(F.count("*").alias("n_follow"))
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts_ms",
            F.coalesce(F.col("n_follow"), F.lit(0)).cast("long").alias("n_follow"),
        )
        .orderBy("event_id")
    )
