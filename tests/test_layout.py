"""Physical-layout tests: the reference's covering indexes as storage
layout (SURVEY §4, SCALE.md) — partition pruning for height predicates,
bucketing that satisfies the aggregation distribution without a shuffle,
and the salted-aggregation equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concordium_transaction_logger_spark.ingest import derive
from concordium_transaction_logger_spark.operators import queries as q
from concordium_transaction_logger_spark.plans import layout


def test_height_partitioning_prunes(spark, sf_dir, tmp_path):
    feed = derive.block_feed(spark, sf_dir)
    path = str(tmp_path / "summaries_part")
    layout.write_summaries_partitioned(derive.summaries(feed), path)

    df = spark.read.parquet(path).filter(F.col("height_bucket") == 0)
    plan = layout.explain_str(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "height_bucket" in pf[0], "height predicate must prune partitions"
    assert df.count() == derive.summaries(feed).count()  # sf small: all bucket 0


def test_bucketed_ati_aggregates_without_exchange(spark, sf_dir):
    feed = derive.block_feed(spark, sf_dir)
    layout.write_ati_bucketed(derive.ati(feed), "ati_bucketed_test", n_buckets=8)
    try:
        agg = (
            spark.table("ati_bucketed_test")
            .groupBy("account")
            .agg(F.count("*").alias("n"))
        )
        plan = layout.explain_str(agg, "simple")
        assert "Exchange" not in plan, "bucket layout must satisfy the distribution"
        assert agg.count() == derive.ati(feed).select("account").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS ati_bucketed_test")


def test_bucketed_fk_join_has_zero_exchanges(spark, sf_dir):
    """SCALE.md: the J1 index→fact join over the co-located bucketed
    layout must plan as a sort-merge join with no Exchange on either side
    (each task reads bucket i of both tables) — the at-rest analog of the
    reference's PK/FK covering indexes for the unbounded iterate path."""
    feed = derive.block_feed(spark, sf_dir)
    layout.write_fk_bucketed(
        derive.ati(feed),
        derive.summaries(feed),
        "ati_fk_test",
        "summaries_fk_test",
        n_buckets=8,
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ati_t = spark.table("ati_fk_test")
        summ_t = spark.table("summaries_fk_test")
        joined = ati_t.join(summ_t, ati_t["summary"] == summ_t["id"])
        plan = layout.explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed layout must co-locate the FK join"
        assert joined.count() == derive.ati(feed).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS ati_fk_test")
        spark.sql("DROP TABLE IF EXISTS summaries_fk_test")


def test_salted_activity_equals_unsalted(spark, sf_dir):
    plain = sorted(tuple(r) for r in q.account_activity(spark, sf_dir).collect())
    salted = sorted(
        tuple(r) for r in q.account_activity_salted(spark, sf_dir, 16).collect()
    )
    assert plain == salted


def test_account_point_query_prunes_to_one_bucket(spark, sf_dir):
    """The PK(account, id) analog end-to-end (m0001-initial.sql:18): the
    account equality predicate over the bucket-by-account layout must
    prune the scan to ONE bucket of 8 — visible as SelectedBucketsCount
    in the scan node — and the keyset top-k must plan as
    TakeOrderedAndProject, not a full sort. Plan captured in PLANS.md."""
    feed = derive.block_feed(spark, sf_dir)
    layout.write_ati_bucketed(derive.ati(feed), "ati_prune_test", n_buckets=8)
    try:
        df = layout.query_account_over_layout(spark, "ati_prune_test", 7, limit=20)
        plan = layout.explain_str(df)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert "TakeOrderedAndProject" in plan
        # served rows match the non-layout operator's ati keyset
        want = (
            derive.ati(feed)
            .filter(F.col("account") == 7)
            .orderBy(F.col("id").desc())
            .limit(20)
        )
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, want.collect()))

        # limit=None (the declared default): full sorted account history.
        # A global orderBy would plan an exchange and go adaptive (which
        # the pin guard rejects); the single pruned bucket makes a
        # partition-local sort the total order — assert the plan stays
        # non-adaptive, still prunes, and returns the rows IN id order.
        full = layout.query_account_over_layout(spark, "ati_prune_test", 7)
        fplan = layout.explain_str(full)
        assert "AdaptiveSparkPlan" not in fplan, fplan
        assert "SelectedBucketsCount: 1 out of 8" in fplan, fplan
        got_ids = [r["id"] for r in full.collect()]
        want_ids = [
            r["id"]
            for r in derive.ati(feed)
            .filter(F.col("account") == 7)
            .orderBy(F.col("id").desc())
            .collect()
        ]
        assert got_ids == want_ids, "partition-local sort must be the total order"

        # the guard fails LOUDLY when the bucketed scan is lost (the
        # no-limit path's ordering correctness depends on it; a local
        # sort adds no exchange, so adaptivity alone can't catch this)
        bkey = "spark.sql.sources.bucketing.enabled"
        bprior = spark.conf.get(bkey, "true")
        spark.conf.set(bkey, "false")
        try:
            with pytest.raises(AssertionError, match="bucket-pruned scan"):
                layout.query_account_over_layout(spark, "ati_prune_test", 7)
        finally:
            spark.conf.set(bkey, bprior)
    finally:
        spark.sql("DROP TABLE IF EXISTS ati_prune_test")


def test_aqe_splits_skewed_join_partitions(spark, sf_dir, tmp_path):
    """SCALE.md's skew dial, demonstrated: a join where one key owns ~90%
    of the fact rows plans as a sort-merge join whose skewed partition
    AQE splits at runtime (``isSkew=true`` / skew-join handling in the
    final adaptive plan), with results identical to the unskewed path."""
    from pyspark.sql import functions as F

    n = 40_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 97).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(97).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        f = spark.read.parquet(str(tmp_path / "fact"))
        d = spark.read.parquet(str(tmp_path / "dim"))
        # No same-key aggregation above the join: AQE declines to split a
        # skewed partition when the join output must stay hash-distributed
        # for a downstream stage (the documented OptimizeSkewedJoin rule) —
        # the demonstration is the join itself.
        joined = f.join(d, "k").select("k", "v", "w")
        rows = joined.collect()  # materialize THIS plan so AQE finalizes it
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan or "isSkew=true" in final_plan, final_plan[:2000]
        assert len(rows) == n  # every fact row matched exactly one dim row
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_enables_two_dimensional_file_pruning(spark, sf_dir, tmp_path):
    """End-to-end proof the Z-order layout op pays off at the storage
    layer: write events twice — once range-partitioned + sorted on the
    Morton key, once on event time alone — and read back the parquet
    FOOTER min/max stats per file (what any engine's scan pruning
    consults). Under the time-only layout every user appears in ~every
    file, so a user-equality scan prunes nothing; under the Z-layout
    the same predicate must prune at least half the files — while the
    time dimension stays prunable too (each file's time span bounded)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from concordium_transaction_logger_spark.operators.relational import (
        event_zorder_keys,
    )

    # three consumers below (one write + two aggregates): pin once
    keyed = event_zorder_keys(spark, sf_dir).localCheckpoint()
    n_files = 16
    zdir, tdir = str(tmp_path / "zorder"), str(tmp_path / "timesort")
    # the one-call write-path helper IS the layout under test
    layout.write_events_zordered(spark, sf_dir, zdir, n_files=n_files)
    (
        keyed.repartitionByRange(n_files, "ts_s")
        .sortWithinPartitions("ts_s")
        .write.mode("overwrite")
        .parquet(tdir)
    )

    def file_ranges(d, col):
        out = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            out.append((lo, hi))
        return out

    # Probe the MAX user: the sf0.01 corpus has only ~a dozen distinct
    # users, so mid-range users occupy most normalized buckets' files;
    # the extremal user pins the x bits of the Morton key, which must
    # confine it to the z ranges (files) whose x half-space matches —
    # a quarter-ish of the key space regardless of user cardinality.
    probe_user = keyed.agg(F.max("user_id")).first()[0]
    z_hits = [r for r in file_ranges(zdir, "user_id") if r[0] <= probe_user <= r[1]]
    t_hits = [r for r in file_ranges(tdir, "user_id") if r[0] <= probe_user <= r[1]]
    assert len(t_hits) >= n_files - 4, "time sort leaves user unprunable"
    assert len(z_hits) <= n_files // 2, (
        f"z-layout should prune at least half the files for one user, "
        f"hit {len(z_hits)}/{n_files}"
    )
    assert len(z_hits) < len(t_hits)
    # the time dimension stays bounded under the Z layout as well: the
    # median per-file time span is far under the global span
    g = keyed.agg((F.max("ts_s") - F.min("ts_s")).alias("span")).first().span
    spans = sorted(hi - lo for lo, hi in file_ranges(zdir, "ts_s"))
    assert spans[len(spans) // 2] <= g // 2


def test_zorder_normalization_survives_int64_overflow_scale(spark):
    """The r6-VERDICT overflow hazard (the PageRank defect class,
    graph.py:205): BIGINT ``(user_id - u0) * 65535`` overflows once the
    id span exceeds 2**47 — hashed/snowflake 64-bit ids, the 100 TB id
    shape — and ``u1 - u0`` itself overflows when ids straddle zero by
    more than 2**63. The DECIMAL(30,0) normalization must survive the
    FULL int64 domain: ids at both extremes, plus a mid point whose
    normalized bucket is checked against exact Python bignum division."""
    from concordium_transaction_logger_spark.operators.relational import (
        ZORDER_BITS,
        zorder_keys_frame,
    )

    lo, hi, mid = -(2**63), 2**63 - 1, 123_456_789
    ev = spark.createDataFrame(
        [(lo, 0), (mid, 500), (hi, 1000)], "user_id long, ts_s long"
    )
    got = {r.user_id: r.z for r in zorder_keys_frame(ev).collect()}
    top = (1 << ZORDER_BITS) - 1

    def interleave(zx, zy):
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((zx >> i) & 1) << (2 * i)
            z |= ((zy >> i) & 1) << (2 * i + 1)
        return z

    span_u, span_t = hi - lo, 1000  # Python bignums: the exact reference
    for uid, ts in [(lo, 0), (mid, 500), (hi, 1000)]:
        zx = (uid - lo) * top // span_u
        zy = (ts - 0) * top // span_t
        assert got[uid] == interleave(zx, zy)
    # extremes land at the corners of the normalized square
    assert got[lo] == 0
    assert got[hi] == interleave(top, top)


def test_compaction_can_zorder_the_folded_sink(spark, sf_dir, tmp_path):
    """Compaction-time re-clustering (r7 stretch): a streaming sink's
    per-batch arrival order clusters by ingest time only, so a
    user-equality scan touches ~every file; compact_sink(zorder_by=...)
    must fold the batches into a version directory whose parquet FOOTER
    min/max stats prune at least half the files on user_id while the
    time dimension stays bounded — and the manifest-aware read must
    still serve exactly the original rows."""
    import os

    import pyarrow.parquet as pq

    from concordium_transaction_logger_spark.sources.tables import load_table
    from concordium_transaction_logger_spark.streaming.pipeline import (
        _write_batch_partition,
        compact_sink,
        read_sink,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = str(tmp_path / "sink")
    for b in range(3):
        _write_batch_partition(
            ev.filter(F.col("event_id") % 3 == b), b, os.path.join(out, "events")
        )
    n_files = 16
    vdir = compact_sink(
        spark, out, "events", target_files=n_files, zorder_by=("user_id", "ts")
    )

    got = read_sink(spark, out, "events").drop("ingest_batch")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ev.collect())
    ), "re-clustering must not change the served rows"

    def file_ranges(d, col):
        out_ranges = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            idx = md.schema.names.index(col)
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            out_ranges.append((lo, hi))
        return out_ranges

    probe_user = ev.agg(F.max("user_id")).first()[0]
    ranges = file_ranges(vdir, "user_id")
    assert len(ranges) >= n_files // 2, "compaction must produce the file budget"
    hits = [r for r in ranges if r[0] <= probe_user <= r[1]]
    assert len(hits) <= len(ranges) // 2, (
        f"z-ordered compaction should prune at least half the files for "
        f"one user, hit {len(hits)}/{len(ranges)}"
    )
    g = ev.agg((F.max("ts") - F.min("ts")).alias("span")).first().span
    spans = sorted(hi - lo for lo, hi in file_ranges(vdir, "ts"))
    assert spans[len(spans) // 2] <= g // 2, "time must stay prunable too"
