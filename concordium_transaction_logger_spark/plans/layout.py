"""Physical layout for the 100 TB deployment + plan-inspection helpers.

The reference's covering indexes (m0001:18,30,44; m0003:3-12) map to
*storage layout*, not runtime indexes (SURVEY §4):

- ``summaries``  -> partition by height range (``height DIV 1e5``); point
  queries and resume-offset prune to one partition.
- ``ati``        -> bucket by ``account`` and sort within buckets by
  ``id``: the account point query becomes a single-bucket scan with the
  keyset predicate applied on sorted data, and the FK join to summaries
  co-locates when summaries is bucketed by ``id``.
- ``cti``        -> bucket by ``(idx, subidx)``.
- hot accounts (exchange wallets) skew the ati shuffle — AQE skew-join
  handles the join side; for aggregations, salt with ``id % 16``.

Helpers below let tests assert what the optimizer actually did
(pushdown reached the scan, join was broadcast, top-k avoided full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Heights per summaries partition at full scale.
HEIGHT_BUCKET = 100_000


def write_summaries_partitioned(summaries: DataFrame, path: str) -> None:
    """Height-range partitioned layout (partition pruning for height/time
    predicates — the m0003 index analog)."""
    (
        summaries.withColumn("height_bucket", F.expr(f"height DIV {HEIGHT_BUCKET}"))
        .write.mode("overwrite")
        .partitionBy("height_bucket")
        .parquet(path)
    )


def write_events_zordered(
    spark: SparkSession, sf_dir: str, path: str, n_files: int = 64
) -> None:
    """Z-order (Morton-curve) layout rewrite of the events table — the
    `OPTIMIZE ZORDER BY (user_id, ts)` step as one call: the SAME key
    expressions the manifest query reports on
    (relational.event_zorder_keys — overflow-proof DECIMAL
    normalization, single-sourced bit interleave) feed
    ``repartitionByRange(z)`` + in-partition sort + write, so the
    manifest and the layout are literally one plan. After the rewrite a
    reader filtering on EITHER user_id OR a time range prunes most
    files via parquet footer min/max stats — proven end-to-end in
    ``tests/test_layout.py`` (two-dimensional pruning the one-column
    sorts can't give). ``n_files`` targets one file per range
    partition; at 100 TB you raise it to the cluster's write
    parallelism and nothing else changes."""
    from ..operators.relational import event_zorder_keys

    keyed = event_zorder_keys(spark, sf_dir)
    (
        keyed.repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_ati_bucketed(ati: DataFrame, table_name: str, n_buckets: int = 32) -> None:
    """Bucket-by-account, sort-by-id layout — the PK(account, id) analog
    (m0001-initial.sql:18). Readers joining or filtering on account skip
    the shuffle entirely."""
    (
        ati.write.mode("overwrite")
        .bucketBy(n_buckets, "account")
        .sortBy("id")
        .format("parquet")
        .saveAsTable(table_name)
    )


def write_fk_bucketed(
    ati: DataFrame,
    summaries: DataFrame,
    ati_table: str,
    summaries_table: str,
    n_buckets: int = 8,
) -> None:
    """Co-located FK join layout: both sides bucketed (and sorted) on the
    join key — ``ati.summary`` and ``summaries.id`` — with the same bucket
    count, so the J1 index→fact join runs as a sort-merge join with ZERO
    exchanges: each task reads bucket i of both tables. This is the
    at-rest analog of the reference's PK/FK indexes for the *unbounded*
    read path (``iterate_*``), where the bounded path's broadcast-keyset
    trick doesn't apply."""
    (
        ati.write.mode("overwrite")
        .bucketBy(n_buckets, "summary")
        .sortBy("summary")
        .format("parquet")
        .saveAsTable(ati_table)
    )
    (
        summaries.write.mode("overwrite")
        .bucketBy(n_buckets, "id")
        .sortBy("id")
        .format("parquet")
        .saveAsTable(summaries_table)
    )


def query_account_over_layout(
    spark: SparkSession,
    ati_table: str,
    account: int,
    limit: int | None = None,
    descending: bool = True,
) -> DataFrame:
    """The P2/J4 account point query served FROM the bucketed layout —
    the at-rest analog of the reference's PK(account, id) index probe
    (m0001-initial.sql:18, postgres.rs:97-99: "good plan" = index scan).
    The equality predicate on the bucketing column lets Spark's bucket
    pruning read ONE bucket file-group of N (``SelectedBucketsCount: 1
    out of N`` in the scan node — asserted in tests/test_layout.py and
    captured in PLANS.md); within the bucket the data is sorted by id,
    so the keyset top-k is a TakeOrderedAndProject over one sorted
    bucket, never a table scan.

    ``autoBucketedScan`` is forced off: that heuristic drops the bucketed
    scan when no join/aggregation consumes the distribution — but here
    the point of the bucketed scan IS filter pruning, which it silently
    forfeits ("Bucketed: false (disabled by query planner)").

    The conf is scoped, not leaked: the physical plan is pinned eagerly
    (queryExecution preparations run once and are cached on the returned
    frame) and the session's prior value restored — otherwise one call
    would silently change the planner for every later query on the
    shared session."""
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prior = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        df = spark.table(ati_table).filter(F.col("account") == account)
        order = F.col("id").desc() if descending else F.col("id").asc()
        if limit is not None:
            df = df.orderBy(order).limit(limit)
        else:
            # No limit: a global orderBy would plan a range Exchange,
            # which AQE wraps — and AQE's final-plan re-optimization
            # re-reads the (restored) session conf and drops the
            # bucketed scan. But the equality predicate prunes to ONE
            # bucket, and a bucketed scan emits one partition per
            # bucket, so every matching row is in a single partition —
            # a partition-local sort IS the total order, with no
            # exchange (the exact shape of the reference's sorted
            # (account, id) index scan). The adaptivity guard below
            # protects the single-partition assumption: if the bucketed
            # scan were silently dropped, the plan would gain an
            # exchange and trip it.
            df = df.sortWithinPartitions(order)
        pinned = df._jdf.queryExecution().executedPlan()  # pin under the conf
        # The eager pin holds ONLY because these scan+filter+sort[+limit]
        # plans have no exchange/subquery, so AQE leaves them
        # non-adaptive. If the shape ever gains an exchange, AQE's
        # re-optimization would re-read the (restored) session conf at
        # final-plan time and could silently drop the bucketed scan
        # despite the pin — fail loudly instead of serving a
        # silently-degraded plan.
        if "AdaptiveSparkPlan" in pinned.nodeName():
            raise AssertionError(
                "query_account_over_layout: plan became adaptive — the "
                "scoped autoBucketedScan pin no longer holds; re-scope the "
                "conf around execution, not planning"
            )
        # The adaptivity check alone cannot catch a DROPPED bucketed
        # scan (a local sort adds no exchange), and for limit=None the
        # single-pruned-bucket property is what makes the partition-local
        # sort a total order — assert the scan itself, loudly. Probe the
        # scan node's optionalBucketSet programmatically first (the
        # executed-plan STRING rendering of bucket metadata is
        # Spark-version formatting, not API); fall back to the string
        # only if the node API itself moved.
        if not _scan_pruned_to_one_bucket(pinned):
            raise AssertionError(
                "query_account_over_layout: the pinned plan lost the "
                "bucket-pruned scan (bucketing disabled on the session, or "
                "the table was written unbucketed) — the point query would "
                "full-scan, and without a limit the partition-local sort "
                "would no longer be a total order"
            )
        return df
    finally:
        spark.conf.set(key, prior)


def _scan_pruned_to_one_bucket(pinned) -> bool:
    """True iff the executed plan contains a bucketed file scan whose
    bucket filter pruned to EXACTLY one bucket. Primary probe is the
    scan node's own API (``bucketedScan`` + ``optionalBucketSet``
    cardinality on FileSourceScanExec — leaves of the pinned plan);
    fallback is a whitespace-tolerant match on the plan string, so a
    Spark upgrade that reworks either the metadata text or the node API
    (but not both) cannot make a healthy, correctly-bucketed point query
    raise."""
    try:
        leaves = pinned.collectLeaves()
        for i in range(leaves.size()):
            node = leaves.apply(i)
            try:
                if not node.bucketedScan():
                    continue
                obs = node.optionalBucketSet()
                if obs.isDefined() and obs.get().cardinality() == 1:
                    return True
            except Exception:
                continue
    except Exception:
        pass
    import re

    return bool(
        re.search(r"SelectedBucketsCount\s*:\s*1\s+out\s+of", pinned.toString())
    )


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted plan (empty string if
    nothing reached the scan — a pushdown-free parquet scan prints
    'PushedFilters: []', which must read as falsy here, not as a line)."""
    plan = explain_str(df)
    lines = [
        line
        for line in plan.splitlines()
        if "PushedFilters" in line and line.split("PushedFilters:")[1].strip() != "[]"
    ]
    return "\n".join(lines)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def uses_top_k(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df, "simple")


def shuffles_no_join(df: DataFrame) -> bool:
    """True when no join in the plan shuffles both sides — every join is
    broadcast (hash or nested-loop). The corpus/fact side stays put."""
    plan = explain_str(df, "simple")
    return "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
