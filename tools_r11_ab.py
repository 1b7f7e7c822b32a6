#!/usr/bin/env python
"""Round-11 interleaved A/B adjudicator (VERDICT r10 item 1).

One invocation = one COLD JVM: build session, run the bench warm region,
then time `<query>` with the driver's bench methodology (toPandas, two
passes, per-query min). `<variant>` selects the kernel:

  new    — the tree as committed (r10 kernel).
  old    — the pre-r10 `components_over_buckets` (eager pins, diff-join
           convergence, groupBy+join sizes) monkey-patched in.
  nowin  — the r10 kernel with ONLY the sizes spelling reverted to
           groupBy+join-back (bisects VERDICT item 1's window-sort
           hypothesis away from the convergence/lazy-pin changes).

Run interleaved from a shell loop (old new old new ...) on a quiet host;
each line of output is JSON: {"query":..,"variant":..,"runs":[..],"min":..}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

from pyspark.sql import DataFrame, functions as F


def old_components_over_buckets(
    buckets: DataFrame, all_docs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """The pre-r10 kernel, verbatim from a7ecb52^ (doc trimmed)."""
    if max_iter < 1:
        raise ValueError(
            f"components_over_buckets: max_iter must be >= 1, got {max_iter}"
        )
    labels = (
        buckets.select("doc_id")
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iter):
        bucket_min = (
            buckets.join(labels, "doc_id")
            .groupBy("bucket")
            .agg(F.min("label").alias("blabel"))
        )
        new_labels = (
            buckets.join(bucket_min, "bucket")
            .groupBy("doc_id")
            .agg(F.min("blabel").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "doc_id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        raise ValueError("did not converge")
    singletons = (
        all_docs.select("doc_id")
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("label"))
    )
    labels = labels.union(singletons)
    sizes = labels.groupBy("label").agg(F.count("*").alias("component_size"))
    return (
        labels.join(sizes, "label")
        .select("doc_id", F.col("label").alias("component_id"), "component_size")
        .orderBy("doc_id")
    )


def nowin_components_over_buckets(
    buckets: DataFrame, all_docs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """The r10 kernel with ONLY the component-size spelling reverted to
    groupBy+join-back (labels pinned first so the singleton anti-join does
    not double-execute the way the pre-r10 join-back did). The propagation
    loop below is verbatim from dedup.components_over_buckets @ HEAD."""
    if max_iter < 1:
        raise ValueError(
            f"components_over_buckets: max_iter must be >= 1, got {max_iter}"
        )
    label_sum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    labels = None
    prev_sum: object = None
    converged = False
    for _ in range(max_iter):
        if labels is None:
            bucket_min = buckets.groupBy("bucket").agg(F.min("doc_id").alias("blabel"))
        else:
            bucket_min = (
                buckets.join(labels, "doc_id")
                .groupBy("bucket")
                .agg(F.min("label").alias("blabel"))
            )
        new_labels = (
            buckets.join(bucket_min, "bucket")
            .groupBy("doc_id")
            .agg(F.min("blabel").alias("label"))
            .localCheckpoint(eager=False)
        )
        if prev_sum is None:
            row = new_labels.agg(
                label_sum, F.sum(F.col("doc_id").cast("decimal(38,0)")).alias("s0")
            ).collect()[0]
            prev_sum, new_sum = row["s0"], row["s"]
        else:
            new_sum = new_labels.agg(label_sum).collect()[0]["s"]
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise ValueError("components_over_buckets: did not converge")
    singletons = (
        all_docs.select("doc_id")
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("label"))
    )
    labeled = labels.union(singletons).localCheckpoint(eager=False)
    sizes = labeled.groupBy("label").agg(
        F.count("*").cast("long").alias("component_size")
    )
    return (
        labeled.join(sizes, "label")
        .select("doc_id", F.col("label").alias("component_id"), "component_size")
        .orderBy("doc_id")
    )


KERNELS = {
    "new": None,  # the tree as committed
    "old": old_components_over_buckets,
    "nowin": nowin_components_over_buckets,
}


def paired_main(query: str, variants: list[str], reps: int) -> None:
    """Within-ONE-JVM interleaved A/B: alternate the kernel variants
    ``reps`` times each inside a single warmed session, so host drift
    (the dominant error on this box — cold-JVM invocation minima swing
    4x run-to-run) hits every variant equally. Reports per-variant all
    runs + min + median."""
    import statistics

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from concordium_transaction_logger_spark import build_session
    from concordium_transaction_logger_spark.operators import dedup
    from concordium_transaction_logger_spark.registry import REGISTRY

    new_kernel = dedup.components_over_buckets
    from tools_r11_measure import warm

    spark = build_session("ctl-r11-ab-paired")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark, sf_dir)
    fn = REGISTRY[query].spark
    # one untimed pass per variant absorbs codegen for plan shapes the
    # warm region did not compile
    results: dict[str, list[float]] = {v: [] for v in variants}
    for v in variants:
        dedup.components_over_buckets = KERNELS[v] or new_kernel
        fn(spark, sf_dir).toPandas()
    for _ in range(reps):
        for v in variants:
            dedup.components_over_buckets = KERNELS[v] or new_kernel
            spark.sparkContext.setJobDescription(f"r11-ab-paired:{query}:{v}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            results[v].append(round(time.perf_counter() - t0, 3))
    dedup.components_over_buckets = new_kernel
    for v in variants:
        rs = results[v]
        print(
            json.dumps(
                {
                    "query": query,
                    "variant": v,
                    "mode": "paired-one-jvm",
                    "runs": rs,
                    "min": min(rs),
                    "median": round(statistics.median(rs), 3),
                }
            )
        )
    spark.stop()


def main() -> None:
    query = sys.argv[1]
    variant = sys.argv[2] if len(sys.argv) > 2 else "new"
    if variant == "pair":
        reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        vs = sys.argv[4].split(",") if len(sys.argv) > 4 else ["old", "new"]
        paired_main(query, vs, reps)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from concordium_transaction_logger_spark import build_session
    from concordium_transaction_logger_spark.registry import REGISTRY

    if variant in ("old", "nowin") and query == "doc_dup_components":
        from concordium_transaction_logger_spark.operators import dedup

        dedup.components_over_buckets = KERNELS[variant]

    from tools_r11_measure import warm

    spark = build_session("ctl-r11-ab")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark, sf_dir)

    fn = REGISTRY[query].spark
    spark.sparkContext.setJobDescription(f"r11-ab:{query}:{variant}")
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        runs.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {"query": query, "variant": variant, "runs": runs, "min": min(runs)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
