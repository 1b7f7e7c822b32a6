#!/usr/bin/env python
"""Round-11 optimization measurement harness.

Times a target subset of registry queries in ISOLATION with the noop sink
(guide §1.4: computation only, no result transport) and captures
``explain('formatted')`` for each into ``plans/r11/<name>_<tag>.txt``.

Usage: python tools_r11_measure.py <tag> [query ...]
  tag: 'before' or 'after' (suffix for the plan files)
  query: registry names; default = the round's target list.

Warm-up mirrors bench.py (session indexes built outside the timed region)
so the isolated numbers are comparable with BENCH_DETAIL cells.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

TARGETS = [
    # r10-verdict punch list
    "doc_dup_components",
    "customer_fuzzy_matches",
    "lone_late_supplier",
    "embedding_near_dup_pairs_blocked",
    "ann_ivf_topk",
    "user_sessions",
    "embedding_semdedup_pairs",
    "graph_trade_pagerank",
    # most expensive remaining cells in the round-start bench
    "customer_golden_record",
    "customer_match_verdict_estimated",
    "customer_fuzzy_matches_minhash",
    "corpus_source_overlap",
    "doc_duplicate_spans",
    "doc_tfidf_cosine_pairs",
    "nation_market_share",
    "nation_pair_volume",
    "doc_bm25_topk",
    "part_margin_by_nation",
    "cheapest_supplier_per_part",
    "doc_unigram_surprisal",
    "customer_blocking_plan",
]


def warm(spark, sf_dir):
    """Same warm region as bench.py."""
    from pyspark.sql import functions as F

    spark.range(1).count()
    from concordium_transaction_logger_spark.sources.tables import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).select(F.lit(1)).limit(1).collect()
    from concordium_transaction_logger_spark.ingest.derive import block_feed, n_users_for

    n_users_for(spark, sf_dir)
    from concordium_transaction_logger_spark.operators import (
        dedup,
        graph,
        similarity,
        textstats,
    )

    block_feed(spark, sf_dir).count()
    dedup.shingle_index(spark, sf_dir).count()
    dedup.minhash_index(spark, sf_dir).count()
    dedup.band_buckets(spark, sf_dir).count()
    similarity.centroids_for(spark, sf_dir).count()
    similarity.ivf_index(spark, sf_dir).count()
    similarity.lsh_index(spark, sf_dir).count()
    similarity.kmeans_index(spark, sf_dir).count()
    similarity.pq_index(spark, sf_dir).count()
    textstats.winnow_index(spark, sf_dir).count()
    graph.trade_graph_index(spark, sf_dir).count()
    spark.range(128).repartition(32).mapInPandas(lambda it: it, "id long").count()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or TARGETS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from concordium_transaction_logger_spark import build_session
    from concordium_transaction_logger_spark.registry import REGISTRY

    spark = build_session("ctl-r11-measure")
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark, sf_dir)

    here = os.path.dirname(os.path.abspath(__file__))
    plans_dir = os.path.join(here, "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = REGISTRY[name].spark
        spark.sparkContext.setJobDescription(f"r11-measure: {name}")
        runs = []
        for i in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        # plus one end-to-end (bench methodology) pass for comparability
        t0 = time.perf_counter()
        fn(spark, sf_dir).toPandas()
        e2e = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        df = fn(spark, sf_dir)
        plan_txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan_txt)
        out[name] = {"noop_min2": min(runs), "noop_runs": runs, "e2e": e2e}
        print(f"{name}: noop={runs} e2e={e2e}", flush=True)

    with open(os.path.join(here, f"MEASURE_r11_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
