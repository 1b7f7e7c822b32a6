#!/usr/bin/env python
"""Paired one-JVM A/B for the r10 pagerank SHUFFLE_HASH hint at 10x scale.

The r11 before/after slope runs read trade_pagerank t10 4.75 s (pre-hint,
d18d3cc worktree) vs 8.79 s (HEAD) — opposite runs an hour apart on a
drifting host, so this adjudicates the hint the same way the components
kernel was adjudicated: both spellings alternated REPS times inside ONE
warmed session on the SAME 10x corpus, noop sink.

Usage: python tools_r11_pagerank_ab.py [reps] [mult]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from pyspark.sql import functions as F

from concordium_transaction_logger_spark import build_session
from concordium_transaction_logger_spark.operators import graph
from concordium_transaction_logger_spark.operators.graph import (
    PR_BASE_MICRO,
    PR_DAMPING_PERMILLE,
    PR_ITERS,
    PR_MASS_MICRO,
    PR_TOP,
    trade_graph_index,
    trade_nodes,
)
from scale_slopes import build_corpus


def old_pagerank_over_edges(e, nodes, iters=PR_ITERS, top=PR_TOP):
    """The pre-r10 spelling: no join-strategy hint (planner picks SMJ)."""
    zeros = nodes.select("node", F.lit(0).cast("long").alias("c"))
    ranks = nodes.select("node", F.lit(PR_MASS_MICRO).cast("long").alias("r"))
    for i in range(iters):
        contrib = e.join(ranks, e.src == ranks.node).select(
            F.col("dst").alias("node"),
            F.expr(
                f"CAST(({PR_DAMPING_PERMILLE} * CAST(r AS DECIMAL(38,0)) * w)"
                f" DIV (1000 * CAST(wout AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("c"),
        )
        ranks = (
            contrib.unionByName(zeros)
            .groupBy("node")
            .agg((F.lit(PR_BASE_MICRO) + F.sum("c")).cast("long").alias("r"))
        )
        if (i + 1) % 5 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.orderBy(F.desc("r"), F.asc("node"))
        .limit(top)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_kind"),
            F.expr("node DIV 2").cast("long").alias("node_key"),
            F.col("r").cast("long").alias("rank_micro"),
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = build_session("ctl-r11-pagerank-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    cdir = tempfile.mkdtemp(prefix=f"ctl_prab_x{mult}_")
    try:
        build_corpus(spark, mult, cdir, trade=True)
        # session adjacency index built once, outside the timed region —
        # the same warm-region convention as bench.py/scale_slopes.py
        e = trade_graph_index(spark, cdir)
        e.count()
        nodes = trade_nodes(spark, cdir)
        variants = {
            "old_smj": lambda: old_pagerank_over_edges(e, nodes),
            "new_shj": lambda: graph.pagerank_over_edges(e, nodes),
        }
        for name, fn in variants.items():  # untimed codegen warm pass
            noop(fn())
        times = {k: [] for k in variants}
        for r in range(reps):
            for name, fn in variants.items():
                spark.sparkContext.setJobDescription(f"pagerank-ab {name} rep{r}")
                t0 = time.time()
                noop(fn())
                times[name].append(round(time.time() - t0, 3))
        print()
        for name, ts in times.items():
            print(f"x{mult} {name}: min={min(ts):.3f} median={statistics.median(ts):.3f} {ts}")
        o, n = times["old_smj"], times["new_shj"]
        print(f"new_shj wins {sum(1 for a, b in zip(o, n) if b < a)}/{reps} paired reps")
    finally:
        shutil.rmtree(cdir, ignore_errors=True)


if __name__ == "__main__":
    main()
