#!/usr/bin/env python
"""Paired one-JVM A/B for the r11 span-family tokenize-once pin.

Alternates the pre-change spelling (every consumer re-tokenizes the
corpus) against the committed one (one lazily-pinned tokenized frame)
REPS times inside one warmed session, timing each rep with the noop sink
(guide §1.4), so host drift hits both variants equally — the same design
the r10 components adjudication used (tools_r11_ab.py).

Usage: python tools_r11_spans_ab.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

from pyspark.sql import functions as F

from concordium_transaction_logger_spark import build_session
from concordium_transaction_logger_spark.operators import dedup
from concordium_transaction_logger_spark.operators.dedup import (
    SPAN_L,
    doc_span_occurrences,
    load_table,
    permille_expr,
    tokens,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_duplicate_spans(spark, sf_dir, span_l=SPAN_L):
    """The pre-r11 spelling, verbatim (two independent tokenize passes)."""
    from pyspark.sql.window import Window

    para = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(para, "doc_id")
    t = F.col("t")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    spans = doc_span_occurrences(docs, span_l)
    occ = F.count("*").over(Window.partitionBy("h"))
    dpos = spans.withColumn("n_occ", occ).filter(F.col("n_occ") >= 2).select(
        "doc_id", "pos"
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + span_l).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dpos.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("pos") >= prev_end), 1).otherwise(0),
    ).withColumn("island_id", F.sum("new_island").over(w))
    segs = isl.groupBy("doc_id", "island_id").agg(
        F.min("pos").alias("s"), (F.max("pos") + span_l).alias("e")
    )
    per_doc = segs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("n_dup_tokens"),
    )
    n_tok = tok.select("doc_id", F.size(t).cast("long").alias("n_tokens"))
    joined = n_tok.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("long").alias("n_dup_tokens"),
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        "n_dup_spans",
        "n_dup_tokens",
        permille_expr("n_dup_tokens", "n_tokens").alias("dup_permille"),
    ).orderBy("doc_id")


def old_dedup_clean_text(spark, sf_dir, span_l=SPAN_L):
    """The pre-r11 spelling, verbatim (three independent tokenize passes)."""
    from pyspark.sql.window import Window

    para = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(para, "doc_id")
    t = F.col("t")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    spans = doc_span_occurrences(docs, span_l)
    w_h = Window.partitionBy("h")
    ranked = spans.select(
        "doc_id",
        "pos",
        F.row_number().over(w_h.orderBy("doc_id", "pos")).alias("rn"),
        F.count("*").over(w_h).alias("n_occ"),
    )
    removed = ranked.filter((F.col("n_occ") >= 2) & (F.col("rn") >= 2))
    covered = removed.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (span_l - 1))).alias("idx"),
    ).distinct()
    toks_idx = tok.select("doc_id", F.posexplode(t).alias("idx", "tok"))
    kept = toks_idx.join(covered, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("idx", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_kept"),
    )
    return (
        tok.select("doc_id", F.size(t).cast("long").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
        .orderBy("doc_id")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    spark = build_session("ctl-r11-spans-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    variants = {
        "old_spans": lambda: old_duplicate_spans(spark, SF_DIR),
        "new_spans": lambda: dedup.duplicate_spans(spark, SF_DIR),
        "old_clean": lambda: old_dedup_clean_text(spark, SF_DIR),
        "new_clean": lambda: dedup.dedup_clean_text(spark, SF_DIR),
    }
    # untimed warm pass per variant (codegen compilation)
    for name, fn in variants.items():
        noop(fn())
    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(reps):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"spans-ab {name} rep{r}")
            t0 = time.time()
            noop(fn())
            times[name].append(round(time.time() - t0, 3))
    print()
    for name, ts in times.items():
        print(
            f"{name}: min={min(ts):.3f} median={statistics.median(ts):.3f} {ts}"
        )
    for pair in (("old_spans", "new_spans"), ("old_clean", "new_clean")):
        o, n = times[pair[0]], times[pair[1]]
        won = sum(1 for a, b in zip(o, n) if b < a)
        print(f"{pair[1]} wins {won}/{reps} paired reps vs {pair[0]}")


if __name__ == "__main__":
    main()
