"""Deterministic sampling / split operators for training-data pipelines.

Hash-bucket assignment, never ``rand()``: a random split is re-rolled by
task retries and partition re-plans (AQE), silently leaking rows between
train and validation — at 100 TB a retry storm is a certainty, so split
assignment must be a pure function of the row. md5-derived buckets are
stable under any execution, engine-portable (DuckDB-oracle-checkable),
and stratify for free (the hash is uniform within every stratum).

The reference has no sampling surface (SURVEY §2.12); this is a
§7-phase-4 training-data extension alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1000) from the first 8 md5 hex chars —
    32 bits of hash, exactly reproducible in any engine with md5."""
    h = F.md5(F.concat(key.cast("string"), F.lit("#" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1000


def split_assignment(
    spark: SparkSession, sf_dir: str, val_permille: int = 100, salt: str = "v1"
) -> DataFrame:
    """Assign every document to train/val by hash bucket (val gets
    ``val_permille``/1000 of rows in expectation). Pure projection —
    embarrassingly parallel, no shuffle, pushdown intact; the ``salt``
    versions the split without touching data."""
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"), salt)
    return docs.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        F.when(b < val_permille, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    ).orderBy("doc_id")


#: Per-language keep rates (per-mille) for :func:`stratified_sample` —
#: the language-rebalancing dial: downsample the dominant language,
#: keep everything else.
SAMPLE_RATES_PERMILLE = {"en": 300}
SAMPLE_DEFAULT_PERMILLE = 1000


def stratified_sample(
    spark: SparkSession, sf_dir: str, salt: str = "s1"
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a document iff its
    hash bucket falls under its language's keep rate — the corpus
    rebalancing step (e.g. cap English at 30%, keep rare languages
    whole). Same retry-stable hash-bucket machinery as the train/val
    split; a row's fate is a pure function of (doc_id, salt).

    Pure projection + filter, no shuffle; at 100 TB this runs scan-side
    and the dropped rows never leave the reader."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(SAMPLE_DEFAULT_PERMILLE)
    for lang, permille in SAMPLE_RATES_PERMILLE.items():
        rate = F.when(F.col("lang") == lang, F.lit(permille)).otherwise(rate)
    b = _bucket(F.col("doc_id"), salt)
    return (
        docs.select("doc_id", "lang", b.alias("bucket"), rate.cast("long").alias("rate_permille"))
        .filter(F.col("bucket") < F.col("rate_permille"))
        .orderBy("doc_id")
    )


def split_counts(
    spark: SparkSession, sf_dir: str, val_permille: int = 100, salt: str = "v1"
) -> DataFrame:
    """Stratification check: per-(lang, split) row counts — one partial
    aggregation, |langs|x2 output rows."""
    return (
        split_assignment(spark, sf_dir, val_permille, salt)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "split")
    )
