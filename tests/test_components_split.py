"""Connected-components clustering and deterministic splits. Value parity
vs DuckDB (recursive-CTE oracle / hash-bucket oracle) runs in
test_oracle_parity; here: the semantic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from concordium_transaction_logger_spark.functions.addresses import (
    _b58check_bytes,
    base58check,
)
from concordium_transaction_logger_spark.operators import dedup, sampling


def test_components_are_closed_and_labeled_by_min(spark, sf_dir):
    comp = dedup.dup_components(spark, sf_dir).persist()
    pairs = dedup.minhash_band_pairs(spark, sf_dir)

    # every candidate pair ends up in the same component
    a = comp.select(F.col("doc_id").alias("doc_a"), F.col("component_id").alias("ca"))
    b = comp.select(F.col("doc_id").alias("doc_b"), F.col("component_id").alias("cb"))
    split_pairs = pairs.join(a, "doc_a").join(b, "doc_b").filter("ca <> cb").count()
    assert split_pairs == 0

    # component_id is the min doc_id of its members; sizes add up to |docs|
    bad_label = (
        comp.groupBy("component_id")
        .agg(F.min("doc_id").alias("mn"), F.count("*").alias("n"))
        .filter("component_id <> mn")
        .count()
    )
    assert bad_label == 0
    # every document appears exactly once (singletons included)
    assert comp.select("doc_id").distinct().count() == comp.count()


def test_split_is_deterministic_and_disjoint(spark, sf_dir):
    s1 = sampling.split_assignment(spark, sf_dir).collect()
    s2 = sampling.split_assignment(spark, sf_dir).collect()
    assert s1 == s2  # pure function of the row, stable across executions
    splits = {r.split for r in s1}
    assert splits <= {"train", "val"}
    assert all((r.split == "val") == (r.bucket < 100) for r in s1)
    # a different salt re-shuffles assignment without touching data
    s3 = sampling.split_assignment(spark, sf_dir, salt="v2").collect()
    assert {r.doc_id for r in s3} == {r.doc_id for r in s1}
    assert any(
        a.split != b.split for a, b in zip(s1, s3)
    ), "salt change should move at least one row at this corpus size"


def test_base58check_display():
    # leading zero bytes become leading '1's (base58check padding rule)
    assert _b58check_bytes(b"\x00" * 3, version=0).startswith("1111")


def test_base58check_column(spark):
    df = spark.createDataFrame([(bytes(32),), (None,)], "addr binary")
    rows = df.select(base58check(F.col("addr")).alias("b58")).collect()
    assert rows[0].b58 == _b58check_bytes(bytes(32))
    assert rows[1].b58 is None
