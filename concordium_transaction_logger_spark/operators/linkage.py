"""Blocked entity resolution (fuzzy record linkage) over structured
records — the duplicate-ACCOUNT detection companion to the document-dedup
family: near-identical customer records (typo'd re-registrations, import
glitches) found by the production ER pattern

    normalize -> BLOCK -> within-block verify (bounded edit distance)

The reference indexes accounts by an exact 29-byte canonical prefix
(`concordium-rust-sdk` alias semantics; see functions/addresses.py) —
exact-prefix identity is its whole linkage story. This module is the
fuzzy generalization a curation/compliance pipeline needs when record
identity is NOT protocol-guaranteed.

Scale design (the point of blocking): the verify self-join is an
EQUI-join on (block_key, nation) — Catalyst plans a hash/sort-merge
join, never a cartesian — so pair work is sum(|block|^2) instead of N^2,
the same bound the MinHash-LSH band join rides. The block key here is a
name prefix (synthetic TPC-H names differ in trailing digits); on real
data the key slots swap for phonetic codes, char-n-gram MinHash buckets,
or sorted-neighborhood windows WITHOUT touching the join shape — the
100 TB story is the shape, not the key. Levenshtein is evaluated only
inside blocks, and both engines (Spark ``levenshtein``, DuckDB
``levenshtein``) compute the identical classic integer distance, so the
whole family hash-matches its oracle with zero float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

#: Verify threshold: candidate pairs must be within this edit distance.
#: 1 = single-typo duplicates; the blocking key guarantees candidate
#: names already share everything but their trailing characters.
MAX_EDIT_DISTANCE = 1

#: Trailing characters excluded from the block key (the "fuzz window").
#: Must be >= MAX_EDIT_DISTANCE or a true duplicate could straddle two
#: blocks and be missed — the classic blocking recall/cost dial.
BLOCK_SUFFIX = 2


def _blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized + blocked customer records: the shared front half of
    both linkage queries. Normalization is lower-casing (the synthetic
    corpus has no whitespace/punctuation noise; real pipelines add
    trim/fold steps here — row-local either way); the block key drops
    the last ``BLOCK_SUFFIX`` characters of the normalized name."""
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.lower(F.col("c_name")).alias("name"),
            "c_nationkey",
        )
        .withColumn(
            "blk",
            F.expr(f"substring(name, 1, length(name) - {BLOCK_SUFFIX})"),
        )
    )


def customer_fuzzy_matches(
    spark: SparkSession, sf_dir: str, max_distance: int = MAX_EDIT_DISTANCE
) -> DataFrame:
    """Candidate duplicate-account pairs: same block, same nation (the
    deterministic attribute a fuzzy name match must still agree on —
    standard ER conjunctive blocking), name edit distance within the
    threshold. Pairs are emitted once (key_a < key_b) with the integer
    distance, ordered for stable comparison.

    Plan shape (PLANS.md section): two scans of the customer table into
    one hash EQUI-join on (blk, c_nationkey) — broadcast at small scale,
    sort-merge on the same keys when both sides are large — with the
    key_a < key_b and distance predicates as residuals, plus the final
    presentation ORDER BY's range exchange (the op's only corpus-sized
    shuffle; drop the orderBy when feeding a downstream join). Nothing
    driver-side."""
    if max_distance > BLOCK_SUFFIX:
        raise ValueError(
            f"max_distance {max_distance} > BLOCK_SUFFIX {BLOCK_SUFFIX}: "
            f"a true duplicate differing outside the block's fuzz window "
            f"would straddle two blocks and be silently missed — widen "
            f"BLOCK_SUFFIX (recall) before raising the verify threshold"
        )
    a = _blocked(spark, sf_dir).alias("a")
    b = _blocked(spark, sf_dir).alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein("a.name", "b.name").cast("long").alias(
                "edit_distance"
            ),
        )
        .filter(F.col("edit_distance") <= max_distance)
        .orderBy("key_a", "key_b")
    )


def customer_best_match(
    spark: SparkSession, sf_dir: str, max_distance: int = MAX_EDIT_DISTANCE
) -> DataFrame:
    """The resolution step: for every customer with at least one fuzzy
    candidate, its single best match — minimal edit distance, ties
    broken by smallest partner key (deterministic, so the oracle agrees
    row-for-row). This is the record-pair output an ER merge/review
    queue consumes.

    Built by symmetrizing the pair frame (each pair seen from both
    sides) and taking row_number() = 1 per key — one extra shuffle on
    the key, bounded by the candidate-pair count, not the corpus."""
    pairs = customer_fuzzy_matches(spark, sf_dir, max_distance)
    sym = pairs.select(
        F.col("key_a").alias("key"),
        F.col("key_b").alias("match_key"),
        "edit_distance",
    ).unionByName(
        pairs.select(
            F.col("key_b").alias("key"),
            F.col("key_a").alias("match_key"),
            "edit_distance",
        )
    )
    w = Window.partitionBy("key").orderBy("edit_distance", "match_key")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "match_key", "edit_distance")
        .orderBy("key")
    )
