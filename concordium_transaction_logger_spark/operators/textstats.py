"""Text-analysis operators for training-data pipelines over ``documents``.

All pure JVM-side expressions (no Python UDFs): regex, split, transform,
aggregate — whole-stage-codegen friendly and embarrassingly parallel, so
they scale linearly with input partitions at 100 TB.

Determinism: ratios are per-mille BIGINTs (see ingest/oracle.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

#: Tiny per-language stopword sets for the n-gram/stopword language-ID
#: heuristic. Deliberately small so the oracle SQL mirrors them verbatim.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "es": ("el", "los", "las", "que", "por", "una"),
}

EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a", "for", "on", "with")


def tokens(col: Column) -> Column:
    """Lowercased alphanumeric tokens; empty tokens filtered (both engines
    keep boundary empties differently, so we never rely on them)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != F.lit(""))


def _marker_count(text_lower: Column, words: tuple[str, ...]) -> Column:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(text_lower, F.lit(pattern), F.lit(0)))


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition before CPU-heavy per-document expressions: corpora arrive
    as few large files and the scan's partitioning would serialize the work."""
    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, "doc_id")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace/alnum tokenizer): totals, distinct count,
    and mean token length in per-mille. Tokens are bound to a column once —
    never re-tokenize per derived expression."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    t = F.col("t")
    return docs.select("doc_id", tokens(F.col("text")).alias("t")).select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_uniq_tokens"),
        F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)).alias(
            "chars_in_tokens"
        ),
    ).withColumn(
        "mean_token_len_permille",
        F.when(
            F.col("n_tokens") > 0,
            F.round(1000.0 * F.col("chars_in_tokens") / F.col("n_tokens"), 0).cast("long"),
        ).otherwise(F.lit(0)),
    )


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: alpha / digit / whitespace / stopword
    ratios in per-mille, over raw chars and tokens."""
    docs = _spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", tokens(F.col("text")).alias("t")
    )
    lower = F.lower(F.col("text"))
    n = F.length("text")
    t = F.col("t")
    alpha = F.length(F.regexp_replace(lower, "[^a-z]", ""))
    digit = F.length(F.regexp_replace(lower, "[^0-9]", ""))
    space = F.length(F.regexp_replace(F.col("text"), "[^ ]", ""))
    stop = F.size(F.filter(t, lambda x: x.isin(*EN_STOPWORDS)))
    permille = lambda num, den: F.when(
        den > 0, F.round(1000.0 * num / den, 0).cast("long")
    ).otherwise(F.lit(0))
    return docs.select(
        "doc_id",
        n.alias("n_chars"),
        F.size(t).alias("n_tokens"),
        permille(alpha, n).alias("alpha_permille"),
        permille(digit, n).alias("digit_permille"),
        permille(space, n).alias("space_permille"),
        permille(stop, F.size(t)).alias("stopword_permille"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID. Scores each language by marker-word
    hits; highest count wins with a fixed tiebreak order (en>fr>de>es),
    'und' when nothing matches."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    lower = F.lower(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            _marker_count(lower, words).alias(f"score_{code}")
            for code, words in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"score_{c}") for c in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for code in LANG_MARKERS:  # insertion order == tiebreak order
        pred = pred.when(F.col(f"score_{code}") == best, F.lit(code))
    return scored.withColumn("pred_lang", pred).select(
        "doc_id", "lang", "pred_lang", *[f"score_{c}" for c in LANG_MARKERS]
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 over the alnum-normalized text
    (the exact-dedup key; reference analog: 32-byte content hash)."""
    docs = _spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", "")).alias("fp"),
    )
