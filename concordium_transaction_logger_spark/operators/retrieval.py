"""Lexical retrieval over ``documents``: BM25 top-k keyword search.

The similarity family (`similarity.py`) covers the embedding modality;
this module is the *lexical* twin — the BM25 ranking a curation pipeline
uses for decontamination lookups, targeted corpus probes, and hybrid
(lexical + vector) retrieval. Reference scope: the transaction logger's
query surface is exact-key lookup only (postgres.rs:97-143), so this is
part of the beyond-reference training-data family, not a ported operator.

Integer-exact scoring (the engine's cross-engine determinism rule,
ingest/oracle.py): IDF is quantized to whole bits via binary bit-length —
``bitlen((N - df + 1) // (df + 1)) - 1`` is the floor of
``log2((N-df+1)/(df+1))``, a Lucene-style non-negative IDF with no
transcendental functions — and the tf/length saturation is exact integer
arithmetic over milli-scaled quantities, so Spark and DuckDB agree to the
last bit. Magnitudes are corpus-size-independent AND per-document-bounded:
the relative length enters as a permille integer (1000*dl/avgdl, floor),
so the score numerator is bounded by the single document's term frequency
alone — exact in BIGINT for documents up to ~6e7 tokens at any corpus
size.

Scale shape: two scans of the token projection — one map-side-combined
aggregate collapsing to a SINGLE stats row (N, Σdl, df per query term),
then a row-local scoring pass over the broadcast stats row and a global
top-k (TakeOrderedAndProject — never a full sort). Term frequencies are
computed *inside the row* with array expressions; no token ever shuffles.
A resident engine serves many queries from one materialized token
projection; the per-query cost is the second scan only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .textstats import _spread, tokens

#: Default query for the registry/bench entry: one rare term (high IDF)
#: plus two common ones. Terms appearing in more than half the corpus get
#: IDF 0 — the same clamp Lucene applies to negative-IDF terms.
DEFAULT_QUERY = ("dup", "vector", "fast")
K1_MILLI = 1200  # BM25 k1 = 1.2, as an exact milli integer
TOP_K = 10


def _tf(t: Column, term: str) -> Column:
    return F.size(F.filter(t, lambda x: x == F.lit(term))).cast("long")


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = TOP_K,
) -> DataFrame:
    """Top-k documents by BM25 (b=1, k1=1.2, whole-bit IDF) for a literal
    term query. Ties broken by ascending doc_id so the cut is total."""
    docs = _spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id", tokens(F.col("text")).alias("t")
    )
    return bm25_over(docs, terms, k)


def _check_terms(terms: tuple[str, ...]) -> None:
    """Terms must be non-empty and in the tokenizer's alphabet — anything
    else (uppercase, quotes, spaces) can never match a token and would
    break the interpolated oracle SQL, so fail loudly instead."""
    import re

    if not terms:
        raise ValueError("bm25: terms must be a non-empty tuple")
    for w in terms:
        if not re.fullmatch(r"[a-z0-9]+", w):
            raise ValueError(
                f"bm25: term {w!r} is not a lowercase-alphanumeric token"
            )


def bm25_over(docs: DataFrame, terms: tuple[str, ...], k: int) -> DataFrame:
    """BM25 over an arbitrary ``(doc_id, t: array<string>)`` frame (unit
    tests feed synthetic corpora through the same kernel)."""
    _check_terms(terms)
    t = F.col("t")
    # pin the per-doc tf frame (r11, guide §1.2 shared subtree): BOTH the
    # broadcast stats aggregate and the scored branch read it, and
    # unpinned each one re-executes the scan + tokenize + tf filters —
    # the corpus-dominant cost, paid twice (plan showed 2 parquet scans
    # of documents). Lazy pin: the stats aggregate is the materializing
    # action; the scored branch then reads the pinned partitions. The
    # pinned frame is (doc_id, dl, tf0..tfn) — a few longs per doc, far
    # narrower than the text it replaces at any corpus size.
    pertf = docs.select(
        "doc_id",
        F.size(t).cast("long").alias("dl"),
        *[_tf(t, w).alias(f"tf{i}") for i, w in enumerate(terms)],
    ).localCheckpoint(eager=False)
    # ONE map-side-combined aggregate -> a single broadcastable stats row.
    stats = pertf.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    ).withColumn(
        # clamped to >=1 so the r_permille division is total even on an
        # all-empty corpus (where every score is 0 anyway)
        "avgdl_milli",
        F.expr("greatest(1L, (1000 * sum_dl) DIV n_docs)"),
    )
    for i in range(len(terms)):
        # floor(log2((N-df+1)/(df+1))), clamped at 0: bin(0) = '0' has
        # length 1, so the -1 lands the x=0 and x=1 cases both on 0 bits.
        stats = stats.withColumn(
            f"idf{i}",
            (
                F.length(F.bin(F.expr(f"(n_docs - df{i} + 1) DIV (df{i} + 1)")))
                - F.lit(1)
            ).cast("long"),
        )
    # The relative document length enters as a PERMILLE integer
    # (r = 1000*dl/avgdl, floor) rather than as raw dl*avgdl products:
    # that keeps the score numerator's magnitude bounded by the single
    # document's tf alone (idf<=63 * tf * 2200 * 1e6 — exact in BIGINT for
    # docs up to ~6e7 tokens at ANY corpus size), where the naive
    # tf*avgdl_milli form overflows once tf and avgdl are both book-sized.
    # The permille floor is mirrored exactly in the oracle; its ranking
    # effect is <0.1% of the length normalization.
    scored = pertf.crossJoin(F.broadcast(stats)).withColumn(
        "r_permille", F.expr("(1000000 * dl) DIV avgdl_milli")
    )
    term_scores = [
        F.when(
            F.col(f"tf{i}") > 0,
            F.expr(
                f"(idf{i} * tf{i} * {K1_MILLI + 1000} * 1000000)"
                f" DIV (1000000 * tf{i} + {K1_MILLI} * r_permille)"
            ),
        ).otherwise(F.lit(0))
        for i in range(len(terms))
    ]
    hits = [(F.col(f"tf{i}") > 0).cast("long") for i in range(len(terms))]
    score = term_scores[0]
    nhit = hits[0]
    for i in range(1, len(terms)):
        score = score + term_scores[i]
        nhit = nhit + hits[i]
    return (
        scored.select(
            "doc_id",
            "dl",
            score.cast("long").alias("score_milli"),
            nhit.cast("long").alias("n_terms_hit"),
        )
        .filter(F.col("score_milli") > 0)
        .orderBy(F.col("score_milli").desc(), F.col("doc_id").asc())
        .limit(k)
    )


#: Reciprocal-rank-fusion constant (Cormack & Clarke 2009's k=60) and the
#: rank depth each modality contributes to the fusion.
RRF_K = 60
RRF_DEPTH = 20


def hybrid_rrf_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = DEFAULT_QUERY,
    k: int = TOP_K,
) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 lexical ranking with the exact
    cosine ANN ranking for query vector 0 by reciprocal-rank fusion —
    ``rrf_milli = Σ 1000 // (60 + rank)`` over the modalities that ranked
    the document (integer floor division, so cross-engine exact). Absent
    ranks render as 0 (a document can surface on one modality alone).

    Scale shape: each modality produces its own top-``RRF_DEPTH`` list the
    scalable way (BM25: broadcast stats + TakeOrderedAndProject; ANN:
    broadcast query + per-partition top-k); the fusion itself is a full
    outer join of two <=RRF_DEPTH-row frames — driver-free but trivially
    small, so the single-partition rank window over the 20-row BM25 list
    is not a scale hazard."""
    from pyspark.sql.window import Window

    from .similarity import cosine_topk

    lex = bm25_topk(spark, sf_dir, terms, RRF_DEPTH).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_milli").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("bm25_rank"),
    )
    vec = (
        cosine_topk(spark, sf_dir, n_queries=1, k=RRF_DEPTH)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("ann_rank"))
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("bm25_rank", F.lit(0)).cast("long").alias("bm25_rank"),
        F.coalesce("ann_rank", F.lit(0)).cast("long").alias("ann_rank"),
        (
            F.when(
                F.col("bm25_rank").isNotNull(),
                F.expr(f"1000 DIV ({RRF_K} + bm25_rank)"),
            ).otherwise(F.lit(0))
            + F.when(
                F.col("ann_rank").isNotNull(),
                F.expr(f"1000 DIV ({RRF_K} + ann_rank)"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("rrf_milli"),
    )
    return fused.orderBy(F.col("rrf_milli").desc(), F.col("doc_id").asc()).limit(k)


def bm25_ctes(terms: tuple[str, ...] = DEFAULT_QUERY) -> str:
    """The BM25 scoring pipeline as a DuckDB CTE chain ending in ``bms``
    (doc_id, dl, score_milli, n_terms_hit for every scoring document) —
    shared by the standalone oracle and the hybrid-fusion oracle."""
    _check_terms(terms)
    tf_exprs = ",\n       ".join(
        f"CAST(len(list_filter(t, x -> x = '{w}')) AS BIGINT) AS tf{i}"
        for i, w in enumerate(terms)
    )
    df_exprs = ",\n       ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    idf_exprs = ",\n       ".join(
        f"CAST(length(bin(CAST((n_docs - df{i} + 1) // (df{i} + 1) AS BIGINT)))"
        f" - 1 AS BIGINT) AS idf{i}"
        for i in range(len(terms))
    )
    term_scores = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN (idf{i} * tf{i} * {K1_MILLI + 1000}"
        f" * 1000000) // (1000000 * tf{i} + {K1_MILLI} * r_permille)"
        f" ELSE 0 END)"
        for i in range(len(terms))
    )
    hit_sum = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    return f"""
, btf AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       {tf_exprs}
  FROM toks
),
bstat AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dl) AS BIGINT) AS sum_dl,
       {df_exprs}
  FROM btf
),
bidf AS (
  SELECT *, GREATEST(1, (1000 * sum_dl) // n_docs) AS avgdl_milli FROM bstat
),
bq AS (
  SELECT *,
       {idf_exprs}
  FROM bidf
),
bms AS (
  SELECT doc_id, dl,
       CAST({term_scores} AS BIGINT) AS score_milli,
       CAST({hit_sum} AS BIGINT) AS n_terms_hit
  FROM (SELECT *, (1000000 * dl) // avgdl_milli AS r_permille
        FROM btf CROSS JOIN bq) br
  WHERE {term_scores} > 0
)
"""


def bm25_sql(terms: tuple[str, ...] = DEFAULT_QUERY, k: int = TOP_K) -> str:
    """The DuckDB oracle for :func:`bm25_topk` — identical arithmetic, the
    shared ``toks`` prologue CTE as the token projection."""
    return (
        bm25_ctes(terms)
        + f"""
SELECT doc_id, dl, score_milli, n_terms_hit
FROM bms
ORDER BY score_milli DESC, doc_id ASC
LIMIT {k}
"""
    )
