"""BM25 lexical retrieval and the cross-source overlap matrix: property
tests against independent Python references (the DuckDB value-parity rows
live in test_oracle_parity.py via the registry)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from concordium_transaction_logger_spark.operators import dedup, retrieval

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

corpora = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1,
    max_size=12,
)
queries_st = st.lists(
    st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True
)


def _py_bm25(token_lists, terms, k):
    """Independent reference for the quantized BM25: whole-bit IDF via
    int.bit_length (== length(bin(x)) - 1 for x >= 1, and 0 for x == 0),
    milli-integer saturation, floor division throughout."""
    n_docs = len(token_lists)
    sum_dl = sum(len(t) for t in token_lists)
    avgdl_milli = max(1, (1000 * sum_dl) // n_docs)
    df = {w: sum(1 for t in token_lists if w in t) for w in terms}
    idf = {
        w: max(((n_docs - df[w] + 1) // (df[w] + 1)).bit_length() - 1, 0)
        for w in terms
    }
    out = []
    for doc_id, t in enumerate(token_lists):
        dl = len(t)
        r_permille = (1_000_000 * dl) // avgdl_milli
        score = 0
        hit = 0
        for w in terms:
            tf = t.count(w)
            if tf > 0:
                hit += 1
                score += (
                    idf[w] * tf * (retrieval.K1_MILLI + 1000) * 1_000_000
                ) // (1_000_000 * tf + retrieval.K1_MILLI * r_permille)
        if score > 0:
            out.append((doc_id, dl, score, hit))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpora, queries_st)
def test_bm25_matches_python_reference(spark, token_lists, terms):
    docs = spark.createDataFrame(
        [Row(doc_id=i, t=t) for i, t in enumerate(token_lists)],
        schema="doc_id bigint, t array<string>",
    )
    got = [
        (r.doc_id, r.dl, r.score_milli, r.n_terms_hit)
        for r in retrieval.bm25_over(docs, tuple(terms), k=50).collect()
    ]
    assert got == _py_bm25(token_lists, tuple(terms), 50)


def test_bm25_rejects_malformed_queries(spark, sf_dir):
    import pytest

    for bad in ((), ("It's",), ("two words",), ("UPPER",)):
        with pytest.raises(ValueError):
            retrieval.bm25_topk(spark, sf_dir, terms=bad)
        with pytest.raises(ValueError):
            retrieval.bm25_sql(terms=bad)


def test_bm25_topk_is_total_and_bounded(spark, sf_dir):
    rows = retrieval.bm25_topk(spark, sf_dir).collect()
    assert len(rows) <= retrieval.TOP_K
    # cut is totally ordered: (score desc, doc_id asc), no ties unresolved
    keys = [(-r.score_milli, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    assert all(r.score_milli > 0 and r.n_terms_hit >= 1 for r in rows)


def test_bm25_plan_is_broadcast_plus_topk(spark, sf_dir):
    plan = retrieval.bm25_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # global top-k must be TakeOrderedAndProject, never a full Sort+Limit
    assert "TakeOrderedAndProject" in plan
    # the stats row joins by broadcast; no shuffled join anywhere
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_hybrid_rrf_fuses_both_modalities(spark, sf_dir):
    rows = retrieval.hybrid_rrf_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= retrieval.TOP_K
    for r in rows:
        expect = (
            1000 // (retrieval.RRF_K + r.bm25_rank) if r.bm25_rank else 0
        ) + (1000 // (retrieval.RRF_K + r.ann_rank) if r.ann_rank else 0)
        assert r.rrf_milli == expect
        assert 0 <= r.bm25_rank <= retrieval.RRF_DEPTH
        assert 0 <= r.ann_rank <= retrieval.RRF_DEPTH
        assert r.bm25_rank or r.ann_rank
    keys = [(-r.rrf_milli, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_source_overlap_handles_128_sources(spark, tmp_path):
    """The round-5 segmented mask: 128 sources -> 2 mask words. Each
    source contributes one doc; sources i and i+1 share one shingle via
    an overlapping phrase, and pairs straddling the 64-bit word boundary
    (63, 64) must be found like any other — checked against a brute
    python reference on the same shingle definition."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                # 4 tokens shared with the next source + a unique tail
                text=f"common {i} phrase tail unique{i} only{i} text{i}"
                f" common {i + 1} phrase tail",
                lang="en",
                source=f"s{i:03d}",
                n_chars=60,
            )
            for i in range(128)
        ]
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.src_a, r.src_b): (r.inter_shingles, r.n_a, r.n_b, r.jaccard_permille)
        for r in dedup.source_overlap(spark, str(tmp_path)).collect()
    }
    sh = dedup.shingle_index(spark, str(tmp_path)).select("doc_id", "sh")
    by_src: dict[str, set] = {}
    for r in sh.collect():
        by_src.setdefault(f"s{r.doc_id:03d}", set()).add(r.sh)
    expect = {}
    names = sorted(by_src)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            inter = len(by_src[a] & by_src[b])
            if inter:
                union = len(by_src[a]) + len(by_src[b]) - inter
                expect[(a, b)] = (
                    inter, len(by_src[a]), len(by_src[b]),
                    (1000 * inter) // union,
                )
    assert got == expect
    assert ("s063", "s064") in got, "word-boundary pair must be found"


def test_source_overlap_raises_loudly_past_4096_sources(spark, tmp_path):
    """The honest ceiling moved from 64 (now segmented) to the mask
    width itself: past 4096 sources the guard names the swap."""
    import pytest

    from pyspark.sql import functions as F

    docs = spark.range(4100).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta").alias("text"),
        F.lit("en").alias("lang"),
        F.format_string("s%04d", "id").alias("source"),
        F.lit(22).alias("n_chars"),
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    with pytest.raises(ValueError, match="distinct count path"):
        dedup.source_overlap(spark, str(tmp_path))


def test_source_overlap_matches_python_reference(spark, sf_dir):
    got = {
        (r.src_a, r.src_b): (r.inter_shingles, r.n_a, r.n_b, r.jaccard_permille)
        for r in dedup.source_overlap(spark, sf_dir).collect()
    }
    # brute-force reference from the same shingle definition
    sh = dedup.shingle_index(spark, sf_dir).select("doc_id", "sh")
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
    )
    by_src: dict[str, set] = {}
    for r in sh.join(src, "doc_id").collect():
        by_src.setdefault(r.source, set()).add(r.sh)
    expect = {}
    names = sorted(by_src)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            inter = len(by_src[a] & by_src[b])
            if inter:
                union = len(by_src[a]) + len(by_src[b]) - inter
                expect[(a, b)] = (
                    inter,
                    len(by_src[a]),
                    len(by_src[b]),
                    # the engine's ONE half-up formula (r7: migrated off
                    # the floor spelling with the op and oracle)
                    (2000 * inter + union) // (2 * union),
                )
    assert got == expect
    assert all(v[3] <= 1000 for v in got.values())
