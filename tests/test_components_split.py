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


def test_hash_min_refuses_to_return_unconverged_components(spark):
    """An exhausted round budget must raise, not silently return SPLIT
    components (review finding: a chain whose diameter exceeds max_iter
    would emit two 'survivors' for one component with no error). A
    4-node chain needs 3 propagation rounds; max_iter=1 must refuse and
    name the star_components fallback."""
    import pytest

    chain_pairs = [(0, 1), (1, 2), (2, 3)]
    buckets = spark.createDataFrame(
        [(f"{a}:{b}", d) for a, b in chain_pairs for d in (a, b)],
        "bucket string, doc_id long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    with pytest.raises(ValueError, match="did not converge"):
        dedup.components_over_buckets(buckets, nodes, max_iter=1)
    # an adequate budget converges to one component labeled by the min
    comp = dedup.components_over_buckets(buckets, nodes, max_iter=10)
    rows = {r.doc_id: (r.component_id, r.component_size) for r in comp.collect()}
    assert rows == {i: (0, 4) for i in range(4)}


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


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing must conserve documents and tokens, and bin ids must be
    dense-from-zero per source (greedy concat leaves no empty bin: every
    bin boundary is crossed by some document's first token)."""
    from concordium_transaction_logger_spark.operators.textstats import tokens
    from concordium_transaction_logger_spark.sources.tables import load_table

    bins = sampling.pack_sequences(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select(
        "source", tokens(F.col("text")).alias("t")
    )
    totals = {
        r["source"]: (r["n"], r["tok"])
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum(F.size("t")).alias("tok"))
        .collect()
    }
    per_source = {}
    for r in bins:
        n, tok, ids = per_source.setdefault(r["source"], [0, 0, []])
        per_source[r["source"]][0] += r["n_docs"]
        per_source[r["source"]][1] += r["bin_tokens"]
        per_source[r["source"]][2].append(r["bin_id"])
    assert set(per_source) == set(totals)
    for src, (n, tok, ids) in per_source.items():
        assert (n, tok) == totals[src], f"{src}: docs/tokens not conserved"
        assert ids == sorted(ids)
        assert ids[0] == 0 and ids == list(range(ids[-1] + 1)), (
            f"{src}: bin ids must be dense from 0, got {ids[:5]}..."
        )


def test_pack_sequences_window_is_per_source(spark, sf_dir):
    """The running sum must be a per-source window — a global
    (single-partition) window would serialize the corpus at 100 TB."""
    plan = sampling.pack_sequences(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    import re
    wspecs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert wspecs and all("source" in w for w in wspecs), wspecs


def test_contamination_only_flags_val_docs_with_train_overlap(spark, sf_dir):
    """Every flagged doc is a val doc; its shared-shingle count is
    positive and bounded by its own shingle count."""
    cont = {r["doc_id"]: r["n_shared_shingles"]
            for r in sampling.split_contamination(spark, sf_dir).collect()}
    assert cont, "synthetic corpus repeats vocabulary; expect overlap"
    val_ids = {
        r["doc_id"]
        for r in sampling.split_assignment(spark, sf_dir).collect()
        if r["split"] == "val"
    }
    assert set(cont) <= val_ids
    sh_counts = {
        r["doc_id"]: r["n"]
        for r in dedup.shingle_index(spark, sf_dir)
        .groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for d, n in cont.items():
        assert 0 < n <= sh_counts[d]


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_dir):
    """The MinHash estimator must track the exact shingle Jaccard on the
    band-candidate pairs: with k=8 hashes the estimator's std is
    sqrt(J(1-J)/8) <= ~0.18, so mean |estimate - exact| across candidate
    pairs stays well under 250 permille, and pairs the exact metric calls
    near-identical (>= 900) must estimate high (>= 500)."""
    from concordium_transaction_logger_spark.operators import dedup

    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard_permille"]
        for r in dedup.minhash_jaccard_estimate(spark, sf_dir).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard_permille"]
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir, 0, max_df=None).collect()
    }
    assert est, "no band-candidate pairs at this sf"
    common = [k for k in est if k in exact]
    assert common
    mae = sum(abs(est[k] - exact[k]) for k in common) / len(common)
    assert mae <= 250, f"estimator MAE too high: {mae:.0f} permille"
    for k in common:
        if exact[k] >= 900:
            assert est[k] >= 500, f"{k}: exact {exact[k]} but estimate {est[k]}"


def test_dedup_survivors_partition_documents(spark, sf_dir):
    """Survivors are exactly the component keepers: every document is
    accounted for by exactly one survivor (sum of 1 + n_absorbed = corpus
    size), and no survivor is itself a dropped doc."""
    from concordium_transaction_logger_spark.operators import dedup
    from concordium_transaction_logger_spark.sources.tables import load_table

    surv = dedup.dedup_survivors(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(1 + r["n_absorbed"] for r in surv) == n_docs
    verdict = {r["doc_id"]: r["keep"] for r in dedup.dedup_verdict(spark, sf_dir).collect()}
    assert all(verdict[r["doc_id"]] for r in surv)
    assert len(surv) == sum(verdict.values())


def test_star_components_match_hash_min(spark, sf_dir):
    """Both component algorithms (hash-min propagation and large-star/
    small-star contraction) must label the corpus identically."""
    a = sorted(
        tuple(r) for r in dedup.dup_components(spark, sf_dir).collect()
    )
    b = sorted(
        tuple(r) for r in dedup.dup_components_star(spark, sf_dir).collect()
    )
    assert a == b


def test_star_contraction_converges_on_long_chains(spark):
    """The shape hash-min is worst at: a 200-node chain needs ~200
    hash-min rounds but must finish in O(log² n) star rounds — max_iter
    12 passing IS the convergence-rate assertion."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "a long, b long"
    )
    rows = dedup.star_components(edges, max_iter=12).collect()
    assert {r.component_id for r in rows} == {0}
    assert {r.node for r in rows} == set(range(200))


def test_star_components_match_union_find_on_random_graphs(spark):
    """Property check against an independent driver-side union-find:
    random sparse graphs (seeded) must get identical component labeling
    from the distributed star contraction."""
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 120
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(30, 140))
            }
        )
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {}
        for a, b in edges:
            for v in (a, b):
                want[v] = find(v)
        # canonical label = component min
        comp_min = {}
        for v, r in want.items():
            comp_min.setdefault(r, v if False else min(
                [u for u in want if find(u) == r]
            ))
        want = {v: comp_min[find(v)] for v in want}

        got = {
            r.node: r.component_id
            for r in dedup.star_components(
                spark.createDataFrame(edges, "a long, b long"), max_iter=15
            ).collect()
        }
        assert got == want, f"seed {seed}"


def test_shuffle_shards_is_a_deterministic_permutation(spark, sf_dir):
    """The pre-training shuffle must be a permutation of the corpus
    (every doc exactly once), contiguous within each shard (positions
    1..n), ordered by the hash key, and byte-identical across re-runs
    (retry stability — the whole point of hash keys over rand())."""
    a = sampling.shuffle_shards(spark, sf_dir).collect()
    b = sampling.shuffle_shards(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    docs = {r.doc_id for r in a}
    from concordium_transaction_logger_spark.sources.tables import load_table

    assert docs == {
        r.doc_id for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()
    }
    by_shard: dict[int, list] = {}
    for r in a:
        by_shard.setdefault(r.shard_id, []).append(r)
    assert set(by_shard) <= set(range(sampling.N_SHUFFLE_SHARDS))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.shard_pos)
        assert [r.shard_pos for r in rows] == list(range(1, len(rows) + 1))
        keys = [(r.skey, r.doc_id) for r in rows]
        assert keys == sorted(keys)
        assert all(r.skey % sampling.N_SHUFFLE_SHARDS == shard for r in rows)


def test_passage_chunks_cover_every_token_exactly(spark, sf_dir):
    """Chunk-manifest invariants: chunk count = ceil'(n_tokens/stride)
    (with the >=1-chunk floor), starts are 0, stride, 2*stride, ..., the
    last chunk reaches the final token, and consecutive chunks overlap by
    window - stride (except a short last chunk)."""
    from concordium_transaction_logger_spark.operators.sampling import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        passage_chunks,
    )
    from concordium_transaction_logger_spark.operators.textstats import tokens
    from concordium_transaction_logger_spark.sources.tables import load_table

    chunks = passage_chunks(spark, sf_dir).persist()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max(F.col("start_tok") + F.col("n_chunk_tokens")).alias("covered"),
            F.min("start_tok").alias("first_start"),
            F.max(
                F.when(
                    F.col("start_tok") + F.col("n_chunk_tokens")
                    < F.col("start_tok") + CHUNK_WINDOW,
                    0,
                ).otherwise(F.col("n_chunk_tokens") - CHUNK_WINDOW)
            ).alias("overflow"),
        )
        .join(docs, "doc_id")
    )
    bad = per_doc.filter(
        (F.col("first_start") != 0)
        | (F.col("covered") != F.col("n_tokens"))
        | (
            F.col("n_chunks")
            != F.floor(F.greatest(F.col("n_tokens") - 1, F.lit(0)) / CHUNK_STRIDE) + 1
        )
        | (F.col("overflow") > 0)
    ).count()
    assert bad == 0
    # every document emits at least one chunk (empty docs included)
    assert per_doc.count() == docs.count()
    chunks.unpersist()


def test_bloom_contamination_has_no_false_negatives(spark, sf_dir):
    """The Bloom probe may over-count (false positives) but never
    under-counts: per val document, n_bloom_hits >= the exact join's
    n_shared_shingles, and n_bloom_hits <= n_shingles. Every val doc with
    shingles gets a row — 'clean' is an explicit 0, not an absent row."""
    from concordium_transaction_logger_spark.operators.sampling import (
        bloom_contamination,
        split_contamination,
    )

    bloom = bloom_contamination(spark, sf_dir).persist()
    exact = split_contamination(spark, sf_dir).withColumnRenamed(
        "n_shared_shingles", "n_exact"
    )
    joined = bloom.join(exact, "doc_id", "left").fillna({"n_exact": 0})
    bad = joined.filter(
        (F.col("n_bloom_hits") < F.col("n_exact"))
        | (F.col("n_bloom_hits") > F.col("n_shingles"))
    ).count()
    assert bad == 0
    # every exact-contaminated doc appears in the bloom audit
    missing = exact.join(bloom, "doc_id", "left_anti").count()
    assert missing == 0
    bloom.unpersist()
