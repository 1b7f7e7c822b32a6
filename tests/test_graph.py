"""Independent-reference tests for the graph-analytics family: the
DuckDB parity test proves Spark == oracle, these prove both != wrong —
each operator is replayed by a from-scratch pure-Python implementation
on the real sf0.001 corpus and compared value-for-value."""

from __future__ import annotations

import itertools
import re
from collections import Counter, defaultdict

from concordium_transaction_logger_spark.operators import dedup, graph, textstats

TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _tokens(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower()) if t]


def test_trade_pagerank_matches_python_reference(spark, sf_dir):
    edges = [
        (r.src, r.dst, r.w)
        for r in graph._trade_edges(spark, sf_dir).collect()
    ]
    nodes = {r.node for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
             .selectExpr("CAST(c_custkey AS BIGINT) * 2 AS node").collect()}
    nodes |= {r.node for r in spark.read.parquet(f"{sf_dir}/supplier.parquet")
              .selectExpr("CAST(s_suppkey AS BIGINT) * 2 + 1 AS node").collect()}

    wout: dict[int, int] = defaultdict(int)
    for s, _, w in edges:
        wout[s] += w
    r = {n: graph.PR_MASS_MICRO for n in nodes}
    for _ in range(graph.PR_ITERS):
        inc: dict[int, int] = defaultdict(int)
        for s, d, w in edges:
            inc[d] += (graph.PR_DAMPING_PERMILLE * r[s] * w) // (1000 * wout[s])
        r = {n: graph.PR_BASE_MICRO + inc.get(n, 0) for n in nodes}

    expected = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[: graph.PR_TOP]
    got = graph.trade_pagerank(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for row, (node, rank) in zip(got, expected):
        assert row.node_kind == ("customer" if node % 2 == 0 else "supplier")
        assert row.node_key == node // 2
        assert row.rank_micro == rank
    # Mass sanity: floor division only LEAKS mass, never creates it.
    assert sum(r.values()) <= graph.PR_MASS_MICRO * len(nodes)
    # Isolated nodes sit exactly at the teleport floor.
    isolated = nodes - {s for s, _, _ in edges}
    if isolated:
        n = next(iter(isolated))
        assert r[n] == graph.PR_BASE_MICRO


def test_pagerank_contribution_survives_int64_overflow_scale(spark):
    """The r5-ADVICE overflow hazard: 850 * r * w with hub-concentrated
    rank (r up to ~N*10^6) and unbounded trade counts exceeds int64 —
    all-BIGINT arithmetic would raise under ANSI (Spark 4 default) and
    wrap silently without it. The DECIMAL(38,0) treatment covers BOTH
    sides of the DIV. w = wout = 10^16 makes the numerator 850 * 10^6 *
    10^16 = 8.5*10^24 > 2^63 AND the denominator 1000 * 10^16 =
    10^19 > 2^63; the correct contribution is just 850_000
    (w/wout = 1)."""
    from concordium_transaction_logger_spark.operators import graph

    # big enough that BOTH 850*r*w and the denominator's own 1000*wout
    # exceed int64 — either all-BIGINT side would raise under ANSI
    big_w = 10_000_000_000_000_000
    e = spark.createDataFrame(
        [(0, 1, big_w, big_w)], "src long, dst long, w long, wout long"
    )
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    rows = {
        (r.node_kind, r.node_key): r.rank_micro
        for r in graph.pagerank_over_edges(e, nodes, iters=1, top=10).collect()
    }
    base = graph.PR_BASE_MICRO
    damp = graph.PR_DAMPING_PERMILLE
    # node 1 receives all of node 0's damped mass; node 0 only teleport
    assert rows[("supplier", 0)] == base + (damp * graph.PR_MASS_MICRO) // 1000
    assert rows[("customer", 0)] == base


def test_dedup_graph_triangles_matches_bruteforce(spark, sf_dir):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_band_pairs(spark, sf_dir).collect()
    }
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    n_nodes = len(adj)
    n_edges = len(pairs)
    n_wedges = sum(d * (d - 1) // 2 for d in (len(v) for v in adj.values()))
    n_tri = sum(
        1
        for a, b in pairs
        for c in adj[a] & adj[b]
        if c > b  # each triangle once: a < b < c with pairs canonical a < b
    )
    row = graph.dedup_graph_triangles(spark, sf_dir).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        n_nodes,
        n_edges,
        n_wedges,
        n_tri,
    )
    expect_ppm = (3000 * n_tri) // n_wedges if n_wedges else 0
    assert row.closure_permille == expect_ppm
    # The band graph is built from 2 bands: it MUST have some structure on
    # the test corpus or this test is vacuous.
    assert n_edges > 0


def test_tfidf_cosine_pairs_matches_python_reference(spark, sf_dir):
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    n_docs = len(docs)

    def _shingles(text: str) -> Counter:
        t = _tokens(text)
        return Counter(" ".join(t[i : i + 3]) for i in range(len(t) - 2))

    tf = {d: _shingles(t) for d, t in docs.items()}
    df = Counter(tok for c in tf.values() for tok in c)
    idf = {
        tok: len(bin(n_docs)[2:]) - len(bin(k)[2:])
        for tok, k in df.items()
    }
    w = {
        d: {tok: k * idf[tok] for tok, k in c.items() if idf[tok] > 0}
        for d, c in tf.items()
    }
    norm2 = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    capped = {
        d: {tok: x for tok, x in ws.items() if df[tok] <= dedup.DEFAULT_MAX_DF}
        for d, ws in w.items()
    }
    expected = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        shared = capped[a].keys() & capped[b].keys()
        if not shared:
            continue
        dot = sum(capped[a][t] * capped[b][t] for t in shared)
        ppm = (1_000_000 * dot * dot) // (norm2[a] * norm2[b])
        if ppm >= 250_000:
            expected[(a, b)] = (dot, ppm)
    got = {
        (r.doc_a, r.doc_b): (r.dot, r.cos2_ppm)
        for r in dedup.tfidf_cosine_pairs(spark, sf_dir).collect()
    }
    assert got == expected
    # Non-vacuity: the corpus must produce qualifying pairs AND the
    # threshold must actually reject something (an operator whose filter
    # broke open or shut would fail one of these).
    assert got
    below = sum(
        1
        for a, b in itertools.combinations(sorted(docs), 2)
        if (a, b) not in expected
        and capped[a].keys() & capped[b].keys()
    )
    assert below > 0


def test_tfidf_norm_join_gate_fallback_is_value_identical(spark, sf_dir, monkeypatch):
    """The r11 broadcast gate on the norm joins: when the corpus exceeds
    the threshold the norm attach falls back from broadcast to a
    shuffled-hash join — same rows either way (a join strategy cannot
    change values), and the fallback plan must really drop the
    broadcast of the norm frames."""
    from concordium_transaction_logger_spark.plans import layout

    want = sorted(
        tuple(r) for r in dedup.tfidf_cosine_pairs(spark, sf_dir).collect()
    )
    monkeypatch.setattr(dedup, "NORM_BROADCAST_MAX_CORPUS_BYTES", 0)
    df = dedup.tfidf_cosine_pairs(spark, sf_dir)
    got = sorted(tuple(r) for r in df.collect())
    assert got == want
    # with a 0-byte gate no norm frame may broadcast: the two norm
    # attaches must plan as non-broadcast joins (the pair-frame side
    # is hash-attached, not collected)
    plan = layout.explain_str(df, "simple")
    assert "ShuffledHashJoin" in plan


def test_token_cms_topk_one_sided_and_matches_reference(spark, sf_dir):
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt: Counter = Counter()
    for r in docs:
        cnt.update(_tokens(r.text))

    def col(tok: str, j: int) -> int:
        h = hashlib.md5(f"{tok}#cms{j}".encode()).hexdigest()
        return int(h[:8], 16) % textstats.CMS_WIDTH

    cells: dict[tuple[int, int], int] = defaultdict(int)
    for tok, k in cnt.items():
        for j in range(textstats.CMS_DEPTH):
            cells[(j, col(tok, j))] += k

    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[: textstats.CMS_TOP]
    got = textstats.token_cms_topk(spark, sf_dir).collect()
    assert [(r.tok, r.exact_n) for r in got] == top
    for r in got:
        est = min(cells[(j, col(r.tok, j))] for j in range(textstats.CMS_DEPTH))
        assert r.cms_n == est
        assert r.cms_n >= r.exact_n  # one-sided error, the CMS contract
        assert r.overestimate == r.cms_n - r.exact_n


def test_embedding_split_contamination_subset_of_exact(spark, sf_dir):
    """The blocked decontamination verdict must be a strict SUBSET view of
    the exact all-pairs audit: every reported val vector, its match count,
    and its max similarity are bounded by the exact val↔train pair set
    (blocking can only lose cross-cluster pairs, never invent one), and
    every reported vector really is a val vector under the split rule."""
    import hashlib

    from concordium_transaction_logger_spark.operators import similarity

    def is_val(vec_id: int) -> bool:
        h = hashlib.md5(f"{vec_id}#v1".encode()).hexdigest()
        return int(h[:8], 16) % 1000 < 100

    exact = defaultdict(list)
    for r in similarity.near_dup_pairs(spark, sf_dir, 400_000).collect():
        for v, t in ((r.vec_a, r.vec_b), (r.vec_b, r.vec_a)):
            if is_val(v) and not is_val(t):
                exact[v].append(r.sim_micro)

    got = similarity.embedding_split_contamination(spark, sf_dir).collect()
    assert got  # non-vacuous on the test corpus
    for r in got:
        assert is_val(r.vec_id)
        assert r.vec_id in exact
        assert r.n_train_matches <= len(exact[r.vec_id])
        assert r.max_sim_micro <= max(exact[r.vec_id])
        assert r.max_sim_micro >= 400_000


def test_trade_graph_components_matches_union_find(spark, sf_dir):
    """Star contraction over the trade graph must equal a from-scratch
    union-find on the same edges. (On this corpus every customer has
    orders, so the graph is one component — the singleton branch is
    exercised by the orphan-corpus test below.)"""
    edges = [
        (r.src, r.dst)
        for r in graph._trade_edges(spark, sf_dir).collect()
        if r.src < r.dst
    ]
    nodes = {r.node for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
             .selectExpr("CAST(c_custkey AS BIGINT) * 2 AS node").collect()}
    nodes |= {r.node for r in spark.read.parquet(f"{sf_dir}/supplier.parquet")
              .selectExpr("CAST(s_suppkey AS BIGINT) * 2 + 1 AS node").collect()}

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(list)
    for n in nodes:
        comp[find(n)].append(n)
    # canonical label = component min (matches both engines' MIN rule)
    expected = sorted(
        (
            (
                min(ms),
                len(ms),
                sum(1 for m in ms if m % 2 == 0),
                sum(1 for m in ms if m % 2 == 1),
            )
            for ms in comp.values()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    got = [
        (r.component_id, r.n_nodes, r.n_customers, r.n_suppliers)
        for r in graph.trade_graph_components(spark, sf_dir).collect()
    ]
    assert got == expected
    # Structure sanity: every node is accounted for exactly once, and the
    # giant component spans both sides of the bipartite graph (on this
    # corpus every customer has orders, so ONE component is correct —
    # the union-find equality above is the real check).
    assert sum(t[1] for t in expected) == len(nodes)
    assert expected[0][2] > 0 and expected[0][3] > 0


def test_trade_graph_components_singletons(spark, sf_dir, tmp_path):
    """The singleton branch (a customer with NO orders must surface as
    its own 1-node component) — the base corpora never exercise it, so
    this builds a corpus with one orphan customer appended."""
    import os

    from pyspark.sql import functions as F

    d = str(tmp_path / "corpus")
    os.makedirs(d)
    for t in (
        "orders", "lineitem", "supplier", "region", "nation",
        "part", "events", "documents", "embeddings",
    ):
        os.symlink(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orphan = cust.agg(F.max("c_custkey")).first()[0] + 1000
    extra = cust.limit(1).select(
        F.lit(orphan).cast(dict(cust.dtypes)["c_custkey"]).alias("c_custkey"),
        *[c for c in cust.columns if c != "c_custkey"],
    )
    cust.unionByName(extra).write.parquet(f"{d}/customer.parquet")

    rows = graph.trade_graph_components(spark, d).collect()
    singles = {r.component_id: r for r in rows if r.n_nodes == 1}
    assert orphan * 2 in singles
    assert singles[orphan * 2].n_customers == 1
    assert singles[orphan * 2].n_suppliers == 0
    n_supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").count()
    assert sum(r.n_nodes for r in rows) == cust.count() + 1 + n_supp
