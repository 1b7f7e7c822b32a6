"""Scan-level optimizer evidence: filters reach the parquet scan
(PushedFilters) and ReadSchema is pruned to the referenced columns —
the difference between reading 6 columns and reading 100 TB of all of
them (SCALE.md rule 2)."""

from __future__ import annotations

from concordium_transaction_logger_spark.operators import relational
from concordium_transaction_logger_spark.plans import layout


def test_pricing_summary_pushes_shipdate_filter(spark, sf_dir):
    df = relational.pricing_summary(spark, sf_dir)
    pf = layout.pushed_filters(df)
    assert "l_shipdate" in pf, f"shipdate filter must reach the scan, got: {pf!r}"


def test_pricing_summary_prunes_scan_columns(spark, sf_dir):
    plan = layout.explain_str(relational.pricing_summary(spark, sf_dir))
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, "formatted plan must show ReadSchema"
    schema_line = read_schemas[0]
    assert "l_comment" not in schema_line, "unreferenced columns must be pruned"
    for col in ("l_shipdate", "l_quantity", "l_extendedprice", "l_discount"):
        assert col in schema_line


def test_top_orders_pushes_both_date_filters(spark, sf_dir):
    df = relational.top_orders_by_revenue(spark, sf_dir)
    pf = layout.pushed_filters(df)
    assert "l_shipdate" in pf and "o_orderdate" in pf


def test_aggregation_is_partial_then_final(spark, sf_dir):
    """SCALE.md rule 4: the shuffle carries |groups| rows, not |input| —
    the plan must show a map-side partial HashAggregate below the
    Exchange and the final one above it."""
    plan = layout.explain_str(relational.pricing_summary(spark, sf_dir), "simple")
    assert "partial_sum" in plan and plan.count("HashAggregate") >= 2
    assert plan.index("HashAggregate") < plan.index("partial_sum"), (
        "final aggregate above, partial below the Exchange"
    )


def test_nation_monthly_cumulative_broadcasts_dims(spark, sf_dir):
    """SCALE.md rules 3-4: both dimension joins broadcast (the orders fact
    never shuffles for the join) and the cumulative frame runs above a
    partial/final aggregate pair — the window sees |nation x month| rows."""
    df = relational.nation_monthly_cumulative(spark, sf_dir)
    plan = layout.explain_str(df, "simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "partial_sum" in plan and plan.count("HashAggregate") >= 2
    assert "Window" in plan


def test_big_volume_orders_broadcasts_having_keyset(spark, sf_dir):
    """The HAVING survivors (tiny keyset) and customer dim broadcast —
    the orders fact never shuffles for a join; final top-k is a
    TakeOrderedAndProject, not a full sort."""
    plan = layout.explain_str(relational.big_volume_orders(spark, sf_dir), "simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_part_supplier_variety_anti_join_is_broadcast(spark, sf_dir):
    """NOT IN exclusion plans as a broadcast left-anti join (the deficit
    list is tiny); lineitem shuffles only for the distinct aggregate."""
    plan = layout.explain_str(relational.part_supplier_variety(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan and plan.count("HashAggregate") >= 2


def test_cube_and_grouping_sets_expand_map_side(spark, sf_dir):
    """CUBE / GROUPING SETS plan as one map-side Expand + a single
    partial/final aggregate pair — never one pass per grouping level."""
    for fn in (relational.order_status_cube, relational.priority_status_grouping_sets):
        plan = layout.explain_str(fn(spark, sf_dir), "simple")
        assert "Expand" in plan
        assert "partial_" in plan and plan.count("HashAggregate") >= 2
        assert plan.count("Expand") == 1


def test_small_quantity_revenue_broadcasts_per_part_agg(spark, sf_dir):
    """The decorrelated per-part average joins back as a broadcast —
    lineitem is scanned, never shuffled, for the fraction-of-average
    filter."""
    plan = layout.explain_str(relational.small_quantity_revenue(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_sliding_window_is_generate_then_partial_agg(spark, sf_dir):
    """The sliding window explodes each event into its two windows
    (Generate) *after* column pruning, then partial-aggregates — the
    shuffle carries |windows x types| rows, not 2x the event count."""
    plan = layout.explain_str(relational.event_type_sliding(spark, sf_dir), "simple")
    assert "Generate" in plan
    assert "partial_" in plan and plan.count("HashAggregate") >= 2


def test_funnel_and_retention_never_cartesian(spark, sf_dir):
    """Funnel stages and the cohort join are equi-joins on user_id with
    partial aggregation — no nested-loop/cartesian anywhere."""
    for fn in (relational.event_funnel, relational.weekly_retention):
        plan = layout.explain_str(fn(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "partial_" in plan and plan.count("HashAggregate") >= 2


def test_set_ops_plan_as_hash_joins(spark, sf_dir):
    """INTERSECT/EXCEPT plan as dedup aggregate + semi/anti join, never a
    cartesian or nested loop."""
    for fn in (relational.repeat_customers, relational.churned_customers):
        plan = layout.explain_str(fn(spark, sf_dir), "simple")
        assert "Join" in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_disjunctive_part_revenue_pushes_hull_prefilters(spark, sf_dir):
    """Q19 shape: the OR-of-ANDs stays as the join residual, but its
    sargable hull (quantity 1..30, brand IN list) must reach the scans —
    at 100 TB the hull is what keeps the broadcast probe small."""
    df = relational.disjunctive_part_revenue(spark, sf_dir)
    pf = layout.pushed_filters(df)
    assert "l_quantity" in pf, f"quantity hull must reach the lineitem scan: {pf!r}"
    assert "p_brand" in pf, f"brand list must reach the part scan: {pf!r}"


def test_market_share_is_single_pass_conditional_agg(spark, sf_dir):
    """Q8 shape: numerator and denominator come from ONE scan of lineitem
    (conditional aggregation), never a self-join or union of two scans."""
    plan = layout.explain_str(relational.nation_market_share(spark, sf_dir), "simple")
    scans = [l for l in plan.splitlines() if "Scan parquet" in l and "lineitem" in l]
    assert len(scans) == 1, f"lineitem must be scanned exactly once, got {len(scans)}"
    assert "Union" not in plan


def test_lone_late_supplier_single_pass_aggregate(spark, sf_dir):
    """Q21 shape (r11): both correlated EXISTS checks fold into one
    per-order conditional min/max aggregate over ONE lineitem scan —
    no pair-frame LeftSemi/LeftAnti self-joins, no DISTINCT shuffle;
    the supplier dimension broadcasts; the final top-10 is
    TakeOrderedAndProject."""
    plan = layout.explain_str(relational.lone_late_supplier(spark, sf_dir), "simple")
    scans = [l for l in plan.splitlines() if "Scan parquet" in l and "lineitem" in l]
    assert len(scans) == 1, f"lineitem must be scanned exactly once, got {len(scans)}"
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_nation_pair_volume_prefilters_dims_before_fact_join(spark, sf_dir):
    """Q7 shape: the nation-pair filter lands in the supplier/customer
    dimension branches (broadcast), never as a post-join filter over an
    unfiltered fact join; the pair residual is the only remaining OR."""
    df = relational.nation_pair_volume(spark, sf_dir)
    plan = layout.explain_str(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    pf = layout.pushed_filters(df)
    assert "l_shipdate" in pf


def test_part_margin_pushes_contains_filter(spark, sf_dir):
    """Q9 shape: the name-contains predicate must reach the part scan as a
    StringContains pushed filter — it prunes the broadcast build side."""
    df = relational.part_margin_by_nation(spark, sf_dir)
    pf = layout.pushed_filters(df)
    assert "p_name" in pf and ("Contains" in pf or "contains" in pf), pf


def test_peak_revenue_scalar_max_is_broadcast_not_window(spark, sf_dir):
    """Q15 shape: the global max joins back as a broadcast 1-row frame —
    never a single-task global window over the rollup."""
    plan = layout.explain_str(relational.peak_revenue_suppliers(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_forecast_revenue_pushes_range_filters(spark, sf_dir):
    """Q6 shape: shipdate range and quantity bound must reach the parquet
    scan; only the integer-bucketed discount band stays as a residual."""
    df = relational.forecast_revenue_change(spark, sf_dir)
    pf = layout.pushed_filters(df)
    assert "l_shipdate" in pf and "l_quantity" in pf, pf


def test_concentrated_revenue_total_is_single_row_broadcast(spark, sf_dir):
    """Q11 shape: the HAVING-against-global-total compares to a broadcast
    1-row aggregate — never a global window over the rollup."""
    plan = layout.explain_str(relational.concentrated_part_revenue(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_cheapest_supplier_min_joins_back_broadcast(spark, sf_dir):
    """Q2 shape: the per-part MIN decorrelates to a broadcast join-back,
    and the region-filtered supplier dim broadcasts into the fact scan."""
    plan = layout.explain_str(relational.cheapest_supplier_per_part(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_dominant_suppliers_semi_join(spark, sf_dir):
    """Q20 shape: winners reach the supplier dimension as a semi join, so
    supplier rows are never duplicated per dominated part."""
    plan = layout.explain_str(relational.dominant_part_suppliers(spark, sf_dir), "simple")
    assert "LeftSemi" in plan


def test_mixture_plan_total_is_single_row_broadcast(spark, sf_dir):
    """Mixture planner: the global token total re-aggregates the per-lang
    rollup and broadcasts back (1 row) — never a global window."""
    from concordium_transaction_logger_spark.operators import sampling

    plan = layout.explain_str(sampling.mixture_plan(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_bigram_repetition_is_shuffle_free(spark, sf_dir):
    """Intra-doc repetition is row-local array math — no Exchange
    anywhere in the plan (the global sort for display is the only
    allowed one)."""
    from concordium_transaction_logger_spark.operators import textstats

    df = textstats.bigram_repetition(spark, sf_dir)
    plan = layout.explain_str(df.limit(10), "simple")
    assert "Join" not in plan


def test_column_profile_scans_once(spark, sf_dir):
    """The ANALYZE-style profile reads the table exactly once — all
    per-column aggregates share a single scan."""
    df = relational.events_column_profile(spark, sf_dir)
    plan = layout.explain_str(df, "simple")
    n_scans = plan.count("FileScan") or plan.count("Scan parquet")
    assert n_scans == 1, plan


def test_no_query_plans_a_cartesian_product(spark, sf_dir):
    """Fleet-wide plan hygiene: no registry query may plan a
    CartesianProduct — every pair-generating shape must be a broadcast
    nested loop (bounded build side) or a keyed join. A Cartesian here
    would be quadratic shuffle I/O at 100 TB.

    The ~180 explains are independent driver-side work (Catalyst
    planning, plus whatever construction-time jobs a query's builder
    runs), so they fan out over a small thread pool — the suite's
    single most expensive cell dropped 51 s -> ~1/6th with identical
    coverage. The session index memo (cache.get_or_build) is unlocked,
    so the shared artifacts are warmed SERIALLY first; the pool then
    only reads the memo."""
    from concurrent.futures import ThreadPoolExecutor

    from concordium_transaction_logger_spark.ingest.derive import (
        block_feed,
        n_users_for,
    )
    from concordium_transaction_logger_spark.operators import (
        dedup,
        graph,
        similarity,
        textstats,
    )
    from concordium_transaction_logger_spark.registry import REGISTRY

    n_users_for(spark, sf_dir)
    block_feed(spark, sf_dir)
    dedup.shingle_index(spark, sf_dir)
    dedup.minhash_index(spark, sf_dir)
    dedup.band_buckets(spark, sf_dir)
    similarity.centroids_for(spark, sf_dir)
    similarity.ivf_index(spark, sf_dir)
    similarity.lsh_index(spark, sf_dir)
    similarity.kmeans_index(spark, sf_dir)
    similarity.pq_index(spark, sf_dir)
    textstats.winnow_index(spark, sf_dir)
    graph.trade_graph_index(spark, sf_dir)

    def check(item):
        name, qd = item
        try:
            plan = layout.explain_str(qd.spark(spark, sf_dir), "simple")
        except Exception as exc:  # pragma: no cover - surface as failure
            return f"{name}: explain failed: {exc}"
        return name if "CartesianProduct" in plan else None

    with ThreadPoolExecutor(max_workers=8) as pool:
        offenders = [r for r in pool.map(check, REGISTRY.items()) if r]
    assert not offenders, offenders


def test_bm25_tokenizes_the_corpus_once(spark, sf_dir):
    """r11 (guide §1.2): bm25's per-doc tf frame is pinned, so the
    broadcast stats aggregate and the scored branch share ONE
    scan+tokenize pass — the plan's only inputs are the pinned RDD
    (Scan ExistingRDD), never a second parquet scan of documents. The
    pre-pin shape (plans/r11/doc_bm25_topk_before.txt) showed two."""
    from concordium_transaction_logger_spark.operators import retrieval

    plan = layout.explain_str(retrieval.bm25_topk(spark, sf_dir), "formatted")
    assert plan.count("Scan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_span_family_tokenizes_the_corpus_once(spark, sf_dir):
    """r11 (guide §1.2): the span family pins the tokenized corpus, so
    the window-hash explode and the per-doc length/token consumers share
    ONE scan+tokenize pass — the query tree's only inputs are the pinned
    RDD, never a second parquet scan of documents (the pre-pin shape,
    plans/r11/doc_duplicate_spans_before.txt, showed two full parses;
    dedup_clean_text had three)."""
    from concordium_transaction_logger_spark.operators import dedup

    for fn in (dedup.duplicate_spans, dedup.dedup_clean_text, dedup.span_admission):
        plan = layout.explain_str(fn(spark, sf_dir), "formatted")
        assert plan.count("Scan parquet") == 0, (fn.__name__, plan)
        assert "Scan ExistingRDD" in plan, (fn.__name__, plan)


def test_duplicate_spans_single_count_window_no_join_for_df(spark, sf_dir):
    """The span-occurrence count is ONE hash-partitioned window over the
    window-hash key — not a groupBy+join (which would shuffle the same
    occurrence rows twice); the two island windows share one doc_id
    sort; nothing cartesian."""
    from concordium_transaction_logger_spark.operators import dedup

    plan = layout.explain_str(dedup.duplicate_spans(spark, sf_dir), "simple")
    assert plan.count("Window") == 3  # count-by-hash + prev-end + island-sum
    assert "CartesianProduct" not in plan
    # the only join is the final left-outer stats attach onto the doc spine
    assert plan.count("Join") == 1


def test_unigram_surprisal_total_is_broadcast_single_row(spark, sf_dir):
    """The corpus total rides a 1-row broadcast; the vocab join is an
    equi-join on tok; occurrence rows pre-aggregate before joining."""
    from concordium_transaction_logger_spark.operators import textstats

    plan = layout.explain_str(textstats.unigram_surprisal(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_" in plan


def test_shuffle_shards_no_global_sort(spark, sf_dir):
    """The pre-training shuffle must never plan a global ORDER BY over the
    corpus: ranking happens in shard-partitioned windows. The only
    rangepartitioning Exchange allowed is the final presentation sort of
    the (already tiny) ranked output — the Window itself must be fed by a
    hashpartitioning Exchange on shard_id."""
    from concordium_transaction_logger_spark.operators import sampling

    df = sampling.shuffle_shards(spark, sf_dir)
    plan = layout.explain_str(df, "formatted")
    assert "Window" in plan
    w_ex = [l for l in plan.splitlines() if "hashpartitioning(shard_id" in l]
    assert w_ex, "window must partition by shard_id"
