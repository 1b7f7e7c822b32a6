#!/usr/bin/env python
"""Regenerate PLANS.md: the measured physical-plan evidence behind
SCALE.md's claims, for a curated set of headline queries.

Each section is the `.explain("formatted")` operator tree (node detail
blocks trimmed) captured at $SPARK_GRAFT_SF_DIR (default sf0.01) — small
inputs, but plan SHAPE is what the file documents: broadcasts vs
sort-merge joins, pushed filters, single-scan profiles, absence of
Cartesian products and windows where a broadcast argmax was promised."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from concordium_transaction_logger_spark import build_session
from concordium_transaction_logger_spark.plans import layout
from concordium_transaction_logger_spark.registry import REGISTRY

HEADLINE = [
    "account_txs_desc",
    "pricing_summary",
    "nation_revenue",
    "peak_revenue_suppliers",
    "concentrated_part_revenue",
    "lone_late_supplier",
    "doc_ngram_jaccard_pairs",
    "doc_duplicate_spans",
    "doc_minhash_band_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup_pairs_blocked",
    "embedding_semdedup_pairs",
    "embedding_semdedup_pairs_2level",
    "cis2_supply_wide",
    "doc_length_percentiles",
    "customer_spend_deciles",
    "asof_purchase_last_click",
    "events_column_profile",
    "doc_bm25_topk",
    "corpus_source_overlap",
    "doc_bigram_surprisal",
    "doc_passage_chunks",
    "doc_chunk_dup_groups",
    "doc_bloom_contamination",
    "ann_ivf_pq_topk",
    "graph_trade_pagerank",
    "trade_graph_components",
    "dedup_graph_triangles",
    "doc_tfidf_cosine_pairs",
    "token_cms_topk",
    "event_zorder_manifest",
    "customer_fuzzy_matches",
    "customer_match_components",
    # r8: the minhash-band key provider through the same verify kernel,
    # the blocking capacity profile, and the hashed-gram collision audit
    "customer_fuzzy_matches_minhash",
    "customer_fuzzy_matches_sorted",
    "customer_match_evidence",
    "customer_block_profile",
    "gram_hash_collision_audit",
    # r9: the band-cap audit twin, the provider-parametrized evidence
    # over the capped minhash pairs, the decision layer, and the m/u
    # field-odds estimator (banded tolerance self-join + 1-row
    # broadcast folds)
    "customer_stop_bands",
    "customer_match_evidence_minhash",
    "customer_match_verdict",
    "customer_match_field_odds",
    "customer_golden_record",
    # r10: the estimated-weights verdict (odds CTEs + one 1-row
    # broadcast weight cross join) and the planner's recommendation
    # (three provider profiles + a 1-row broadcast hot-share fold)
    "customer_match_verdict_estimated",
    "customer_blocking_plan",
    # the sampled u(name_close) estimator: fixed-size hash sample
    # self-compared via one bounded-Levenshtein cross join — the plan
    # must show the sample filter BEFORE the join (pair work constant
    # at any corpus size)
    "customer_match_field_odds_sampled",
]


def tree_only(formatted: str) -> str:
    """Keep the physical-plan tree; drop the per-node detail blocks."""
    lines = formatted.splitlines()
    out = []
    for ln in lines:
        if ln.startswith("== Physical Plan =="):
            continue
        if not ln.strip():  # first blank line ends the tree section
            break
        out.append(ln.rstrip())
    return "\n".join(out)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sections = []
    for name in HEADLINE:
        df = REGISTRY[name].spark(spark, sf_dir)
        tree = tree_only(layout.explain_str(df, "formatted"))
        pushed = layout.pushed_filters(df)
        sections.append(
            f"## {name}\n\n```\n{tree}\n```\n\n"
            f"Pushed filters: `{pushed or '(none)'}`\n"
        )
    # The bucketed-layout point query lives outside the registry (it
    # needs a bucketed table materialized first) but its pruning evidence
    # is the PK(account,id)-analog claim — keep it in the regenerated file.
    from concordium_transaction_logger_spark.ingest import derive

    feed = derive.block_feed(spark, sf_dir)
    layout.write_ati_bucketed(derive.ati(feed), "ati_plan_audit", n_buckets=8)
    try:
        df = layout.query_account_over_layout(spark, "ati_plan_audit", 7, limit=20)
        plan = layout.explain_str(df, "formatted")
        assert "SelectedBucketsCount: 1 out of 8" in plan
        sections.append(
            "## query_account over the bucketed layout (PK(account,id) analog)\n\n"
            "The account equality predicate prunes the bucket-by-account layout\n"
            "to ONE of 8 buckets (`SelectedBucketsCount: 1 out of 8`) and the\n"
            "keyset top-k plans as `TakeOrderedAndProject` over the one sorted\n"
            "bucket — the storage-layout twin of the reference's index probe\n"
            "(m0001-initial.sql:18, postgres.rs:97-99). Asserted in\n"
            "`tests/test_layout.py::test_account_point_query_prunes_to_one_bucket`.\n\n"
            "```\n" + plan.strip() + "\n```\n"
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS ati_plan_audit")

    body = (
        "# PLANS — captured physical-plan evidence\n\n"
        f"Generated by `python plan_audit.py` at `{sf_dir}` — regenerate "
        "after plan-affecting changes. Plan SHAPE is scale-invariant "
        "evidence for SCALE.md's claims; the absolute row counts are not "
        "the point.\n\n" + "\n".join(sections)
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md"), "w") as f:
        f.write(body)
    print(f"PLANS.md written ({len(HEADLINE)} queries)")


if __name__ == "__main__":
    main()
