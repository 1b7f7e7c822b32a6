#!/usr/bin/env python
"""Compare two SCALE_SLOPES.json files (pre-r10-opt worktree vs HEAD).

Usage: python tools_r11_slopes_diff.py BEFORE.json AFTER.json

Prints per-family slope/time deltas, flagging the kernels the r10/r11
optimization rounds touched (VERDICT r10 item 3's evidence table).
"""

import json
import sys

OPTIMIZED = {
    # r10 kernels (VERDICT r10 audit list) -> slope families
    "dup_components": "components_over_buckets (label-sum convergence, window sizes)",
    "trade_components": "components_over_buckets (shared kernel)",
    "match_components": "components_over_buckets (shared kernel)",
    "cms_topk": "cms_cells per-vocab hashing + shared tokenize pin",
    "jaccard_capped": "ngram stop-list/sizes pins",
    "jaccard_capped_boiler": "ngram stop-list/sizes pins (hot-shingle corpus)",
    "winnow_dup_pairs": "winnow stop-list pin",
    "tfidf_cosine_pairs": "norm pin+broadcast (r11: size-gated)",
    "dedup_triangles": "SHUFFLE_HASH wedge/closure joins",
    "trade_pagerank": "per-round shuffle_hash hint",
    "summary_parse": "one-pass from_json",
    "curation_verdict": "conditional-min window keeper",
    "streaming_ingest": "batch-scoped feed persist",
    "golden_record": "components kernel + lazy pins",
    "match_verdict_estimated": "field-odds inline + lazy pins",
    "fuzzy_matches": "lazy pins (adjudicated noise r11)",
    "fuzzy_matches_minhash": "lazy pins",
    "blocking_plan": "lazy pins",
    # r11 kernels
    "bm25_topk": "r11 tokenize-once pin",
    "duplicate_spans": "r11 tokenize-once pin",
    "dedup_clean_text": "r11 tokenize-once pin",
}


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    sb, sa = before["slopes_1_to_max"], after["slopes_1_to_max"]
    tb, ta = before["times"], after["times"]
    rows = []
    for fam in sorted(set(sb) | set(sa)):
        b, a = sb.get(fam), sa.get(fam)
        t1b = tb.get(fam, {}).get("1")
        t1a = ta.get(fam, {}).get("1")
        thb = tb.get(fam, {}).get("10") or tb.get(fam, {}).get("3")
        tha = ta.get(fam, {}).get("10") or ta.get(fam, {}).get("3")
        mark = "OPT" if fam in OPTIMIZED else "   "
        rows.append(
            (
                mark,
                fam,
                b,
                a,
                t1b,
                t1a,
                thb,
                tha,
                OPTIMIZED.get(fam, ""),
            )
        )
    print(
        f"{'':3} {'family':28} {'slope_b':>7} {'slope_a':>7} "
        f"{'t1_b':>7} {'t1_a':>7} {'t10_b':>7} {'t10_a':>7}"
    )
    for r in rows:
        def f(x):
            return f"{x:7.2f}" if isinstance(x, (int, float)) else f"{'-':>7}"

        print(
            f"{r[0]:3} {r[1]:28} {f(r[2])} {f(r[3])} {f(r[4])} {f(r[5])} "
            f"{f(r[6])} {f(r[7])}  {r[8]}"
        )


if __name__ == "__main__":
    main()
