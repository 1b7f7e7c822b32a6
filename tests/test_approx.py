"""Approximate-aggregate accuracy: the HLL++ distinct estimate must land
within its configured relative error of the exact twin (the check a
cross-engine oracle cannot do for sketches)."""

from __future__ import annotations

from concordium_transaction_logger_spark.operators import relational


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """The t-digest percentile sketch must land within a small value error
    of the exact rank-selected percentile (tight here because accuracy
    10_000 exceeds the corpus size — at real scale the bound loosens to
    the configured rank accuracy)."""
    exact = {
        r.q_permille: r.pctl_n_chars
        for r in relational.doc_length_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r.q_permille: r.pctl_n_chars
        for r in relational.doc_length_percentiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for q, v in exact.items():
        rel_err = abs(approx[q] - v) / max(v, 1)
        assert rel_err < 0.02, f"q={q}: approx={approx[q]} exact={v}"


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    exact = {
        r.o_orderpriority: r.n_parts
        for r in relational.priority_part_breadth(spark, sf_dir).collect()
    }
    approx = {
        r.o_orderpriority: r.n_parts_approx
        for r in relational.priority_part_breadth_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for prio, n in exact.items():
        rel_err = abs(approx[prio] - n) / max(n, 1)
        assert rel_err < 0.05, f"{prio}: approx={approx[prio]} exact={n}"


def test_column_profile_approx_tracks_exact(spark, sf_dir):
    """The HLL++ profile twin: distinct estimates within 10% of exact for
    every column, all non-sketch fields identical."""
    from concordium_transaction_logger_spark.operators import relational

    exact = {
        r["col_name"]: r for r in relational.events_column_profile(spark, sf_dir).collect()
    }
    approx = {
        r["col_name"]: r
        for r in relational.events_column_profile_approx(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for c in exact:
        e, a = exact[c], approx[c]
        assert (e["n_rows"], e["n_nulls"], e["min_val"], e["max_val"]) == (
            a["n_rows"], a["n_nulls"], a["min_val"], a["max_val"]
        )
        nd, est = e["n_distinct"], a["n_distinct_approx"]
        assert abs(est - nd) <= max(2, 0.10 * nd), (c, nd, est)
