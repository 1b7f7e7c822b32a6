"""Approximate-aggregate accuracy: the HLL++ distinct estimate must land
within its configured relative error of the exact twin (the check a
cross-engine oracle cannot do for sketches)."""

from __future__ import annotations

from concordium_transaction_logger_spark.operators import relational


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
