"""Property-based tests (hypothesis): the engine's operators against
pure-Python reference implementations on adversarial tiny inputs, plus
pagination-completeness invariants on the real corpus."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from concordium_transaction_logger_spark.operators import queries as q
from concordium_transaction_logger_spark.operators.relational import SESSION_GAP_MS


def _py_sessions(ts_sorted: list[int], gap: int) -> list[tuple[int, int, int]]:
    """Reference sessionizer: (n_events, start, end) per session."""
    out = []
    cur = [ts_sorted[0]]
    for t in ts_sorted[1:]:
        if t - cur[-1] > gap:
            out.append((len(cur), cur[0], cur[-1]))
            cur = [t]
        else:
            cur.append(t)
    out.append((len(cur), cur[0], cur[-1]))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ts_lists=st.lists(
        st.lists(st.integers(0, 10 * SESSION_GAP_MS), min_size=1, max_size=30),
        min_size=1,
        max_size=4,
    )
)
def test_sessionization_matches_python_reference(spark, ts_lists):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        Row(user_id=u, ts_ms=t, event_id=u * 1000 + i)
        for u, tss in enumerate(ts_lists)
        for i, t in enumerate(sorted(tss))
    ]
    evt = spark.createDataFrame(rows)
    order = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    is_new = F.when(
        F.lag("ts_ms").over(order).isNull()
        | ((F.col("ts_ms") - F.lag("ts_ms").over(order)) > SESSION_GAP_MS),
        1,
    ).otherwise(0)
    got = (
        evt.withColumn("is_new", is_new)
        .withColumn(
            "sid",
            F.sum("is_new").over(order.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n"),
            F.min("ts_ms").alias("s"),
            F.max("ts_ms").alias("e"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append((r.sid, r.n, r.s, r.e))
    for u, tss in enumerate(ts_lists):
        expect = _py_sessions(sorted(tss), SESSION_GAP_MS)
        actual = [(n, s, e) for _, n, s, e in sorted(by_user[u])]
        assert actual == expect


def test_keyset_pages_partition_the_full_result(spark, sf_dir):
    """Walking DESC pages of any size must enumerate exactly the rows of
    the unbounded iterate — no dupes, no gaps (the README:115-120 cursor
    contract)."""
    full = [r.ati_id for r in q.iterate_account(spark, sf_dir, 7).collect()]
    assert full == sorted(full)
    for page_size in (1, 7, 50):
        seen: list[int] = []
        start = None
        while True:
            page = q.query_account(
                spark, sf_dir, 7, limit=page_size, descending=True, start=start
            ).collect()
            if not page:
                break
            seen.extend(r.ati_id for r in page)
            start = page[-1].ati_id - 1
        assert seen == sorted(full, reverse=True), f"page_size={page_size}"
