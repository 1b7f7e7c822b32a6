"""Stateful-streaming running supply (applyInPandasWithState): state
carries across micro-batches and restarts, totals match the batch
aggregation exactly, and fidelity is arbitrary-precision (SURVEY §7 hard
part 1 — NUMERIC(80,0) exceeds DecimalType's 38-digit cap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concordium_transaction_logger_spark.ingest import derive
from concordium_transaction_logger_spark.sources.tables import load_table
from concordium_transaction_logger_spark.streaming.pipeline import (
    StatefulSupply,
    stateful_supply_snapshot,
)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "source": str(tmp_path / "source"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _batch_expected(spark, sf_dir):
    feed = derive.block_feed(spark, sf_dir)
    rows = (
        derive.cis2_tokens(feed)
        .select(
            "idx",
            "subidx",
            "token_id",
            F.col("total_supply").cast("string").alias("total_supply"),
        )
        .collect()
    )
    return sorted(tuple(r) for r in rows)


def _snapshot_rows(spark, out_dir):
    rows = stateful_supply_snapshot(spark, out_dir).collect()
    return sorted(tuple(r) for r in rows)


def test_state_accumulates_across_batches_and_restart(spark, sf_dir, dirs):
    events = load_table(spark, sf_dir, "events")
    n_users = events.agg(F.max("user_id")).first()[0] + 1

    # Two source files + maxFilesPerTrigger=1 => at least two micro-batches,
    # so totals MUST flow through the state store to come out right.
    events.filter(F.col("event_id") < 500).coalesce(1).write.mode("append").parquet(
        dirs["source"]
    )
    events.filter(
        (F.col("event_id") >= 500) & (F.col("event_id") < 700)
    ).coalesce(1).write.mode("append").parquet(dirs["source"])

    job = StatefulSupply(
        spark, dirs["source"], dirs["out"], dirs["ckpt"], n_users, max_files_per_trigger=1
    )
    job.run_available_now()

    # Restart with newly arrived data: state must resume, not reset.
    events.filter(F.col("event_id") >= 700).coalesce(1).write.mode("append").parquet(
        dirs["source"]
    )
    StatefulSupply(
        spark, dirs["source"], dirs["out"], dirs["ckpt"], n_users, max_files_per_trigger=1
    ).run_available_now()

    assert _snapshot_rows(spark, dirs["out"]) == _batch_expected(spark, sf_dir)


def test_python_int_state_is_arbitrary_precision():
    """The state-update fn itself: totals beyond 2^63 (and 38 digits) are
    exact — the NUMERIC(80,0) case DecimalType cannot hold."""
    import pandas as pd

    from concordium_transaction_logger_spark.streaming.pipeline import _update_supply

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, value):
            self.get = value
            self.exists = True

    state = FakeState()
    huge = 10**79  # 80-digit supply
    batch = pd.DataFrame({"amount": pd.Series([huge, huge, -1], dtype=object)})
    out = list(_update_supply((1, 0, "7"), iter([batch]), state))
    assert state.get[0] == str(2 * huge - 1)
    assert out[0]["total_supply"][0] == str(2 * huge - 1)

    # second micro-batch continues from stored state
    batch2 = pd.DataFrame({"amount": pd.Series([1], dtype=object)})
    out2 = list(_update_supply((1, 0, "7"), iter([batch2]), state))
    assert out2[0]["total_supply"][0] == str(2 * huge)
