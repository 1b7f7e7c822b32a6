"""Migration framework: version ladder, ledger, idempotent re-run,
destructive gating (migrations.rs semantics)."""

from __future__ import annotations

import os

import pytest

from concordium_transaction_logger_spark import migrations as mig


def test_full_ladder_then_noop(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    runner = mig.MigrationRunner(spark, sf_dir, wh)

    assert runner.current_version() == 0  # Empty
    assert [m.version for m in runner.pending()] == [1, 2, 3]

    applied = runner.migrate()
    assert applied == [1, 2, 3]
    assert runner.current_version() == mig.LATEST

    # tables exist and the layout migration produced the partitioned copy
    for name in ("summaries", "ati", "cti", "cis2_events", "bindings_all"):
        assert spark.read.parquet(os.path.join(wh, name)).count() > 0
    parts = spark.read.parquet(os.path.join(wh, "summaries_by_height"))
    assert "height_bucket" in parts.columns

    # ledger rows are ordered and timestamped
    rows = sorted(
        spark.read.parquet(os.path.join(wh, "migrations")).collect(),
        key=lambda r: r.version,
    )
    assert [r.version for r in rows] == [1, 2, 3]
    assert all(r.end_ms >= r.start_ms for r in rows)

    # re-run is a no-op (run_migrations at every startup, migrations.rs:38-62)
    assert runner.migrate() == []
    assert runner.current_version() == mig.LATEST


def test_destructive_migration_is_gated(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    runner = mig.MigrationRunner(spark, sf_dir, wh)
    runner.migrate()

    bad = mig.Migration(99, "drop everything", True, lambda *_: None)
    orig = mig.MIGRATIONS
    mig.MIGRATIONS = orig + (bad,)
    try:
        with pytest.raises(RuntimeError, match="destructive"):
            runner.migrate()
        assert runner.current_version() == mig.LATEST  # nothing recorded
        assert runner.migrate(allow_destructive=True) == [99]
    finally:
        mig.MIGRATIONS = orig
