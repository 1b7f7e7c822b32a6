"""Schema-version ledger and migration runner — the Spark-side analog of
the reference's migration framework (wallet-proxy-indexer/src/migrations.rs).

Reference semantics reproduced:

- **Versioned, ordered migrations** (`SchemaVersion` enum,
  migrations.rs:113-142): a fixed ladder Empty -> InitialSchema ->
  AccountsPublicKeyBindings -> OptimizeAffectedAccountQueries; `LATEST`
  is the last rung.
- **Migration ledger** (migrations.rs:212-218): every applied migration is
  recorded as (version, description, destructive, start/end time) — here a
  parquet table instead of a Postgres table; `current_version()` is the
  A4 MAX(version) query (migrations.rs:249).
- **Destructive gating** (migrations.rs:90-101, 161-168): a migration
  flagged destructive refuses to run unless explicitly allowed — the
  reference uses this for API-compatibility checks.
- **Run-at-startup, idempotent** (migrations.rs:38-62, 171-207): the
  runner applies only the pending rungs, in order. Postgres gives the
  reference per-migration transactions; on an object store the analog is
  *idempotent steps + ledger-append-last*: a crash before the ledger
  append re-runs a step whose writes are overwrite-safe.
- **Backfill migration** (m0002_acoount_public_key_binding.rs:19-124):
  the bindings backfill (S3 snapshot -> E6 flatten -> K4 bulk insert) is
  one set-oriented derivation + write here — Spark's write path batches
  natively (the reference hand-rolls 1000-row multi-VALUES inserts).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LEDGER = "migrations"

LEDGER_SCHEMA = StructType(
    [
        StructField("version", LongType(), False),
        StructField("description", StringType(), False),
        StructField("destructive", BooleanType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
    ]
)


@dataclass(frozen=True)
class Migration:
    version: int
    description: str
    destructive: bool
    apply: Callable[[SparkSession, str, str], None]  # (spark, sf_dir, warehouse)


def _m1_initial_schema(spark: SparkSession, sf_dir: str, warehouse: str) -> None:
    """m0001-initial.sql: materialize the base tables from the feed."""
    from .ingest import derive

    feed = derive.block_feed(spark, sf_dir)
    for name, df in (
        ("summaries", derive.summaries(feed)),
        ("ati", derive.ati(feed)),
        ("cti", derive.cti(feed)),
        ("cis2_events", derive.cis2_events(feed)),
    ):
        df.write.mode("overwrite").parquet(os.path.join(warehouse, name))


def _m2_key_bindings_backfill(spark: SparkSession, sf_dir: str, warehouse: str) -> None:
    """m0002: backfill the bindings table from the historical feed
    (the reference walks every account via RPC; set-at-a-time here)."""
    from .ingest import derive

    feed = derive.block_feed(spark, sf_dir)
    derive.key_bindings_all(feed).write.mode("overwrite").parquet(
        os.path.join(warehouse, "bindings_all")
    )


def _m3_height_layout(spark: SparkSession, sf_dir: str, warehouse: str) -> None:
    """m0003 'performance indexes': rewrite summaries height-partitioned
    (index creation ≙ layout change, SURVEY §4)."""
    from .plans import layout

    summaries = spark.read.parquet(os.path.join(warehouse, "summaries"))
    layout.write_summaries_partitioned(
        summaries, os.path.join(warehouse, "summaries_by_height")
    )


MIGRATIONS: tuple[Migration, ...] = (
    Migration(1, "initial schema (m0001-initial.sql)", False, _m1_initial_schema),
    Migration(
        2,
        "account public key bindings backfill (m0002)",
        False,
        _m2_key_bindings_backfill,
    ),
    Migration(
        3,
        "height/timestamp query layout (m0003 indexes)",
        False,
        _m3_height_layout,
    ),
)

LATEST = MIGRATIONS[-1].version


class MigrationRunner:
    def __init__(self, spark: SparkSession, sf_dir: str, warehouse: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.warehouse = warehouse

    def _ledger_path(self) -> str:
        return os.path.join(self.warehouse, LEDGER)

    def _ledger(self) -> DataFrame:
        # P8 existence probe (migrations.rs:227-241) — through Spark's own
        # filesystem layer, not os.path.isdir: an isdir probe is False for
        # every object-store URI (s3a://, abfss://), which would read the
        # ledger as permanently empty and re-run ALL migrations on every
        # startup while appending duplicate ledger rows.
        from pyspark.errors import AnalysisException

        path = self._ledger_path()
        try:
            return self.spark.read.schema(LEDGER_SCHEMA).parquet(path)
        except AnalysisException:  # PATH_NOT_FOUND: no ledger yet
            return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def current_version(self) -> int:
        """MAX(version) over the ledger (A4, migrations.rs:249); 0 ≙ Empty."""
        row = self._ledger().agg(F.max("version")).first()
        return int(row[0]) if row[0] is not None else 0

    def pending(self) -> list[Migration]:
        v = self.current_version()
        return [m for m in MIGRATIONS if m.version > v]

    def migrate(self, allow_destructive: bool = False) -> list[int]:
        """Apply all pending migrations in version order; returns the
        versions applied. Each step writes its outputs (overwrite-safe)
        and appends its ledger row last."""
        applied = []
        for m in self.pending():
            if m.destructive and not allow_destructive:
                raise RuntimeError(
                    f"migration {m.version} ({m.description}) is destructive; "
                    "pass allow_destructive=True (migrations.rs:161-168)"
                )
            start_ms = int(time.time() * 1000)
            m.apply(self.spark, self.sf_dir, self.warehouse)
            row = [
                (m.version, m.description, m.destructive, start_ms,
                 int(time.time() * 1000))
            ]
            (
                self.spark.createDataFrame(row, LEDGER_SCHEMA)
                .write.mode("append")
                .parquet(self._ledger_path())
            )
            applied.append(m.version)
        return applied
