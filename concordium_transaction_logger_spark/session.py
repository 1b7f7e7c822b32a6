"""SparkSession factory.

The engine is designed for a multi-executor cluster (100 TB target) but runs
on ``local[N]`` in tests. Every conf here is also applied at *runtime* via
:func:`apply_runtime_confs` so the engine behaves correctly when handed a
session it did not build (e.g. the verification driver's session).

Notable confs
-------------
- ``spark.sql.legacy.parquet.nanosAsLong`` — the test corpus stores
  nanosecond-precision INT64 timestamps, which vanilla Spark refuses to read;
  with this flag they arrive as ``LongType`` nanos and the loaders normalize
  them (see ``sources.tables``).
- ``spark.sql.session.timeZone=UTC`` — the reference stores epoch-ms integers
  (m0001-initial.sql:5); all wall-clock math is UTC.
- AQE on — runtime coalescing + skew-join handling are part of the 100 TB
  design (skewed hot accounts in the ati index).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe (and required) to set on an already-running session.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Runtime bloom-filter pruning: for large sort-merge joins the build
    # side's join keys seed a bloom filter pushed into the probe side's
    # scan — at 100 TB this prunes most of a selective join's probe input
    # before the shuffle. Semantics-preserving, so safe to force on.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Best-effort apply of runtime-settable confs to a foreign session."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # immutable conf on this build — keep going
            pass
    return spark


def build_session(
    app_name: str = "concordium-txlog-spark",
    master: str | None = None,
    shuffle_partitions: int | str | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or os.environ.get("CTL_SHUFFLE_PARTITIONS", cpus))

    import tempfile

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "ctl-warehouse"),
        )
    )
    # local-mode JVM heap (driver IS the executor there); only effective
    # before the JVM starts, so an env knob rather than a runtime conf.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    return apply_runtime_confs(builder.getOrCreate())
