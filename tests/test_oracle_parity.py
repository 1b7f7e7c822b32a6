"""Differential oracle tests: every registry query with oracle SQL must
produce an identical (order-insensitive) result set in Spark and DuckDB —
a local replica of the driver's CORRECTNESS gate (SURVEY §5.2)."""

from __future__ import annotations

import decimal
import math

import pytest

from concordium_transaction_logger_spark.registry import REGISTRY


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ORACLE_CASES = [(n, d) for n, d in REGISTRY.items() if d.oracle is not None]


@pytest.mark.parametrize("name,qd", ORACLE_CASES, ids=[n for n, _ in ORACLE_CASES])
def test_matches_duckdb(name, qd, spark, duck, sf_dir):
    sdf = qd.spark(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(qd.oracle)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _canon(spark_cols, spark_rows)
    d = _canon(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first mismatching rows: {mismatches[:3]}"


def test_rows_only_queries_run(spark, sf_dir):
    for name, qd in REGISTRY.items():
        if qd.oracle is None:
            assert qd.spark(spark, sf_dir).count() >= 0, name
