"""Alias-equality resolution on binary addresses (J2/A5, main.rs:123-146)."""

from __future__ import annotations

from pyspark.sql import Row

from concordium_transaction_logger_spark.functions import addresses


def _addr(prefix_byte: int, tail: bytes = b"\x00\x00\x00") -> bytes:
    return bytes([prefix_byte] * 29) + tail


def test_alias_prefix_equality(spark):
    # Two aliases: same 29-byte prefix, different last 3 bytes.
    canonical = _addr(1)
    alias = _addr(1, b"\xaa\xbb\xcc")
    other = _addr(2)
    unknown = _addr(9)

    accounts = spark.createDataFrame(
        [Row(canonical_address=canonical), Row(canonical_address=other)]
    )
    affected = spark.createDataFrame(
        [
            Row(tx=1, address=alias),
            Row(tx=1, address=canonical),
            Row(tx=2, address=other),
            Row(tx=3, address=unknown),
        ]
    )
    resolved = addresses.canonicalize(affected, accounts)
    rows = {(r.tx, bytes(r.address)): r for r in resolved.collect()}

    # alias resolves to the canonical form
    assert bytes(rows[(1, alias)].canonical_address) == canonical
    assert not rows[(1, alias)].is_miss
    assert bytes(rows[(2, other)].canonical_address) == other
    # unknown address is a cache miss
    assert rows[(3, unknown)].is_miss

    miss_rows = addresses.misses(resolved).collect()
    assert [bytes(r.address) for r in miss_rows] == [unknown]

    # enrichment pass grows the dimension (cache add, main.rs:851)
    enriched = addresses.enrich_dimension(
        accounts,
        addresses.misses(resolved).select(
            addresses.F.col("address").alias("canonical_address")
        ),
    )
    assert enriched.count() == 3
    # after enrichment, re-resolution has no misses
    again = addresses.canonicalize(affected, enriched)
    assert again.filter(again.is_miss).count() == 0


def test_canonicalize_uses_broadcast(spark):
    from concordium_transaction_logger_spark.plans.layout import uses_broadcast_join

    accounts = spark.createDataFrame([Row(canonical_address=_addr(1))])
    affected = spark.createDataFrame([Row(tx=1, address=_addr(1, b"\x01\x02\x03"))])
    assert uses_broadcast_join(addresses.canonicalize(affected, accounts))


def test_dedup_first_seen_order(spark):
    a1 = _addr(1)
    a1_alias = _addr(1, b"\xff\xff\xff")
    a2 = _addr(2)
    df = spark.createDataFrame(
        [
            Row(tx=1, pos=0, address=a1),
            Row(tx=1, pos=1, address=a1_alias),  # alias-dup of a1 -> dropped
            Row(tx=1, pos=2, address=a2),
            Row(tx=2, pos=0, address=a1_alias),  # first seen in tx 2 -> kept
        ]
    )
    kept = addresses.dedup_first_seen(df, ["tx"], "address", "pos")
    got = sorted((r.tx, r.pos, bytes(r.address)) for r in kept.collect())
    assert got == [(1, 0, a1), (1, 2, a2), (2, 0, a1_alias)]
