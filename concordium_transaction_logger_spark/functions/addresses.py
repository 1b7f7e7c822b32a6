"""Canonical-address resolution over 32-byte binary addresses.

Reference semantics (main.rs:123-146): two addresses denote the same
account iff their first **29 bytes** agree (`AccountAddressEq`); the index
stores only canonical addresses, so every affected address is resolved via
an in-memory cache seeded from a node snapshot, with cache misses fetched
over RPC and added (main.rs:762-853).

Spark-first re-expression (SURVEY J2/A5):

- the cache is a **broadcast dimension** ``accounts(canonical_address)``
  keyed on the 29-byte prefix;
- resolution is a broadcast left join on ``substring(addr, 1, 29)``;
- the miss -> RPC -> cache-grow loop becomes a per-batch *left-anti +
  enrich + union* pass — set-at-a-time instead of the reference's
  inherently sequential per-address loop (SURVEY §7 hard part 3).

At 100 TB the accounts dimension is the only broadcast state (tens of
millions of 32-byte rows ≈ single-digit GB — broadcastable; beyond that,
fall back to a bucketed sort-merge join on the prefix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PREFIX_LEN = 29


def alias_prefix(col: Column) -> Column:
    """First 29 bytes — the alias-equality key (main.rs:133-139).
    ``substring`` on BinaryType slices bytes, mirroring ``bytes[0..29]``."""
    return F.substring(col, 1, PREFIX_LEN)


def canonicalize(
    affected: DataFrame, accounts: DataFrame, addr_col: str = "address"
) -> DataFrame:
    """Resolve possibly-aliased addresses to canonical ones.

    Returns the input plus ``canonical_address`` (NULL on cache miss) and
    ``is_miss``. The dimension is broadcast: no shuffle of the fact side.
    """
    dim = F.broadcast(
        accounts.select(
            F.col("canonical_address"),
            alias_prefix(F.col("canonical_address")).alias("__prefix"),
        )
    )
    out = affected.join(
        dim, alias_prefix(F.col(addr_col)) == F.col("__prefix"), "left"
    ).drop("__prefix")
    return out.withColumn("is_miss", F.col("canonical_address").isNull())


def misses(resolved: DataFrame, addr_col: str = "address") -> DataFrame:
    """Distinct unresolved addresses — the batch equivalent of the cache
    misses the reference sends to the node (main.rs:839-852)."""
    return (
        resolved.filter(F.col("is_miss"))
        .select(F.col(addr_col).alias("address"))
        .distinct()
    )


def enrich_dimension(
    accounts: DataFrame, resolved_misses: DataFrame
) -> DataFrame:
    """Grow the dimension with newly-resolved addresses (cache add,
    main.rs:851). ``resolved_misses`` carries ``canonical_address`` —
    in production from the account-info lookup source (S4); tests use the
    miss address itself as its own canonical form."""
    new = resolved_misses.select("canonical_address").distinct()
    return accounts.select("canonical_address").unionByName(new).distinct()


def canonical_resolution(spark, sf_dir: str) -> DataFrame:
    """J2 end-to-end as a driver-checkable query: every ati row's account
    is materialized as a 32-byte *aliased* address (same 29-byte prefix as
    its canonical form, last 3 bytes vary per row — the alias space,
    main.rs:123-146), then resolved back through the broadcast prefix
    join. Output is (ati id, canonical address hex) — all rows must
    resolve, by construction.

    The engine side works on true ``BinaryType`` addresses; the DuckDB
    oracle mirrors the bytes as hex strings (29 bytes = 58 hex chars)
    because DuckDB has no BLOB substring — the compared output is hex
    either way."""
    from ..ingest import derive

    ati = derive.ati(derive.block_feed(spark, sf_dir))
    acct = F.col("account").cast("string")
    full = F.concat(
        F.unhex(F.md5(acct)), F.unhex(F.md5(F.concat(acct, F.lit("x"))))
    )
    aliased = ati.select(
        "id",
        F.concat(
            alias_prefix(full),
            F.unhex(F.substring(F.md5(F.col("id").cast("string")), 1, 6)),
        ).alias("address"),
    )
    accounts = ati.select(full.alias("canonical_address")).distinct()
    resolved = canonicalize(aliased, accounts)
    return resolved.select(
        "id", F.lower(F.hex(F.col("canonical_address"))).alias("canonical_hex")
    ).orderBy("id")


def dedup_first_seen(df: DataFrame, group_cols: list[str], addr_col: str, order_col: str) -> DataFrame:
    """Per-group duplicate drop preserving first-seen order — the
    reference's per-tx ``seen`` HashSet (main.rs:831-852, A5).
    Spark-idiomatic: min(order) per (group, prefix), keep those rows."""
    firsts = (
        df.select(F.col(order_col).alias("__o"), *[F.col(c) for c in group_cols], F.col(addr_col))
        .groupBy(*group_cols, alias_prefix(F.col(addr_col)).alias("__p"))
        .agg(F.min("__o").alias("__o"))
    )
    return df.join(
        firsts,
        [
            *[df[c] == firsts[c] for c in group_cols],
            alias_prefix(df[addr_col]) == firsts["__p"],
            df[order_col] == firsts["__o"],
        ],
    ).select(df["*"])


# ---------------------------------------------------------------------------
# F8: Base58check display encoding (main.rs:846-850, README :97) — the
# reference renders canonical addresses human-readable only at the edge
# (log lines); the engine keeps binary columns everywhere and exposes the
# display form as an Arrow-batched UDF for the presentation layer.
# ---------------------------------------------------------------------------

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def _b58check_bytes(raw: bytes, version: int = 1) -> str:
    """Base58check(version || raw): version byte ++ payload ++ 4-byte
    double-sha256 checksum, big-int base58 encoded (the Bitcoin/Concordium
    address display convention; pure-Python bignum, fine off the hot path)."""
    import hashlib

    payload = bytes([version]) + raw
    check = hashlib.sha256(hashlib.sha256(payload).digest()).digest()[:4]
    n = int.from_bytes(payload + check, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    pad = 0
    for byte in payload + check:
        if byte:
            break
        pad += 1
    return "1" * pad + "".join(reversed(out))


def base58check(col: Column, version: int = 1) -> Column:
    """Vectorized display encoder. Arrow-batched (pandas_udf), not
    row-at-a-time; display-only — never appears inside an oracle-checked
    dataflow, so engine-portability rules don't apply here."""
    import pandas as pd  # noqa: F401 — resolves the UDF's type hints
    from pyspark.sql.functions import pandas_udf

    def enc(s: "pd.Series") -> "pd.Series":
        return s.map(
            lambda v: None if v is None else _b58check_bytes(bytes(v), version)
        )

    enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(enc, "string")(col)
