"""Byte-level CIS-2 log decode (SURVEY §2.11 scalar-UDF slot) verified
against an INDEPENDENT Python encoder: the encoder writes the public
CIS-2 wire format with plain int arithmetic; the JVM-expression decoder
must recover tag / token id / ULEB128 amount exactly — including >2^63
amounts — and flag malformed or beyond-capacity payloads instead of
guessing."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from concordium_transaction_logger_spark.functions.cis2 import (
    MAX_ULEB_BYTES,
    TAG_BURN,
    TAG_MINT,
    TAG_TRANSFER,
    decode_cis2_log,
    decoded_cis2_events,
)


def uleb128(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def encode_event(tag: int, token_id: bytes, amount: int) -> bytes:
    return bytes([tag, len(token_id)]) + token_id + uleb128(amount)


def _decode(spark, payloads: list[bytes]):
    df = spark.createDataFrame(
        [Row(i=i, payload=p) for i, p in enumerate(payloads)]
    )
    rows = df.select("i", decode_cis2_log(F.col("payload")).alias("d")).collect()
    return [r["d"] for r in sorted(rows, key=lambda r: r["i"])]


def test_decode_matches_independent_encoder(spark):
    rng = random.Random(42)
    cases = []
    for _ in range(40):
        tag = rng.choice([TAG_TRANSFER, TAG_MINT, TAG_BURN])
        token = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 9)))
        amount = rng.randrange(0, 1 << rng.choice([7, 30, 63, 100, 112]))
        cases.append((tag, token, amount))
    # pin the interesting boundaries
    cases += [
        (TAG_MINT, b"\x01", 0),
        (TAG_MINT, b"", (1 << 63) + 7),       # beyond BIGINT
        (TAG_BURN, b"\xff" * 8, (1 << 112) - 1),  # max exact capacity
        (TAG_TRANSFER, b"\x00", 127),
        (TAG_TRANSFER, b"\x00", 128),
    ]
    decoded = _decode(spark, [encode_event(*c) for c in cases])
    names = {TAG_TRANSFER: "transfer", TAG_MINT: "mint", TAG_BURN: "burn"}
    for (tag, token, amount), d in zip(cases, decoded):
        assert d["ok"], (tag, token.hex(), amount, d)
        assert d["event_type"] == names[tag]
        assert d["token_id_hex"] == token.hex()
        assert int(d["amount"]) == amount


def test_decode_flags_malformed_and_overlong(spark):
    good = encode_event(TAG_MINT, b"\x01\x02", 500)
    cases = [
        good[:-1] + bytes([good[-1] | 0x80]),  # continuation never ends
        bytes([TAG_MINT]),                      # truncated: no token len
        bytes([TAG_MINT, 5, 1, 2]),             # token shorter than its len
        bytes([0x10, 0, 0]),                    # unknown tag
        encode_event(TAG_MINT, b"", 1 << (7 * MAX_ULEB_BYTES)),  # > capacity
    ]
    decoded = _decode(spark, cases)
    assert all(not d["ok"] for d in decoded), decoded
    assert decoded[3]["event_type"] == "unknown"
    # and the good one still passes alongside
    assert _decode(spark, [good])[0]["ok"]


def test_decode_empty_and_null_payloads_read_false_not_null(spark):
    """ok must be exactly False (never NULL) for zero-byte and NULL
    payloads — ok=NULL rows vanish from BOTH the ok and ~ok audit sets,
    a silent drop."""
    decoded = _decode(spark, [b"", None])
    assert [d["ok"] for d in decoded] == [False, False], decoded


def test_decoded_table_and_guarded_rollup_compose(spark):
    """decoded events roll up to exact running supply including amounts
    past int64 — the byte path feeding the A1/A2 aggregation."""
    rng = random.Random(7)
    rows = []
    for i in range(200):
        amt = rng.randrange(0, 1 << 70)
        tag = TAG_MINT if i % 3 else TAG_BURN
        rows.append(Row(log_id=i, payload=encode_event(tag, b"\x07", amt), amt=amt, tag=tag))
    df = spark.createDataFrame(rows)
    out = decoded_cis2_events(df).filter(F.col("ok"))
    got = {
        r["event_type"]: int(r["s"])
        for r in out.groupBy("event_type")
        .agg(F.sum(F.col("amount").cast("decimal(38,0)")).alias("s"))
        .collect()
    }
    want_mint = sum(r.amt for r in rows if r.tag == TAG_MINT)
    want_burn = sum(r.amt for r in rows if r.tag == TAG_BURN)
    assert got == {"mint": want_mint, "burn": want_burn}
    # whole-stage codegen: the decode is JVM expressions, no Python node
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
