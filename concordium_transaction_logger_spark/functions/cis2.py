"""Byte-level CIS-2 event-log decoding — the reference's scalar-UDF slot
(SURVEY §2.11: ``cis2::Event::try_from`` call sites main.rs:619,640)
implemented as pure JVM expressions over the hex of the log bytes, so the
decode runs scan-side inside whole-stage codegen with no Python worker in
the hot path (the pandas_udf the survey sketched is unnecessary).

Wire format decoded (public CIS-2 standard, the format the reference's
SDK parses):

- byte 0: event tag — 0xFF Transfer, 0xFE Mint, 0xFD Burn,
  0xFC UpdateOperator, 0xFB TokenMetadata.
- Transfer/Mint/Burn: ``token_id`` = 1-byte length n then n bytes;
  ``amount`` = ULEB128 (7 data bits per byte, continuation high bit).
- Anything else (unknown tag, truncated buffer, over-long amount) sets
  ``ok = false`` — the strict-on-write posture: malformed logs are
  *flagged*, and the reference's section-atomic skip (E5) composes on
  top (``derive.cis2_tokens_guarded``).

Amounts: CIS-2 allows u256 (up to 37 ULEB bytes); Spark's widest exact
numeric is DECIMAL(38,0) (~2¹²⁶), so this decoder accumulates up to
``MAX_ULEB_BYTES`` = 16 groups (112 bits) exactly and flags anything
longer as ``ok = false`` rather than truncating — the same loud-overflow
contract as ``derive.wide_sum``; a corpus that really carries >112-bit
amounts routes the flagged rows through the wide limb path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TAG_TRANSFER = 255
TAG_MINT = 254
TAG_BURN = 253
TAG_UPDATE_OPERATOR = 252
TAG_TOKEN_METADATA = 251

#: ULEB128 groups decoded exactly (16 × 7 = 112 bits < DECIMAL(38,0)).
MAX_ULEB_BYTES = 16

_TAG_NAMES = {
    TAG_TRANSFER: "transfer",
    TAG_MINT: "mint",
    TAG_BURN: "burn",
    TAG_UPDATE_OPERATOR: "update_operator",
    TAG_TOKEN_METADATA: "token_metadata",
}


def _byte(h: Column, pos: Column) -> Column:
    """i-th byte (0-based, Column) of the hex string ``h`` as INT;
    NULL when past the end."""
    two = F.lit(2)
    piece = h.substr(pos * two + F.lit(1), two)
    return F.when(F.length(piece) == 2, F.conv(piece, 16, 10).cast("int"))


def decode_cis2_log(payload: Column) -> Column:
    """Decode one CIS-2 log-bytes payload into
    ``struct(event_type, token_id_hex, amount, ok)``.

    ``amount`` is a DECIMAL(38,0)-exact decimal *string* (NULL for
    non-amount events); ``ok`` is false for unknown tags, truncated
    buffers, or amounts beyond :data:`MAX_ULEB_BYTES` groups. All
    expressions — one hex() then substrings/conv/arithmetic — stay in
    whole-stage codegen."""
    h = F.upper(F.hex(payload))
    nbytes = (F.length(h) / 2).cast("int")
    tag = _byte(h, F.lit(0))

    event_type = F.lit("unknown")
    for t, name in _TAG_NAMES.items():
        event_type = F.when(tag == t, F.lit(name)).otherwise(event_type)

    has_amount = tag.isin(TAG_TRANSFER, TAG_MINT, TAG_BURN)
    token_len = _byte(h, F.lit(1))
    token_id_hex = F.when(
        has_amount & token_len.isNotNull(),
        F.lower(h.substr(F.lit(5), token_len * 2)),
    )
    amount_start = token_len + 2  # bytes: tag, len, token, then ULEB

    # ULEB128: group j contributes (b_j & 0x7f) * 128^j while every
    # earlier group had its continuation bit set. One aggregate() fold
    # over the (at most) MAX_ULEB_BYTES bytes — an unrolled per-group
    # expression chain re-evaluates every prior byte per step (O(n²)
    # tree, measured as a codegen/heap blowup); the fold keeps the tree
    # linear and whole-stage-codegen-friendly.
    dec = "decimal(38,0)"
    byte_arr = F.transform(
        F.sequence(F.lit(0), F.lit(MAX_ULEB_BYTES - 1)),
        lambda j: _byte(h, amount_start + j),
    )
    zero = F.lit(0).cast(dec)
    acc0 = F.struct(
        zero.alias("value"),
        F.lit(1).cast(dec).alias("mult"),
        F.lit(True).alias("reading"),
        F.lit(False).alias("terminated"),
    )

    def step(acc, b):
        live = acc["reading"] & b.isNotNull()
        return F.struct(
            (
                acc["value"]
                + F.when(live, (b % 128).cast(dec) * acc["mult"]).otherwise(zero)
            ).alias("value"),
            (acc["mult"] * F.lit(128).cast(dec)).cast(dec).alias("mult"),
            (live & (b >= 128)).alias("reading"),
            (acc["terminated"] | (live & (b < 128))).alias("terminated"),
        )

    folded = F.aggregate(byte_arr, acc0, step)
    value = folded["value"]
    terminated = folded["terminated"]
    overlong = folded["reading"]  # all groups consumed, continuation still set

    ok_amount = (
        token_len.isNotNull()
        & (token_len + 2 <= nbytes)
        & terminated
        & ~overlong
    )
    # coalesce: an empty/NULL payload makes has_amount and the tag test
    # both NULL, which would leak ok=NULL — a row that then vanishes from
    # BOTH the ok and the ~ok audit sets (NULL is not true). Malformed
    # must always read as false, never as unknown.
    ok = F.coalesce(
        F.when(has_amount, ok_amount).otherwise(
            tag.isin(TAG_UPDATE_OPERATOR, TAG_TOKEN_METADATA)
        ),
        F.lit(False),
    )
    amount = F.when(has_amount & ok_amount, value.cast("string"))
    return F.struct(
        event_type.alias("event_type"),
        token_id_hex.alias("token_id_hex"),
        amount.alias("amount"),
        ok.alias("ok"),
    )


def decoded_cis2_events(logs, payload_col: str = "payload"):
    """Table-level convenience: logs frame + decoded struct columns."""
    d = decode_cis2_log(F.col(payload_col))
    return logs.select(
        "*",
        d["event_type"].alias("event_type"),
        d["token_id_hex"].alias("token_id_hex"),
        d["amount"].alias("amount"),
        d["ok"].alias("ok"),
    )
