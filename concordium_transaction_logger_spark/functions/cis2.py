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


#: Full u256 needs ceil(256 / 7) = 37 ULEB128 groups — the wide decoder's
#: capacity (anything longer is not a valid CIS-2 amount).
WIDE_ULEB_BYTES = 37

# The decoder renders amounts in exactly derive.wide_sum's limb geometry
# (a diverging copy would silently break the capacity guard downstream).
from ..ingest.derive import WIDE_LIMB_DIGITS as _WIDE_LIMB_DIGITS  # noqa: E402
from ..ingest.derive import WIDE_LIMBS as _WIDE_LIMBS  # noqa: E402

#: 2^256 - 1 as 78 decimal digits: 37 ULEB groups can carry up to 259
#: bits, so a terminated, length-valid encoding may still exceed u256 —
#: the reference's u256 parser rejects those, and so does ``ok_amount``.
_U256_MAX = str(2**256 - 1)


def _pow128_limbs() -> list[list[int]]:
    """``128^j`` for every ULEB group position ``j < WIDE_ULEB_BYTES``,
    decomposed into little-endian 10^18-base limbs — exact Python int
    arithmetic at plan-build time. Each limb is < 10^18 so the whole
    table rides into the plan as ONE array<array<long>> ``Literal``
    (evaluation-free at runtime; a CreateArray expression here would
    re-allocate 185 objects per lambda invocation — measured as a heap
    blowup on small executors); limbs cast to DECIMAL(38,0) only at the
    multiply, so no product exceeds 127·10^18."""
    base = 10**_WIDE_LIMB_DIGITS
    return [
        [(128**j // base**i) % base for i in range(_WIDE_LIMBS)]
        for j in range(WIDE_ULEB_BYTES)
    ]


def decode_cis2_log_wide(payload: Column) -> Column:
    """Full-u256 decode — the wide limb path the narrow decoder's
    capacity flag routes to: same ``struct(event_type, token_id_hex,
    amount, ok)`` contract as :func:`decode_cis2_log`, but ``amount`` is
    exact for any u256 as a canonical decimal STRING ready for
    ``derive.wide_sum``. 37 ULEB groups can encode up to 2^259-1, so a
    well-terminated encoding may still exceed u256 — those rows (and
    anything longer than 37 groups) are flagged ``ok=false``, matching
    the reference parser's strict u256 bound.

    Multi-precision trick with zero multi-precision runtime arithmetic:
    group j contributes ``(b_j & 0x7f) * 128^j``, and the 128^j factors
    are constants — so they ride in as LITERAL limb decompositions
    (:func:`_pow128_limb_literal`) and each limb accumulates
    ``Σ_j b_j * pow_limb[j][i]`` with every term ≤ 127·10^18 and the
    37-term sum ≤ 4.7·10^21, comfortably inside DECIMAL(38,0); one
    carry-propagation chain at the end normalizes the five limbs. All
    expressions stay in whole-stage codegen — same posture as the narrow
    decoder, just wider."""
    dec = "decimal(38,0)"
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
    amount_start = token_len + 2

    pows = F.lit(_pow128_limbs())
    groups = F.transform(
        F.sequence(F.lit(0), F.lit(WIDE_ULEB_BYTES - 1)),
        lambda j: F.struct(
            j.cast("int").alias("j"), _byte(h, amount_start + j).alias("b")
        ),
    )
    zero = F.lit(0).cast(dec)
    acc0 = F.struct(
        *[zero.alias(f"l{i}") for i in range(_WIDE_LIMBS)],
        F.lit(True).alias("reading"),
        F.lit(False).alias("terminated"),
    )

    def step(acc, g):
        b = g["b"]
        live = acc["reading"] & b.isNotNull()
        prow = F.element_at(pows, g["j"] + 1)
        return F.struct(
            *[
                (
                    acc[f"l{i}"]
                    + F.when(
                        live,
                        (b % 128).cast(dec) * F.element_at(prow, i + 1).cast(dec),
                    ).otherwise(zero)
                ).alias(f"l{i}")
                for i in range(_WIDE_LIMBS)
            ],
            (live & (b >= 128)).alias("reading"),
            (acc["terminated"] | (live & (b < 128))).alias("terminated"),
        )

    folded = F.aggregate(groups, acc0, step)

    # Everything downstream references the fold result MANY times (five
    # limbs through a carry chain that nests the previous total twice per
    # limb, plus the ok/terminated flags) — naively that duplicates the
    # whole ArrayAggregate subtree per reference, an exponentially-sized
    # expression tree that OOMs task instantiation. Binding the fold to a
    # lambda variable via a one-element transform() evaluates it ONCE and
    # makes every reference a leaf.
    def finish(fd):
        # carry-normalize the deferred-carry limbs (carries ≤ 4700 here)
        limb_base = F.lit(10**_WIDE_LIMB_DIGITS).cast(dec)
        carry = zero
        norm = []
        for i in range(_WIDE_LIMBS):
            tot = fd[f"l{i}"] + carry
            r = (tot % limb_base).cast(dec)
            norm.append(r)
            carry = ((tot - r) / limb_base).cast(dec)
        digits = F.concat(
            *[
                F.lpad(norm[i].cast("string"), _WIDE_LIMB_DIGITS, "0")
                for i in reversed(range(_WIDE_LIMBS))
            ]
        )
        stripped = F.regexp_replace(digits, "^0+", "")
        # Bind the rendered digits through a SECOND lambda stage: the
        # u256 range check and the amount column each reference the
        # digit string several times, and every naive reference would
        # duplicate the whole carry-chain subtree (the same
        # task-instantiation OOM the fold binding above prevents).
        pre = F.struct(
            F.when(stripped == "", F.lit("0")).otherwise(stripped).alias("rendered"),
            fd["terminated"].alias("terminated"),
            fd["reading"].alias("reading"),
        )

        def final(pv):
            rendered = pv["rendered"]
            in_u256 = (F.length(rendered) < len(_U256_MAX)) | (
                (F.length(rendered) == len(_U256_MAX))
                & (rendered <= F.lit(_U256_MAX))
            )  # equal-length digit strings compare numerically
            ok_amount = (
                token_len.isNotNull()
                & (token_len + 2 <= nbytes)
                & pv["terminated"]
                & ~pv["reading"]  # all groups consumed, continuation set
                & in_u256  # 37 groups hold 259 bits; >= 2^256 isn't u256
            )
            ok = F.coalesce(
                F.when(has_amount, ok_amount).otherwise(
                    tag.isin(TAG_UPDATE_OPERATOR, TAG_TOKEN_METADATA)
                ),
                F.lit(False),
            )
            return F.struct(
                event_type.alias("event_type"),
                token_id_hex.alias("token_id_hex"),
                F.when(has_amount & ok_amount, rendered).alias("amount"),
                ok.alias("ok"),
            )

        return F.element_at(F.transform(F.array(pre), final), 1)

    return F.element_at(F.transform(F.array(folded), finish), 1)


def wide_supply_from_logs(logs, payload_col: str = "payload"):
    """The composed >112-bit route end-to-end: raw CIS-2 log bytes →
    :func:`decode_cis2_log_wide` (u256-exact amount strings) → mint/burn
    sign orientation → ``derive.wide_sum`` limb aggregation — NUMERIC(80,0)
    supply fidelity from wire format to rollup (the path the reference
    gets from Postgres NUMERIC, m0001-initial.sql:39). One scan-side
    decode, one |tokens|-row shuffle; nothing wider than DECIMAL(38,0)
    ever materializes per-row."""
    from ..ingest.derive import wide_sum

    d = decode_cis2_log_wide(F.col(payload_col))
    decoded = logs.select(
        d["event_type"].alias("event_type"),
        d["token_id_hex"].alias("token_id_hex"),
        d["amount"].alias("amount"),
        d["ok"].alias("ok"),
    ).filter(F.col("ok") & F.col("event_type").isin("mint", "burn"))
    signed = F.when(
        F.col("event_type") == "burn", F.concat(F.lit("-"), F.col("amount"))
    ).otherwise(F.col("amount"))
    return wide_sum(
        decoded.select("token_id_hex", signed.alias("amt")),
        ["token_id_hex"],
        "amt",
    )
