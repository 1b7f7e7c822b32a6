"""The reference's read-query surface as DataFrame plans.

Mirrors ``wallet-proxy-indexer/src/postgres.rs`` (QueryStatements,
:89-189; query_account/query_contract :309-362; iterate_* :365-383) and the
resume-offset / supply / binding lookups in ``main.rs``.

Physical design for the 100 TB target
-------------------------------------
The reference leans on Postgres PK ``(account, id)`` index scans; our analog
for bounded (``limit``-ed) lookups is **top-k on the index table first, then
broadcast the <= limit keyset into the fact join**:

    ati.filter(account).orderBy(id).limit(n)     # TakeOrderedAndProject,
    -> broadcast -> join(summaries, on id)       # no fact-table shuffle

Catalyst plans the top-k without a full sort, and the fact join degenerates
to a broadcast hash join probing the big ``summaries`` scan — the same
asymptotics as the reference's "<0.5 s point query" (postgres.rs:97-99)
without its planner-steering hack (SURVEY §4: do not port the redundant
sort key). Unbounded ``iterate_*`` keeps the ordinary shuffle join.

Keyset pagination (P4): ``start`` sentinels default to i64::MIN / i64::MAX
exactly like postgres.rs:315-324 — pagination is predicate + sort + limit,
never OFFSET.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ingest import derive

I64_MIN = -(1 << 63)
I64_MAX = (1 << 63) - 1

#: Columns returned by the row queries (DatabaseRow, postgres.rs:30-49),
#: plus the keyset id the caller pages on.
ROW_COLS = ("ati_id", "id", "block", "ts_ms", "height", "summary")


def _paged_lookup(
    index_df: DataFrame,
    fact_df: DataFrame,
    key_filter,
    *,
    limit: int | None,
    descending: bool,
    start: int | None,
    keyset_name: str,
) -> DataFrame:
    if start is None:
        start = I64_MAX if descending else I64_MIN
    bound = (F.col("id") <= start) if descending else (F.col("id") >= start)
    keyset = index_df.filter(key_filter & bound).select(
        F.col("id").alias(keyset_name), F.col("summary").alias("summary_id")
    )
    order = F.col(keyset_name).desc() if descending else F.col(keyset_name).asc()
    if limit is not None:
        # Top-k on the narrow index, then broadcast the bounded keyset.
        keyset = F.broadcast(keyset.orderBy(order).limit(limit))
    joined = keyset.join(fact_df, keyset.summary_id == fact_df.id, "inner")
    return joined.select(keyset_name, "id", "block", "ts_ms", "height", "summary").orderBy(order)


def query_account(
    spark: SparkSession,
    sf_dir: str,
    account: int,
    limit: int | None = None,
    descending: bool = False,
    start: int | None = None,
) -> DataFrame:
    """All summaries affecting ``account`` (postgres.rs:309-334):
    J1 FK join + P2 equality + P4 keyset bound + T1 order/limit."""
    feed = derive.block_feed(spark, sf_dir)
    return _paged_lookup(
        derive.ati(feed),
        derive.summaries(feed),
        F.col("account") == account,
        limit=limit,
        descending=descending,
        start=start,
        keyset_name="ati_id",
    )


def query_contract(
    spark: SparkSession,
    sf_dir: str,
    idx: int,
    subidx: int,
    limit: int | None = None,
    descending: bool = False,
    start: int | None = None,
) -> DataFrame:
    """All summaries affecting contract ``(idx, subidx)``
    (postgres.rs:336-362): P3 compound equality on the cti index."""
    feed = derive.block_feed(spark, sf_dir)
    return _paged_lookup(
        derive.cti(feed),
        derive.summaries(feed),
        (F.col("idx") == idx) & (F.col("subidx") == subidx),
        limit=limit,
        descending=descending,
        start=start,
        keyset_name="cti_id",
    )


def iterate_account(spark: SparkSession, sf_dir: str, account: int) -> DataFrame:
    """Unbounded ascending scan (postgres.rs:365-374, limit = i64::MAX)."""
    return query_account(spark, sf_dir, account, limit=None, descending=False)


def iterate_contract(spark: SparkSession, sf_dir: str, idx: int, subidx: int) -> DataFrame:
    """Unbounded ascending contract scan (postgres.rs:376-383)."""
    return query_contract(spark, sf_dir, idx, subidx, limit=None, descending=False)


def resume_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Height of the last indexed summary — the restart offset
    (A3/T2: ``SELECT height FROM summaries ORDER BY id DESC LIMIT 1``,
    main.rs:577-588). Planned as TakeOrderedAndProject, no full sort."""
    feed = derive.block_feed(spark, sf_dir)
    return (
        derive.summaries(feed)
        .orderBy(F.col("id").desc())
        .limit(1)
        .select("height")
    )


def cis2_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total supply per CIS2 token — the A1/A2 upsert ledger as a
    single exact aggregation (main.rs:417-457). Partial aggregation
    (map-side combine) makes this one shuffle of ~|tokens| rows at any
    input scale."""
    feed = derive.block_feed(spark, sf_dir)
    return derive.cis2_tokens(feed).orderBy("idx", "subidx", "token_id")


def cis2_supply_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NUMERIC(80,0)-fidelity supply totals (m0001-initial.sql:39) —
    limb-summed arbitrary-precision batch path; total_supply is the
    canonical decimal string. See derive.wide_sum."""
    feed = derive.block_feed(spark, sf_dir)
    return derive.cis2_tokens_wide(feed).orderBy("idx", "subidx", "token_id")


def cis2_supply_wide_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The beyond-int64 regime of the wide path, as a driver-checked
    query: every movement amount ×10^14 (digits appended scan-side as a
    string — the synthetic u256-scale corpus the reference's NUMERIC(80,0)
    column exists for, m0001-initial.sql:39), so group totals land around
    10^19-10^21 — past BIGINT's 9.2×10^18 and any long/double path. Same
    limb plan as :func:`cis2_supply_wide`; DuckDB witnesses the exact
    totals through 128-bit HUGEINT arithmetic."""
    feed = derive.block_feed(spark, sf_dir)
    wide_amounts = derive.cis2_events(feed).withColumn(
        "amount", F.concat(F.col("amount").cast("string"), F.lit("0" * 14))
    )
    return derive.wide_sum(
        wide_amounts, ["idx", "subidx", "token_id"], "amount"
    ).orderBy("idx", "subidx", "token_id")


def key_bindings_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current public-key bindings per account (M1 latest-wins snapshot,
    main.rs:506-540)."""
    feed = derive.block_feed(spark, sf_dir)
    return derive.key_bindings(feed).orderBy("address")


def incoming_transactions(
    spark: SparkSession, sf_dir: str, account: int, limit: int | None = None
) -> DataFrame:
    """The monitor's "incoming only" anti-filter (P5,
    examples/monitor-postgres.rs:96-98): rows affecting ``account`` whose
    sender is someone else — NULL senders (protocol events) count as
    incoming."""
    feed = derive.block_feed(spark, sf_dir)
    summaries = derive.summaries(feed)
    keyset = derive.ati(feed).filter(F.col("account") == account).select(
        F.col("id").alias("ati_id"), F.col("summary").alias("summary_id")
    )
    rows = keyset.join(summaries, keyset.summary_id == summaries.id, "inner").filter(
        F.col("sender").isNull() | (F.col("sender") != account)
    )
    rows = rows.select(*ROW_COLS).orderBy(F.col("ati_id").desc())
    return rows.limit(limit) if limit is not None else rows


from pyspark.sql.types import IntegerType, StringType, StructField, StructType

#: Parsed shape of the JSONB tagged union (main.rs:99-109).
SUMMARY_SCHEMA = StructType(
    [
        StructField("tag", StringType()),
        StructField("type", StringType()),
        StructField("k", IntegerType()),
    ]
)


def parse_tagged_summary(df: DataFrame) -> DataFrame:
    """Read-side JSON decode with malformed-row tolerance (P7,
    construct_row postgres.rs:389-406): permissive ``from_json`` yields a
    NULL struct for corrupt payloads, which are silently dropped —
    read-lenient, in contrast to the strict-on-write ingest (SURVEY §4
    asymmetry). ``df`` needs (id, summary).

    The parse runs ONCE per row (r10): spelled as filter-over-projection,
    Catalyst pushes the tag-null predicate below the project and every
    row pays ``from_json`` twice — once (schema-pruned) in the pushed
    filter, once in the projection — and ``JsonToStructs`` is
    CodegenFallback, so both run interpreted. Routing the struct through
    a one-element ``explode`` puts a Generate barrier under the filter:
    a predicate on generator output cannot push below the Generate, so
    the struct materializes once and both the filter and the field
    extraction read the materialized column. Same rows, same values —
    ``explode`` of a 1-element array is row-preserving, and a corrupt
    payload still yields the NULL-tag struct the filter drops."""
    parsed = df.select(
        "id", F.explode(F.array(F.from_json("summary", SUMMARY_SCHEMA))).alias("p")
    )
    return parsed.filter(F.col("p.tag").isNotNull()).select(
        "id",
        F.col("p.tag").alias("tag"),
        F.col("p.type").alias("typ"),
        F.col("p.k").alias("k_parsed"),
    )


def parsed_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 over the derived fact table."""
    feed = derive.block_feed(spark, sf_dir)
    return parse_tagged_summary(derive.summaries(feed)).orderBy("id")


def cis2_supply_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section-atomic CIS2 supply (E5 guard; see derive.cis2_tokens_guarded)."""
    feed = derive.block_feed(spark, sf_dir)
    return derive.cis2_tokens_guarded(feed).orderBy("idx", "subidx", "token_id")


def account_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-account activity summary (A6 count/max fold,
    examples/monitor-postgres.rs:74-80) — one shuffle, partially aggregated."""
    feed = derive.block_feed(spark, sf_dir)
    return (
        derive.ati(feed)
        .groupBy("account")
        .agg(F.count("*").alias("n_txs"), F.max("id").alias("max_ati_id"))
        .orderBy("account")
    )


def account_activity_salted(
    spark: SparkSession, sf_dir: str, salt_buckets: int = 16
) -> DataFrame:
    """:func:`account_activity` through the skew-salting recipe (SCALE.md
    rule 10): phase 1 aggregates ``(account, id % salt)`` partials, phase 2
    re-aggregates per account. Identical result (oracle-checked against
    the unsalted SQL); the point is the *shape* — when one account is
    pathologically hot (an exchange wallet receiving a visible fraction of
    all transfers), no single task ever owns more than ~1/salt of it."""
    feed = derive.block_feed(spark, sf_dir)
    partial = (
        derive.ati(feed)
        .withColumn("salt", F.col("id") % salt_buckets)
        .groupBy("account", "salt")
        .agg(F.count("*").alias("pn"), F.max("id").alias("pm"))
    )
    return (
        partial.groupBy("account")
        .agg(F.sum("pn").alias("n_txs"), F.max("pm").alias("max_ati_id"))
        .orderBy("account")
    )
