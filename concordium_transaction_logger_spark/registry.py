"""Query registry: every implemented operator from SURVEY.md §2 (plus the
training-data extensions) bound to (a) its Spark implementation and (b) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` and ``bench.py`` are
thin adapters over this table.

Naming contract: output column names/aliases are identical in both sides —
the driver's hash compare sorts columns by name.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest.oracle import wrap
from .functions import addresses
from .operators import (
    dedup,
    graph,
    linkage,
    multimodal,
    queries,
    relational,
    retrieval,
    sampling,
    similarity,
    temporal,
    textstats,
)

I64_MIN = queries.I64_MIN
I64_MAX = queries.I64_MAX


@dataclass(frozen=True)
class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # include in bench.py headline set


def _account_rows_sql(account: int, descending: bool, start: int | None, limit: int | None) -> str:
    start = start if start is not None else (I64_MAX if descending else I64_MIN)
    bound = "<=" if descending else ">="
    lim = f"LIMIT {limit}" if limit is not None else ""
    return wrap(
        f"""
SELECT a.id AS ati_id, s.id, s.block, s.ts_ms, s.height, s.summary
FROM ati a JOIN summaries s ON a.summary = s.id
WHERE a.account = {account} AND a.id {bound} {start}
ORDER BY a.id {'DESC' if descending else 'ASC'} {lim}
"""
    )


def _contract_rows_sql(idx: int, subidx: int, descending: bool, start: int | None, limit: int | None) -> str:
    start = start if start is not None else (I64_MAX if descending else I64_MIN)
    bound = "<=" if descending else ">="
    lim = f"LIMIT {limit}" if limit is not None else ""
    return wrap(
        f"""
SELECT a.id AS cti_id, s.id, s.block, s.ts_ms, s.height, s.summary
FROM cti a JOIN summaries s ON a.summary = s.id
WHERE a.idx = {idx} AND a.subidx = {subidx} AND a.id {bound} {start}
ORDER BY a.id {'DESC' if descending else 'ASC'} {lim}
"""
    )


def _nested_pii_replace(col: str) -> str:
    """DuckDB spelling of the ordered PII redaction chain: one global
    regexp_replace per pattern, nested in textstats.PII_PATTERNS order
    (innermost first), with the pattern literals interpolated from the
    same constants the Spark operator compiles."""
    from .operators import textstats

    expr = col
    for _, pat, marker in textstats.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{marker}', 'g')"
    return expr


def _mm_sql(total: str, n: str, guard: bool = True) -> str:
    """DuckDB rendering of ``textstats.mean_millis_expr`` — THE per-mille
    rounding formula (``(2000*t + n) // (2*n)``, exact .5 UP), so every
    oracle ratio rounds identically to the Spark op with zero float
    intermediates. ``guard=True`` adds the ``n == 0 -> 0`` branch of
    ``textstats.permille_expr``; ``guard=False`` lets a NULL/zero
    denominator propagate (the windowed-ratio ops keep NULL).

    The blow-up runs in HUGEINT, mirroring the Spark side's DECIMAL
    widening: ``2000 * total`` on a money sum past ~4.6e15 would abort
    DuckDB's checked BIGINT arithmetic (and silently wrap Spark's) —
    the Z-order normalization's overflow class, fixed the same way."""
    t = f"CAST(({total}) AS HUGEINT)"
    core = f"(2000 * {t} + ({n})) // (2 * CAST(({n}) AS HUGEINT))"
    if guard:
        return f"CAST(CASE WHEN ({n}) > 0 THEN {core} ELSE 0 END AS BIGINT)"
    return f"CAST({core} AS BIGINT)"


def _mm_signed_sql(total: str, n: str) -> str:
    """DuckDB rendering of ``mean_millis_expr(signed=True)`` — exact .5
    AWAY FROM ZERO (DSIR scores can be negative), same HUGEINT widening.
    No zero-guard: signed call sites guard their own denominators."""
    t = f"CAST(({total}) AS HUGEINT)"
    nh = f"CAST(({n}) AS HUGEINT)"
    return (
        f"CAST(CASE WHEN ({total}) >= 0"
        f" THEN (2000 * {t} + {nh}) // (2 * {nh})"
        f" ELSE -((-2000 * {t} + {nh}) // (2 * {nh})) END AS BIGINT)"
    )


def _simhash_core() -> str:
    """The per-doc simhash SELECT, shared by the signature query and the
    banded-pairs oracle."""
    nibbles = dedup.NIBBLES
    bit_sums = ", ".join(
        "SUM(CASE WHEN (instr('0123456789abcdef', substr(md5(tok), {p}, 1)) - 1) % 2 = 1"
        " THEN 1 ELSE -1 END) AS s{i}".format(p=p + 1, i=p)
        for p in range(nibbles)
    )
    sig = " + ".join(
        f"CASE WHEN s{p} > 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END" for p in range(nibbles)
    )
    return (
        f"SELECT doc_id, {sig} AS simhash16 "
        f"FROM (SELECT doc_id, {bit_sums} FROM tokset GROUP BY doc_id)"
    )


def _simhash_sql() -> str:
    return wrap(f"""
{_simhash_core()}
ORDER BY doc_id
""")


def _simhash_pairs_sql(max_hamming: int = 2) -> str:
    """Brute-force oracle for the banded pairs: the banding has recall 1
    at Hamming <= 2 by pigeonhole, so all-pairs-with-filter IS the
    expected result, not an approximation of it."""
    return wrap(f"""
, sh AS ({_simhash_core()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash16, b.simhash16)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash16, b.simhash16)) <= {max_hamming}
ORDER BY doc_a, doc_b
""")


def _lang_pred_exprs() -> tuple[str, str, list[str]]:
    score_cols = ", ".join(
        "len(regexp_extract_all(lower(text), '\\b({alt})\\b')) AS score_{code}".format(
            alt="|".join(words), code=code
        )
        for code, words in textstats.LANG_MARKERS.items()
    )
    codes = list(textstats.LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"score_{c}" for c in codes) + ")"
    pred = "CASE WHEN {best} = 0 THEN 'und' ".format(best=best) + " ".join(
        f"WHEN score_{c} = {best} THEN '{c}'" for c in codes
    ) + " END"
    return score_cols, pred, codes


def _lang_sql() -> str:
    score_cols, pred, codes = _lang_pred_exprs()
    return wrap(
        f"""
SELECT doc_id, lang, {pred} AS pred_lang, {', '.join('score_' + c for c in codes)}
FROM (SELECT doc_id, lang, {score_cols} FROM documents)
ORDER BY doc_id
"""
    )


def _lang_confusion_sql() -> str:
    score_cols, pred, _codes = _lang_pred_exprs()
    return wrap(
        f"""
, lpred AS (
  SELECT lang, {pred} AS pred_lang
  FROM (SELECT doc_id, lang, {score_cols} FROM documents)
),
lcm AS (SELECT lang, pred_lang, COUNT(*) AS n FROM lpred GROUP BY lang, pred_lang)
SELECT lang, pred_lang, n,
  {_mm_sql("n", "SUM(n) OVER (PARTITION BY lang)")} AS share_permille
FROM lcm
ORDER BY lang, pred_lang
"""
    )


def _quality_sql() -> str:
    stop_list = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
    return wrap(
        f"""
SELECT doc_id,
  length(text) AS n_chars,
  len(t) AS n_tokens,
  {_mm_sql("length(regexp_replace(lower(text), '[^a-z]', '', 'g'))", "length(text)")} AS alpha_permille,
  {_mm_sql("length(regexp_replace(lower(text), '[^0-9]', '', 'g'))", "length(text)")} AS digit_permille,
  {_mm_sql("length(regexp_replace(text, '[^ ]', '', 'g'))", "length(text)")} AS space_permille,
  {_mm_sql("len(list_filter(t, x -> list_contains([" + stop_list + "], x)))", "len(t)")} AS stopword_permille
FROM documents JOIN toks USING (doc_id)
ORDER BY doc_id
"""
    )


_COSINE_SIM = (
    "CAST(ROUND(1000000 * list_dot_product(q.e, c.e) / "
    "(SQRT(CAST(list_dot_product(q.e, q.e) AS DOUBLE)) * "
    "SQRT(CAST(list_dot_product(c.e, c.e) AS DOUBLE)))) AS BIGINT)"
)

def _lsh_topk_sql() -> str:
    """The LSH-bucketed ANN is fully SQL-expressible because the random
    hyperplanes are deterministic md5-derived literals (similarity.py):
    bit j of the signature = (plane_j · e) >= 0. Multi-probe membership
    (Hamming distance <= radius between signatures) is xor + bit_count —
    the oracle states the semantics; the Spark plan realizes it as a
    probe-exploded equality join."""
    from .operators.similarity import LSH_PROBE_RADIUS, N_PLANES, _plane_component

    def plane(j: int) -> str:
        return "[" + ", ".join(str(_plane_component(j, d)) for d in range(64)) + "]"

    bucket = " + ".join(
        f"CASE WHEN list_dot_product(e, {plane(j)}) >= 0 THEN {1 << j} ELSE 0 END"
        for j in range(N_PLANES)
    )
    return wrap(
        f"""
, sig AS (SELECT vec_id, e, {bucket} AS b FROM qvec)
SELECT query_id, neighbor_id, sim_micro,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY sim_micro DESC, neighbor_id ASC) AS rank
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COSINE_SIM} AS sim_micro
  FROM sig q JOIN sig c
    ON bit_count(CAST(xor(q.b, c.b) AS BIGINT)) <= {LSH_PROBE_RADIUS}
   AND q.vec_id < 5 AND c.vec_id >= 5) s
QUALIFY rank <= 10
ORDER BY query_id, rank
"""
    )


_NEAR_DUP_SQL = wrap(
    """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(ROUND(1000000 * list_dot_product(a.e, b.e) /
            (SQRT(CAST(list_dot_product(a.e, a.e) AS DOUBLE)) *
             SQRT(CAST(list_dot_product(b.e, b.e) AS DOUBLE)))) AS BIGINT) AS sim_micro
FROM qvec a JOIN qvec b ON a.vec_id < b.vec_id
WHERE CAST(ROUND(1000000 * list_dot_product(a.e, b.e) /
           (SQRT(CAST(list_dot_product(a.e, a.e) AS DOUBLE)) *
            SQRT(CAST(list_dot_product(b.e, b.e) AS DOUBLE)))) AS BIGINT) >= 400000
ORDER BY vec_a, vec_b
"""
)


# The SemDeDup derivation shared by the pairs query and the survivors
# query: corpus-size-derived k, two unrolled Lloyd's iterations, final
# assignment, and the within-cluster >= threshold pair set as CTE `sp`.
_SEMDEDUP_CTES = f"""
, kk AS (SELECT GREATEST({similarity.KMEANS_K},
                         (COUNT(*) + {similarity.SEMDEDUP_TARGET_CLUSTER - 1})
                           // {similarity.SEMDEDUP_TARGET_CLUSTER}) AS k
         FROM qvec),
c0 AS (SELECT vec_id AS cid, e AS ce FROM qvec WHERE vec_id < (SELECT k FROM kk)),
d1 AS (
  SELECT q.vec_id, q.e, c.cid,
    list_sum(list_transform(range(1, 65), i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS d
  FROM qvec q CROSS JOIN c0 c
),
a1 AS (
  SELECT vec_id, e, cid AS cluster, d FROM d1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
),
c1 AS (
  SELECT cluster AS cid, list(comp ORDER BY i) AS ce FROM (
    SELECT cluster, i, CAST(ROUND(CAST(SUM(e[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS comp
    FROM a1, range(1, 65) t(i)
    GROUP BY cluster, i
  ) GROUP BY cluster
),
d2 AS (
  SELECT q.vec_id, c.cid,
    list_sum(list_transform(range(1, 65), i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS d
  FROM qvec q CROSS JOIN c1 c
),
a2 AS (
  SELECT vec_id, cid AS cluster FROM d2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
),
m AS (SELECT q.vec_id, q.e, a.cluster FROM qvec q JOIN a2 a USING (vec_id)),
sp AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cluster,
    CAST(ROUND(1000000 * list_dot_product(a.e, b.e) /
         (SQRT(CAST(list_dot_product(a.e, a.e) AS DOUBLE)) *
          SQRT(CAST(list_dot_product(b.e, b.e) AS DOUBLE)))) AS BIGINT) AS sim_micro
  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE CAST(ROUND(1000000 * list_dot_product(a.e, b.e) /
        (SQRT(CAST(list_dot_product(a.e, a.e) AS DOUBLE)) *
         SQRT(CAST(list_dot_product(b.e, b.e) AS DOUBLE)))) AS BIGINT) >= 400000
)"""


# Bigram-LM derivation shared by doc_bigram_surprisal and the
# doc_perplexity_buckets decision: per-doc bigram counts, the corpus
# bigram/context counts, and the bit-length-quantized surprisal table.
_BIGRAM_CTES = f"""
, bocc AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1])) AS bg
  FROM toks
),
bpdt AS (SELECT doc_id, bg, COUNT(*) AS k FROM bocc GROUP BY doc_id, bg),
bc2 AS (SELECT bg, SUM(k) AS cnt2 FROM bpdt GROUP BY bg),
-- vocab floor (textstats.BIGRAM_MIN_COUNT): hapax bigrams leave the
-- model; their occurrences score at the OOV backoff (bitlen of the
-- corpus bigram total). Mirrors the engine definition exactly.
boov AS (SELECT CAST(length(bin(SUM(cnt2))) AS BIGINT) AS oov FROM bc2),
bc2p AS (SELECT bg, cnt2 FROM bc2 WHERE cnt2 >= {textstats.BIGRAM_MIN_COUNT}),
bc1 AS (SELECT string_split(bg, ' ')[1] AS prev, SUM(cnt2) AS cnt1
        FROM bc2p GROUP BY prev),
bbits AS (
  SELECT bg, CAST(length(bin(c1.cnt1)) - length(bin(bc2p.cnt2)) AS BIGINT) AS bits
  FROM bc2p JOIN bc1 c1 ON string_split(bc2p.bg, ' ')[1] = c1.prev
)"""


_BPE_HEAD = r"""
, bwf AS MATERIALIZED (
  SELECT tok, COUNT(*) AS f
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
),
r0 AS MATERIALIZED (
  SELECT tok, f, regexp_replace(tok, '(.)', '[\1]', 'g') AS rep FROM bwf
)"""


def _bpe_step(k: int) -> str:
    return f""",
p{k} AS MATERIALIZED (
  SELECT s[i] AS l, s[i+1] AS r, SUM(f) AS cnt
  FROM (SELECT f, string_split(substr(rep, 2, length(rep) - 2), '][') AS s
        FROM r{k-1}),
       unnest(generate_series(1, len(s) - 1)) AS u(i)
  GROUP BY l, r
),
b{k} AS MATERIALIZED (
  SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
r{k} AS MATERIALIZED (
  SELECT tok, f,
         replace(rep, '[' || (SELECT l FROM b{k}) || '][' || (SELECT r FROM b{k}) || ']',
                      '[' || (SELECT l FROM b{k}) || (SELECT r FROM b{k}) || ']') AS rep
  FROM r{k-1}
)"""


def _bpe_apply_sql() -> str:
    """Generated oracle for textstats.bpe_apply: the same unrolled merge
    chain as _bpe_sql, finishing with per-doc piece/char counts under the
    final symbol table."""
    e = textstats.BPE_MERGES
    return wrap(_bpe_ctes()) + f"""
, bnp AS MATERIALIZED (
  SELECT tok,
         CAST(length(rep) - length(replace(rep, '[', '')) AS BIGINT) AS np
  FROM r{e}
),
bocc AS (SELECT doc_id, unnest(t) AS tok FROM toks)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(length(tok)) AS BIGINT) AS n_chars,
       CAST(SUM(np) AS BIGINT) AS n_pieces,
       {_mm_sql("SUM(np)", "SUM(length(tok))")} AS pieces_per_kchar
FROM bocc JOIN bnp USING (tok)
GROUP BY doc_id
ORDER BY doc_id
"""


def _bpe_sql() -> str:
    """Generated oracle for textstats.bpe_merges: BPE_MERGES unrolled
    merge steps over the word/frequency table; symbol strings are
    bracketed so merge application is exact literal replace()."""
    e = textstats.BPE_MERGES
    parts = [_bpe_ctes()]
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS step, l AS left, r AS right, l || r AS merged, CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
        for k in range(1, e + 1)
    )
    parts.append(f"""
{selects}
ORDER BY step
""")
    return wrap("".join(parts))


def _bpe_ctes() -> str:
    """The unrolled BPE merge-chain CTEs alone (no final select) — the
    shared head both _bpe_sql and _bpe_apply_sql build on, exposed as its
    own piece instead of string-slicing one function's output inside the
    other (a format tweak to the final select must never corrupt or kill
    the sibling oracle at import time)."""
    e = textstats.BPE_MERGES
    parts = [_BPE_HEAD]
    for k in range(1, e + 1):
        parts.append(_bpe_step(k))
    return "".join(parts)


def _perceptron_eval_sql() -> str:
    """Generated oracle for textstats.perceptron_eval: identical epoch
    machinery to _perceptron_sql but fitted on the train side of the
    deterministic split only, with per-split accuracy output."""
    e = textstats.PERC_EPOCHS
    cwexpr = ("(CASE WHEN y > 0 THEN (SELECT n_neg FROM ccw) "
              "ELSE (SELECT n_pos FROM ccw) END)")
    parts = [f"""
, cfeat AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(sh), 1, 4)) AS BIGINT) % {textstats.PERC_BUCKETS} AS b
  FROM shingles
  UNION ALL
  SELECT doc_id, {textstats.PERC_BUCKETS} AS b FROM documents
),
clab AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN (
      {textstats.gate_reason_sql("text", "duckdb")}) = 'ok' THEN 1 ELSE -1 END AS y,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT)
      % 1000 < 100 AS is_val
  FROM documents
),
ctr AS MATERIALIZED (SELECT doc_id, y FROM clab WHERE NOT is_val),
ccw AS MATERIALIZED (
  SELECT SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN y < 0 THEN 1 ELSE 0 END) AS n_neg
  FROM ctr
),
w1 AS MATERIALIZED (
  SELECT b, SUM(y * {cwexpr}) AS w
  FROM cfeat JOIN ctr USING (doc_id) GROUP BY b
),
m1 AS MATERIALIZED (SELECT doc_id, SUM(w) AS margin FROM cfeat JOIN w1 USING (b) GROUP BY doc_id),
a1 AS MATERIALIZED (SELECT COUNT(*) AS a FROM ctr JOIN m1 USING (doc_id) WHERE y * margin > 0)"""]
    for k in range(2, e + 1):
        parts.append(f""",
mis{k} AS MATERIALIZED (SELECT c.doc_id, c.y FROM ctr c JOIN m{k-1} USING (doc_id)
           WHERE c.y * m{k-1}.margin <= 0),
d{k} AS MATERIALIZED (SELECT b, SUM(y * {cwexpr}) AS d
         FROM cfeat JOIN mis{k} USING (doc_id) GROUP BY b),
w{k} AS MATERIALIZED (SELECT w{k-1}.b, w{k-1}.w + COALESCE(d{k}.d, 0) AS w
         FROM w{k-1} LEFT JOIN d{k} ON w{k-1}.b = d{k}.b),
m{k} AS MATERIALIZED (SELECT doc_id, SUM(w) AS margin FROM cfeat JOIN w{k} USING (b) GROUP BY doc_id),
a{k} AS MATERIALIZED (SELECT COUNT(*) AS a FROM ctr JOIN m{k} USING (doc_id) WHERE y * margin > 0)""")
    scores = ", ".join(
        f"(SELECT a FROM a{k}) * 1000 - {k} AS s{k}" for k in range(1, e + 1)
    )
    greatest = ", ".join(f"s{k}" for k in range(1, e + 1))
    pick = " ".join(f"WHEN s{k} = g THEN {k}" for k in range(1, e + 1))
    joins = " ".join(f"JOIN m{k} USING (doc_id)" for k in range(2, e + 1))
    cases = " ".join(f"WHEN {k} THEN m{k}.margin" for k in range(1, e + 1))
    parts.append(f""",
sel AS (SELECT *, GREATEST({greatest}) AS g FROM (SELECT {scores})),
bk AS (SELECT CASE {pick} END AS k FROM sel),
fm AS (
  SELECT m1.doc_id, CASE (SELECT k FROM bk) {cases} END AS margin
  FROM m1 {joins}
)
SELECT CASE WHEN c.is_val THEN 'val' ELSE 'train' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN c.y * fm.margin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       {_mm_sql("SUM(CASE WHEN c.y * fm.margin > 0 THEN 1 ELSE 0 END)", "COUNT(*)")} AS acc_permille
FROM clab c JOIN fm USING (doc_id)
GROUP BY split
ORDER BY split
""")
    return wrap("".join(parts))


def _perceptron_sql() -> str:
    """Generate the unrolled pocket-perceptron oracle (PERC_EPOCHS epochs).
    Mirrors textstats.perceptron_train exactly: cost-sensitive batch
    updates, margins under each epoch snapshot, pocket = best training
    accuracy with earliest-epoch tie-break (epoch scores a_k*1000 - k)."""
    e = textstats.PERC_EPOCHS
    cwexpr = ("(CASE WHEN y > 0 THEN (SELECT n_neg FROM ccw) "
              "ELSE (SELECT n_pos FROM ccw) END)")
    parts = [f"""
, cfeat AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(sh), 1, 4)) AS BIGINT) % {textstats.PERC_BUCKETS} AS b
  FROM shingles
  UNION ALL
  SELECT doc_id, {textstats.PERC_BUCKETS} AS b FROM documents
),
clab AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN (
      {textstats.gate_reason_sql("text", "duckdb")}) = 'ok' THEN 1 ELSE -1 END AS y
  FROM documents
),
ccw AS MATERIALIZED (
  SELECT SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN y < 0 THEN 1 ELSE 0 END) AS n_neg
  FROM clab
),
w1 AS MATERIALIZED (
  SELECT b, SUM(y * {cwexpr}) AS w
  FROM cfeat JOIN clab USING (doc_id) GROUP BY b
),
m1 AS MATERIALIZED (SELECT doc_id, SUM(w) AS margin FROM cfeat JOIN w1 USING (b) GROUP BY doc_id),
a1 AS MATERIALIZED (SELECT COUNT(*) AS a FROM clab JOIN m1 USING (doc_id) WHERE y * margin > 0)"""]
    for k in range(2, e + 1):
        parts.append(f""",
mis{k} AS MATERIALIZED (SELECT c.doc_id, c.y FROM clab c JOIN m{k-1} USING (doc_id)
           WHERE c.y * m{k-1}.margin <= 0),
d{k} AS MATERIALIZED (SELECT b, SUM(y * {cwexpr}) AS d
         FROM cfeat JOIN mis{k} USING (doc_id) GROUP BY b),
w{k} AS MATERIALIZED (SELECT w{k-1}.b, w{k-1}.w + COALESCE(d{k}.d, 0) AS w
         FROM w{k-1} LEFT JOIN d{k} ON w{k-1}.b = d{k}.b),
m{k} AS MATERIALIZED (SELECT doc_id, SUM(w) AS margin FROM cfeat JOIN w{k} USING (b) GROUP BY doc_id),
a{k} AS MATERIALIZED (SELECT COUNT(*) AS a FROM clab JOIN m{k} USING (doc_id) WHERE y * margin > 0)""")
    scores = ", ".join(
        f"(SELECT a FROM a{k}) * 1000 - {k} AS s{k}" for k in range(1, e + 1)
    )
    greatest = ", ".join(f"s{k}" for k in range(1, e + 1))
    pick = " ".join(f"WHEN s{k} = g THEN {k}" for k in range(1, e + 1))
    joins = " ".join(f"JOIN m{k} USING (doc_id)" for k in range(2, e + 1))
    cases = " ".join(f"WHEN {k} THEN m{k}.margin" for k in range(1, e + 1))
    parts.append(f""",
sel AS (SELECT *, GREATEST({greatest}) AS g FROM (SELECT {scores})),
bk AS (SELECT CASE {pick} END AS k FROM sel),
fm AS (
  SELECT m1.doc_id, CASE (SELECT k FROM bk) {cases} END AS margin
  FROM m1 {joins}
)
SELECT c.doc_id, CAST(c.y AS BIGINT) AS label, CAST(fm.margin AS BIGINT) AS margin,
       CAST(CASE WHEN fm.margin > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred,
       (c.y * fm.margin) > 0 AS correct
FROM clab c JOIN fm USING (doc_id)
ORDER BY c.doc_id
""")
    return wrap("".join(parts))



# The MinHash-band candidate-pair block — the single SQL definition of
# the LSH edge set, shared by every oracle that consumes the candidate
# graph (jaccard estimate, components/survivors/verdict, triangles).
# KEEP IN LOCKSTEP with dedup._band_cols / dedup.minhash_band_pairs.
#: Per-pair MinHash agreement count (x vs y over the MINHASH_K signature
#: limbs) — shared by the n_agree column and its est_jaccard_permille
#: ratio, and rendered from the SAME constant the Spark op uses
#: (dedup.MINHASH_K), so a signature-width change can't drift dialects.
_MH_AGREE = " + ".join(
    f"(CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END)"
    for i in range(dedup.MINHASH_K)
)

#: Entity-resolution oracle fragments, shared by BOTH linkage QueryDefs
#: (the _BPAIRS_SQL convention): the normalized+blocked record CTE and
#: the conjunctive-block verify join, each rendered once from the
#: linkage module's constants.
_LINKAGE_CBLK = f"""
WITH cblk AS (
  SELECT c_custkey, lower(c_name) AS name, c_nationkey,
         substr(lower(c_name), 1, length(c_name) - {linkage.BLOCK_SUFFIX}) AS blk
  FROM customer
)"""

#: RECURSIVE variant for the components oracle, built HERE next to the
#: fragment with a loud guard: a silent ``.replace()`` no-op (the
#: fragment's prologue drifting by a character) would render invalid
#: oracle SQL discovered only at parity-test time (r7 ADVICE).
_LINKAGE_PROLOGUE = "\nWITH "
if not _LINKAGE_CBLK.startswith(_LINKAGE_PROLOGUE):  # pragma: no cover
    raise AssertionError(
        "_LINKAGE_CBLK must start with '\\nWITH ' — the RECURSIVE "
        "variant splices the keyword into that prologue"
    )
_LINKAGE_CBLK_RECURSIVE = (
    "\nWITH RECURSIVE " + _LINKAGE_CBLK[len(_LINKAGE_PROLOGUE):]
)

_LINKAGE_PAIRS = f"""FROM cblk a JOIN cblk b
  ON a.blk = b.blk AND a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.name, b.name) <= {linkage.MAX_EDIT_DISTANCE}"""

#: Banded-minhash blocking fragment, shared by the minhash matches and
#: minhash block-profile oracles (the _LINKAGE_CBLK convention): the
#: signature family's (A, B, P) constants render in from the linkage
#: module, so both engines compute identical integer signatures.
_MINHASH_MBLK = (
    f"""
WITH mnm AS (
  SELECT c_custkey, lower(c_name) AS name, c_nationkey FROM customer
),
mcod AS (
  SELECT c_custkey, name, c_nationkey,
         CASE WHEN length(name) >= 3 THEN
           list_transform(generate_series(1, length(name) - 2),
             i -> CAST(ascii(substr(name, i, 1)) AS BIGINT) * 65536
                  + ascii(substr(name, i + 1, 1)) * 256
                  + ascii(substr(name, i + 2, 1)))
         ELSE [] END AS codes
  FROM mnm
),
mmh AS (
  SELECT c_custkey, name, c_nationkey,
"""
    + ",\n".join(
        f"         list_min(list_transform(codes,"
        f" c -> (CAST({a} AS BIGINT) * c + {b}) % {linkage.MINHASH_P}))"
        f" AS mh{j}"
        for j, (a, b) in enumerate(linkage.MINHASH_AB)
    )
    + """
  FROM mcod
),
mblk AS (
  SELECT c_custkey, name, c_nationkey,
         'm0:' || CAST(mh0 AS VARCHAR) || ':' || CAST(mh1 AS VARCHAR) AS blk
  FROM mmh
  UNION ALL
  SELECT c_custkey, name, c_nationkey,
         'm1:' || CAST(mh2 AS VARCHAR) || ':' || CAST(mh3 AS VARCHAR)
  FROM mmh
)"""
)

#: Capped-minhash blocking fragment (r9): the band-size cap with the
#: prefix fuzz-window fallback — KEEP IN LOCKSTEP with
#: linkage.capped_band_keys; the cap and the fuzz window render from
#: the linkage module's constants, so both engines re-key the
#: identical hot bands.
_MINHASH_MFIN = (
    _MINHASH_MBLK
    + f"""
, msz AS (
  SELECT blk, c_nationkey, COUNT(*) AS n
  FROM mblk GROUP BY blk, c_nationkey
),
mfin AS (
  SELECT m.c_custkey, m.name, m.c_nationkey,
         CASE WHEN s.n > {linkage.MINHASH_BAND_CAP}
              THEN 'p:' || substr(m.name, 1, length(m.name) - {linkage.BLOCK_SUFFIX})
              ELSE m.blk END AS blk
  FROM mblk m JOIN msz s USING (blk, c_nationkey)
)"""
)


def _linkage_evidence_select(
    pairs_ctes: str,
    weight_sql: str,
    verdict_cols: str = "",
    extra_join: str = "",
) -> str:
    """The ONE evidence-frame SELECT rendering (attribute CTE ``mattr``,
    per-field agreement indicators, attribute joins) over a pair CTE
    named ``mev`` with (key_a, key_b, edit_distance) columns — shared by
    the hand-weight evidence core AND the estimated-weights verdict
    oracle, so an edit to the indicator semantics (tolerance, segment
    comparison, join shape) cannot desync the two renderings (the same
    drift class the r8 ADVICE weight-literal fix closed).
    ``weight_sql`` computes match_weight; ``verdict_cols``/``extra_join``
    let the verdict oracles append their banding column and weight-row
    join."""
    tol = linkage.BALANCE_CENTS_TOLERANCE
    return (
        pairs_ctes
        + f""",
mattr AS (
  SELECT c_custkey, CAST(ROUND(100 * c_acctbal) AS BIGINT) AS bal_cents,
         c_mktsegment
  FROM customer
)
SELECT p.key_a, p.key_b, p.edit_distance,
       CAST(x.c_mktsegment = y.c_mktsegment AS BIGINT) AS seg_match,
       CAST(abs(x.bal_cents - y.bal_cents)
            <= {tol} AS BIGINT) AS bal_close,
       CAST({weight_sql} AS BIGINT) AS match_weight{verdict_cols}
FROM mev p
JOIN mattr x ON p.key_a = x.c_custkey
JOIN mattr y ON p.key_b = y.c_custkey{extra_join}"""
    )


def _linkage_evidence_core(pairs_ctes: str) -> str:
    """Render the Fellegi-Sunter evidence SELECT (sans presentation
    ORDER BY) over a pair CTE named ``mev`` — the hand-weight form of
    :func:`_linkage_evidence_select`, shared by the evidence oracles
    for every provider and wrapped by the verdict oracle. Weights,
    tolerance and thresholds interpolate from the linkage module's
    literals (r8 ADVICE: the first cut hand-duplicated them, so an
    edit to linkage.MATCH_WEIGHTS would have desynced op and
    oracle)."""
    w = linkage.MATCH_WEIGHTS
    tol = linkage.BALANCE_CENTS_TOLERANCE
    return _linkage_evidence_select(
        pairs_ctes,
        f"""CASE WHEN p.edit_distance = 0 THEN {w["name_exact"]}
                 ELSE {w["name_close"]} END
          + CASE WHEN x.c_mktsegment = y.c_mktsegment
                 THEN {w["segment_agree"]} ELSE {w["segment_disagree"]} END
          + CASE WHEN abs(x.bal_cents - y.bal_cents)
                      <= {tol}
                 THEN {w["balance_close"]} ELSE {w["balance_far"]} END""",
    )


#: The prefix provider's pair CTE for the evidence renderer — the
#: same _LINKAGE_CBLK/_LINKAGE_PAIRS fragments as every linkage oracle.
_LINKAGE_MEV_PREFIX = (
    _LINKAGE_CBLK
    + f"""
, mev AS (
  SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
         CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance
  {_LINKAGE_PAIRS}
)"""
)

#: The capped-minhash provider's pair CTE for the evidence renderer —
#: the DISTINCT folds multi-band matches exactly as the Spark pair
#: frame does.
_LINKAGE_MEV_MINHASH = (
    _MINHASH_MFIN
    + f"""
, mev AS (
  SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b,
         CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance
  FROM mfin a JOIN mfin b
    ON a.blk = b.blk AND a.c_nationkey = b.c_nationkey
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.name, b.name) <= {linkage.MAX_EDIT_DISTANCE}
)"""
)


#: The Fellegi-Sunter m/u estimation CTE chain (oat attributes -> om
#: pair-frame m-rates -> exact histogram/CDF u-rates -> oppm per-field
#: ppm) — ONE rendering shared by the field-odds oracle and the
#: estimated-weights verdict oracle (r10), appended after a pair CTE
#: named ``mev`` (the _LINKAGE_MEV_* fragments). The balance u-count
#: mirrors the Spark side's distributed global_cumsum with a plain
#: cumulative window — no pair is ever enumerated on either engine.
_LINKAGE_ODDS_CTES = f"""
, oat AS (
  SELECT c_custkey, lower(c_name) AS name, c_mktsegment AS seg,
         CAST(ROUND(100 * c_acctbal) AS BIGINT) AS bal_cents
  FROM customer
),
om AS (
  SELECT COUNT(*) AS m_total,
         SUM(CASE WHEN p.edit_distance = 0 THEN 1 ELSE 0 END) AS m_name_exact,
         SUM(CASE WHEN x.seg = y.seg THEN 1 ELSE 0 END) AS m_seg,
         SUM(CASE WHEN abs(x.bal_cents - y.bal_cents)
                  <= {linkage.BALANCE_CENTS_TOLERANCE} THEN 1 ELSE 0 END) AS m_bal
  FROM mev p
  JOIN oat x ON p.key_a = x.c_custkey
  JOIN oat y ON p.key_b = y.c_custkey
),
otot AS (SELECT COUNT(*) * (COUNT(*) - 1) // 2 AS u_total FROM oat),
oun AS (SELECT SUM(c * (c - 1) // 2) AS u_name_agree
        FROM (SELECT COUNT(*) AS c FROM oat GROUP BY name)),
ous AS (SELECT SUM(c * (c - 1) // 2) AS u_seg_agree
        FROM (SELECT COUNT(*) AS c FROM oat GROUP BY seg)),
ovls AS (SELECT bal_cents AS val, COUNT(*) AS c FROM oat GROUP BY bal_cents),
oev AS (
  SELECT val, 0 AS kind, c, val AS src FROM ovls
  UNION ALL
  SELECT val + {linkage.BALANCE_CENTS_TOLERANCE}, 1, 0, val FROM ovls
),
ocum AS (
  SELECT src, kind, c,
         SUM(c) OVER (ORDER BY val, kind
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM oev
),
oub AS (
  SELECT SUM(lo.c * (hi.cum - lo.cum) + lo.c * (lo.c - 1) // 2)
           AS u_bal_agree
  FROM (SELECT src, c, cum FROM ocum WHERE kind = 0) lo
  JOIN (SELECT src, cum FROM ocum WHERE kind = 1) hi USING (src)
),
ofld AS (
  SELECT 'balance' AS field, m_bal AS m_agree, u_bal_agree AS u_agree,
         m_total, u_total
  FROM om, otot, oub
  UNION ALL
  SELECT 'name_exact', m_name_exact, u_name_agree, m_total, u_total
  FROM om, otot, oun
  UNION ALL
  SELECT 'segment', m_seg, u_seg_agree, m_total, u_total
  FROM om, otot, ous
),
oppm AS (
  SELECT field,
         CAST(1000000 * m_agree // m_total AS BIGINT) AS m_ppm,
         CAST(1000000 * u_agree // u_total AS BIGINT) AS u_ppm
  FROM ofld
)"""


def _plan_stat_sql(src: str) -> str:
    """One provider's capacity-stat aggregate for the blocking-plan
    oracle (KEEP IN LOCKSTEP with the ``stats`` inner function of
    linkage.customer_blocking_plan): block sizes over the named blocked
    CTE, then counts / max / exact C(size,2) pair work, with the
    hot-band split at the minhash cap."""
    cap = linkage.MINHASH_BAND_CAP
    return f"""SELECT COUNT(*) AS n_blocks, MAX(bs) AS max_block_size,
       CAST(SUM(bs * (bs - 1) // 2) AS BIGINT) AS candidate_pairs,
       CAST(SUM(CASE WHEN bs > {cap} THEN bs * (bs - 1) // 2 ELSE 0 END)
            AS BIGINT) AS hot_block_pairs
  FROM (SELECT COUNT(*) AS bs FROM {src} WHERE blk IS NOT NULL
        GROUP BY blk, c_nationkey)"""


def _est_w(ratio_sql: str) -> str:
    """The ONE estimated-weight quantization rendering (KEEP IN LOCKSTEP
    with linkage.estimated_weights_over): clamp(floor(log2(ratio_x1000))
    - 9) via length(bin(x)) - 1 = floor(log2 x), cap from the linkage
    module."""
    cap = linkage.ESTIMATED_WEIGHT_CAP
    return (
        f"least({cap}, greatest(-{cap},"
        f" length(bin(greatest(CAST(1 AS BIGINT), {ratio_sql}))) - 10))"
    )


def _linkage_estimated_verdict_sql() -> str:
    """Render the estimated-weights verdict oracle: the shared odds CTEs
    quantized to one weight row (owts), cross-joined into the ONE
    evidence SELECT rendering (:func:`_linkage_evidence_select` — the
    indicators/joins are not re-spelled here), banded by the linkage
    module's ESTIMATED thresholds."""
    tol = linkage.BALANCE_CENTS_TOLERANCE
    total = (
        "CASE WHEN p.edit_distance = 0 THEN w.w_name_agree"
        " ELSE w.w_name_disagree END"
        " + CASE WHEN x.c_mktsegment = y.c_mktsegment THEN w.w_seg_agree"
        " ELSE w.w_seg_disagree END"
        f" + CASE WHEN abs(x.bal_cents - y.bal_cents) <= {tol}"
        " THEN w.w_bal_agree ELSE w.w_bal_disagree END"
    )
    pairs_ctes = (
        _LINKAGE_MEV_PREFIX
        + _LINKAGE_ODDS_CTES
        + f""",
owts AS (
  SELECT
    MAX(CASE WHEN field = 'name_exact' THEN wa END) AS w_name_agree,
    MAX(CASE WHEN field = 'name_exact' THEN wd END) AS w_name_disagree,
    MAX(CASE WHEN field = 'segment' THEN wa END) AS w_seg_agree,
    MAX(CASE WHEN field = 'segment' THEN wd END) AS w_seg_disagree,
    MAX(CASE WHEN field = 'balance' THEN wa END) AS w_bal_agree,
    MAX(CASE WHEN field = 'balance' THEN wd END) AS w_bal_disagree
  FROM (
    SELECT field,
           {_est_w("m_ppm * 1000 // greatest(1, u_ppm)")} AS wa,
           {_est_w("(1000000 - m_ppm) * 1000 // greatest(1, 1000000 - u_ppm)")} AS wd
    FROM oppm)
)"""
    )
    return (
        _linkage_evidence_select(
            pairs_ctes,
            total,
            verdict_cols=f""",
       CASE WHEN {total} >= {linkage.ESTIMATED_THRESHOLD_UPPER}
            THEN 'auto_merge'
            WHEN {total} >= {linkage.ESTIMATED_THRESHOLD_LOWER}
            THEN 'review'
            ELSE 'reject' END AS verdict""",
            extra_join="\nCROSS JOIN owts w",
        )
        + "\nORDER BY key_a, key_b\n"
    )


#: The recursive entity-closure CTEs (pairs -> edges -> min-label walk
#: -> lcomp(custkey, entity_id)) shared by the components AND
#: golden-record oracles — one rendering of the walk, zero drift.
_LINKAGE_LCOMP = (
    _LINKAGE_CBLK_RECURSIVE
    + f"""
, lpair AS (
  SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
  {_LINKAGE_PAIRS}
),
ledges AS (SELECT key_a AS a, key_b AS b FROM lpair
           UNION ALL
           SELECT key_b, key_a FROM lpair),
lwalk AS (
  SELECT c_custkey AS node, c_custkey AS label FROM customer
  UNION
  SELECT e.b AS node, w.label FROM lwalk w JOIN ledges e ON w.node = e.a
),
lcomp AS (SELECT node AS custkey, MIN(label) AS entity_id
          FROM lwalk GROUP BY node)"""
)


_BPAIRS_SQL = """
, bpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT doc_id, '0:' || md5(mh0 || mh1 || mh2 || mh3) AS bucket FROM mh
        UNION ALL
        SELECT doc_id, '1:' || md5(mh4 || mh5 || mh6 || mh7) FROM mh) a
  JOIN (SELECT doc_id, '0:' || md5(mh0 || mh1 || mh2 || mh3) AS bucket FROM mh
        UNION ALL
        SELECT doc_id, '1:' || md5(mh4 || mh5 || mh6 || mh7) FROM mh) b
    ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""

# Connected components over the candidate graph (recursive walk +
# component sizes) — shared by the components/survivors/verdict oracles;
# every consumer must pass recursive=True to wrap().
_COMP_CTES = (
    _BPAIRS_SQL
    + """,
edges AS (SELECT doc_a AS a, doc_b AS b FROM bpairs
          UNION ALL
          SELECT doc_b, doc_a FROM bpairs),
walk AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, w.label FROM walk w JOIN edges e ON w.node = e.a
),
comp AS (SELECT node AS doc_id, MIN(label) AS component_id FROM walk GROUP BY node)"""
)

def _zorder_cte() -> str:
    """Shared Morton-key CTE: the same min-max normalization and
    unrolled bit interleave as relational.zorder_keys_frame, bit-for-
    bit — consumed by BOTH the keys oracle and the manifest oracle."""
    bits = relational.ZORDER_BITS
    top = (1 << bits) - 1
    terms = [
        f"((({d} >> {i}) & 1) << {p})"
        for d, i, p in relational.zorder_bit_positions(bits)
    ]
    z = " + ".join(terms)

    # HUGEINT (int128) mirrors the Spark side's DECIMAL(30,0) treatment:
    # BIGINT `(coord - lo) * top` overflows past 2**47 spans, and the
    # span itself past 2**63 — operands are non-negative so HUGEINT //
    # and Spark's decimal DIV floor to the identical value bit-for-bit.
    def norm(col: str, lo: str, hi: str) -> str:
        off = f"(CAST({col} AS HUGEINT) - (SELECT {lo} FROM zmm))"
        span = f"(CAST((SELECT {hi} FROM zmm) AS HUGEINT) - (SELECT {lo} FROM zmm))"
        return f"CAST({off} * {top} // greatest(1, {span}) AS BIGINT)"

    return f"""
WITH zev AS (SELECT user_id, epoch_ms(ts) // 1000 AS ts_s FROM events),
zmm AS (SELECT MIN(user_id) AS u0, MAX(user_id) AS u1,
               MIN(ts_s) AS t0, MAX(ts_s) AS t1 FROM zev),
znorm AS (
  SELECT user_id, ts_s,
         {norm("user_id", "u0", "u1")} AS zx,
         {norm("ts_s", "t0", "t1")} AS zy
  FROM zev
),
zkeys AS (SELECT user_id, ts_s, CAST({z} AS BIGINT) AS z FROM znorm)"""


def _zorder_keys_sql() -> str:
    """Generated oracle for relational.event_zorder_keys — the Morton
    key itself, per event (the frame the write-path helper
    ``layout.write_events_zordered`` range-partitions on)."""
    return (
        _zorder_cte()
        + """
SELECT user_id, ts_s, z FROM zkeys ORDER BY user_id, ts_s, z
"""
    )


def _zorder_sql() -> str:
    """Generated oracle for relational.event_zorder_manifest — the
    shared Morton-key CTE plus the shard split and per-shard rollup."""
    shift = 1 << (2 * relational.ZORDER_BITS - relational.ZORDER_SHARD_BITS)
    return (
        _zorder_cte()
        + f""",
zsh AS (SELECT user_id, ts_s, z // {shift} AS shard FROM zkeys)
SELECT CAST(shard AS BIGINT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(MAX(user_id) - MIN(user_id) AS BIGINT) AS user_span,
  CAST(MAX(ts_s) - MIN(ts_s) AS BIGINT) AS ts_span_s
FROM zsh GROUP BY shard ORDER BY shard
"""
    )



REGISTRY: dict[str, QueryDef] = {
    # ------------------------------------------------------------------
    # Reference read surface (SURVEY §2.3-§2.8; postgres.rs / main.rs)
    # ------------------------------------------------------------------
    "account_txs_desc": QueryDef(
        lambda spark, sf: queries.query_account(spark, sf, 7, limit=20, descending=True),
        _account_rows_sql(7, True, None, 20),
        bench=True,
    ),
    "account_txs_asc_start": QueryDef(
        lambda spark, sf: queries.query_account(spark, sf, 12, limit=20, start=500),
        _account_rows_sql(12, False, 500, 20),
        bench=True,
    ),
    "account_txs_desc_start": QueryDef(
        lambda spark, sf: queries.query_account(
            spark, sf, 3, limit=10, descending=True, start=3000
        ),
        _account_rows_sql(3, True, 3000, 10),
    ),
    "account_txs_empty": QueryDef(
        lambda spark, sf: queries.query_account(spark, sf, 999_999, limit=10, descending=True),
        _account_rows_sql(999_999, True, None, 10),
    ),
    "contract_txs_desc": QueryDef(
        lambda spark, sf: queries.query_contract(spark, sf, 3, 1, limit=25, descending=True),
        _contract_rows_sql(3, 1, True, None, 25),
        bench=True,
    ),
    "contract_txs_asc_start": QueryDef(
        lambda spark, sf: queries.query_contract(spark, sf, 7, 0, limit=50, start=100),
        _contract_rows_sql(7, 0, False, 100, 50),
    ),
    "iterate_account": QueryDef(
        lambda spark, sf: queries.iterate_account(spark, sf, 12),
        _account_rows_sql(12, False, None, None),
        bench=True,
    ),
    "iterate_contract": QueryDef(
        lambda spark, sf: queries.iterate_contract(spark, sf, 7, 0),
        _contract_rows_sql(7, 0, False, None, None),
    ),
    "resume_offset": QueryDef(
        lambda spark, sf: queries.resume_offset(spark, sf),
        wrap("SELECT height FROM summaries ORDER BY id DESC LIMIT 1"),
    ),
    "cis2_supply": QueryDef(
        lambda spark, sf: queries.cis2_supply(spark, sf),
        wrap(
            """
SELECT idx, subidx, token_id,
       CAST(SUM(CAST(amount AS DECIMAL(38,0))) AS BIGINT) AS total_supply
FROM cis2_events GROUP BY idx, subidx, token_id
ORDER BY idx, subidx, token_id
"""
        ),
        bench=True,
    ),
    # NUMERIC(80,0) batch fidelity (m0001-initial.sql:39): same totals as
    # cis2_supply on this corpus, emitted as canonical decimal strings by
    # the limb-summed arbitrary-precision path; the >38-digit regime is
    # covered by tests/test_query_semantics.py against a Python-int oracle
    # (DuckDB itself tops out at DECIMAL(38,0), so the driver oracle can
    # only witness the in-range agreement).
    "cis2_supply_wide": QueryDef(
        queries.cis2_supply_wide,
        wrap(
            """
SELECT idx, subidx, token_id,
       CAST(CAST(SUM(CAST(amount AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR)
         AS total_supply
FROM cis2_events GROUP BY idx, subidx, token_id
ORDER BY idx, subidx, token_id
"""
        ),
    ),
    # The >int64 regime itself earning a driver hash row: amounts ×10^14
    # via scan-side digit append, totals ~10^19-10^21 — past BIGINT and
    # DECIMAL-as-long; limb carry/render path vs DuckDB 128-bit HUGEINT.
    "cis2_supply_wide_overflow": QueryDef(
        queries.cis2_supply_wide_overflow,
        wrap(
            """
SELECT idx, subidx, token_id,
       CAST(SUM(CAST(amount AS HUGEINT) * CAST(100000000000000 AS HUGEINT))
            AS VARCHAR) AS total_supply
FROM cis2_events GROUP BY idx, subidx, token_id
ORDER BY idx, subidx, token_id
"""
        ),
    ),
    "key_bindings_latest": QueryDef(
        lambda spark, sf: queries.key_bindings_latest(spark, sf),
        wrap("SELECT * FROM bindings ORDER BY address"),
        bench=True,
    ),
    "incoming_txs": QueryDef(
        lambda spark, sf: queries.incoming_transactions(spark, sf, 7, limit=50),
        wrap(
            """
SELECT a.id AS ati_id, s.id, s.block, s.ts_ms, s.height, s.summary
FROM ati a JOIN summaries s ON a.summary = s.id
WHERE a.account = 7 AND (s.sender IS NULL OR s.sender <> 7)
ORDER BY a.id DESC LIMIT 50
"""
        ),
    ),
    "account_activity": QueryDef(
        lambda spark, sf: queries.account_activity(spark, sf),
        wrap(
            """
SELECT account, COUNT(*) AS n_txs, MAX(id) AS max_ati_id
FROM ati GROUP BY account ORDER BY account
"""
        ),
        bench=True,
    ),
    "alias_canonical_resolution": QueryDef(
        addresses.canonical_resolution,
        wrap(
            """
, fulladdr AS (
  SELECT id, md5(CAST(account AS VARCHAR)) || md5(CAST(account AS VARCHAR) || 'x') AS full_hex
  FROM ati
),
aliased AS (
  SELECT id,
         substr(full_hex, 1, 58) || substr(md5(CAST(id AS VARCHAR)), 1, 6) AS addr_hex
  FROM fulladdr
),
accounts AS (SELECT DISTINCT full_hex FROM fulladdr)
SELECT a.id, c.full_hex AS canonical_hex
FROM aliased a JOIN accounts c ON substr(a.addr_hex, 1, 58) = substr(c.full_hex, 1, 58)
ORDER BY id
"""
        ),
    ),
    "account_activity_salted": QueryDef(
        lambda spark, sf: queries.account_activity_salted(spark, sf, 16),
        wrap(
            """
SELECT account, COUNT(*) AS n_txs, MAX(id) AS max_ati_id
FROM ati GROUP BY account ORDER BY account
"""
        ),
    ),
    "summary_parse": QueryDef(
        queries.parsed_summaries,
        wrap(
            """
SELECT id,
       json_extract_string(summary, '$.tag') AS tag,
       json_extract_string(summary, '$.type') AS typ,
       CAST(json_extract(summary, '$.k') AS INTEGER) AS k_parsed
FROM summaries
WHERE json_extract_string(summary, '$.tag') IS NOT NULL
ORDER BY id
"""
        ),
        bench=True,
    ),
    "cis2_supply_guarded": QueryDef(
        queries.cis2_supply_guarded,
        wrap(
            """
SELECT idx, subidx, token_id,
       CAST(SUM(CAST(amount AS DECIMAL(38,0))) AS BIGINT) AS total_supply
FROM (SELECT c.*, c.summary // 8 AS height FROM cis2_events c) m
JOIN (SELECT event_id // 8 AS height, bool_and(k % 97 <> 0) AS ok
      FROM evt WHERE event_type IN ('purchase', 'error')
      GROUP BY 1) g USING (height)
WHERE g.ok
GROUP BY idx, subidx, token_id
ORDER BY idx, subidx, token_id
"""
        ),
        bench=True,
    ),
    # ------------------------------------------------------------------
    # General relational/analytic surface (bench workload)
    # ------------------------------------------------------------------
    "user_sessions": QueryDef(
        relational.user_sessions,
        """
WITH evt AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events
), marked AS (
  SELECT user_id, ts_ms, event_id,
         CASE WHEN LAG(ts_ms) OVER w IS NULL
                   OR ts_ms - LAG(ts_ms) OVER w > 1800000
              THEN 1 ELSE 0 END AS is_new
  FROM evt
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
), numbered AS (
  SELECT user_id, ts_ms,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
        bench=True,
    ),
    "pricing_summary": QueryDef(
        relational.pricing_summary,
        """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(ROUND((l_extendedprice) * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        bench=True,
    ),
    "top_orders_by_revenue": QueryDef(
        relational.top_orders_by_revenue,
        """
SELECT o_orderkey, o_orderpriority,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
  epoch_ms(MAX(o_orderdate)) AS o_orderdate_ms
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT 10
""",
        bench=True,
    ),
    "late_order_priority_counts": QueryDef(
        relational.late_order_priority_counts,
        """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        bench=True,
    ),
    "nation_revenue": QueryDef(
        relational.nation_revenue,
        """
SELECT n_name,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name
""",
        bench=True,
    ),
    "region_nation_revenue": QueryDef(
        relational.region_nation_revenue,
        """
SELECT r_name AS region, n_name AS nation,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
  COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
""",
    ),
    "brand_revenue": QueryDef(
        relational.brand_revenue,
        """
SELECT p_brand, p_type,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand, p_type
ORDER BY p_brand, p_type
""",
        bench=True,
    ),
    # §2.12 explicit absences in the reference, provided as extensions:
    # rollup subtotals and set operations.
    "order_priority_rollup": QueryDef(
        relational.order_priority_rollup,
        """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
ORDER BY priority, status
""",
        bench=True,
    ),
    "repeat_customers": QueryDef(
        relational.repeat_customers,
        """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY o_custkey
""",
    ),
    "churned_customers": QueryDef(
        relational.churned_customers,
        """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY o_custkey
""",
    ),
    "active_customers_union": QueryDef(
        relational.active_customers_union,
        """
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
UNION
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY o_custkey
""",
    ),
    "nation_monthly_cumulative": QueryDef(
        relational.nation_monthly_cumulative,
        """
SELECT nation, month, month_cents,
       CAST(SUM(month_cents) OVER (
            PARTITION BY nation ORDER BY month
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
FROM (
  SELECT n_name AS nation,
         strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS month_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
) monthly
ORDER BY nation, month
""",
        bench=True,
    ),
    "above_average_orders": QueryDef(
        relational.above_average_orders,
        """
SELECT o_orderkey, o_custkey,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_cents
FROM orders o
WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
      * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         FROM orders i WHERE i.o_custkey = o.o_custkey)
ORDER BY o_orderkey
""",
    ),
    "priority_part_breadth": QueryDef(
        relational.priority_part_breadth,
        """
SELECT o_orderpriority, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    ),
    "priority_part_breadth_approx": QueryDef(
        relational.priority_part_breadth_approx,
        None,  # HLL sketches are engine-specific — no cross-engine value
        # oracle exists; accuracy is bounded vs the exact twin in
        # tests/test_approx.py, and the driver records rows-only.
    ),
    "customer_order_distribution": QueryDef(
        relational.customer_order_distribution,
        """
SELECT n_orders, COUNT(*) AS n_customers
FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) pc
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
""",
        bench=True,
    ),
    "part_supplier_variety": QueryDef(
        relational.part_supplier_variety,
        """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS n_suppliers, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10 AND p_brand <> 'Brand#13'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY p_brand, p_size
""",
        bench=True,
    ),
    "big_volume_orders": QueryDef(
        relational.big_volume_orders,
        """
SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents, sum_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum_qty > 250) b
  ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY price_cents DESC, o_orderkey ASC
LIMIT 20
""",
        bench=True,
    ),
    "small_quantity_revenue": QueryDef(
        relational.small_quantity_revenue,
        """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN (SELECT l_partkey AS pk, COUNT(*) AS n_li,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qsum
      FROM lineitem GROUP BY 1) p
  ON l.l_partkey = p.pk
WHERE CAST(ROUND(l_quantity) AS BIGINT) * 5 * n_li < qsum
""",
    ),
    "rich_inactive_customers": QueryDef(
        relational.rich_inactive_customers,
        """
SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c_cents
FROM customer c
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * (SELECT COUNT(*) FROM customer)
      > (SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) FROM customer)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-07-01')
ORDER BY c_custkey
""",
    ),
    "order_status_cube": QueryDef(
        relational.order_status_cube,
        """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
ORDER BY priority, status
""",
    ),
    "priority_status_grouping_sets": QueryDef(
        relational.priority_status_grouping_sets,
        """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
ORDER BY priority, status
""",
    ),
    "customer_order_gaps": QueryDef(
        relational.customer_order_gaps,
        """
SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS ts_ms,
       LAG(epoch_ms(o_orderdate)) OVER w AS prev_ms,
       LEAD(epoch_ms(o_orderdate)) OVER w AS next_ms,
       epoch_ms(o_orderdate) - LAG(epoch_ms(o_orderdate)) OVER w AS gap_ms
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate), o_orderkey)
ORDER BY o_custkey, ts_ms, o_orderkey
""",
    ),
    "customer_spend_deciles": QueryDef(
        relational.customer_spend_deciles,
        """
SELECT o_custkey, spend_cents,
       NTILE(10) OVER (ORDER BY spend_cents DESC, o_custkey ASC) AS decile
FROM (SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
      FROM orders GROUP BY o_custkey)
ORDER BY o_custkey
""",
    ),
    "nation_segment_pivot": QueryDef(
        relational.nation_segment_pivot,
        """
SELECT n_name,
       COUNT(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS seg_automobile,
       COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS seg_building,
       COUNT(*) FILTER (c_mktsegment = 'FURNITURE') AS seg_furniture,
       COUNT(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS seg_household,
       COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS seg_machinery
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
""",
    ),
    "supplier_rank_family": QueryDef(
        relational.supplier_rank_family,
        """
SELECT s_nationkey, s_suppkey,
       CAST(ROUND(s_acctbal * 100) AS BIGINT) AS bal_cents,
       DENSE_RANK() OVER w AS drank,
       CAST(ROUND(1000 * PERCENT_RANK() OVER w) AS BIGINT) AS prank_permille,
       CAST(ROUND(1000 * CUME_DIST() OVER w) AS BIGINT) AS cume_permille,
       FIRST_VALUE(s_suppkey) OVER wf AS richest,
       LAST_VALUE(s_suppkey) OVER wf AS poorest,
       NTH_VALUE(s_suppkey, 2) OVER wf AS runner_up
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey
             ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT) DESC, s_suppkey ASC),
       wf AS (PARTITION BY s_nationkey
              ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT) DESC, s_suppkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY s_nationkey, drank, s_suppkey
""",
    ),
    "doc_length_percentiles": QueryDef(
        relational.doc_length_percentiles,
        """
WITH ranked AS (
  SELECT n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars ASC) AS rn,
         COUNT(*) OVER () AS n
  FROM documents
)
SELECT q_permille, n_chars AS pctl_n_chars
FROM ranked, (SELECT unnest(CAST([250, 500, 750, 900, 990] AS BIGINT[])) AS q_permille) q
WHERE rn = (n - 1) * q_permille // 1000 + 1
ORDER BY q_permille
""",
    ),
    "doc_length_percentiles_approx": QueryDef(
        relational.doc_length_percentiles_approx,
        None,  # t-digest sketches are engine-specific — rows-only check;
        # rank error vs the exact twin is bounded in tests/test_approx.py.
    ),
    "doc_quality_gate": QueryDef(
        textstats.quality_gate,
        wrap(
            f"""
SELECT doc_id, reason, reason = 'ok' AS accept
FROM (
  SELECT doc_id,
    {textstats.gate_reason_sql("text", "duckdb")} AS reason
  FROM documents)
ORDER BY doc_id
"""
        ),
    ),
    "doc_tfdf_top_terms": QueryDef(
        textstats.tfdf_top_terms,
        wrap(
            """
, term AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM term GROUP BY doc_id, term),
tdf AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df, tf * (1000000 // df) AS score, rank
FROM (
  SELECT doc_id, term, tf, df,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tf * (1000000 // df) DESC, term ASC) AS rank
  FROM tf JOIN tdf USING (term))
WHERE rank <= 3
ORDER BY doc_id, rank
"""
        ),
    ),
    "doc_token_df_distribution": QueryDef(
        textstats.token_df_distribution,
        wrap(
            """
SELECT df, COUNT(*) AS n_terms
FROM (SELECT tok, COUNT(*) AS df FROM tokset GROUP BY tok)
GROUP BY df
ORDER BY df
"""
        ),
    ),
    "top_spenders": QueryDef(
        relational.top_spenders,
        """
SELECT user_id,
  CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
  COUNT(*) AS n_purchases
FROM events WHERE event_type = 'purchase'
GROUP BY user_id
ORDER BY spend_cents DESC, user_id
LIMIT 10
""",
    ),
    "orders_by_weekday": QueryDef(
        relational.orders_by_weekday,
        """
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY iso_dow
ORDER BY iso_dow
""",
    ),
    "weekly_retention": QueryDef(
        relational.weekly_retention,
        wrap(
            """
, weeks AS (SELECT user_id, ts_ms // 604800000 AS week FROM evt),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id)
SELECT cohort_week, week - cohort_week AS week_offset,
       COUNT(DISTINCT user_id) AS n_active_users
FROM weeks JOIN cohort USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""
        ),
        bench=True,
    ),
    "event_funnel": QueryDef(
        relational.event_funnel,
        wrap(
            """
, s AS (SELECT user_id, MIN(ts_ms) AS s_ms FROM evt
        WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts_ms) AS c_ms
      FROM evt e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts_ms > s.s_ms GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts_ms) AS p_ms
      FROM evt e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts_ms > c.c_ms GROUP BY e.user_id)
SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM s
UNION ALL
SELECT '2_click_after_signup', COUNT(*) FROM c
UNION ALL
SELECT '3_purchase_after_click', COUNT(*) FROM p
ORDER BY stage
"""
        ),
    ),
    "event_type_sliding": QueryDef(
        relational.event_type_sliding,
        wrap(
            """
SELECT event_type, w AS window_start_hour, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM (SELECT event_type, value,
             unnest([ts_ms // 3600000, ts_ms // 3600000 - 1]) AS w
      FROM evt)
GROUP BY event_type, w
ORDER BY event_type, w
"""
        ),
    ),
    "event_type_hourly": QueryDef(
        relational.event_type_hourly,
        """
SELECT event_type, epoch_ms(ts) // 3600000 AS hour_bucket,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(ROUND((value) * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type, hour_bucket
ORDER BY event_type, hour_bucket
""",
        bench=True,
    ),
    # ------------------------------------------------------------------
    # Temporal joins (as-of / banded range — SURVEY §2.12 extension ops)
    # ------------------------------------------------------------------
    "nation_pair_volume": QueryDef(
        relational.nation_pair_volume,
        """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS volume_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
""",
        bench=True,
    ),
    "nation_market_share": QueryDef(
        relational.nation_market_share,
        f"""
WITH vols AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS BIGINT) AS nation_cents,
  CAST(SUM(vol) AS BIGINT) AS total_cents,
  {_mm_sql("SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END)", "SUM(vol)")} AS share_permille
FROM vols
GROUP BY o_year
ORDER BY o_year
""",
        bench=True,
    ),
    "promo_revenue_permille": QueryDef(
        relational.promo_revenue_permille,
        f"""
SELECT
  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_cents,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
  {_mm_sql("SUM(CASE WHEN p_type = 'PROMO' THEN CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) ELSE 0 END)", "SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT))")} AS promo_permille
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
""",
        bench=True,
    ),
    "disjunctive_part_revenue": QueryDef(
        relational.disjunctive_part_revenue,
        """
SELECT
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
  COUNT(*) AS qualifying_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
        bench=True,
    ),
    "lone_late_supplier": QueryDef(
        relational.lone_late_supplier,
        """
WITH late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
        bench=True,
    ),
    "part_margin_by_nation": QueryDef(
        relational.part_margin_by_nation,
        """
SELECT sn.n_name AS supp_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
         - CAST(ROUND((l_quantity * p_retailprice) * 100) AS BIGINT)) AS BIGINT) AS margin_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%rod%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
GROUP BY supp_nation, ship_year
ORDER BY supp_nation, ship_year
""",
        bench=True,
    ),
    "peak_revenue_suppliers": QueryDef(
        relational.peak_revenue_suppliers,
        """
WITH by_supp AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey
)
SELECT l_suppkey AS s_suppkey, s_name, total_revenue_cents
FROM by_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM by_supp)
ORDER BY s_suppkey
""",
        bench=True,
    ),
    "ansi_sql_gateway": QueryDef(
        relational.ansi_sql_gateway, relational.ANSI_SHARED_SQL
    ),
    "nation_participation_balance": QueryDef(
        relational.nation_participation_balance,
        """
WITH cust AS (SELECT c_nationkey AS ck, COUNT(*) AS n_customers FROM customer GROUP BY ck),
supp AS (SELECT s_nationkey AS sk, COUNT(*) AS n_suppliers FROM supplier GROUP BY sk),
merged AS (
  SELECT COALESCE(ck, sk) AS nationkey,
         COALESCE(n_customers, 0) AS n_customers,
         COALESCE(n_suppliers, 0) AS n_suppliers
  FROM cust FULL OUTER JOIN supp ON ck = sk
)
SELECT n_name, n_customers, n_suppliers,
       n_customers - n_suppliers AS imbalance
FROM merged JOIN nation ON nationkey = n_nationkey
ORDER BY n_name
""",
        bench=True,
    ),
    "orders_trailing_month_count": QueryDef(
        relational.orders_trailing_month_count,
        """
SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS od_ms,
  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
       RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_month
FROM orders
ORDER BY o_orderkey
""",
        bench=True,
    ),
    "event_hourly_anomaly": QueryDef(
        relational.event_hourly_anomaly,
        f"""
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hour_bucket, COUNT(*) AS n_events
  FROM events
  GROUP BY event_type, hour_bucket
)
SELECT event_type, hour_bucket, n_events,
  {_mm_sql("CAST(n_events AS HUGEINT) * COUNT(n_events) OVER tw", "SUM(n_events) OVER tw", guard=False)} AS ratio_permille
FROM hourly
WINDOW tw AS (
    PARTITION BY event_type ORDER BY hour_bucket
    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
ORDER BY event_type, hour_bucket
""",
        bench=True,
    ),
    "event_zorder_manifest": QueryDef(
        relational.event_zorder_manifest, _zorder_sql()
    ),
    "event_zorder_keys": QueryDef(
        # per-event Morton keys, deterministically ordered for the
        # hash compare (ties impossible: (user_id, ts_s) -> one z)
        lambda spark, sf: relational.event_zorder_keys(spark, sf).orderBy(
            "user_id", "ts_s", "z"
        ),
        _zorder_keys_sql(),
    ),
    "forecast_revenue_change": QueryDef(
        relational.forecast_revenue_change,
        """
SELECT
  CAST(SUM(CAST(ROUND((l_extendedprice * l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_increase_cents,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_quantity < 24
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
""",
        bench=True,
    ),
    "returned_item_losses": QueryDef(
        relational.returned_item_losses,
        """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
  CAST(MAX(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
""",
        bench=True,
    ),
    "concentrated_part_revenue": QueryDef(
        relational.concentrated_part_revenue,
        """
WITH pr AS (
  SELECT l_partkey,
    CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, revenue_cents
FROM pr
WHERE revenue_cents * 10000 > 5 * (SELECT SUM(revenue_cents) FROM pr)
ORDER BY revenue_cents DESC, l_partkey
""",
        bench=True,
    ),
    "late_shipment_priority_split": QueryDef(
        relational.late_shipment_priority_split,
        """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
        bench=True,
    ),
    "cheapest_supplier_per_part": QueryDef(
        relational.cheapest_supplier_per_part,
        """
WITH offers AS (
  SELECT p_partkey, s_suppkey, s_name, n_name,
    CAST(ROUND((l_extendedprice / l_quantity) * 100) AS BIGINT) AS unit_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_size = 15
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT DISTINCT p_partkey, s_suppkey, s_name, n_name, unit_cents
FROM offers o
WHERE unit_cents = (SELECT MIN(unit_cents) FROM offers m WHERE m.p_partkey = o.p_partkey)
ORDER BY p_partkey, s_suppkey
LIMIT 100
""",
        bench=True,
    ),
    "dominant_part_suppliers": QueryDef(
        relational.dominant_part_suppliers,
        """
WITH per_pair AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_pair p
  WHERE supp_qty * 2 > (SELECT SUM(supp_qty) FROM per_pair t WHERE t.l_partkey = p.l_partkey)
)
ORDER BY s_suppkey
""",
        bench=True,
    ),
    "asof_purchase_last_click": QueryDef(
        temporal.asof_last_touch,
        wrap(
            """
SELECT p.event_id, p.user_id, p.ts_ms,
       c.event_id AS matched_event_id, c.ts_ms AS matched_ts_ms,
       p.ts_ms - c.ts_ms AS gap_ms
FROM (SELECT * FROM evt WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM evt WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts_ms >= c.ts_ms
ORDER BY p.event_id
"""
        ),
        bench=True,
    ),
    "error_followup_burst": QueryDef(
        temporal.error_followup_burst,
        wrap(
            """
SELECT e.event_id, e.user_id, e.ts_ms, COUNT(f.event_id) AS n_follow
FROM (SELECT * FROM evt WHERE event_type = 'error') e
LEFT JOIN evt f
  ON e.user_id = f.user_id
 AND f.ts_ms > e.ts_ms AND f.ts_ms <= e.ts_ms + 300000
GROUP BY e.event_id, e.user_id, e.ts_ms
ORDER BY e.event_id
"""
        ),
        bench=True,
    ),
    "top_orders_per_customer": QueryDef(
        relational.top_orders_per_customer,
        """
SELECT o_custkey, o_orderkey, price_cents, rank
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
         ) AS rank
  FROM orders)
WHERE rank <= 3
ORDER BY o_custkey, rank
""",
        bench=True,
    ),
    # ------------------------------------------------------------------
    # Training-data pipeline: text analysis
    # ------------------------------------------------------------------
    "doc_token_stats": QueryDef(
        textstats.token_stats,
        wrap(
            f"""
SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_uniq_tokens,
  COALESCE(CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT), 0) AS chars_in_tokens,
  {_mm_sql("COALESCE(CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT), 0)", "len(t)")} AS mean_token_len_permille
FROM toks ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    "doc_repetition_profile": QueryDef(
        textstats.repetition_profile,
        wrap(
            f"""
, rep_cnt AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  GROUP BY doc_id, tok
),
rep_ranked AS (
  SELECT doc_id, tok, c,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, tok) AS rn,
         SUM(c) OVER (PARTITION BY doc_id) AS n_tokens,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_distinct
  FROM rep_cnt
)
SELECT doc_id,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_distinct AS BIGINT) AS n_distinct,
  {_mm_sql("n_distinct", "n_tokens")} AS distinct_permille,
  tok AS top_token,
  CAST(c AS BIGINT) AS top_count,
  {_mm_sql("c", "n_tokens")} AS top_share_permille
FROM rep_ranked WHERE rn = 1
ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    "doc_quality": QueryDef(textstats.quality_scores, _quality_sql()),
    "doc_lang_id": QueryDef(textstats.lang_id, _lang_sql()),
    "doc_lang_confusion": QueryDef(
        textstats.lang_confusion, _lang_confusion_sql(), bench=True
    ),
    "doc_bpe_token_stats": QueryDef(
        textstats.bpe_token_stats,
        wrap(
            r"""
SELECT doc_id,
  len(regexp_extract_all(lower(text),
      '''(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+')) AS n_bpe_pieces,
  len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_ws_tokens
FROM documents
ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    "doc_unigram_surprisal": QueryDef(
        textstats.unigram_surprisal,
        wrap(
            f"""
, uocc AS (SELECT doc_id, unnest(t) AS tok FROM toks),
updt AS (SELECT doc_id, tok, COUNT(*) AS k FROM uocc GROUP BY doc_id, tok),
ucnt AS (SELECT tok, SUM(k) AS cnt FROM updt GROUP BY tok),
utot AS (SELECT SUM(cnt) AS n_total FROM ucnt),
ubits AS (
  SELECT tok,
         CAST(length(bin((SELECT n_total FROM utot)))
              - length(bin(cnt)) AS BIGINT) AS bits
  FROM ucnt
)
SELECT doc_id,
  CAST(SUM(k) AS BIGINT) AS n_tokens,
  CAST(SUM(k * bits) AS BIGINT) AS total_surprisal_bits,
  CAST(MAX(bits) AS BIGINT) AS max_token_bits,
  {_mm_sql("SUM(k * bits)", "SUM(k)", guard=False)} AS mean_surprisal_millibits
FROM updt JOIN ubits USING (tok)
GROUP BY doc_id ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    "doc_bigram_surprisal": QueryDef(
        textstats.bigram_surprisal,
        wrap(
            _BIGRAM_CTES
            + f"""
SELECT doc_id,
  CAST(SUM(k) AS BIGINT) AS n_bigrams,
  CAST(SUM(k * COALESCE(bits, (SELECT oov FROM boov))) AS BIGINT) AS total_surprisal_bits,
  CAST(MAX(COALESCE(bits, (SELECT oov FROM boov))) AS BIGINT) AS max_bigram_bits,
  {_mm_sql("SUM(k * COALESCE(bits, (SELECT oov FROM boov)))", "SUM(k)", guard=False)} AS mean_surprisal_millibits
FROM bpdt LEFT JOIN bbits USING (bg)
GROUP BY doc_id ORDER BY doc_id
"""
        ),
    ),
    # The bucket DECISION over the bigram-LM score: head/middle/tail at
    # the exact 333/667-permille corpus cuts (the value-histogram
    # percentile trick — no global row sort in either engine).
    "doc_perplexity_buckets": QueryDef(
        textstats.perplexity_buckets,
        wrap(
            _BIGRAM_CTES
            + f"""
, bs AS (
  SELECT doc_id,
         {_mm_sql("SUM(k * COALESCE(bits, (SELECT oov FROM boov)))", "SUM(k)", guard=False)} AS s
  FROM bpdt LEFT JOIN bbits USING (bg) GROUP BY doc_id
),
bhist AS (SELECT s, COUNT(*) AS cnt FROM bs GROUP BY s),
bcum AS (SELECT s, cnt, SUM(cnt) OVER (ORDER BY s) AS cum,
                (SELECT COUNT(*) FROM bs) AS n
         FROM bhist),
bcuts AS (
  SELECT MAX(CASE WHEN q = 333 THEN s END) AS t1,
         MAX(CASE WHEN q = 667 THEN s END) AS t2
  FROM (SELECT s, cnt, cum, n, unnest([333, 667]) AS q FROM bcum)
  WHERE cum >= (n - 1) * q // 1000 + 1
    AND cum - cnt < (n - 1) * q // 1000 + 1
)
SELECT doc_id, s AS mean_surprisal_millibits,
  CASE WHEN s <= (SELECT t1 FROM bcuts) THEN 'head'
       WHEN s <= (SELECT t2 FROM bcuts) THEN 'middle'
       ELSE 'tail' END AS bucket
FROM bs ORDER BY doc_id
"""
        ),
    ),
    "doc_perceptron_train": QueryDef(
        textstats.perceptron_train, _perceptron_sql()
    ),
    "doc_perceptron_eval": QueryDef(
        textstats.perceptron_eval, _perceptron_eval_sql()
    ),
    "corpus_bpe_merges": QueryDef(
        textstats.bpe_merges, _bpe_sql()
    ),
    "corpus_bpe_apply": QueryDef(
        textstats.bpe_apply, _bpe_apply_sql()
    ),
    "doc_winnow_fingerprints": QueryDef(
        textstats.winnow_fingerprints,
        wrap(
            """
, wgrams AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(t) - 2),
                        i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS h
  FROM toks WHERE len(t) >= 6
)
SELECT doc_id,
       unnest(list_distinct(list_transform(
           generate_series(1, len(h) - 3), i -> list_min(h[i:i+3])))) AS fp
FROM wgrams
ORDER BY doc_id, fp
"""
        ),
    ),
    "doc_fingerprints": QueryDef(
        textstats.fingerprints, wrap("SELECT doc_id, fp FROM fp ORDER BY doc_id")
    ),
    "doc_winnow_dup_pairs": QueryDef(
        textstats.winnow_dup_pairs,
        wrap(
            f"""
, wgrams AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(t) - 2),
                        i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS h
  FROM toks WHERE len(t) >= 6
),
wfp0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(h) - 3), i -> list_min(h[i:i+3])))) AS fp
  FROM wgrams
),
wstop AS (SELECT fp FROM wfp0 GROUP BY fp HAVING COUNT(*) > {textstats.WINNOW_MAX_DF}),
wfp AS (SELECT * FROM wfp0 WHERE fp NOT IN (SELECT fp FROM wstop))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM wfp a JOIN wfp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING COUNT(*) >= 2
ORDER BY doc_a, doc_b
"""
        ),
        bench=True,
    ),
    # PII tagging + redaction (Dolma/FineWeb-style curation step). The
    # SQL interpolates the SAME pattern literals the Spark op compiles
    # (textstats.PII_PATTERNS), so the two engines can never drift on
    # the pattern text; the patterns themselves are lookaround-free so
    # Java regex and RE2 agree on every match.
    "doc_pii_stats": QueryDef(
        textstats.pii_stats,
        wrap(
            "SELECT doc_id, "
            + ", ".join(
                f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
                f" AS n_{name}"
                for name, pat, _ in textstats.PII_PATTERNS
            )
            + ", CAST("
            + " + ".join(
                f"len(regexp_extract_all(text, '{pat}'))"
                for _, pat, _ in textstats.PII_PATTERNS
            )
            + " AS BIGINT) AS n_pii FROM documents ORDER BY doc_id"
        ),
        bench=True,
    ),
    "doc_pii_redact": QueryDef(
        textstats.pii_redact,
        wrap(
            "SELECT doc_id, clean_text, clean_text != text AS changed FROM ("
            "SELECT doc_id, text, "
            + _nested_pii_replace("text")
            + " AS clean_text FROM documents) ORDER BY doc_id"
        ),
    ),
    "source_pii_profile": QueryDef(
        textstats.source_pii_profile,
        wrap(
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_pii) AS BIGINT) AS total_pii, "
            "CAST(SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS docs_with_pii, "
            + _mm_sql("SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END)", "COUNT(*)")
            + " AS pii_doc_permille "
            "FROM (SELECT source, "
            + " + ".join(
                f"len(regexp_extract_all(text, '{pat}'))"
                for _, pat, _ in textstats.PII_PATTERNS
            )
            + " AS n_pii FROM documents) GROUP BY source ORDER BY source"
        ),
    ),
    # No-silent-caps audit twin of doc_stop_shingles for the winnow cap.
    "doc_winnow_stop_fps": QueryDef(
        textstats.winnow_stop_fps,
        wrap(
            f"""
, wgrams AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(t) - 2),
                        i -> md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS h
  FROM toks WHERE len(t) >= 6
),
wfp0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(h) - 3), i -> list_min(h[i:i+3])))) AS fp
  FROM wgrams
)
SELECT fp, COUNT(*) AS df FROM wfp0 GROUP BY fp
HAVING COUNT(*) > {textstats.WINNOW_MAX_DF} ORDER BY fp
"""
        ),
    ),
    # ------------------------------------------------------------------
    # Training-data pipeline: deduplication
    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # Blocked entity resolution (fuzzy record linkage) — the structured-
    # record twin of document dedup: normalize -> conjunctive block
    # (name prefix + nation) -> within-block bounded-Levenshtein verify.
    # The verify join is a pure equi-join on the block keys (never a
    # cartesian), so pair work is sum(|block|^2), the LSH-band bound.
    # Both oracles render their blocking/verify SQL from the ONE
    # _LINKAGE_CBLK/_LINKAGE_PAIRS fragment pair (the _BPAIRS_SQL
    # convention), so the two linkage oracles cannot drift apart.
    "customer_fuzzy_matches": QueryDef(
        linkage.customer_fuzzy_matches,
        _LINKAGE_CBLK
        + f"""
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance
{_LINKAGE_PAIRS}
ORDER BY key_a, key_b
""",
        bench=True,
    ),
    # The second block-key PROVIDER (r8): banded char-3-gram MinHash
    # keys through the same verify kernel — proving the pluggable-key
    # claim with a fully oracle-backed query: the signature family's
    # (A, B, P) constants render into this SQL from the linkage module,
    # so both engines compute the identical integer signatures and the
    # blocked pair SET (not just the verified output) is cross-engine
    # exact. CAPPED default since r9 (the mfin fragment): bands above
    # MINHASH_BAND_CAP fall back to the prefix fuzz-window key — the
    # hot-band Σ|band|² tail is gone and both engines re-key the
    # identical bands; what the cap re-keys is the customer_stop_bands
    # audit below.
    "customer_fuzzy_matches_minhash": QueryDef(
        linkage.customer_fuzzy_matches_minhash,
        _MINHASH_MFIN
        + f"""
SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b,
       a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance
FROM mfin a JOIN mfin b
  ON a.blk = b.blk AND a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.name, b.name) <= {linkage.MAX_EDIT_DISTANCE}
ORDER BY key_a, key_b
""",
        bench=True,
    ),
    # The no-silent-caps audit twin for the cap (r9, the
    # doc_stop_shingles artifact): every band the capped default
    # re-keys, with the C(size,2) verify work it would have bought.
    "customer_stop_bands": QueryDef(
        linkage.customer_stop_bands,
        _MINHASH_MBLK
        + f"""
, msb AS (
  SELECT blk, c_nationkey, COUNT(*) AS block_size
  FROM mblk WHERE blk IS NOT NULL GROUP BY blk, c_nationkey
)
SELECT blk, c_nationkey, block_size,
       block_size * (block_size - 1) // 2 AS candidate_pairs
FROM msb WHERE block_size > {linkage.MINHASH_BAND_CAP}
ORDER BY blk, c_nationkey
""",
    ),
    # Capacity audit for the CANDIDATE key (r8): profile a provider
    # BEFORE switching the pipeline to it — on this corpus the audit is
    # load-bearing, showing the minhash bands run hot (max block ~294 at
    # sf0.1) because TPC-H names share most grams.
    "customer_block_profile_minhash": QueryDef(
        lambda spark, sf_dir: linkage.customer_block_profile(
            spark, sf_dir, key="minhash_band"
        ),
        _MINHASH_MBLK
        + """
, bszm AS (
  SELECT blk, c_nationkey, COUNT(*) AS block_size
  FROM mblk WHERE blk IS NOT NULL GROUP BY blk, c_nationkey
)
SELECT block_size, COUNT(*) AS n_blocks,
       COUNT(*) * (block_size * (block_size - 1) // 2) AS candidate_pairs
FROM bszm GROUP BY block_size
ORDER BY block_size
""",
    ),
    # The third provider (late r8): bucketed sorted-neighborhood —
    # deterministic window recall (every pair within SN_WINDOW rank
    # positions is guaranteed; none beyond), O(N·w) pair work with NO
    # hot-block failure mode. The oracle's single-partition ROW_NUMBER
    # is replaced on the Spark side by the distributed two-pass
    # global_ranked; both produce the identical total order because the
    # sort key (name, custkey) is unique.
    "customer_fuzzy_matches_sorted": QueryDef(
        linkage.customer_fuzzy_matches_sorted,
        f"""
WITH snr AS (
  SELECT c_custkey, lower(c_name) AS name, c_nationkey,
         ROW_NUMBER() OVER (ORDER BY lower(c_name), c_custkey) AS rn
  FROM customer
),
snb AS (
  SELECT c_custkey, name, c_nationkey,
         's:' || CAST((rn - 1) // {linkage.SN_WINDOW} AS VARCHAR) AS blk
  FROM snr
  UNION ALL
  SELECT c_custkey, name, c_nationkey,
         's:' || CAST((rn - 1) // {linkage.SN_WINDOW} + 1 AS VARCHAR)
  FROM snr
)
SELECT DISTINCT a.c_custkey AS key_a, b.c_custkey AS key_b,
       a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_distance
FROM snb a JOIN snb b
  ON a.blk = b.blk AND a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.name, b.name) <= {linkage.MAX_EDIT_DISTANCE}
ORDER BY key_a, key_b
""",
    ),
    # Multi-field match evidence (late r8, Fellegi & Sunter 1969): the
    # scoring step after blocking+verify — per-field agreement
    # indicators + an additive integer log-odds weight for the merge
    # review queue. The whole SELECT renders through
    # _linkage_evidence_core from the linkage module's weight/tolerance
    # literals (r8 ADVICE fix); everything is integer, so the oracle
    # hash-matches.
    "customer_match_evidence": QueryDef(
        linkage.customer_match_evidence,
        _linkage_evidence_core(_LINKAGE_MEV_PREFIX)
        + "\nORDER BY key_a, key_b\n",
    ),
    # Provider-parametrized evidence (r9 — the r8 verdict asked the
    # scorer to accept key=... like the profile does): the SAME
    # rendered evidence SELECT over the capped-minhash provider's
    # default pair frame, proving the scoring stage is
    # provider-agnostic with a non-default provider oracle-green.
    "customer_match_evidence_minhash": QueryDef(
        lambda spark, sf_dir: linkage.customer_match_evidence(
            spark, sf_dir, key="minhash_band"
        ),
        _linkage_evidence_core(_LINKAGE_MEV_MINHASH)
        + "\nORDER BY key_a, key_b\n",
    ),
    # The decision layer (r9, the Fellegi-Sunter upper/lower cut): the
    # evidence frame banded into auto_merge / review / reject — the
    # artifact a merge queue actually consumes. Thresholds interpolate
    # from linkage.MATCH_THRESHOLD_UPPER/LOWER; the evidence subquery
    # is the same single rendering as the evidence oracles, so op and
    # oracle cannot band different scores.
    "customer_match_verdict": QueryDef(
        linkage.customer_match_verdict,
        f"""
SELECT *,
       CASE WHEN match_weight >= {linkage.MATCH_THRESHOLD_UPPER}
            THEN 'auto_merge'
            WHEN match_weight >= {linkage.MATCH_THRESHOLD_LOWER}
            THEN 'review'
            ELSE 'reject' END AS verdict
FROM ({_linkage_evidence_core(_LINKAGE_MEV_PREFIX)})
ORDER BY key_a, key_b
""",
    ),
    # Fellegi-Sunter m/u parameter ESTIMATION (r9): the step that
    # justifies the hand-quantized MATCH_WEIGHTS — per-field agreement
    # rates among verified pairs (m) vs among ALL pairs (u), exact
    # closed forms from the value histograms for name/segment, and the
    # balance tolerance count via the CDF prefix-sum identity (the
    # oracle's plain cumulative window mirrors the Spark side's
    # distributed global_cumsum — no pair is ever enumerated on either
    # engine). All integer (ppm via DIV), so the oracle hash-matches;
    # tolerance renders from the linkage module like everything else.
    "customer_match_field_odds": QueryDef(
        linkage.customer_match_field_odds,
        _LINKAGE_MEV_PREFIX
        + _LINKAGE_ODDS_CTES
        + """
SELECT field, m_ppm, u_ppm,
       CAST(m_ppm * 1000 // greatest(1, u_ppm) AS BIGINT) AS mu_ratio_x1000
FROM oppm
ORDER BY field
""",
    ),
    # Closing the Fellegi-Sunter loop (r10, the r9 verdict's #1 item):
    # the verdict scored with weights DERIVED from the field-odds
    # estimate — quantized integer log2 of the m/u ratios
    # (length(bin(x)) - 1 = floor(log2 x), the tfidf idf_bits primitive,
    # identical on both engines), clamped to +/-ESTIMATED_WEIGHT_CAP,
    # banded by the calibrated ESTIMATED_THRESHOLD cuts. The odds CTEs
    # are the SAME single rendering as the field-odds oracle
    # (_LINKAGE_ODDS_CTES) and the weight formula renders once
    # (_EST_W), so op and oracle cannot quantize differently.
    "customer_match_verdict_estimated": QueryDef(
        linkage.customer_match_verdict_estimated,
        _linkage_estimated_verdict_sql(),
        # detail-bench presence (the r9 item-6 treatment): the round's
        # flagship decision path gets a regression-visible cell without
        # touching the 28-query headline
        bench=True,
    ),
    "customer_best_match": QueryDef(
        linkage.customer_best_match,
        _LINKAGE_CBLK
        + f"""
, cpair AS (
  SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
         levenshtein(a.name, b.name) AS d
  {_LINKAGE_PAIRS}
),
csym AS (
  SELECT key_a AS key, key_b AS match_key, d FROM cpair
  UNION ALL
  SELECT key_b AS key, key_a AS match_key, d FROM cpair
)
SELECT key, match_key, CAST(d AS BIGINT) AS edit_distance
FROM (
  SELECT key, match_key, d,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY d, match_key) AS rn
  FROM csym
)
WHERE rn = 1
ORDER BY key
""",
    ),
    # Transitive entity formation over the fuzzy pair graph (the
    # doc_dup_components treatment on the structured-record side):
    # recursive min-label walk from every customer, singletons included,
    # entity_id = cluster-minimal custkey. Blocking/verify SQL is the
    # same _LINKAGE_CBLK/_LINKAGE_PAIRS fragment pair as the other two
    # linkage oracles — one rendering, zero drift.
    "customer_match_components": QueryDef(
        linkage.customer_match_components,
        _LINKAGE_LCOMP
        + """
SELECT c.custkey, c.entity_id, s.entity_size
FROM lcomp c
JOIN (SELECT entity_id, COUNT(*) AS entity_size
      FROM lcomp GROUP BY entity_id) s USING (entity_id)
ORDER BY custkey
""",
    ),
    # The MERGE itself (late r9): survivorship over the entity clusters
    # — one consolidated row per entity (survivor = cluster-min key,
    # its name survives, balances merge by integer-cents sum,
    # singletons pass through). Same recursive walk CTEs as the
    # components oracle — one rendering, zero drift.
    "customer_golden_record": QueryDef(
        linkage.customer_golden_record,
        _LINKAGE_LCOMP
        + """
, gattr AS (
  SELECT c_custkey, lower(c_name) AS name,
         CAST(ROUND(100 * c_acctbal) AS BIGINT) AS bal_cents
  FROM customer
)
SELECT c.entity_id,
       COUNT(*) AS n_members,
       CAST(SUM(a.bal_cents) AS BIGINT) AS merged_bal_cents,
       MAX(CASE WHEN c.custkey = c.entity_id THEN a.name END)
         AS survivor_name
FROM lcomp c JOIN gattr a ON c.custkey = a.c_custkey
GROUP BY c.entity_id
ORDER BY entity_id
""",
        # bench presence for the completed ER arc (r9 verdict item #6):
        # the merge stage rides the component fixpoint, so a perf
        # regression anywhere in the ER lineage shows up in its cell.
        bench=True,
    ),
    # Blocking-key capacity planning (the doc_stop_shingles treatment
    # for ER): block-size histogram + exact C(size,2) pair work per
    # size — the pre-join audit that catches an over-coarse key. Same
    # shared blocking CTE as every linkage oracle.
    "customer_block_profile": QueryDef(
        linkage.customer_block_profile,
        _LINKAGE_CBLK
        + """
, bsz AS (
  SELECT blk, c_nationkey, COUNT(*) AS block_size
  FROM cblk GROUP BY blk, c_nationkey
)
SELECT block_size, COUNT(*) AS n_blocks,
       COUNT(*) * (block_size * (block_size - 1) // 2) AS candidate_pairs
FROM bsz GROUP BY block_size
ORDER BY block_size
""",
    ),
    # The planner's CONCLUSION (r10, r9 verdict item #4): per-provider
    # capacity stats + hot-band mass share + a machine-readable
    # recommendation — the dominated capped-minhash configuration is
    # flagged by the engine, not just by SCALE.md prose. Blocking CTEs
    # are the same three shared fragments as every linkage oracle
    # (cblk / mblk / mfin); threshold, cap and note strings render from
    # the linkage module; the permille is the engine-wide _mm_sql
    # rounding.
    "customer_blocking_plan": QueryDef(
        linkage.customer_blocking_plan,
        _MINHASH_MFIN
        + ",\n"
        + _LINKAGE_CBLK[len(_LINKAGE_PROLOGUE):]
        + f"""
, pstat AS (
  SELECT 'prefix' AS provider, * FROM ({_plan_stat_sql("cblk")})
  UNION ALL
  SELECT 'minhash_band', * FROM ({_plan_stat_sql("mblk")})
  UNION ALL
  SELECT 'minhash_band_capped', * FROM ({_plan_stat_sql("mfin")})
),
pperm AS (
  SELECT *, {_mm_sql("hot_block_pairs", "candidate_pairs")} AS hot_pair_permille
  FROM pstat
),
pmh AS (SELECT hot_pair_permille AS mh_hot FROM pperm
        WHERE provider = 'minhash_band')
SELECT provider, n_blocks, max_block_size, candidate_pairs, hot_block_pairs,
       hot_pair_permille,
       CAST(CASE WHEN (SELECT mh_hot FROM pmh) > {linkage.HOT_MASS_PERMILLE_MAX}
                 THEN provider = 'prefix'
                 ELSE provider = 'minhash_band' END AS BIGINT) AS recommended,
       CASE WHEN provider = 'prefix' THEN '{linkage.PLAN_NOTES["prefix"]}'
            WHEN provider = 'minhash_band_capped'
            THEN '{linkage.PLAN_NOTES["capped"]}'
            WHEN (SELECT mh_hot FROM pmh) > {linkage.HOT_MASS_PERMILLE_MAX}
            THEN '{linkage.PLAN_NOTES["minhash_hot"]}'
            ELSE '{linkage.PLAN_NOTES["minhash_cold"]}' END AS note
FROM pperm
ORDER BY provider
""",
        # detail-bench presence: the planner aggregates three corpus
        # blocking profiles — a lost broadcast or pin would show here
        # between slope refreshes
        bench=True,
    ),
    # The deliberately-missing u(name_close) estimate, by fixed-size
    # deterministic sampling (r10, r9 verdict stretch) — DECLARED
    # APPROXIMATE, rows-only like the PQ designs: a sampled rate has no
    # recomputable exact oracle; the tiny-scale ground-truth test pins
    # that at k=1 (sample == corpus) it equals the exhaustive truth.
    "customer_match_field_odds_sampled": QueryDef(
        linkage.customer_match_field_odds_sampled, None
    ),
    "corpus_dedup_stats": QueryDef(
        dedup.corpus_dedup_stats,
        f"""
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct,
  COUNT(*) - COUNT(DISTINCT md5(text)) AS dup_docs,
  {_mm_sql("COUNT(*) - COUNT(DISTINCT md5(text))", "COUNT(*)")} AS dup_permille
FROM documents
GROUP BY source
ORDER BY source
""",
        bench=True,
    ),
    "corpus_source_overlap": QueryDef(
        dedup.source_overlap,
        wrap(
            f"""
, ssh AS (
  SELECT DISTINCT d.source, s.sh
  FROM shingles s JOIN documents d USING (doc_id)
),
ssz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM ssh GROUP BY source),
spr AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS inter_shingles
  FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, inter_shingles,
  za.n_sh AS n_a, zb.n_sh AS n_b,
  {_mm_sql("inter_shingles", "za.n_sh + zb.n_sh - inter_shingles", guard=False)} AS jaccard_permille
FROM spr JOIN ssz za ON za.source = spr.src_a JOIN ssz zb ON zb.source = spr.src_b
ORDER BY src_a, src_b
"""
        ),
        bench=True,
    ),
    "doc_bm25_topk": QueryDef(
        retrieval.bm25_topk, wrap(retrieval.bm25_sql()), bench=True
    ),
    "hybrid_rrf_topk": QueryDef(
        retrieval.hybrid_rrf_topk,
        wrap(
            retrieval.bm25_ctes()
            + f"""
, bmr AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id ASC) AS bm25_rank
  FROM bms
  QUALIFY bm25_rank <= {retrieval.RRF_DEPTH}
),
annr AS (
  SELECT doc_id, ann_rank FROM (
    SELECT c.vec_id AS doc_id,
           ROW_NUMBER() OVER (ORDER BY {_COSINE_SIM} DESC, c.vec_id ASC) AS ann_rank
    FROM qvec q JOIN qvec c ON q.vec_id = 0 AND c.vec_id >= 1) s
  WHERE ann_rank <= {retrieval.RRF_DEPTH}
)
SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
  CAST(COALESCE(b.bm25_rank, 0) AS BIGINT) AS bm25_rank,
  CAST(COALESCE(a.ann_rank, 0) AS BIGINT) AS ann_rank,
  CAST((CASE WHEN b.bm25_rank IS NOT NULL
             THEN 1000 // ({retrieval.RRF_K} + b.bm25_rank) ELSE 0 END)
     + (CASE WHEN a.ann_rank IS NOT NULL
             THEN 1000 // ({retrieval.RRF_K} + a.ann_rank) ELSE 0 END)
       AS BIGINT) AS rrf_milli
FROM bmr b FULL OUTER JOIN annr a ON b.doc_id = a.doc_id
ORDER BY rrf_milli DESC, doc_id ASC
LIMIT {retrieval.TOP_K}
"""
        ),
        bench=True,
    ),
    "corpus_mixture_plan": QueryDef(
        sampling.mixture_plan,
        f"""
WITH per_lang AS (
  SELECT lang,
    CAST(SUM(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS BIGINT) AS lang_tokens
  FROM documents GROUP BY lang
), t AS (
  SELECT CAST(SUM(lang_tokens) AS BIGINT) AS total_tokens, COUNT(*) AS n_langs FROM per_lang
)
SELECT lang, lang_tokens,
  CAST((2 * CAST(total_tokens AS HUGEINT) + n_langs) // (2 * CAST(n_langs AS HUGEINT)) AS BIGINT) AS target_tokens,
  LEAST({_mm_sql("total_tokens", "CAST(n_langs AS HUGEINT) * lang_tokens", guard=False)},
        CAST(4000 AS BIGINT)) AS repeat_permille
FROM per_lang, t
ORDER BY lang
""",
        bench=True,
    ),
    "embedding_kmeans_profile": QueryDef(
        similarity.kmeans_profile,
        """
WITH q AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
  FROM embeddings
),
c0 AS (SELECT vec_id AS cid, e AS ce FROM q WHERE vec_id < 8),
d1 AS (
  SELECT q.vec_id, q.e, c.cid,
    list_sum(list_transform(range(1, 65), i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS d
  FROM q CROSS JOIN c0 c
),
a1 AS (
  SELECT vec_id, e, cid AS cluster, d FROM d1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
),
c1 AS (
  SELECT cluster AS cid, list(comp ORDER BY i) AS ce FROM (
    SELECT cluster, i, CAST(ROUND(CAST(SUM(e[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS comp
    FROM a1, range(1, 65) t(i)
    GROUP BY cluster, i
  ) GROUP BY cluster
),
d2 AS (
  SELECT q.vec_id, c.cid,
    list_sum(list_transform(range(1, 65), i -> (q.e[i] - c.ce[i]) * (q.e[i] - c.ce[i]))) AS d
  FROM q CROSS JOIN c1 c
),
a2 AS (
  SELECT vec_id, cid AS cluster, d FROM d2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1
)
SELECT cluster, COUNT(*) AS n_vecs, CAST(SUM(d) AS BIGINT) AS inertia
FROM a2 GROUP BY cluster ORDER BY cluster
""",
        bench=True,
    ),
    "doc_exact_dup_groups": QueryDef(
        dedup.exact_dup_groups,
        wrap(
            """
SELECT f.doc_id, f.fp, g.keeper_doc_id, g.group_size,
       f.doc_id = g.keeper_doc_id AS is_keeper
FROM fp f JOIN (
  SELECT fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS group_size
  FROM fp GROUP BY fp) g USING (fp)
ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    # Default = the df-capped form: stop-shingles (df > DEFAULT_MAX_DF)
    # are dropped via a broadcast anti-join before pair generation — the
    # skew dial that bounds the self-join pair count at 100 TB (SCALE.md
    # "hot shingles"). The dropped set is auditable via doc_stop_shingles.
    "doc_ngram_jaccard_pairs": QueryDef(
        lambda spark, sf: dedup.ngram_jaccard_pairs(spark, sf, 500),
        wrap(
            f"""
, stop AS (SELECT sh FROM shingles GROUP BY sh HAVING COUNT(*) > {dedup.DEFAULT_MAX_DF}),
capped AS (SELECT * FROM shingles WHERE sh NOT IN (SELECT sh FROM stop)),
cap_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id)
SELECT da AS doc_a, db AS doc_b, i AS n_inter,
       {_mm_sql("i", "x.n_sh + y.n_sh - i", guard=False)} AS jaccard_permille
FROM (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2) t
JOIN cap_sizes x ON x.doc_id = da
JOIN cap_sizes y ON y.doc_id = db
WHERE {_mm_sql("i", "x.n_sh + y.n_sh - i", guard=False)} >= 500
ORDER BY doc_a, doc_b
"""
        ),
        bench=True,
    ),
    # Diversity/memorization signal: share of corpus-unique shingles.
    "doc_ngram_novelty": QueryDef(
        dedup.ngram_novelty,
        wrap(
            f"""
, dfc AS (SELECT sh, COUNT(*) AS df FROM shingles GROUP BY sh)
SELECT doc_id, COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       {_mm_sql("SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END)", "COUNT(*)")}
         AS novelty_permille
FROM shingles JOIN dfc USING (sh)
GROUP BY doc_id ORDER BY doc_id
"""
        ),
    ),
    # The hashed-gram collision audit (r7 verdict): the engine shuffles
    # 8-byte xxhash64 keys where the oracle counts strings ("identical
    # modulo 64-bit collisions"); this op CHECKS that contract — Spark
    # reports distinct-gram vs distinct-hash counts per hashed-key
    # family, the oracle emits the distinct-gram count twice, so any
    # collision breaks the driver's value-hash compare loudly. DuckDB
    # cannot compute xxhash64, which is exactly why the oracle asserts
    # the equality rather than recomputing the hashes.
    "gram_hash_collision_audit": QueryDef(
        dedup.gram_hash_collision_audit,
        wrap(
            """
, ghbg AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                i -> t[i] || ' ' || t[i+1])) AS b
  FROM toks WHERE len(t) >= 2
),
ghbc AS (
  SELECT unnest(t[1:len(t)-1]) AS t1 FROM toks WHERE len(t) >= 2
)
SELECT family, n_grams, n_hashes FROM (
  SELECT 'shingle' AS family, COUNT(DISTINCT sh) AS n_grams,
         COUNT(DISTINCT sh) AS n_hashes FROM shingles
  UNION ALL
  SELECT 'tfidf_term', COUNT(DISTINCT sh), COUNT(DISTINCT sh) FROM shingles
  UNION ALL
  SELECT 'bigram', COUNT(DISTINCT b), COUNT(DISTINCT b) FROM ghbg
  UNION ALL
  SELECT 'bigram_context', COUNT(DISTINCT t1), COUNT(DISTINCT t1) FROM ghbc
) ORDER BY family
"""
        ),
    ),
    "doc_duplicate_spans": QueryDef(
        dedup.duplicate_spans,
        wrap(
            f"""
, dspans AS (
  SELECT doc_id, i - 1 AS pos,
         md5(list_aggregate(t[i:i+{dedup.SPAN_L - 1}], 'string_agg', ' ')) AS h
  FROM toks, unnest(generate_series(1, len(t) - {dedup.SPAN_L - 1})) AS u(i)
),
ddup AS (SELECT h FROM dspans GROUP BY h HAVING COUNT(*) >= 2),
ddpos AS (SELECT doc_id, pos FROM dspans WHERE h IN (SELECT h FROM ddup)),
disl AS (
  SELECT doc_id, pos,
         CASE WHEN MAX(pos + {dedup.SPAN_L}) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos >= MAX(pos + {dedup.SPAN_L}) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM ddpos
),
disl2 AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island_id
  FROM disl
),
dsegs AS (
  SELECT doc_id, island_id, MIN(pos) AS s, MAX(pos) + {dedup.SPAN_L} AS e
  FROM disl2 GROUP BY doc_id, island_id
),
dper_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s) AS BIGINT) AS n_dup_tokens
  FROM dsegs GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
       COALESCE(p.n_dup_tokens, 0) AS n_dup_tokens,
       {_mm_sql("COALESCE(p.n_dup_tokens, 0)", "len(t.t)")} AS dup_permille
FROM toks t LEFT JOIN dper_doc p USING (doc_id)
ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    "doc_span_admission": QueryDef(
        dedup.span_admission,
        wrap(
            f"""
, aspans AS (
  SELECT doc_id, i - 1 AS pos,
         md5(list_aggregate(t[i:i+{dedup.SPAN_L - 1}], 'string_agg', ' ')) AS h
  FROM toks, unnest(generate_series(1, len(t) - {dedup.SPAN_L - 1})) AS u(i)
),
adpos AS (
  SELECT doc_id, pos
  FROM (SELECT doc_id, pos, MIN(doc_id) OVER (PARTITION BY h) AS min_doc
        FROM aspans)
  WHERE min_doc < doc_id
),
aisl AS (
  SELECT doc_id, pos,
         CASE WHEN MAX(pos + {dedup.SPAN_L}) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos >= MAX(pos + {dedup.SPAN_L}) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_island
  FROM adpos
),
aisl2 AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos) AS island_id
  FROM aisl
),
aper_doc AS (
  SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS n_dup_tokens
  FROM (SELECT doc_id, island_id, MIN(pos) AS s, MAX(pos) + {dedup.SPAN_L} AS e
        FROM aisl2 GROUP BY doc_id, island_id)
  GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_tokens, 0) AS n_dup_tokens,
       {_mm_sql("COALESCE(p.n_dup_tokens, 0)", "len(t.t)")} AS dup_permille,
       CASE WHEN ({_mm_sql("COALESCE(p.n_dup_tokens, 0)", "len(t.t)")}) > {dedup.SPAN_MAX_DUP_PERMILLE}
            THEN 'reject' ELSE 'admit' END AS verdict
FROM toks t LEFT JOIN aper_doc p USING (doc_id)
ORDER BY doc_id
"""
        ),
    ),
    "doc_dedup_clean_text": QueryDef(
        dedup.dedup_clean_text,
        wrap(
            f"""
, cspans AS (
  SELECT doc_id, i - 1 AS pos,
         md5(list_aggregate(t[i:i+{dedup.SPAN_L - 1}], 'string_agg', ' ')) AS h
  FROM toks, unnest(generate_series(1, len(t) - {dedup.SPAN_L - 1})) AS u(i)
),
crank AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         COUNT(*) OVER (PARTITION BY h) AS n_occ
  FROM cspans
),
ccov AS (
  SELECT DISTINCT doc_id, pos + j AS idx
  FROM crank, unnest(generate_series(0, {dedup.SPAN_L - 1})) AS v(j)
  WHERE n_occ >= 2 AND rn >= 2
),
ctok AS (
  SELECT doc_id, i - 1 AS idx, t[i] AS tok
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
),
ckept AS (
  SELECT c.doc_id, c.idx, c.tok
  FROM ctok c LEFT JOIN ccov v ON c.doc_id = v.doc_id AND c.idx = v.idx
  WHERE v.idx IS NULL
),
crebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM ckept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(len(t.t) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN crebuilt r USING (doc_id)
ORDER BY doc_id
"""
        ),
    ),
    # No-silent-caps audit artifact: exactly what the default cap drops.
    "doc_stop_shingles": QueryDef(
        dedup.stop_shingles,
        wrap(
            f"""
SELECT sh, COUNT(*) AS df FROM shingles GROUP BY sh
HAVING COUNT(*) > {dedup.DEFAULT_MAX_DF} ORDER BY sh
"""
        ),
    ),
    # The exact uncapped variant — the recall oracle for bounded corpora.
    "doc_ngram_jaccard_exact": QueryDef(
        lambda spark, sf: dedup.ngram_jaccard_pairs(spark, sf, 500, max_df=None),
        wrap(
            f"""
SELECT da AS doc_a, db AS doc_b, i AS n_inter,
       {_mm_sql("i", "x.n_sh + y.n_sh - i", guard=False)} AS jaccard_permille
FROM (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2) t
JOIN sh_sizes x ON x.doc_id = da
JOIN sh_sizes y ON y.doc_id = db
WHERE {_mm_sql("i", "x.n_sh + y.n_sh - i", guard=False)} >= 500
ORDER BY doc_a, doc_b
"""
        ),
    ),
    "doc_minhash_signatures": QueryDef(
        dedup.minhash_signatures,
        wrap(
            "SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7 FROM mh ORDER BY doc_id"
        ),
        bench=True,
    ),
    "doc_minhash_band_pairs": QueryDef(
        dedup.minhash_band_pairs,
        wrap(
            """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM (SELECT doc_id, '0:' || md5(mh0 || mh1 || mh2 || mh3) AS bucket FROM mh
      UNION ALL
      SELECT doc_id, '1:' || md5(mh4 || mh5 || mh6 || mh7) FROM mh) a
JOIN (SELECT doc_id, '0:' || md5(mh0 || mh1 || mh2 || mh3) AS bucket FROM mh
      UNION ALL
      SELECT doc_id, '1:' || md5(mh4 || mh5 || mh6 || mh7) FROM mh) b
  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""
        ),
    ),
    "doc_simhash": QueryDef(dedup.simhash, _simhash_sql()),
    # Banded SimHash pair generation (Manku WWW'07 block pigeonhole):
    # exact recall at Hamming <= 2, so the brute-force oracle is the
    # ground truth, not a lower bound.
    "doc_simhash_dup_pairs": QueryDef(dedup.simhash_dup_pairs, _simhash_pairs_sql()),
    # Transitive closure of the near-dup candidate graph: iterative
    # hash-min label propagation in Spark, recursive CTE in the oracle —
    # the keep/drop clustering step after pair generation.
    "doc_minhash_jaccard_estimate": QueryDef(
        dedup.minhash_jaccard_estimate,
        wrap(
            _BPAIRS_SQL + f"""
SELECT p.doc_a, p.doc_b,
       CAST({_MH_AGREE} AS BIGINT) AS n_agree,
       {_mm_sql(_MH_AGREE, str(dedup.MINHASH_K), guard=False)}
         AS est_jaccard_permille
FROM bpairs p JOIN mh x ON x.doc_id = p.doc_a JOIN mh y ON y.doc_id = p.doc_b
ORDER BY doc_a, doc_b
"""
        ),
    ),
    "doc_dedup_survivors": QueryDef(
        dedup.dedup_survivors,
        wrap(
            _COMP_CTES + """
SELECT d.doc_id, d.source, d.lang, d.n_chars,
       s.component_size - 1 AS n_absorbed
FROM comp c
JOIN (SELECT component_id, COUNT(*) AS component_size
      FROM comp GROUP BY component_id) s USING (component_id)
JOIN documents d ON d.doc_id = c.doc_id
WHERE c.doc_id = c.component_id
ORDER BY d.doc_id
""",
            recursive=True,
        ),
    ),
    "doc_dup_verdict": QueryDef(
        dedup.dedup_verdict,
        wrap(
            _COMP_CTES + """
SELECT c.doc_id, c.component_id, s.component_size,
       c.doc_id = c.component_id AS keep
FROM comp c
JOIN (SELECT component_id, COUNT(*) AS component_size
      FROM comp GROUP BY component_id) s USING (component_id)
ORDER BY doc_id
""",
            recursive=True,
        ),
    ),
    "doc_dup_components": QueryDef(
        dedup.dup_components,
        wrap(
            _COMP_CTES + """
SELECT c.doc_id, c.component_id, s.component_size
FROM comp c
JOIN (SELECT component_id, COUNT(*) AS component_size
      FROM comp GROUP BY component_id) s USING (component_id)
ORDER BY doc_id
""",
            recursive=True,
        ),
        bench=True,
    ),
    # ------------------------------------------------------------------
    # Training-data pipeline: deterministic splits (operators/sampling.py)
    # ------------------------------------------------------------------
    "doc_pack_sequences": QueryDef(
        sampling.pack_sequences,
        wrap(
            f"""
, pk AS (
  SELECT d.source, d.doc_id, len(t.t) AS n_tokens
  FROM documents d JOIN toks t ON d.doc_id = t.doc_id
),
pkc AS (
  SELECT source, doc_id, n_tokens,
         (SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS UNBOUNDED PRECEDING) - n_tokens) // 256 AS bin_id
  FROM pk
)
SELECT source, CAST(bin_id AS BIGINT) AS bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
       {_mm_sql("SUM(n_tokens)", "256", guard=False)} AS fill_permille
FROM pkc GROUP BY source, bin_id
ORDER BY source, bin_id
"""
        ),
        bench=True,
    ),
    "doc_passage_chunks": QueryDef(
        sampling.passage_chunks,
        wrap(
            f"""
, pch AS (
  SELECT doc_id, t,
         unnest(generate_series(0, greatest(len(t) - 1, 0) // {sampling.CHUNK_STRIDE})) AS i
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(i * {sampling.CHUNK_STRIDE} AS BIGINT) AS start_tok,
       CAST(len(list_slice(t, i * {sampling.CHUNK_STRIDE} + 1,
                           i * {sampling.CHUNK_STRIDE} + {sampling.CHUNK_WINDOW})) AS BIGINT)
         AS n_chunk_tokens,
       md5(array_to_string(list_slice(t, i * {sampling.CHUNK_STRIDE} + 1,
                                      i * {sampling.CHUNK_STRIDE} + {sampling.CHUNK_WINDOW}), ' '))
         AS chunk_fp
FROM pch
ORDER BY doc_id, chunk_id
"""
        ),
        bench=True,
    ),
    "doc_chunk_dup_groups": QueryDef(
        sampling.chunk_dup_groups,
        wrap(
            f"""
, pch2 AS (
  SELECT doc_id, t,
         unnest(generate_series(0, greatest(len(t) - 1, 0) // {sampling.CHUNK_STRIDE})) AS i
  FROM toks
),
chfp AS (
  SELECT doc_id,
         len(list_slice(t, i * {sampling.CHUNK_STRIDE} + 1,
                        i * {sampling.CHUNK_STRIDE} + {sampling.CHUNK_WINDOW})) AS n_chunk_tokens,
         md5(array_to_string(list_slice(t, i * {sampling.CHUNK_STRIDE} + 1,
                                        i * {sampling.CHUNK_STRIDE} + {sampling.CHUNK_WINDOW}), ' '))
           AS chunk_fp
  FROM pch2
)
SELECT chunk_fp, COUNT(*) AS n_copies, COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS first_doc_id
FROM chfp WHERE n_chunk_tokens > 0
GROUP BY chunk_fp HAVING COUNT(*) > 1
ORDER BY chunk_fp
"""
        ),
        bench=True,
    ),
    "doc_bloom_contamination": QueryDef(
        sampling.bloom_contamination,
        wrap(
            f"""
, cbl AS (
  SELECT doc_id, sh,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT)
           % 1000 < 100 AS is_val
  FROM shingles
),
tpos AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(sh || '#b' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
           % {sampling.BLOOM_BITS} AS pos
  FROM (SELECT DISTINCT sh FROM cbl WHERE NOT is_val) ts, range({sampling.BLOOM_HASHES}) r(i)
),
vprobe AS (
  SELECT doc_id, sh, i,
         CAST(('0x' || substr(md5(sh || '#b' || CAST(i AS VARCHAR)), 1, 8)) AS BIGINT)
           % {sampling.BLOOM_BITS} AS pos
  FROM (SELECT doc_id, sh FROM cbl WHERE is_val) vs, range({sampling.BLOOM_HASHES}) r(i)
),
vhit AS (
  SELECT doc_id, sh,
         MIN(CASE WHEN pos IN (SELECT pos FROM tpos) THEN 1 ELSE 0 END) AS all_hit
  FROM vprobe GROUP BY doc_id, sh
)
SELECT doc_id, COUNT(*) AS n_shingles, CAST(SUM(all_hit) AS BIGINT) AS n_bloom_hits
FROM vhit GROUP BY doc_id
ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    "doc_split_contamination": QueryDef(
        sampling.split_contamination,
        wrap(
            """
, csplit AS (
  SELECT doc_id, sh,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT)
           % 1000 < 100 AS is_val
  FROM shingles
),
ctrain AS (SELECT DISTINCT sh FROM csplit WHERE NOT is_val)
SELECT doc_id, COUNT(*) AS n_shared_shingles
FROM (SELECT doc_id, sh FROM csplit WHERE is_val) v JOIN ctrain USING (sh)
GROUP BY doc_id
ORDER BY doc_id
"""
        ),
        bench=True,
    ),
    "doc_bigram_repetition": QueryDef(
        textstats.bigram_repetition,
        f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(2, len(t) + 1), i -> t[i-1] || ' ' || t[i])
              ELSE CAST([] AS VARCHAR[]) END AS b
  FROM toks
)
SELECT doc_id,
  CAST(len(b) AS BIGINT) AS n_bigrams,
  CAST(len(list_distinct(b)) AS BIGINT) AS n_distinct_bigrams,
  {_mm_sql("len(b) - len(list_distinct(b))", "len(b)")} AS dup_permille
FROM bg
ORDER BY doc_id
""",
        bench=True,
    ),
    "events_column_profile": QueryDef(
        relational.events_column_profile,
        """
WITH ev AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS value_cents
  FROM events
)
SELECT 'event_id' AS col_name, COUNT(*) AS n_rows, COUNT(*) - COUNT(event_id) AS n_nulls,
       COUNT(DISTINCT event_id) AS n_distinct,
       CAST(MIN(event_id) AS VARCHAR) AS min_val, CAST(MAX(event_id) AS VARCHAR) AS max_val FROM ev
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id), COUNT(DISTINCT user_id),
       CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR) FROM ev
UNION ALL
SELECT 'ts_ms', COUNT(*), COUNT(*) - COUNT(ts_ms), COUNT(DISTINCT ts_ms),
       CAST(MIN(ts_ms) AS VARCHAR), CAST(MAX(ts_ms) AS VARCHAR) FROM ev
UNION ALL
SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type), COUNT(DISTINCT event_type),
       MIN(event_type), MAX(event_type) FROM ev
UNION ALL
SELECT 'value_cents', COUNT(*), COUNT(*) - COUNT(value_cents), COUNT(DISTINCT value_cents),
       CAST(MIN(value_cents) AS VARCHAR), CAST(MAX(value_cents) AS VARCHAR) FROM ev
ORDER BY col_name
""",
        bench=True,
    ),
    # HLL++ twin of the profile — removes the 5-way count-distinct Expand,
    # the exact profile's dominant cost (sketches are engine-specific:
    # rows-only check, error bounded in tests/test_approx.py).
    "events_column_profile_approx": QueryDef(
        relational.events_column_profile_approx, None
    ),
    "doc_quality_classifier": QueryDef(
        textstats.quality_classifier,
        """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(COALESCE(list_sum(list_transform(t,
    tok -> CAST(('0x' || substr(md5(tok || '#w1'), 1, 8)) AS BIGINT) % 21 - 10)),
    0) AS BIGINT) AS quality_score,
  CAST(COALESCE(list_sum(list_transform(t,
    tok -> CAST(('0x' || substr(md5(tok || '#w1'), 1, 8)) AS BIGINT) % 21 - 10)),
    0) AS BIGINT) >= 0 AS keep
FROM toks
ORDER BY doc_id
""",
        bench=True,
    ),
    "corpus_curation_verdict": QueryDef(
        sampling.curation_verdict,
        f"""
WITH base AS (
  SELECT doc_id, md5(text) AS fp,
    {textstats.gate_reason_sql("text", "duckdb")} AS gate_reason,
    CAST(COALESCE(list_sum(list_transform(
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''),
        tok -> CAST(('0x' || substr(md5(tok || '#w1'), 1, 8)) AS BIGINT) % 21 - 10)), 0) AS BIGINT) AS q,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT) % 1000 AS bucket
  FROM documents
),
keepers AS (
  SELECT fp, MIN(doc_id) AS keeper_id FROM base WHERE gate_reason = 'ok' GROUP BY fp
),
v AS (
  SELECT b.doc_id,
    CASE WHEN b.gate_reason <> 'ok' THEN b.gate_reason
         WHEN b.doc_id <> k.keeper_id THEN 'duplicate'
         WHEN b.q < 0 THEN 'low_quality'
         ELSE 'kept' END AS verdict,
    b.bucket
  FROM base b LEFT JOIN keepers k USING (fp)
)
SELECT doc_id, verdict,
  CASE WHEN verdict = 'kept'
       THEN (CASE WHEN bucket < 100 THEN 'val' ELSE 'train' END) END AS split
FROM v
ORDER BY doc_id
""",
        bench=True,
    ),
    "doc_train_split": QueryDef(
        sampling.split_assignment,
        """
SELECT doc_id, lang,
       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT)
         % 1000 AS bucket,
       CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT)
                   % 1000 < 100
            THEN 'val' ELSE 'train' END AS split
FROM documents
ORDER BY doc_id
""",
    ),
    "doc_shuffle_shards": QueryDef(
        sampling.shuffle_shards,
        f"""
SELECT doc_id, shard_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard_id ORDER BY skey, doc_id)
            AS BIGINT) AS shard_pos,
       skey
FROM (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sh1'), 1, 8))
              AS BIGINT) AS skey,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#sh1'), 1, 8))
              AS BIGINT) % {sampling.N_SHUFFLE_SHARDS} AS shard_id
  FROM documents
)
ORDER BY shard_id, shard_pos
""",
    ),
    "doc_dsir_weights": QueryDef(
        sampling.dsir_weights,
        wrap(
            f"""
, db AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(sh), 1, 4)) AS BIGINT) % {sampling.DSIR_BUCKETS} AS b,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT)
           % 1000 < 100 AS is_val
  FROM shingles
),
dcc AS (
  SELECT b, COUNT(*) AS c_cnt,
         SUM(CASE WHEN is_val THEN 1 ELSE 0 END) AS t_cnt
  FROM db GROUP BY b
),
dtot AS (SELECT SUM(c_cnt) AS ctot, SUM(t_cnt) AS ttot FROM dcc),
dwb AS (
  SELECT b,
         CAST((length(bin(t_cnt + 1)) - length(bin((SELECT ttot FROM dtot) + 1)))
              - (length(bin(c_cnt + 1)) - length(bin((SELECT ctot FROM dtot) + 1)))
              AS BIGINT) AS w_bits
  FROM dcc
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(w_bits) AS BIGINT) AS score_bits,
       {_mm_signed_sql("SUM(w_bits)", "COUNT(*)")} AS mean_score_millibits
FROM db JOIN dwb USING (b)
GROUP BY doc_id ORDER BY doc_id
"""
        ),
    ),
    "doc_stratified_sample": QueryDef(
        sampling.stratified_sample,
        """
SELECT doc_id, lang, bucket, rate_permille
FROM (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#s1'), 1, 8)) AS BIGINT)
           % 1000 AS bucket,
         CAST(CASE WHEN lang = 'en' THEN 300 ELSE 1000 END AS BIGINT) AS rate_permille
  FROM documents)
WHERE bucket < rate_permille
ORDER BY doc_id
""",
    ),
    "doc_source_profile": QueryDef(
        textstats.source_profile,
        """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
""",
    ),
    "doc_split_counts": QueryDef(
        sampling.split_counts,
        """
SELECT lang, split, COUNT(*) AS n
FROM (
  SELECT lang,
         CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#v1'), 1, 8)) AS BIGINT)
                     % 1000 < 100
              THEN 'val' ELSE 'train' END AS split
  FROM documents)
GROUP BY lang, split
ORDER BY lang, split
""",
    ),
    # ------------------------------------------------------------------
    # Training-data pipeline: similarity search
    # ------------------------------------------------------------------
    "ann_cosine_topk": QueryDef(
        lambda spark, sf: similarity.cosine_topk(spark, sf, 5, 10),
        wrap(
            f"""
SELECT query_id, neighbor_id, sim_micro,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY sim_micro DESC, neighbor_id ASC) AS rank
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COSINE_SIM} AS sim_micro
  FROM qvec q JOIN qvec c ON q.vec_id < 5 AND c.vec_id >= 5) s
QUALIFY rank <= 10
ORDER BY query_id, rank
"""
        ),
        bench=True,
    ),
    "ann_cosine_topk_int8": QueryDef(
        lambda spark, sf: similarity.cosine_topk_int8(spark, sf, 5, 10),
        wrap(
            """
, i8s AS (
  SELECT vec_id,
         GREATEST(1, (list_max(list_transform(e, x -> abs(x))) + 126) // 127) AS s,
         e
  FROM qvec
),
i8 AS (
  SELECT vec_id,
         list_transform(e, x -> CASE WHEN x < 0 THEN -((-2*x + s) // (2*s))
                                     ELSE (2*x + s) // (2*s) END) AS q8
  FROM i8s
)
SELECT query_id, neighbor_id, sim_micro_q,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY sim_micro_q DESC, neighbor_id ASC) AS rank
FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(ROUND(1000000 * list_dot_product(q.q8, c.q8) /
              (SQRT(CAST(list_dot_product(q.q8, q.q8) AS DOUBLE)) *
               SQRT(CAST(list_dot_product(c.q8, c.q8) AS DOUBLE)))) AS BIGINT) AS sim_micro_q
  FROM i8 q JOIN i8 c ON q.vec_id < 5 AND c.vec_id >= 5) s
QUALIFY rank <= 10
ORDER BY query_id, rank
"""
        ),
        bench=True,
    ),
    "ann_lsh_topk": QueryDef(
        lambda spark, sf: similarity.ann_lsh_topk(spark, sf, 5, 10),
        _lsh_topk_sql(),
        bench=True,
    ),
    # Product-quantization ANN (Jégou 2011): 4-byte codes + ADC scan +
    # exact re-rank of the shortlist. No SQL oracle (two-level k-means
    # training has no tractable cross-engine twin) — rows-only driver
    # check; recall floors + determinism pinned in
    # tests/test_similarity_plans.py.
    "ann_pq_topk": QueryDef(similarity.ann_pq_topk, None),
    # IVF-PQ composition (probe-bounded ADC + exact re-rank): rows-only
    # like ann_pq_topk — the k-means/PQ training has no SQL twin;
    # recall floor + determinism pin it (test_similarity_plans.py).
    "ann_ivf_pq_topk": QueryDef(similarity.ann_ivf_pq_topk, None),
    "embedding_near_dup_pairs": QueryDef(
        lambda spark, sf: similarity.near_dup_pairs(spark, sf, 400_000),
        _NEAR_DUP_SQL,
    ),
    # Same semantics + oracle, matmul-vectorized physical shape (the
    # 100 TB kernel) — benched in place of the expression-tree variant.
    "embedding_near_dup_pairs_blocked": QueryDef(
        lambda spark, sf: similarity.near_dup_pairs_blocked(spark, sf, 400_000),
        _NEAR_DUP_SQL,
        bench=True,
    ),
    # Oracle computes the SAME corpus-size-derived k as
    # similarity.semdedup_default_k (max(KMEANS_K, ceil(N/250)) as a
    # scalar subquery), so the two engines agree on the geometry at any
    # SF — the fixed-k=8 literal would silently diverge past 2k vectors.
    "embedding_semdedup_pairs": QueryDef(
        lambda spark, sf: similarity.semdedup_pairs(spark, sf, 400_000),
        wrap(_SEMDEDUP_CTES + "\nSELECT vec_a, vec_b, cluster, sim_micro FROM sp"
             "\nORDER BY vec_a, vec_b\n"),
        bench=True,
    ),
    # SemDeDup's actual dedup decision: survivors = min-vec_id member of
    # each within-cluster near-dup component (transitive closure of the
    # pair graph, the doc family's keeper convention), n_absorbed = how
    # many near-duplicates the keeper absorbed. Spark side runs the
    # shared hash-min propagation; the oracle walks the same pair graph
    # with a recursive CTE (doc_dup_components precedent).
    "embedding_semdedup_survivors": QueryDef(
        lambda spark, sf: similarity.semdedup_survivors(spark, sf, 400_000),
        wrap(
            _SEMDEDUP_CTES
            + """
, edges AS (SELECT vec_a AS a, vec_b AS b FROM sp
            UNION ALL
            SELECT vec_b, vec_a FROM sp),
walk AS (
  SELECT vec_id AS node, vec_id AS lbl FROM qvec
  UNION
  SELECT e.b AS node, w.lbl FROM walk w JOIN edges e ON w.node = e.a
),
comp AS (SELECT node, MIN(lbl) AS component_id FROM walk GROUP BY node),
sz AS (SELECT component_id, COUNT(*) AS component_size
       FROM comp GROUP BY component_id)
SELECT c.node AS vec_id, CAST(s.component_size - 1 AS BIGINT) AS n_absorbed
FROM comp c JOIN sz s USING (component_id)
WHERE c.node = c.component_id
ORDER BY vec_id
""",
            recursive=True,
        ),
    ),
    # Same blocking semantics and pair kernel as embedding_semdedup_pairs
    # over the two-level (coarse → fine) quantizer — the assignment shape
    # that survives k ∝ N (2·N·√k vs N·k multiply-adds). Rows-only: the
    # per-cell iterative fine training has no tractable cross-engine SQL
    # twin (ann_pq_topk precedent); correctness pinned by determinism,
    # inertia, and recall-floor tests in tests/test_similarity_plans.py.
    "embedding_semdedup_pairs_2level": QueryDef(
        lambda spark, sf: similarity.semdedup_pairs_2level(spark, sf, 400_000),
        None,
    ),
    "ann_ivf_assign": QueryDef(
        similarity.ivf_assign,
        wrap(
            """
, cent AS (
  SELECT label AS cell, list(s ORDER BY pos) AS cs
  FROM (SELECT label, dim AS pos, SUM(e[dim]) AS s
        FROM qvec, (SELECT unnest(generate_series(1, 64)) AS dim) d
        GROUP BY label, dim)
  GROUP BY label
),
cscore AS (
  SELECT q.vec_id, q.label, c.cell,
         CAST(ROUND(1000000 * list_dot_product(q.e, c.cs) /
              (SQRT(CAST(list_dot_product(q.e, q.e) AS DOUBLE)) *
               SQRT(CAST(list_dot_product(c.cs, c.cs) AS DOUBLE)))) AS BIGINT)
           AS cell_sim_micro
  FROM qvec q CROSS JOIN cent c
)
SELECT vec_id, label, cell, cell_sim_micro
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY cell_sim_micro DESC, cell ASC) AS rn
      FROM cscore)
WHERE rn = 1
ORDER BY vec_id
"""
        ),
        bench=True,
    ),
    "ann_ivf_topk": QueryDef(
        lambda spark, sf: similarity.ivf_topk(spark, sf, 5, 10, 4),
        wrap(
            """
, cent AS (
  SELECT label AS cell, list(s ORDER BY pos) AS cs
  FROM (SELECT label, dim AS pos, SUM(e[dim]) AS s
        FROM qvec, (SELECT unnest(generate_series(1, 64)) AS dim) d
        GROUP BY label, dim)
  GROUP BY label
),
cranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY csim DESC, cell ASC) AS rn
  FROM (
    SELECT q.vec_id, q.e, c.cell,
           CAST(ROUND(1000000 * list_dot_product(q.e, c.cs) /
                (SQRT(CAST(list_dot_product(q.e, q.e) AS DOUBLE)) *
                 SQRT(CAST(list_dot_product(c.cs, c.cs) AS DOUBLE)))) AS BIGINT)
             AS csim
    FROM qvec q CROSS JOIN cent c)
),
cands AS (SELECT vec_id AS neighbor_id, e AS ce, cell
          FROM cranked WHERE vec_id >= 5 AND rn = 1),
probes AS (SELECT vec_id AS query_id, e AS qe, cell
           FROM cranked WHERE vec_id < 5 AND rn <= 4)
SELECT query_id, neighbor_id, sim_micro,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY sim_micro DESC, neighbor_id ASC) AS rank
FROM (SELECT query_id, neighbor_id,
             CAST(ROUND(1000000 * list_dot_product(qe, ce) /
                  (SQRT(CAST(list_dot_product(qe, qe) AS DOUBLE)) *
                   SQRT(CAST(list_dot_product(ce, ce) AS DOUBLE)))) AS BIGINT)
               AS sim_micro
      FROM probes JOIN cands USING (cell)) s
QUALIFY rank <= 10
ORDER BY query_id, rank
"""
        ),
        bench=True,
    ),
    # ------------------------------------------------------------------
    # Training-data pipeline: multimodal binary columns
    # ------------------------------------------------------------------
    "media_validation": QueryDef(
        lambda spark, sf: multimodal.validate_media(
            multimodal.media_from_documents(spark, sf)
        ).orderBy("media_id"),
        wrap(
            """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CASE WHEN doc_id % 97 = 0 THEN NULL ELSE 64 END AS payload_bytes,
       (doc_id % 97 = 0) AS is_invalid
FROM documents
ORDER BY media_id
"""
        ),
    ),
    "media_frame_sample": QueryDef(
        lambda spark, sf: multimodal.sample_frames(
            multimodal.media_from_documents(spark, sf), every_n=2, frame_bytes=8
        )
        .select(
            "media_id",
            "frame_index",
            F.col("frame").cast("string").alias("frame_str"),
        )
        .orderBy("media_id", "frame_index"),
        wrap(
            """
, vids AS (
  SELECT doc_id, md5(text) || md5(text || 'f') AS pay
  FROM documents WHERE doc_id % 3 = 2 AND doc_id % 97 <> 0
)
SELECT doc_id AS media_id, j AS frame_index, substr(pay, j * 8 + 1, 8) AS frame_str
FROM vids, (SELECT unnest([0, 2, 4, 6]) AS j) f
ORDER BY media_id, frame_index
"""
        ),
        bench=True,
    ),
    # Nearest-neighbor thumbnail resize: numpy kernel over Arrow batches in
    # Spark; byte-exact string mirror in the oracle (payload bytes are
    # ASCII hex by construction, so substr == byte indexing).
    "media_resize": QueryDef(
        lambda spark, sf: multimodal.resize_images(
            multimodal.media_from_documents(spark, sf)
        )
        .select(
            "media_id",
            "out_w",
            "out_h",
            F.col("pixels").cast("string").alias("pixels_str"),
        )
        .orderBy("media_id"),
        wrap(
            """
, imgs AS (
  SELECT doc_id, md5(text) || md5(text || 'f') AS pay,
         CAST(doc_id % 8 + 1 AS INTEGER) AS w,
         CAST(doc_id % 6 + 1 AS INTEGER) AS h
  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 97 <> 0
)
SELECT doc_id AS media_id, 4 AS out_w, 4 AS out_h,
       list_aggregate(flatten(list_transform(generate_series(0, 3), i ->
         list_transform(generate_series(0, 3), j ->
           substr(pay, ((i*h)//4)*w + ((j*w)//4) + 1, 1)))),
         'string_agg', '') AS pixels_str
FROM imgs
ORDER BY media_id
"""
        ),
    ),
    "media_byte_histogram": QueryDef(
        lambda spark, sf: multimodal.byte_histogram(
            multimodal.media_from_documents(spark, sf)
        ),
        wrap(
            """
, med AS (
  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         md5(text) || md5(text || 'f') AS pay
  FROM documents WHERE doc_id % 97 <> 0
)
SELECT kind, substr(pay, i, 1) AS byte_char, COUNT(*) AS n
FROM med, (SELECT unnest(generate_series(1, 64)) AS i) s
GROUP BY kind, byte_char
ORDER BY kind, byte_char
"""
        ),
    ),
    "embedding_lang_label_stats": QueryDef(
        similarity.lang_label_stats,
        wrap(
            """
SELECT d.lang, q.label, COUNT(*) AS n_vecs,
       CAST(SUM(list_dot_product(q.e, q.e)) AS BIGINT) AS sum_norm2
FROM qvec q JOIN documents d ON q.vec_id = d.doc_id
GROUP BY d.lang, q.label
ORDER BY d.lang, q.label
"""
        ),
    ),
    "embedding_label_centroids": QueryDef(
        similarity.label_centroids,
        wrap(
            """
SELECT CAST(dim AS INTEGER) AS dim, label, CAST(SUM(e[dim]) AS BIGINT) AS sum_q, COUNT(*) AS n
FROM qvec, (SELECT unnest(generate_series(1, 64)) AS dim) d
GROUP BY label, dim
ORDER BY label, dim
"""
        ),
        bench=True,
    ),
}


# ----------------------------------------------------------------------
# Driver-slot ordering. The grading driver differentially checks the
# FIRST 50 registry entries, so the insertion order below is a coverage
# decision, not cosmetics: the reference's own read surface first (it IS
# the reference — these 19 stay PINNED every round), then one-or-more
# representatives of every operator family (dedup, MinHash/LSH, connected
# components, ANN, SemDeDup, text analysis, winnowing, packing/splitting/
# contamination/mixture, temporal joins, media, and — since round 4 —
# the relational/TPC-H/window family) — so no family rides on local
# pytest alone. Everything past slot 50 stays oracle-verified by
# tests/test_oracle_parity.py.
#
# ROTATION (round 4 onward): the non-pinned slots swap each round so the
# ~90 past-slot-50 queries cycle through driver verification across
# rounds instead of riding local DuckDB forever.
# Round 5 rotated IN 27 never-driver-checked names (doc_fingerprints,
# doc_simhash_dup_pairs, doc_stop_shingles, doc_winnow_stop_fps,
# embedding_label_centroids, embedding_lang_label_stats,
# hybrid_rrf_topk, doc_pii_stats, doc_pii_redact, doc_perceptron_eval,
# corpus_bpe_apply, doc_dsir_weights, doc_bigram_repetition,
# doc_source_profile, doc_split_counts, media_byte_histogram,
# media_resize, events_column_profile, event_funnel, weekly_retention,
# event_type_hourly, event_hourly_anomaly, lone_late_supplier,
# nation_market_share, top_orders_per_customer,
# orders_trailing_month_count, promo_revenue_permille), then late in
# the round swapped the three unchanged holdovers (doc_dedup_survivors,
# doc_span_admission, corpus_curation_verdict — all r04-green, all
# still value-checked every pytest run) for three more never-checked
# names from the same families: doc_dup_components_star and
# doc_ngram_jaccard_exact (the dedup family's exact-oracle twins) and
# source_pii_profile (the curation family's new-this-round PII rollup).
# The one remaining holdover is embedding_semdedup_pairs — the
# scale-safe-k default changed this round, so its driver hash is the
# regression signal. Rotated OUT (all r04-green or
# transitively exercised): doc_minhash_band_pairs, doc_dup_components,
# doc_ngram_jaccard_pairs, doc_minhash_jaccard_estimate,
# doc_ngram_novelty, doc_duplicate_spans, doc_dedup_clean_text,
# ann_cosine_topk / ann_lsh_topk / ann_ivf_topk (hybrid_rrf_topk
# composes the ANN modality), doc_bm25_topk (ditto, lexical),
# embedding_kmeans_profile (the semdedup slot rides the same index),
# embedding_near_dup_pairs(_blocked), doc_perceptron_train,
# doc_tfdf_top_terms, doc_lang_confusion, doc_quality_gate,
# doc_unigram_surprisal, corpus_bpe_merges, doc_shuffle_shards,
# doc_pack_sequences, corpus_source_overlap, asof_purchase_last_click,
# media_validation, pricing_summary, user_sessions,
# customer_spend_deciles. Never-driver-checked remaining after r5: 23
# slot-eligible entries (13 relational/TPC-H rows + the late-r5
# embedding_semdedup_survivors + the session additions
# doc_passage_chunks, doc_chunk_dup_groups, doc_bloom_contamination,
# the graph/sketch family graph_trade_pagerank, dedup_graph_triangles,
# trade_graph_components, doc_tfidf_cosine_pairs, token_cms_topk, and
# embedding_split_contamination)
# — the 31 non-pin slots absorb all of them in r6 — plus 4 rows-only entries
# (ann_pq_topk, ann_ivf_pq_topk, events_column_profile_approx,
# embedding_semdedup_pairs_2level) that cannot hold an oracle slot by
# design.
# ----------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # reference read surface (SURVEY §2.3-§2.8) — pinned
    "account_txs_desc",
    "account_txs_asc_start",
    "account_txs_desc_start",
    "account_txs_empty",
    "contract_txs_desc",
    "contract_txs_asc_start",
    "iterate_account",
    "iterate_contract",
    "resume_offset",
    "cis2_supply",
    "cis2_supply_wide",
    "cis2_supply_wide_overflow",
    "key_bindings_latest",
    "incoming_txs",
    "account_activity",
    "alias_canonical_resolution",
    "account_activity_salted",
    "summary_parse",
    "cis2_supply_guarded",
    # ---- round-10 rotation (31 slots): 2 never-driver-checked r10 ops
    # (the estimated-weights verdict closing the Fellegi-Sunter loop;
    # the blocking planner's machine-readable recommendation), 3
    # regression signals for code r10 touched (field-odds refactored
    # behind _field_odds_frame and its oracle re-rendered through
    # _LINKAGE_ODDS_CTES; the evidence kernel gained the fail-closed
    # coverage gate; the golden record now rides the shared
    # golden_record_over kernel), the 18 staleness-5 rows last green in
    # CORRECTNESS_r04 (the <=5-round invariant breaks if r10 skips
    # them), and the 8 stalest r5 rows (fronting r11's backlog). 22
    # LLM-pipeline ops in the window (invariant >= 10). All rotated-out
    # names stay value-checked every pytest run by test_oracle_parity.
    # never driver-checked (r10 additions)
    "customer_match_verdict_estimated",
    "customer_blocking_plan",
    # r10-touched regression signals
    "customer_match_field_odds",
    "customer_match_evidence",
    "customer_golden_record",
    # staleness-5 rows (last green in CORRECTNESS_r04)
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "asof_purchase_last_click",
    "customer_spend_deciles",
    "doc_bm25_topk",
    "doc_dedup_survivors",
    "doc_dup_components",
    "doc_minhash_band_pairs",
    "doc_minhash_jaccard_estimate",
    "doc_shuffle_shards",
    "doc_tfdf_top_terms",
    "embedding_kmeans_profile",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_blocked",
    "media_validation",
    "pricing_summary",
    "user_sessions",
    # stalest round-5 rows
    "corpus_bpe_apply",
    "doc_dup_components_star",
    "doc_fingerprints",
    "doc_ngram_jaccard_exact",
    "doc_pii_redact",
    "doc_pii_stats",
    "doc_simhash_dup_pairs",
    "doc_source_profile",
]

# Star-contraction components twin: identical output contract and oracle
# as doc_dup_components, so the O(log² n)-round algorithm (the chain-
# shaped-component drop-in, SCALE.md) stays continuously oracle-verified
# alongside the O(diameter) hash-min default.
REGISTRY["doc_dup_components_star"] = QueryDef(
    dedup.dup_components_star, REGISTRY["doc_dup_components"].oracle
)


def _pagerank_step(k: int) -> str:
    """One unrolled PageRank round — the k-means/BPE step-unrolled-CTE
    treatment: a fixed iteration count makes the whole training loop a
    pure SQL expression the oracle can evaluate."""
    return f"""
pr_r{k} AS (
  SELECT n.node,
         -- HUGEINT product: the engine computes 850*r*w in DECIMAL(38,0)
         -- (int64 can overflow once rank mass concentrates on a hub);
         -- both engines are exact to 10^38 and the quotient fits BIGINT.
         CAST({graph.PR_BASE_MICRO} + COALESCE(
                SUM((CAST({graph.PR_DAMPING_PERMILLE} AS HUGEINT) * r.r * e.w)
                    // (CAST(1000 AS HUGEINT) * e.wout)),
                0) AS BIGINT) AS r
  FROM pr_nodes n
  LEFT JOIN pr_e e ON e.dst = n.node
  LEFT JOIN pr_r{k - 1} r ON r.node = e.src
  GROUP BY n.node
)"""


# The trade-pair edge block — one SQL definition of graph.trade_pair_deltas,
# shared by the pagerank and components oracles.
_TRADE_PAIRS_SQL = """
, pr_pairs AS (
  SELECT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode, COUNT(*) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
)"""


def _pagerank_sql() -> str:
    steps = ",".join(_pagerank_step(k) for k in range(1, graph.PR_ITERS + 1))
    return wrap(
        _TRADE_PAIRS_SQL
        + f""",
pr_edges AS (SELECT cnode AS src, snode AS dst, w FROM pr_pairs
             UNION ALL
             SELECT snode, cnode, w FROM pr_pairs),
pr_wout AS (SELECT src, SUM(w) AS wout FROM pr_edges GROUP BY src),
pr_e AS (SELECT e.src, e.dst, e.w, o.wout FROM pr_edges e JOIN pr_wout o USING (src)),
pr_nodes AS (SELECT c_custkey * 2 AS node FROM customer
             UNION ALL
             SELECT s_suppkey * 2 + 1 FROM supplier),
pr_r0 AS (SELECT node, CAST({graph.PR_MASS_MICRO} AS BIGINT) AS r FROM pr_nodes),
{steps}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_kind,
       CAST(node // 2 AS BIGINT) AS node_key,
       CAST(r AS BIGINT) AS rank_micro
FROM pr_r{graph.PR_ITERS}
ORDER BY r DESC, node
LIMIT {graph.PR_TOP}
"""
    )


REGISTRY["graph_trade_pagerank"] = QueryDef(
    graph.trade_pagerank, _pagerank_sql(), bench=True
)

REGISTRY["dedup_graph_triangles"] = QueryDef(
    graph.dedup_graph_triangles,
    wrap(
        _BPAIRS_SQL
        + """,
tdeg AS (SELECT node, COUNT(*) AS deg
         FROM (SELECT doc_a AS node FROM bpairs UNION ALL SELECT doc_b FROM bpairs)
         GROUP BY node),
tor AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.doc_a < e.doc_b)
              THEN e.doc_a ELSE e.doc_b END AS src,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.doc_a < e.doc_b)
              THEN e.doc_b ELSE e.doc_a END AS dst
  FROM bpairs e
  JOIN tdeg da ON da.node = e.doc_a
  JOIN tdeg db ON db.node = e.doc_b
),
twedge AS (
  SELECT w1.dst AS v, w2.dst AS w
  FROM tor w1 JOIN tor w2 ON w1.src = w2.src AND w1.dst < w2.dst
),
ttri AS (
  SELECT COUNT(*) AS n_triangles
  FROM twedge t
  WHERE EXISTS (SELECT 1 FROM bpairs p WHERE p.doc_a = t.v AND p.doc_b = t.w)
),
tstats AS (
  SELECT (SELECT COUNT(*) FROM tdeg) AS n_nodes,
         (SELECT COUNT(*) FROM bpairs) AS n_edges,
         (SELECT COALESCE(SUM(deg * (deg - 1) // 2), 0) FROM tdeg) AS n_wedges,
         (SELECT n_triangles FROM ttri) AS n_triangles
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_wedges AS BIGINT) AS n_wedges,
       CAST(n_triangles AS BIGINT) AS n_triangles,
       CAST(CASE WHEN n_wedges > 0 THEN (3000 * n_triangles) // n_wedges
                 ELSE 0 END AS BIGINT) AS closure_permille
FROM tstats
"""
    ),
    bench=True,
)

REGISTRY["doc_tfidf_cosine_pairs"] = QueryDef(
    dedup.tfidf_cosine_pairs,
    wrap(
        f"""
, tfq AS (SELECT doc_id, tok, COUNT(*) AS tf
          FROM (SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(t) - 2),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
                FROM toks WHERE len(t) >= 3)
          GROUP BY doc_id, tok),
tnd AS (SELECT COUNT(*) AS n_docs FROM documents),
tidf AS (
  SELECT tok, df,
         CAST(length(bin((SELECT n_docs FROM tnd))) - length(bin(df)) AS BIGINT)
           AS idf_bits
  FROM (SELECT tok, COUNT(*) AS df FROM tfq GROUP BY tok)
),
tw AS (
  SELECT f.doc_id, f.tok, i.df, f.tf * i.idf_bits AS w
  FROM tfq f JOIN tidf i USING (tok)
  WHERE i.idf_bits > 0
),
tnorm AS (SELECT doc_id, SUM(w * w) AS norm2 FROM tw GROUP BY doc_id),
tdot AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
  FROM tw a JOIN tw b ON a.tok = b.tok AND a.doc_id < b.doc_id
  WHERE a.df <= {dedup.DEFAULT_MAX_DF} AND b.df <= {dedup.DEFAULT_MAX_DF}
  GROUP BY 1, 2
),
tscored AS (
  SELECT d.doc_a, d.doc_b, CAST(d.dot AS BIGINT) AS dot,
         CAST((CAST(1000000 AS HUGEINT) * d.dot * d.dot)
              // (CAST(na.norm2 AS HUGEINT) * nb.norm2) AS BIGINT) AS cos2_ppm
  FROM tdot d
  JOIN tnorm na ON na.doc_id = d.doc_a
  JOIN tnorm nb ON nb.doc_id = d.doc_b
)
SELECT doc_a, doc_b, dot, cos2_ppm
FROM tscored
WHERE cos2_ppm >= 250000
ORDER BY doc_a, doc_b
"""
    ),
    bench=True,
)

REGISTRY["token_cms_topk"] = QueryDef(
    textstats.token_cms_topk,
    wrap(
        f"""
, cocc AS (SELECT unnest(t) AS tok FROM toks),
cj AS (SELECT unnest(generate_series(0, {textstats.CMS_DEPTH - 1})) AS j),
ccell AS (
  SELECT j,
         CAST(('0x' || substr(md5(tok || '#cms' || CAST(j AS VARCHAR)), 1, 8))
              AS BIGINT) % {textstats.CMS_WIDTH} AS col,
         COUNT(*) AS cell_n
  FROM cocc CROSS JOIN cj
  GROUP BY 1, 2
),
ccnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n FROM cocc GROUP BY tok),
ctop AS (SELECT tok, exact_n FROM ccnt
         ORDER BY exact_n DESC, tok LIMIT {textstats.CMS_TOP}),
cprobe AS (
  SELECT t.tok, t.exact_n, c.j,
         CAST(('0x' || substr(md5(t.tok || '#cms' || CAST(c.j AS VARCHAR)), 1, 8))
              AS BIGINT) % {textstats.CMS_WIDTH} AS col
  FROM ctop t CROSS JOIN cj c
)
SELECT p.tok, p.exact_n,
       CAST(MIN(c.cell_n) AS BIGINT) AS cms_n,
       CAST(MIN(c.cell_n) - p.exact_n AS BIGINT) AS overestimate
FROM cprobe p JOIN ccell c ON p.j = c.j AND p.col = c.col
GROUP BY p.tok, p.exact_n
ORDER BY exact_n DESC, tok
"""
    ),
    bench=True,
)

# Market segmentation: connected components of the trade graph (star
# contraction in Spark — the O(log² n)-rounds kernel, since bipartite
# trading chains can have long diameters; recursive-CTE walk in the
# oracle, the doc_dup_components treatment).
REGISTRY["trade_graph_components"] = QueryDef(
    graph.trade_graph_components,
    wrap(
        _TRADE_PAIRS_SQL
        + """,
tg_edges AS (SELECT cnode AS a, snode AS b FROM pr_pairs
             UNION ALL
             SELECT snode, cnode FROM pr_pairs),
tg_nodes AS (SELECT c_custkey * 2 AS node FROM customer
             UNION ALL
             SELECT s_suppkey * 2 + 1 FROM supplier),
walk AS (
  SELECT node, node AS lbl FROM tg_nodes
  UNION
  SELECT e.b AS node, w.lbl FROM walk w JOIN tg_edges e ON w.node = e.a
),
comp AS (SELECT node, MIN(lbl) AS component_id FROM walk GROUP BY node)
SELECT CAST(component_id AS BIGINT) AS component_id,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
FROM comp
GROUP BY component_id
ORDER BY n_nodes DESC, component_id
""",
        recursive=True,
    ),
)

# Semantic train/val decontamination over the SemDeDup blocking: the
# oracle replays the same two-Lloyd's-round quantizer (shared
# _SEMDEDUP_CTES) and the same md5-bucket split rule as doc_train_split,
# then orients within-cluster pairs val↔train and rolls up per val vec.
REGISTRY["embedding_split_contamination"] = QueryDef(
    similarity.embedding_split_contamination,
    wrap(
        _SEMDEDUP_CTES
        + """,
spl AS (SELECT vec_id,
               (CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '#v1'), 1, 8))
                     AS BIGINT) % 1000) < 100 AS is_val
        FROM qvec),
ct AS (
  SELECT CASE WHEN sa.is_val THEN sp.vec_a ELSE sp.vec_b END AS vec_id,
         sp.sim_micro
  FROM sp
  JOIN spl sa ON sa.vec_id = sp.vec_a
  JOIN spl sb ON sb.vec_id = sp.vec_b
  WHERE sa.is_val <> sb.is_val
)
SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_train_matches,
       CAST(MAX(sim_micro) AS BIGINT) AS max_sim_micro
FROM ct GROUP BY vec_id ORDER BY vec_id
"""
    ),
)

REGISTRY = {
    **{name: REGISTRY[name] for name in _DRIVER_PRIORITY},
    **{k: v for k, v in REGISTRY.items() if k not in _DRIVER_PRIORITY},
}


def spark_queries():
    return {name: qd.spark for name, qd in REGISTRY.items()}


def oracle_sqls():
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}


def bench_queries():
    return {name: qd.spark for name, qd in REGISTRY.items() if qd.bench}


#: The bench HEADLINE subset — the per-query timings that fit the
#: driver's parsed stdout line (full detail goes to BENCH_DETAIL.json).
#: Owned here so the registry stays the single source of query-set
#: knowledge; the import-time check below makes membership drift a loud
#: error instead of a silent omission from the headline.
BENCH_HEADLINE = (
    "account_txs_desc",
    "iterate_account",
    "cis2_supply",
    "cis2_supply_guarded",
    "key_bindings_latest",
    "account_activity",
    "summary_parse",
    "pricing_summary",
    "top_orders_by_revenue",
    "nation_revenue",
    "lone_late_supplier",
    "user_sessions",
    "doc_exact_dup_groups",
    "doc_minhash_signatures",
    "doc_dup_components",
    "doc_ngram_jaccard_pairs",
    "doc_winnow_dup_pairs",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dup_pairs_blocked",
    "embedding_semdedup_pairs",
    "corpus_curation_verdict",
    "events_column_profile",
    "doc_bm25_topk",
    "hybrid_rrf_topk",
    "corpus_source_overlap",
    "customer_fuzzy_matches",
)
for _name in BENCH_HEADLINE:
    if _name not in REGISTRY or not REGISTRY[_name].bench:
        raise AssertionError(
            f"BENCH_HEADLINE entry {_name!r} is not a bench=True registry "
            "query — headline and bench set have drifted"
        )
