"""DuckDB oracle SQL mirroring ``ingest.derive`` — the differential-test
twin (SURVEY §5: every operator is verified Spark-vs-DuckDB on the same
parquet).

KEEP IN LOCKSTEP with ``derive.py``. Determinism rules that make the two
engines hash-identical:

- integer arithmetic only in derived keys/ids (DIV / %, non-negative inputs);
- money as integer cents via ``CAST(ROUND(value*100) AS BIGINT)`` — the
  double product is computed with the same IEEE ops in both engines, so the
  rounded integer matches exactly;
- ratios as per-mille BIGINTs, never raw doubles;
- decimals only with an explicit final CAST to a fixed (precision, scale)
  on both sides;
- md5 hex strings as the portable stand-in for 32-byte hashes.

The ``WITH`` prologue is prepended to every oracle query; DuckDB binds CTEs
lazily so unused ones cost nothing.
"""

from __future__ import annotations

# Mirrors derive.block_feed / derive.summaries / derive.ati / derive.cti /
# derive.cis2_events / derive.key_bindings_all / derive.key_bindings.
PROLOGUE = """
WITH evt AS (
  SELECT event_id,
         epoch_ms(ts) AS ts_ms,
         user_id,
         event_type,
         value,
         CAST(json_extract(props, '$.k') AS INTEGER) AS k
  FROM events
),
nu AS (SELECT MAX(user_id) + 1 AS n_users FROM evt),
summaries AS (
  SELECT event_id AS id,
         md5(CAST(event_id // 8 AS VARCHAR)) AS block,
         ts_ms,
         event_id // 8 AS height,
         '{"tag":"' || CASE WHEN event_type = 'error' THEN 'special' ELSE 'block_item' END
           || '","type":"' || event_type
           || '","k":' || CAST(k AS VARCHAR) || '}' AS summary,
         CASE WHEN event_type = 'error' THEN NULL ELSE user_id END AS sender,
         event_type, k, value, user_id
  FROM evt
),
ati AS (
  SELECT event_id * 4 AS id, user_id AS account, event_id AS summary
  FROM evt
  UNION ALL
  SELECT event_id * 4 + 1,
         (user_id + 1 + (k % 14)) % (SELECT n_users FROM nu),
         event_id
  FROM evt WHERE event_type IN ('purchase', 'error')
),
cti AS (
  SELECT event_id AS id, k % 10 AS idx, k % 3 AS subidx, event_id AS summary
  FROM evt WHERE event_type IN ('click', 'view')
),
cis2_events AS (
  SELECT k % 10 AS idx, k % 3 AS subidx, CAST(k % 5 AS VARCHAR) AS token_id,
         CAST(ROUND(value * 100) AS BIGINT)
           * (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END) AS amount,
         event_id AS summary
  FROM evt WHERE event_type IN ('purchase', 'error')
),
bindings_all AS (
  SELECT user_id AS address,
         -- concat_ws, not ||: Spark's concat_ws SKIPS a NULL k (derive
         -- key_bindings_all) while || would propagate NULL — keep the
         -- engines in lockstep on rows whose props JSON lacks "k"
         md5(concat_ws(':', CAST(user_id AS VARCHAR), CAST(k AS VARCHAR),
                       CAST(event_id AS VARCHAR))) AS public_key,
         k % 3 AS credential_index,
         k % 2 AS key_index,
         (k % 2) = 0 AS is_simple_account,
         event_id
  FROM evt WHERE event_type = 'signup'
),
bindings AS (
  SELECT address, public_key, credential_index, key_index, is_simple_account
  FROM bindings_all
  QUALIFY ROW_NUMBER() OVER (PARTITION BY address ORDER BY event_id DESC) = 1
),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS t
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 2),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks WHERE len(t) >= 3
),
tokset AS (
  SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks
),
fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) AS fp
  FROM documents
),
sh_sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
),
mh AS (
  SELECT doc_id,
         MIN(md5(sh || '#0')) AS mh0, MIN(md5(sh || '#1')) AS mh1,
         MIN(md5(sh || '#2')) AS mh2, MIN(md5(sh || '#3')) AS mh3,
         MIN(md5(sh || '#4')) AS mh4, MIN(md5(sh || '#5')) AS mh5,
         MIN(md5(sh || '#6')) AS mh6, MIN(md5(sh || '#7')) AS mh7
  FROM shingles GROUP BY doc_id
),
qvec AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
  FROM embeddings
)
"""


def wrap(sql: str, recursive: bool = False) -> str:
    """Prepend the shared derivation prologue to an oracle SELECT.

    ``recursive=True`` emits ``WITH RECURSIVE`` so the query may append a
    recursive CTE (the keyword must sit at the head of the whole WITH
    clause; it is harmless for the non-recursive prologue CTEs)."""
    if recursive:
        return PROLOGUE.replace("\nWITH ", "\nWITH RECURSIVE ", 1) + sql
    return PROLOGUE + sql
