"""PySpark-native analytics engine with the query/data-processing surface of
Concordium's transaction logger (wallet-proxy-indexer), rebuilt Spark-first.

Architecture (see SURVEY.md for the full blueprint):

- ``ingest/``     — deterministic derivation of the reference's sink tables
                    (summaries / ati / cti / cis2_tokens / key bindings) from
                    the block-event feed, as declarative DataFrame transforms.
- ``operators/``  — the reference's read-query surface (keyset-paginated
                    account/contract lookups, running supply, latest-wins
                    bindings) plus the large-scale training-data operators
                    (dedup, similarity search, text analysis, multimodal).
- ``sources/``    — table loaders (parquet now; JDBC/stream mirrors the
                    reference's Postgres/gRPC endpoints).
- ``streaming/``  — Structured Streaming ingest with exactly-once foreachBatch
                    semantics (reference: one DB txn per block, main.rs:545-574).
- ``functions/``  — scalar helpers (canonical-address alias resolution on the
                    29-byte prefix, main.rs:123-146).
- ``plans/``      — physical-layout helpers (partitioning/bucketing for the
                    100 TB target) and explain utilities.

Nothing in here is a port of the reference's Rust: logical plans are declared
with the DataFrame API and Catalyst picks the physical strategy.
"""

from .session import build_session, apply_runtime_confs

__all__ = ["build_session", "apply_runtime_confs"]
__version__ = "0.1.0"
