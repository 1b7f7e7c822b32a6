"""P7 malformed-row drop (construct_row postgres.rs:389-406): corrupt JSON
payloads are silently dropped on read, never error."""

from __future__ import annotations

from pyspark.sql import Row

from concordium_transaction_logger_spark.operators.queries import parse_tagged_summary


def test_malformed_rows_dropped_silently(spark):
    rows = [
        Row(id=1, summary='{"tag":"block_item","type":"purchase","k":3}'),
        Row(id=2, summary="not json at all"),
        Row(id=3, summary='{"truncated":'),
        Row(id=4, summary='{"tag":"special","type":"error","k":7}'),
        Row(id=5, summary=None),
        Row(id=6, summary='{"other_shape": true}'),  # parses, but no tag
    ]
    out = parse_tagged_summary(spark.createDataFrame(rows)).collect()
    assert {(r.id, r.tag, r.typ, r.k_parsed) for r in out} == {
        (1, "block_item", "purchase", 3),
        (4, "special", "error", 7),
    }


def test_well_formed_roundtrip(spark, sf_dir):
    """Everything the ingest writes parses back (write-strict => read
    clean): parse drops nothing on the derived fact table."""
    from concordium_transaction_logger_spark.ingest import derive
    from concordium_transaction_logger_spark.operators.queries import parsed_summaries

    feed = derive.block_feed(spark, sf_dir)
    assert parsed_summaries(spark, sf_dir).count() == derive.summaries(feed).count()
