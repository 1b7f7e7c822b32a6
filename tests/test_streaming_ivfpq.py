"""Streaming IVF-PQ index maintenance: the ingest-time twin of the batch
index build. Assignment is a pure function of (vector, frozen
quantizers), so any arrival order / batching must converge to the batch
``ivf_pq_index`` content exactly, and the probe served from the streamed
layout must equal the session-index path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from concordium_transaction_logger_spark.operators import similarity
from concordium_transaction_logger_spark.sources.tables import load_table
from concordium_transaction_logger_spark.streaming.pipeline import StreamingIvfPqIngest


def test_streaming_ivf_pq_ingest_matches_batch_index(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    emb = load_table(spark, sf_dir, "embeddings")
    # three single-file arrivals, deliberately out of vec_id order
    for residue in (2, 0, 1):
        emb.filter(F.col("vec_id") % 3 == residue).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    ing = StreamingIvfPqIngest(spark, sf_dir, src, out, ckpt, max_files_per_trigger=1)
    ing.run_available_now()

    got = sorted(
        (r["vec_id"], int(r["cell"]), tuple(r["codes"]))
        for r in spark.read.parquet(out).select("vec_id", "cell", "codes").collect()
    )
    want = sorted(
        (r["vec_id"], int(r["cell"]), tuple(r["codes"]))
        for r in similarity.ivf_pq_index(spark, sf_dir)
        .select("vec_id", "cell", "codes")
        .collect()
    )
    assert got == want and got

    # the probe serves from the streamed layout identically to the
    # session index (partition pruning on the nested cell= dirs intact)
    served = [
        tuple(r)
        for r in similarity.ann_ivf_pq_topk_over_layout(spark, sf_dir, out).collect()
    ]
    session = [tuple(r) for r in similarity.ann_ivf_pq_topk(spark, sf_dir).collect()]
    assert served == session and served

    # restart with no new files: availableNow re-run is a no-op (the
    # checkpoint owns progress; the sink stays exactly-once)
    before = sorted(os.listdir(out))
    ing.run_available_now()
    assert sorted(os.listdir(out)) == before
    assert spark.read.parquet(out).count() == len(want)
