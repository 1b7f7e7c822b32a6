"""Staging helper for streaming disorder tests: write DataFrames as one
parquet file each with strictly increasing modification times, so a
``maxFilesPerTrigger=1`` file-source stream consumes them in list order
(FileStreamSource orders unread files by mtime). This is how the tests
manufacture bounded cross-micro-batch event-time disorder: stage
time-sliced files OUT of time order."""

from __future__ import annotations

import os
import shutil
import time


def stage_ordered_files(dfs, tmp_path, name="src"):
    src = str(tmp_path / name)
    os.makedirs(src, exist_ok=True)
    t0 = time.time() - 3600
    for i, df in enumerate(dfs):
        stage = str(tmp_path / f"_stage_{name}_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        moved = False
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                dst = os.path.join(src, f"file{i:03d}.parquet")
                shutil.move(os.path.join(stage, f), dst)
                os.utime(dst, (t0 + i * 10, t0 + i * 10))
                moved = True
        assert moved, f"no parquet part file produced for slice {i}"
        shutil.rmtree(stage)
    return src
