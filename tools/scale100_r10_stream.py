"""Two-decade per-batch cost curve for the streaming near-dup index
(VERDICT r9 #6): feed a FIXED-size batch stream from the distinct-
content x10 document replica set (50k docs; built by tools/scale10_r5.py)
into ``neardup_merge_batch`` and measure wall time per batch as the
accumulated index grows 1x -> 10x -> 100x (0.5k -> 5k -> 50k docs).

The claim under test: per-batch cost is O(batch + touched bucket
partitions + candidate partners), never O(index) — a batch's candidate
lookup reads only the ``_bb`` partitions its own band keys hash into
and the ``_kb`` shingle partitions of its candidate partners, so the
curve should stay flat (parquet-file-count growth inside touched
partitions gives at most a slow drift, bounded by compaction in a real
deployment).

Output: one line per sampled batch (index size, seconds), plus the
decade summary PLANS.md records.
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from dns_log_transformer_spark.session import get_spark  # noqa: E402
from dns_log_transformer_spark.streaming.neardup_index import (  # noqa: E402
    neardup_merge_batch,
)

X10_DOCS = "/root/repo/scratch/x10/documents.parquet"
WORKDIR = "/root/repo/scratch/stream100"
BATCH = 500
N_BATCHES = 100
SAMPLE_AT = {1, 2, 5, 10, 20, 50, 90, 100}


def main():
    spark = get_spark("scale100_stream")
    shutil.rmtree(WORKDIR, ignore_errors=True)
    docs = (
        spark.read.parquet(X10_DOCS)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(BATCH * N_BATCHES)
        .collect()
    )
    assert len(docs) == BATCH * N_BATCHES, (
        f"need {BATCH * N_BATCHES} docs, got {len(docs)} — run "
        "tools/scale10_r5.py first"
    )
    samples = []
    for b in range(N_BATCHES):
        rows = docs[b * BATCH : (b + 1) * BATCH]
        batch_df = spark.createDataFrame(rows, "doc_id long, text string")
        t0 = time.monotonic()
        neardup_merge_batch(batch_df, WORKDIR)
        dt = time.monotonic() - t0
        if b + 1 in SAMPLE_AT:
            samples.append((b + 1, b * BATCH, dt))
            print(
                f"batch {b + 1:3d}: index {b * BATCH:6d} docs -> "
                f"{dt:6.2f}s",
                flush=True,
            )
    first = next(dt for n, _, dt in samples if n == 2)
    at_10x = next(dt for n, _, dt in samples if n == 10)
    at_100x = next(dt for n, _, dt in samples if n == 100)
    print(
        f"decades: batch@0.5k {first:.2f}s | batch@4.5k {at_10x:.2f}s | "
        f"batch@49.5k {at_100x:.2f}s | 100x/1x ratio "
        f"{at_100x / first:.2f}x"
    )


if __name__ == "__main__":
    main()
