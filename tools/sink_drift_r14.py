"""File-accumulation drift sweep across the foreachBatch sinks
(VERDICT r13 #4).

r13 wired + measured self-compaction for the near-dup and winnow index
sinks; the other foreachBatch sinks CLAIM bounded rewrite by
construction (full overwrite / dynamic partition overwrite). This tool
measures the claim once: stream 20 batches into each sink through a
real file-source streaming query and record, after every batch,

- the worst per-partition data-file count of every partitioned
  (sub-)table under the sink's store, and
- the total data-file count under the store root (catches growth by
  partition COUNT, e.g. an epoch-log sink adding one partition per
  batch).

Verdict per sink: 'flat' when the worst-partition count at batch 20
matches batch 5 (bounded by construction), 'grows' otherwise — a
growing sink needs compact_max_files wired (the r13 trigger).

Results are recorded in PLANS.md (round-14 notes). Run from the repo
root; no external fixtures needed (synthetic batches).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402
from dns_log_transformer_spark.streaming.compact import (  # noqa: E402
    max_files_per_partition,
)

BATCHES = 20
ROWS = 200


def _total_files(root: str) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(root):
        n += sum(
            1
            for f in files
            if not f.startswith(("_", ".")) and not f.endswith(".crc")
        )
    return n


def _worst_parts(root: str) -> dict[str, int]:
    """Worst files/partition for the root (if partitioned) and every
    partitioned first-level sub-table."""
    out = {}
    r = max_files_per_partition(root)
    if r:
        out["."] = r
    if os.path.isdir(root):
        for e in sorted(os.listdir(root)):
            sub = os.path.join(root, e)
            if os.path.isdir(sub) and not e.startswith("_"):
                n = max_files_per_partition(sub)
                if n:
                    out[e] = n
    return out


def drive(spark, name, make_query, feed_rows, schema, store) -> None:
    src = tempfile.mkdtemp(prefix=f"drift_{name}_src")
    ck = tempfile.mkdtemp(prefix=f"drift_{name}_ck")
    shutil.rmtree(store, ignore_errors=True)
    stream = spark.readStream.schema(schema).json(src)
    q = make_query(stream, store, ck)
    worst_curve, total_curve = [], []
    try:
        for b in range(BATCHES):
            with open(os.path.join(src, f"b{b}.json"), "w") as f:
                for r in feed_rows(b):
                    f.write(json.dumps(r) + "\n")
            q.processAllAvailable()
            parts = _worst_parts(store)
            worst_curve.append(max(parts.values()) if parts else 0)
            total_curve.append(_total_files(store))
    finally:
        q.stop()
    w5, w20 = worst_curve[4], worst_curve[-1]
    t5, t20 = total_curve[4], total_curve[-1]
    verdict = "flat" if w20 <= w5 + 1 else f"grows {w5}->{w20}"
    tv = "flat" if t20 <= t5 * 1.25 + 2 else f"grows {t5}->{t20}"
    print(
        f"{name}: worst-partition curve {worst_curve}\n"
        f"{name}: total-files curve {total_curve}\n"
        f"{name}: VERDICT worst={verdict}, total={tv}; "
        f"final sub-tables {_worst_parts(store)}",
        flush=True,
    )


def main() -> None:
    spark = get_spark("sink_drift_r14", shuffle_partitions=8)
    root = "/root/repo/scratch/drift_r14"
    os.makedirs(root, exist_ok=True)

    from dns_log_transformer_spark.operators import similarity
    from dns_log_transformer_spark.streaming import (
        bloom_filter_sink,
        corpus_monitor_sink,
        ivf_index_sink,
        mv_sink,
        sketch_table_sink,
        upsert_sink,
    )

    # --- cdc upsert: bucket-partitioned dynamic overwrite -----------------
    drive(
        spark,
        "cdc_upsert",
        lambda s, store, ck: upsert_sink(s, store, ck, key_col="id"),
        lambda b: [
            {"id": (b * ROWS + i) % 1000, "version": b, "op": "U"}
            for i in range(ROWS)
        ],
        "id long, version long, op string",
        f"{root}/cdc",
    )

    # --- ivf vector index: cell-partitioned dynamic overwrite -------------
    rng = np.random.default_rng(7)
    base = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(0, 1, 8)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    codebook = similarity.pq_codebook(base, n_cells=4)

    def ivf_feed(b):
        r = np.random.default_rng(100 + b)
        return [
            {
                "vec_id": (b * ROWS + i) % 500,
                "version": b,
                "op": "U",
                "embedding": [float(x) for x in r.normal(0, 1, 8)],
            }
            for i in range(ROWS)
        ]

    drive(
        spark,
        "ivf_index",
        lambda s, store, ck: ivf_index_sink(s, codebook, store, ck),
        ivf_feed,
        "vec_id long, version int, op string, embedding array<double>",
        f"{root}/ivf",
    )

    # --- sketch (CMS + per-source): full overwrite -------------------------
    def doc_feed(b):
        return [
            {
                "doc_id": b * ROWS + i,
                "text": f"alpha beta gamma delta epsilon doc {b} {i} "
                        f"zeta eta theta iota kappa",
                "source": f"s{i % 5}",
            }
            for i in range(ROWS)
        ]

    drive(
        spark,
        "sketch",
        lambda s, store, ck: sketch_table_sink(s, store, ck),
        doc_feed,
        "doc_id long, text string, source string",
        f"{root}/sketch",
    )

    # --- bloom: full overwrite ---------------------------------------------
    drive(
        spark,
        "bloom",
        lambda s, store, ck: bloom_filter_sink(s, store, ck),
        doc_feed,
        "doc_id long, text string",
        f"{root}/bloom",
    )

    # --- mv: per-epoch dynamic overwrite (epoch-log growth expected by
    #     design; compact_mv is the fold) -----------------------------------
    drive(
        spark,
        "mv",
        lambda s, store, ck: mv_sink(s, store, ck, key_col="k", value_col="v"),
        lambda b: [
            {"k": f"k{i % 50}", "v": float(i)} for i in range(ROWS)
        ],
        "k string, v double",
        f"{root}/mv",
    )

    # --- mv with the r14 fold trigger wired ---------------------------------
    drive(
        spark,
        "mv_on",
        lambda s, store, ck: mv_sink(
            s, store, ck, key_col="k", value_col="v", compact_max_epochs=8
        ),
        lambda b: [
            {"k": f"k{i % 50}", "v": float(i)} for i in range(ROWS)
        ],
        "k string, v double",
        f"{root}/mv_on",
    )

    # --- corpus monitor: append-mode flags store — OFF then ON -------------
    # bench docs must clear the 8-word shingle window (an all-short
    # benchmark yields an empty shingle set and the bloom probe errors)
    bench = spark.createDataFrame(
        [
            (10_000 + i,
             f"bench document {i} shared tokens run alpha beta gamma "
             f"delta epsilon zeta")
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    drive(
        spark,
        "monitor_off",
        lambda s, store, ck: corpus_monitor_sink(s, bench, store, ck),
        doc_feed,
        "doc_id long, text string, source string",
        f"{root}/monitor_off",
    )
    drive(
        spark,
        "monitor_on",
        lambda s, store, ck: corpus_monitor_sink(
            s, bench, store, ck, compact_max_files=8
        ),
        doc_feed,
        "doc_id long, text string, source string",
        f"{root}/monitor_on",
    )


if __name__ == "__main__":
    main()
