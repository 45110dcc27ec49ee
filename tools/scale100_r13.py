"""Two-decade (1x -> 10x -> 100x) scaling rows for the round-13
documents-based operators whose PLANS claims deserve more than one
decade of evidence:

- corpus_warc_http — claimed flat (pack one blob_id shuffle; octet
  walk riding the scan). Same rationale as the r12 char-domain row:
  a flat 10x can hide an O(n log n) shuffle term, the second decade
  can't — and the byte-domain walk adds binary encode/decode bridges
  whose cost must also ride the scan.
- dedup_blocking_tradeoff — claimed one tagged-band pass whose cost
  tracks its audit/jaccard parents (truth side dominant). The x100
  replica set's per-replica alphabet permutation makes shingle
  vocabulary grow ~linearly with replicas — the df-capped inverted
  index's WORST case (every replica contributes disjoint shingles),
  same regime the r12 audit row was graded against.

Method identical to the PLANS.md table: warm session, per-query
min-of-2 timed .count() after one untimed warm run."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402
from tools.scale100_r9 import DST100, build  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    "corpus_warc_http",
    "dedup_blocking_tradeoff",
)


def main() -> None:
    spark = get_spark("scale100_r13")
    build(spark)
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        t100, n100 = timeq(spark, name, DST100)
        print(
            f"{name}: 1x {t1:.2f}s ({n1}) | 10x {t10:.2f}s ({n10}) | "
            f"100x {t100:.2f}s ({n100}) | 10->100 ratio {t100 / t10:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
