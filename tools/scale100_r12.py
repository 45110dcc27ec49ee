"""Two-decade (1x -> 10x -> 100x) scaling rows for the round-12
documents-based operators whose PLANS claims deserve more than one
decade of evidence:

- corpus_warc_records — claimed "flat by construction" (pack is one
  blob_id shuffle; parse is codegen string arithmetic riding the scan).
  A flat 10x row could still hide an O(n log n) shuffle term; the
  second decade can't.
- text_pmi_collocations — claimed vocabulary-bound, not corpus-bound.
  The x100 replica set applies a distinct 26-letter permutation per
  replica (tools/scale100_r9.build), so the vocabulary grows ~linearly
  with replicas and this row measures the op against its WORST case
  (every replica contributes a disjoint vocabulary), not its best.

Method identical to the PLANS.md table: warm session, per-query
min-of-2 timed .count() after one untimed warm run."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402
from tools.scale100_r9 import DST100, build  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    "corpus_warc_records",
    "text_pmi_collocations",
)


def main() -> None:
    spark = get_spark("scale100_r12")
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
