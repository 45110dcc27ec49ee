#!/usr/bin/env python
"""Targeted oracle-parity check for named queries (r16 iteration tool).

Usage: python tools/parity_some_r16.py [--sf SF_DIR] name [name ...]

Same compare + lints as tools/parity_sweep.py, restricted to the named
queries so a touched operator can be verified in seconds instead of a
full-registry sweep. The full sweep remains the round-end backstop.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from dns_log_transformer_spark import plans  # noqa: E402
from dns_log_transformer_spark.broadcast_allowlist import (  # noqa: E402
    BROADCAST_ALLOWLIST,
)
from dns_log_transformer_spark.operators.caching import release_all  # noqa: E402
from dns_log_transformer_spark.session import TABLES, get_spark  # noqa: E402
from tests.test_oracle_parity import (  # noqa: E402
    assert_frames_match,
    driver_canon,
)


def main() -> int:
    import time

    argv = list(sys.argv[1:])
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf = argv[i + 1]
        del argv[i : i + 2]
    names = argv
    spark = get_spark("parity_some_r16")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    oracles = entry_mod.oracle_sql()
    qs = entry_mod.queries()
    bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf)
            spdf = sdf.toPandas()
            for lint, tag in (
                (plans.codegen_lint, "codegen"),
                (plans.plan_size_lint, "plan size"),
            ):
                r = lint(sdf)
                if r:
                    raise AssertionError(f"{tag} lint: {r[0]}")
            bc = plans.broadcast_lint(sdf, BROADCAST_ALLOWLIST.get(name, {}))
            if bc:
                raise AssertionError(f"broadcast lint: {bc[0]}")
            release_all()
            driver_canon(spdf, name)
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                assert_frames_match(spdf, ddf, name)
            print(f"OK   {name} ({time.perf_counter() - t0:.2f}s)")
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print(f"FAIL {name} -> {str(ex).splitlines()[0][:200]}")
            release_all()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
