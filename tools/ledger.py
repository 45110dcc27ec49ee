"""CLI shim for the attestation ledger.

The implementation lives in ``dns_log_transformer_spark/ledger.py`` so
the query registry can derive its driver window from it at import time
without depending on this repo-root ``tools`` namespace package (which
only exists on sys.path when running from the repo root).

    python tools/ledger.py
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from dns_log_transformer_spark.ledger import (  # noqa: E402,F401
    FRESHNESS_ROUNDS,
    WINDOW_SIZE,
    audit,
    current_source_hashes,
    is_green,
    load_attested_hashes,
    load_ledger,
    main,
    pack_window,
    snapshot_hashes,
    source_hash,
)

if __name__ == "__main__":
    main()
