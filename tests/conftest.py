"""Shared fixtures: one SparkSession per test session (JVM startup is
~15 s — never per-test), plus fixture-table paths."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")

# Pure-Python protobuf runtime shim for transformWithStateInPandas: the
# container has no google.protobuf wheel, but the Google Cloud SDK on
# this image bundles protobuf 6.32 in pure Python. Expose ONLY its
# `google` package (via a symlink in a private shim dir — putting the
# whole SDK platform dir on PYTHONPATH would let its other bundled
# top-level packages shadow site-packages), and use protobuf's own
# escape hatch for the one-minor-version gencode skew (pyspark 4.1.2's
# StateMessage_pb2 is gencode 6.33; the wire format is unchanged across
# that skew). Must run BEFORE the session fixture: local-mode Python
# workers inherit PYTHONPATH from the driver-launched JVM, and the TWS
# state protocol deserializes protobuf inside those workers.
_SDK_GOOGLE = "/usr/lib/google-cloud-sdk/platform/google_appengine/google"


def _enable_vendored_protobuf() -> None:
    try:
        import google.protobuf  # noqa: F401

        return  # a real install wins; no shim needed
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_SDK_GOOGLE, "protobuf")):
        return  # SDK absent: tests importorskip as before
    shim = os.path.join(tempfile.gettempdir(), "spark_graft_protobuf_shim")
    os.makedirs(shim, exist_ok=True)
    link = os.path.join(shim, "google")
    # refresh a stale/dangling link (SDK path can move across image
    # upgrades — islink() alone would keep a dead entry and turn the
    # importorskip into a hard failure); tolerate a concurrent pytest
    # process winning the symlink race
    if os.path.islink(link) and os.path.realpath(link) != os.path.realpath(
        _SDK_GOOGLE
    ):
        os.unlink(link)
    if not os.path.islink(link):
        try:
            os.symlink(_SDK_GOOGLE, link)
        except FileExistsError:
            pass
    sys.path.insert(0, shim)
    os.environ["PYTHONPATH"] = (
        shim + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")


_enable_vendored_protobuf()

from dns_log_transformer_spark.session import get_spark, load_tables  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dns_log_transformer_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    """sf0.001 fixture tables registered as temp views."""
    return load_tables(spark, SF_SMOKE)
