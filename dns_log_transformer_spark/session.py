"""SparkSession factory tuned for this engine.

Local mode is used for tests/bench (single JVM); the same config scales to
a real cluster — shuffle partitions and AQE are the knobs that matter at
100 TB, and they are set here so every entry point shares them.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "dns_log_transformer_spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults chosen for scale-out correctness and local-mode speed:
    - AQE on (runtime coalesce, skew-join split, dynamic join strategy);
    - UTC session timezone (oracle comparisons against DuckDB are
      timezone-naive; reference timestamps are all UTC,
      /root/reference/app/app.py:130,149);
    - Arrow on for any pandas-UDF stage.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the events fixture stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert (read_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # PySpark 4's per-function call-site capture (error-message
        # context) costs 2-3 EXTRA py4j roundtrips on every F.* call —
        # profiled at ~5 s of the container census's ~7 s plan build
        # (thousands of Column ops) and a tax on every deep plan here.
        # This engine's failures are caught by its own oracle/test
        # harness, so the call-site decoration is pure overhead.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Deployment-specific overrides without code edits (e.g. cluster-scale
    # shuffle/AQE sizing, A/B measurement): semicolon-separated k=v pairs.
    # Empty by default, so local bench/test behavior is unchanged.
    for pair in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one fixture table (lazy parquet scan; Catalyst prunes/pushes).

    ``events.ts`` is TIMESTAMP(NANOS) in the fixture parquet, which
    Spark's vectorized reader rejects; with nanosAsLong it arrives as a
    long, converted here to a micros timestamp with exact integer
    division (DuckDB truncates nanos->micros the same way, keeping the
    oracle comparable).
    """
    from pyspark.sql import functions as F

    if name == "events":
        # Session-portability: callers (e.g. an external harness) may hand us
        # a SparkSession built without get_spark(); nanosAsLong is
        # runtime-settable, so set it here rather than relying on
        # session-build-time config. Guarded for locked-down sessions.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        # UTC is load-bearing for oracle parity: DuckDB treats the fixture
        # timestamps as naive UTC, so event-time bucketing (date_trunc,
        # window) must run in UTC regardless of the caller's session tz.
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) fixture read via nanosAsLong
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) fixture: naive UTC
            # wall clock. Session tz is UTC (set above), so the cast maps
            # each wall-clock value to the same instant DuckDB sees.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, "object"]:
    """Read every fixture table under ``sf_dir`` and register temp views."""
    dfs = {}
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            df = read_table(spark, sf_dir, name)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs
