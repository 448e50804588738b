"""SparkSession construction.

Replaces the reference's cluster lifecycle (``init_cluster`` /
``destroy_cluster``, Master/Master.py:25-58,17-21): one SparkSession is
the job handle; ``spark.sql.shuffle.partitions`` plays the role of
``numberOfReducers``.

Scale posture: these defaults target local[N] testing but are written so
the same code runs on a real cluster — AQE handles runtime partition
coalescing and skew joins, shuffle partitions default to the core count
locally (a cluster submit would set it to ~2-3x total cores or rely on
AQE), and Arrow is enabled for any pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def cpus_from_env() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = "mapreducegcp-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    ``extra_conf`` entries are applied last (they win over the
    defaults). Creation-time-only confs (driver memory, maxResultSize)
    are silently ignored by getOrCreate when a session already exists —
    callers that need them must be the ones creating the session.
    """
    n = cpus or cpus_from_env()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet TIMESTAMP(MICROS) without a timezone must read as a
        # session-TZ (UTC) TIMESTAMP, not TIMESTAMP_NTZ: the engine's
        # time arithmetic (unix_micros, window ranges) and the DuckDB
        # oracle both treat naive storage as UTC instants, and NTZ
        # inference would make the same parquet file type-unstable
        # across writer versions.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # write timestamps as TIMESTAMP_MICROS, not legacy INT96:
        # INT96 row groups carry no min/max statistics, which silently
        # disables row-group skipping on every time-range predicate
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
