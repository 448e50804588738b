"""Sources — table catalog and corpus ingestion.

Replaces the reference's three ingestion modes in ``inputDataProcessing``
(Master/Master.py:188-255): directory-of-files, single file with
word-granular chunking, and a literal string. In Spark the chunk/assign
machinery (Master/Master.py:205-213,241-255) disappears — the FileScan
computes splits and the scheduler assigns them with locality, so each
source is just a DataFrame with the corpus schema ``(filename, text)``.

Scale posture: parquet is the primary substrate (columnar, predicate
pushdown, column pruning); ``wholetext`` text reads are only for the
reference-parity document corpus, where one file = one logical document.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver's parquet tables from a scale-factor dir.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright; it is read as a raw long (legacy
    ``nanosAsLong``) and truncated to microseconds with integer
    arithmetic — the same truncation DuckDB applies, so timestamps stay
    oracle-comparable.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive parquet TIMESTAMP(MICROS) must read as a session-TZ (UTC)
    # TIMESTAMP, not TIMESTAMP_NTZ: the engine's time arithmetic
    # (unix_micros, window ranges) and the DuckDB oracle both treat
    # naive storage as UTC instants. Set here (runtime SQL conf), not
    # only in session.py, because callers may hand in their own session
    # (the driver does).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer div (not double /): a double round-trip can round a
        # ...999 nanos tail up and disagree with true floor division.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Belt-and-braces: if an upstream reader still produced NTZ (conf
    # flipped after a cached plan, a future default change), normalize.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def docs_from_dir(spark: SparkSession, path: str) -> DataFrame:
    """One document per file in a directory.

    Reference: the dir branch of ``inputDataProcessing``
    (Master/Master.py:195-213) stores ``{filename: text}`` chunks.
    Spark reads each file as a single row (``wholetext``) and tags it
    with ``input_file_name()``; splitting/scheduling is automatic.
    """
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("filename"),
            F.col("value").alias("text"),
        )
    )


def docs_from_file(spark: SparkSession, path: str) -> DataFrame:
    """A single file as a one-document corpus.

    Reference: the file branch (Master/Master.py:216-238) whitespace-splits
    into ceil(words/n_mappers) chunks. Spark splits text files by byte
    ranges at scan time — equivalent for token-level jobs — so no manual
    chunking is needed; we keep one logical row per file.
    """
    return docs_from_dir(spark, path)


def docs_from_string(spark: SparkSession, data: str) -> DataFrame:
    """A literal string as the corpus, filename ``InputString``.

    Reference: the else branch (Master/Master.py:222-224).
    """
    return spark.createDataFrame([("InputString", data)], "filename string, text string")


def fan_out_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Round-robin repartition a CPU-heavy map stage's input ONLY when
    the upstream scan under-parallelizes.

    Local fixtures are single-row-group parquet files, and row groups
    are parquet's split granularity — so every scan arrives as ONE
    partition and a heavy stage-1 (per-position hashing, codec work,
    shingle explodes) serializes onto one core no matter how many the
    box has (measured 3-4x wall-clock on the span-dedup and codec
    queries at sf0.1). At production partitioning (many files / row
    groups >= cores) the guard makes this a NO-OP, so no shuffle of
    input bytes is ever added where the scan already fans out — the
    distinction that makes the repartition scale-honest rather than a
    local-only hack.

    ``getNumPartitions`` computes file splits without running the
    job; AQE cannot coalesce an explicit numPartitions repartition, so
    the fan-out survives tiny byte volumes.
    """
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
