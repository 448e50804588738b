"""Format round-trips and layout-aware writers.

The reference's only storage format is JSON blobs in its KV store
(KeyValueStore/KeyValueStore.py:76-92). Here parquet is the primary
substrate (columnar, statistics, pushdown); CSV/JSON are interchange
formats; and two layout writers encode the 100 TB physical-design
levers:

- ``write_partitioned``: directory partitioning on a low-cardinality
  column -> partition pruning at scan time (a filter on the partition
  column never touches other directories' files).
- ``write_bucketed``: hash-bucketing on a join key via
  ``saveAsTable`` -> co-located joins. Two tables bucketed the same
  way join with ZERO exchanges — the shuffle happens once at write
  time instead of on every query, which is the difference between an
  hourly pipeline re-shuffling 100 TB and reading it join-ready.

tests/test_formats.py asserts the pruning and the no-Exchange plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = spark.read.option("header", "true")
    # explicit schema preferred: inference costs an extra full scan
    return r.schema(schema).csv(path) if schema else r.option("inferSchema", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    r = spark.read
    return r.schema(schema).json(path) if schema else r.json(path)


def write_partitioned(df: DataFrame, path: str, *cols: str) -> None:
    """Directory-partitioned parquet: one subtree per distinct value
    combination. Keep cardinality low (date, region, format) — a
    high-cardinality partition column makes a small-files problem."""
    df.write.mode("overwrite").partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Hash-bucketed table; sorted buckets additionally allow merge-join
    without a sort step. ``path`` makes it external (warehouse.dir is a
    static conf, so tests point tables at scratch space this way)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC carries its schema; no inference scan needed (unlike CSV/JSON)
    return spark.read.orc(path)
