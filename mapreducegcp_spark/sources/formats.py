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
- ``write_sorted``: range-clustering + in-file sort -> row-group and
  file skipping on range predicates over high-cardinality keys.
- ``compact``: small-file maintenance, sized from the real on-disk
  footprint.

tests/test_formats.py asserts the pruning, the no-Exchange plans, the
disjoint row-group statistics, and the compaction arithmetic.
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


def write_sorted(
    df: DataFrame, path: str, *sort_cols: str, n_ranges: int = 8
) -> None:
    """Range-clustered parquet for row-group data skipping: rows are
    range-partitioned on ``sort_cols`` (files cover disjoint key
    ranges) and sorted within each partition (row groups inside a file
    cover disjoint, ordered sub-ranges). Parquet footers then carry
    tight min/max statistics, so a selective filter on the sort key
    skips whole row groups and whole files without reading them — the
    third physical-design lever after directory partitioning
    (coarse-grained pruning) and bucketing (join co-location): this is
    the one for range predicates on high-cardinality columns
    (timestamps, ids), where directory partitioning would explode into
    a small-files problem.

    ``n_ranges`` controls output file count; at scale set it to
    data_size / target_file_size. The range exchange samples the sort
    key to pick balanced boundaries — one shuffle, paid at write time,
    amortized over every scan that skips."""
    df.repartitionByRange(n_ranges, *sort_cols).sortWithinPartitions(
        *sort_cols
    ).write.mode("overwrite").parquet(path)


def compact(
    spark: SparkSession, path: str, out_path: str, target_file_mb: int = 128
) -> int:
    """Small-file compaction: rewrite a fragmented dataset into files
    of ~``target_file_mb``. Streaming sinks and fine-grained partition
    writes accrete small files; at scale, footer/open overhead and
    scheduler pressure grow with file COUNT, not bytes, so periodic
    compaction is standing maintenance for any 100 TB table.

    Sizing reads the existing footprint from the filesystem (here the
    local FS of the test substrate; on an object store the same
    numbers come from the listing API or table-format metadata) — not
    from a row-count heuristic. Returns the target file count. The
    rewrite is one round-robin repartition; use ``write_sorted``
    instead when the table should also end up range-clustered."""
    import math
    import os
    from urllib.parse import urlparse

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(urlparse(f).path) for f in df.inputFiles()
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


# ------------------------------------------------------- XML round-trip

_XML_ORACLE = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY o_orderpriority
"""


def _register_xml_roundtrip():
    from pyspark.sql import functions as F

    from mapreducegcp_spark.functions.exact import dec2
    from mapreducegcp_spark.registry import register
    from mapreducegcp_spark.sources.catalog import load_table

    @register("format_xml_roundtrip", oracle=_XML_ORACLE, tags=("sources",))
    def q_format_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Round-trip through Spark 4's built-in XML source: aggregate
        orders, write element-per-row XML, read it back with an
        explicit schema, return the rows — covering the one mainstream
        interchange format the parquet/orc/csv/json round-trip tests
        (tests/test_formats.py) don't. Exact decimal totals cast once
        to double survive the text round-trip losslessly (shortest-
        roundtrip float printing both ways).

        XML is a fine INTERCHANGE edge, not a table substrate: no
        pushdown, no column pruning, whole-row parse per record — at
        100 TB it exists at ingest boundaries only, converted to
        parquet on first touch (write_sorted/compact above)."""
        import os
        import shutil

        agg = (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(dec2("o_totalprice")).cast("double").alias("total"),
            )
        )
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        out = f"/tmp/mapreducegcp_spark_xml/{sf_tag}"
        shutil.rmtree(out, ignore_errors=True)
        (
            agg.write.format("xml")
            .option("rootTag", "priorities")
            .option("rowTag", "priority")
            .save(out)
        )
        return (
            spark.read.format("xml")
            .schema("o_orderpriority string, n bigint, total double")
            .option("rowTag", "priority")
            .load(out)
        )


_register_xml_roundtrip()


# --------------------------------------------- partition-pruned scan

_PRUNE_ORACLE = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
WHERE event_type IN ('click', 'purchase')
GROUP BY event_type
"""


def _register_partition_prune():
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mapreducegcp_spark.registry import register
    from mapreducegcp_spark.sources.catalog import load_table

    @register("source_partition_prune", oracle=_PRUNE_ORACLE, tags=("sources",))
    def q_source_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Directory-partitioned write, then a PRUNED read-back.

        The layout half of the scale story the write helpers above
        promise: events land partitioned by event_type (one subtree
        per value), and the filtered read-back resolves the predicate
        against the PARTITION COLUMNS during planning — 2 of 5
        subtrees are listed/read, the rest never touched (asserted on
        the plan's PartitionFilters in tests/test_formats.py). At
        100 TB this is the difference between scanning a full table
        and scanning exactly the slices a query names. The aggregate
        over the surviving partitions hash-matches the unpartitioned
        oracle, proving the round-trip loses nothing.

        Parity-probe shape (like operators/mapred_parity.py): eager
        over a bounded projection, because the scratch directory must
        outlive the scan but not the query."""
        events = load_table(spark, sf_dir, "events").select("event_type", "value")
        tmp = tempfile.mkdtemp(prefix="part_prune_")
        try:
            write_partitioned(events, tmp, "event_type")
            back = (
                spark.read.parquet(tmp)
                .where(F.col("event_type").isin("click", "purchase"))
                .groupBy("event_type")
                .agg(
                    F.count("*").alias("n_events"),
                    F.sum(F.col("value").cast("decimal(18,4)"))
                    .cast("double")
                    .alias("total_value"),
                )
            )
            rows = back.collect()
            schema = back.schema
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return spark.createDataFrame(rows, schema)


_register_partition_prune()


# ------------------------------------ dynamic partition pruning (DPP)

# Events span 2024-01-01..2024-01-30 at every SF (TESTDATA.md); three
# mid-range dates keep the dim deterministic with no driver collect.
_DPP_DATES = ("2024-01-05", "2024-01-12", "2024-01-26")
_DPP_DECOYS = ("2024-01-02", "2024-01-20")

_DPP_ORACLE = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
WHERE {" OR ".join(f"CAST(ts AS DATE) = DATE '{d}'" for d in _DPP_DATES)}
GROUP BY 1
"""
# (OR-equality chain, not IN: DuckDB 1.0.0 evaluates
#  `CAST(ts AS DATE) IN (DATE '...', ...)` to empty on timestamp input)


def dpp_probe_plan(spark: SparkSession, sf_dir: str, scratch: str) -> DataFrame:
    """Build (lazily) the dynamic-partition-pruning probe: a
    date-partitioned copy of events joined to a small filtered date
    dim on the PARTITION column.

    Static pruning (source_partition_prune above) needs the literal
    partition values in the query text; here they arrive through a
    JOIN, so pruning must happen at RUNTIME: Spark's DPP reuses the
    broadcast of the filtered dim as a subquery filter on the fact
    scan, and only the 3 matching date directories of 30 are read.
    At 100 TB this is THE fact-table access path — `fact JOIN dim
    WHERE dim.attr = ...` touching only the partitions the dim rows
    name, without the query author enumerating them.
    tests/test_formats.py asserts `dynamicpruning` in the scan's
    partition filters and that the join stays a broadcast.

    The dim carries decoy rows dropped by its `pick` filter so the
    planner sees a genuinely selective dim-side predicate (a bare
    unfiltered LocalRelation would not need pruning)."""
    from pyspark.sql import functions as F

    from mapreducegcp_spark.sources.catalog import load_table

    events = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("event_date"), "user_id", "value"
    )
    write_partitioned(events, scratch, "event_date")
    fact = spark.read.parquet(scratch)
    dim = spark.createDataFrame(
        [(d, 1) for d in _DPP_DATES] + [(d, 0) for d in _DPP_DECOYS],
        "event_date string, pick int",
    ).select(F.col("event_date").cast("date").alias("event_date"), "pick")
    keep = F.broadcast(dim.where(F.col("pick") == 1).select("event_date"))
    return (
        fact.join(keep, "event_date")
        .groupBy(F.date_format("event_date", "yyyy-MM-dd").alias("event_date"))
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


def _register_dynamic_partition_prune():
    import shutil
    import tempfile

    from mapreducegcp_spark.registry import register

    @register("source_dynamic_partition_prune", oracle=_DPP_ORACLE, tags=("sources",))
    def q_source_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Runtime-pruned read of a date-partitioned fact through a dim
        join — see ``dpp_probe_plan``. Parity-probe shape: eager over a
        bounded projection so the scratch directory can be reclaimed."""
        tmp = tempfile.mkdtemp(prefix="dpp_probe_")
        try:
            out = dpp_probe_plan(spark, sf_dir, tmp)
            rows = out.collect()
            schema = out.schema
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return spark.createDataFrame(rows, schema)


_register_dynamic_partition_prune()


# ---------------------------- corrupt-tolerant JSONL ingest (PERMISSIVE)

_CORRUPT_EVERY = 37  # orders with o_orderkey % 37 == 0 get truncated lines

_CORRUPT_ORACLE = f"""
SELECT CAST(count(*) FILTER (WHERE o_orderkey % {_CORRUPT_EVERY} <> 0) AS BIGINT) AS n_good,
       CAST(count(*) FILTER (WHERE o_orderkey % {_CORRUPT_EVERY} = 0) AS BIGINT) AS n_corrupt,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
              FILTER (WHERE o_orderkey % {_CORRUPT_EVERY} <> 0) AS DOUBLE) AS good_total
FROM orders
"""


def _register_corrupt_jsonl():
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mapreducegcp_spark.functions.exact import dec2
    from mapreducegcp_spark.registry import register
    from mapreducegcp_spark.sources.catalog import load_table

    @register("source_jsonl_corrupt_tolerant", oracle=_CORRUPT_ORACLE, tags=("sources",))
    def q_source_jsonl_corrupt_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
        """PERMISSIVE JSONL ingest over a feed with malformed lines —
        the shape of real web-scale ingest, where a crawler's output
        always contains truncated/garbled records and FAILFAST would
        kill a 100 TB job on the first one.

        A deterministic 1-in-{_CORRUPT_EVERY} of serialized order rows
        is truncated mid-object; the read-back schema carries a
        ``columnNameOfCorruptRecord`` column, so bad lines surface AS
        DATA (null fields + the raw line) instead of as exceptions —
        countable, quarantinable, and the good rows' aggregate is
        unaffected. The oracle recomputes both populations from the
        clean table, proving the parser dropped exactly the corrupted
        lines and nothing else.

        Parity-probe shape (eager over a scratch dir) like the
        partition-prune probes above."""
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", dec2("o_totalprice").cast("double").alias("o_totalprice")
        )
        line = F.to_json(F.struct("o_orderkey", "o_totalprice"))
        corrupted = F.when(
            F.col("o_orderkey") % _CORRUPT_EVERY == 0,
            F.substring(line, 1, F.length(line) - 5),
        ).otherwise(line)
        tmp = tempfile.mkdtemp(prefix="jsonl_corrupt_")
        try:
            orders.select(corrupted.alias("value")).write.mode("overwrite").text(tmp)
            back = (
                spark.read.schema(
                    "o_orderkey long, o_totalprice double, _bad string"
                )
                .option("mode", "PERMISSIVE")
                .option("columnNameOfCorruptRecord", "_bad")
                .json(tmp)
            )
            out = back.agg(
                F.count(F.when(F.col("_bad").isNull(), 1)).alias("n_good"),
                F.count(F.when(F.col("_bad").isNotNull(), 1)).alias("n_corrupt"),
                F.sum(
                    F.when(
                        F.col("_bad").isNull(),
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                )
                .cast("double")
                .alias("good_total"),
            )
            rows = out.collect()
            schema = out.schema
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return spark.createDataFrame(rows, schema)


_register_corrupt_jsonl()


# ------------------------------- schema evolution (mergeSchema read)

_EVOLVE_ORACLE = """
SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderpriority END AS priority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1
"""


def _register_schema_evolution():
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mapreducegcp_spark.functions.exact import dec2
    from mapreducegcp_spark.registry import register
    from mapreducegcp_spark.sources.catalog import load_table

    @register("source_schema_evolution", oracle=_EVOLVE_ORACLE, tags=("sources",))
    def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Schema evolution across parquet batches: an early writer
        emitted (o_orderkey, o_totalprice); a later one added
        o_orderpriority. ``mergeSchema`` unifies the footers at read
        time — old files surface the new column as NULL, no rewrite of
        historical data — the additive-evolution contract every
        long-lived 100 TB table depends on (a table format keeps the
        merged schema in metadata; on raw parquet the read pays one
        footer scan to derive it, which is why it is opt-in).

        Even-keyed rows land in the OLD batch, odd-keyed in the NEW, so
        the oracle reconstructs exactly which rows must carry NULL.
        The aggregate over the merged read proves no rows were lost,
        duplicated, or mis-defaulted by the merge."""
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            dec2("o_totalprice").cast("double").alias("o_totalprice"),
            "o_orderpriority",
        )
        tmp = tempfile.mkdtemp(prefix="schema_evolve_")
        try:
            old = orders.where(F.col("o_orderkey") % 2 == 0).drop("o_orderpriority")
            new = orders.where(F.col("o_orderkey") % 2 != 0)
            old.write.mode("overwrite").parquet(f"{tmp}/batch=1")
            new.write.mode("overwrite").parquet(f"{tmp}/batch=2")
            back = spark.read.option("mergeSchema", "true").parquet(tmp)
            out = back.groupBy(
                F.col("o_orderpriority").alias("priority")
            ).agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("total"),
            )
            rows = out.collect()
            schema = out.schema
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return spark.createDataFrame(rows, schema)


_register_schema_evolution()


# --------------------------------------------- binaryFile source (raw-media ingest)

_BINFILE_STRIDE = 10  # one payload file per 10 docs keeps file count bounded

_BINFILE_ORACLE = f"""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
WHERE doc_id % {_BINFILE_STRIDE} = 0
"""


def _register_binaryfile_source():
    import os
    import shutil

    from pyspark.sql import functions as F

    from mapreducegcp_spark.registry import register
    from mapreducegcp_spark.sources.catalog import load_table

    @register("source_binaryfile_payloads", oracle=_BINFILE_ORACLE, tags=("sources", "multimodal"))
    def q_source_binaryfile_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Ingest a directory of opaque media files through Spark's
        built-in ``binaryFile`` source — the standard path for image/
        audio/video corpora at scale (one object per asset, read as
        (path, modificationTime, length, content:binary)).

        Fixture side: executors write one ``doc<id>.bin`` per selected
        document via foreachPartition (distributed write, no driver
        materialization — on a cluster this directory is the object
        store the crawlers filled). Read side: binaryFile with a
        pathGlobFilter; asset id recovered from the path, payload
        verified by content md5 against the source-of-truth text.

        Scale notes: binary files are NOT splittable — parallelism is
        file-granular, and ``spark.sql.files.maxPartitionBytes`` packs
        many small assets per task (the small-file problem is the
        operational hazard; the compaction answer is layout.compact).
        Column pruning applies to the file-level columns: a
        metadata-only query never reads content bytes.
        """
        docs = load_table(spark, sf_dir, "documents")
        sel = docs.where(F.col("doc_id") % _BINFILE_STRIDE == 0).select(
            "doc_id", F.encode("text", "UTF-8").alias("payload")
        )
        sf_tag = os.path.basename(os.path.normpath(sf_dir))
        out = f"/tmp/mapreducegcp_spark_binfiles/{sf_tag}"
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)

        def write_part(rows):
            # local closure: cloudpickles cleanly regardless of how the
            # driver imported this module (see verify-skill gotcha)
            for r in rows:
                tmp_name = f"{out}/.doc{r['doc_id']}.tmp"
                with open(tmp_name, "wb") as f:
                    f.write(bytes(r["payload"]))
                os.replace(tmp_name, f"{out}/doc{r['doc_id']}.bin")

        sel.foreachPartition(write_part)
        back = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.bin")
            .load(out)
        )
        return back.select(
            F.regexp_extract(F.col("path"), r"doc(\d+)\.bin$", 1).cast("long").alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )


_register_binaryfile_source()
