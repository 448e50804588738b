"""Physical-layout & global-order operators: distributed global row
numbering, Z-order clustering, quantile binning from global cutpoints,
and a bucketed interval join.

Absent from the reference (SURVEY.md §2.2 — the reference has no sorts,
no total ordering, no layout control; its only partitioner is the
ord-sum hash at Master/Master.py:146-150). These four implement the
classic "total order / spatial locality at scale" patterns the naive
formulations of which collapse on a 1000-executor cluster:

- ``order_global_rownum``: ROW_NUMBER() over an un-partitioned window
  moves *all* data through one task. The scale-correct form is
  two-phase: range-partition on the sort key, number rows locally
  within each sorted partition (map-only, Arrow-batched), then add
  per-partition offsets computed from a tiny (n_partitions-row) count
  table broadcast back. No single-task stage ever sees more than one
  partition of data.
- ``layout_zorder_cluster``: bit-interleaved Z-values map a 2-D key
  space onto a 1-D sort order whose ranges have tight per-dimension
  bounding boxes — the standard lakehouse data-skipping layout. The
  query computes Z-values with pure integer expressions (codegen, no
  UDF) and emits per-Z-range zone-map stats (min/max of each dim)
  proving the locality a writer clustered by z would give the scan
  pruner.
- ``feature_quantile_bins``: global discretization without a global
  sort — exact quartile cutpoints come from one distributed
  ``percentile`` aggregate (partial per partition, merged), are
  broadcast as a 1-row plan, and binning is a map-side CASE. The
  interpolation is done on integer cents so Spark's and DuckDB's
  (algebraically different but exact-on-integers) formulas agree
  bit-for-bit.
- ``interval_bucket_join``: a pure range (interval-overlap) join with
  no equi key — the naive plan is a broadcast-nested-loop cross
  product. Bucketing each interval to the fixed-width time buckets it
  covers (here exactly 2 per 30-min window) turns it into an equi-join
  on bucket + a cheap residual range filter, with each qualifying pair
  produced exactly once (a point event lives in exactly one bucket).
  Shuffle volume is O(events + 2·intervals) instead of O(n²).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mapreducegcp_spark.functions.exact import o_pct, o_sorted_list
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

# --------------------------------------------- global row numbering

_N_RANGE = 16  # range partitions for the two-phase global ordering


def _tag_partition_pos(df: DataFrame) -> DataFrame:
    """Append (pid, pos): the physical partition id and the row's
    0-based position within it. Map-only (mapInPandas preserves the
    incoming range partitioning and sort); the per-partition counter
    carries across Arrow batches."""
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("pid", T.IntegerType()), T.StructField("pos", T.LongType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pid"] = np.int32(pid)
            pdf["pos"] = np.arange(pos, pos + len(pdf), dtype="int64")
            pos += len(pdf)
            yield pdf

    return df.mapInPandas(gen, schema)


def global_rownum(
    df: DataFrame, order_cols: list, out: str = "global_rownum", n_range: int = _N_RANGE
) -> DataFrame:
    """Append a 1-based global ROW_NUMBER over ``order_cols`` without a
    single-partition window — the reusable two-phase pattern behind
    ``order_global_rownum`` (range-partition + local numbering, then
    broadcast per-partition offsets). ``order_cols`` must induce a
    UNIQUE total order (callers add a key tiebreak) so the numbering is
    independent of where the range sampler places boundaries — and so
    the lazy checkpoint's re-evaluation, if it ever happens, is
    bit-identical. ``df`` must not already carry pid/pos columns.

    The checkpoint is LAZY: plan construction stays job-free; the first
    action materializes the tagged rows once and both the count branch
    and the join branch then read that same materialization (the
    broadcast side runs first and pays it)."""
    ranged = df.repartitionByRange(n_range, *order_cols).sortWithinPartitions(*order_cols)
    tagged = _tag_partition_pos(ranged).localCheckpoint(eager=False)
    counts = tagged.groupBy("pid").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("offset")
    )
    return tagged.join(F.broadcast(offsets), "pid").select(
        *df.columns, (F.col("offset") + F.col("pos") + 1).alias(out)
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    rn_out: str = "rnk",
    cum_out: str = "cum",
    n_range: int = _N_RANGE,
) -> DataFrame:
    """Append a global ROW_NUMBER and a running SUM(``val_col``) over
    ``order_cols`` — the two-phase form of
    ``row_number() / sum() OVER (ORDER BY ...)`` with no
    single-partition window. Phase 1 range-partitions on the (unique —
    callers add a key tiebreak) sort order and computes per-row local
    position + local cumulative sum in one Arrow pass; phase 2
    broadcasts per-partition row/value prefix offsets (an
    n_partitions-row table) back. ``val_col`` must be integral — the
    cumsum runs in int64 so both phases are exact."""
    ranged = df.repartitionByRange(n_range, *order_cols).sortWithinPartitions(*order_cols)
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("pid", T.IntegerType()),
            T.StructField("pos", T.LongType()),
            T.StructField("lcum", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        pos = 0
        run = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pid"] = np.int32(pid)
            pdf["pos"] = np.arange(pos, pos + len(pdf), dtype="int64")
            c = pdf[val_col].to_numpy(dtype="int64").cumsum() + run
            pdf["lcum"] = c
            if len(c):
                run = int(c[-1])
            pos += len(pdf)
            yield pdf

    tagged = ranged.mapInPandas(gen, schema).localCheckpoint(eager=False)
    per = tagged.groupBy("pid").agg(
        F.count("*").alias("cnt_rows"), F.sum(val_col).alias("sum_val")
    )
    w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per.select(
        "pid",
        F.coalesce(F.sum("cnt_rows").over(w), F.lit(0)).alias("row_off"),
        F.coalesce(F.sum("sum_val").over(w), F.lit(0)).alias("val_off"),
    )
    return tagged.join(F.broadcast(offsets), "pid").select(
        *df.columns,
        (F.col("row_off") + F.col("pos") + 1).alias(rn_out),
        (F.col("val_off") + F.col("lcum")).alias(cum_out),
    )


def ntile_from_rownum(rn, n_rows, n_buckets: int):
    """Closed-form ``ntile(n_buckets)`` from a 1-based global row number
    ``rn`` out of ``n_rows`` total — SQL-standard semantics: with
    q = n_rows div n_buckets and r = n_rows mod n_buckets, the first r
    buckets hold q+1 rows, the rest q. Pure column arithmetic, so the
    quintile scoring that would otherwise need a global ntile window
    runs map-side after a distributed ``global_rownum``."""
    q = F.floor(n_rows / n_buckets)
    r = n_rows % n_buckets
    head = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    return F.when(rn <= head, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - head - 1) / q) + 1
    )


_ROWNUM_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS global_rownum
FROM orders
"""


@register("order_global_rownum", oracle=_ROWNUM_ORACLE, tags=("layout",))
def q_order_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ROW_NUMBER without the single-partition window.

    Phase 1: repartitionByRange on (o_totalprice DESC, o_orderkey) —
    partition i holds strictly earlier sort keys than partition i+1 —
    then sort within partitions and tag each row with (pid, local pos)
    in one Arrow pass. Phase 2: count rows per pid (a 16-row
    aggregate), prefix-sum the counts into offsets (window over 16
    rows — the ONLY driver-scale data in the plan), broadcast the
    offsets back, and global_rownum = offset + pos + 1.

    The unique o_orderkey tie-break makes the total order — and hence
    every row's number — independent of where the range sampler placed
    partition boundaries. At 100 TB this is the only shape that works:
    the data-sized stages are one range exchange + a map, and the
    global coordination is n_partitions rows, not n rows."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return global_rownum(
        orders, [F.col("o_totalprice").desc(), F.col("o_orderkey")], "global_rownum"
    )


# --------------------------------------------- Z-order clustering

_Z_BITS = 8  # 8 bits per dimension -> 16-bit z-values
_Z_SHIFT = 10  # keep the top 6 z bits -> 64 z-ranges


def _interleave_expr(x: str, y: str, shl, shr) -> str:
    """Bit-interleave SQL for two ``_Z_BITS``-bit ints: x takes the even
    output bits, y the odd. ``shl``/``shr`` format engine-specific
    shifts so one generator yields both the Spark and DuckDB text."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(shl(f"({shr(x, i)} & 1)", 2 * i))
        terms.append(shl(f"({shr(y, i)} & 1)", 2 * i + 1))
    return " + ".join(terms)


def _spark_shl(e: str, n: int) -> str:
    return f"shiftleft({e}, {n})" if n else e


def _spark_shr(e: str, n: int) -> str:
    return f"shiftright({e}, {n})" if n else e


def _duck_shl(e: str, n: int) -> str:
    return f"(({e}) << {n})" if n else e


def _duck_shr(e: str, n: int) -> str:
    return f"(({e}) >> {n})" if n else e


_ZORDER_ORACLE = f"""
WITH dims AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
         CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) % 256 AS BIGINT) AS y
  FROM orders
), zvals AS (
  SELECT x, y, ({_interleave_expr("x", "y", _duck_shl, _duck_shr)}) AS z FROM dims
)
SELECT CAST(z >> {_Z_SHIFT} AS BIGINT) AS z_range,
       count(*) AS n,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM zvals GROUP BY 1
"""


@register("layout_zorder_cluster", oracle=_ZORDER_ORACLE, tags=("layout",))
def q_layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering: interleave the low 8 bits of the
    customer key with the order date's day number, then emit zone-map
    stats (count + per-dimension min/max) per Z-range.

    The interleave is pure integer expression work — shiftleft/
    shiftright/& inside whole-stage codegen, no UDF — and the rollup is
    one hash aggregate. The point of the output: every Z-range's
    (x_min..x_max, y_min..y_max) box is a tiny corner of the key
    space, so a table *written* range-clustered by z serves file-level
    min/max pruning for predicates on EITHER dimension — the layout
    trick behind Delta/Iceberg Z-ordering. At 100 TB the same plan is
    one scan + one exchange on the 64 z-ranges."""
    orders = load_table(spark, sf_dir, "orders")
    dims = orders.select(
        F.pmod(F.col("o_custkey"), F.lit(256)).cast("long").alias("x"),
        F.pmod(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")),
            F.lit(256),
        )
        .cast("long")
        .alias("y"),
    )
    z = F.expr(_interleave_expr("x", "y", _spark_shl, _spark_shr))
    return (
        dims.withColumn("z", z)
        .groupBy(F.shiftright(F.col("z"), _Z_SHIFT).cast("long").alias("z_range"))
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )


# --------------------------------------------- global quantile binning

_QBIN_ORACLE = f"""
WITH cents AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
), cuts AS (
  SELECT {o_pct('l', 0.25)} AS q1,
         {o_pct('l', 0.50)} AS q2,
         {o_pct('l', 0.75)} AS q3
  FROM (SELECT {o_sorted_list('c')} AS l FROM cents)
)
SELECT CASE WHEN c <= q1 THEN 0 WHEN c <= q2 THEN 1 WHEN c <= q3 THEN 2 ELSE 3 END AS bin,
       count(*) AS n,
       CAST(sum(c) AS BIGINT) AS total_cents,
       min(c) AS c_min, max(c) AS c_max
FROM cents, cuts
GROUP BY 1
"""


def _exact_quantiles_from_histogram(cents: DataFrame, ps: list[float]) -> DataFrame:
    """1-row table of exact quantiles of integer column ``c`` —
    ``q1..q{len(ps)}`` — computed from a value histogram + distributed
    cumulative counts instead of the ``percentile`` aggregate.

    Spark's exact ``percentile`` keeps a (value -> count) map as
    aggregation state and merges every partition's map in ONE final
    task that then sorts the whole distinct-value domain — a
    single-task bottleneck that scales with value cardinality
    (measured 3.0 s of feature_quantile_bins' 4.7 s at sf0.1). This
    replacement is the same arithmetic with no single-task stage:
    groupBy(c) histogram (map-side combined), ``global_cumsum`` over c
    (range exchange + Arrow cumsum + 16-row offsets — the
    order_global_rownum machinery), then each quantile's two bracketing
    order statistics fall out of one conditional-min aggregate over the
    histogram, and the interpolation is the identical two-product form
    ``(ceil(pos)-pos)*lo + (pos-floor(pos))*hi`` on exact inputs:
    ``ps`` must be exact binary fractions (quarters here) so
    ``pos = p*(n-1)`` and both coefficients are EXACT doubles — the
    result is bit-identical to the ``percentile`` aggregate and to the
    DuckDB o_pct oracle (same guarantee, same argument).

    NULLs are excluded like the aggregate excludes them. The histogram
    is lazily checkpointed: the cumsum branch and the row-count branch
    share one materialization."""
    hist = (
        cents.where(F.col("c").isNotNull())
        .groupBy("c")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    cum = global_cumsum(hist, [F.col("c")], "cnt", cum_out="cum")
    n = hist.agg(F.sum("cnt").alias("n"))
    aggs = []
    for i, p in enumerate(ps, start=1):
        pos = F.lit(p) * (F.col("n") - 1).cast("double")
        aggs += [
            F.min(F.when(F.col("cum") >= F.floor(pos) + 1, F.col("c"))).alias(f"lo{i}"),
            F.min(F.when(F.col("cum") >= F.ceil(pos) + 1, F.col("c"))).alias(f"hi{i}"),
            F.any_value(pos).alias(f"pos{i}"),
        ]
    brackets = cum.crossJoin(F.broadcast(n)).agg(*aggs)
    outs = []
    for i in range(1, len(ps) + 1):
        lo = F.col(f"lo{i}").cast("double")
        hi = F.col(f"hi{i}").cast("double")
        pos = F.col(f"pos{i}")
        outs.append(
            F.when(lo == hi, lo)
            .otherwise((F.ceil(pos) - pos) * lo + (pos - F.floor(pos)) * hi)
            .alias(f"q{i}")
        )
    return brackets.select(*outs)


@register("feature_quantile_bins", oracle=_QBIN_ORACLE, tags=("layout", "llm-pipeline"))
def q_feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile discretization (feature binning) from GLOBAL cutpoints
    — the ML-preprocessing step QuantileDiscretizer approximates, done
    exactly and without a global sort.

    Pass 1 computes the three exact quartiles of integer cents
    distributively (``_exact_quantiles_from_histogram``: histogram +
    two-phase cumulative counts + closed-form interpolation — replaces
    the ``percentile`` aggregate, whose merge holds every distinct
    value in ONE task; round 12, guide §2.6/§5). Pass 2 broadcasts the
    1-row cutpoint plan into a map-side CASE and re-aggregates per
    bin. Cutpoints interpolate between *integers* at quarter
    fractions, which doubles represent exactly, so the two-product
    interpolation agrees bit-for-bit across engines — the reason the
    bin edges are hash-stable cross-engine. At scale: two scans, no
    global sort, no single-task stage, no driver data path; NTILE over
    an un-partitioned window — the naive form — would funnel the table
    through one task."""
    cents = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    cuts = _exact_quantiles_from_histogram(cents, [0.25, 0.50, 0.75]).select(
        F.col("q1"), F.col("q2"), F.col("q3")
    )
    binned = cents.crossJoin(F.broadcast(cuts)).select(
        "c",
        F.when(F.col("c") <= F.col("q1"), 0)
        .when(F.col("c") <= F.col("q2"), 1)
        .when(F.col("c") <= F.col("q3"), 2)
        .otherwise(3)
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("total_cents"),
        F.min("c").alias("c_min"),
        F.max("c").alias("c_max"),
    )


# --------------------------------------------- bucketed interval join

_WIN_MIN = 30  # interval length (minutes)
_BUCKET_US = _WIN_MIN * 60 * 1_000_000

_INTERVAL_ORACLE = f"""
SELECT p.event_id AS p_id,
       count(*) AS n_follow,
       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS follow_cents
FROM events p
JOIN events e
  ON e.ts > p.ts
 AND e.ts <= p.ts + INTERVAL {_WIN_MIN} MINUTE
 AND e.event_id != p.event_id
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


@register("interval_bucket_join", oracle=_INTERVAL_ORACLE, tags=("layout", "timeseries"))
def q_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join with NO equi key, made shuffle-joinable:
    activity following each purchase within a 30-minute window, across
    ALL users.

    A purchase's (ts, ts+30min] window spans exactly two fixed 30-min
    time buckets (bucket(ts) and bucket(ts)+1), so exploding each
    interval to those two bucket keys and equi-joining events on their
    single containing bucket finds every overlapping pair exactly once
    — then a residual range filter discards the near-misses. The plan
    is a hash join on bucket instead of the O(n²) broadcast-nested-
    loop a bare range predicate compiles to.

    Scale: shuffle volume O(events + 2·purchases); bucket keys inherit
    the time distribution, so hot buckets (flash-sale minutes) are
    AQE-splittable like any skewed equi-join — none of that exists for
    a nested-loop range join. The money column folds to integer cents
    before summing, so the group aggregate is order-exact."""
    ev = load_table(spark, sf_dir, "events")

    def bucket(ts):
        # exact integer floor-division: subtract the remainder first so
        # the double division is by-construction exact (no boundary-
        # adjacent float rounding)
        um = F.unix_micros(ts)
        return ((um - F.pmod(um, F.lit(_BUCKET_US))) / F.lit(_BUCKET_US)).cast("long")

    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.explode(
            F.array(bucket(F.col("ts")), bucket(F.col("ts")) + 1)
        ).alias("bucket"),
    )
    points = ev.select(
        F.col("event_id").alias("e_id"),
        F.col("ts").alias("e_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        bucket(F.col("ts")).alias("bucket"),
    )
    pairs = purchases.join(points, "bucket").filter(
        (F.col("e_ts") > F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {_WIN_MIN} MINUTES"))
        & (F.col("e_id") != F.col("p_id"))
    )
    return pairs.groupBy("p_id").agg(
        F.count("*").alias("n_follow"),
        F.sum("cents").alias("follow_cents"),
    )


# ---------------------------------------------- codec tradeoff probe

_CODEC_ORACLE = """
SELECT codec, CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
       TRUE AS bytes_positive, TRUE AS roundtrip_exact
FROM (SELECT unnest(['snappy', 'zstd']) AS codec)
ORDER BY codec
"""


def _register_codec_probe():
    import os
    import shutil
    import tempfile

    @register("layout_codec_tradeoff", oracle=_CODEC_ORACLE, tags=("layout",))
    def q_layout_codec_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Compression-codec tradeoff probe: the same table written
        with snappy (decode-speed default) and zstd (ratio). At 100 TB
        the codec choice IS a top-line cost lever — zstd commonly cuts
        cold-storage and scan-I/O bytes 20-40% over snappy for the CPU
        price of heavier encode — and because the footprint numbers are
        machine-local facts, the oracle-checked row carries the
        engine-portable invariants (row count preserved per codec,
        nonzero bytes, bit-exact roundtrip) while the measured sizes
        ship in the bytes columns for the probe's own log (excluded
        from the value hash by being deterministic only per filesystem:
        they are NOT emitted; see SCALE.md for a recorded run)."""
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_returnflag"
        )

        def sig(df):
            # order-insensitive multiset signature: one agg pass, no
            # exceptAll double-shuffle
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(*))").alias("h"),
            ).collect()[0]
            return (r["n"], r["h"])

        src_sig = sig(li)
        tmp = tempfile.mkdtemp(prefix="codec_probe_")

        def probe(codec):
            # guide §2.6: the two codec probes are independent
            # write->read->agg job chains; submitted from two driver
            # threads they back-fill each other's stage tails instead
            # of running strictly one after the other (actions are only
            # sequential because driver code calls them sequentially).
            path = os.path.join(tmp, codec)
            li.write.mode("overwrite").option("compression", codec).parquet(path)
            back_sig = sig(spark.read.parquet(path))
            nbytes = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
            return (codec, back_sig[0], nbytes > 0, back_sig == src_sig)

        from concurrent.futures import ThreadPoolExecutor

        try:
            with ThreadPoolExecutor(max_workers=2) as pool:
                out = list(pool.map(probe, ("snappy", "zstd")))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return spark.createDataFrame(
            out, "codec string, n_rows long, bytes_positive boolean, roundtrip_exact boolean"
        ).orderBy("codec")


_register_codec_probe()


# --------------------------------------------- small-file compaction plan

_COMPACT_TARGET = 16_384  # target output-file bytes (chars stand in)

_COMPACT_ORACLE = f"""
WITH files AS (
  SELECT source, lang, CAST(sum(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY source, lang
),
seq AS (
  SELECT source, lang, bytes,
         row_number() OVER (ORDER BY source, lang) AS file_seq,
         sum(bytes) OVER (ORDER BY source, lang
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_bytes
  FROM files
)
SELECT source, lang, bytes,
       CAST(file_seq AS BIGINT) AS file_seq,
       CAST(floor((cum_bytes - bytes) / {_COMPACT_TARGET}.0) AS BIGINT) AS out_group
FROM seq
"""


@register("layout_compaction_plan", oracle=_COMPACT_ORACLE, tags=("layout",))
def q_layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: assign every input file to a
    target-sized output group by running-byte boundary — the OPTIMIZE /
    auto-compaction primitive every lakehouse table needs once
    streaming or per-partition writers have fragmented it into
    thousands of undersized files. A file opens the group its
    cumulative start offset falls in (the same streaming coalesce rule
    Spark's own file-scan packing uses), so groups are contiguous in
    the deterministic (source, lang) order and each lands within one
    file of the target size.

    Input files are modeled as the per-(source, lang) document groups
    with byte size = sum(n_chars) — the planner's logic only sees
    (name, bytes) pairs, exactly what a real manifest listing gives.
    The running offset comes from the TWO-PHASE ``global_cumsum``
    (range exchange + broadcast prefix offsets), so planning 10M files
    never funnels the manifest through one task — the naive
    single-partition cumsum window is precisely what this module
    exists to replace. Output: file identity, bytes, global sequence
    number, and assigned output group."""
    docs = load_table(spark, sf_dir, "documents")
    files = docs.groupBy("source", "lang").agg(F.sum("n_chars").alias("bytes"))
    seq = global_cumsum(
        files, [F.col("source"), F.col("lang")], "bytes", "file_seq", "cum_bytes"
    )
    return seq.select(
        "source",
        "lang",
        "bytes",
        "file_seq",
        F.floor((F.col("cum_bytes") - F.col("bytes")) / float(_COMPACT_TARGET)).alias(
            "out_group"
        ),
    )
