"""Window-function operators: ranking, top-n-per-group, running totals,
lag/lead deltas, explicit frames.

Absent from the reference (SURVEY.md §2.2). Every window here has a
total order within its partition (business key as tie-break) so results
are deterministic and hash-comparable.

Scale: a window = one exchange on partitionBy keys + an in-partition
sort. partitionBy(o_custkey) distributes; the thing to avoid at 100 TB
is an un-partitioned window (single task) — none here. Running sums use
DECIMAL(12,2) inputs (functions/exact.py) so frame evaluation order
can't perturb values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreducegcp_spark.functions.exact import dec2
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

_TOPN_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("window_topn_per_customer", oracle=_TOPN_ORACLE, tags=("relational",))
def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — row_number + filter, the scalable
    top-n-per-group idiom (no collect, no per-group sort spill beyond
    the partition sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


_RANK_ORACLE = """
SELECT o_orderpriority, o_orderkey,
       RANK()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus, o_orderkey)     AS drnk,
       NTILE(4)     OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)      AS quartile
FROM orders
"""


@register("window_ranks", oracle=_RANK_ORACLE, tags=("relational",))
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile in one pass over a shared partitioning."""
    orders = load_table(spark, sf_dir, "orders")
    by_prio = Window.partitionBy("o_orderpriority")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank()
        .over(by_prio.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
        .alias("rnk"),
        F.dense_rank()
        .over(by_prio.orderBy(F.col("o_orderstatus"), F.col("o_orderkey")))
        .alias("drnk"),
        F.ntile(4)
        .over(by_prio.orderBy(F.col("o_totalprice"), F.col("o_orderkey")))
        .alias("quartile"),
    )


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
       LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders
"""


@register("window_running_total", oracle=_RUNNING_ORACLE, tags=("relational",))
def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend + lag/lead. Explicit ROWS frame (the
    default RANGE frame differs under ties); DECIMAL running sum so the
    incremental evaluation order is value-irrelevant."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec2("o_totalprice")).over(frame).cast("double").alias("running_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


_MOVING_ORACLE = """
SELECT user_id, event_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_value,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame
FROM events
"""


@register("window_moving_frame", oracle=_MOVING_ORACLE, tags=("relational",))
def q_window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (ROWS 2 PRECEDING) — per-user trailing-3
    aggregate over the event stream, the batch twin of the streaming
    sliding window."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(dec2("value")).over(w).cast("double").alias("moving_value"),
        F.count("*").over(w).alias("n_in_frame"),
    )


_SHARE_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice /
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (PARTITION BY l_orderkey)
            AS DOUBLE) AS price_share
FROM lineitem
"""


@register("window_share_of_group", oracle=_SHARE_ORACLE, tags=("relational",))
def q_window_share_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-group-total via an unordered window over the whole
    partition — normalization without a self-join. The group total is
    an exact decimal sum cast to double, then one IEEE division —
    bit-stable (decimal/decimal division is avoided because Spark and
    DuckDB apply different result-precision rules)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    total = F.sum(dec2("l_extendedprice")).over(w).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / total).alias("price_share"),
    )


_DISTRIBUTION_ORACLE = """
SELECT o_orderpriority, o_orderkey,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cdist,
       first_value(o_orderkey) OVER w AS cheapest_key,
       last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
         ORDER BY o_totalprice, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
         ORDER BY o_totalprice, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register("window_distribution", oracle=_DISTRIBUTION_ORACLE, tags=("relational",))
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / first-last-nth_value over one shared
    partitioning. The distribution functions are exact integer ratios
    ((rank-1)/(n-1), rank/n) — one IEEE division of identical operands
    per row, so doubles hash-match the oracle. last/nth need the
    explicit unbounded frame (the default frame stops at CURRENT ROW).
    Scale: a single hash-partitioned sort per priority group; all five
    functions share it."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).alias("priciest_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
    )


_RANGE_INTERVAL_ORACLE = """
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
         PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_value,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_trailing
FROM events
"""


@register("window_range_interval", oracle=_RANGE_INTERVAL_ORACLE, tags=("relational",))
def q_window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user trailing-1-hour sum/count at
    every event — the value-based frame (all rows within 3600 s of the
    current row's timestamp), versus window_moving_frame's row-count
    frame. The batch twin of the streaming sliding window, but anchored
    at each event rather than at aligned window boundaries.

    Cross-engine contract: both engines order by epoch seconds
    (Spark's timestamp->long cast truncates; the oracle floors
    DuckDB's fractional epoch()), so frame membership is identical —
    and because RANGE frames include all peers of the current second,
    the result is deterministic even where timestamps collide. Scale:
    one user_id exchange + in-partition sort, same as every window
    here; frame evaluation is the engine's sliding-sum, not O(n^2)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec2("value")).over(w).cast("double").alias("trailing_value"),
        F.count("*").over(w).alias("n_trailing"),
    )


# --------------------------------------- running distinct count per key

_CUMDISTINCT_ORACLE = """
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id
              ) = 1 THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(first_seen) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_types_so_far
FROM flagged
"""


@register("window_cumulative_distinct", oracle=_CUMDISTINCT_ORACLE, tags=("relational",))
def q_window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) per user over event time — the window
    SQL cannot express directly (DISTINCT is illegal in a running
    frame) and engines answer with the classic two-window
    decomposition: flag each (user, type)'s FIRST occurrence with a
    row_number, then a running sum of flags over the user's timeline.
    Exact, streaming-friendly (both windows are append-order), and
    the per-row state is one bit — vs the naive collect_set-per-frame,
    whose state and comparison cost grow with the distinct count.

    Scale: two exchanges — hash(user, type) for the first-seen flag,
    hash(user) for the running sum (the rollup any per-user timeline
    analysis pays); both sorts are in-partition. Ties break on
    event_id so every row's running value is total-order deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    return (
        ev.select("event_id", "user_id", "ts", "event_type")
        .withColumn("first_seen", first_seen)
        .select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(w_run).alias("distinct_types_so_far"),
        )
    )
