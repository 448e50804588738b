"""Time-series operators Spark lacks as built-ins: as-of join and
gap-based sessionization.

The reference has no temporal operators at all (SURVEY.md §2.2 — its
only dataflow is run_mapred, Master/Master.py:61-94); these are
engine-side additions in the hypertable/TimescaleDB tradition, built
as compositions of existing DataFrame ops (SURVEY.md §7 custom-operator
policy: composition first, applyInPandas only if semantics demand it).

Both operators shuffle ONCE on user_id and then run ordered window
functions inside each partition — the scalable shape for 100 TB event
data, where a naive range join (events × events within gap) explodes
quadratically on hot keys. The DuckDB oracles use native ASOF JOIN /
window SQL, pinning semantics against an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreducegcp_spark.functions.exact import dec2, dsum, o_dec2, o_dsum
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

# ------------------------------------------------------------- as-of join

_ASOF_ORACLE = """
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(c.ts) AS last_click_us,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("asof_join_last_click", oracle=_ASOF_ORACLE, tags=("timeseries",))
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent click at or
    before it by the same user (NULL if none) — the canonical
    trade-vs-quote temporal join.

    Implementation: tag clicks 0 / purchases 1, union, and take
    ``last(click_ts, ignorenulls)`` over a (user_id) window ordered by
    (ts, tag, event_id) — clicks sort before purchases at equal ts,
    giving the ASOF's inclusive ``>=`` bound. One user_id shuffle, one
    in-partition sort, zero joins: at 100 TB this is the merge-scan
    plan an ASOF-native engine would pick, with no risk of the
    quadratic blowup a range self-join has on hot users. Timestamps
    compare as exact microsecond longs in both engines."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("tag"),
        F.unix_micros("ts").alias("click_us"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_us"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "last_click_us", F.last("click_us", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "last_click_us",
        (F.unix_micros("ts") - F.col("last_click_us")).alias("gap_us"),
    )


# --------------------------------------------------------- sessionization

_GAP_MIN = 60

_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL {_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, event_id,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) AS end_us,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM numbered
GROUP BY user_id, session_id
"""


@register("sessionize_events", oracle=_SESSION_ORACLE, tags=("timeseries",))
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle for more than {gap} minutes; emit per-session event count,
    bounds, and duration — the batch twin of the streaming
    session_window operator (streaming/events.py).

    Implementation: lag + running-sum-of-boundaries over one (user_id)
    window — the standard decomposition. The follow-up per-session
    rollup groups on (user_id, session_id), a superset of the window's
    partition key, so Catalyst reuses the same user_id exchange:
    one shuffle total, no matter the data size. Session numbering is
    deterministic under ties via the (ts, event_id) total order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _GAP_MIN * 60 * 1_000_000
    lag_us = F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        lag_us.isNull() | (F.unix_micros("ts") - lag_us > gap_us), 1
    ).otherwise(0)
    numbered = ev.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


_NATIVE_SESSION_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL {_GAP_MIN} MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) AS start_us,
       epoch_us(max(ts)) + {_GAP_MIN * 60 * 1_000_000} AS end_us,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


@register(
    "sessionize_native_window", oracle=_NATIVE_SESSION_ORACLE, tags=("timeseries",)
)
def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window aggregate —
    same semantics as the lag/running-sum decomposition above, one
    operator instead of three: groupBy(user_id, session_window(ts,
    gap)) merges overlapping [ts, ts+gap) intervals in a single
    pass (internally: partial session merge map-side, final merge
    after one user_id exchange — the same single-shuffle shape, with
    the merge logic in the engine instead of the query).

    Two semantic deltas vs the manual version, mirrored in the
    oracle: the native window's END is last_event + gap (the manual
    one reports last event), and an event exactly gap after its
    predecessor starts a NEW session (native end-exclusive >= vs the
    manual strict >). Both variants ship because the decomposition is
    the portable form (ANSI window functions) while session_window is
    the engine-native form the streaming path (stream_session_windows)
    shares."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{_GAP_MIN} minutes").alias("sw")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("start_us"),
            F.unix_micros("sw.end").alias("end_us"),
            "n_events",
        )
    )


# -------------------------------------------------- calendar gap fill

_GAP_FILL_ORACLE = """
WITH spine AS (
  SELECT CAST(d AS TIMESTAMP) AS day
  FROM generate_series(DATE '1997-01-01', DATE '1997-03-31', INTERVAL 1 DAY) t(d)
),
daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1
)
SELECT s.day, coalesce(d.revenue, 0.0) AS revenue,
       coalesce(d.n_lines, 0) AS n_lines
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""


@register("calendar_gap_fill", oracle=_GAP_FILL_ORACLE, tags=("timeseries",))
def q_calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap fill: daily revenue for a quarter with zero rows
    for days that had no shipments — the densification step before any
    moving-average or forecasting pass (a day missing from the data is
    a 0, not a gap, once a spine is joined).

    The spine is ``sequence(start, stop, interval 1 day)`` exploded —
    generated at the driver-free expression level, 90 rows, broadcast
    to the left join. Spark's idiomatic spine needs no recursion (vs
    the recursive-CTE spine older engines use); the daily rollup is
    one date-keyed shuffle with pushed-down scan bounds."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    from mapreducegcp_spark.functions.exact import dec2

    daily = (
        li.groupBy(F.date_trunc("day", "l_shipdate").alias("day"))
        .agg(
            F.sum(dec2("l_extendedprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("timestamp"),
                F.lit("1997-03-31").cast("timestamp"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
    )


# ------------------------------------------- CDC latest-state compaction

_CDC_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts_us, event_type, value
FROM ranked WHERE rn = 1
"""


@register("cdc_latest_snapshot", oracle=_CDC_ORACLE, tags=("timeseries",))
def q_cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log compaction: collapse an event stream to the latest
    row per key — the materialize step of every CDC / upsert pipeline
    (and what a log-structured table's read path does on the fly).

    Implementation: ``max(struct(ts_us, event_id, payload...))`` per
    key, NOT a row_number window. Struct max compares field-by-field,
    so it is argmax over the (ts, event_id) total order with the
    payload riding along — and because it is an *aggregate*, Spark
    runs a map-side partial pass first: each input partition reduces
    to at most one row per key before the exchange. At 100 TB of
    change log with a bounded key space, the shuffle moves O(keys)
    rows instead of the window plan's O(rows) full sort. The oracle
    pins identical semantics with an independent row_number plan."""
    ev = load_table(spark, sf_dir, "events")
    latest = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.struct(
                    F.unix_micros("ts").alias("ts_us"),
                    F.col("event_id"),
                    F.col("event_type"),
                    F.col("value"),
                )
            ).alias("s")
        )
    )
    return latest.select(
        "user_id",
        F.col("s.event_id").alias("event_id"),
        F.col("s.ts_us").alias("ts_us"),
        F.col("s.event_type").alias("event_type"),
        F.col("s.value").alias("value"),
    )


# ---------------------------------------------------- SCD2 intervalization

_SCD2_ORACLE = """
SELECT user_id,
       epoch_us(ts) AS valid_from_us,
       epoch_us(lead(ts) OVER w) AS valid_to_us,
       value,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("scd2_intervals", oracle=_SCD2_ORACLE, tags=("timeseries",))
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervalization: each
    purchase is a dimension update; emit ``[valid_from, valid_to)``
    rows where ``valid_to`` is the next update's timestamp (open-ended
    for the current row). The output joins back to fact tables with
    the band predicate ``fact.ts >= valid_from AND (valid_to IS NULL
    OR fact.ts < valid_to)`` — the standard temporal-dimension shape.

    One user_id shuffle + in-partition sort, then ``lead`` — no
    self-join, so no quadratic blowup on hot keys. Filter on
    event_type reaches the parquet scan before the exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.unix_micros("ts").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to_us"),
        "value",
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


# -------------------------------------------------------- funnel analysis

_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
),
staged AS (
  SELECT user_id,
         (t_view IS NOT NULL) AS s1,
         (t_view IS NOT NULL AND t_click > t_view) AS s2,
         (t_view IS NOT NULL AND t_click > t_view
          AND t_purchase > t_click) AS s3
  FROM firsts
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
       CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
       CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS reached_purchase,
       CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS DOUBLE)
         / sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS view_to_click,
       CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS DOUBLE)
         / sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS click_to_purchase
FROM staged
"""


@register("funnel_view_click_purchase", oracle=_FUNNEL_ORACLE, tags=("timeseries",))
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: a user reaches stage N when their
    first stage-N event happens strictly after their first stage-(N-1)
    event — view -> click -> purchase, with per-step conversion rates.

    One conditional-min aggregation per user (map-side partial: each
    input partition reduces to <= 1 row per user before the exchange),
    then a single global rollup — no self-joins, no window sort. The
    strictly-after semantics use NULL-safe comparisons: a missing
    earlier stage makes every later comparison NULL, i.e. not
    reached, in both engines identically."""
    ev = load_table(spark, sf_dir, "events")

    def first_ts(etype: str) -> Column:
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_click"))
    staged = firsts.select(
        s1.alias("s1"),
        F.coalesce(s2, F.lit(False)).alias("s2"),
        F.coalesce(s3, F.lit(False)).alias("s3"),
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return staged.agg(
        F.count("*").alias("n_users"),
        cnt("s1").alias("reached_view"),
        cnt("s2").alias("reached_click"),
        cnt("s3").alias("reached_purchase"),
        (cnt("s2").cast("double") / cnt("s1")).alias("view_to_click"),
        (cnt("s3").cast("double") / cnt("s2")).alias("click_to_purchase"),
    )


# -------------------------------------------------- time-weighted average

_TWA_ORACLE = """
WITH stepped AS (
  SELECT user_id, value,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dt_us,
         (epoch_us(lead(ts) OVER w) - epoch_us(ts)) // 1000 AS dt_ms
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(dt_us) AS BIGINT) AS span_us,
       CAST(sum(CAST(value AS DECIMAL(12,2)) * dt_ms) AS DOUBLE)
         / CAST(sum(dt_ms) AS DOUBLE) AS twa_value
FROM stepped
WHERE dt_us IS NOT NULL
GROUP BY user_id
"""


@register("time_weighted_avg", oracle=_TWA_ORACLE, tags=("timeseries",))
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average in the hypertable tradition: each
    observation holds (last-observation-carried-forward) until the
    next one, so its weight is the interval length, not 1 — the right
    mean for irregularly sampled gauges, where a plain AVG over-weights
    bursts.

    One user_id shuffle: lead() inside the window partition computes
    interval lengths, and the per-user rollup groups on the window's
    own partition key, so Catalyst reuses the exchange. The weighted
    sum runs in the exact decimal domain (value lifts to DECIMAL(12,2),
    weights are integer microseconds) with ONE final cast to double —
    order-independent, so the value-hash survives any partitioning
    (functions/exact.py convention)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    # Weights are integer MILLIseconds (floor-div, identical in both
    # engines): with microsecond weights the scaled decimal sum can
    # exceed 2^53, where Spark's and DuckDB's decimal->double casts
    # can disagree by 1 ulp. ms weights keep every sum exactly
    # representable through sf10 while span_us stays exact.
    dt_ms = F.expr("dt_us div 1000")
    return stepped.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("dt_us").alias("span_us"),
        (
            F.sum(dec2("value") * dt_ms).cast("double")
            / F.sum(dt_ms).cast("double")
        ).alias("twa_value"),
    )


# ------------------------------------------------------- cohort retention

_COHORT_ORACLE = """
WITH m AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym
  FROM orders
),
cohorts AS (
  SELECT o_custkey, min(ym) AS cohort_ym FROM m GROUP BY o_custkey
)
SELECT c.cohort_ym,
       m.ym - c.cohort_ym AS month_offset,
       count(DISTINCT m.o_custkey) AS n_customers
FROM m JOIN cohorts c USING (o_custkey)
GROUP BY c.cohort_ym, month_offset
"""


@register("cohort_retention", oracle=_COHORT_ORACLE, tags=("timeseries",))
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by the month of
    their first order, counted in every subsequent month they return —
    the analysis behind every retention curve.

    Month keys are exact integers (year*12 + month: no interval or
    months_between semantics to disagree on across engines). Two
    shuffles, both on o_custkey: the cohort min (map-side partial)
    and the join back, after which the (cohort, offset) distinct-count
    re-aggregates. At 100 TB the cohort table is customer-sized —
    orders of magnitude under the fact table — and joins back hashed
    on the same key the min used, so AQE reuses the exchange layout."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
    )
    cohorts = m.groupBy("o_custkey").agg(F.min("ym").alias("cohort_ym"))
    return (
        m.join(cohorts, "o_custkey")
        .groupBy("cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("month_offset"))
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


# ---------------------------------------------------- event-type transitions

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
"""


@register("event_transitions", oracle=_TRANSITIONS_ORACLE, tags=("timeseries",))
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: how often each event
    type follows each other type within a user's ordered stream — the
    input to Markov-chain session models and next-action features.

    One user_id shuffle for the lag window; the (prev, next) rollup is
    a 25-cell aggregate with map-side combine. Deterministic under
    ties via the (ts, event_id) total order."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


# ------------------------------------------------------ OHLC downsampling

_OHLC_ORACLE = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bar, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bar,
       CAST(count(*) AS BIGINT) AS n_events,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close
FROM b
GROUP BY event_type, bar
"""


@register("timeseries_ohlc_downsample", oracle=_OHLC_ORACLE, tags=("timeseries",))
def q_timeseries_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per series — the canonical tick-to-bar
    downsample of a market-data/metrics engine.

    One groupBy over (series, hour): high/low are plain min/max;
    open/close are ``min_by``/``max_by`` against the (ts, event_id)
    struct — first/last VALUE by event time with a deterministic
    event_id tiebreak, no window pass and no self-join, so the whole
    bar table is a single Exchange with map-side partials. At 100 TB
    this is the continuous-aggregate build (agg_time_rollup's shape)
    with order-statistic columns; the oracle derives open/close
    independently via row_number windows, pinning the tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bar"))
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
        )
    )


# ------------------------------------------------- nearest as-of (tolerance)

_NEAREST_TOL_US = 30 * 60 * 1_000_000  # ±30 min

_ASOF_NEAREST_ORACLE = f"""
WITH merged AS (
  SELECT user_id, ts, 0 AS tag, epoch_us(ts) AS click_us,
         NULL::BIGINT AS event_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1, NULL, event_id
  FROM events WHERE event_type = 'purchase'
),
w AS (
  SELECT *,
    last_value(click_us IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, tag, event_id NULLS FIRST
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_us,
    first_value(click_us IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, tag, event_id NULLS FIRST
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_us
  FROM merged
),
sel AS (
  SELECT event_id, user_id, epoch_us(ts) AS purchase_us,
         CASE WHEN prev_us IS NOT NULL
                   AND (next_us IS NULL
                        OR epoch_us(ts) - prev_us <= next_us - epoch_us(ts))
              THEN prev_us ELSE next_us END AS near_us
  FROM w WHERE tag = 1
)
SELECT event_id, user_id, purchase_us,
       CASE WHEN near_us IS NOT NULL
                 AND abs(purchase_us - near_us) <= {_NEAREST_TOL_US}
            THEN near_us END AS nearest_click_us,
       CASE WHEN near_us IS NOT NULL
                 AND abs(purchase_us - near_us) <= {_NEAREST_TOL_US}
            THEN abs(purchase_us - near_us) END AS dt_us
FROM sel
"""


@register("asof_join_nearest", oracle=_ASOF_NEAREST_ORACLE, tags=("timeseries",))
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-match as-of join with tolerance: for every purchase, the
    click by the same user closest in time — either direction — if
    within ±30 min; ties (equidistant before/after) take the earlier.

    Same merge-scan shape as asof_join_last_click, but BOTH directions
    come from one union + one user_id shuffle: a backward-looking
    ``last(ignorenulls)`` and a forward-looking ``first(ignorenulls)``
    over the SAME window partitioning (Catalyst reuses the Exchange
    and sort), then a pure projection picks the nearer side. Still
    zero joins and no quadratic hot-user risk — the pandas
    ``merge_asof(direction='nearest', tolerance=...)`` semantics at
    cluster scale. Clicks at the exact purchase timestamp sort before
    the purchase (tag ordering), so dt=0 resolves via the backward arm."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.unix_micros("ts").alias("click_us"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_us"),
        "event_id",
    )
    order = [F.col("ts").asc(), F.col("tag").asc(), F.col("event_id").asc_nulls_first()]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        clicks.unionByName(purchases)
        .withColumn("prev_us", F.last("click_us", ignorenulls=True).over(wb))
        .withColumn("next_us", F.first("click_us", ignorenulls=True).over(wf))
    )
    p_us = F.unix_micros("ts")
    near = F.when(
        F.col("prev_us").isNotNull()
        & (F.col("next_us").isNull() | (p_us - F.col("prev_us") <= F.col("next_us") - p_us)),
        F.col("prev_us"),
    ).otherwise(F.col("next_us"))
    in_tol = near.isNotNull() & (F.abs(p_us - near) <= F.lit(_NEAREST_TOL_US))
    return merged.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        p_us.alias("purchase_us"),
        F.when(in_tol, near).alias("nearest_click_us"),
        F.when(in_tol, F.abs(p_us - near)).alias("dt_us"),
    )


# ------------------------------------------------- gaps & islands (runs)

_ISLANDS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
       - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
         AS grp
  FROM events
)
SELECT user_id, event_type, grp,
       CAST(count(*) AS BIGINT) AS run_len,
       CAST(min(epoch_us(ts)) AS BIGINT) AS start_us,
       CAST(max(epoch_us(ts)) AS BIGINT) AS end_us
FROM seq
GROUP BY user_id, event_type, grp
"""


@register("events_run_length_islands", oracle=_ISLANDS_ORACLE, tags=("timeseries",))
def q_events_run_length_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user (the Tabibitosan difference-of-row_numbers trick) — the
    behavioural run-length encoding behind streak features ("n views
    in a row before the purchase") that lag/transition operators
    don't give directly.

    Both row_numbers share the user_id partitioning, so the whole
    query is ONE Exchange: window pass (two rank functions, one sort
    covers both since the per-type numbering is a subsequence of the
    per-user order), then a groupBy that reuses the same hash
    partitioning. The group id is a derived integer — deterministic
    given the (ts, event_id) total order, so it hash-matches across
    engines and across any physical partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    return seq.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("run_len"),
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
    )


# ------------------------------------------------- top path trigrams

_PATHS_TOPK = 20

_PATHS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT e1, e2, e3, n_paths
FROM (
  SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths,
         row_number() OVER (ORDER BY count(*) DESC, e1, e2, e3) AS rnk
  FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
  GROUP BY e1, e2, e3
)
WHERE rnk <= {_PATHS_TOPK}
"""


@register("event_path_trigrams", oracle=_PATHS_ORACLE, tags=("timeseries",))
def q_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioural paths (the Sankey/user-flow query):
    sliding window of three consecutive events per user, global
    frequency top-20 (_PATHS_TOPK) with a deterministic tiebreak —
    sequence mining one step beyond event_transitions' pairs.

    One user_id exchange for the double-lead window (both leads share
    the sort), map-side partial counts into a tiny (|types|^3 max)
    rollup, TakeOrdered for the top-k — no joins at all. Path length
    generalizes by adding leads, not stages."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    counts = seq.groupBy("e1", "e2", "e3").agg(F.count("*").alias("n_paths"))
    # total ordering -> orderBy+limit plans as TakeOrderedAndProject
    # (map-side partial top-k), not a single-partition sort window
    return counts.orderBy(
        F.col("n_paths").desc(), "e1", "e2", "e3"
    ).limit(_PATHS_TOPK)


# ------------------------------------------------------ exact EWMA fold

_EWMA_ALPHA = 0.125  # 1/8 — exactly representable in binary

_EWMA_ORACLE = """
WITH s AS (
  SELECT user_id,
         list(value ORDER BY ts, event_id) AS vs,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
  FROM events
  GROUP BY user_id
)
SELECT user_id, n_events, last_us,
       list_reduce(vs, (acc, x) -> 0.125 * x + 0.875 * acc) AS ewma
FROM s
"""


@register("events_ewma_fold", oracle=_EWMA_ORACLE, tags=("timeseries",))
def q_events_ewma_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (alpha = 1/8,
    seeded with the first observation) — the smoothing state a metrics
    engine keeps per series, computed EXACTLY: the recurrence
    ewma = a*x + (1-a)*ewma is a strict left fold over the
    (ts, event_id)-ordered history, and both engines execute the
    identical multiply-add sequence in double (alpha is a binary
    power, no transcendentals), so even this inherently sequential
    statistic value-hash-matches.

    Shape: one user_id shuffle into sorted per-key arrays, then the
    fold runs inside a single codegen'd expression per row. A key's
    history must fit a task (bounded series — fine for per-user
    streams; unbounded series chunk by time with carried seeds, which
    is exactly the streaming applyInPandasWithState form in
    streaming/events.py's user-stats pattern)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias("h"),
        F.count("*").alias("n_events"),
        F.max(F.unix_micros("ts")).alias("last_us"),
    )
    first = F.element_at("h", 1)["value"]
    tail = F.expr("slice(h, 2, size(h) - 1)")
    ewma = F.aggregate(
        tail,
        first,
        lambda acc, x: F.lit(_EWMA_ALPHA) * x["value"] + F.lit(1 - _EWMA_ALPHA) * acc,
    )
    return s.select("user_id", "n_events", "last_us", ewma.alias("ewma"))


# ---------------------------------------------- interval backlog sweep

_BACKLOG_ORACLE = """
WITH spans AS (
  SELECT o.o_orderkey, o.o_orderdate AS opened,
         max(l.l_shipdate) AS closed
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
  SELECT opened AS day, 1 AS d FROM spans
  UNION ALL
  SELECT closed + INTERVAL 1 DAY, -1 FROM spans
),
daily AS (SELECT day, sum(d) AS delta FROM deltas GROUP BY day)
SELECT day,
       CAST(sum(delta) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_orders
FROM daily
"""


@register("orders_open_backlog_sweep", oracle=_BACKLOG_ORACLE, tags=("timeseries",))
def q_orders_open_backlog_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog by sweep-line difference array: each
    order contributes +1 on its open date and -1 the day after its
    last shipment; the running sum over the day axis IS the
    point-in-time open count for every day at once.

    This is the scalable replacement for the interval-stabbing join
    (calendar × orders WHERE day BETWEEN opened AND closed — O(days ×
    orders) rows before filtering): deltas are O(2 × orders), the
    rollup is O(distinct days), and the single ordered running sum is
    one small window. The span derivation (max shipdate per order) is
    the only real shuffle; everything after is calendar-sized."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("closed"))
    )
    deltas = spans.select(
        F.col("o_orderdate").alias("day"), F.lit(1).alias("d")
    ).unionByName(
        spans.select(F.date_add("closed", 1).alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(F.sum("d").alias("delta"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select("day", F.sum("delta").over(w).cast("long").alias("open_orders"))


# ------------------------- sequence pattern matching (MATCH_RECOGNIZE)

_SEQ_PATTERN = "v+c+p"  # views, then clicks, then a purchase — consecutive

_SEQ_ORACLE = f"""
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
  FROM events
  GROUP BY user_id
)
SELECT user_id,
       CAST(length(journey) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(journey, '{_SEQ_PATTERN}')) AS BIGINT) AS n_funnels
FROM j
WHERE len(regexp_extract_all(journey, '{_SEQ_PATTERN}')) >= 1
"""


@register("events_pattern_match", oracle=_SEQ_ORACLE, tags=("timeseries",))
def q_events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern matching, which Spark lacks
    natively: encode each user's (ts, event_id)-ordered event types as
    a one-char-per-event journey string, then count CONSECUTIVE
    view+ click+ purchase runs with a regex — stricter than the
    anything-in-between funnel (funnel_view_click_purchase), which
    this complements: a 'vcsvp' user funnels there but not here.

    Both engines use greedy non-overlapping regex scanning, so match
    counts agree exactly; the struct array_sort gives a deterministic
    total order under ts ties. Scale shape: one groupBy(user) whose
    state is the user's OWN journey (bounded by per-user activity, the
    same bound sessionization carries); the regex runs once per user
    on a short string — no joins, no window over the full stream."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.substring("event_type", 1, 1).alias("code")
    )
    j = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "code"))),
                lambda x: x["code"],
            ),
        ).alias("journey")
    )
    n_funnels = F.size(F.regexp_extract_all("journey", F.lit(_SEQ_PATTERN), 0))
    return (
        j.select(
            "user_id",
            F.length("journey").cast("long").alias("n_events"),
            n_funnels.cast("long").alias("n_funnels"),
        )
        .where(F.col("n_funnels") >= 1)
    )


# ------------------------------------------- month-over-month growth

_GROWTH_ORACLE = f"""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
         {o_dsum(o_dec2('o_totalprice'))} AS revenue
  FROM orders GROUP BY 1
)
SELECT cur.ym, cur.revenue,
       (cur.revenue - prev.revenue) / prev.revenue AS mom_growth,
       (cur.revenue - yr.revenue) / yr.revenue AS yoy_growth
FROM m cur
LEFT JOIN m prev ON prev.ym = cur.ym - 1
LEFT JOIN m yr ON yr.ym = cur.ym - 12
"""


@register("timeseries_monthly_growth", oracle=_GROWTH_ORACLE, tags=("timeseries",))
def q_timeseries_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year growth
    — the reporting backbone every BI layer asks an engine for. The
    comparison months come from EXACT-OFFSET window frames on the
    integer month key (range [-1,-1] / [-12,-12]), not lag(): a
    missing calendar month then yields NULL growth instead of silently
    comparing against the wrong (merely previous-present) row — and
    the month keys are exact integers (year*12+month), so there is no
    interval arithmetic for engines to disagree on. Growth fractions
    divide the same decimal-summed doubles in the same order in both
    engines; months with no prior period are NULL (empty frame here,
    unmatched left join in the oracle — same values).

    Scale: the monthly rollup is one map-side-combinable aggregation,
    and the window input is bounded by the CALENDAR (dozens of rows
    regardless of fact size) — not a data-sized sort."""
    orders = load_table(spark, sf_dir, "orders")
    # ONE consumer, ONE pass, no checkpoint: the prev-month / prev-year
    # lookups are exact-offset window frames over the months-sized
    # rollup (rangeBetween(-1,-1) / (-12,-12) on the integer month key
    # — missing calendar months still yield NULL, same as the oracle's
    # keyed left joins). This replaces the earlier self-join shape
    # whose checkpoint had no safe setting: eager fired a job on every
    # plan construction (round-3 ADVICE), lazy let the two broadcast
    # branches race to materialize it and re-run the orders scan (the
    # duplicate block computation fe08e0d recorded). The window input
    # is bounded by the CALENDAR (dozens of months regardless of fact
    # volume), so the unpartitioned frame is the same class as the
    # two-phase helpers' 16-row offset window, not a data-sized sort.
    m = (
        orders.select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym"),
            dec2("o_totalprice").alias("p"),
        )
        .groupBy("ym")
        .agg(dsum(F.col("p")).alias("revenue"))
    )
    w = Window.orderBy("ym")
    prev_rev = F.sum("revenue").over(w.rangeBetween(-1, -1))
    yr_rev = F.sum("revenue").over(w.rangeBetween(-12, -12))
    return m.select(
        "ym",
        "revenue",
        ((F.col("revenue") - prev_rev) / prev_rev).alias("mom_growth"),
        ((F.col("revenue") - yr_rev) / yr_rev).alias("yoy_growth"),
    )


# ------------------------------- Holt linear (double) smoothing

_HOLT_ORACLE = f"""
WITH RECURSIVE m AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
         {o_dsum(o_dec2('o_totalprice'))} AS y
  FROM orders GROUP BY 1
),
mr AS (
  SELECT ym, y, ROW_NUMBER() OVER (ORDER BY ym) AS rn FROM m
),
rec(rn, ym, y, level, trend, forecast) AS (
  SELECT rn, ym, y, y, CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE)
  FROM mr WHERE rn = 1
  UNION ALL
  SELECT t.rn, t.ym, t.y, t.nl,
         0.5 * (t.nl - t.level) + 0.5 * t.trend,
         t.level + t.trend
  FROM (
    SELECT m2.rn, m2.ym, m2.y, r.level, r.trend,
           0.5 * m2.y + 0.5 * (r.level + r.trend) AS nl
    FROM rec r JOIN mr m2 ON m2.rn = r.rn + 1
  ) t
)
SELECT ym, y AS revenue, level, trend, forecast FROM rec
"""


@register("timeseries_holt_smoothing", oracle=_HOLT_ORACLE, tags=("timeseries",))
def q_timeseries_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing over the monthly revenue
    series (alpha = beta = 0.5): per month the smoothed level, the
    trend estimate, and the one-step-ahead forecast the model held
    BEFORE seeing that month — the rolling-forecast baseline every
    demand/capacity plan starts from, and the natural next step after
    timeseries_monthly_growth's raw deltas.

    Determinism: alpha = 0.5 makes every smoothing multiply an exact
    halving (exponent decrement — no rounding), monthly revenue is the
    decimal-exact sum cast once to double, and the recurrence is a
    strict in-order fold over the (bounded, months-cardinality) series
    — Spark folds a sorted struct array in ONE aggregate row, DuckDB
    replays the identical expression tree in a recursive CTE, so
    level/trend/forecast match bit-for-bit.

    Scale shape: the corpus-sized work is the monthly rollup (map-side
    combinable, one shuffle to months-cardinality); the fold itself is
    a single-row higher-order ``aggregate`` over that bounded array —
    the events_ewma_fold/sample_temperature bounded-state pattern.
    State per step is (level, trend) + the output array; at
    century-scale month counts this is still kilobytes."""
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym")
        )
        .agg(dsum(dec2("o_totalprice")).alias("y"))
    )
    row_t = "struct<ym:bigint,revenue:double,level:double,trend:double,forecast:double>"
    acc_t = f"struct<level:double,trend:double,out:array<{row_t}>>"
    folded = m.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("ym", "y"))),
            F.expr(
                f"cast(struct(0.0D, 0.0D, array()) as {acc_t})"
            ),
            lambda acc, x: F.when(
                F.size(acc["out"]) == 0,
                F.struct(
                    x["y"].alias("level"),
                    F.lit(0.0).alias("trend"),
                    F.array(
                        F.struct(
                            x["ym"].alias("ym"),
                            x["y"].alias("revenue"),
                            x["y"].alias("level"),
                            F.lit(0.0).alias("trend"),
                            F.lit(None).cast("double").alias("forecast"),
                        )
                    ).alias("out"),
                ),
            ).otherwise(
                F.struct(
                    (0.5 * x["y"] + 0.5 * (acc["level"] + acc["trend"])).alias(
                        "level"
                    ),
                    (
                        0.5
                        * (
                            (0.5 * x["y"] + 0.5 * (acc["level"] + acc["trend"]))
                            - acc["level"]
                        )
                        + 0.5 * acc["trend"]
                    ).alias("trend"),
                    F.concat(
                        acc["out"],
                        F.array(
                            F.struct(
                                x["ym"].alias("ym"),
                                x["y"].alias("revenue"),
                                (
                                    0.5 * x["y"]
                                    + 0.5 * (acc["level"] + acc["trend"])
                                ).alias("level"),
                                (
                                    0.5
                                    * (
                                        (
                                            0.5 * x["y"]
                                            + 0.5 * (acc["level"] + acc["trend"])
                                        )
                                        - acc["level"]
                                    )
                                    + 0.5 * acc["trend"]
                                ).alias("trend"),
                                (acc["level"] + acc["trend"]).alias("forecast"),
                            )
                        ),
                    ).alias("out"),
                )
            ),
            lambda acc: acc["out"],
        ).alias("series")
    )
    return folded.select(F.explode("series").alias("r")).select(
        "r.ym", "r.revenue", "r.level", "r.trend", "r.forecast"
    )


# --------------------------- shared daily rollup (exact integer units)

# The ONE corpus-sized stage of every daily-series operator below
# (CUSUM, ACF, weekday seasonal, Theil-Sen): value sums lifted to
# exact integer ten-thousandths so the rollup is map-side-combinable
# and engine-portable; day means are a fixed two-step IEEE division.
_DAILY_CTE = """d AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
)"""


def _daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_events, cents) over events — the Spark mirror of
    ``_DAILY_CTE``."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(
            (F.col("value").cast("decimal(18,4)") * 10000).cast("long")
        ).alias("cents"),
    )


# day_mean as the fixed two-step division both engines replay
def _day_mean() -> F.Column:
    return (F.col("cents").cast("double") / 10000) / F.col("n_events")


_DAY_MEAN_SQL = "(CAST(cents AS DOUBLE) / 10000) / n_events"


# ------------------------------- CUSUM changepoint over daily means

_CUSUM_ORACLE = f"""
WITH RECURSIVE {_DAILY_CTE},
dr AS (
  SELECT day, n_events, cents,
         (CAST(cents AS DOUBLE) / 10000) / n_events AS day_mean,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM d
),
g AS (
  SELECT (CAST(sum(cents) AS DOUBLE) / 10000) / sum(n_events) AS gmean
  FROM d
),
rec(rn, day, n_events, day_mean, cusum) AS (
  SELECT dr.rn, dr.day, dr.n_events, dr.day_mean,
         dr.day_mean - g.gmean
  FROM dr CROSS JOIN g WHERE dr.rn = 1
  UNION ALL
  SELECT dr.rn, dr.day, dr.n_events, dr.day_mean,
         r.cusum + (dr.day_mean - g.gmean)
  FROM rec r
  JOIN dr ON dr.rn = r.rn + 1
  CROSS JOIN g
),
peak AS (
  SELECT min(day) AS peak_day FROM rec
  WHERE abs(cusum) = (SELECT max(abs(cusum)) FROM rec)
)
SELECT r.day, r.n_events, r.day_mean, r.cusum,
       (r.day = p.peak_day) AS is_changepoint
FROM rec r CROSS JOIN peak p
"""


@register("events_cusum_changepoint", oracle=_CUSUM_ORACLE, tags=("timeseries",))
def q_events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily event-value series: per
    day the cumulative sum of (day mean - corpus mean), and a flag on
    the day where |CUSUM| peaks — the classic Page-style estimate of
    WHERE a level shift happened. dq_distribution_drift answers "did
    the distribution move between two slices"; this answers "on which
    day did the stream's level break", the question an on-call
    engineer actually asks.

    Determinism composition: day sums are exact DECIMAL(18,4) lifted
    to integer ten-thousandths, means are a fixed two-step IEEE
    division, the CUSUM recurrence is a strict in-order fold over the
    bounded daily series (Spark: one-row higher-order aggregate;
    DuckDB: recursive CTE replaying the identical expression tree),
    and the peak is argmax with a min-day tiebreak — bit-identical end
    to end. Scale: the corpus-sized stage is one map-side-combinable
    daily rollup; everything after is days-cardinality."""
    # `d` feeds BOTH the per-day series and the global mean; Catalyst
    # does not share subtrees, so without the lazy checkpoint the
    # corpus-sized daily rollup would scan events twice — the lazy
    # localCheckpoint materializes it once at the single final action.
    d = _daily_rollup(spark, sf_dir).localCheckpoint(eager=False)
    dr = d.select("day", "n_events", _day_mean().alias("day_mean"))
    g = d.agg(
        ((F.sum("cents").cast("double") / 10000) / F.sum("n_events")).alias(
            "gmean"
        )
    )
    row_t = "struct<day:string,n_events:bigint,day_mean:double,cusum:double>"
    acc_t = f"struct<s:double,out:array<{row_t}>>"
    folded = dr.crossJoin(F.broadcast(g)).agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("day", "n_events", "day_mean", "gmean")
                )
            ),
            F.expr(f"cast(struct(0.0D, array()) as {acc_t})"),
            lambda acc, x: F.struct(
                (acc["s"] + (x["day_mean"] - x["gmean"])).alias("s"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["day"].alias("day"),
                            x["n_events"].alias("n_events"),
                            x["day_mean"].alias("day_mean"),
                            (acc["s"] + (x["day_mean"] - x["gmean"])).alias(
                                "cusum"
                            ),
                        )
                    ),
                ).alias("out"),
            ),
            lambda acc: acc["out"],
        ).alias("series")
    )
    rows = folded.select(F.explode("series").alias("r")).select(
        "r.day", "r.n_events", "r.day_mean", "r.cusum"
    ).localCheckpoint(eager=False)
    maxabs = rows.agg(F.max(F.abs("cusum")).alias("maxabs"))
    peak = (
        rows.crossJoin(F.broadcast(maxabs))
        .where(F.abs(F.col("cusum")) == F.col("maxabs"))
        .agg(F.min("day").alias("peak_day"))
    )
    return rows.crossJoin(F.broadcast(peak)).select(
        "day",
        "n_events",
        "day_mean",
        "cusum",
        (F.col("day") == F.col("peak_day")).alias("is_changepoint"),
    )


# ----------------------- autocorrelation of the daily value series

_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH {_DAILY_CTE},
ser AS (
  SELECT list_transform(
           list_sort(list(struct_pack(day := day, dm := {_DAY_MEAN_SQL}))),
           a -> a.dm) AS xs
  FROM d
),
st AS (
  SELECT xs, len(xs) AS n,
         list_reduce(list_prepend(0.0::DOUBLE, xs), (acc, x) -> acc + x)
           / len(xs) AS m
  FROM ser
),
dev AS (
  SELECT xs, n, m,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(xs, x -> (x - m) * (x - m))),
           (acc, x) -> acc + x) AS den
  FROM st
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n - lag AS BIGINT) AS n_pairs,
       CASE WHEN den > 0 THEN
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(range(1, n - lag + 1),
             i -> (xs[i] - m) * (xs[i + lag] - m))),
           (acc, x) -> acc + x) / den
       ELSE NULL END AS acf
FROM dev, unnest(range(1, {_ACF_MAX_LAG} + 1)) AS t(lag)
WHERE lag < n
"""


@register("timeseries_autocorrelation", oracle=_ACF_ORACLE, tags=("timeseries",))
def q_timeseries_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily mean-value series at lags
    1..{L} — the first question about any metric series ("is
    yesterday predictive of today? is there a weekly echo?") and the
    diagnostic that decides between the EWMA/Holt smoothers and a
    seasonal model. ACF is positional over the observed ordered daily
    series (standard practice; calendar gaps collapse).

    Determinism: the whole series (days-cardinality, calendar-bounded)
    folds in ONE sorted-array higher-order aggregate — mean, variance
    and every lagged covariance are strict in-order left folds with an
    explicit 0.0 init, mirrored by DuckDB ``list_reduce(list_prepend
    (0.0, ...))``, so the doubles are bit-identical. NULL acf (not a
    division blowup) on a constant series. Scale: the corpus-sized
    stage is the one map-side-combinable daily rollup; everything
    after is a single row of bounded arrays."""
    d = _daily_rollup(spark, sf_dir)
    ser = d.select("day", _day_mean().alias("dm")).agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, dm))), a -> a.dm)"
        ).alias("xs")
    )
    st = ser.select(
        "xs",
        F.size("xs").alias("n"),
        (
            F.expr("aggregate(xs, 0.0D, (acc, x) -> acc + x)") / F.size("xs")
        ).alias("m"),
    )
    dev = st.select(
        "xs",
        "n",
        "m",
        F.expr(
            "aggregate(transform(xs, x -> (x - m) * (x - m)), 0.0D,"
            " (acc, x) -> acc + x)"
        ).alias("den"),
    )
    lags = dev.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))).alias("lag")
    ).where(F.col("lag") < F.col("n"))
    num = F.expr(
        "aggregate(transform(sequence(1, n - lag),"
        " i -> (element_at(xs, i) - m) * (element_at(xs, i + lag) - m)),"
        " 0.0D, (acc, x) -> acc + x)"
    )
    return lags.select(
        F.col("lag").cast("long").alias("lag"),
        (F.col("n") - F.col("lag")).cast("long").alias("n_pairs"),
        F.when(F.col("den") > 0, num / F.col("den")).alias("acf"),
    )


q_timeseries_autocorrelation.__doc__ = q_timeseries_autocorrelation.__doc__.format(
    L=_ACF_MAX_LAG
)


# --------------------------- weekday seasonal profile of daily means

_SEASONAL_ORACLE = f"""
WITH {_DAILY_CTE},
dr AS (SELECT day, {_DAY_MEAN_SQL} AS dm FROM d),
g AS (
  SELECT list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(list_sort(list(struct_pack(day := day, dm := dm))),
                          a -> a.dm)), (acc, x) -> acc + x)
           / count(*) AS gmean
  FROM dr
),
wd AS (
  SELECT CAST(dayofweek(CAST(day AS DATE)) AS BIGINT) AS dow,
         CAST(count(*) AS BIGINT) AS n_days,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(list_sort(list(struct_pack(day := day, dm := dm))),
                          a -> a.dm)), (acc, x) -> acc + x)
           / count(*) AS weekday_mean
  FROM dr GROUP BY 1
)
SELECT w.dow, w.n_days, w.weekday_mean, g.gmean AS global_mean,
       w.weekday_mean - g.gmean AS seasonal_index,
       CASE WHEN g.gmean <> 0 THEN w.weekday_mean / g.gmean
            ELSE NULL END AS seasonal_ratio
FROM wd w CROSS JOIN g
"""


def _ordered_mean_fold() -> F.Column:
    # mean of day means as a strict day-ordered left fold (0.0 init),
    # the bit-identical mirror of the oracle's list_reduce/list_prepend
    return F.expr(
        "aggregate(transform(array_sort(collect_list(struct(day, dm))),"
        " a -> a.dm), 0.0D, (acc, x) -> acc + x)"
    ) / F.count("*")


@register("timeseries_weekday_seasonal", oracle=_SEASONAL_ORACLE, tags=("timeseries",))
def q_timeseries_weekday_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal profile of the daily mean-value series: per
    day-of-week (0=Sunday..6, both engines' convention after Spark's
    ``dayofweek - 1``), the mean of that weekday's day-means, its
    additive seasonal index against the global day-mean, and the
    multiplicative ratio — the decomposition behind "traffic is 20%
    low on Sundays", and the seasonal adjustment a forecaster divides
    out before trend-fitting.

    Determinism: both the global and the per-weekday means are strict
    day-ordered folds with explicit 0.0 init (DuckDB mirrors with
    list_reduce over list_prepend); the ratio has an explicit NULL
    guard on a zero global mean. Scale: ONE map-side daily rollup
    (lazily checkpointed — it feeds both the global and the weekday
    branch), then everything is days-cardinality; output rows <= 7."""
    d = _daily_rollup(spark, sf_dir).localCheckpoint(eager=False)
    dr = d.select("day", _day_mean().alias("dm"))
    g = dr.agg(_ordered_mean_fold().alias("gmean"))
    wd = dr.groupBy(
        (F.dayofweek(F.to_date("day")) - 1).cast("long").alias("dow")
    ).agg(
        F.count("*").alias("n_days"),
        _ordered_mean_fold().alias("weekday_mean"),
    )
    return wd.crossJoin(F.broadcast(g)).select(
        "dow",
        "n_days",
        "weekday_mean",
        F.col("gmean").alias("global_mean"),
        (F.col("weekday_mean") - F.col("gmean")).alias("seasonal_index"),
        F.when(
            F.col("gmean") != 0, F.col("weekday_mean") / F.col("gmean")
        ).alias("seasonal_ratio"),
    )


# ------------------------------ Theil-Sen robust trend of daily means

_THEILSEN_ORACLE = f"""
WITH {_DAILY_CTE},
dr AS (
  SELECT {_DAY_MEAN_SQL} AS dm, ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM d
),
slopes AS (
  SELECT CAST(round(1e9 * (b.dm - a.dm) / (b.rn - a.rn)) AS BIGINT) AS s_nano
  FROM dr a JOIN dr b ON b.rn > a.rn
),
sl AS (
  SELECT quantile_cont(s_nano, 0.5) AS slope_nano,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM slopes
)
SELECT CAST(count(*) AS BIGINT) AS n_days, sl.n_pairs, sl.slope_nano,
       quantile_cont(CAST(round(1e9 * dr.dm - sl.slope_nano * dr.rn)
                          AS BIGINT), 0.5) AS icept_nano
FROM dr CROSS JOIN sl
GROUP BY sl.n_pairs, sl.slope_nano
"""


@register("timeseries_theilsen_trend", oracle=_THEILSEN_ORACLE, tags=("timeseries",))
def q_timeseries_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily mean-value series: the
    median of all pairwise slopes (and the median-residual intercept)
    — the estimator that shrugs off the outlier days that wreck OLS
    (agg_ols_slope_arrow is the fragile companion), and the standard
    robust "is this metric drifting?" answer.

    Determinism: slopes are quantized to integer nano-units (the xent
    nano-nat precedent — round half-away agrees across engines), so
    the median interpolates exact integers: Spark ``percentile`` and
    DuckDB ``quantile_cont`` are bit-identical there. The intercept
    replays one fixed expression tree per day against the broadcast
    slope. Scale: the corpus-sized stage is the one daily rollup; the
    pair join is days² — bounded by the CALENDAR, not the data (a
    decade is ~13M pairs), and rn comes from a sorted-array posexplode,
    not an unpartitioned window over an unbounded input."""
    d = _daily_rollup(spark, sf_dir)
    ser = d.select("day", _day_mean().alias("dm")).agg(
        F.expr("array_sort(collect_list(struct(day, dm)))").alias("arr")
    )
    dr = (
        ser.select(F.posexplode("arr").alias("pos", "a"))
        .select((F.col("pos") + 1).alias("rn"), F.col("a.dm").alias("dm"))
        .localCheckpoint(eager=False)  # feeds both pair sides + intercept
    )
    a = dr.select(F.col("rn").alias("rn_a"), F.col("dm").alias("dm_a"))
    b = dr.select(F.col("rn").alias("rn_b"), F.col("dm").alias("dm_b"))
    slopes = a.join(b, F.col("rn_b") > F.col("rn_a")).select(
        F.round(
            F.lit(1e9)
            * (F.col("dm_b") - F.col("dm_a"))
            / (F.col("rn_b") - F.col("rn_a"))
        )
        .cast("long")
        .alias("s_nano")
    )
    sl = slopes.agg(
        F.expr("percentile(s_nano, 0.5D)").alias("slope_nano"),
        F.count("*").alias("n_pairs"),
    )
    return (
        dr.crossJoin(F.broadcast(sl))
        .groupBy("n_pairs", "slope_nano")
        .agg(
            F.count("*").alias("n_days"),
            F.expr(
                "percentile(cast(round(1e9 * dm - slope_nano * rn) as long),"
                " 0.5D)"
            ).alias("icept_nano"),
        )
        .select("n_days", "n_pairs", "slope_nano", "icept_nano")
    )


# -------------------- linear multi-touch attribution (integer cents)

_ATTR_WINDOW_S = 3600  # lookback: clicks within 1h before the purchase

_ATTR_ORACLE = f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts,
         CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS c_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
),
m AS (
  SELECT p.p_id, p.user_id, p.cents, c.c_id, c.c_ts,
         CAST(count(*) OVER (PARTITION BY p.p_id) AS BIGINT) AS k,
         ROW_NUMBER() OVER (PARTITION BY p.p_id
                            ORDER BY c.c_ts, c.c_id) AS rn
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.c_ts <= p.p_ts
   AND c.c_ts >= p.p_ts - INTERVAL {_ATTR_WINDOW_S} SECONDS
),
credit AS (
  SELECT user_id, p_id, c_id,
         cents // k + CASE WHEN rn <= cents % k THEN 1 ELSE 0 END AS cr
  FROM m
)
SELECT user_id,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
       CAST(count(*) AS BIGINT) AS n_credited_clicks,
       CAST(sum(cr) AS BIGINT) AS credited_cents
FROM credit GROUP BY user_id
"""


@register("events_attribution_linear", oracle=_ATTR_ORACLE, tags=("timeseries",))
def q_events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    equally across the SAME user's clicks in the 1-hour lookback
    window (purchases with no window click earn no attribution rows)
    — the marketing-credit model between last-touch
    (asof_join_last_click) and data-driven, and the canonical
    windowed many-to-many temporal join.

    Exact money: the split is INTEGER cents via floor division with
    the remainder pennies going to the earliest clicks (largest-
    remainder rule, deterministic (ts, event_id) order) — per-purchase
    credits sum back to the purchase exactly, and every rollup is an
    exact integer sum; a double value/k split would neither re-sum
    exactly nor hash stably. Scale: the join shuffles both sides once
    on user_id and the time predicate bounds fan-out to the window;
    per-purchase windows partition on p_id (purchase-sized groups,
    never a global sort)."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        (F.col("value").cast("decimal(18,4)") * 100).cast("long").alias("cents"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    m = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_S} SECONDS")
        ),
    )
    wk = Window.partitionBy("p_id")
    wr = Window.partitionBy("p_id").orderBy(F.asc("c_ts"), F.asc("c_id"))
    credit = m.select(
        "user_id",
        "p_id",
        "c_id",
        "cents",
        F.count("*").over(wk).alias("k"),
        F.row_number().over(wr).alias("rn"),
    ).select(
        "user_id",
        "p_id",
        "c_id",
        (
            F.floor(F.col("cents") / F.col("k")).cast("long")
            + F.when(F.col("rn") <= F.col("cents") % F.col("k"), 1).otherwise(0)
        ).alias("cr"),
    )
    return credit.groupBy("user_id").agg(
        F.countDistinct("p_id").alias("n_purchases"),
        F.count("*").alias("n_credited_clicks"),
        F.sum("cr").alias("credited_cents"),
    )


# ----------------------- click abandonment (no purchase in window)

_ABANDON_WINDOW_S = 3600

_ABANDON_ORACLE = f"""
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag,
         CASE WHEN event_type = 'purchase' THEN ts END AS p_ts
  FROM events WHERE event_type IN ('click', 'purchase')
),
nxt AS (
  SELECT user_id, ts, event_id, tag,
         min(p_ts) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_p
  FROM u
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_clicks,
       CAST(sum(CASE WHEN next_p IS NULL
                     OR date_diff('second', ts, next_p) > {_ABANDON_WINDOW_S}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
       CAST(sum(CASE WHEN next_p IS NULL
                     OR date_diff('second', ts, next_p) > {_ABANDON_WINDOW_S}
                THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS abandonment_rate
FROM nxt WHERE tag = 0
GROUP BY user_id
"""


@register("funnel_abandonment_window", oracle=_ABANDON_ORACLE, tags=("timeseries",))
def q_funnel_abandonment_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart-abandonment per user: clicks with NO purchase by the same
    user within the following hour — the inverse of the conversion
    funnel, and the segment a re-engagement campaign targets.

    NOT a range anti-join (quadratic on hot users): one user_id
    shuffle, one in-partition sort, then each click reads the NEXT
    purchase timestamp from a running forward-min window — the
    asof_join_last_click merge-scan shape, pointed forward. Clicks
    sort before purchases at equal ts ((ts, tag) order), so a
    same-second purchase counts as converted — the inclusive bound
    both engines replay. Lag compares in exact truncated seconds;
    the rate is one exact-integer division."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("tag"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("tag"), F.asc("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = u.select(
        "user_id", "ts", "tag", F.min("p_ts").over(w).alias("next_p")
    )
    lag_s = F.unix_timestamp("next_p") - F.unix_timestamp("ts")
    abandoned = F.col("next_p").isNull() | (lag_s > _ABANDON_WINDOW_S)
    return (
        nxt.where(F.col("tag") == 0)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_clicks"),
            F.sum(abandoned.cast("long")).alias("n_abandoned"),
            (
                F.sum(abandoned.cast("long")).cast("double") / F.count("*")
            ).alias("abandonment_rate"),
        )
    )


# --------------------------------- traffic heatmap (weekday x hour)

_HEATMAP_ORACLE = """
WITH g AS (
  SELECT CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
SELECT g.dow, g.hr, g.n, CAST(g.n AS DOUBLE) / t.total AS share
FROM g CROSS JOIN t
"""


@register("events_heatmap_hour_dow", oracle=_HEATMAP_ORACLE, tags=("timeseries",))
def q_events_heatmap_hour_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic heatmap: event share per (weekday, hour-of-day) cell —
    the capacity-planning / anomaly-baseline grid behind "is Tuesday
    3am load normal?". Weekday convention pinned to Sunday=0 on both
    engines (Spark dayofweek - 1 == DuckDB dayofweek, the
    timeseries_weekday_seasonal precedent).

    Scale: ONE map-side rollup into <= 168 cells (lazily checkpointed
    — it feeds both the total and the output), then cell-cardinality
    arithmetic against the broadcast 1-row total; shares are single
    exact-integer divisions."""
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy(
            (F.dayofweek(F.to_date("ts")) - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    t = g.agg(F.sum("n").alias("total"))
    return g.crossJoin(F.broadcast(t)).select(
        "dow",
        "hr",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
    )


# ------------------------------- moving median of the daily series

_MOVMED_DAYS = 7

_MOVMED_ORACLE = f"""
WITH {_DAILY_CTE}
SELECT day, cents,
       quantile_cont(cents, 0.5) OVER (
         ORDER BY day ROWS BETWEEN {_MOVMED_DAYS - 1} PRECEDING AND CURRENT ROW
       ) AS med{_MOVMED_DAYS}
FROM d
"""


@register("timeseries_moving_median", oracle=_MOVMED_ORACLE, tags=("timeseries",))
def q_timeseries_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing {W}-day moving MEDIAN of daily value totals — the
    robust smoother that, unlike the EWMA/Holt family, passes a level
    shift through crisply while entirely ignoring a one-day spike;
    the standard robust baseline for "is today out of line with the
    recent past".

    Implementation avoids an unpartitioned window over an unbounded
    input: the corpus-sized stage is the shared daily rollup; the
    day series then folds into ONE sorted array and each day's
    trailing slice re-sorts <= {W} exact integers — medians of
    bigints interpolate to exact .0/.5 doubles, matching DuckDB's
    windowed quantile_cont bit-for-bit. Days are calendar-bounded,
    so the single-row array stage never grows with data volume."""
    w = _MOVMED_DAYS
    d = _daily_rollup(spark, sf_dir)
    ser = d.agg(
        F.expr("array_sort(collect_list(struct(day, cents)))").alias("arr")
    )
    rows = ser.select(
        "arr", F.explode(F.expr("sequence(1, size(arr))")).alias("i")
    )
    win = (
        f"array_sort(transform(slice(arr, greatest(1, i - {w - 1}),"
        f" i - greatest(1, i - {w - 1}) + 1), a -> a.cents))"
    )
    med = (
        f"CASE WHEN size({win}) % 2 = 1"
        f" THEN CAST(element_at({win},"
        f"      CAST((size({win}) + 1) DIV 2 AS INT)) AS DOUBLE)"
        f" ELSE (CAST(element_at({win},"
        f"        CAST(size({win}) DIV 2 AS INT)) AS DOUBLE)"
        f"       + CAST(element_at({win},"
        f"         CAST(size({win}) DIV 2 + 1 AS INT)) AS DOUBLE))"
        f"      / 2.0 END"
    )
    return rows.select(
        F.expr("element_at(arr, i).day").alias("day"),
        F.expr("element_at(arr, i).cents").alias("cents"),
        F.expr(med).alias(f"med{w}"),
    )
