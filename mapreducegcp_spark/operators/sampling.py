"""Deterministic sampling, dataset splitting, and profiling — the
bookkeeping operators of a training-data pipeline.

All sampling here is *universe* (hash-based) sampling: membership is a
pure function of the row key via md5, so it is reproducible across
engines, runs, partitionings, and cluster sizes — unlike rand()-based
Bernoulli sampling, which can never be oracle-checked and silently
reshuffles membership on every retry of a failed task. The reference
has no sampling at all (SURVEY.md §2.2).

Cross-engine contract: Spark ``conv(substr(md5(k),1,8),16,10)`` and
DuckDB ``CAST('0x'||substr(md5(k),1,8) AS BIGINT)`` parse the same 8
hex chars to the same integer; both mod it into buckets. md5 of the
same bytes is identical everywhere, so split assignment is portable —
the property a 100 TB pipeline needs when train/eval membership must
survive re-runs and engine migrations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducegcp_spark.functions.exact import o_pct, o_sorted_list
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table


def md5_bucket(key: F.Column, n_buckets: int) -> F.Column:
    """Deterministic [0, n_buckets) bucket from a string key column."""
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"), n_buckets
    )


def _o_bucket(key_sql: str, n_buckets: int) -> str:
    return f"(CAST(('0x' || substr(md5({key_sql}),1,8)) AS BIGINT) % {n_buckets})"


# The canonical 80/10/10 split policy — ONE definition per engine so
# every consumer (split_train_val_test, the leakage-safe split, the
# leakage audit, the training-dataset capstone) derives the same
# assignment and a ratio change can't silently diverge them.
TRAIN_PCT, VAL_PCT = 80, 90  # [0,80) train, [80,90) val, [90,100) test


def split_of(key: F.Column) -> F.Column:
    """train/val/test label from a string key (md5 universe bucket)."""
    b = md5_bucket(key, 100)
    return (
        F.when(b < TRAIN_PCT, "train").when(b < VAL_PCT, "val").otherwise("test")
    )


def _o_split(key_sql: str) -> str:
    """DuckDB twin of ``split_of`` (kept in lockstep)."""
    b = _o_bucket(key_sql, 100)
    return (
        f"(CASE WHEN {b} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {b} < {VAL_PCT} THEN 'val' ELSE 'test' END)"
    )


# ------------------------------------------------------- train/val/test

_SPLIT_ORACLE = f"""
SELECT doc_id,
       {_o_bucket("CAST(doc_id AS VARCHAR)", 100)} AS bucket,
       CASE WHEN {_o_bucket("CAST(doc_id AS VARCHAR)", 100)} < 80 THEN 'train'
            WHEN {_o_bucket("CAST(doc_id AS VARCHAR)", 100)} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@register("split_train_val_test", oracle=_SPLIT_ORACLE, tags=("llm-pipeline",))
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by hashing doc_id into 100
    buckets. Stateless and embarrassingly parallel — a map-only
    projection with no shuffle; new documents land in a stable split
    without reassigning old ones (the property random splits lack)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_bucket(F.col("doc_id").cast("string"), 100)
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 80, "train")
        .when(bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


# ----------------------------------------------------- stratified sample

_RATES = {"purchase": 100, "click": 25, "view": 5, "signup": 100, "error": 50}

_RATE_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _RATES.items()
)

_STRAT_ORACLE = f"""
SELECT event_id, user_id, ts, event_type, value
FROM events
WHERE {_o_bucket("CAST(event_id AS VARCHAR)", 100)} <
      CASE event_type {_RATE_CASE} ELSE 0 END
"""


@register("sample_stratified", oracle=_STRAT_ORACLE, tags=("llm-pipeline",))
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class universe sampling: keep 100% of rare classes
    (purchase/signup) and downsample frequent ones (view to 5%) — the
    class-rebalancing pass before training. Membership is a pure
    function of event_id, so the sample is identical on every run and
    every engine. Map-only: the predicate evaluates in the scan stage,
    no shuffle, and at 100 TB the filter cuts the data before anything
    wide happens downstream."""
    ev = load_table(spark, sf_dir, "events")
    rate = F.col("event_type")
    rate_expr = F.lit(0)
    for k, v in _RATES.items():
        rate_expr = F.when(rate == k, v).otherwise(rate_expr)
    return ev.filter(
        md5_bucket(F.col("event_id").cast("string"), 100) < rate_expr
    ).select("event_id", "user_id", "ts", "event_type", "value")


# ------------------------------------------------------------- profiling

_PROFILE_COLS = ["doc_id", "lang", "source", "n_chars", "text"]

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{c}' AS col_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_str,
       MAX(CAST({c} AS VARCHAR)) AS max_str
FROM documents"""
    for c in _PROFILE_COLS
)


@register("profile_documents", oracle=_PROFILE_ORACLE, tags=("llm-pipeline",))
def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table — row count, null count,
    exact distinct count, lexicographic min/max — one output row per
    column; the data-quality gate run before any expensive pipeline
    stage.

    Implementation: all five columns' metrics aggregate in a single
    scan (one global agg row, then an in-memory unpivot of 5×6 scalar
    cells via stack) — versus the naive per-column pass that reads the
    table N_cols times. COUNT(DISTINCT) over multiple columns in one
    agg triggers Spark's expand-based rewrite: the scan multiplies 5×
    in the map stage but the table is still read once. min/max compare
    as strings in both engines (binary collation either side)."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    row = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__dist, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return row.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_rows, n_null, n_distinct, min_str, max_str)"
    )


# ------------------------------------------------- data-quality constraints

_DQ_ORACLE = """
WITH m AS (
  SELECT count(*) AS n_rows,
         count(doc_id) AS n_docid,
         count(DISTINCT doc_id) AS n_docid_distinct,
         count(text) AS n_text,
         CAST(sum(CASE WHEN n_chars >= 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_chars_pos,
         CAST(sum(CASE WHEN lang IN ('en','de','es','fr') THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lang_ok,
         CAST(sum(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END)
           AS BIGINT) AS n_len_consistent
  FROM documents
)
SELECT c.constraint_name, c.n_violations, c.passed FROM m, LATERAL (
  SELECT * FROM (VALUES
    ('doc_id_complete',   m.n_rows - m.n_docid,          m.n_rows - m.n_docid = 0),
    ('doc_id_unique',     m.n_docid - m.n_docid_distinct, m.n_docid = m.n_docid_distinct),
    ('text_complete',     m.n_rows - m.n_text,           m.n_rows - m.n_text = 0),
    ('n_chars_positive',  m.n_rows - m.n_chars_pos,      m.n_rows = m.n_chars_pos),
    ('lang_in_domain',    m.n_rows - m.n_lang_ok,        m.n_rows = m.n_lang_ok),
    ('n_chars_matches_text', m.n_rows - m.n_len_consistent,
                             m.n_rows = m.n_len_consistent)
  ) AS v(constraint_name, n_violations, passed)
) c
"""


@register("dq_constraint_check", oracle=_DQ_ORACLE, tags=("llm-pipeline",))
def q_dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the Deequ pattern): completeness,
    uniqueness, domain, and cross-column consistency constraints over
    the documents table, one verdict row per constraint. A pipeline
    runs this before (and after) every expensive stage; a failed row
    aborts the run instead of training on corrupt data.

    All constraints evaluate in ONE scan — a single global aggregate
    computes every count, then an in-memory stack unpivots the scalar
    cells into verdict rows. No per-constraint passes, no shuffle
    beyond the final single-row exchange."""
    docs = load_table(spark, sf_dir, "documents")
    langs = ("en", "de", "es", "fr")
    m = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("doc_id").alias("n_docid"),
        F.countDistinct("doc_id").alias("n_docid_distinct"),
        F.count("text").alias("n_text"),
        F.sum(F.when(F.col("n_chars") >= 1, 1).otherwise(0)).alias("n_chars_pos"),
        F.sum(F.when(F.col("lang").isin(*langs), 1).otherwise(0)).alias("n_lang_ok"),
        F.sum(
            F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0)
        ).alias("n_len_consistent"),
    )
    checks = [
        ("doc_id_complete", "n_rows - n_docid", "n_rows - n_docid = 0"),
        ("doc_id_unique", "n_docid - n_docid_distinct", "n_docid = n_docid_distinct"),
        ("text_complete", "n_rows - n_text", "n_rows - n_text = 0"),
        ("n_chars_positive", "n_rows - n_chars_pos", "n_rows = n_chars_pos"),
        ("lang_in_domain", "n_rows - n_lang_ok", "n_rows = n_lang_ok"),
        ("n_chars_matches_text", "n_rows - n_len_consistent",
         "n_rows = n_len_consistent"),
    ]
    stack_args = ", ".join(
        f"'{name}', CAST({viol} AS BIGINT), {passed}" for name, viol, passed in checks
    )
    return m.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (constraint_name, n_violations, passed)"
    )


# ---------------------------------------------------------- observed metrics

_OBSERVE_ORACLE = """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_discount_oob,
       CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_shipdate,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM lineitem
"""


@register("dq_observe_metrics", oracle=_OBSERVE_ORACLE, tags=("llm-pipeline",))
def q_dq_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-extra-pass data-quality metrics via ``Dataset.observe`` —
    Spark's named-accumulator surface: the metric expressions are
    evaluated inline DURING an action over the observed plan, so a
    production pipeline gets row counts, domain-violation counts, and
    control totals for free while writing its real output (no second
    scan, unlike dq_constraint_check's dedicated aggregation pass).

    Here the observed action is a noop-sink write of the lineitem scan
    (standing in for the real sink write); the harness-visible result
    is the captured metrics row. At 100 TB this is the difference
    between auditing a write and re-reading 100 TB to audit it.
    Metrics fold in integer cents, so the observed total is exact and
    cross-engine hash-stable."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("dq")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
        ).alias("n_discount_oob"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0)).alias(
            "n_null_shipdate"
        ),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "total_cents"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_discount_oob"], m["n_null_shipdate"], m["total_cents"])],
        "n_rows long, n_discount_oob long, n_null_shipdate long, total_cents long",
    )


# ------------------------------------------- fixed-size uniform sample

_FIXED_K = 100

_FIXED_K_ORACLE = f"""
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
FROM documents
ORDER BY h, doc_id
LIMIT {_FIXED_K}
"""


@register("sample_uniform_fixed_k", oracle=_FIXED_K_ORACLE, tags=("llm-pipeline",))
def q_sample_uniform_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-k uniform sample in one pass: keep the k smallest
    md5(doc_id) values. Fraction-based universe sampling (above) can't
    hit a row budget ("give me 100k eval docs") without knowing the
    table size; ordering by a uniform hash makes any prefix of the
    order a uniform sample, so the k-smallest ARE a fixed-size sample
    — deterministic, reproducible, and stable under re-partitioning.

    Scale shape: Catalyst turns orderBy().limit(k) into
    TakeOrderedAndProject — each task keeps a k-row heap over its
    partition and the driver merges P heaps of k; nothing resembling
    a global sort of 100 TB happens, and the sample never exceeds
    k*(P+1) rows in memory anywhere (the same reservoir-merge shape a
    hand-written distributed reservoir sampler would use, for free
    from the optimizer — asserted in tests/test_plans.py). The md5
    tiebreak column doubles as the resume cursor: 'the next k' is a
    WHERE h > last_h scan, the keyset-pagination move."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .orderBy("h", "doc_id")
        .limit(_FIXED_K)
    )


# --------------------------------------------------- k-anonymity gate

_KANON_K = 5

_KANON_ORACLE = f"""
SELECT n.n_name AS nation, c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS group_size,
       count(*) < {_KANON_K} AS needs_suppression
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2
"""


@register("dq_k_anonymity", oracle=_KANON_ORACLE, tags=("llm-pipeline",))
def q_dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    privacy gate a training-data release runs before shipping
    user-derived records: any (nation, segment) group with fewer than
    k members is re-identifiable and must be suppressed or
    generalized. Emits every group with its size and the suppression
    flag, so the release pipeline can subtract flagged rows and the
    audit log keeps the evidence.

    Scale shape: one map-side-combined groupBy on the quasi-identifier
    (dimension joined by broadcast) — the audit costs one aggregation
    at any corpus size, and the flag threshold is a plan literal, not
    a second pass."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment")
        )
        .agg(F.count("*").alias("group_size"))
        .select(
            "nation",
            "segment",
            "group_size",
            (F.col("group_size") < _KANON_K).alias("needs_suppression"),
        )
    )


# -------------------------------------- fixed-k sample per stratum

_GROUP_K = 20

_GROUP_K_ORACLE = f"""
SELECT lang, doc_id, rnk
FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rnk
  FROM documents
)
WHERE rnk <= {_GROUP_K}
"""


@register("sample_fixed_k_per_group", oracle=_GROUP_K_ORACLE, tags=("llm-pipeline",))
def q_sample_fixed_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-k-per-stratum sample ("20 eval docs per language"):
    rank by uniform hash within each group, keep rank <= k. The
    per-group twin of sample_uniform_fixed_k — fraction-based
    stratified sampling (sample_stratified) needs per-group
    populations to hit a budget; hash-rank doesn't.

    Scale shape: one hash-partitioned window per group — state per
    task is a streaming rank over its groups, and the skew ceiling is
    the largest single GROUP (languages: bounded, safe; for a
    high-cardinality stratum swap in the two-phase TakeOrdered shape).
    Deterministic: md5 is unique per doc_id and the tiebreak total-
    orders equal hashes."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= _GROUP_K)
    )


# ------------------------------------------------ hash-split A/B lift

_AB_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         {_o_bucket("CAST(user_id AS VARCHAR)", 2)} AS arm,
         max(CASE WHEN event_type = 'purchase' AND value > 180 THEN 1 ELSE 0 END) AS converted
  FROM events
  GROUP BY user_id
),
s AS (
  SELECT CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
         CAST(sum(converted) FILTER (WHERE arm = 0) AS BIGINT) AS conv_a,
         CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b,
         CAST(sum(converted) FILTER (WHERE arm = 1) AS BIGINT) AS conv_b
  FROM u
)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
         - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_diff,
       (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
         / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS z_score
FROM s
"""


@register("events_ab_lift", oracle=_AB_ORACLE, tags=("relational",))
def q_events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B analysis over a deterministic hash split:
    users land in arm A/B by md5 bucket (the same universe-split
    machinery as train/val/test — reproducible membership, no rand()),
    conversion = any HIGH-VALUE purchase (> $180 — every user has
    some purchase, so the interesting rate needs a bar), and the
    two-proportion z-statistic
    comes out of exact integer counts. Every float is a fixed chain of
    correctly-rounded IEEE ops on identical operands (divisions and one
    sqrt), so even the test statistic value-hashes across engines.

    Scale shape: one groupBy(user) for per-user conversion (map-side
    combinable max), then a constant-size conditional aggregate —
    experiment readouts at 100 TB cost one pass regardless of arms."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 180), 1
            ).otherwise(0)
        ).alias(
            "converted"
        )
    )
    u = u.select(
        md5_bucket(F.col("user_id").cast("string"), 2).alias("arm"), "converted"
    )
    s = u.agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted"))).alias("conv_a"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted"))).alias("conv_b"),
    )
    pa_ = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    pb_ = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    z = (pa_ - pb_) / F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (F.lit(1.0) / F.col("n_a").cast("double") + F.lit(1.0) / F.col("n_b").cast("double"))
    )
    return s.select(
        "n_a", "conv_a", "n_b", "conv_b", (pa_ - pb_).alias("rate_diff"), z.alias("z_score")
    )


# ----------------------------------- distribution drift (chi-square)

_DRIFT_ORACLE = f"""
WITH tagged AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         {_o_bucket("(CAST(event_id AS VARCHAR) || ':drift')", 100)} < 50 AS is_ref
  FROM events
),
cuts AS (
  SELECT {o_pct('l', 0.25)} AS q1,
         {o_pct('l', 0.50)} AS q2,
         {o_pct('l', 0.75)} AS q3
  FROM (SELECT {o_sorted_list('c')} AS l FROM tagged WHERE is_ref)
),
binned AS (
  SELECT CASE WHEN c <= q1 THEN 0 WHEN c <= q2 THEN 1
              WHEN c <= q3 THEN 2 ELSE 3 END AS bin,
         is_ref
  FROM tagged, cuts
),
counts AS (
  SELECT bin,
         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
         CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
  FROM binned GROUP BY bin
),
tot AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref, CAST(sum(n_cur) AS BIGINT) AS t_cur
  FROM counts
)
SELECT bin, n_ref, n_cur,
       ((CAST(n_cur AS DOUBLE)
          - CAST(t_cur AS DOUBLE) * (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)))
        * (CAST(n_cur AS DOUBLE)
          - CAST(t_cur AS DOUBLE) * (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE))))
       / (CAST(t_cur AS DOUBLE) * (CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE)))
         AS chi2_term
FROM counts, tot
"""


@register("dq_distribution_drift", oracle=_DRIFT_ORACLE, tags=("llm-pipeline",))
def q_dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift check between a reference slice and a
    current slice (two-sample chi-square over reference-quartile
    bins) — the monitor a training pipeline runs before trusting a
    new data batch: bin edges come from the REFERENCE distribution
    (the deployed binning), the current slice's bin counts are
    compared to their expected mass, and each bin reports its
    chi-square contribution ((observed - expected)^2 / expected).
    Chi-square instead of PSI/KL deliberately: the statistic is pure
    rational arithmetic on exact integer counts — no logarithm — so
    unlike a PSI the result value-hash-matches cross-engine bit for
    bit.

    The two slices here are a deterministic md5 half-split of events
    (so the oracle can re-derive membership); in production they are
    yesterday's table and today's batch. Scale: one pass tags and
    bins every row map-side (cutpoints broadcast from one distributed
    percentile over the reference), one 4-row rollup, totals join
    broadcast — no data-sized state."""
    ev = load_table(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("c"),
        (
            md5_bucket(
                F.concat(F.col("event_id").cast("string"), F.lit(":drift")), 100
            )
            < 50
        ).alias("is_ref"),
    )
    cuts = (
        ev.where("is_ref")
        .agg(F.expr("percentile(c, array(0.25D, 0.50D, 0.75D))").alias("qs"))
        .select(
            F.col("qs")[0].alias("q1"),
            F.col("qs")[1].alias("q2"),
            F.col("qs")[2].alias("q3"),
        )
    )
    binned = ev.crossJoin(F.broadcast(cuts)).select(
        F.when(F.col("c") <= F.col("q1"), 0)
        .when(F.col("c") <= F.col("q2"), 1)
        .when(F.col("c") <= F.col("q3"), 2)
        .otherwise(3)
        .alias("bin"),
        "is_ref",
    )
    # Lazy checkpoint: counts (4 rows) feeds both the result and the
    # totals branch — without it the totals crossJoin re-runs the
    # whole scan+bin pipeline a second time.
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    ).localCheckpoint(eager=False)
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    expected = F.col("t_cur").cast("double") * (
        F.col("n_ref").cast("double") / F.col("t_ref").cast("double")
    )
    diff = F.col("n_cur").cast("double") - expected
    # NULL (not a crash) when the expected mass is zero — a bin with
    # current rows but no reference rows, or an empty reference slice.
    # DuckDB's double division by zero yields NULL, so the nested CASE
    # keeps the engines value-identical AND keeps ANSI mode from
    # throwing DIVIDE_BY_ZERO (CASE branches evaluate lazily).
    chi2 = F.when(
        F.col("t_ref") > 0, F.when(expected > 0, (diff * diff) / expected)
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin", "n_ref", "n_cur", chi2.alias("chi2_term")
    )


# ----------------------------------- referential-integrity FK audit

# Every FK edge of the star schema: (child, fk_col, parent, pk_col).
# The reference's KeyValueStore has no notion of schema constraints
# (SURVEY.md §2.2); this is the Deequ-style cross-TABLE companion to
# dq_constraint_check's single-table gate.
_FK_EDGES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_edge_oracle(child: str, fk: str, parent: str, pk: str) -> str:
    edge = f"{child}.{fk}->{parent}.{pk}"
    return f"""
SELECT '{edge}' AS fk_edge,
       CAST(sum(c.cnt) AS BIGINT) AS n_child_rows,
       CAST(count(*) AS BIGINT) AS n_distinct_keys,
       CAST(sum(CASE WHEN p.present IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan_keys,
       CAST(sum(CASE WHEN p.present IS NULL THEN c.cnt ELSE 0 END) AS BIGINT)
         AS n_orphan_rows
FROM (
  SELECT {fk} AS k, count(*) AS cnt FROM {child}
  WHERE {fk} IS NOT NULL GROUP BY {fk}
) c
LEFT JOIN (SELECT DISTINCT {pk} AS k, TRUE AS present FROM {parent}) p
  ON c.k = p.k
"""


_FK_ORACLE = "\nUNION ALL\n".join(
    _fk_edge_oracle(*edge) for edge in _FK_EDGES
)


@register("dq_referential_integrity", oracle=_FK_ORACLE, tags=("llm-pipeline",))
def q_dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the star
    schema: one verdict row per edge with child-row, distinct-key,
    orphan-key and orphan-row counts. The cross-table companion to
    ``dq_constraint_check`` — a broken FK edge (orphaned lineitems
    after a partial reload, customers pointing at a dropped nation)
    silently corrupts every downstream join, so a pipeline gates on
    this before fact/dim joins the same way it gates on completeness.

    Scale shape: the child side collapses to (key, row_count) FIRST —
    a map-side-combinable rollup whose shuffle carries one row per
    DISTINCT key, never per child row (lineitem at 100 TB shuffles
    ~orderkey-cardinality rows, each 16 bytes). The parent side is
    projected to its distinct key and LEFT-joined; dim parents
    auto-broadcast, and the one fact-sized parent (orders) degrades to
    a co-partitioned hash join on the already-collapsed key sets. Each
    edge then folds to a single verdict row, so the union output is
    exactly len(_FK_EDGES) rows. Per-edge child scans are parquet
    column-pruned to the single FK column (no full-row reads, verified
    by ReadSchema in the plan audit). NULL FKs follow ANSI FK
    semantics: excluded from the keyed counts entirely, never counted
    as orphans."""
    out = None
    for child, fk, parent, pk in _FK_EDGES:
        keyed = (
            load_table(spark, sf_dir, child)
            .where(F.col(fk).isNotNull())
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count("*").alias("cnt"))
        )
        parent_keys = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("present", F.lit(True))
        )
        missing = F.col("present").isNull()
        row = (
            keyed.join(parent_keys, "k", "left")
            .agg(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("fk_edge"),
                F.sum("cnt").alias("n_child_rows"),
                F.count("*").alias("n_distinct_keys"),
                F.sum(F.when(missing, 1).otherwise(0)).alias("n_orphan_keys"),
                F.sum(F.when(missing, F.col("cnt")).otherwise(0)).alias(
                    "n_orphan_rows"
                ),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# ------------------------------- k-center coreset (farthest point)

_KCENTER_K = 8

# Squared L2 between two embedding lists, as a fixed-order left fold —
# the DOT_ORACLE_EXPR convention (functions/vectors.py): identical fold
# order in both engines makes the doubles bit-identical.
_D2_ORACLE = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
    "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (acc, x) -> acc + x)"
)


def _kcenter_oracle() -> str:
    d_new = _D2_ORACLE.format(a="d.embedding", b="c.embedding")
    d_first = _D2_ORACLE.format(a="e.embedding", b="c.embedding")
    parts = [
        "c1 AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 1)",
        f"""d1 AS (
  SELECT e.vec_id, e.embedding, {d_first} AS dmin
  FROM embeddings e CROSS JOIN c1 c
)""",
    ]
    for i in range(2, _KCENTER_K + 1):
        p = i - 1
        parts.append(
            f"""c{i} AS (
  SELECT vec_id, embedding, dmin FROM d{p} WHERE dmin > 0
  ORDER BY dmin DESC, vec_id LIMIT 1
)"""
        )
        if i < _KCENTER_K:
            parts.append(
                f"""d{i} AS (
  SELECT d.vec_id, d.embedding, least(d.dmin, {d_new}) AS dmin
  FROM d{p} d CROSS JOIN c{i} c
)"""
            )
    rows = ["SELECT CAST(1 AS BIGINT) AS sel_order, vec_id,"
            " CAST(NULL AS DOUBLE) AS cover_radius_sq FROM c1"]
    rows += [
        f"SELECT CAST({i} AS BIGINT), vec_id, dmin FROM c{i}"
        for i in range(2, _KCENTER_K + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


@register("sample_kcenter_coreset", oracle=_kcenter_oracle(), tags=("llm-pipeline",))
def q_sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point) coreset over the embedding
    table: start from the deterministic seed (min vec_id), then {K}-1
    times pick the point FARTHEST from every already-chosen center —
    the classic 2-approximation to the k-center cover, and the
    data-pruning selection that maximizes geometric coverage where
    uniform sampling oversamples dense regions. cover_radius_sq is the
    chosen point's squared distance to the prior centers at selection
    time — the (non-increasing) coverage-radius curve that tells you
    when adding coresets stops buying coverage.

    Scale shape: k bounded driver syncs of ONE row each (the k-means
    centroid-sync precedent), and per round ONE map-only pass fusing
    "distance to the newest center" with a running least() against the
    stored dmin — never a k-way distance matrix, never a shuffle; the
    round's argmax is a TakeOrdered reduction. State between rounds is
    lazily checkpointed so round r doesn't replay rounds 1..r-1.
    Selection stops early when no candidate has dmin > 0 — an empty
    table yields 0 rows and n < k (or all-duplicate) inputs yield
    min(k, distinct-point) centers instead of re-selecting a covered
    point; the oracle's WHERE dmin > 0 collapses its CTE chain at the
    same round, so both engines stop identically. Squared-L2 is a
    fixed-order fold (functions/vectors.py convention), so the DuckDB
    chained-CTE replay is bit-identical, ties and all."""
    from mapreducegcp_spark.functions.vectors import _c as _vc

    def d2(a, center_vals: list[float]) -> F.Column:
        b = F.array(*[F.lit(float(v)) for v in center_vals])
        diffs = F.zip_with(
            _vc(a), b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        )
        return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)

    schema = "sel_order long, vec_id long, cover_radius_sq double"
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seeds = emb.orderBy("vec_id").limit(1).collect()
    if not seeds:
        return spark.createDataFrame([], schema)
    seed = seeds[0]
    out = [(1, int(seed["vec_id"]), None)]
    state = emb.select(
        "vec_id", "embedding", d2("embedding", seed["embedding"]).alias("dmin")
    ).localCheckpoint(eager=False)
    for i in range(2, _KCENTER_K + 1):
        fars = (
            state.where(F.col("dmin") > 0)
            .orderBy(F.desc("dmin"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not fars:
            break
        far = fars[0]
        out.append((i, int(far["vec_id"]), float(far["dmin"])))
        if i < _KCENTER_K:
            state = state.select(
                "vec_id",
                "embedding",
                F.least("dmin", d2("embedding", far["embedding"])).alias("dmin"),
            ).localCheckpoint(eager=False)
    return spark.createDataFrame(out, schema)


q_sample_kcenter_coreset.__doc__ = q_sample_kcenter_coreset.__doc__.format(
    K=_KCENTER_K
)


# ------------------------------------------ freshness SLA audit

_FRESHNESS_SLA_SECONDS = 1800  # 30 minutes behind the corpus head = stale


@register(
    "dq_freshness_sla",
    oracle=f"""
WITH ref AS (SELECT max(ts) AS head FROM events),
per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, max(ts) AS latest
  FROM events GROUP BY event_type
)
SELECT p.event_type, p.n_events, p.latest,
       CAST(date_diff('second', p.latest, r.head) AS BIGINT) AS lag_seconds,
       (date_diff('second', p.latest, r.head) <= {_FRESHNESS_SLA_SECONDS})
         AS within_sla
FROM per p CROSS JOIN ref r
""",
    tags=("llm-pipeline",),
)
def q_dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness SLA audit: per event stream, the latest event time,
    its lag behind the corpus head (the max timestamp over ALL
    streams), and a verdict against the SLA — the gate a pipeline
    checks before trusting "current" aggregates, because one stalled
    producer silently freezes every downstream join that assumes all
    streams are equally fresh.

    Cross-engine lag: both sides subtract SECOND-TRUNCATED timestamps
    (Spark unix_timestamp truncates; DuckDB date_diff('second') counts
    second boundaries — the same value), so the lag and the SLA
    verdict are exact integers, never a float duration. Scale: one
    scan computes every per-stream rollup map-side (uniform
    event_type keys), the corpus head is a 1-row broadcast, output
    rows = streams."""
    ev = load_table(spark, sf_dir, "events")
    # One corpus scan: the head is max(latest) over the stream-sized
    # rollup, not a second scan of events; the lazy checkpoint keeps
    # the rollup from recomputing for its two consumers.
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"), F.max("ts").alias("latest")
    ).localCheckpoint(eager=False)
    ref = per.agg(F.max("latest").alias("head"))
    lag = F.unix_timestamp("head") - F.unix_timestamp("latest")
    return per.crossJoin(F.broadcast(ref)).select(
        "event_type",
        "n_events",
        "latest",
        lag.alias("lag_seconds"),
        (lag <= _FRESHNESS_SLA_SECONDS).alias("within_sla"),
    )


# -------------------- PPSWOR priority sample (bottom-k, weighted)

_PPSWOR_K = 20


def _ppswor_oracle() -> str:
    from mapreducegcp_spark.functions.text import TOKEN_ORACLE_EXPR

    toks = TOKEN_ORACLE_EXPR.format(col="text")
    return f"""
WITH w AS (
  SELECT doc_id,
         CAST(len(list_filter({toks}, t -> t <> '')) AS BIGINT) AS weight
  FROM documents
),
keyed AS (
  SELECT doc_id, weight,
         -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT)
              + 0.5) / 4294967296.0) / CAST(weight AS DOUBLE) AS k
  FROM w WHERE weight > 0
)
SELECT doc_id, weight,
       CAST(round(1e12 * k) AS BIGINT) AS key_pico
FROM keyed
ORDER BY k, doc_id
LIMIT {_PPSWOR_K}
"""


_PPSWOR_ORACLE = _ppswor_oracle()


@register("sample_priority_ppswor", oracle=_PPSWOR_ORACLE, tags=("llm-pipeline",))
def q_sample_priority_ppswor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement, probability proportional to
    size (token count), as a bottom-k priority sample: each doc draws
    a deterministic exponential key Exp(weight) = -ln(u)/w from its
    md5-universe u, and the k smallest keys ARE a PPSWOR sample
    (Cohen/Kaplan bottom-k sketch). This is the one-pass, mergeable
    way to take "20 docs, long docs proportionally more likely" out of
    a 100 TB corpus — rand() can't be re-run or audited; this can,
    because membership is a pure function of doc_id.

    Determinism: u = (hash32 + 0.5) / 2^32 is an exact dyadic double
    (never 0 or 1, so ln is finite), the key is one fixed expression
    tree (libm ln both engines — the xent precedent), and selection
    orders by (key, doc_id). Scale: map-only scoring, then ONE
    TakeOrdered bottom-k reduction — no shuffle, no sort
    materialization; k-per-partition partials merge on the driver the
    same way the sketch merges across streams."""
    from mapreducegcp_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("weight")
    ).where(F.col("weight") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    k = -F.log(u) / F.col("weight").cast("double")
    return (
        w.select("doc_id", "weight", k.alias("k"))
        .orderBy(F.asc("k"), F.asc("doc_id"))
        .limit(_PPSWOR_K)
        .select(
            "doc_id",
            "weight",
            F.round(F.lit(1e12) * F.col("k")).cast("long").alias("key_pico"),
        )
    )


# -------------------------- Benford first-digit conformance audit

def _benford_oracle() -> str:
    from mapreducegcp_spark.functions.exact import o_dec2

    cents = f"CAST({o_dec2('o_totalprice')} * 100 AS BIGINT)"
    e = "log10(1.0 + 1.0 / CAST(o.digit AS DOUBLE)) * CAST(t.total AS DOUBLE)"
    return f"""
WITH c AS (
  SELECT CAST(substr(CAST({cents} AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE {cents} > 0
),
obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM c GROUP BY digit),
t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS total FROM obs)
SELECT o.digit, o.n_obs,
       log10(1.0 + 1.0 / CAST(o.digit AS DOUBLE)) AS expected_share,
       {e} AS expected_n,
       ((CAST(o.n_obs AS DOUBLE) - {e}) * (CAST(o.n_obs AS DOUBLE) - {e}))
         / ({e}) AS chi2_term
FROM obs o CROSS JOIN t
"""


@register("dq_benford_first_digit", oracle=_benford_oracle(), tags=("llm-pipeline",))
def q_dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance of order values: observed vs expected
    first-significant-digit distribution with per-digit chi-square
    contributions — the classic fabricated-data / broken-generator
    audit (hand-entered or synthesized amounts over-sample digits 5-9;
    a capped or offset generator craters digit 1). A data-quality gate
    for ingested numeric feeds, same family as dq_distribution_drift
    but against a UNIVERSAL prior rather than a reference window.

    Determinism: the first digit is exact string surgery on exact
    integer cents (no float log bucketing), counts are exact, and the
    expected shares are one fixed log10 expression (identical libm) —
    chi-square terms replay bit-identically. Scale: one map-side
    digit rollup (<= 9 groups), then digit-cardinality arithmetic
    against the broadcast 1-row total."""
    from mapreducegcp_spark.functions.exact import dec2

    orders = load_table(spark, sf_dir, "orders")
    cents = (dec2("o_totalprice") * 100).cast("long")
    obs = (
        orders.select(cents.alias("cents"))
        .where(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
        .localCheckpoint(eager=False)  # feeds the total AND the output
    )
    t = obs.agg(F.sum("n_obs").alias("total"))
    share = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    expected = share * F.col("total").cast("double")
    diff = F.col("n_obs").cast("double") - expected
    return obs.crossJoin(F.broadcast(t)).select(
        "digit",
        "n_obs",
        share.alias("expected_share"),
        expected.alias("expected_n"),
        ((diff * diff) / expected).alias("chi2_term"),
    )
