"""Sketch-backed operators — fixed-size summaries that replace unbounded state.

The reference engine has no sketch surface at all (its only aggregation
is exact count-per-key, Worker/Worker.py:45-49); these operators are the
100 TB-native generalizations, where a constant-size mergeable summary
stands in for state that would otherwise grow with the data:

- ``join_bloom_prefilter`` — semi-join reduction: an 8 KiB Bloom bitmap
  built from the dimension side prunes the fact side BEFORE its shuffle,
  the standard trick for cutting Exchange volume on a selective join.
- ``agg_countmin_heavyhitters`` — count-min sketch frequency estimates:
  d×w counters summarize an unbounded token stream; estimates are
  deterministic (md5-derived hash family, identical in DuckDB) so the
  driver hash-checks real sketch math, not a tolerance band.

Both are exact-output operators: the Bloom filter only PRUNES (false
positives are removed by the exact join that follows), and the CMS query
emits (exact, estimate) side by side from the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducegcp_spark.functions.text import TOKEN_ORACLE_EXPR, words_of
from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

# --------------------------------------------------------------------------
# Bloom-filter semi-join reduction
# --------------------------------------------------------------------------

_BLOOM_BITS = 1 << 16  # 64 Ki bits = 8 KiB bitmap — constant, data-independent
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (0x5BD1, 0x9E37, 0xC2B2, 0x27D4)  # 4 independent hash salts


def _bloom_positions(key_col, seed: int):
    """Bit position for one hash of the key: xxhash64(key, seed) mod m.

    JVM-side only (the sketch never crosses engines — correctness comes
    from the exact join downstream), so the fast non-portable hash is
    the right choice.
    """
    return F.pmod(F.xxhash64(key_col, F.lit(seed)), F.lit(_BLOOM_BITS)).cast("int")


def bloom_build(df: DataFrame, key: str) -> list[int]:
    """Build the bitmap: distinct bit positions -> driver -> packed longs.

    The collect is bounded by the SKETCH size (≤ 65 536 ints), not the
    data size — the same constant-model-sync shape as broadcasting
    k-means centroids (similarity.py). At any corpus scale the driver
    holds 8 KiB.
    """
    pos_rows = (
        df.select(
            F.explode(
                F.array(*[_bloom_positions(F.col(key), s) for s in _BLOOM_SEEDS])
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * _BLOOM_WORDS
    for r in pos_rows:
        p = r["pos"]
        words[p >> 6] |= 1 << (p & 63)
    # pack into SIGNED 64-bit for the Spark long literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(bitmap_words: list[int], key_col) -> F.Column:
    """Membership predicate as a pure Catalyst expression (codegen'd).

    The bitmap rides into the plan as an array<long> literal; each of
    the k hashes tests its bit with element_at + shiftleft — no UDF, no
    broadcast variable, whole-stage codegen keeps it on the fast path.
    """
    bitmap = F.lit(bitmap_words)
    # shiftleft() takes a Python int shift, so shifting by a COLUMN is
    # done by indexing a 64-entry powers-of-two literal instead.
    pow2 = F.lit([(1 << i) - (1 << 64 if i == 63 else 0) for i in range(64)])
    cond = F.lit(True)
    for s in _BLOOM_SEEDS:
        p = _bloom_positions(key_col, s)
        word = F.element_at(bitmap, F.shiftright(p, 6) + F.lit(1))
        bit = F.element_at(pow2, F.pmod(p, F.lit(64)) + F.lit(1))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


_BLOOM_JOIN_ORACLE = """
SELECT
  strftime(o_orderdate, '%Y-%m') AS order_month,
  count(*) AS n_lines,
  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(23,4))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
"""


@register("join_bloom_prefilter", oracle=_BLOOM_JOIN_ORACLE, tags=("relational", "scale"))
def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective dim-fact join with Bloom semi-join reduction.

    100 TB shape: urgent orders select ~20% of keys; without reduction
    every lineitem row crosses the Exchange only to be dropped by the
    join. The 8 KiB bitmap filters the fact table AT THE SCAN (the
    predicate is a plain Catalyst expression, so it sits next to the
    pushed filters), then the exact join removes Bloom false positives
    — output is bit-identical to the plain join the oracle runs.

    This is the manual, portable form of Spark's runtime row-level
    filtering (spark.sql.optimizer.runtime.bloomFilter.*), kept
    explicit so the reduction applies regardless of optimizer
    thresholds and cost estimates.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    bitmap = bloom_build(urgent, "o_orderkey")
    pruned = lineitem.where(bloom_might_contain(bitmap, F.col("l_orderkey")))
    return (
        pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(23,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters
# --------------------------------------------------------------------------

_CMS_DEPTH = 4
_CMS_WIDTH = 512
_CMS_TOPK = 20


def md5_sketch_bucket(key_col, seed: int, width: int):
    """Shared sketch row-hash: hex chars [8*seed, 8*seed+8) of md5(key)
    mod width. md5 is the cross-engine hash family (same trick as
    MinHash, dedup.py:223-241): DuckDB computes the identical bucket,
    so sketch estimates themselves — not tolerance bands — are
    oracle-checked. The d hash rows are DISJOINT 32-bit slices of ONE
    digest (Kirsch–Mitzenmacher style, like the MinHash family) rather
    than d independent md5(key#seed) digests — one hash per key instead
    of d cuts the dominant map-side cost of a sketch build ~4x at
    depth 4, and 32 independent bits per row are far more than the
    log2(width) consumed. Requires seed in [0, 4) (md5 = 32 hex chars).
    ONE definition serves the CMS heavy hitters and the join-
    cardinality estimator; its SQL twin is ``md5_sketch_bucket_sql``.
    Cast non-string keys to string at the call site."""
    if not 0 <= seed < 4:
        raise ValueError(f"seed {seed} out of md5 slice range [0, 4)")
    h = F.conv(F.substring(F.md5(key_col), 1 + 8 * seed, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(width)).cast("int")


def md5_sketch_bucket_sql(key_sql: str, seed_sql: str, width: int) -> str:
    """SQL twin of ``md5_sketch_bucket``; ``seed_sql`` may be a column
    reference holding '0'..'3' (the cross-joined seeds relation)."""
    return (
        f"CAST(('0x' || substr(md5({key_sql}), 1 + 8 * CAST({seed_sql} AS INT), 8))"
        f" AS BIGINT) % {width}"
    )


def _cms_bucket_spark(word_col, seed: int):
    return md5_sketch_bucket(word_col, seed, _CMS_WIDTH)


_CMS_BUCKET_SQL = md5_sketch_bucket_sql("word", "seed", _CMS_WIDTH)

_CMS_ORACLE = f"""
WITH toks AS (
  SELECT unnest({TOKEN_ORACLE_EXPR.format(col='text')}) AS word FROM documents
),
words AS (SELECT word FROM toks WHERE word <> ''),
exact AS (SELECT word, count(*) AS exact_cnt FROM words GROUP BY word),
cand AS (
  SELECT word, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, word LIMIT {_CMS_TOPK}
),
seeds AS (SELECT unnest(['0','1','2','3']) AS seed),
cms AS (
  SELECT seed, {_CMS_BUCKET_SQL} AS bucket, count(*) AS c
  FROM words CROSS JOIN seeds
  GROUP BY 1, 2
),
est AS (
  SELECT cand.word, min(cms.c) AS est_cnt
  FROM cand CROSS JOIN seeds
  JOIN cms ON cms.seed = seeds.seed
          AND cms.bucket = ({md5_sketch_bucket_sql('cand.word', 'seeds.seed', _CMS_WIDTH)})
  GROUP BY cand.word
)
SELECT cand.word, cand.exact_cnt, est.est_cnt
FROM cand JOIN est ON cand.word = est.word
"""


@register("agg_countmin_heavyhitters", oracle=_CMS_ORACLE, tags=("sketch", "llm-pipeline"))
def q_agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter frequencies from a count-min sketch, vs exact.

    The sketch: 4×512 counters built in ONE
    columnar pass (explode tokens × seeds -> groupBy(seed, bucket)),
    mergeable across partitions/streams — 2 048 longs of state however
    large the corpus, which is the point: exact top-k needs a full
    groupBy over all distinct tokens; the CMS answers with bounded
    error from constant memory. Estimates are >= exact by construction
    (min over d counters, each an over-count); both values are emitted
    so the driver hash-checks the actual sketch arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents")
    word = docs.select(words_of("text").alias("word"))
    exact = word.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    # localCheckpoint, NOT cache(): the plan reads `exact` three times
    # (candidates + sketch build + probe), and a cache pinned here
    # would outlive the query in a long-lived session (no unpersist
    # hook once the DataFrame is returned) — checkpoint blocks are
    # released by the ContextCleaner when the query's RDD goes out of
    # scope (the basket_pair_affinity decision), so the
    # vocabulary-sized word-count table materializes once per run and
    # the corpus tokenizes once instead of three times.
    exact = exact.localCheckpoint(eager=False)
    cand = exact.orderBy(F.desc("exact_cnt"), F.asc("word")).limit(_CMS_TOPK)

    seeds = [str(s) for s in range(_CMS_DEPTH)]
    # Sketch build from the per-word counts, not per-occurrence rows:
    # counter[s][h_s(w)] += cnt(w) is algebraically identical to += 1
    # per occurrence, but hashes each DISTINCT word once instead of
    # md5-ing every token x d — the map-side-combine-before-hash shape.
    # (A production CMS over a raw stream hashes occurrences precisely
    # to AVOID the distinct-word groupBy; here that groupBy is already
    # paid for the exact comparison column, so the sketch rides it.)
    cms = (
        exact.select(
            "exact_cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("seed"),
                            _cms_bucket_spark(F.col("word"), int(s)).alias("bucket"),
                        )
                        for s in seeds
                    ]
                )
            ).alias("sb"),
        )
        .select("sb.seed", "sb.bucket", "exact_cnt")
        .groupBy("seed", "bucket")
        .agg(F.sum("exact_cnt").alias("c"))
    )

    cand_buckets = cand.select(
        "word",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _cms_bucket_spark(F.col("word"), int(s)).alias("bucket"),
                    )
                    for s in seeds
                ]
            )
        ).alias("sb"),
    ).select("word", "exact_cnt", "sb.seed", "sb.bucket")

    est = (
        cand_buckets.join(F.broadcast(cms), ["seed", "bucket"])
        .groupBy("word", "exact_cnt")
        .agg(F.min("c").alias("est_cnt"))
    )
    return est.select("word", "exact_cnt", "est_cnt")


# --------------------------------------- mergeable HLL sketch rollup

_HLL_TOL = 0.05  # 3 sigma of lgK=12 Datasketches HLL (rsd ~1.6%)

_HLL_ORACLE = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_tol
FROM events
GROUP BY event_type
"""


@register("agg_hll_partitioned_union", oracle=_HLL_ORACLE, tags=("sketch", "relational"))
def q_agg_hll_partitioned_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count rollup from MERGEABLE per-day sketches.

    The lakehouse pattern approx_count_distinct can't express: build
    one Datasketches HLL per (event_type, day) — at scale these land
    in a summary table at ingest — then answer the full-range distinct
    question by UNIONING the stored sketches (hll_union_agg), never
    rescanning raw events. Re-aggregating a year is then a scan of 365
    sketch rows per group instead of the event log; the same stored
    sketches answer any date range.

    Driver-checkable via the tolerance-gate pattern
    (agg_approx_distinct_tol): exact distinct + a boolean that the
    union-of-dailies estimate lands within 3 sigma. The union is
    LOSSLESS over sketches — merging dailies gives exactly the sketch
    of the whole stream, so the gate is as tight as for a single
    full-range sketch."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    within = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        <= F.col("exact_users") * _HLL_TOL
    )
    return (
        exact.join(merged, "event_type")
        .select("event_type", "exact_users", within.alias("within_tol"))
    )


# ------------------------------------------- exact robust dispersion

_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       any_value(med.med) AS median_value,
       quantile_cont(abs(e.value - med.med), 0.5) AS mad
FROM events e JOIN med ON e.event_type = med.event_type
GROUP BY e.event_type
"""


@register("agg_mad", oracle=_MAD_ORACLE, tags=("relational",))
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    behind outlier fences that variance can't provide (one wild value
    moves stddev arbitrarily; MAD moves by at most one rank).

    Two exact-percentile passes: group medians (tiny result), broadcast
    back, then the median of absolute deviations. Both engines share
    the lower+frac*(upper-lower) interpolation on correctly-rounded
    ops (see agg_quantiles), and |x - m| is a single IEEE op, so MAD
    hash-matches bit-for-bit. The group-count is bounded (event types);
    for unbounded groups the approx_percentile form takes over, gated
    like agg_approx_quantiles_tol."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median_value")
    )
    return (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.any_value("median_value").alias("median_value"),
            F.percentile(F.abs(F.col("value") - F.col("median_value")), F.lit(0.5)).alias(
                "mad"
            ),
        )
    )


# ------------------------------------- join-cardinality estimation (CMS)

_JCE_WIDTH = 256
_JCE_DEPTH = 4


def _jce_bucket_spark(key_col, seed: int):
    return md5_sketch_bucket(key_col.cast("string"), seed, _JCE_WIDTH)


def _jce_bucket_sql(key_sql: str, seed_sql: str) -> str:
    return md5_sketch_bucket_sql(f"CAST({key_sql} AS VARCHAR)", seed_sql, _JCE_WIDTH)


_JCE_ORACLE = f"""
WITH seeds AS (SELECT unnest(['0','1','2','3']) AS seed),
a AS (
  SELECT seed, {_jce_bucket_sql('l_orderkey', 'seed')} AS bucket, count(*) AS c
  FROM lineitem CROSS JOIN seeds GROUP BY 1, 2
),
b AS (
  SELECT seed, {_jce_bucket_sql('o_orderkey', 'seed')} AS bucket, count(*) AS c
  FROM orders CROSS JOIN seeds WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2
),
est AS (
  SELECT min(dot) AS est_card FROM (
    SELECT a.seed, sum(a.c * b.c) AS dot
    FROM a JOIN b ON a.seed = b.seed AND a.bucket = b.bucket
    GROUP BY a.seed
  )
),
exact AS (
  SELECT count(*) AS exact_card
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority = '1-URGENT'
)
SELECT CAST(exact.exact_card AS BIGINT) AS exact_card,
       CAST(est.est_card AS BIGINT) AS est_card,
       est.est_card >= exact.exact_card AS est_is_upper_bound
FROM exact CROSS JOIN est
"""


@register("estimate_join_cardinality", oracle=_JCE_ORACLE, tags=("sketch",))
def q_estimate_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality estimation from count-min sketch algebra:
    |A ⋈ B| = Σ_k a_k·b_k, estimated by the minimum over d hash rows
    of the CMS inner product — what a cost-based optimizer computes
    BEFORE choosing a join strategy, from two constant-size summaries
    instead of the tables.

    The estimate is a guaranteed upper bound (every counter
    over-counts, products preserve it; emitted as a checked boolean),
    and because the hash family is the md5 cross-engine construction,
    the ESTIMATE ITSELF hash-matches DuckDB — sketch arithmetic, not
    a tolerance band. Each sketch build is one map-side-combined
    aggregation to d×w longs; the inner product joins two 1024-row
    tables. The exact count is computed alongside for the comparison
    column (at scale it is exactly the join you were trying to avoid)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def cms(df: DataFrame, key: str) -> DataFrame:
        # posexplode of a plain int array (seed = position): the d
        # bucket hashes share one md5 via codegen subexpression
        # elimination, and the fan-out rows are 2 ints wide — cheaper
        # than an array of (string, int) structs at 6M+ rows/partition.
        buckets = F.array(
            *[_jce_bucket_spark(F.col(key), s) for s in range(_JCE_DEPTH)]
        )
        return (
            df.select(F.posexplode(buckets).alias("seed", "bucket"))
            .groupBy("seed", "bucket")
            .agg(F.count("*").alias("c"))
        )

    a = cms(li, "l_orderkey").withColumnRenamed("c", "ca")
    b = cms(orders, "o_orderkey").withColumnRenamed("c", "cb")
    est = (
        a.join(F.broadcast(b), ["seed", "bucket"])
        .groupBy("seed")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
        .agg(F.min("dot").alias("est_card"))
    )
    exact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").alias("exact_card"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_card",
        "est_card",
        (F.col("est_card") >= F.col("exact_card")).alias("est_is_upper_bound"),
    )


# ----------------------------------- KMV sketch set-expression cardinality

_KMV_K = 64
# md5-derived 48-bit uniform hash of a key: position in [0, 2^48)
_KMV_SPACE = float(1 << 48)


def _kmv_hash_spark(key_col):
    return F.conv(
        F.substring(F.md5(key_col.cast("string")), 1, 12), 16, 10
    ).cast("long")


def _kmv_hash_sql(key_sql: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 12)) AS BIGINT)"


_KMV_ORACLE = f"""
WITH a_keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
),
b_keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000
),
a_h AS (SELECT DISTINCT {_kmv_hash_sql('k')} AS h FROM a_keys),
b_h AS (SELECT DISTINCT {_kmv_hash_sql('k')} AS h FROM b_keys),
u_kth AS (
  SELECT max(h) AS kth, count(*) AS n FROM (
    SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM a_h UNION SELECT h FROM b_h))
    ORDER BY h LIMIT {_KMV_K})
),
inter AS (
  SELECT count(*) AS n_inter FROM a_h
  JOIN b_h USING (h)
  CROSS JOIN u_kth
  WHERE a_h.h <= u_kth.kth
),
exact AS (
  SELECT (SELECT count(*) FROM a_keys) AS exact_a,
         (SELECT count(*) FROM b_keys) AS exact_b,
         (SELECT count(*) FROM a_keys JOIN b_keys USING (k)) AS exact_inter
)
SELECT exact.exact_a, exact.exact_b, exact.exact_inter,
       CAST(CASE WHEN u_kth.n < {_KMV_K} THEN u_kth.n
            ELSE CAST(floor(({_KMV_K} - 1) * {_KMV_SPACE} / u_kth.kth) AS BIGINT) END AS BIGINT)
         AS est_union,
       CAST(inter.n_inter AS BIGINT) AS inter_sample_hits
FROM exact CROSS JOIN u_kth CROSS JOIN inter
"""


@register("sketch_kmv_set_cardinality", oracle=_KMV_ORACLE, tags=("sketch",))
def q_sketch_kmv_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta) sketch over two customer sets —
    the mergeable distinct-count summary that, unlike HLL, also
    supports SET EXPRESSIONS: keep the k smallest hash values per set;
    the union sketch is the k smallest of the merged sketches, the
    union estimate is (k-1) * H / kth_min, and intersection members
    below the union threshold form an unbiased sample whose hit count
    drives |A∩B| estimation (Theta-sketch a-not-b/intersection
    algebra).

    Every number here is DETERMINISTIC — order statistics of the md5
    hash — so estimates hash-match DuckDB exactly (the sketch-family
    contract: CMS, join-cardinality, and now KMV all carry full value
    oracles, not tolerance bands). Each sketch is a k-row top-k
    aggregation (map-side partial TakeOrdered, constant state); the
    exact counts ride alongside for comparison."""
    orders = load_table(spark, sf_dir, "orders")
    # BOTH key sets in ONE orders pass: the old plan derived set A and
    # set B independently and every consumer (hash sketch, exact count,
    # exact intersection) re-derived its set — 10 orders scans at plan
    # time. One scan emits per-key membership flags; one groupBy folds
    # them to the distinct-key membership table; every downstream
    # number (both sketches, all three exact counts, the intersection
    # sample) reads hash-level rollups of that table. Key-level and
    # hash-level set algebra commute with the flag rollup (a hash/key
    # is "in A" iff ANY contributing row is), so every emitted value is
    # bit-identical to the two-set formulation the oracle replays.
    keys = (
        orders.where(
            (F.col("o_orderpriority") == "1-URGENT")
            | (F.col("o_totalprice") > 200000)
        )
        .select(
            F.col("o_custkey").alias("k"),
            (F.col("o_orderpriority") == "1-URGENT").alias("in_a"),
            (F.col("o_totalprice") > 200000).alias("in_b"),
        )
        .groupBy("k")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .localCheckpoint(eager=False)
    )
    hs = keys.select(
        _kmv_hash_spark(F.col("k")).alias("h"), "in_a", "in_b"
    ).groupBy("h").agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    u_kth = (
        hs.orderBy("h")
        .limit(_KMV_K)
        .agg(F.max("h").alias("kth"), F.count("*").alias("n"))
    )
    inter = (
        hs.where(F.col("in_a") & F.col("in_b"))
        .crossJoin(F.broadcast(u_kth))
        .where(F.col("h") <= F.col("kth"))
        .agg(F.count("*").alias("inter_sample_hits"))
    )
    # coalesce: sums over an empty key table must read 0 like the old
    # count(*) formulation, not NULL
    exact = keys.agg(
        F.coalesce(F.sum(F.col("in_a").cast("long")), F.lit(0)).alias("exact_a"),
        F.coalesce(F.sum(F.col("in_b").cast("long")), F.lit(0)).alias("exact_b"),
        F.coalesce(
            F.sum((F.col("in_a") & F.col("in_b")).cast("long")), F.lit(0)
        ).alias("exact_inter"),
    )
    est_union = F.when(F.col("n") < _KMV_K, F.col("n")).otherwise(
        ((F.lit(_KMV_K - 1) * F.lit(_KMV_SPACE)) / F.col("kth")).cast("long")
    )
    return (
        exact.crossJoin(F.broadcast(u_kth))
        .crossJoin(F.broadcast(inter))
        .select(
            "exact_a",
            "exact_b",
            "exact_inter",
            est_union.cast("long").alias("est_union"),
            F.col("inter_sample_hits").cast("long"),
        )
    )


# ----------------------- native approx_top_k (Spark 4 sketch function)

_ATK_ORACLE = f"""
WITH toks AS (
  SELECT unnest({TOKEN_ORACLE_EXPR.format(col='text')}) AS word FROM documents
)
SELECT word, CAST(count(*) AS BIGINT) AS cnt
FROM toks WHERE word <> ''
GROUP BY word
ORDER BY cnt DESC, word
LIMIT 10
"""


@register("agg_approx_topk", oracle=_ATK_ORACLE, tags=("sketch",))
def q_agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters through Spark 4's NATIVE approx_top_k sketch —
    the built-in counterpart of the hand-rolled count-min pipeline
    above (agg_countmin_heavyhitters): one aggregate call, mergeable
    sketch state, no explicit bucket algebra.

    The corpus vocabulary is far below maxItemsTracked, so the sketch
    runs in its exact regime and the result is value-hash-checkable
    against plain SQL (the sketch's tie order is unspecified, so the
    query over-fetches and re-sorts by the deterministic (cnt, word)
    order before the cut — same move as the CMS query). The ERROR
    bound of the approximate regime is gated separately by the CMS
    family; this query freezes the native-function integration."""
    docs = load_table(spark, sf_dir, "documents")
    word = docs.select(words_of("text").alias("word"))
    sk = word.agg(F.expr("approx_top_k(word, 25, 10000)").alias("tk"))
    return (
        sk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("word"), F.col("e.count").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(10)
    )


# --------------------- native theta sketch set algebra (datasketches)

_THETA_K = 1 << 12  # theta_sketch_agg default lgNomEntries = 12

_THETA_ORACLE = """
WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
     b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)) AS exact_union,
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)) AS exact_intersect,
  (SELECT CAST(count(*) AS BIGINT) FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)) AS exact_diff,
  TRUE AS union_within_tol, TRUE AS intersect_within_tol, TRUE AS diff_within_tol
"""


@register("sketch_theta_setops", oracle=_THETA_ORACLE, tags=("sketch",))
def q_sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-expression cardinalities via Spark 4's NATIVE Apache
    DataSketches theta integration — union, intersection, AND
    difference from two constant-size sketches (the operation HLL
    cannot do: HLL unions only; the hand-rolled KMV above
    (sketch_kmv_set_cardinality) is the from-scratch version of
    exactly this). Each side sketches its customer set once; all
    three set cardinalities then come from sketch algebra, no
    re-scan, mergeable across partitions.

    Gate pattern per agg_approx_distinct_tol: emit the EXACT counts
    plus a within-tolerance boolean for each estimate, so the driver
    hash-checks a full row and the tolerance is the only approximate
    claim. The tolerance is DERIVED per estimate, not a flat band:
    a theta intersection/difference samples its members at rate
    theta ~ k/|union|, so the estimate is ~Binomial(E, theta)/theta
    with std <= sqrt(E * |union| / k) — the gate allows 3 of those
    sigmas (for E = |union| this reduces to the familiar union RSE
    3*U/sqrt(k); in the exact regime, union <= k, estimates are
    exact and any non-negative band passes). A flat 5% band would
    flake once |union|/|intersection| outgrows k/9 at larger scale
    factors or more disjoint priority sets."""
    orders = load_table(spark, sf_dir, "orders")
    # ONE orders pass for both priority slices: every consumer (sketch
    # build, exact union/intersect/diff) needs only (o_custkey,
    # priority) of the two slices — the old plan re-scanned orders per
    # consumer (8 scans at plan time). The checkpointed two-column
    # slice feeds them all.
    slice2 = (
        orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_custkey", "o_orderpriority")
        .localCheckpoint(eager=False)
    )
    urgent = slice2.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = slice2.where(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    a = urgent.agg(F.expr("theta_sketch_agg(o_custkey)").alias("s")).alias("a")
    b = high.agg(F.expr("theta_sketch_agg(o_custkey)").alias("s")).alias("b")
    est = a.crossJoin(b).select(
        F.expr("theta_sketch_estimate(theta_union(a.s, b.s))").alias("est_u"),
        F.expr("theta_sketch_estimate(theta_intersection(a.s, b.s))").alias("est_i"),
        F.expr("theta_sketch_estimate(theta_difference(a.s, b.s))").alias("est_d"),
    )
    ua = urgent.select("o_custkey").union(high.select("o_custkey")).distinct()
    ex = (
        ua.agg(F.count("*").alias("exact_union"))
        .crossJoin(
            urgent.select("o_custkey")
            .intersect(high.select("o_custkey"))
            .agg(F.count("*").alias("exact_intersect"))
        )
        .crossJoin(
            urgent.select("o_custkey")
            .distinct()
            .subtract(high.select("o_custkey"))
            .agg(F.count("*").alias("exact_diff"))
        )
    )

    def within(est_col: str, exact_col: str):
        sigma = F.sqrt(
            F.col(exact_col).cast("double")
            * F.col("exact_union").cast("double")
            / F.lit(float(_THETA_K))
        )
        return F.abs(F.col(est_col) - F.col(exact_col)) <= 3.0 * sigma

    return ex.crossJoin(F.broadcast(est)).select(
        "exact_union",
        "exact_intersect",
        "exact_diff",
        within("est_u", "exact_union").alias("union_within_tol"),
        within("est_i", "exact_intersect").alias("intersect_within_tol"),
        within("est_d", "exact_diff").alias("diff_within_tol"),
    )
