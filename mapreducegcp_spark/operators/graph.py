"""Graph analytics over relational data — iterative algorithms as
driver-controlled loops of declarative joins (the connected-components
pattern from operators/dedup.py, applied to a weighted digraph).

Absent from the reference (its two applications are wordcount and
inverted index, Worker/Worker.py:9-41). The differentiating design
point is EXACT iteration: ranks live in fixed-point bigint units, every
per-edge division is true integer division, and every cross-row sum is
a bigint sum — all associative, so a 3-iteration PageRank produces
bit-identical output on any partitioning and hash-matches an unrolled
DuckDB CTE oracle. Floating-point PageRank can never be value-checked
this way (neighbor sums are order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducegcp_spark.registry import register
from mapreducegcp_spark.sources.catalog import load_table

RANK_SCALE = 1_000_000_000_000  # fixed-point rank unit (1.0 == 1e12)
N_ITER = 3
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio

_EDGE_SQL = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY src, dst
"""


def trade_edges_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed trade edges (customer nation -> supplier nation), one
    row per lineitem — the shared edge derivation behind PageRank and
    triangle counting (SQL twin: _EDGE_SQL's FROM/JOIN block).
    Dimension sides broadcast; the lineitem-orders join is the one
    real shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
    )


def _oracle() -> str:
    """Unrolled 3-iteration fixed-point PageRank as chained CTEs."""
    s = RANK_SCALE
    its = []
    prev = "r0"
    for i in range(1, N_ITER + 1):
        its.append(f"""
it{i} AS (
  SELECT nodes.node,
         CAST(({100 - DAMP_NUM} * {s}) // ({DAMP_DEN} * nn.n)
              + ({DAMP_NUM} * coalesce(c.s, 0)) // {DAMP_DEN} AS BIGINT) AS r
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, CAST(sum(({prev}.r * e.w) // outw.ow) AS BIGINT) AS s
    FROM e
    JOIN {prev} ON e.src = {prev}.node
    JOIN outw ON e.src = outw.src
    GROUP BY e.dst
  ) c USING (node)
)""")
        prev = f"it{i}"
    return f"""
WITH e AS ({_EDGE_SQL}),
outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY src),
nodes AS (SELECT n_nationkey AS node FROM nation),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT node, CAST({s} // nn.n AS BIGINT) AS r FROM nodes CROSS JOIN nn),
{",".join(its)}
SELECT n.n_name AS nation, {prev}.r AS rank_scaled,
       CAST({prev}.r AS DOUBLE) / {s} AS rank
FROM {prev} JOIN nation n ON {prev}.node = n.n_nationkey
"""


@register("graph_pagerank_nations", oracle=_oracle(), tags=("llm-pipeline",))
def q_graph_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the trade graph (customer nation -> supplier
    nation, edge weight = lineitem count), {N_ITER} fixed iterations,
    damping {DAMP_NUM}/{DAMP_DEN} — the canonical iterative algorithm
    expressed as a driver loop of joins, each round one edge join + one
    dst-keyed aggregation.

    Exactness: ranks are bigint fixed-point ({RANK_SCALE} = 1.0); the
    per-edge transfer is `(r * w) div out_w` (true integer division —
    double division + truncation is off-by-one whenever the quotient
    rounds across an integer, so both engines must use their native
    integer-div). Bigint sums are associative: the result is identical
    on any cluster layout, and hash-matches the unrolled CTE oracle.

    Scale: the rank/degree tables are vertex-sized and broadcast; only
    the edge table shuffles, once per iteration (join on src, agg on
    dst) — the standard distributed PageRank layout. `(r * w)` needs
    headroom: with 1e12-unit ranks, edge weights stay exact through
    w ~ 9e6 per edge; beyond that, pre-normalize `w` to fixed-point
    fractions of out_w once up front (same contract, one more div).
    The reference could not express iteration at all — each round here
    is the map/shuffle/reduce its Master would schedule as a separate
    job with KV-store round trips (Master/Master.py:61-94).
    """
    nation = load_table(spark, sf_dir, "nation")
    edges = (
        trade_edges_directed(spark, sf_dir)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .cache()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    nn = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(nn)).selectExpr(
        "node", f"CAST({RANK_SCALE} div n AS BIGINT) AS r"
    )
    for _ in range(N_ITER):
        contrib = (
            edges.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .join(F.broadcast(outw), "src")
            .selectExpr("dst AS node", "(r * w) div ow AS c")
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, "node", "left")
            .selectExpr(
                "node",
                f"CAST(({100 - DAMP_NUM} * {RANK_SCALE}) div ({DAMP_DEN} * n)"
                f" + ({DAMP_NUM} * coalesce(s, 0)) div {DAMP_DEN} AS BIGINT) AS r",
            )
            # truncate the lineage each round: without this, iteration
            # k's plan embeds every earlier round's join tree (the plan
            # grows linearly, optimizer time quadratically — the guide
            # §3.3/§7.3 huge-plan failure mode; 76 Exchanges at plan
            # time for 3 rounds). The vertex-sized rank table
            # materializes once per round at its first use and each
            # round's plan stays constant-size — the standard iterative
            # -algorithm checkpoint cadence.
            .localCheckpoint(eager=False)
        )
    return ranks.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("node"), "n_name")),
        "node",
    ).selectExpr(
        "n_name AS nation",
        "r AS rank_scaled",
        f"CAST(r AS DOUBLE) / {RANK_SCALE} AS rank",
    )


# ------------------------------------------------------- triangle counting

_TRI_ORACLE = f"""
WITH d AS MATERIALIZED ({_EDGE_SQL}),
ue AS MATERIALIZED (
  -- MATERIALIZED: ue feeds five references (three wedge-join legs +
  -- two scalar subqueries). DuckDB inlines un-annotated CTEs and its
  -- optimizer then flattens the wedge join ACROSS the distinct/group
  -- aggregates into one giant join tree — at the 10x blowup corpus
  -- that plan spilled >70 GB before dying, while the materialized
  -- 300-row edge list finishes in ~1.5 s. Spark never parses this
  -- text (DuckDB-only oracle), so the annotation is safe.
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM d WHERE src <> dst
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM ue e1
  JOIN ue e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN ue e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT (SELECT count(*) FROM (SELECT DISTINCT u FROM ue
                              UNION SELECT DISTINCT v FROM ue)) AS n_nodes,
       (SELECT count(*) FROM ue) AS n_edges,
       tri.n_triangles
FROM tri
"""


@register("graph_triangle_count", oracle=_TRI_ORACLE, tags=("llm-pipeline",))
def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count over the undirected trade graph — the
    clustering-structure metric behind community detection and spam
    heuristics.

    The Spark plan is the degree-oriented wedge join (the MapReduce-
    classic skew fix): each undirected edge is directed from the
    endpoint with (lower degree, lower id) to the other, so a wedge is
    enumerated only at its lowest-degree vertex. A hub of degree D in a
    skewed graph generates O(D^2) wedge candidates under the naive
    u<v self-join but only O(sum of its *smaller* neighbors' degrees)
    under orientation — the difference between a dead executor and an
    even spread at 100 TB. The DuckDB oracle counts the same triangles
    with the independent canonical a<b<c 3-way join.

    The distinct edge list is localCheckpointed before fan-out
    (round 12): ``ue`` feeds deg (twice via the orientation join), the
    two wedge legs, the closing-edge side and the n_edges rollup —
    eleven lineitem-join re-derivations as one Catalyst tree (132
    Exchanges at plan time). Materializing the edge set once makes
    every downstream stage operate on the edge-set-sized table (bounded
    by |nations|^2 here; at 100 TB, edge-set-sized, exactly what the
    two-pass design wants: derive heavy once, analyze light many
    times). Checkpoint, not cache: blocks are released when the query's
    RDD goes out of scope (the basket_pair_affinity precedent), and the
    distinct() output is hash-balanced so no repartition guard is
    needed (the level-0-only safe_checkpoint argument, dedup.py)."""
    directed = trade_edges_directed(spark, sf_dir)
    ue = (
        directed.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        ue.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # Orient each edge from the (deg, id)-smaller endpoint to the other.
    # deg is vertex-sized: no forced broadcast — AQE broadcasts it when
    # it fits (as here) and falls back to a shuffle join at billion-
    # vertex scale, where forcing a broadcast would OOM the executors.
    e = (
        ue.join(deg.withColumnRenamed("node", "u")
                .withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v")
              .withColumnRenamed("deg", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("s")
        )
        .select("s.a", "s.b")
        # three consumers (both wedge legs + the closing-edge set):
        # materialize the oriented edges once instead of re-running the
        # ue->deg orientation joins per consumer (edge-set-sized)
        .localCheckpoint(eager=False)
    )
    w1 = e.select(F.col("a").alias("x"), F.col("b").alias("y1"))
    w2 = e.select(F.col("a").alias("x"), F.col("b").alias("y2"))
    wedges = w1.join(w2, "x").filter(F.col("y1") < F.col("y2"))
    # A wedge (y1, y2) closes iff the edge exists in EITHER orientation.
    closing = e.select(
        F.least("a", "b").alias("cu"), F.greatest("a", "b").alias("cv")
    )
    tri = wedges.join(
        closing,
        (F.least("y1", "y2") == F.col("cu"))
        & (F.greatest("y1", "y2") == F.col("cv")),
        "leftsemi",
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = ue.agg(F.count("*").alias("n_edges"))
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    return n_nodes.crossJoin(n_edges).crossJoin(n_tri)


# ------------------------------------------------- BFS levels (SSSP, unit)

_BFS_SRC = 0     # nation 0 is the BFS root
_BFS_MAX_D = 6   # depth bound; oracle computes the same bounded closure

_BFS_ORACLE = f"""
WITH RECURSIVE
e AS (SELECT DISTINCT src, dst FROM ({_EDGE_SQL})),
walk(node, depth) AS (
  SELECT {_BFS_SRC}, 0
  UNION
  SELECT e.dst, walk.depth + 1
  FROM walk JOIN e ON e.src = walk.node
  WHERE walk.depth < {_BFS_MAX_D}
),
lvl AS (SELECT node, CAST(min(depth) AS BIGINT) AS level FROM walk GROUP BY node)
SELECT n.n_name AS nation, lvl.level
FROM nation n LEFT JOIN lvl ON n.n_nationkey = lvl.node
"""


@register("graph_bfs_levels", oracle=_BFS_ORACLE, tags=("llm-pipeline",))
def q_graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the trade graph: hop distance from
    nation 0 (the _BFS_SRC root) to every nation (NULL = unreachable
    within the depth bound) — the shortest-path primitive
    PageRank/components don't cover.

    Frontier-relaxation driver loop, one round per level: join the
    previous frontier to the edge list, min-reduce candidate depths,
    keep nodes not yet levelled. Integer levels, min() reduction —
    associative and partition-order-free, so the result is exact and
    hash-matches DuckDB's recursive-CTE closure (UNION-deduped walk,
    same depth bound). Scale: the frontier/level tables are
    vertex-sized broadcasts; only the edge table (built once, cached,
    pre-DISTINCTed so the per-round join is edge-set-sized) shuffles —
    per-round cost is one broadcast join + one dst aggregation,
    the textbook Pregel superstep layout."""
    nation = load_table(spark, sf_dir, "nation")
    # Cached for the per-round joins, UNPERSISTED before return (the
    # final levels are eagerly checkpointed below, so the returned
    # plan no longer references the edge lineage) — a long-lived
    # session running the whole catalog must not accrete pinned
    # storage per query.
    edges = trade_edges_directed(spark, sf_dir).select("src", "dst").distinct().cache()
    levels = nation.select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_nationkey") == _BFS_SRC, F.lit(0))
        .otherwise(F.lit(None))
        .cast("long")
        .alias("level"),
    )
    for depth in range(1, _BFS_MAX_D + 1):
        frontier = levels.where(F.col("level") == depth - 1).select("node")
        # Convergence probe (vertex-sized count): an empty frontier ends
        # the walk — on this dense graph everything levels in 1-2 hops,
        # so the bound _BFS_MAX_D is a guard, not the typical cost.
        if frontier.count() == 0:
            break
        reached = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node", "src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .withColumn("cand", F.lit(depth).cast("long"))
        )
        # Truncate lineage each superstep: without this the round-N plan
        # nests all prior rounds and re-executes them (measured 45s for
        # 6 rounds at sf0.01; ~3s with vertex-sized checkpoints).
        levels = (
            levels.join(F.broadcast(reached), "node", "left")
            .select("node", F.coalesce("level", "cand").alias("level"))
            .localCheckpoint(eager=False)
        )
    # Materialize the final (vertex-sized) levels so the edge cache can
    # be released now; the loop was already eager (frontier counts).
    levels = levels.localCheckpoint(eager=False)
    edges.unpersist()
    return levels.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("node"), "n_name")),
        "node",
    ).select(F.col("n_name").alias("nation"), "level")
