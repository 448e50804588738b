"""safe_checkpoint — the skew-safe lineage-truncation guard.

The production failure (SCALE.md "Cluster engines at 3x10^8 edges"): a
raw localCheckpoint of the minhash-LSH pair stream pins one hot
partition holding a whole verbatim cluster's pairs; a lineage-truncated
block that cannot (re)cache is UNRECOVERABLE — consumers die with
[CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND] instead of recomputing. These tests
pin the three facts that together make the guard load-bearing:

1. the hazard: a hot-key stream checkpointed raw pins ~all rows in one
   block; safe_checkpoint bounds every block to ~rows/n;
2. the unrecoverability: losing a checkpointed block kills consumers
   (reproduced via the block manager), while the lineage-preserving
   cache path recomputes through the identical loss;
3. the guard preserves rows/schema and truncates lineage like the raw
   call does.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mapreducegcp_spark.functions.checkpoint import safe_checkpoint


def _partition_sizes(df):
    return [
        r.n
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def _skewed_stream(spark):
    """A stream whose partitioning is keyed on a hot key, so one
    partition holds ~every row — the intra-group pair-expansion shape
    (all of one verbatim cluster's pairs behind one hash key)."""
    return (
        spark.range(0, 60000)
        .select(F.lit("hot").alias("k"), F.col("id"))
        .repartition(16, "k")
    )


def test_raw_checkpoint_pins_hot_block_guard_bounds_it(spark):
    raw = _skewed_stream(spark).localCheckpoint(eager=True)
    raw_sizes = _partition_sizes(raw)
    total = sum(raw_sizes)
    assert max(raw_sizes) / total > 0.9, raw_sizes  # the hazard is real

    guarded = safe_checkpoint(_skewed_stream(spark), n=16)
    g_sizes = _partition_sizes(guarded)
    assert sum(g_sizes) == total
    assert len(g_sizes) == 16
    assert max(g_sizes) / total <= 2 / 16, g_sizes  # every block bounded


def test_checkpoint_block_loss_is_unrecoverable_cache_is_not(spark):
    """Reproduces the production error class deterministically: remove
    the checkpointed RDD's storage blocks (the in-process equivalent of
    'the hot block could not stay cached') — the checkpointed consumer
    must RAISE [CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND]; the same loss on a
    lineage-preserving .cache() recomputes silently. Only RDD ids that
    appeared in storage AFTER the snapshot are removed, so the shared
    session's other cached artifacts are untouched."""
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def stored_ids():
        return {i.id() for i in jsc.getRDDStorageInfo() if i.numCachedPartitions() > 0}

    base = spark.range(50000).select("id", F.lit("pad").alias("pad"))
    bm = sc._jvm.org.apache.spark.SparkEnv.get().blockManager().master()

    before = stored_ids()
    ck = base.localCheckpoint(eager=True)
    assert ck.count() == 50000
    for rid in stored_ids() - before:
        bm.removeRdd(rid, True)
    with pytest.raises(Exception, match="CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND"):
        ck.count()

    before = stored_ids()
    ca = base.cache()
    assert ca.count() == 50000
    for rid in stored_ids() - before:
        bm.removeRdd(rid, True)
    assert ca.count() == 50000  # lineage recomputes through the loss
    ca.unpersist()


def test_safe_checkpoint_preserves_rows_and_truncates_lineage(spark):
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("m"))
    out = safe_checkpoint(df, n=8, eager=False)
    assert out.schema == df.schema
    assert sorted(r.id for r in out.collect()) == list(range(1000))
    # lineage truncated: the optimized plan is a scan of the pinned
    # RDD, not the original range
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan[:500]
    # default n follows the session's shuffle-partition sizing
    dflt = safe_checkpoint(spark.range(100), eager=False)
    assert dflt.rdd.getNumPartitions() == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_tpch_join_output_checkpoint_blocks_bounded(spark, sf_dir, monkeypatch):
    """Verdict r12 ask #3: Q21's ``lo`` (lineitem⋈orders) and Q2's
    ``eu`` (part-supplier catalog ⋈ supplier chain) are raw
    localCheckpoints of JOIN OUTPUTS, exempted from safe_checkpoint on
    the argument that they exit hash-balanced exchanges over
    near-uniform TPC-H keys. Measure every pinned block via the
    module's probe hook instead of trusting the comment: the categorical
    failure being excluded is one block holding ~all rows, so the bound
    is the same generous 4x-ideal + slack two_phase_components pins."""
    from mapreducegcp_spark.operators import tpch

    stats: list[dict] = []

    def probe(tag, df):
        sizes = _partition_sizes(df)
        stats.append(
            {
                "tag": tag,
                "rows": sum(sizes),
                "blocks": len(sizes),
                "max_block": max(sizes),
            }
        )

    monkeypatch.setattr(tpch, "_checkpoint_block_probe", probe)
    tpch.q_tpch_q21(spark, sf_dir).collect()
    tpch.q_tpch_q2(spark, sf_dir).collect()
    assert {s["tag"] for s in stats} == {"q21_lo", "q2_eu"}
    for s in stats:
        assert s["rows"] > 0, s
        ideal = s["rows"] / max(1, s["blocks"])
        assert s["max_block"] <= 4 * ideal + 1024, s
