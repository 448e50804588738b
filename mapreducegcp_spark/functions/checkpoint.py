"""Skew-safe lineage truncation.

``df.localCheckpoint()`` pins the DataFrame's partitions as storage
blocks and DELETES the lineage: a block that is later missing is not
recomputed — consumers die with "Block does not exist". That makes the
per-partition block size a hard reliability bound, not just a
performance knob. The failure was measured on the 100x-skew minhash-LSH
pair graph (296.8M edges): the intra-group expansion emits one verbatim
cluster's ~2.5M+ pairs into a single join partition, and a raw
localCheckpoint of that stream pins one enormous hot block that cannot
be (re)cached under storage pressure — unrecoverable, unlike a plain
``.cache()`` whose evicted blocks recompute from lineage (SCALE.md
"Cluster engines at 3x10^8 edges").

``safe_checkpoint`` is the guard every checkpoint-of-a-possibly-skewed
stream should go through: a round-robin repartition bounds every pinned
block to ~rows/n BEFORE lineage is truncated. The extra exchange is
paid once at materialization; downstream consumers were going to
shuffle the pair stream on their own keys anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def safe_checkpoint(
    df: DataFrame, n: int | None = None, eager: bool = True
) -> DataFrame:
    """Round-robin ``repartition(n)`` then ``localCheckpoint(eager)``.

    Use instead of a raw localCheckpoint whenever the input partitioning
    is data-dependent (join outputs, exploded expansions) — i.e. when
    one hot key could have concentrated an unbounded share of the rows
    into one partition. A lineage-truncated block has no recompute
    path, so every pinned block must be individually storable.

    ``n`` defaults to the session's ``spark.sql.shuffle.partitions`` so
    the block bound tracks the deployment's sizing (32 locally, ~2-3x
    total cores on a cluster) rather than a constant.
    """
    if n is None:
        try:
            n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            n = 200
    return df.repartition(n).localCheckpoint(eager=eager)
