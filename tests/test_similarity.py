from __future__ import annotations

from mapreducegcp_spark.operators.similarity import (
    q_similarity_ann_ivf,
    q_similarity_ann_lsh,
    q_similarity_ann_pq,
)
from mapreducegcp_spark.registry import get_query


def _pairs(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def test_bruteforce_topk_shape(spark, sf_dir):
    rows = get_query("similarity_topk_bruteforce").fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert len(rs) == 10
        sims = [r.cos_sim for r in sorted(rs, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True), f"query {q} not rank-ordered"
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_ann_lsh_recall_against_bruteforce(spark, sf_dir):
    """Random-hyperplane LSH (64 planes, 16 bands x 4 bits) must recover
    most of the exact top-10.  Deterministic planes (splitmix64 mix), so
    the measured 0.94 recall at sf0.01 is stable; assert a safe floor."""
    exact = _pairs(get_query("similarity_topk_bruteforce").fn(spark, sf_dir))
    ann = _pairs(q_similarity_ann_lsh(spark, sf_dir))
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.85, f"ANN recall too low: {recall}"


def test_ann_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF (k=16 cosine k-means, probe 6 lists) on the driver's
    near-uniform-random embeddings — the adversarial case for IVF —
    still recovers most of the exact top-10 (measured 0.74 at
    sf0.001; deterministic init, so stable). Assert a safe floor."""
    exact = _pairs(get_query("similarity_topk_bruteforce").fn(spark, sf_dir))
    ivf = _pairs(q_similarity_ann_ivf(spark, sf_dir))
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_nearest_neighbor_is_symmetric_sane(spark, sf_dir):
    nn = get_query("similarity_nearest_neighbor").fn(spark, sf_dir)
    rows = nn.collect()
    n = nn.count()
    assert n == len({r.vec_a for r in rows}), "one NN row per vector"
    assert all(r.vec_a != r.vec_b for r in rows)


def test_ann_pq_recall_against_bruteforce(spark, sf_dir):
    """PQ (8 subspaces x 32 centroids, 16x ADC oversample, exact
    re-rank) on near-uniform embeddings — PQ's worst case — recovers
    most of the exact top-10 (measured 0.82 at sf0.001 / 0.88 at
    sf0.01; deterministic codebook init, so stable)."""
    exact = _pairs(get_query("similarity_topk_bruteforce").fn(spark, sf_dir))
    pq = _pairs(q_similarity_ann_pq(spark, sf_dir))
    recall = len(exact & pq) / len(exact)
    assert recall >= 0.7, f"PQ recall too low: {recall}"
