"""Semantics of the layout/global-order operators on hand fixtures."""

from datetime import datetime, timedelta

import duckdb

import mapreducegcp_spark.operators.layout as layout
from mapreducegcp_spark.operators.layout import (
    _duck_shl,
    _duck_shr,
    _interleave_expr,
    q_feature_quantile_bins,
    q_interval_bucket_join,
    q_order_global_rownum,
)

SF_DIR = "/root/testdata/sf0.001"
T0 = datetime(2024, 1, 1, 0, 14, 0)  # mid-bucket start


def test_global_rownum_is_dense_and_ordered(spark, monkeypatch):
    # duplicate prices force the o_orderkey tie-break; more rows than
    # range partitions is not required for correctness
    rows = [(k, k % 3, price) for k, price in enumerate([50.0, 10.0, 50.0, 99.0, 10.0, 75.0])]
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long, o_totalprice double")
    monkeypatch.setattr(layout, "load_table", lambda *a, **k: df)
    out = q_order_global_rownum(spark, SF_DIR).collect()
    got = {r.o_orderkey: r.global_rownum for r in out}
    # expected: sort by (price DESC, orderkey ASC) -> 3, 5, 0, 2, 1, 4
    assert got == {3: 1, 5: 2, 0: 3, 2: 4, 1: 5, 4: 6}
    assert sorted(r.global_rownum for r in out) == list(range(1, 7))


def test_interleave_expr_matches_reference_bit_interleave():
    sql = _interleave_expr("x", "y", _duck_shl, _duck_shr)
    con = duckdb.connect()
    for x, y in [(0, 0), (1, 0), (0, 1), (255, 0), (0, 255), (170, 85), (200, 13)]:
        got = con.execute(f"SELECT {sql} FROM (SELECT {x}::BIGINT x, {y}::BIGINT y)").fetchone()[0]
        expect = 0
        for i in range(8):
            expect |= ((x >> i) & 1) << (2 * i)
            expect |= ((y >> i) & 1) << (2 * i + 1)
        assert got == expect, (x, y)


def test_quantile_bins_quarter_fraction_cutpoints(spark, monkeypatch):
    # cents 100..800: quartile cuts interpolate at exact quarter
    # fractions (275, 450, 625) -> two values per bin
    rows = [(float(c) / 100,) for c in range(100, 900, 100)]
    df = spark.createDataFrame(rows, "l_extendedprice double")
    monkeypatch.setattr(layout, "load_table", lambda *a, **k: df)
    out = {r.bin: r for r in q_feature_quantile_bins(spark, SF_DIR).collect()}
    assert {b: (out[b].c_min, out[b].c_max) for b in sorted(out)} == {
        0: (100, 200),
        1: (300, 400),
        2: (500, 600),
        3: (700, 800),
    }
    assert all(out[b].n == 2 for b in out)


def test_interval_join_window_boundaries(spark, monkeypatch):
    rows = [
        # purchase mid-bucket; followers probe both boundary edges
        (1, T0, 1, "purchase", 2.0, "{}"),
        (2, T0, 2, "view", 1.0, "{}"),  # ts == p_ts: excluded (strict >)
        (3, T0 + timedelta(minutes=30), 2, "view", 3.0, "{}"),  # == end: included
        (4, T0 + timedelta(minutes=30, seconds=1), 2, "view", 7.0, "{}"),  # past end
        (5, T0 + timedelta(minutes=20), 3, "purchase", 5.0, "{}"),  # next bucket, in window
        # second purchase with no followers at all -> absent from output
        (6, T0 + timedelta(hours=5), 1, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(layout, "load_table", lambda *a, **k: df)
    out = {r.p_id: r for r in q_interval_bucket_join(spark, SF_DIR).collect()}
    # purchase 1 sees events 3 (boundary-inclusive) and 5 (cross-bucket)
    assert out[1].n_follow == 2 and out[1].follow_cents == 300 + 500
    # purchase 5's window (20min..50min) contains events 3 and 4
    assert out[5].n_follow == 2 and out[5].follow_cents == 300 + 700
    assert 6 not in out


def test_global_cumsum_matches_window_semantics(spark):
    rows = [("s1", 5), ("s3", 2), ("s2", 7), ("s5", 1), ("s4", 4)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = {
        r.k: (r.rnk, r.cum)
        for r in layout.global_cumsum(df, ["k"], "v", "rnk", "cum").collect()
    }
    assert out == {
        "s1": (1, 5),
        "s2": (2, 12),
        "s3": (3, 14),
        "s4": (4, 18),
        "s5": (5, 19),
    }


def test_ntile_from_rownum_matches_sql_ntile(spark):
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    # 13 rows / 5 buckets: first 3 buckets get 3 rows, last 2 get 2
    df = spark.createDataFrame([(i,) for i in range(1, 14)], "rn long")
    out = df.select(
        "rn", layout.ntile_from_rownum(F.col("rn"), F.lit(13), 5).alias("b")
    ).collect()
    got = {r.rn: r.b for r in out}
    ref = {
        r.rn: r.nt
        for r in df.select(
            "rn", F.ntile(5).over(Window.orderBy("rn")).alias("nt")
        ).collect()
    }
    assert got == ref


def test_compaction_plan_groups_are_contiguous_and_sized(spark, monkeypatch):
    # files of 10k chars each against the 16384 target: groups must be
    # contiguous in (source, lang) order, and every group except
    # possibly the last must START below one target-width of bytes
    rows = [(f"src{i:02d}", "en", i, 10_000) for i in range(8)]
    df = spark.createDataFrame(rows, "source string, lang string, doc_id long, n_chars long")
    monkeypatch.setattr(layout, "load_table", lambda *a, **k: df)
    out = sorted(
        layout.q_layout_compaction_plan(spark, SF_DIR).collect(),
        key=lambda r: r.file_seq,
    )
    # 10k files, 16384 target: starts at 0,10k,20k,... -> groups 0,0,1,1,2,...
    assert [r.out_group for r in out] == [i * 10_000 // 16_384 for i in range(8)]
    # contiguity: group ids are non-decreasing in sequence order
    groups = [r.out_group for r in out]
    assert groups == sorted(groups)
