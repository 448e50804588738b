"""As-of join and sessionization semantics on hand-computed fixtures."""

from datetime import datetime, timedelta

from mapreducegcp_spark.operators.timeseries import _GAP_MIN, q_asof_join, q_sessionize

SF_DIR = "/root/testdata/sf0.001"

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )


def test_asof_join_picks_latest_prior_click_inclusive(spark, tmp_path, monkeypatch):
    rows = [
        # user 1: click@0s, click@10s, purchase@10s (ties -> inclusive),
        # purchase@5s (between clicks -> click@0s)
        (1, T0, 1, "click", 0.0, "{}"),
        (2, T0 + timedelta(seconds=10), 1, "click", 0.0, "{}"),
        (3, T0 + timedelta(seconds=10), 1, "purchase", 0.0, "{}"),
        (4, T0 + timedelta(seconds=5), 1, "purchase", 0.0, "{}"),
        # user 2: purchase with no click ever -> NULL
        (5, T0, 2, "purchase", 0.0, "{}"),
    ]
    df = _events(spark, rows)
    import mapreducegcp_spark.operators.timeseries as ts

    monkeypatch.setattr(ts, "load_table", lambda *a, **k: df)
    out = {r.event_id: r for r in q_asof_join(spark, SF_DIR).collect()}
    us = lambda dt: int(dt.timestamp() * 1_000_000)
    assert out[3].last_click_us == us(T0 + timedelta(seconds=10))  # inclusive >=
    assert out[3].gap_us == 0
    assert out[4].last_click_us == us(T0)
    assert out[4].gap_us == 5_000_000
    assert out[5].last_click_us is None and out[5].gap_us is None


def test_sessionize_splits_on_gap(spark, monkeypatch):
    gap = timedelta(minutes=_GAP_MIN)
    rows = [
        # user 1: two events gap/2 apart (one session), then a jump of
        # gap+1s (new session)
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + gap / 2, 1, "view", 0.0, "{}"),
        (3, T0 + gap / 2 + gap + timedelta(seconds=1), 1, "view", 0.0, "{}"),
        # user 2: exactly gap apart -> still ONE session (strict >)
        (4, T0, 2, "view", 0.0, "{}"),
        (5, T0 + gap, 2, "view", 0.0, "{}"),
    ]
    df = _events(spark, rows)
    import mapreducegcp_spark.operators.timeseries as ts

    monkeypatch.setattr(ts, "load_table", lambda *a, **k: df)
    out = q_sessionize(spark, SF_DIR).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2
    first = min(by_user[1], key=lambda r: r.session_id)
    assert first.n_events == 2
    assert len(by_user[2]) == 1 and by_user[2][0].n_events == 2


def test_sessionize_covers_all_events(spark):
    out = q_sessionize(spark, SF_DIR)
    from mapreducegcp_spark.sources.catalog import load_table

    total = load_table(spark, SF_DIR, "events").count()
    agg = out.groupBy().sum("n_events").collect()[0][0]
    assert agg == total
