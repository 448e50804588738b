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


def test_autocorrelation_alternating_series(spark, monkeypatch):
    """A perfectly alternating daily series (1, 3, 1, 3, ...) has
    acf(1) = -1 in the circular limit; at n=8 the sample ACF (fixed
    denominator) gives -7/8 at lag 1 and +6/8 at lag 2."""
    import mapreducegcp_spark.operators.timeseries as ts

    rows = [
        (i, datetime(2024, 1, 1 + i), 1, "view", 1.0 if i % 2 == 0 else 3.0, "{}")
        for i in range(8)
    ]
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: _events(spark, rows))
    out = {
        r.lag: r
        for r in ts.q_timeseries_autocorrelation(spark, SF_DIR).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    assert out[1].n_pairs == 7
    assert abs(out[1].acf - (-7 / 8)) < 1e-12
    assert abs(out[2].acf - (6 / 8)) < 1e-12


def test_autocorrelation_constant_series_null(spark, monkeypatch):
    """Zero variance -> acf NULL (guarded), never a division error."""
    import mapreducegcp_spark.operators.timeseries as ts

    rows = [(i, datetime(2024, 1, 1 + i), 1, "view", 5.0, "{}") for i in range(4)]
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: _events(spark, rows))
    out = ts.q_timeseries_autocorrelation(spark, SF_DIR).collect()
    assert len(out) == 3  # lags 1..3 < n=4
    assert all(r.acf is None for r in out)


def test_weekday_seasonal_index_sums_and_ratio(spark, monkeypatch):
    """Two weeks where Sundays run value 8 and all other days 1: the
    Sunday row (dow 0) carries the whole positive seasonal index and
    ratio = 8 / global mean; indexes weighted by n_days sum to ~0."""
    import mapreducegcp_spark.operators.timeseries as ts

    # 2024-01-07 is a Sunday
    rows = [
        (i, datetime(2024, 1, 7 + i), 1, "view",
         8.0 if (datetime(2024, 1, 7 + i).weekday() == 6) else 1.0, "{}")
        for i in range(14)
    ]
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: _events(spark, rows))
    out = {r.dow: r for r in ts.q_timeseries_weekday_seasonal(spark, SF_DIR).collect()}
    assert set(out) == set(range(7))
    gmean = (8.0 * 2 + 1.0 * 12) / 14
    assert abs(out[0].weekday_mean - 8.0) < 1e-12
    assert abs(out[0].global_mean - gmean) < 1e-12
    assert abs(out[0].seasonal_ratio - 8.0 / gmean) < 1e-12
    assert abs(sum(r.seasonal_index * r.n_days for r in out.values())) < 1e-9


def test_theilsen_exact_on_linear_series_with_outlier(spark, monkeypatch):
    """On y = 2*rn + 1 with one wild outlier day, the pairwise-slope
    median still recovers slope 2 exactly (OLS would not)."""
    import mapreducegcp_spark.operators.timeseries as ts

    vals = [2 * i + 1 for i in range(1, 10)]
    vals[4] = 1000  # outlier at rn=5
    rows = [
        (i, datetime(2024, 1, 1 + i), 1, "view", float(vals[i]), "{}")
        for i in range(9)
    ]
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: _events(spark, rows))
    r = ts.q_timeseries_theilsen_trend(spark, SF_DIR).collect()[0]
    assert r.n_days == 9 and r.n_pairs == 36
    assert r.slope_nano == 2_000_000_000  # slope exactly 2
    # median residual of (y - 2*rn) = 1 for all non-outlier days
    assert r.icept_nano == 1_000_000_000


def test_attribution_integer_split_and_window(spark, monkeypatch):
    """1001 cents over two window clicks: earliest gets the remainder
    penny (501/500); a click outside the 1h lookback earns nothing;
    purchases with no window click produce no rows."""
    import mapreducegcp_spark.operators.timeseries as ts

    rows = [
        (1, T0 - timedelta(hours=2), 1, "click", 0.0, "{}"),     # outside
        (2, T0 - timedelta(minutes=30), 1, "click", 0.0, "{}"),  # in window
        (3, T0 - timedelta(minutes=10), 1, "click", 0.0, "{}"),  # in window
        (4, T0, 1, "purchase", 10.01, "{}"),
        (5, T0, 2, "purchase", 99.0, "{}"),                      # no clicks
    ]
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: _events(spark, rows))
    out = {r.user_id: r for r in ts.q_events_attribution_linear(spark, SF_DIR).collect()}
    assert set(out) == {1}
    r = out[1]
    assert (r.n_purchases, r.n_credited_clicks, r.credited_cents) == (1, 2, 1001)


def test_abandonment_forward_window(spark, monkeypatch):
    """Click converted by a purchase 30 min later; a lone click and a
    click whose purchase is 2h away are abandoned; same-second
    purchase counts as converted (inclusive bound)."""
    import mapreducegcp_spark.operators.timeseries as ts

    rows = [
        (1, T0, 1, "click", 0.0, "{}"),
        (2, T0 + timedelta(minutes=30), 1, "purchase", 1.0, "{}"),
        (3, T0 + timedelta(hours=3), 1, "click", 0.0, "{}"),     # abandoned
        (4, T0 + timedelta(hours=6), 1, "purchase", 1.0, "{}"),  # 3h later
        (5, T0, 2, "click", 0.0, "{}"),                          # abandoned
        (6, T0, 3, "click", 0.0, "{}"),
        (7, T0, 3, "purchase", 1.0, "{}"),                       # same second
    ]
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: _events(spark, rows))
    out = {r.user_id: r for r in ts.q_funnel_abandonment_window(spark, SF_DIR).collect()}
    assert (out[1].n_clicks, out[1].n_abandoned) == (2, 1)
    assert (out[2].n_clicks, out[2].n_abandoned) == (1, 1)
    assert (out[3].n_clicks, out[3].n_abandoned) == (1, 0)
    assert out[2].abandonment_rate == 1.0


def test_moving_median_ignores_spike(spark, monkeypatch):
    """Daily values 10,10,1000,10,10: the 7-day trailing median never
    leaves 10 after day 1 except the even-count interpolations; the
    spike day's own median is still pinned by the neighbors."""
    import mapreducegcp_spark.operators.timeseries as ts

    vals = [10.0, 10.0, 1000.0, 10.0, 10.0]
    rows = [
        (i, datetime(2024, 1, 1 + i), 1, "view", vals[i], "{}")
        for i in range(5)
    ]
    monkeypatch.setattr(ts, "load_table", lambda *a, **k: _events(spark, rows))
    out = sorted(
        ts.q_timeseries_moving_median(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    meds = [r.med7 for r in out]
    # cents = value * 10000; windows: [10],[10,10],[10,10,1000],
    # [10,10,10,1000] (even: (10+10)/2), [10,10,10,10,1000]
    assert meds == [100000.0, 100000.0, 100000.0, 100000.0, 100000.0]
    assert out[2].cents == 10_000_000
