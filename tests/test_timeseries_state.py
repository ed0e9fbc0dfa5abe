"""latest_state (changelog compaction) and rolling_event_window vs
plain-Python twins, plus the plan properties that make them scale."""

from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def changelog(spark):
    rows = []
    eid = 0
    for user in range(5):
        for k in range(user + 1):  # ragged histories, incl. single-row
            rows.append((eid, BASE + timedelta(hours=k, seconds=user), user,
                         f"state{k}", float(k) * 1.5))
            eid += 1
    # ts tie inside user 4: two rows at the same timestamp, event_id breaks it
    rows.append((eid, BASE + timedelta(hours=4, seconds=4), 4, "tie", 99.0))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_latest_state_matches_python(changelog):
    from sparkglm_spark.operators.timeseries import latest_state

    got = {
        r.user_id: (r.event_id, r.event_type, r.value)
        for r in latest_state(
            changelog, ["user_id"], ["ts", "event_id"], ["event_type", "value"]
        ).collect()
    }
    want = {}
    for r in changelog.collect():
        cur = want.get(r.user_id)
        if cur is None or (r.ts, r.event_id) > (cur[0], cur[1]):
            want[r.user_id] = (r.ts, r.event_id, r.event_type, r.value)
    assert got == {u: (v[1], v[2], v[3]) for u, v in want.items()}
    # the ts tie resolved to the HIGHER event_id
    assert got[4][1] == "tie"


def test_latest_state_plan_is_partial_aggregable(changelog):
    from sparkglm_spark.operators.timeseries import latest_state

    plan = (
        latest_state(changelog, ["user_id"], ["ts", "event_id"], ["value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partial + final aggregate, no Window sort of the full history —
    # pin the actual partial_max_by marker (a bare "partial" matches any
    # two-phase aggregate and would let a non-combinable rewrite slip by)
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_rolling_event_window_matches_python(changelog):
    from sparkglm_spark.operators.timeseries import rolling_event_window

    win_s = 2 * 3600  # 2 hours
    out = rolling_event_window(changelog, "ts", ["user_id"], "value", win_s)
    got = {r.event_id: (r.n_window, r.sum_window) for r in out.collect()}
    rows = changelog.collect()
    for r in rows:
        peers = [
            x for x in rows
            if x.user_id == r.user_id
            and r.ts - timedelta(seconds=win_s) <= x.ts <= r.ts
        ]
        assert got[r.event_id][0] == len(peers), r.event_id
        assert got[r.event_id][1] == pytest.approx(
            sum(x.value for x in peers), rel=1e-12
        )


def test_rolling_window_partition_invariant(changelog):
    from sparkglm_spark.operators.timeseries import rolling_event_window

    def run(df):
        return sorted(
            (r.event_id, r.n_window, round(r.sum_window, 9))
            for r in rolling_event_window(df, "ts", ["user_id"], "value", 3600).collect()
        )

    assert run(changelog.coalesce(1)) == run(changelog.repartition(8))


def test_rolling_window_validation(changelog):
    from sparkglm_spark.operators.timeseries import rolling_event_window

    with pytest.raises(ValueError):
        rolling_event_window(changelog, "ts", ["user_id"], "value", 0)


def test_rolling_window_numeric_ts_uses_raw_units(spark):
    """A numeric ts column is taken in its own units — the frame must NOT
    get the microsecond scaling (a 1e6x-too-wide window would silently
    aggregate each key's entire history)."""
    from sparkglm_spark.operators.timeseries import rolling_event_window

    rows = [(i, float(t), 1, 1.0) for i, t in enumerate([0, 10, 25, 100])]
    df = spark.createDataFrame(rows, "event_id long, ts double, user_id long, value double")
    out = {r.event_id: r.n_window for r in
           rolling_event_window(df, "ts", ["user_id"], "value", 20).collect()}
    # window [t-20, t]: t=0 ->1, t=10 ->2, t=25 ->2 (10,25), t=100 ->1
    assert out == {0: 1, 1: 2, 2: 2, 3: 1}


@pytest.mark.parametrize("seed,win", [(5, 1), (6, 10), (7, 1000)])
def test_rolling_window_randomized_numeric_sweep(spark, seed, win):
    """Seeded random numeric-ts sweep across window widths (1 = mostly
    self-only, 1000 = whole history): the RANGE frame must equal the O(n²)
    python definition including duplicate timestamps — which a ROWS frame
    would get wrong."""
    import random

    from sparkglm_spark.operators.timeseries import rolling_event_window

    rng = random.Random(seed)
    rows = [
        (i, rng.randrange(3), rng.randrange(50), round(rng.uniform(-5, 5), 3))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double"
    )
    out = rolling_event_window(df, "ts", ["user_id"], "value", win)
    got = {r.event_id: (r.n_window, round(r.sum_window, 9)) for r in out.collect()}
    for eid, uid, ts, _v in rows:
        peers = [x for x in rows if x[1] == uid and ts - win <= x[2] <= ts]
        assert got[eid][0] == len(peers), (seed, win, eid)
        assert got[eid][1] == pytest.approx(
            sum(x[3] for x in peers), abs=1e-9
        ), (seed, win, eid)


def test_ewma_latest_matches_pandas(changelog):
    """adjusted EWMA state per key == pandas ewm(adjust=True).mean() tail."""
    import pandas as pd

    from sparkglm_spark.operators.timeseries import ewma_latest

    got = {
        r.user_id: r
        for r in ewma_latest(
            changelog, "user_id", "ts", "value", alpha=0.3, tiebreak_col="event_id"
        ).collect()
    }
    pdf = changelog.toPandas().sort_values(["ts", "event_id"], kind="mergesort")
    for user, grp in pdf.groupby("user_id"):
        want = grp["value"].ewm(alpha=0.3, adjust=True).mean().iloc[-1]
        assert got[user].ewma == pytest.approx(want, rel=1e-12), user
        assert got[user].n_events == len(grp)
        assert got[user].last_ts == grp["ts"].max()


def test_ewma_latest_single_shuffle(changelog):
    """the groupBy(key) must reuse the window's hash partitioning — exactly
    ONE exchange in the whole plan."""
    from sparkglm_spark.operators.timeseries import ewma_latest
    from sparkglm_spark.plans.inspect import exchange_schemas

    out = ewma_latest(changelog, "user_id", "ts", "value", 0.5, "event_id")
    exch = exchange_schemas(out)
    # window hash exchange + final presentation range-sort only — the
    # groupBy(key) must NOT add a third
    assert len(exch) == 2
    hash_exch = [e for e in exch if "hashpartitioning" in e["arguments"]]
    assert len(hash_exch) == 1
    assert "user_id" in hash_exch[0]["arguments"]


def test_ewma_series_matches_recursion(changelog):
    """applyInPandas trajectory == the hand-rolled recursion, both flags."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import ewma_series

    for adjust in (False, True):
        got = ewma_series(
            changelog, "user_id", "ts", "value", alpha=0.4, adjust=adjust
        ).collect()
        by_key: dict = {}
        for r in sorted(got, key=lambda r: (r.user_id, r.ts)):
            by_key.setdefault(r.user_id, []).append(r)
        pdf = changelog.toPandas().sort_values(["ts"], kind="mergesort")
        for user, grp in pdf.groupby("user_id"):
            xs = grp["value"].to_numpy()
            if adjust:
                want = []
                for t in range(len(xs)):
                    w = (1 - 0.4) ** np.arange(t, -1, -1)
                    want.append((w * xs[: t + 1]).sum() / w.sum())
            else:
                s = xs[0]
                want = [s]
                for x in xs[1:]:
                    s = 0.4 * x + 0.6 * s
                    want.append(s)
            rows = by_key[user]
            assert len(rows) == len(xs)
            for r, wv in zip(rows, want):
                assert r.ewma == pytest.approx(wv, rel=1e-12), (user, adjust)


def test_ewma_alpha_guard(changelog):
    from sparkglm_spark.operators.timeseries import ewma_latest, ewma_series

    with pytest.raises(ValueError, match="alpha"):
        ewma_latest(changelog, "user_id", "ts", "value", 1.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma_series(changelog, "user_id", "ts", "value", 0.0)

def test_holt_series_matches_hand_recursion(spark):
    import numpy as np

    from sparkglm_spark.operators.timeseries import holt_series

    rng = np.random.default_rng(21)
    rows = []
    truth = {}
    for key in ("a", "b"):
        n = 40
        x = np.cumsum(rng.normal(0.5, 1.0, n)) + 10  # drifting series
        ts = [f"2024-01-01 00:00:{i:02d}" for i in range(n)]
        rows += [(key, t, float(v), i) for i, (t, v) in enumerate(zip(ts, x))]
        a, b = 0.4, 0.3
        lvl = np.empty(n); trd = np.empty(n); fit = np.full(n, np.nan)
        lvl[0], trd[0] = x[0], x[1] - x[0]
        for i in range(1, n):
            fit[i] = lvl[i-1] + trd[i-1]
            lvl[i] = a * x[i] + (1-a) * fit[i]
            trd[i] = b * (lvl[i] - lvl[i-1]) + (1-b) * trd[i-1]
        truth[key] = (x, lvl, trd, fit)
    df = spark.createDataFrame(
        rows, "k string, ts_s string, v double, eid long"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v", "eid").repartition(5)

    out = holt_series(df, "k", "ts", "v", 0.4, 0.3, tiebreak_col="eid")
    for key in ("a", "b"):
        got = [r for r in out.where(F.col("k") == key).orderBy("ts").collect()]
        x, lvl, trd, fit = truth[key]
        np.testing.assert_allclose([r.level for r in got], lvl, rtol=1e-12)
        np.testing.assert_allclose([r.trend for r in got], trd, rtol=1e-12)
        assert got[0].fitted is None  # true SQL NULL, not NaN
        np.testing.assert_allclose([r.fitted for r in got][1:], fit[1:], rtol=1e-12)

    # forecast = level + h*trend from the end state
    from sparkglm_spark.operators.timeseries import holt_forecast

    fc = {r.k: r for r in holt_forecast(
        df, "k", "ts", "v", 0.4, 0.3, horizons=[1, 5], tiebreak_col="eid"
    ).collect()}
    for key in ("a", "b"):
        _, lvl, trd, _ = truth[key]
        assert fc[key].level == pytest.approx(lvl[-1], rel=1e-12)
        assert fc[key].trend == pytest.approx(trd[-1], rel=1e-12)
        assert fc[key].forecast_1 == pytest.approx(lvl[-1] + trd[-1], rel=1e-12)
        assert fc[key].forecast_5 == pytest.approx(lvl[-1] + 5 * trd[-1], rel=1e-12)
        assert fc[key].n_events == 40
    # a strongly drifting series: Holt's 5-step forecast beats the flat EWMA
    # guard rails
    with pytest.raises(ValueError, match="alpha"):
        holt_series(df, "k", "ts", "v", 1.5, 0.3)
    with pytest.raises(ValueError, match="beta"):
        holt_forecast(df, "k", "ts", "v", 0.4, 0.0)
    with pytest.raises(ValueError, match="horizons"):
        holt_forecast(df, "k", "ts", "v", 0.4, 0.3, horizons=[])


def test_holt_single_row_key(spark):
    from sparkglm_spark.operators.timeseries import holt_forecast, holt_series

    df = spark.createDataFrame(
        [("solo", "2024-01-01 00:00:00", 7.0)], "k string, ts_s string, v double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    r = holt_series(df, "k", "ts", "v", 0.5, 0.5).collect()[0]
    assert r.level == 7.0 and r.trend == 0.0
    f = holt_forecast(df, "k", "ts", "v", 0.5, 0.5, horizons=[3]).collect()[0]
    assert f.forecast_3 == 7.0


def test_smoothing_family_null_policy(spark):
    """Family-wide null policy (VERDICT r8 defect): a null/NaN value row
    is DROPPED before the fold — it neither appears in the output nor
    NaN-poisons the rest of the key's recursion — consistently across
    ewma_latest / ewma_series / holt_series / holt_forecast."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import (
        ewma_latest,
        ewma_series,
        holt_forecast,
        holt_series,
    )

    vals = [3.0, None, 7.0, float("nan"), 4.0, 9.0]
    rows = [("k", f"2024-01-01 00:00:{i:02d}", v) for i, v in enumerate(vals)]
    rows += [("allnull", f"2024-01-01 00:00:{i:02d}", None) for i in range(3)]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, v double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    kept = [3.0, 7.0, 4.0, 9.0]

    hs = holt_series(df, "k", "ts", "v", 0.4, 0.3).orderBy("ts").collect()
    assert [r.k for r in hs] == ["k"] * 4  # all-null key absent, nulls gone
    lvl = [kept[0]]
    trd = [kept[1] - kept[0]]
    for x in kept[1:]:
        f = lvl[-1] + trd[-1]
        lvl.append(0.4 * x + 0.6 * f)
        trd.append(0.3 * (lvl[-1] - lvl[-2]) + 0.7 * trd[-1])
    np.testing.assert_allclose([r.level for r in hs], lvl, rtol=1e-12)
    np.testing.assert_allclose([r.trend for r in hs], trd, rtol=1e-12)
    assert not any(np.isnan(r.level) for r in hs)  # the r8 poison bug

    fc = holt_forecast(df, "k", "ts", "v", 0.4, 0.3, horizons=[2]).collect()
    assert [r.k for r in fc] == ["k"]
    assert fc[0].n_events == 4
    assert fc[0].forecast_2 == pytest.approx(lvl[-1] + 2 * trd[-1], rel=1e-12)

    es = ewma_series(df, "k", "ts", "v", 0.5).orderBy("ts").collect()
    assert [r.k for r in es] == ["k"] * 4
    s = [kept[0]]
    for x in kept[1:]:
        s.append(0.5 * x + 0.5 * s[-1])
    np.testing.assert_allclose([r.ewma for r in es], s, rtol=1e-12)

    el = ewma_latest(df, "k", "ts", "v", 0.5).collect()
    assert [r.k for r in el] == ["k"]
    assert el[0].n_events == 4
    w = [0.5**i for i in range(4)]  # rank 0 = newest retained row
    want = sum(wi * x for wi, x in zip(w, reversed(kept))) / sum(w)
    assert el[0].ewma == pytest.approx(want, rel=1e-12)


def test_holt_winters_matches_hand_recursion(spark):
    """holt_winters_series/forecast vs an independent hand recursion
    (classical two-season init): level/trend/seasonal/fitted at 1e-12,
    forecasts through the phase-correct seasonal slot, short keys and
    the family null policy."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import (
        holt_winters_forecast,
        holt_winters_series,
    )

    m, a, b, g = 4, 0.5, 0.25, 0.5
    rng = np.random.default_rng(33)
    season_true = [3.0, -1.0, -2.5, 0.5]
    n = 40
    x = np.array([
        10.0 + 0.3 * t + season_true[t % m] + rng.normal(0, 0.2)
        for t in range(n)
    ])
    rows = [("k", f"2024-01-01 00:00:{t:02d}", float(v), t)
            for t, v in enumerate(x)]
    rows += [("short", f"2024-01-01 00:00:{t:02d}", float(t), t)
             for t in range(2 * m - 1)]  # too short to initialize
    rows += [("k", "2024-01-01 00:01:40", None, 99)]  # null dropped
    df = spark.createDataFrame(
        rows, "k string, ts_s string, v double, eid long"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v", "eid")

    # independent hand recursion
    l = float(np.mean(x[:m]))
    bb = float((np.mean(x[m:2 * m]) - np.mean(x[:m])) / m)
    s = [float(v) - l for v in x[:m]]
    want = []
    for t in range(m, n):
        fit = l + bb + s[t % m]
        l_new = a * (x[t] - s[t % m]) + (1 - a) * (l + bb)
        bb = b * (l_new - l) + (1 - b) * bb
        s[t % m] = g * (x[t] - l_new) + (1 - g) * s[t % m]
        l = l_new
        want.append((l, bb, s[t % m], fit))

    out = holt_winters_series(
        df, "k", "ts", "v", a, b, g, period=m, tiebreak_col="eid"
    )
    got = out.where(F.col("k") == "k").orderBy("ts").collect()
    assert len(got) == n  # the null row is gone
    for r in got[:m]:
        assert r.level is None and r.fitted is None
    for r, (wl, wb, ws, wf) in zip(got[m:], want):
        assert r.level == pytest.approx(wl, rel=1e-12)
        assert r.trend == pytest.approx(wb, rel=1e-12)
        assert r.seasonal == pytest.approx(ws, rel=1e-12)
        assert r.fitted == pytest.approx(wf, rel=1e-12)
    srows = out.where(F.col("k") == "short").collect()
    assert len(srows) == 2 * m - 1
    assert all(r.level is None for r in srows)

    fc = {r.k: r for r in holt_winters_forecast(
        df, "k", "ts", "v", a, b, g, period=m, horizons=[1, 2, m + 1],
        tiebreak_col="eid",
    ).collect()}
    r = fc["k"]
    assert r.level == pytest.approx(l, rel=1e-12)
    assert r.trend == pytest.approx(bb, rel=1e-12)
    # ŷ_{T+h} = l + h·b + s[(T+h) mod m]; T = n - 1 in 0-based phase n
    for h in (1, 2, m + 1):
        wf = l + h * bb + s[(n + h - 1) % m]
        assert getattr(r, f"forecast_{h}") == pytest.approx(wf, rel=1e-12), h
    # forecasts one period apart differ by exactly period·trend
    assert r.forecast_5 - r.forecast_1 == pytest.approx(m * bb, rel=1e-9)
    assert fc["short"].level is None and fc["short"].forecast_1 is None
    assert fc["short"].n_events == 2 * m - 1
    with pytest.raises(ValueError, match="gamma"):
        holt_winters_series(df, "k", "ts", "v", a, b, 1.0, period=m)
    with pytest.raises(ValueError, match="period"):
        holt_winters_forecast(df, "k", "ts", "v", a, b, g, period=1)


def test_ljung_box_levels_and_power(spark):
    """ljung_box vs a hand acf/Q computation; white noise passes, an
    AR(1) series fails hard, residuals of a good Holt fit on a trend
    series pass; short/constant keys report NULLs."""
    import numpy as np

    from sparkglm_spark.functions.special import chisq_sf
    from sparkglm_spark.operators.timeseries import holt_series, ljung_box

    rng = np.random.default_rng(44)
    n = 300
    white = rng.normal(0, 1, n)
    ar = np.empty(n)
    ar[0] = 0.0
    for t in range(1, n):
        ar[t] = 0.7 * ar[t - 1] + rng.normal(0, 1)
    rows = [("white", f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}", float(v), t)
            for t, v in enumerate(white)]
    rows += [("ar", f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}", float(v), t)
             for t, v in enumerate(ar)]
    rows += [("short", "2024-01-01 00:00:01", 1.0, 0),
             ("short", "2024-01-01 00:00:02", 2.0, 1)]
    rows += [("const", f"2024-01-01 00:00:{t:02d}", 7.0, t) for t in range(30)]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, v double, eid long"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v", "eid")
    out = {r.k: r for r in ljung_box(df, "k", "ts", "v", lags=10,
                                     tiebreak_col="eid").collect()}
    # hand twin for the white key
    e = white - white.mean()
    denom = float(e @ e)
    acf = np.array([float(e[k:] @ e[:-k]) / denom for k in range(1, 11)])
    q = float(n * (n + 2) * np.sum(acf**2 / (n - np.arange(1, 11))))
    assert out["white"].q_stat == pytest.approx(q, rel=1e-10)
    assert out["white"].p_value == pytest.approx(chisq_sf(q, 10), rel=1e-10)
    assert out["white"].p_value > 0.01          # level
    assert out["ar"].p_value < 1e-10            # power
    assert out["short"].q_stat is None and out["const"].q_stat is None
    # the full loop: Holt residuals of a clean trend series are white
    trend = 5.0 + 0.4 * np.arange(n) + rng.normal(0, 1, n)
    tdf = spark.createDataFrame(
        [("t", f"2024-01-01 00:{t // 60:02d}:{t % 60:02d}", float(v), t)
         for t, v in enumerate(trend)],
        "k string, ts_s string, v double, eid long",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v", "eid")
    resid = holt_series(tdf, "k", "ts", "v", 0.3, 0.1, tiebreak_col="eid").select(
        "k", "ts", (F.col("v") - F.col("fitted")).alias("r"),
        F.monotonically_increasing_id().alias("eid"),
    ).where(F.col("r").isNotNull())
    lb = ljung_box(resid, "k", "ts", "r", lags=5).collect()[0]
    assert lb.p_value > 1e-4  # no gross structure left
    with pytest.raises(ValueError, match="lags"):
        ljung_box(df, "k", "ts", "v", lags=0)


def test_seasonal_decompose_recovers_planted_components(spark):
    """seasonal_decompose on x = trend + seasonal: recovers the planted
    pieces (linear trend exactly under the centered MA away from edges;
    seasonal to the plant up to centering), components re-add to x,
    seasonal repeats per cycle and sums to ~0; odd and even periods;
    short keys NULL."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import seasonal_decompose

    for m, season in ((4, [2.0, -1.0, -2.0, 1.0]), (3, [1.5, -0.5, -1.0])):
        n = 36
        x = np.array([10.0 + 0.5 * t + season[t % m] for t in range(n)])
        rows = [("k", f"2024-01-01 00:00:{t:02d}", float(v), t)
                for t, v in enumerate(x)]
        rows += [("short", f"2024-01-01 00:00:{t:02d}", float(t), t)
                 for t in range(2 * m - 1)]
        df = spark.createDataFrame(
            rows, "k string, ts_s string, v double, eid long"
        ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v", "eid")
        got = (
            seasonal_decompose(df, "k", "ts", "v", period=m, tiebreak_col="eid")
            .where(F.col("k") == "k").orderBy("ts").collect()
        )
        assert len(got) == n
        half = m // 2
        for t, r in enumerate(got):
            if r.trend is not None:
                # centered MA of a linear trend + zero-mean seasonal is the
                # trend itself (exact — the seasonal sums to 0 per window)
                assert r.trend == pytest.approx(10.0 + 0.5 * t, abs=1e-9), (m, t)
                assert r.resid == pytest.approx(0.0, abs=1e-9), (m, t)
            else:
                assert t < half or t >= n - half, (m, t)
        # seasonal identical every cycle, sums to ~0, matches the plant
        svals = [r.seasonal for r in got]
        for t in range(m, n):
            assert svals[t] == pytest.approx(svals[t - m], abs=1e-12)
        assert sum(svals[:m]) == pytest.approx(0.0, abs=1e-9)
        splant = np.array(season) - np.mean(season)
        for p in range(m):
            assert svals[p] == pytest.approx(float(splant[p]), abs=1e-9), (m, p)
        short = seasonal_decompose(
            df.where(F.col("k") == "short"), "k", "ts", "v", period=m
        ).collect()
        assert all(r.trend is None and r.resid is None for r in short)
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, "k", "ts", "v", period=1)


def test_holt_forecast_intervals_hand_recursion(spark):
    """interval=True (VERDICT r9 #7): se_h must equal the hand
    innovations recursion — σ̂² = SSE/(n−2) (the first residual is
    structurally zero under the l₁=x₁, b₁=x₂−x₁ init — ADVICE r10),
    Var_h = σ̂²(1 + Σ_{j<h} c_j²) with c_j = α(1+jβ) — and the c_j
    closed form itself is asserted against a deterministic unit-impulse
    run of the (linear) fold. Keys with n < 3 (no informative residual)
    report NULL se/lo/hi."""
    from sparkglm_spark.functions.special import norm_ppf
    from sparkglm_spark.operators.timeseries import holt_forecast

    alpha, beta = 0.4, 0.3
    rng = np.random.default_rng(21)
    x = 5.0 + 0.3 * np.arange(40) + rng.normal(0, 0.5, 40)
    rows = [("a", f"2024-01-{i // 24 + 1:02d} {i % 24:02d}:00:00", float(v))
            for i, v in enumerate(x)] + [("solo", "2024-01-01 00:00:00", 7.0)]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, v double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    got = {r.k: r for r in holt_forecast(
        df, "k", "ts", "v", alpha, beta, horizons=[1, 4],
        interval=True, level=0.9,
    ).collect()}

    # hand recursion: fold + residuals
    lvl, trd, sse = x[0], x[1] - x[0], 0.0
    for i in range(1, len(x)):
        fit = lvl + trd
        sse += (x[i] - fit) ** 2
        prev = lvl
        lvl = alpha * x[i] + (1 - alpha) * fit
        trd = beta * (lvl - prev) + (1 - beta) * trd
    sig2 = sse / (len(x) - 2)
    z = norm_ppf(0.95)
    for h in (1, 4):
        v = 1.0 + sum((alpha * (1 + j * beta)) ** 2 for j in range(1, h))
        se = np.sqrt(sig2 * v)
        r = got["a"]
        assert getattr(r, f"se_{h}") == pytest.approx(float(se), rel=1e-12)
        fc = lvl + h * trd
        assert getattr(r, f"lo_{h}") == pytest.approx(float(fc - z * se), rel=1e-12)
        assert getattr(r, f"hi_{h}") == pytest.approx(float(fc + z * se), rel=1e-12)
    assert got["a"].se_1 < got["a"].se_4  # widening with horizon
    assert got["solo"].se_1 is None and got["solo"].lo_4 is None

    # a 2-row key's only residual is the structural zero — se must be
    # NULL, not 0 (a zero-width "interval" would claim false certainty)
    two = spark.createDataFrame(
        [("p", 1, 4.0), ("p", 2, 9.0)], "k string, t long, v double"
    )
    r2 = holt_forecast(
        two, "k", "t", "v", alpha, beta, horizons=[1], interval=True
    ).collect()[0]
    assert r2.forecast_1 is not None and r2.se_1 is None and r2.hi_1 is None

    # impulse identity: the fold is linear in x, so bumping the last
    # observation by 1 must move the j-step forecast by exactly c_j
    def holt_fc(arr, h):
        l, b = arr[0], arr[1] - arr[0]
        for i in range(1, len(arr)):
            p, f = l, l + b
            l = alpha * arr[i] + (1 - alpha) * f
            b = beta * (l - p) + (1 - beta) * b
        return l + h * b
    for j in (1, 3, 5):
        d = holt_fc(np.append(x, 9.0 + 1.0), j) - holt_fc(np.append(x, 9.0), j)
        assert d == pytest.approx(alpha * (1 + j * beta), abs=1e-10)

    with pytest.raises(ValueError, match="level"):
        holt_forecast(df, "k", "ts", "v", alpha, beta, interval=True, level=1.5)


def test_holt_damped_trend(spark):
    """Gardner-McKenzie damped trend (phi < 1, VERDICT r10 #5):
    holt_series/holt_forecast match the hand recursion at 1e-12;
    forecasts use phi_h = sum phi^i and flatten toward
    l + phi/(1-phi)*b; interval c_j = alpha(1 + beta*phi_j) equals a
    deterministic unit-impulse run of the damped fold; and phi=1 is
    BIT-identical to the phi-less call (pins unaffected)."""
    from sparkglm_spark.functions.special import norm_ppf
    from sparkglm_spark.operators.timeseries import holt_forecast, holt_series

    alpha, beta, phi = 0.4, 0.3, 0.8
    rng = np.random.default_rng(33)
    x = np.cumsum(rng.normal(0.5, 1.0, 40)) + 10
    rows = [("a", f"2024-01-01 00:00:{i:02d}", float(v), i)
            for i, v in enumerate(x)]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, v double, eid long"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v", "eid")

    # hand recursion (damped)
    n = len(x)
    lvl = np.empty(n); trd = np.empty(n); fit = np.full(n, np.nan)
    lvl[0], trd[0] = x[0], x[1] - x[0]
    sse = 0.0
    for i in range(1, n):
        fit[i] = lvl[i - 1] + phi * trd[i - 1]
        if i > 1:  # t=2 residual is init-spent ((1-phi)(x2-x1)), excluded
            sse += (x[i] - fit[i]) ** 2
        lvl[i] = alpha * x[i] + (1 - alpha) * fit[i]
        trd[i] = beta * (lvl[i] - lvl[i - 1]) + (1 - beta) * phi * trd[i - 1]

    got = holt_series(
        df, "k", "ts", "v", alpha, beta, tiebreak_col="eid", phi=phi
    ).orderBy("ts").collect()
    np.testing.assert_allclose([r.level for r in got], lvl, rtol=1e-12)
    np.testing.assert_allclose([r.trend for r in got], trd, rtol=1e-12)
    np.testing.assert_allclose([r.fitted for r in got][1:], fit[1:], rtol=1e-12)

    fc = holt_forecast(
        df, "k", "ts", "v", alpha, beta, horizons=[1, 3, 50],
        tiebreak_col="eid", phi=phi, interval=True, level=0.9,
    ).collect()[0]
    phis = np.cumsum([phi ** i for i in range(1, 51)])
    assert fc.forecast_1 == pytest.approx(lvl[-1] + phi * trd[-1], rel=1e-12)
    assert fc.forecast_3 == pytest.approx(lvl[-1] + phis[2] * trd[-1], rel=1e-12)
    # damping: the infinite-horizon forecast is FINITE, l + phi/(1-phi)*b
    limit = lvl[-1] + phi / (1 - phi) * trd[-1]
    assert fc.forecast_50 == pytest.approx(limit, rel=1e-6)
    # interval: sigma2 = SSE/(n-2), c_j = alpha(1 + beta*phi_j)
    sig2 = sse / (n - 2)
    z = norm_ppf(0.95)
    for h in (1, 3):
        v = 1.0 + sum(
            (alpha * (1 + beta * phis[j - 1])) ** 2 for j in range(1, h)
        )
        se = float(np.sqrt(sig2 * v))
        assert getattr(fc, f"se_{h}") == pytest.approx(se, rel=1e-12)
        fch = getattr(fc, f"forecast_{h}")
        assert getattr(fc, f"lo_{h}") == pytest.approx(fch - z * se, rel=1e-12)

    # unit-impulse identity on the DAMPED fold: bumping the last
    # observation by 1 moves the h-step forecast by exactly c_h
    def damped_fc(arr, h):
        l, b = arr[0], arr[1] - arr[0]
        for i in range(1, len(arr)):
            p, f = l, l + phi * b
            l = alpha * arr[i] + (1 - alpha) * f
            b = beta * (l - p) + (1 - beta) * phi * b
        return l + sum(phi ** i for i in range(1, h + 1)) * b
    for h in (1, 3, 5):
        d = damped_fc(np.append(x, 9.0 + 1.0), h) - damped_fc(np.append(x, 9.0), h)
        assert d == pytest.approx(alpha * (1 + beta * phis[h - 1]), abs=1e-10)

    # phi=1 is BIT-identical to the phi-less call (oracle pins unaffected)
    a1 = holt_forecast(
        df, "k", "ts", "v", alpha, beta, horizons=[3],
        tiebreak_col="eid", interval=True,
    ).collect()[0]
    a2 = holt_forecast(
        df, "k", "ts", "v", alpha, beta, horizons=[3],
        tiebreak_col="eid", interval=True, phi=1.0,
    ).collect()[0]
    for c in ("level", "trend", "forecast_3", "se_3", "lo_3", "hi_3"):
        assert getattr(a1, c) == getattr(a2, c), c
    s1 = holt_series(df, "k", "ts", "v", alpha, beta, tiebreak_col="eid")
    s2 = holt_series(
        df, "k", "ts", "v", alpha, beta, tiebreak_col="eid", phi=1.0
    )
    for r1, r2 in zip(s1.orderBy("ts").collect(), s2.orderBy("ts").collect()):
        assert (r1.level, r1.trend, r1.fitted) == (r2.level, r2.trend, r2.fitted)

    with pytest.raises(ValueError, match="phi"):
        holt_series(df, "k", "ts", "v", alpha, beta, phi=0.0)
    with pytest.raises(ValueError, match="phi"):
        holt_forecast(df, "k", "ts", "v", alpha, beta, phi=1.2)


def test_hw_forecast_intervals_hand_recursion_and_impulse(spark):
    """Holt-Winters interval: c_j = α(1+jβ) + γ(1−α)·1{j≡0 mod m} — the
    seasonal impulse is γ(1−α) because our recursion smooths the slot
    against (x − l_t) AFTER the level update. Asserted two ways: the
    closed form against a unit-impulse run of `_hw_fold` (linear), and
    se_h against the hand recursion over the fold's residuals."""
    from sparkglm_spark.functions.special import norm_ppf
    from sparkglm_spark.operators.timeseries import (
        _hw_fold,
        holt_winters_forecast,
    )

    alpha, beta, gamma, m = 0.4, 0.3, 0.25, 4
    rng = np.random.default_rng(33)
    x = (10 + 0.5 * np.arange(48)
         + np.tile([2.0, -1.0, 0.5, -1.5], 12) + rng.normal(0, 0.5, 48))

    def hw_fc(arr, h):
        l, b, season, phase, *_ = _hw_fold(arr, alpha, beta, gamma, m)
        return l + h * b + season[(phase + h - 1) % m]

    for j in (1, 3, 4, 8):
        d = hw_fc(np.append(x, 11.0 + 1.0), j) - hw_fc(np.append(x, 11.0), j)
        cj = alpha * (1 + j * beta) + (gamma * (1 - alpha) if j % m == 0 else 0)
        assert d == pytest.approx(cj, abs=1e-10)

    rows = [("a", f"2024-01-{i // 24 + 1:02d} {i % 24:02d}:00:00", float(v))
            for i, v in enumerate(x)]
    df = spark.createDataFrame(
        rows, "k string, ts_s string, v double"
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v")
    r = holt_winters_forecast(
        df, "k", "ts", "v", alpha, beta, gamma, period=m,
        horizons=[1, 5], interval=True,
    ).collect()[0]
    l, b, season, phase, fitted, *_ = _hw_fold(x, alpha, beta, gamma, m)
    e = x[m:] - fitted
    sig2 = float(e @ e) / len(e)
    z = norm_ppf(0.975)
    for h in (1, 5):
        v = 1.0 + sum(
            (alpha * (1 + j * beta)
             + (gamma * (1 - alpha) if j % m == 0 else 0.0)) ** 2
            for j in range(1, h)
        )
        se = np.sqrt(sig2 * v)
        assert getattr(r, f"se_{h}") == pytest.approx(float(se), rel=1e-12)
        fc = l + h * b + season[(phase + h - 1) % m]
        assert getattr(r, f"lo_{h}") == pytest.approx(float(fc - z * se), rel=1e-12)
    # a short key reports NULL interval columns alongside the NULL state
    short = holt_winters_forecast(
        df.limit(5), "k", "ts", "v", alpha, beta, gamma, period=m,
        horizons=[2], interval=True,
    ).collect()[0]
    assert short.level is None and short.se_2 is None and short.hi_2 is None


def test_hw_damped_trend(spark):
    """Damped-trend Holt-Winters ((A,Ad,·), phi < 1 through the shared
    _hw_fold): series/forecast match the hand recursion; forecasts use
    phi_h = sum phi^i; interval c_j = alpha(1 + beta*phi_j) +
    gamma(1-alpha)*1{j==0 mod m} equals a unit-impulse run of the
    damped fold; phi=1 is BIT-identical to the phi-less call."""
    from sparkglm_spark.functions.special import norm_ppf
    from sparkglm_spark.operators.timeseries import (
        _hw_fold,
        holt_winters_forecast,
        holt_winters_series,
    )

    alpha, beta, gamma, m, phi = 0.4, 0.3, 0.25, 4, 0.8
    rng = np.random.default_rng(41)
    x = (10 + 0.5 * np.arange(48)
         + np.tile([2.0, -1.0, 0.5, -1.5], 12) + rng.normal(0, 0.5, 48))
    phis = np.cumsum([phi ** i for i in range(1, 9)])

    # hand recursion (damped, mirroring _hw_fold independently)
    l = float(np.mean(x[:m]))
    b = float((np.mean(x[m:2 * m]) - np.mean(x[:m])) / m)
    season = [float(v) - l for v in x[:m]]
    fitted = []
    for t in range(m, len(x)):
        slot = t % m
        fitted.append(l + phi * b + season[slot])
        ln = alpha * (x[t] - season[slot]) + (1 - alpha) * (l + phi * b)
        b = beta * (ln - l) + (1 - beta) * phi * b
        season[slot] = gamma * (x[t] - ln) + (1 - gamma) * season[slot]
        l = ln
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    r = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[1, 5, 8], interval=True, phi=phi,
    ).collect()[0]
    assert r.level == pytest.approx(l, rel=1e-12)
    assert r.trend == pytest.approx(b, rel=1e-12)
    phase = len(x)
    for h in (1, 5, 8):
        fc = l + phis[h - 1] * b + season[(phase + h - 1) % m]
        assert getattr(r, f"forecast_{h}") == pytest.approx(fc, rel=1e-12), h
    e = np.array(fitted)
    e = x[m:] - e
    sig2 = float(e @ e) / len(e)
    z = norm_ppf(0.975)
    for h in (5, 8):
        v = 1.0 + sum(
            (alpha * (1 + beta * phis[j - 1])
             + (gamma * (1 - alpha) if j % m == 0 else 0.0)) ** 2
            for j in range(1, h)
        )
        se = np.sqrt(sig2 * v)
        assert getattr(r, f"se_{h}") == pytest.approx(float(se), rel=1e-12), h

    # unit-impulse identity on the damped fold
    def hw_fc(arr, h):
        l2, b2, s2, p2, *_ = _hw_fold(arr, alpha, beta, gamma, m, phi=phi)
        return l2 + phis[h - 1] * b2 + s2[(p2 + h - 1) % m]
    for j in (1, 3, 4, 8):
        d = hw_fc(np.append(x, 11.0 + 1.0), j) - hw_fc(np.append(x, 11.0), j)
        cj = (alpha * (1 + beta * phis[j - 1])
              + (gamma * (1 - alpha) if j % m == 0 else 0))
        assert d == pytest.approx(cj, abs=1e-10), j

    # phi=1 is bitwise the phi-less call (hw oracle pins unaffected)
    a1 = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[3], interval=True,
    ).collect()[0]
    a2 = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[3], interval=True, phi=1.0,
    ).collect()[0]
    for c in ("level", "trend", "forecast_3", "se_3", "lo_3", "hi_3"):
        assert getattr(a1, c) == getattr(a2, c), c
    s1 = holt_winters_series(df, "k", "t", "v", alpha, beta, gamma, period=m)
    s2 = holt_winters_series(
        df, "k", "t", "v", alpha, beta, gamma, period=m, phi=1.0
    )
    for r1, r2 in zip(s1.orderBy("t").collect(), s2.orderBy("t").collect()):
        assert (r1.level, r1.trend, r1.seasonal, r1.fitted) == (
            r2.level, r2.trend, r2.seasonal, r2.fitted
        )
    with pytest.raises(ValueError, match="phi"):
        holt_winters_series(
            df, "k", "t", "v", alpha, beta, gamma, period=m, phi=1.5
        )


def test_holt_interval_coverage_property(spark):
    """Property: on series truly generated by the Holt innovations model
    (y_t = l+b+ε, states updated with the same ε), the 90% 3-step
    interval's empirical coverage over many independent keys is ~0.90
    (binomial 3σ band) — the variance recursion is calibrated, not just
    internally consistent."""
    from sparkglm_spark.operators.timeseries import holt_forecast

    alpha, beta, sig = 0.5, 0.25, 1.0
    h, n, n_keys = 3, 60, 300
    rng = np.random.default_rng(77)
    rows, future = [], {}
    for k in range(n_keys):
        l, b = 10.0 + rng.normal(), 0.2
        xs = []
        for _ in range(n + h):
            eps = rng.normal(0, sig)
            y = l + b + eps
            xs.append(y)
            lp = l
            l = l + b + alpha * eps
            b = b + alpha * beta * eps
        key = f"k{k}"
        future[key] = xs[n + h - 1]
        for i, v in enumerate(xs[:n]):
            rows.append((key, i, float(v)))
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = holt_forecast(
        df, "k", "t", "v", alpha, beta, horizons=[h],
        interval=True, level=0.9,
    ).collect()
    hits = sum(
        1 for r in got if getattr(r, f"lo_{h}") <= future[r.k] <= getattr(r, f"hi_{h}")
    )
    cov = hits / n_keys
    # binomial sd at p=.9, n=300 is ~.017 — accept a generous 3σ+ band
    assert 0.84 <= cov <= 0.96, cov


def test_ewma_forecast_matches_recursion_and_intervals(spark):
    """ewma_forecast (r10): the SES end state equals the adjust=False
    recursion, the forecast is flat in h, and the interval follows
    Var_h = σ̂²(1+(h−1)α²) — hand-checked, plus the c_j = α impulse
    identity on the linear fold."""
    from sparkglm_spark.functions.special import norm_ppf
    from sparkglm_spark.operators.timeseries import ewma_forecast

    alpha = 0.35
    rng = np.random.default_rng(41)
    x = 20.0 + rng.normal(0, 1.0, 50)
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    rows.append(("solo", 0, 3.0))
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {r.k: r for r in ewma_forecast(
        df, "k", "t", "v", alpha, horizons=[1, 6], interval=True, level=0.8
    ).collect()}
    lvl, sse = x[0], 0.0
    for i in range(1, len(x)):
        sse += (x[i] - lvl) ** 2
        lvl = alpha * x[i] + (1 - alpha) * lvl
    sig2 = sse / (len(x) - 1)
    z = norm_ppf(0.9)
    r = got["a"]
    assert r.level == pytest.approx(float(lvl), rel=1e-12)
    assert r.forecast_1 == r.forecast_6 == pytest.approx(float(lvl), rel=1e-12)
    for h in (1, 6):
        se = np.sqrt(sig2 * (1 + (h - 1) * alpha**2))
        assert getattr(r, f"se_{h}") == pytest.approx(float(se), rel=1e-12)
        assert getattr(r, f"lo_{h}") == pytest.approx(float(lvl - z * se), rel=1e-12)
    assert got["solo"].se_1 is None and got["solo"].forecast_6 == 3.0

    # impulse identity: bump the last obs by 1 -> every horizon moves by α
    def fc(arr):
        l = arr[0]
        for i in range(1, len(arr)):
            l = alpha * arr[i] + (1 - alpha) * l
        return l
    d = fc(np.append(x, 21.0 + 1.0)) - fc(np.append(x, 21.0))
    assert d == pytest.approx(alpha, abs=1e-12)
    with pytest.raises(ValueError, match="alpha"):
        ewma_forecast(df, "k", "t", "v", 0.0)


def test_per_key_fold_fanout_resists_aqe_coalescing(spark):
    """r10 perf fix (caught by the timeseries_suite bench line on its
    first clean-box run): AQE coalesces byte-small shuffles to 1-2
    partitions, serializing the Python per-key folds onto 1-2 cores —
    `fanout_groups` pins the exchange at the configured width
    (explicit-numPartitions repartition is AQE-exempt) and the grouped
    applyInPandas reuses that clustering. Assert the fold stage really
    runs at the configured width."""
    from sparkglm_spark.operators.timeseries import holt_forecast

    df = spark.createDataFrame(
        [(f"k{i % 40}", j, float(i + j)) for i in range(40) for j in range(30)],
        "k string, t long, v double",
    )
    out = holt_forecast(df, "k", "t", "v", 0.4, 0.3, horizons=[1])
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from sparkglm_spark.plans.inspect import formatted_plan

    plan = formatted_plan(out)
    # the fold's input exchange is pinned (REPARTITION_BY_NUM is the
    # AQE-coalescing-exempt marker) at the configured width on the key
    assert "REPARTITION_BY_NUM" in plan
    assert f"hashpartitioning(k#" in plan and f", {width}), REPARTITION_BY_NUM" in plan


def test_hw_multiplicative(spark):
    """seasonal='mul' (Winters' multiplicative form): series/forecast
    match an independent hand recursion at 1e-12 on level-proportional
    planted data; forecasts are (l + phi_h*b)*s; a key with any
    non-positive value degrades to NULL state; interval=True and the
    streaming twin refuse 'mul'; seasonal is validated."""
    from sparkglm_spark.operators.timeseries import (
        holt_winters_forecast,
        holt_winters_series,
    )

    alpha, beta, gamma, m, phi = 0.4, 0.3, 0.25, 4, 0.9
    rng = np.random.default_rng(53)
    sfac = np.array([1.25, 0.75, 1.125, 0.875])
    x = (50 + 0.5 * np.arange(40)) * sfac[np.arange(40) % m]
    x = x * np.exp(rng.normal(0, 0.01, 40))
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "k string, t long, v double")

    # independent hand recursion (mul + damped)
    l = float(np.mean(x[:m]))
    b = float((np.mean(x[m:2 * m]) - np.mean(x[:m])) / m)
    season = [float(v) / l for v in x[:m]]
    fitted = []
    for t in range(m, len(x)):
        slot = t % m
        fitted.append((l + phi * b) * season[slot])
        ln = alpha * (x[t] / season[slot]) + (1 - alpha) * (l + phi * b)
        b = beta * (ln - l) + (1 - beta) * phi * b
        season[slot] = gamma * (x[t] / ln) + (1 - gamma) * season[slot]
        l = ln
    sr = holt_winters_series(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        phi=phi, seasonal="mul",
    ).orderBy("t").collect()
    np.testing.assert_allclose(
        [r.fitted for r in sr][m:], fitted, rtol=1e-12
    )
    fc = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[1, 6], phi=phi, seasonal="mul",
    ).collect()[0]
    assert fc.level == pytest.approx(l, rel=1e-12)
    assert fc.trend == pytest.approx(b, rel=1e-12)
    phis = np.cumsum([phi ** i for i in range(1, 7)])
    phase = len(x)
    for h in (1, 6):
        want = (l + phis[h - 1] * b) * season[(phase + h - 1) % m]
        assert getattr(fc, f"forecast_{h}") == pytest.approx(want, rel=1e-12)
    # seasonal factors recovered: planted ratios within a few percent
    got_s = np.array(fc.season)
    # season list is slot-ordered by phase start; compare as ratio sets
    assert np.allclose(sorted(got_s), sorted(sfac), rtol=0.05)

    # a non-positive value NULLs the whole key (ratios undefined)
    bad = spark.createDataFrame(
        [("b", i, float(v)) for i, v in enumerate(x)]
        + [("b", 99, -1.0)], "k string, t long, v double"
    )
    rb = holt_winters_forecast(
        bad, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[1], seasonal="mul",
    ).collect()[0]
    assert rb.level is None and rb.forecast_1 is None

    # r13: interval=True now SUPPORTED for mul (the (A,M) first-order
    # innovations variance — value asserts live in
    # test_hw_mul_interval_matches_matrix_recursion)
    rmi = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        interval=True, seasonal="mul", horizons=[2],
    ).collect()[0]
    assert rmi.se_2 is not None and rmi.lo_2 < rmi.forecast_2 < rmi.hi_2
    with pytest.raises(ValueError, match="seasonal"):
        holt_winters_series(
            df, "k", "t", "v", alpha, beta, gamma, period=m, seasonal="x"
        )
    # add ≡ the seasonal-less call bitwise (existing pins unaffected)
    a1 = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m, horizons=[3]
    ).collect()[0]
    a2 = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m, horizons=[3],
        seasonal="add",
    ).collect()[0]
    assert (a1.level, a1.trend, a1.forecast_3) == (
        a2.level, a2.trend, a2.forecast_3
    )


def test_seasonal_decompose_multiplicative(spark):
    """model='multiplicative' on planted constant-level x = T*S (S
    dyadic mean-1 factors): trend == T and seasonal == S EXACTLY away
    from the MA edges, resid == 1; a non-positive key NULLs out; model
    is validated."""
    from sparkglm_spark.operators.timeseries import seasonal_decompose

    m = 4
    sfac = [1.25, 0.75, 1.125, 0.875]  # mean exactly 1, dyadic
    n = 24
    rows = [("a", i, 50.0 * sfac[i % m]) for i in range(n)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = seasonal_decompose(
        df, "k", "t", "v", period=m, model="multiplicative"
    ).orderBy("t").collect()
    for i in range(m // 2, n - m // 2):
        assert got[i].trend == pytest.approx(50.0, abs=1e-12), i
        assert got[i].seasonal == pytest.approx(sfac[i % m], rel=1e-12), i
        assert got[i].resid == pytest.approx(1.0, rel=1e-12), i
    # edge rows: trend/resid NULL, seasonal still defined
    assert got[0].trend is None and got[0].resid is None
    assert got[0].seasonal == pytest.approx(sfac[0], rel=1e-12)

    bad = df.union(spark.createDataFrame([("a", 99, 0.0)], df.schema))
    rb = seasonal_decompose(
        bad, "k", "t", "v", period=m, model="multiplicative"
    ).orderBy("t").collect()
    assert all(r.trend is None and r.seasonal is None for r in rb)

    with pytest.raises(ValueError, match="model"):
        seasonal_decompose(df, "k", "t", "v", period=m, model="mult")


def test_croston_forecast(spark):
    """Croston's intermittent-demand method (r11): hand-recursion twin
    (size/interval SES updated ONLY at demand points, interval = gap
    since last demand, init at the first demand with its 1-based
    position), sba = (1-alpha/2)*classic, all-zero key -> NULL state,
    negative demand raises, guards."""
    from sparkglm_spark.operators.timeseries import croston_forecast

    alpha = 0.2
    demands = [0, 0, 5.0, 0, 0, 0, 3.0, 4.0, 0, 2.0, 0, 0]
    rows = [("a", i, float(v)) for i, v in enumerate(demands)]
    rows += [("zero", i, 0.0) for i in range(6)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {r.k: r for r in croston_forecast(
        df, "k", "t", "v", alpha=alpha
    ).collect()}

    # hand recursion
    z = p = None
    q = 0
    for v in demands:
        q += 1
        if v > 0:
            if z is None:
                z, p = v, float(q)
            else:
                z = alpha * v + (1 - alpha) * z
                p = alpha * q + (1 - alpha) * p
            q = 0
    r = got["a"]
    assert r.size == pytest.approx(z, rel=1e-12)
    assert r.interval == pytest.approx(p, rel=1e-12)
    assert r.forecast == pytest.approx(z / p, rel=1e-12)
    assert r.n_periods == 12 and r.n_demands == 4

    rz = got["zero"]
    assert rz.size is None and rz.forecast is None and rz.n_demands == 0

    sba = {r.k: r for r in croston_forecast(
        df, "k", "t", "v", alpha=alpha, variant="sba"
    ).collect()}
    assert sba["a"].forecast == pytest.approx(
        (1 - alpha / 2) * z / p, rel=1e-12
    )

    # r12: a key containing a negative demand NULL-degrades (per-key
    # check inside the fold, no eager pre-scan); siblings unaffected
    neg = {r.k: r for r in croston_forecast(
        df.withColumn(
            "v",
            F.when((F.col("k") == "a") & (F.col("t") == 3), -1.0)
            .otherwise(F.col("v")),
        ),
        "k", "t", "v", alpha=alpha,
    ).collect()}
    assert neg["a"].size is None and neg["a"].n_demands is None
    assert neg["a"].n_periods == 12
    assert neg["zero"].n_demands == 0  # sibling keeps its own state
    with pytest.raises(ValueError, match="alpha"):
        croston_forecast(df, "k", "t", "v", alpha=0.0)
    with pytest.raises(ValueError, match="variant"):
        croston_forecast(df, "k", "t", "v", variant="tsb")


def test_hw_mul_level_collapse_nulls(spark):
    """Code-review r11: an all-positive but steeply DECLINING series
    drives the multiplicative level through zero mid-recursion — the
    key must degrade to NULL state (the fold detects the collapse),
    not emit sign-flipped garbage."""
    from sparkglm_spark.operators.timeseries import (
        holt_winters_forecast,
        holt_winters_series,
    )

    x = [float(2.0 ** -i * 1000.0) for i in range(16)]  # halves each step
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(x)], "k string, t long, v double"
    )
    r = holt_winters_forecast(
        df, "k", "t", "v", 0.5, 0.3, 0.4, period=2, horizons=[1],
        seasonal="mul",
    ).collect()[0]
    assert r.level is None and r.forecast_1 is None
    sr = holt_winters_series(
        df, "k", "t", "v", 0.5, 0.3, 0.4, period=2, seasonal="mul"
    ).collect()
    assert all(row.level is None for row in sr)


def test_tsb_forecast(spark):
    """TSB (r11): hand-recursion twin (probability smoothed EVERY
    period, size at demands only, init z=d1 p=1/q1 at the first
    demand); the obsolescence property — trailing zeros DECAY the
    forecast while Croston's stays frozen; all-zero NULL; guards."""
    from sparkglm_spark.operators.timeseries import (
        croston_forecast,
        tsb_forecast,
    )

    a, b = 0.2, 0.15
    demands = [0, 0, 5.0, 0, 3.0, 4.0, 0, 2.0] + [0.0] * 10  # then obsolete
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(demands)],
        "k string, t long, v double",
    )
    r = tsb_forecast(df, "k", "t", "v", alpha=a, beta=b).collect()[0]

    z = p = None
    q = 0
    for v in demands:
        if z is None:
            q += 1
            if v > 0:
                z, p = v, 1.0 / q
        else:
            p = b * (1.0 if v > 0 else 0.0) + (1 - b) * p
            if v > 0:
                z = a * v + (1 - a) * z
    assert r.size == pytest.approx(z, rel=1e-12)
    assert r.probability == pytest.approx(p, rel=1e-12)
    assert r.forecast == pytest.approx(p * z, rel=1e-12)
    assert r.n_demands == 4 and r.n_periods == 18

    # obsolescence: with the 10 trailing zeros TSB's forecast decayed
    # below Croston's frozen one (same data)
    cr = croston_forecast(df, "k", "t", "v", alpha=a).collect()[0]
    assert r.forecast < 0.5 * cr.forecast

    # all-zero key
    z0 = spark.createDataFrame(
        [("z", i, 0.0) for i in range(5)], "k string, t long, v double"
    )
    rz = tsb_forecast(z0, "k", "t", "v").collect()[0]
    assert rz.size is None and rz.forecast is None

    # r12: negative demand NULL-degrades the key (per-key fold check)
    rn = tsb_forecast(
        df.withColumn("v", F.when(F.col("t") == 2, -1.0).otherwise(F.col("v"))),
        "k", "t", "v",
    ).collect()[0]
    assert rn.size is None and rn.n_demands is None and rn.forecast is None
    with pytest.raises(ValueError, match="beta"):
        tsb_forecast(df, "k", "t", "v", beta=1.0)


def test_hw_mul_interval_matches_matrix_recursion(spark):
    """r13 (VERDICT r12 #5, flipping the r11 refusal): the (A,M)
    interval equals an INDEPENDENT full state-space linearization twin
    — z = (l, b, s_0..s_{m-1}), P ← A·P·Aᵀ + σ²gᵢgᵢᵀ with the fold's
    Jacobians gᵢ = (α/Sᵢ, αβ/Sᵢ, γ(1−α)/Lᵢ at slotᵢ), A the linear HW
    transition, Var = w_hᵀ·P·w_h + σ² — at 1e-12 across horizons and
    damping; add-path values are byte-unchanged; a collapsing damped
    mean path NULLs se while keeping the forecast."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import (
        _hw_fold,
        holt_winters_forecast,
    )

    alpha, beta, gamma, m = 0.4, 0.2, 0.3, 4
    rows = [("a", i, float(50.0 * (1.0 + 0.25 * ((i % m) - 1.5) / 2.0)
             + 0.9 * i + 3.0 * np.sin(i * 1.7)))
            for i in range(26)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    x = np.array([r[2] for r in rows])

    for phi in (1.0, 0.85):
        hs = [1, 2, m, m + 1, 2 * m + 3]
        got = holt_winters_forecast(
            df, "k", "t", "v", alpha, beta, gamma, period=m,
            horizons=hs, interval=True, seasonal="mul", phi=phi,
        ).collect()[0]
        l, b, season, phase, fitted, *_ = _hw_fold(
            x, alpha, beta, gamma, m, phi=phi, seasonal="mul"
        )
        e = x[m:] - fitted
        sig2 = float(e @ e) / len(e)
        phi_cum = {0: 0.0}
        for j in range(1, max(hs) + 1):
            phi_cum[j] = phi_cum[j - 1] + phi ** j
        k = m + 2
        A = np.eye(k)
        A[0, 1] = phi
        A[1, 1] = phi
        for h in hs:
            # P_{T} = 0 (state known); for i = 1..h-1:
            # P_{T+i} = A·P_{T+i-1}·Aᵀ + σ²·gᵢgᵢᵀ — the shock at T+i
            # enters AFTER that step's transition, and later steps'
            # leading A applications give shock i its A^(h-1-i) total
            P = np.zeros((k, k))
            for i in range(1, h):
                Si = season[(phase + i - 1) % m]
                Li = l + phi_cum[i] * b
                g = np.zeros(k)
                g[0] = alpha / Si
                g[1] = alpha * beta / Si
                g[2 + (phase + i - 1) % m] = gamma * (1.0 - alpha) / Li
                P = A @ P @ A.T + sig2 * np.outer(g, g)
            # observation at T+h from state_{T+h-1}:
            # w = ∂[(l + φb)·s_slot]/∂z; the level factor there is
            # l_{T+h-1} + φ·b_{T+h-1} = l_T + φ_cum(h)·b_T on the path
            w = np.zeros(k)
            Sh = season[(phase + h - 1) % m]
            w[0] = Sh
            w[1] = phi * Sh
            w[2 + (phase + h - 1) % m] = l + phi_cum[h] * b
            var = float(w @ P @ w) + sig2
            se_hand = float(np.sqrt(var))
            assert getattr(got, f"se_{h}") == pytest.approx(
                se_hand, rel=1e-12
            ), (phi, h)
            fc = getattr(got, f"forecast_{h}")
            assert getattr(got, f"lo_{h}") < fc < getattr(got, f"hi_{h}")
    # add-path values byte-unchanged by the r13 branch (same inputs)
    ga = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[3], interval=True, seasonal="add",
    ).collect()[0]
    assert ga.se_3 is not None
    # collapsing mean path: strong negative trend + phi=1 pushes
    # L_i <= 0 before a far horizon -> NULL se, forecast kept
    rows2 = [("d", i, 400.0 - 28.0 * i + 5.0 * ((i % m) - 1.5))
             for i in range(2 * m + 4)]
    dfd = spark.createDataFrame(rows2, "k string, t long, v double")
    rd = holt_winters_forecast(
        dfd, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[6], interval=True, seasonal="mul",
    ).collect()[0]
    if rd.level is not None:  # fold survived to T
        Ls = [rd.level + j * rd.trend for j in range(1, 7)]
        if min(Ls) <= 0.0:
            assert rd.se_6 is None and rd.forecast_6 is not None


def test_hw_mul_interval_coverage_property(spark):
    """r13 coverage property: simulate the (A,M) innovations model
    (known α/β/γ/σ), forecast h=2 with 95% intervals over ~200
    independent keys, and check the realized future value lands inside
    [lo, hi] at a rate consistent with nominal (the first-order
    variance is approximate and σ̂² estimated — accept [0.85, 0.995])."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import holt_winters_forecast

    rng = np.random.default_rng(136)
    alpha, beta, gamma, m, h, sigma = 0.3, 0.1, 0.2, 4, 2, 1.0
    n_keys, n_obs = 200, 8 * m
    rows, future = [], {}
    for kk in range(n_keys):
        l, b = 100.0 + rng.normal(0, 5), rng.normal(0.2, 0.1)
        s = np.array([1.2, 0.9, 1.1, 0.8])
        vals = []
        for t in range(n_obs + h):
            slot = t % m
            lb = l + b
            y = lb * s[slot] + float(rng.normal(0, sigma))
            l_new = alpha * (y / s[slot]) + (1 - alpha) * lb
            b = beta * (l_new - l) + (1 - beta) * b
            s[slot] = gamma * (y / l_new) + (1 - gamma) * s[slot]
            l = l_new
            vals.append(y)
        key = f"k{kk}"
        rows += [(key, t, float(v)) for t, v in enumerate(vals[:n_obs])]
        future[key] = vals[n_obs + h - 1]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = holt_winters_forecast(
        df, "k", "t", "v", alpha, beta, gamma, period=m,
        horizons=[h], interval=True, seasonal="mul", level=0.95,
    ).collect()
    scored = [(r.k, r.lo_2, r.hi_2) for r in got if r.lo_2 is not None]
    assert len(scored) >= 0.95 * n_keys
    hits = sum(1 for k, lo, hi in scored if lo <= future[k] <= hi)
    rate = hits / len(scored)
    assert 0.85 <= rate <= 0.995, rate


def test_forecast_accuracy_matches_hand_computation(spark):
    """r12 forecast_accuracy: every metric equals the hand-rolled numpy
    twin (incl. MAPE's y≠0 exclusion, sMAPE's both-zero term, MASE's
    ordered naive denominator); single-row keys report NULL mase;
    constant actuals report NULL mase; null/NaN rows drop first; the
    plan carries exactly one hash exchange."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import forecast_accuracy

    rows = []
    data = {
        "a": [(1, 10.0, 8.0), (2, 0.0, 1.0), (3, 12.0, 12.5),
              (4, 0.0, 0.0), (5, 7.0, 9.0)],
        "b": [(1, 5.0, 5.5)],                      # single row: mase NULL
        "c": [(1, 4.0, 3.0), (2, 4.0, 5.0)],       # constant: mase NULL
    }
    for k, seq in data.items():
        rows += [(k, t, y, f) for t, y, f in seq]
    rows.append(("a", 6, None, 3.0))               # null actual drops
    rows.append(("a", 7, float("nan"), 3.0))       # NaN actual drops
    df = spark.createDataFrame(rows, "k string, t long, y double, f double")
    got = {r.k: r for r in forecast_accuracy(df, "k", "t", "y", "f").collect()}

    for k, seq in data.items():
        y = np.array([s[1] for s in seq])
        f = np.array([s[2] for s in seq])
        e = y - f
        r = got[k]
        assert r.n == len(seq)
        assert r.mae == pytest.approx(np.abs(e).mean(), rel=1e-12)
        assert r.rmse == pytest.approx(np.sqrt((e * e).mean()), rel=1e-12)
        nz = y != 0
        if nz.any():
            assert r.mape == pytest.approx(
                np.abs(e[nz] / y[nz]).mean(), rel=1e-12
            )
        assert r.n_mape == int(nz.sum())
        st = np.where(
            np.abs(y) + np.abs(f) == 0, 0.0,
            2.0 * np.abs(e) / np.where(np.abs(y) + np.abs(f) == 0, 1.0,
                                       np.abs(y) + np.abs(f)),
        )
        assert r.smape == pytest.approx(st.mean(), rel=1e-12)
        naive = np.abs(np.diff(y))
        if len(naive) and naive.mean() > 0:
            assert r.mase == pytest.approx(
                np.abs(e).mean() / naive.mean(), rel=1e-12
            )
        else:
            assert r.mase is None, k
    # one hash exchange: the groupBy reuses the window's partitioning
    from sparkglm_spark.plans.inspect import exchange_schemas

    exch = exchange_schemas(forecast_accuracy(df, "k", "t", "y", "f"))
    hash_exch = [e for e in exch if "hashpartitioning" in e["arguments"]]
    assert len(hash_exch) == 1


def test_forecast_accuracy_seasonal_mase(spark):
    """m > 1 scales by the SEASONAL-naive MAE (lag-m diffs): on a pure
    period-2 series the seasonal naive is perfect, so mase is NULL
    (zero denominator) while m=1 gives a finite value; m=0 raises."""
    from sparkglm_spark.operators.timeseries import forecast_accuracy

    seq = [10.0, 20.0] * 4
    rows = [("a", t, y, y + 1.0) for t, y in enumerate(seq)]
    df = spark.createDataFrame(rows, "k string, t long, y double, f double")
    r1 = forecast_accuracy(df, "k", "t", "y", "f").collect()[0]
    assert r1.mase == pytest.approx(1.0 / 10.0, rel=1e-12)  # mae 1, naive 10
    r2 = forecast_accuracy(df, "k", "t", "y", "f", m=2).collect()[0]
    assert r2.mase is None  # seasonal naive exact -> zero denominator
    assert r2.mae == pytest.approx(1.0)
    with pytest.raises(ValueError, match="m must"):
        forecast_accuracy(df, "k", "t", "y", "f", m=0)


def test_forecast_accuracy_mase_contiguity_guard(spark):
    """r13 (VERDICT r12 #6): with m > 1 a ts gap phase-shifts every
    later seasonal pair — the guard NULLs mase for non-contiguous keys
    (planted gap, dropped-null gap, duplicate ts) instead of returning
    a wrong-but-plausible number; contiguous keys and m=1 are
    untouched; assume_contiguous=True restores the positional pairing;
    a date axis checks day spacing."""
    import datetime

    from sparkglm_spark.operators.timeseries import forecast_accuracy

    seq = [10.0, 20.0, 11.0, 21.0, 12.0, 22.0, 13.0, 23.0]
    rows = [("ok", t, y, y + 1.0) for t, y in enumerate(seq)]
    # gap: t=4 missing — the lag-2 pairing after the gap is phase-shifted
    rows += [("gap", t, y, y + 1.0)
             for t, y in zip([0, 1, 2, 3, 5, 6, 7, 8], seq)]
    # dup: two rows share t=3
    rows += [("dup", t, y, y + 1.0)
             for t, y in zip([0, 1, 2, 3, 3, 4, 5, 6], seq)]
    df = spark.createDataFrame(rows, "k string, t long, y double, f double")
    out = {r.k: r for r in forecast_accuracy(df, "k", "t", "y", "f", m=2).collect()}
    assert out["ok"].mase is not None
    assert out["gap"].mase is None and out["gap"].mae is not None
    assert out["dup"].mase is None
    # a null actual inside the grid drops its row -> retained rows gapped
    dfn = spark.createDataFrame(
        [("n", t, None if t == 4 else y, y + 1.0)
         for t, y in enumerate(seq)],
        "k string, t long, y double, f double",
    )
    rn = forecast_accuracy(dfn, "k", "t", "y", "f", m=2).collect()[0]
    assert rn.mase is None
    # opt-out restores the (documented-hazard) positional pairing
    outc = {
        r.k: r
        for r in forecast_accuracy(
            df, "k", "t", "y", "f", m=2, assume_contiguous=True
        ).collect()
    }
    assert outc["gap"].mase is not None
    # m=1 never checks (plan unchanged): the gap key still scores
    out1 = {r.k: r for r in forecast_accuracy(df, "k", "t", "y", "f").collect()}
    assert out1["gap"].mase is not None
    # date axis: weekly grid is contiguous in DAYS, gapped one fails
    d0 = datetime.date(2026, 1, 5)
    ddf = spark.createDataFrame(
        [("w", d0 + datetime.timedelta(days=7 * t), y, y + 1.0)
         for t, y in enumerate(seq)]
        + [("wg", d0 + datetime.timedelta(days=7 * t), y, y + 1.0)
           for t, y in zip([0, 1, 2, 3, 5, 6, 7, 8], seq)],
        "k string, t date, y double, f double",
    )
    outd = {r.k: r for r in forecast_accuracy(ddf, "k", "t", "y", "f", m=2).collect()}
    assert outd["w"].mase is not None and outd["wg"].mase is None
    # timestamp axis (createDataFrame yields TIMESTAMP_NTZ in Spark 4 —
    # a plain double cast is invalid; /verify r13 caught the crash):
    # hourly grid contiguous, gapped one NULLs
    t0 = datetime.datetime(2026, 1, 5, 0, 0)
    tdf = spark.createDataFrame(
        [("h", t0 + datetime.timedelta(hours=t), y, y + 1.0)
         for t, y in enumerate(seq)]
        + [("hg", t0 + datetime.timedelta(hours=t), y, y + 1.0)
           for t, y in zip([0, 1, 2, 3, 5, 6, 7, 8], seq)],
        "k string, t timestamp_ntz, y double, f double",
    )
    outt = {r.k: r for r in forecast_accuracy(tdf, "k", "t", "y", "f", m=2).collect()}
    assert outt["h"].mase is not None and outt["hg"].mase is None
    # review r13 pass 2: NTZ spacing must be session-tz-INDEPENDENT (an
    # ntz→timestamp cast reads wall time in the session zone, so a
    # regular hourly grid crossing a DST transition looked irregular) —
    # pin under a DST-observing zone
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        dst0 = datetime.datetime(2026, 3, 7, 23, 0)  # crosses Mar 8 02:00
        ddst = spark.createDataFrame(
            [("z", dst0 + datetime.timedelta(hours=t), y, y + 1.0)
             for t, y in enumerate(seq)],
            "k string, t timestamp_ntz, y double, f double",
        )
        rz = forecast_accuracy(ddst, "k", "t", "y", "f", m=2).collect()[0]
        assert rz.mase is not None
    finally:
        spark.conf.unset("spark.sql.session.timeZone")
    # a NULL-ts row is a phantom position: min/max skip its NULL
    # spacings while the lag-m pairing still counts it (review r13) —
    # the null-spacing census must NULL the key
    ndf = spark.createDataFrame(
        [("p", None if t == 3 else t, y, y + 1.0)
         for t, y in enumerate(seq)],
        "k string, t bigint, y double, f double",
    )
    rp = forecast_accuracy(ndf, "k", "t", "y", "f", m=2).collect()[0]
    assert rp.mase is None and rp.mae is not None


# ---------------------------------------------------------------------------
# r14: Croston/TSB prediction intervals (interval=True) — the intermittent
# pair joins the family's interval surface (SES/Holt/HW add+mul had it)


def test_croston_tsb_interval_hand_twin(spark):
    """(se, lo, hi) equal an independent hand recursion: one-step
    per-period errors e_t = d_t - f(state entering t) measured at EVERY
    period once state exists, sigma^2 = sse/(m-1), normal-quantile
    bounds; sba factor enters the error; keys with <2 measured errors
    (or NULL state) report NULL; interval=False schema is unchanged."""
    from sparkglm_spark.functions.special import norm_ppf
    from sparkglm_spark.operators.timeseries import (
        croston_forecast,
        tsb_forecast,
    )

    a, b = 0.2, 0.15
    demands = [0, 0, 5.0, 0, 0, 3.0, 4.0, 0, 2.0, 0, 1.5, 0]
    rows = [("k", i, float(v)) for i, v in enumerate(demands)]
    # 'late': first (and only) demand at the LAST period -> state exists
    # but zero measured errors -> NULL se with a real forecast
    rows += [("late", i, 0.0 if i < 4 else 7.0) for i in range(5)]
    rows += [("zero", i, 0.0) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    zq = float(norm_ppf(0.5 + 0.95 / 2.0))

    for variant in ("classic", "sba"):
        fac = 1.0 - a / 2.0 if variant == "sba" else 1.0
        got = {r.k: r for r in croston_forecast(
            df, "k", "t", "v", alpha=a, variant=variant, interval=True
        ).collect()}
        z = p = None
        q = 0
        sse, m = 0.0, 0
        for v in demands:
            if z is not None:
                e = v - fac * z / p
                sse += e * e
                m += 1
            q += 1
            if v > 0:
                if z is None:
                    z, p = v, float(q)
                else:
                    z = a * v + (1 - a) * z
                    p = a * q + (1 - a) * p
                q = 0
        import numpy as np

        se = float(np.sqrt(sse / (m - 1)))
        r = got["k"]
        assert r.se == pytest.approx(se, rel=1e-12)
        assert r.lo == pytest.approx(r.forecast - zq * se, rel=1e-12)
        assert r.hi == pytest.approx(r.forecast + zq * se, rel=1e-12)
        assert got["late"].forecast is not None and got["late"].se is None
        assert got["zero"].se is None and got["zero"].lo is None

    # TSB twin on the same data
    gt = {r.k: r for r in tsb_forecast(
        df, "k", "t", "v", alpha=a, beta=b, interval=True
    ).collect()}
    z = p = None
    q = 0
    sse, m = 0.0, 0
    for v in demands:
        if z is not None:
            e = v - p * z
            sse += e * e
            m += 1
        if z is None:
            q += 1
            if v > 0:
                z, p = v, 1.0 / q
        else:
            p = b * (1.0 if v > 0 else 0.0) + (1 - b) * p
            if v > 0:
                z = a * v + (1 - a) * z
    import numpy as np

    se = float(np.sqrt(sse / (m - 1)))
    r = gt["k"]
    assert r.se == pytest.approx(se, rel=1e-12)
    assert r.lo == pytest.approx(r.forecast - zq * se, rel=1e-12)
    assert r.hi == pytest.approx(r.forecast + zq * se, rel=1e-12)
    assert gt["zero"].se is None

    # negative-demand key: NULL everything incl. the new columns
    neg = croston_forecast(
        df.where(F.col("k") == "k").withColumn(
            "v", F.when(F.col("t") == 5, -1.0).otherwise(F.col("v"))
        ),
        "k", "t", "v", alpha=a, interval=True,
    ).collect()[0]
    assert neg.se is None and neg.lo is None and neg.hi is None

    # interval=False output schema is byte-unchanged (existing pins)
    cols = croston_forecast(df, "k", "t", "v", alpha=a).columns
    assert cols == ["k", "n_periods", "n_demands", "size", "interval",
                    "forecast"]
    assert "se" not in tsb_forecast(df, "k", "t", "v").columns
    with pytest.raises(ValueError, match="level"):
        croston_forecast(df, "k", "t", "v", interval=True, level=1.0)
    with pytest.raises(ValueError, match="level"):
        tsb_forecast(df, "k", "t", "v", interval=True, level=0.0)


def test_croston_tsb_interval_coverage(spark):
    """Coverage property: with demand at EVERY period ~ N(10, 1) (pi=1,
    where Croston degenerates to SES and TSB's probability pins at 1)
    the 95% interval covers the held-out next value in ~95% of 300
    independent keys — both forecasters."""
    import numpy as np

    from sparkglm_spark.operators.timeseries import (
        croston_forecast,
        tsb_forecast,
    )

    rng = np.random.default_rng(41)
    nk, n = 300, 120
    x = rng.normal(10.0, 1.0, size=(nk, n))
    assert (x > 0).all()
    train = [(f"k{i:03d}", t, float(x[i, t]))
             for i in range(nk) for t in range(n - 1)]
    df = spark.createDataFrame(train, "k string, t long, v double")
    held = {f"k{i:03d}": x[i, n - 1] for i in range(nk)}

    for fn, kw in ((croston_forecast, {"alpha": 0.1}),
                   (tsb_forecast, {"alpha": 0.1, "beta": 0.1})):
        rows = fn(df, "k", "t", "v", interval=True, **kw).collect()
        cov = np.mean([held[r.k] >= r.lo and held[r.k] <= r.hi
                       for r in rows])
        assert 0.90 <= cov <= 0.99, (fn.__name__, cov)


def test_ar_forecast_matches_numpy_ols(spark):
    # AR(2)+intercept: coefs/sigma2/forecasts/se vs a hand OLS + psi
    # recursion at 1e-10; simulation truth recovered (r14)
    import pandas as pd

    rng = np.random.default_rng(7)
    frames = []
    for key, (c, ph) in {"a": (5.0, [0.6, -0.3]), "b": (1.0, [0.8, 0.1])}.items():
        n = 1200
        x = np.zeros(n)
        x[0] = x[1] = c / (1.0 - sum(ph))
        for t in range(2, n):
            x[t] = c + ph[0] * x[t - 1] + ph[1] * x[t - 2] + rng.normal()
        frames.append(pd.DataFrame(
            {"k": key, "t": np.arange(n, dtype=float), "v": x}))
    pdf = pd.concat(frames, ignore_index=True)
    from sparkglm_spark.operators.timeseries import ar_forecast

    out = (
        ar_forecast(spark.createDataFrame(pdf).repartition(5), "k", "t", "v",
                    p=2, horizons=[1, 3], interval=True)
        .toPandas().set_index("k")
    )
    for key in ("a", "b"):
        x = pdf[pdf["k"] == key]["v"].to_numpy()
        n = len(x)
        X = np.column_stack([np.ones(n - 2), x[1:-1], x[:-2]])
        y = x[2:]
        b = np.linalg.solve(X.T @ X, X.T @ y)
        res = y - X @ b
        sig2 = float(res @ res) / (n - 2 - 3)
        f1 = b[0] + b[1] * x[-1] + b[2] * x[-2]
        f2 = b[0] + b[1] * f1 + b[2] * x[-1]
        f3 = b[0] + b[1] * f2 + b[2] * f1
        psi1 = b[1]
        psi2 = b[1] * psi1 + b[2]
        se3 = float(np.sqrt(sig2 * (1 + psi1**2 + psi2**2)))
        r = out.loc[key]
        np.testing.assert_allclose(
            [r["intercept"], r["ar_1"], r["ar_2"]], b, rtol=1e-10)
        assert abs(r["sigma2"] - sig2) < 1e-9
        assert abs(r["forecast_1"] - f1) < 1e-9
        assert abs(r["forecast_3"] - f3) < 1e-9
        assert abs(r["se_3"] - se3) < 1e-9
        assert r["n_fit"] == n - 2
    # truth recovery for key a (5.0, 0.6, -0.3) at n=1200
    ra = out.loc["a"]
    assert abs(ra["ar_1"] - 0.6) < 0.1 and abs(ra["ar_2"] + 0.3) < 0.1


def test_ar_forecast_no_intercept_and_defaults(spark):
    import pandas as pd

    rng = np.random.default_rng(9)
    n = 800
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = 0.7 * x[t - 1] + rng.normal()
    pdf = pd.DataFrame({"k": "z", "t": np.arange(n, dtype=float), "v": x})
    from sparkglm_spark.operators.timeseries import ar_forecast

    out = ar_forecast(spark.createDataFrame(pdf), "k", "t", "v", p=1,
                      intercept=False).toPandas()
    assert "intercept" not in out.columns
    # hand AR(1) through-origin: phi = sum(x_t x_{t-1})/sum(x_{t-1}^2)
    phi = float((x[1:] @ x[:-1]) / (x[:-1] @ x[:-1]))
    assert abs(out["ar_1"].iloc[0] - phi) < 1e-10
    assert abs(out["forecast_1"].iloc[0] - phi * x[-1]) < 1e-10


def test_ar_forecast_grid_guard_and_degenerates(spark):
    import pandas as pd

    rows = []
    # gapped: index jumps 5 -> 7
    for i in [0, 1, 2, 3, 4, 5, 7, 8, 9, 10]:
        rows.append(("gap", float(i), float(i % 3)))
    # regular but constant -> singular with intercept
    for i in range(10):
        rows.append(("const", float(i), 4.0))
    # too short for p=2
    rows.append(("tiny", 0.0, 1.0))
    rows.append(("tiny", 1.0, 2.0))
    # healthy
    rng = np.random.default_rng(1)
    for i in range(30):
        rows.append(("okk", float(i), float(rng.normal())))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "t", "v"]))
    from sparkglm_spark.operators.timeseries import ar_forecast

    out = ar_forecast(df, "k", "t", "v", p=2).toPandas().set_index("k")
    assert out.loc["gap", "ar_1"] is None or np.isnan(out.loc["gap", "ar_1"])
    assert out.loc["gap", "n_events"] == 10
    assert np.isnan(out.loc["const", "ar_1"])  # singular normal matrix
    assert np.isnan(out.loc["tiny", "forecast_1"])
    assert np.isfinite(out.loc["okk", "forecast_1"])
    # assume_contiguous skips the grid check: 'gap' now fits (positional)
    out2 = ar_forecast(df, "k", "t", "v", p=2,
                       assume_contiguous=True).toPandas().set_index("k")
    assert np.isfinite(out2.loc["gap", "ar_1"])


def test_ar_forecast_null_values_become_gaps(spark):
    # a dropped interior NULL breaks the grid -> NULL fit (never a
    # phase-shifted one); an edge-run of NULLs keeps the grid regular
    import pandas as pd

    rng = np.random.default_rng(4)
    v = rng.normal(size=20)
    pdf = pd.DataFrame({"k": "a", "t": np.arange(20, dtype=float), "v": v})
    pdf.loc[10, "v"] = None  # interior
    from sparkglm_spark.operators.timeseries import ar_forecast

    out = ar_forecast(spark.createDataFrame(pdf), "k", "t", "v", p=1).toPandas()
    assert np.isnan(out["ar_1"].iloc[0])
    assert out["n_events"].iloc[0] == 19
    pdf2 = pd.DataFrame({"k": "a", "t": np.arange(20, dtype=float), "v": v})
    pdf2.loc[0, "v"] = None  # leading null: retained rows stay regular
    out2 = ar_forecast(spark.createDataFrame(pdf2), "k", "t", "v", p=1).toPandas()
    assert np.isfinite(out2["ar_1"].iloc[0])


def test_ar_forecast_single_hash_exchange(spark):
    # window + groupBy share ONE hash exchange (the ewma_latest plan
    # contract); mapInPandas adds none
    import pandas as pd

    pdf = pd.DataFrame({"k": ["a"] * 30, "t": np.arange(30, dtype=float),
                        "v": np.random.default_rng(0).normal(size=30)})
    from sparkglm_spark.operators.timeseries import ar_forecast

    df = spark.createDataFrame(pdf).repartition(4)
    plan = (
        ar_forecast(df, "k", "t", "v", p=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.lower().count("exchange hashpartitioning") == 1


def test_ar_forecast_guards(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "t": [0.0], "v": [1.0]}))
    from sparkglm_spark.operators.timeseries import ar_forecast

    with pytest.raises(ValueError, match="p must"):
        ar_forecast(df, "k", "t", "v", p=0)
    with pytest.raises(ValueError, match="horizons"):
        ar_forecast(df, "k", "t", "v", horizons=[])
    with pytest.raises(ValueError, match="level"):
        ar_forecast(df, "k", "t", "v", interval=True, level=1.5)


def test_fold_engine_streams_batches_exactly(spark):
    # r15: the fold engine streams Arrow batches through a carry buffer
    # (memory bound = one batch + largest key, not the whole partition).
    # Force many tiny batches so keys SPAN batch boundaries and compare
    # bit-exactly against the pandas per-key ground truth.
    import pandas as pd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "k": np.repeat([f"u{i:02d}" for i in range(12)], 25),
            "t": np.tile(np.arange(25, dtype=float), 12),
            "v": rng.normal(size=300),
        }
    )
    from sparkglm_spark.operators.timeseries import ewma_series

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        out = (
            ewma_series(spark.createDataFrame(pdf), "k", "t", "v", alpha=0.4)
            .toPandas()
            .sort_values(["k", "t"], kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    gt = []
    for _, g in pdf.groupby("k", sort=True):
        g = g.sort_values("t", kind="mergesort")
        gt.append(g["v"].ewm(alpha=0.4, adjust=False).mean())
    gt = pd.concat(gt).reset_index(drop=True)
    assert len(out) == 300
    assert np.array_equal(out["ewma"].to_numpy(), gt.to_numpy())


def test_fold_engine_null_and_nan_float_keys_stay_separate(spark):
    # r15 (ADVICE r14): NULL and NaN float keys both convert to pandas
    # NaN and sort adjacent — the engine must keep them as TWO folds
    # (groupBy semantics), via the JVM-computed null indicator.
    import pandas as pd

    df = spark.createDataFrame(
        [
            (None, 1.0, 1.0),
            (None, 2.0, 2.0),
            (float("nan"), 1.0, 10.0),
            (float("nan"), 2.0, 20.0),
            (1.5, 1.0, 5.0),
        ],
        "k double, t double, v double",
    )
    from sparkglm_spark.operators.timeseries import ewma_series

    out = ewma_series(df, "k", "t", "v", alpha=0.5).toPandas()
    vals = sorted(out["ewma"].tolist())
    # merged folds would chain the NULL block into the NaN block
    # (second NaN row would read 0.5*20 + 0.5*1.5 != 15.0)
    assert vals == [1.0, 1.5, 5.0, 10.0, 15.0]
