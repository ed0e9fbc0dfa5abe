"""Funnel / retention vs hand-computed and python-twin oracles."""

import datetime

import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators.funnel import funnel_counts, retention_cohorts


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # user 1: full ordered funnel
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # user 2: click before view -> stalls at view
        (2, _ts(5), "click"),
        (2, _ts(6), "view"),
        # user 3: view+click same instant -> tie does NOT advance
        (3, _ts(7), "view"),
        (3, _ts(7), "click"),
        # user 4: view then click, no purchase
        (4, _ts(1), "view"),
        (4, _ts(1, 5), "click"),
        # user 5: purchase only -> not in funnel at all
        (5, _ts(2), "purchase"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_counts_hand_oracle(log):
    out = {
        r["step"]: (r["step_idx"], r["n_users"])
        for r in funnel_counts(log, ["view", "click", "purchase"]).collect()
    }
    assert out == {
        "view": (1, 4),      # users 1,2,3,4
        "click": (2, 2),     # users 1,4 (2 clicked before viewing; 3 tied)
        "purchase": (3, 1),  # user 1
    }


def test_funnel_single_step_and_validation(log):
    out = funnel_counts(log, ["purchase"]).collect()
    assert len(out) == 1 and out[0]["n_users"] == 2  # users 1 and 5
    with pytest.raises(ValueError, match="at least one"):
        funnel_counts(log, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(log, ["view", "view"])


def test_funnel_on_events_table(events):
    """Real log: counts must be monotonically non-increasing along the
    funnel and match an independent python replay."""
    steps = ["view", "click", "purchase"]
    got = {
        r["step"]: r["n_users"] for r in funnel_counts(events, steps).collect()
    }
    rows = (
        events.where(F.col("event_type").isin(steps))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    expect = dict.fromkeys(steps, 0)
    for evs in by_user.values():
        t_prev = None
        for i, s in enumerate(steps):
            ts_list = [
                t
                for t, ty in evs
                if ty == s and (t_prev is None or t > t_prev)
            ]
            if not ts_list:
                break
            t_prev = min(ts_list)
            expect[s] += 1
    assert got == expect
    assert got["view"] >= got["click"] >= got["purchase"] > 0


def test_retention_cohorts_hand_oracle(spark):
    rows = [
        # cohort week of Mon 2024-01-01: users 1, 2
        (1, datetime.datetime(2024, 1, 2)),   # week 0
        (1, datetime.datetime(2024, 1, 9)),   # week 1
        (1, datetime.datetime(2024, 1, 10)),  # same week 1 (dedup)
        (2, datetime.datetime(2024, 1, 3)),   # week 0 only
        # cohort week of Mon 2024-01-08: user 3
        (3, datetime.datetime(2024, 1, 8)),   # week 0
        (3, datetime.datetime(2024, 1, 22)),  # week 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r["cohort"]), r["offset"]): r["n_users"]
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }


def test_retention_day_unit_and_validation(spark, events):
    with pytest.raises(ValueError, match="unit"):
        retention_cohorts(events, unit="month")
    out = retention_cohorts(events, unit="day")
    rows = out.collect()
    assert all(r["offset"] >= 0 for r in rows)
    # offset-0 total equals the number of distinct users
    n_users = events.select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows if r["offset"] == 0) == n_users


def test_funnel_partition_invariant(events):
    steps = ["signup", "purchase"]
    a = sorted(map(tuple, funnel_counts(events.repartition(1), steps).collect()))
    b = sorted(map(tuple, funnel_counts(events.repartition(11), steps).collect()))
    assert a == b
