"""asof_join / range_join_points vs pandas merge_asof and naive θ-join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators.asof import asof_join, range_join_points


@pytest.fixture(scope="module")
def trades_quotes(spark):
    rng = np.random.default_rng(11)
    n_t, n_q = 400, 300
    trades = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C"], size=n_t),
            "t": rng.integers(0, 10_000, size=n_t).astype("int64"),
            "qty": rng.integers(1, 100, size=n_t).astype("int64"),
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B", "C"], size=n_q),
            "t": rng.integers(0, 10_000, size=n_q).astype("int64"),
            "px": rng.uniform(10, 20, size=n_q).round(4),
        }
    )
    # make (sym, t) unique on the right so merge_asof's tie choice is moot
    quotes = quotes.drop_duplicates(["sym", "t"])
    return spark.createDataFrame(trades), spark.createDataFrame(quotes), trades, quotes


def _pd_asof(trades, quotes, direction, tolerance=None):
    kw = {} if tolerance is None else {"tolerance": tolerance}
    exp = pd.merge_asof(
        trades.sort_values(["t", "sym", "qty"]).reset_index(drop=True),
        quotes.sort_values("t").reset_index(drop=True),
        on="t",
        by="sym",
        direction=direction,
        suffixes=("", "_right"),
        **kw,
    )
    return {
        (r.sym, r.t, r.qty, None if pd.isna(r.px) else round(r.px, 4))
        for r in exp.itertuples()
    }


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(trades_quotes, direction):
    sdf_t, sdf_q, trades, quotes = trades_quotes
    got = asof_join(
        sdf_t, sdf_q, on="sym", left_ts="t", direction=direction, how="left"
    )
    got_set = {
        (r["sym"], r["t"], r["qty"], None if r["px_right"] is None else round(r["px_right"], 4))
        for r in got.collect()
    }
    assert got_set == _pd_asof(trades, quotes, direction)


def test_asof_tolerance(trades_quotes):
    sdf_t, sdf_q, trades, quotes = trades_quotes
    got = asof_join(
        sdf_t, sdf_q, on="sym", left_ts="t", direction="backward",
        tolerance_seconds=100, how="left",
    )
    got_set = {
        (r["sym"], r["t"], r["qty"], None if r["px_right"] is None else round(r["px_right"], 4))
        for r in got.collect()
    }
    assert got_set == _pd_asof(trades, quotes, "backward", tolerance=100)


def test_asof_inner_drops_unmatched(trades_quotes):
    sdf_t, sdf_q, trades, quotes = trades_quotes
    left = asof_join(sdf_t, sdf_q, on="sym", left_ts="t", how="left")
    inner = asof_join(sdf_t, sdf_q, on="sym", left_ts="t", how="inner")
    assert inner.count() == left.where(F.col("px_right").isNotNull()).count()
    assert inner.where(F.col("px_right").isNull()).count() == 0


def test_asof_exact_ts_match_included(spark):
    left = spark.createDataFrame([("A", 100, 1)], ["sym", "t", "qty"])
    right = spark.createDataFrame([("A", 100, 42.0)], ["sym", "t", "px"])
    for direction in ("backward", "forward"):
        out = asof_join(left, right, on="sym", left_ts="t", direction=direction)
        assert out.collect()[0]["px_right"] == 42.0


def test_asof_partition_invariance(trades_quotes):
    sdf_t, sdf_q, _, _ = trades_quotes
    a = sorted(map(tuple, asof_join(sdf_t, sdf_q, on="sym", left_ts="t").collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                sdf_t.repartition(7), sdf_q.repartition(3), on="sym", left_ts="t"
            ).collect(),
        )
    )
    assert a == b


def test_range_join_matches_naive(spark):
    rng = np.random.default_rng(5)
    pts = pd.DataFrame(
        {
            "u": rng.choice([1, 2, 3], size=300),
            "t": rng.integers(0, 5_000, size=300).astype("int64"),
            "pid": np.arange(300, dtype="int64"),
        }
    )
    starts = rng.integers(0, 4_500, size=60).astype("int64")
    iv = pd.DataFrame(
        {
            "u": rng.choice([1, 2, 3], size=60),
            "s": starts,
            "e": starts + rng.integers(0, 800, size=60),
            "iid": np.arange(60, dtype="int64"),
        }
    )
    sp, si = spark.createDataFrame(pts), spark.createDataFrame(iv)
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points(
            sp, si, point_ts="t", start_col="s", end_col="e", on="u",
            bucket_seconds=250,
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in sp.join(si, ["u"]).where(
            (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
        ).collect()
    }
    assert got == naive and len(naive) > 0


def test_range_join_no_keys(spark):
    pts = spark.createDataFrame([(i, i * 10) for i in range(50)], ["pid", "t"])
    iv = spark.createDataFrame([(0, 95, 205), (1, 300, 310)], ["iid", "s", "e"])
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points(
            pts, iv, point_ts="t", start_col="s", end_col="e", bucket_seconds=50
        ).collect()
    }
    naive = {
        (p, i)
        for p in range(50)
        for i, (s, e) in enumerate([(95, 205), (300, 310)])
        if s <= p * 10 <= e
    }
    assert got == naive


def test_asof_join_rejects_mixed_timestamp_classes(spark):
    """NTZ vs LTZ sides live in different µs frames — must raise, not
    silently mismatch (ADVICE r01)."""
    import pytest
    from pyspark.sql import functions as F

    from sparkglm_spark.operators.asof import asof_join, range_join_points

    left = spark.sql(
        "SELECT 'A' AS sym, TIMESTAMP_NTZ '2024-01-01 00:00:00' AS ts, 1 AS qty"
    )
    right = spark.sql(
        "SELECT 'A' AS sym, TIMESTAMP '2024-01-01 00:00:00' AS ts, 5.0 AS px"
    )
    with pytest.raises(TypeError, match="timestamp class mismatch"):
        asof_join(left, right, on="sym", left_ts="ts")
    iv = right.select("sym", F.col("ts").alias("s"), F.col("ts").alias("e"))
    with pytest.raises(TypeError, match="timestamp class mismatch"):
        range_join_points(left, iv, point_ts="ts", start_col="s", end_col="e")


def test_resample_counts_fills_gaps(spark):
    from sparkglm_spark.operators.timeseries import resample_counts

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:10:00"), ("a", "2024-01-01 00:20:00"),
         ("a", "2024-01-01 03:05:00"), ("b", "2024-01-01 01:00:00")],
        "g string, ts string",
    ).selectExpr("g", "CAST(ts AS TIMESTAMP) AS ts")
    out = resample_counts(df, "ts", ["g"], unit="hour").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append((str(r.bucket), r.n_events))
    a = sorted(by_g["a"])
    # group a spans 00..03 → 4 buckets, hours 1 and 2 zero-filled
    assert len(a) == 4
    assert [n for _, n in a] == [2, 0, 0, 1]
    assert len(by_g["b"]) == 1


def test_moving_aggregate_range_frame_is_gap_aware(spark):
    from sparkglm_spark.operators.timeseries import moving_aggregate

    daily = spark.createDataFrame(
        [("k", "2024-01-01", 1.0), ("k", "2024-01-02", 2.0),
         ("k", "2024-01-10", 10.0)],
        "g string, d string, v double",
    ).selectExpr("g", "CAST(d AS DATE) AS d", "v")
    rows = {str(r.d): r for r in moving_aggregate(
        daily, "d", "v", window_days=7, partition_cols=["g"]).collect()}
    # Jan 10 is >7 days after Jan 1/2 → its trailing window sees only itself
    assert rows["2024-01-10"].v_mov_sum == 10.0
    assert rows["2024-01-10"].days_in_window == 1
    assert rows["2024-01-02"].v_mov_sum == 3.0


def test_moving_aggregate_requires_partition_cols(spark):
    import pytest as _pytest

    from sparkglm_spark.operators.timeseries import moving_aggregate

    daily = spark.createDataFrame([("2024-01-01", 1.0)], "d string, v double")
    with _pytest.raises(ValueError):
        moving_aggregate(daily, "d", "v")


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_asof_randomized_sweep_matches_pandas(spark, seed):
    """Seeded random sweep over the config space (direction × tolerance ×
    key skew, with duplicate left timestamps and keys missing from one
    side) — the fixed fixture can't reach every tie/boundary case."""
    rng = np.random.default_rng(seed)
    syms_l = rng.choice(["A", "B", "C", "D", "only_left"], size=120)
    syms_r = rng.choice(["A", "B", "C", "only_right"], size=90)
    trades = pd.DataFrame(
        {
            "sym": syms_l,
            # small t range → plenty of duplicate timestamps
            "t": rng.integers(0, 60, size=120).astype("int64"),
            "qty": np.arange(120).astype("int64"),  # unique row id
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": syms_r,
            "t": rng.integers(0, 60, size=90).astype("int64"),
            "px": rng.uniform(1, 2, size=90).round(4),
        }
    ).drop_duplicates(["sym", "t"])
    sdf_t = spark.createDataFrame(trades)
    sdf_q = spark.createDataFrame(quotes)
    for direction in ("backward", "forward"):
        for tol in (None, 5, 0):
            got = asof_join(
                sdf_t,
                sdf_q,
                on="sym",
                left_ts="t",
                direction=direction,
                tolerance_seconds=tol,
            ).collect()
            g = {
                (
                    r["sym"],
                    r["t"],
                    r["qty"],
                    None if r["px_right"] is None else round(r["px_right"], 4),
                )
                for r in got
            }
            want = _pd_asof(trades, quotes, direction, tolerance=tol)
            assert g == want, (direction, tol, seed)


@pytest.mark.parametrize("seed,bucket", [(1, 7), (2, 100), (3, 1)])
def test_range_join_randomized_boundary_sweep(spark, seed, bucket):
    """Seeded sweep stressing the bucket trick's edge cases: zero-length
    intervals, intervals exactly spanning bucket boundaries, points ON
    interval endpoints, and bucket sizes from degenerate (1) to larger
    than most intervals."""
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "u": rng.choice([1, 2], size=150),
            "t": rng.integers(0, 200, size=150).astype("int64"),
            "pid": np.arange(150, dtype="int64"),
        }
    )
    starts = rng.integers(0, 200, size=40).astype("int64")
    lengths = rng.choice([0, 1, bucket - 1 if bucket > 1 else 0, bucket, bucket + 1, 50], size=40)
    iv = pd.DataFrame(
        {
            "u": rng.choice([1, 2], size=40),
            "s": starts,
            "e": starts + lengths,
            "iid": np.arange(40, dtype="int64"),
        }
    )
    sp, si = spark.createDataFrame(pts), spark.createDataFrame(iv)
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points(
            sp, si, point_ts="t", start_col="s", end_col="e", on="u",
            bucket_seconds=bucket,
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in sp.join(si, ["u"]).where(
            (F.col("t") >= F.col("s")) & (F.col("t") <= F.col("e"))
        ).collect()
    }
    assert got == naive, (seed, bucket)


@pytest.mark.parametrize("tol", [None, 5])
def test_asof_nearest_matches_pandas(spark, tol):
    """direction='nearest' (ties → backward, pandas semantics) against
    merge_asof over a seeded random frame with duplicate timestamps and
    equidistant-tie cases."""
    rng = np.random.default_rng(41)
    trades = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B"], size=100),
            "t": rng.integers(0, 50, size=100).astype("int64"),
            "qty": np.arange(100).astype("int64"),
        }
    )
    quotes = pd.DataFrame(
        {
            "sym": rng.choice(["A", "B"], size=60),
            "t": rng.integers(0, 50, size=60).astype("int64"),
            "px": rng.uniform(1, 2, size=60).round(4),
        }
    ).drop_duplicates(["sym", "t"])
    got = asof_join(
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        on="sym",
        left_ts="t",
        direction="nearest",
        tolerance_seconds=tol,
    ).collect()
    g = {
        (r["sym"], r["t"], r["qty"], None if r["px_right"] is None else round(r["px_right"], 4))
        for r in got
    }
    assert g == _pd_asof(trades, quotes, "nearest", tolerance=tol)


def test_asof_nearest_single_shuffle_no_join(spark):
    """nearest keeps the single keyed exchange (two sorts, two windows, no
    join node) — a second shuffle or a join here would break the operator's
    scale contract."""
    left = spark.createDataFrame([("A", 1, 10)], ["sym", "t", "qty"])
    right = spark.createDataFrame([("A", 1, 5.0)], ["sym", "t", "px"])
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, on="sym", left_ts="t", direction="nearest").explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange") == 2  # formatted lists nodes twice: ONE exchange
    assert "hashpartitioning(sym" in plan


def test_asof_tie_break_greatest_payload_all_directions(spark):
    """Right rows tied on (key, ts) must resolve to the GREATEST payload
    struct in every direction — r5 review caught forward/nearest picking
    the smallest (the fixtures' per-(key, ts) dedup had masked it)."""
    left = spark.createDataFrame([("A", 5, 1)], ["sym", "t", "qty"])
    right = spark.createDataFrame(
        [("A", 7, 10.0), ("A", 7, 20.0), ("A", 3, 10.0), ("A", 3, 20.0)],
        ["sym", "t", "px"],
    )
    for direction in ("backward", "forward", "nearest"):
        row = asof_join(
            left, right, on="sym", left_ts="t", direction=direction
        ).collect()[0]
        assert row["px_right"] == 20.0, direction
