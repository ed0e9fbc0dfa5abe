"""Binary classification eval + the distributed prefix-sum plan."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators.evaluate import (
    binary_classification_eval,
    calibration_bins,
)
from sparkglm_spark.plans.prefix import global_running_sum


def _auc_numpy(y, p):
    """Tie-aware Mann-Whitney via average ranks (no scipy)."""
    y = np.asarray(y, float)
    p = np.asarray(p, float)
    order = np.argsort(p, kind="mergesort")
    sp = p[order]
    ranks = np.empty(len(p), float)
    i = 0
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = 0.5 * (i + 1 + j)  # average rank, 1-based
        i = j
    npos = y.sum()
    nneg = len(y) - npos
    u = ranks[y == 1].sum() - npos * (npos + 1) / 2.0
    return u / (npos * nneg)


@pytest.fixture(scope="module")
def scored(spark):
    rng = np.random.default_rng(11)
    n = 400
    y = (rng.random(n) < 0.4).astype(float)
    # scores correlated with labels + deliberate TIES (quantized to 2dp)
    p = np.clip(0.25 * y + 0.55 * rng.random(n), 0.0, 1.0).round(2)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, p)], "y double, p double"
    ).repartition(7)
    return df, y, p


def test_metrics_match_numpy(scored):
    df, y, p = scored
    got = {r.metric: r.value for r in binary_classification_eval(df, "y", "p").collect()}
    assert got["n"] == len(y)
    assert got["n_pos"] == y.sum()
    assert got["auc"] == pytest.approx(_auc_numpy(y, p), rel=1e-12)
    pc = np.clip(p, 1e-15, 1 - 1e-15)
    ll = -(y * np.log(pc) + (1 - y) * np.log(1 - pc)).mean()
    assert got["log_loss"] == pytest.approx(ll, rel=1e-12)
    assert got["brier"] == pytest.approx(((p - y) ** 2).mean(), rel=1e-12)
    pred = (p >= 0.5).astype(float)
    tp = ((pred == 1) & (y == 1)).sum()
    fp = ((pred == 1) & (y == 0)).sum()
    fn = ((pred == 0) & (y == 1)).sum()
    assert got["accuracy"] == pytest.approx((pred == y).mean(), rel=1e-12)
    assert got["precision"] == pytest.approx(tp / (tp + fp), rel=1e-12)
    assert got["recall"] == pytest.approx(tp / (tp + fn), rel=1e-12)


def test_auc_edge_cases(spark):
    # perfect separation -> 1.0; reversed -> 0.0; one class -> NaN
    perfect = spark.createDataFrame(
        [(1.0, 0.9), (1.0, 0.8), (0.0, 0.2), (0.0, 0.1)], "y double, p double"
    )
    got = {r.metric: r.value for r in binary_classification_eval(perfect, "y", "p").collect()}
    assert got["auc"] == 1.0
    rev = perfect.withColumn("p", 1.0 - F.col("p"))
    got = {r.metric: r.value for r in binary_classification_eval(rev, "y", "p").collect()}
    assert got["auc"] == 0.0
    mono = perfect.withColumn("y", F.lit(1.0))
    got = {r.metric: r.value for r in binary_classification_eval(mono, "y", "p").collect()}
    assert math.isnan(got["auc"]) and math.isnan(got["recall"]) is False
    with pytest.raises(ValueError, match="0/1"):
        binary_classification_eval(
            spark.createDataFrame([(2.0, 0.5)], "y double, p double"), "y", "p"
        ).collect()


def test_auc_ap_driver_and_distributed_paths_agree(spark, monkeypatch):
    """The bounded-collect driver path and the global_running_sum
    fallback produce the same AUC (exact — integer-half arithmetic) and
    AP (to float reassociation) for tied and untied score tables (r14)."""
    import sparkglm_spark.operators.evaluate as ev

    rng = np.random.default_rng(7)
    y = (rng.random(400) < 0.4).astype(float)
    p = np.round(rng.random(400), 2)  # ties across rows
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, p)], "y double, p double"
    )
    fast = {r.metric: r.value for r in ev.binary_classification_eval(df, "y", "p").collect()}
    monkeypatch.setattr(ev, "_AUC_DRIVER_MAX_SCORES", 0)
    slow = {r.metric: r.value for r in ev.binary_classification_eval(df, "y", "p").collect()}
    assert fast["auc"] == slow["auc"]
    assert fast["avg_precision"] == pytest.approx(slow["avg_precision"], rel=1e-13)


def test_all_ties_auc_is_half(spark):
    df = spark.createDataFrame(
        [(1.0, 0.5), (0.0, 0.5), (1.0, 0.5), (0.0, 0.5)], "y double, p double"
    )
    got = {r.metric: r.value for r in binary_classification_eval(df, "y", "p").collect()}
    assert got["auc"] == pytest.approx(0.5, abs=1e-12)


def test_calibration_bins(scored):
    df, y, p = scored
    rows = calibration_bins(df, "y", "p", n_bins=10).collect()
    assert sum(r.n for r in rows) == len(y)
    for r in rows:
        sel = (np.minimum((p * 10).astype(int), 9)) == r.bin
        assert r.n == sel.sum()
        assert r.frac_pos == pytest.approx(y[sel].mean(), rel=1e-12)
    # score exactly 1.0 folds into the top bin
    one = df.sparkSession.createDataFrame([(1.0, 1.0)], "y double, p double")
    assert calibration_bins(one, "y", "p", 10).collect()[0].bin == 9


def test_global_running_sum_matches_pandas(spark):
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 50, 300)  # heavy ties
    vals = rng.random(300)
    df = spark.createDataFrame(
        [(int(k), float(v)) for k, v in zip(keys, vals)], "k int, v double"
    ).repartition(11)
    for n_part in (1, 4, 32):
        got = (
            global_running_sum(df, "k", ["v"], num_partitions=n_part)
            .select("k", "v_cum")
            .collect()
        )
        # range semantics: every row of a tie group carries the group total
        import pandas as pd

        pdf = pd.DataFrame({"k": keys, "v": vals})
        totals = pdf.groupby("k")["v"].sum().sort_index().cumsum()
        for r in got:
            assert r.v_cum == pytest.approx(totals[r.k], rel=1e-9), (n_part, r.k)


def test_global_running_sum_no_single_partition_window(spark):
    """The plan must not contain a partition-less window (the Spark
    single-partition trap this helper exists to avoid): every Window
    should be keyed by the prefix pid, and the exchange set should be a
    range partitioning + the tiny broadcast, never SinglePartition."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 97).cast("double").alias("k"), F.lit(1.0).alias("v")
    )
    out = global_running_sum(df, "k", ["v"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_grouped_auc_matches_per_group_numpy(spark):
    rng = np.random.default_rng(5)
    rows = []
    for g in ("a", "b", "c"):
        n = 120
        y = (rng.random(n) < 0.5).astype(float)
        p = np.clip(0.3 * y + 0.5 * rng.random(n), 0, 1).round(2)
        rows += [(g, float(a), float(b)) for a, b in zip(y, p)]
    rows += [("mono", 1.0, 0.3), ("mono", 1.0, 0.7)]  # one-class group
    df = spark.createDataFrame(rows, "g string, y double, p double").repartition(5)
    from sparkglm_spark.operators.evaluate import grouped_auc

    got = {r.g: r for r in grouped_auc(df, "g", "y", "p").collect()}
    pdf = {(g): ([], []) for g in ("a", "b", "c")}
    for g, y, p in rows:
        if g in pdf:
            pdf[g][0].append(y)
            pdf[g][1].append(p)
    for g, (ys, ps) in pdf.items():
        assert got[g].auc == pytest.approx(_auc_numpy(ys, ps), rel=1e-12), g
        assert got[g].n == len(ys)
    assert got["mono"].auc is None
    assert got["mono"].n_pos == 2.0


def test_roc_points_match_numpy(scored):
    df, y, p = scored
    from sparkglm_spark.operators.evaluate import roc_points

    pts = roc_points(df, "y", "p").collect()
    P, N = y.sum(), (1 - y).sum()
    uniq = np.unique(p)[::-1]  # descending
    assert len(pts) == len(uniq)
    for r, s in zip(pts, uniq):
        assert r.score == pytest.approx(s)
        sel = p >= s
        assert r.tpr == pytest.approx(y[sel].sum() / P, rel=1e-12)
        assert r.fpr == pytest.approx((1 - y)[sel].sum() / N, rel=1e-12)
        assert r.precision == pytest.approx(y[sel].mean(), rel=1e-12)
    # curve ends at (1,1)
    assert pts[-1].tpr == pytest.approx(1.0) and pts[-1].fpr == pytest.approx(1.0)


def test_roc_auc_consistency_via_trapezoid(scored):
    """∫ tpr d(fpr) over the exact ROC staircase (trapezoid, which equals
    the tie-aware Mann-Whitney AUC) must reproduce the AUC metric."""
    df, y, p = scored
    from sparkglm_spark.operators.evaluate import (
        binary_classification_eval,
        roc_points,
    )

    pts = roc_points(df, "y", "p").collect()
    xs = [0.0] + [r.fpr for r in pts]
    ys_ = [0.0] + [r.tpr for r in pts]
    trap = sum(
        (xs[i + 1] - xs[i]) * (ys_[i + 1] + ys_[i]) / 2.0 for i in range(len(pts))
    )
    got = {r.metric: r.value for r in binary_classification_eval(df, "y", "p").collect()}
    assert got["auc"] == pytest.approx(trap, rel=1e-10)

def test_average_precision_matches_numpy(scored):
    """AP by the step rule over descending distinct thresholds (the
    sklearn average_precision definition, tie groups entering together):
    AP = sum over thresholds of (ΔR)·P(≥s)."""
    df, y, p = scored
    got = {
        r.metric: r.value
        for r in binary_classification_eval(df, "y", "p").collect()
    }
    P = y.sum()
    ap = 0.0
    for s in sorted(np.unique(p))[::-1]:
        at = p >= s
        pos_s = y[p == s].sum()  # zero-pos groups contribute exactly 0
        prec = y[at].sum() / at.sum()
        ap += (pos_s / P) * prec
    assert got["avg_precision"] == pytest.approx(ap, rel=1e-10)
    # bounded and consistent with the no-skill baseline (pos_rate)
    assert got["pos_rate"] <= got["avg_precision"] <= 1.0

    # perfect separation -> AP = 1; reversed scores -> low AP
    perfect = df.select("y", F.col("y").alias("p"))
    gp = {r.metric: r.value for r in binary_classification_eval(perfect, "y", "p").collect()}
    assert gp["avg_precision"] == pytest.approx(1.0)

def test_regression_eval_matches_numpy(spark):
    from sparkglm_spark.operators.evaluate import regression_eval

    rng = np.random.default_rng(13)
    y = rng.normal(100, 20, 800)
    p = y + rng.normal(2.0, 5.0, 800)  # biased predictor
    y[5] = 0.0  # one zero label for the mape exclusion path
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, p)], "y double, p double"
    ).repartition(7)
    got = {r.metric: r.value for r in regression_eval(df, "y", "p").collect()}
    e = p - y
    assert got["n"] == 800
    assert got["mse"] == pytest.approx(np.mean(e**2), rel=1e-10)
    assert got["rmse"] == pytest.approx(np.sqrt(np.mean(e**2)), rel=1e-10)
    assert got["mae"] == pytest.approx(np.mean(np.abs(e)), rel=1e-10)
    assert got["median_ae"] == pytest.approx(np.quantile(np.abs(e), 0.5), rel=1e-10)
    assert got["bias"] == pytest.approx(np.mean(e), rel=1e-8)
    sse, tss = (e**2).sum(), ((y - y.mean()) ** 2).sum()
    assert got["r2"] == pytest.approx(1 - sse / tss, rel=1e-9)
    ve = ((e - e.mean()) ** 2).sum()
    assert got["explained_variance"] == pytest.approx(1 - ve / tss, rel=1e-9)
    nz = y != 0
    assert got["n_nonzero_label"] == nz.sum()
    assert got["mape"] == pytest.approx(
        np.mean(np.abs(e[nz] / y[nz])), rel=1e-10
    )
    # approx median agrees loosely
    ap = {r.metric: r.value for r in regression_eval(df, "y", "p",
                                                     approx_median=True).collect()}
    assert ap["median_ae"] == pytest.approx(got["median_ae"], rel=1e-2)
    # perfect predictor
    perfect = df.select("y", F.col("y").alias("p"))
    gp = {r.metric: r.value for r in regression_eval(perfect, "y", "p").collect()}
    assert gp["rmse"] == 0.0 and gp["r2"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="null"):
        regression_eval(
            spark.createDataFrame([(1.0, None)], "y double, p double"), "y", "p"
        )

def test_lift_table_matches_numpy(scored):
    from sparkglm_spark.operators.evaluate import lift_table

    df, y, p = scored
    got = lift_table(df, "y", "p", n_bins=10).collect()
    # numpy twin with the SAME tie convention: distinct scores descending,
    # each tie group binned by ceil(10 * cum_count / N)
    uniq = np.unique(p)[::-1]
    N, P = len(y), y.sum()
    bins = {}
    cum = 0
    for s in uniq:
        sel = p == s
        cum += sel.sum()
        b = min(int(np.ceil(10 * cum / N)), 10)
        n0, p0 = bins.get(b, (0, 0))
        bins[b] = (n0 + sel.sum(), p0 + y[sel].sum())
    assert len(got) == len(bins)
    cn = cp = 0
    for r in got:
        n, npos = bins[r.bin]
        cn += n
        cp += npos
        assert (r.n, r.n_pos) == (n, npos), r.bin
        assert r.response_rate == pytest.approx(npos / n, rel=1e-12)
        assert r.lift == pytest.approx((npos / n) / (P / N), rel=1e-12)
        assert r.cum_gain == pytest.approx(cp / P, rel=1e-12)
        assert r.cum_lift == pytest.approx((cp / P) / (cn / N), rel=1e-12)
    # partition sanity: bins cover all rows, gains end at 1
    assert sum(r.n for r in got) == N and got[-1].cum_gain == pytest.approx(1.0)
    # a decent score: top-decile lift > 1 > bottom-decile lift
    assert got[0].lift > 1.0 > got[-1].lift
    with pytest.raises(ValueError, match="n_bins"):
        lift_table(df, "y", "p", 0)

def test_lift_table_rejects_nulls(spark):
    from sparkglm_spark.operators.evaluate import lift_table

    df = spark.createDataFrame(
        [(1.0, 0.9), (None, 0.5), (0.0, 0.2)], "y double, p double"
    )
    with pytest.raises(ValueError, match="null"):
        lift_table(df, "y", "p")
    df2 = spark.createDataFrame(
        [(1.0, 0.9), (0.0, None)], "y double, p double"
    )
    with pytest.raises(ValueError, match="null"):
        lift_table(df2, "y", "p")


def test_eval_rejects_nan(spark):
    """ADVICE r8: NaN passed isNull and silently propagated into every
    metric (regression_eval) / silently ranked top (classification).
    Both evals and lift_table must reject NaN like null."""
    from sparkglm_spark.operators.evaluate import (
        binary_classification_eval,
        lift_table,
        regression_eval,
    )

    nan = float("nan")
    reg = spark.createDataFrame(
        [(1.0, 1.1), (2.0, nan), (3.0, 2.9)], "y double, p double"
    )
    with pytest.raises(ValueError, match="NaN"):
        regression_eval(reg, "y", "p")
    clf = spark.createDataFrame(
        [(1.0, 0.9), (0.0, nan), (1.0, 0.7)], "y double, p double"
    )
    with pytest.raises(ValueError, match="NaN"):
        binary_classification_eval(clf, "y", "p")
    with pytest.raises(ValueError, match="NaN"):
        lift_table(clf, "y", "p", n_bins=2)
    lab = spark.createDataFrame(
        [(nan, 0.9), (0.0, 0.5), (1.0, 0.7)], "y double, p double"
    )
    with pytest.raises(ValueError, match="NaN"):
        lift_table(lab, "y", "p", n_bins=2)


def test_lift_table_pads_empty_bins(spark):
    """ADVICE r8: a huge tie group used to leave earlier bins ABSENT;
    they must be padded with n=0 rows carrying the running cumulative so
    the output always has exactly n_bins positionally-indexable rows."""
    from sparkglm_spark.operators.evaluate import lift_table

    # 90 rows tied at score 0.5 (30 positive) + 10 rows at 0.9 (all
    # positive): the 0.9 group ends at cum 10 -> bin 1; the tie group
    # ends at cum 100 -> bin 4; bins 2 and 3 are empty.
    rows = [(1.0, 0.9)] * 10 + [(1.0, 0.5)] * 30 + [(0.0, 0.5)] * 60
    df = spark.createDataFrame(rows, "y double, p double")
    out = lift_table(df, "y", "p", n_bins=4).orderBy("bin").collect()
    assert [r.bin for r in out] == [1, 2, 3, 4]
    assert [r.n for r in out] == [10, 0, 0, 90]
    assert [r.cum_n for r in out] == [10, 10, 10, 100]
    assert [r.cum_pos for r in out] == [10, 10, 10, 40]
    for r in out[1:3]:  # padded bins: NULL rate/lift, cumulative carried
        assert r.response_rate is None and r.lift is None
        assert r.cum_gain == pytest.approx(10 / 40)
        assert r.cum_lift == pytest.approx((10 / 40) / (10 / 100))
    assert out[3].cum_gain == pytest.approx(1.0)


def test_isotonic_calibration_matches_pav(spark):
    """fit_isotonic_calibration vs a numpy pool-adjacent-violators twin:
    the fitted step values at the training scores must match PAV over
    the distinct-score (rate, weight) reduction; transform is monotone,
    clamps outside the fitted range, and fixes the planted
    miscalibration (better Brier than the raw scores)."""
    import numpy as np

    from sparkglm_spark.operators.evaluate import (
        binary_classification_eval,
        fit_isotonic_calibration,
    )

    rng = np.random.default_rng(3)
    n = 4000
    true_p = rng.uniform(0.05, 0.95, n)
    y = (rng.random(n) < true_p).astype(float)
    score = true_p**3  # systematically mis-calibrated, monotone in true_p
    score = np.round(score, 2)  # heavy ties: the distinct-score reduction matters
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, score)], "y double, p double"
    ).repartition(5)
    cal = fit_isotonic_calibration(df, "y", "p")
    assert np.all(np.diff(cal.predictions) >= -1e-12)  # monotone map

    # numpy PAV twin over the same distinct-score reduction
    import collections
    agg = collections.defaultdict(lambda: [0.0, 0.0])
    for a, b in zip(y, score):
        agg[b][0] += a
        agg[b][1] += 1.0
    xs = sorted(agg)
    vals = [agg[x][0] / agg[x][1] for x in xs]
    ws = [agg[x][1] for x in xs]
    pools = []  # (value, weight) stacks
    for v, w in zip(vals, ws):
        pools.append([v, w])
        while len(pools) > 1 and pools[-2][0] >= pools[-1][0]:
            v2, w2 = pools.pop()
            pools[-1][0] = (pools[-1][0] * pools[-1][1] + v2 * w2) / (
                pools[-1][1] + w2
            )
            pools[-1][1] += w2
    pav_fit = []
    i = 0
    remaining = pools[0][1]
    for v, w in zip(vals, ws):
        pav_fit.append(pools[i][0])
        remaining -= w
        if remaining <= 1e-9 and i + 1 < len(pools):
            i += 1
            remaining = pools[i][1]

    scored = cal.transform(df.select("p").distinct()).orderBy("p").collect()
    got = {r.p: r.calibrated for r in scored}
    for x, v in zip(xs, pav_fit):
        assert got[x] == pytest.approx(v, abs=1e-9), x

    # calibration improves the proper scoring rule
    both = cal.transform(df)
    raw = {r.metric: r.value for r in
           binary_classification_eval(df, "y", "p").collect()}
    fixed = {r.metric: r.value for r in
             binary_classification_eval(
                 both.select("y", F.col("calibrated").alias("p")), "y", "p"
             ).collect()}
    assert fixed["brier"] < raw["brier"] - 0.01
    # clamping outside the fitted range
    edge = cal.transform(
        spark.createDataFrame([(-5.0,), (5.0,)], "p double")
    ).orderBy("p").collect()
    assert edge[0].calibrated == pytest.approx(float(cal.predictions[0]))
    assert edge[1].calibrated == pytest.approx(float(cal.predictions[-1]))

    bad = spark.createDataFrame([(2.0, 0.5)], "y double, p double")
    with pytest.raises(ValueError, match="0/1"):
        fit_isotonic_calibration(bad, "y", "p")


def test_isotonic_transform_null_scores_calibrate_null(spark):
    """Review r9: a null/NaN score must calibrate to NULL instead of
    aborting the job inside VectorAssembler (handleInvalid='error')."""
    from sparkglm_spark.operators.evaluate import fit_isotonic_calibration

    train = spark.createDataFrame(
        [(0.0, 0.1), (0.0, 0.2), (1.0, 0.3), (1.0, 0.8), (1.0, 0.9)],
        "y double, p double",
    )
    cal = fit_isotonic_calibration(train, "y", "p")
    dirty = spark.createDataFrame(
        [(0.5,), (None,), (float("nan"),)], "p double"
    )
    got = cal.transform(dirty).collect()
    by = {("nan" if r.p != r.p else r.p) if r.p is not None else None:
          r.calibrated for r in got}
    assert by[0.5] is not None
    assert by[None] is None and by["nan"] is None


def test_isotonic_persist_roundtrip_and_mllib_parity(spark, tmp_path):
    """IsotonicCalibration persists through the engine JSON layout like
    every other fitted family, and its np.interp transform is identical
    to MLlib's own IsotonicRegressionModel interpolation on a dense
    probe grid (interior, knot-exact, and out-of-range points)."""
    import numpy as np
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    from sparkglm_spark.operators.evaluate import fit_isotonic_calibration
    from sparkglm_spark.persist import load_model, save_model

    rng = np.random.default_rng(17)
    y = (rng.random(800) < np.linspace(0.1, 0.9, 800)).astype(float)
    p = np.round(np.linspace(0, 1, 800) ** 2, 3)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, p)], "y double, p double"
    )
    cal = fit_isotonic_calibration(df, "y", "p")
    path = str(tmp_path / "iso.json")
    save_model(cal, path)
    back = load_model(path)
    np.testing.assert_array_equal(back.boundaries, cal.boundaries)
    np.testing.assert_array_equal(back.predictions, cal.predictions)
    assert back.score_col == "p"

    # MLlib parity on a probe grid
    grid = np.concatenate([
        np.linspace(-0.2, 1.2, 57), cal.boundaries,
        (cal.boundaries[:-1] + cal.boundaries[1:]) / 2.0,
    ])
    gdf = spark.createDataFrame([(float(v),) for v in grid], "p double")
    ours = {r.p: r.calibrated for r in back.transform(gdf).collect()}
    mdl = IsotonicRegression(
        featuresCol="f", labelCol="y", weightCol="w"
    ).fit(
        VectorAssembler(inputCols=["p"], outputCol="f").transform(
            df.groupBy("p").agg(
                F.avg("y").alias("y"),
                F.count(F.lit(1)).cast("double").alias("w"),
            )
        )
    )
    theirs = {
        r.p: r.pred
        for r in mdl.transform(
            VectorAssembler(inputCols=["p"], outputCol="f")
            .transform(gdf)
        ).withColumnRenamed("prediction", "pred").collect()
    }
    for v in grid:
        assert ours[float(v)] == pytest.approx(theirs[float(v)], abs=1e-12), v


def test_isotonic_fit_rejects_inf_scores(spark):
    from sparkglm_spark.operators.evaluate import fit_isotonic_calibration

    df = spark.createDataFrame(
        [(0.0, 0.1), (1.0, float("inf")), (1.0, 0.9)], "y double, p double"
    )
    with pytest.raises(ValueError, match="non-finite"):
        fit_isotonic_calibration(df, "y", "p")
