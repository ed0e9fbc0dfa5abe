"""Column stats: correlation matrix vs numpy, standardization properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators.stats import corr_matrix, standardize

COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_corr_matrix_matches_numpy(spark, lineitem):
    got = corr_matrix(lineitem, COLS).toPandas()
    X = lineitem.select(*COLS).toPandas().to_numpy()
    R = np.corrcoef(X, rowvar=False)
    assert len(got) == 6  # upper triangle of 4x4
    for r in got.itertuples():
        i, j = COLS.index(r.col_a), COLS.index(r.col_b)
        assert r.corr == pytest.approx(R[i, j], rel=1e-8, abs=1e-10)


def test_standardize_zero_mean_unit_var(spark, lineitem):
    out = standardize(lineitem, ["l_quantity", "l_extendedprice"])
    p = out.select("l_quantity_z", "l_extendedprice_z").toPandas()
    for c in p.columns:
        assert p[c].mean() == pytest.approx(0.0, abs=1e-9)
        assert p[c].std(ddof=1) == pytest.approx(1.0, rel=1e-9)
    assert out.count() == lineitem.count()
    assert set(lineitem.columns) < set(out.columns)


def test_standardize_rejects_constant_column(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, c double")
    with pytest.raises(ValueError, match="zero variance"):
        standardize(df, ["c"])


def test_distinct_count_salted_exact(spark, orders):
    from sparkglm_spark.operators.stats import distinct_count_salted
    from pyspark.sql import functions as F

    want = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for n_salts in (1, 16, 257):
        got = {
            r["o_orderpriority"]: r["n_distinct"]
            for r in distinct_count_salted(
                orders, ["o_orderpriority"], "o_custkey", n_salts=n_salts
            ).collect()
        }
        assert got == want, n_salts


def test_distinct_count_salted_validates(spark, orders):
    from sparkglm_spark.operators.stats import distinct_count_salted

    with pytest.raises(ValueError):
        distinct_count_salted(orders, ["o_orderpriority"], "o_custkey", n_salts=0)


def test_welch_ttest_matches_numpy(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import welch_ttest

    rng = np.random.default_rng(13)
    a = rng.normal(10.0, 2.0, 80)
    b = rng.normal(10.8, 3.5, 55)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double").repartition(6)
    out = welch_ttest(df, "g", "v")
    ps = (((out["n_a"] - 1) * out["var_a"] + (out["n_b"] - 1) * out["var_b"])
          / (out["n_a"] + out["n_b"] - 2)) ** 0.5
    assert out["cohens_d"] == pytest.approx(
        (out["mean_a"] - out["mean_b"]) / ps, rel=1e-12
    )
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se2 = v1 / 80 + v2 / 55
    t = (a.mean() - b.mean()) / se2**0.5
    dof = se2**2 / ((v1 / 80) ** 2 / 79 + (v2 / 55) ** 2 / 54)
    assert out["t_stat"] == pytest.approx(t, rel=1e-10)
    assert out["df"] == pytest.approx(dof, rel=1e-10)
    assert out["mean_a"] == pytest.approx(a.mean(), rel=1e-12)
    assert 0.0 < out["p_value"] < 1.0
    from sparkglm_spark.functions.special import t_pvalue_two_sided

    assert out["p_value"] == pytest.approx(t_pvalue_two_sided(t, dof), rel=1e-10)
    with pytest.raises(ValueError, match="exactly 2"):
        welch_ttest(df.where("g = 'a'"), "g", "v")


def test_chi2_independence_matches_numpy(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import chi2_independence

    rng = np.random.default_rng(17)
    # dependent pair: b correlated with a
    a = rng.integers(0, 3, 500)
    b = (a + (rng.random(500) < 0.35).astype(int)) % 4
    rows = [(f"a{x}", f"b{y}") for x, y in zip(a, b)]
    df = spark.createDataFrame(rows, "x string, y string").repartition(5)
    out = chi2_independence(df, "x", "y")
    v = (out["chi2"] / (out["n"] * min(out["levels_a"] - 1, out["levels_b"] - 1))) ** 0.5
    assert out["cramers_v"] == pytest.approx(v, rel=1e-12)
    assert 0.0 <= out["cramers_v"] <= 1.0
    obs = np.zeros((3, 4))
    for x, y in zip(a, b):
        obs[x, y % 4] += 1
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    mask = exp > 0
    chi2 = (((obs - exp) ** 2)[mask] / exp[mask]).sum()
    assert out["chi2"] == pytest.approx(chi2, rel=1e-10)
    assert out["df"] == (3 - 1) * (out["levels_b"] - 1)
    assert out["n"] == 500
    assert out["p_value"] < 0.05  # strongly dependent by construction


def test_chi2_independence_independent_is_insignificant(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import chi2_independence

    rng = np.random.default_rng(19)
    rows = [
        (f"a{int(x)}", f"b{int(y)}")
        for x, y in zip(rng.integers(0, 3, 2000), rng.integers(0, 3, 2000))
    ]
    df = spark.createDataFrame(rows, "x string, y string")
    out = chi2_independence(df, "x", "y")
    assert out["p_value"] > 0.01


def test_proportions_ztest(spark):
    from sparkglm_spark.operators.stats import proportions_ztest

    rows = [("a", 1.0)] * 120 + [("a", 0.0)] * 80 + [("b", 1.0)] * 90 + [
        ("b", 0.0)
    ] * 110
    df = spark.createDataFrame(rows, "g string, s double").repartition(4)
    out = proportions_ztest(df, "g", "s")
    p1, p2 = 120 / 200, 90 / 200
    pooled = 210 / 400
    z = (p1 - p2) / (pooled * (1 - pooled) * (1 / 200 + 1 / 200)) ** 0.5
    assert out["z_stat"] == pytest.approx(z, rel=1e-12)
    assert out["rate_a"] == pytest.approx(p1) and out["rate_b"] == pytest.approx(p2)
    assert out["p_value"] < 0.01
    with pytest.raises(ValueError, match="0/1"):
        proportions_ztest(
            spark.createDataFrame([("a", 2.0), ("b", 1.0)], "g string, s double"),
            "g", "s",
        )


def test_numeric_profile_matches_numpy(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import numeric_profile

    rng = np.random.default_rng(23)
    a = rng.normal(5, 2, 301)
    b = rng.exponential(3, 301)
    rows = [(float(x), float(y), None if i % 7 == 0 else float(x + y))
            for i, (x, y) in enumerate(zip(a, b))]
    df = spark.createDataFrame(rows, "a double, b double, c double").repartition(9)
    got = {r.column: r for r in numeric_profile(df, ["a", "b", "c"]).collect()}
    for name, vals in (("a", a), ("b", b)):
        r = got[name]
        assert r.n == 301 and r.n_null == 0
        assert r.mean == pytest.approx(vals.mean(), rel=1e-10)
        assert r.std == pytest.approx(vals.std(ddof=1), rel=1e-10)
        assert r.min == pytest.approx(vals.min()) and r.max == pytest.approx(vals.max())
        for q, field in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90")):
            assert getattr(r, field) == pytest.approx(
                np.quantile(vals, q), rel=1e-10
            ), (name, q)
    c_vals = np.array([x + y for i, (x, y) in enumerate(zip(a, b)) if i % 7 != 0])
    assert got["c"].n == len(c_vals)
    assert got["c"].n_null == 301 - len(c_vals)
    assert got["c"].p50 == pytest.approx(np.quantile(c_vals, 0.5), rel=1e-10)
    with pytest.raises(ValueError, match="non-empty"):
        numeric_profile(df, [])

def test_numeric_profile_approx_mode_agrees_with_exact(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import numeric_profile

    rng = np.random.default_rng(31)
    vals = rng.lognormal(1.0, 0.8, 4000)
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).repartition(7)
    exact = numeric_profile(df, ["x"]).collect()[0]
    approx = numeric_profile(df, ["x"], approx_mode=True, accuracy=10000).collect()[0]
    # non-percentile stats are identical aggregates in both modes
    assert approx.n == exact.n and approx.n_null == exact.n_null
    assert approx.mean == exact.mean and approx.std == exact.std
    assert approx.min == exact.min and approx.max == exact.max
    # sketch rank error <= 1/accuracy: at n=4000, accuracy=10000 the approx
    # value must be an actual data value adjacent to the exact quantile
    s = np.sort(vals)
    for q, field in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.9, "p90")):
        lo_rank = max(0, int(np.floor(q * len(s))) - 2)
        hi_rank = min(len(s) - 1, int(np.ceil(q * len(s))) + 2)
        got = getattr(approx, field)
        assert s[lo_rank] <= got <= s[hi_rank], (field, got)
    with pytest.raises(ValueError, match="accuracy"):
        numeric_profile(df, ["x"], approx_mode=True, accuracy=0)


def test_numeric_profile_non_identifier_column_names(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import numeric_profile

    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = spark.createDataFrame(
        [(v, v * 2.0) for v in vals],
        ["unit price", "total-due"],
    )
    out = {r.column: r for r in numeric_profile(df, ["unit price", "total-due"]).collect()}
    assert out["unit price"].p50 == pytest.approx(3.0)
    assert out["total-due"].p50 == pytest.approx(6.0)
    assert out["total-due"].mean == pytest.approx(np.mean(vals) * 2.0)


def test_welch_ttest_single_row_group_raises_cleanly(spark):
    from sparkglm_spark.operators.stats import welch_ttest

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0)], "g string, v double"
    )
    with pytest.raises(ValueError, match="n >= 2"):
        welch_ttest(df, "g", "v")
    # all-null values in one group: count() skips nulls, same clean error
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", None), ("b", None)], "g string, v double"
    )
    with pytest.raises(ValueError, match="n >= 2"):
        welch_ttest(df2, "g", "v")

def test_ks_test_2samp_matches_numpy(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import ks_test_2samp

    rng = np.random.default_rng(41)
    a = np.round(rng.normal(0, 1, 300), 1)        # ties via rounding
    b = np.round(rng.normal(0.5, 1.3, 250), 1)    # shifted + wider
    df = spark.createDataFrame(
        [("a", float(v)) for v in a] + [("b", float(v)) for v in b],
        "g string, v double",
    ).repartition(7)
    out = ks_test_2samp(df, "g", "v")
    # numpy twin over distinct values
    vals = np.unique(np.concatenate([a, b]))
    d = max(abs((a <= x).mean() - (b <= x).mean()) for x in vals)
    assert out["d_stat"] == pytest.approx(d, rel=1e-12)
    assert out["n_a"] == 300 and out["n_b"] == 250
    assert out["p_value"] < 0.01  # real distributional difference
    # same distribution: insignificant
    c = np.round(rng.normal(0, 1, 250), 1)
    df2 = spark.createDataFrame(
        [("a", float(v)) for v in a] + [("b", float(v)) for v in c],
        "g string, v double",
    )
    assert ks_test_2samp(df2, "g", "v")["p_value"] > 0.05
    with pytest.raises(ValueError, match="exactly 2"):
        ks_test_2samp(df.withColumn("g", F.lit("x")), "g", "v")


def test_mannwhitney_matches_numpy(spark):
    import numpy as np

    from sparkglm_spark.operators.stats import mannwhitney_utest

    rng = np.random.default_rng(43)
    a = np.round(rng.normal(0, 1, 200), 1)
    b = np.round(rng.normal(0.6, 1, 220), 1)
    df = spark.createDataFrame(
        [("a", float(v)) for v in a] + [("b", float(v)) for v in b],
        "g string, v double",
    ).repartition(5)
    out = mannwhitney_utest(df, "g", "v")
    # numpy twin: tie-aware U1 = sum over pairs 1(a>b) + 0.5 ties
    u = sum((a[:, None] > b[None, :]).sum() for _ in [0]) + 0.5 * (
        a[:, None] == b[None, :]
    ).sum()
    assert out["u_stat"] == pytest.approx(float(u), rel=1e-12)
    n1, n2, n = 200.0, 220.0, 420.0
    allv = np.concatenate([a, b])
    _, counts = np.unique(allv, return_counts=True)
    tc = float((counts.astype(float) ** 3 - counts).sum())
    var_u = n1 * n2 / 12.0 * ((n + 1.0) - tc / (n * (n - 1.0)))
    z = (float(u) - n1 * n2 / 2.0) / var_u**0.5
    assert out["z_stat"] == pytest.approx(z, rel=1e-12)
    assert out["p_value"] < 1e-6  # planted 0.6-sigma shift over 400 rows
    # all tied -> clean error
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)], "g string, v double"
    )
    with pytest.raises(ValueError, match="tied"):
        mannwhitney_utest(const, "g", "v")


def test_kolmogorov_sf_golden():
    from sparkglm_spark.functions.special import kolmogorov_sf

    # published critical values of the Kolmogorov distribution
    assert kolmogorov_sf(1.2238) == pytest.approx(0.10, abs=2e-4)
    assert kolmogorov_sf(1.3581) == pytest.approx(0.05, abs=2e-4)
    assert kolmogorov_sf(1.6276) == pytest.approx(0.01, abs=2e-4)
    assert kolmogorov_sf(0.0) == 1.0
    assert kolmogorov_sf(5.0) < 1e-20
    # small-lambda regime (huge-n near-identical samples): the dual
    # theta series — a truncated alternating series here returned ~0.01
    assert kolmogorov_sf(1e-3) == 1.0
    assert kolmogorov_sf(0.3) == pytest.approx(0.9999907, abs=1e-6)
    # branch continuity at the 1.18 switch (both series are exact)
    assert abs(kolmogorov_sf(1.1799) - kolmogorov_sf(1.1801)) < 2e-4

def test_distribution_drift_matches_numpy(spark):
    from sparkglm_spark.operators.stats import distribution_drift

    rng = np.random.default_rng(47)
    a = rng.normal(0, 1, 2000)
    b = rng.normal(0.8, 1.4, 1500)  # real drift
    ra = spark.createDataFrame([(float(v),) for v in a], "x double").repartition(5)
    rb = spark.createDataFrame([(float(v),) for v in b], "x double").repartition(3)
    out = distribution_drift(ra, rb, "x", n_bins=10, lo=-4.0, hi=6.0)
    # numpy twin with identical binning/smoothing
    import math
    bins_a = np.clip(np.floor((a + 4.0) / 10.0 * 10).astype(int), 0, 9)
    bins_b = np.clip(np.floor((b + 4.0) / 10.0 * 10).astype(int), 0, 9)
    psi = js = 0.0
    for i in range(10):
        p = (bins_a == i).mean()
        q = (bins_b == i).mean()
        ps, qs = max(p, 1e-6), max(q, 1e-6)
        psi += (ps - qs) * math.log(ps / qs)
        m = (p + q) / 2
        if p > 0: js += 0.5 * p * math.log(p / m)
        if q > 0: js += 0.5 * q * math.log(q / m)
    assert out["psi"] == pytest.approx(psi, rel=1e-12)
    assert out["js_divergence"] == pytest.approx(js, rel=1e-12)
    assert out["psi"] > 0.25              # major drift detected
    assert 0.0 < out["js_divergence"] <= math.log(2) + 1e-12
    assert out["n_ref"] == 2000 and out["n_cur"] == 1500
    assert sum(r["p_ref"] for r in out["bins"]) == pytest.approx(1.0)
    # identical samples -> ~0 everywhere (exact zeros: same proportions)
    same = distribution_drift(ra, ra, "x", n_bins=10, lo=-4.0, hi=6.0)
    assert same["psi"] == pytest.approx(0.0, abs=1e-12)
    assert same["js_divergence"] == pytest.approx(0.0, abs=1e-12)
    assert same["kl_ref_cur"] == pytest.approx(0.0, abs=1e-12)
    # auto bounds path works
    auto = distribution_drift(ra, rb, "x", n_bins=5)
    assert auto["lo"] <= min(a.min(), b.min()) + 1e-12
    with pytest.raises(ValueError, match="n_bins"):
        distribution_drift(ra, rb, "x", n_bins=1)
    with pytest.raises(ValueError, match="hi > lo"):
        distribution_drift(ra, rb, "x", lo=1.0, hi=1.0)

def test_two_sample_tests_drop_noncastable_values(spark):
    from sparkglm_spark.operators.stats import ks_test_2samp, mannwhitney_utest

    df = spark.createDataFrame(
        [("a", "1.0"), ("a", "2.0"), ("a", "junk"), ("b", "1.5"),
         ("b", ""), ("b", "2.5")],
        "g string, v string",
    )
    # ANSI mode would abort on the malformed strings with a plain cast;
    # try_cast drops them like nulls — counts cover castable rows only
    ks = ks_test_2samp(df, "g", "v")
    assert (ks["n_a"], ks["n_b"]) == (2, 2)
    mw = mannwhitney_utest(df, "g", "v")
    assert (mw["n_a"], mw["n_b"]) == (2, 2)


def test_distribution_drift_allnull_auto_bounds(spark):
    from sparkglm_spark.operators.stats import distribution_drift

    ok = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    nulls = spark.createDataFrame([(None,), (None,)], "x double")
    with pytest.raises(ValueError, match="non-null"):
        distribution_drift(ok, nulls, "x")

def test_distribution_drift_grouped_matches_per_slice(spark):
    from sparkglm_spark.operators.stats import (
        distribution_drift,
        distribution_drift_grouped,
    )

    rng = np.random.default_rng(61)
    rows_r, rows_c = [], []
    for g, (mu_r, mu_c) in {"a": (0.0, 0.0), "b": (0.0, 1.5)}.items():
        rows_r += [(g, float(v)) for v in rng.normal(mu_r, 1, 800)]
        rows_c += [(g, float(v)) for v in rng.normal(mu_c, 1, 700)]
    rows_c += [("only_cur", 1.0), ("only_cur", 2.0)]  # one-sided group
    ref = spark.createDataFrame(rows_r, "g string, x double").repartition(5)
    cur = spark.createDataFrame(rows_c, "g string, x double").repartition(3)

    got = {r.g: r for r in distribution_drift_grouped(
        ref, cur, "x", "g", n_bins=8, lo=-4.0, hi=6.0
    ).collect()}
    assert set(got) == {"a", "b", "only_cur"}
    for g in ("a", "b"):
        want = distribution_drift(
            ref.where(F.col("g") == g), cur.where(F.col("g") == g),
            "x", n_bins=8, lo=-4.0, hi=6.0,
        )
        assert got[g].psi == pytest.approx(want["psi"], rel=1e-12), g
        assert got[g].js_divergence == pytest.approx(
            want["js_divergence"], rel=1e-12
        ), g
        assert (got[g].n_ref, got[g].n_cur) == (want["n_ref"], want["n_cur"])
    # stable segment vs drifted segment ordering
    assert got["a"].psi < 0.1 < got["b"].psi
    # one-sided group: NULL metrics, not zero/inf
    assert got["only_cur"].psi is None and got["only_cur"].n_ref is None

    with pytest.raises(ValueError, match="explicit lo/hi"):
        distribution_drift_grouped(ref, cur, "x", "g")


def test_distribution_drift_excludes_nan(spark):
    """ADVICE r8: NaN passed the isNotNull filter and floor(NaN) binned
    it into bin 0, silently inflating the lowest-bin proportion. NaN
    rows must be excluded exactly like nulls — in the bin counts AND in
    the auto-bounds probe (NaN sorts greatest, so max() would be NaN)."""
    from sparkglm_spark.operators.stats import (
        distribution_drift,
        distribution_drift_grouped,
    )

    nan = float("nan")
    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)] + [(nan,)] * 50 + [(None,)] * 5,
        "x double",
    )
    cur = spark.createDataFrame(
        [(float((i % 10) + 0.5),) for i in range(80)] + [(nan,)] * 30,
        "x double",
    )
    clean_ref = ref.where(~F.isnan("x"))
    clean_cur = cur.where(~F.isnan("x"))
    got = distribution_drift(ref, cur, "x", n_bins=5)  # auto bounds
    want = distribution_drift(clean_ref, clean_cur, "x", n_bins=5)
    assert got == want
    assert got["n_ref"] == 100 and got["n_cur"] == 80
    assert got["hi"] == 9.5  # not NaN-poisoned

    refg = ref.withColumn("g", (F.lit(1)).cast("int"))
    curg = cur.withColumn("g", (F.lit(1)).cast("int"))
    gg = distribution_drift_grouped(
        refg, curg, "x", "g", n_bins=5, lo=0.0, hi=9.5
    ).collect()[0]
    assert gg.n_ref == 100 and gg.n_cur == 80
    assert gg.psi == pytest.approx(
        distribution_drift(clean_ref, clean_cur, "x", 5, lo=0.0, hi=9.5)["psi"],
        rel=1e-12,
    )


def test_oneway_anova_matches_numpy(spark):
    """One-way ANOVA vs the closed-form numpy computation; a planted
    mean shift is detected, identical means are not; guards."""
    import numpy as np

    from sparkglm_spark.functions.special import f_sf
    from sparkglm_spark.operators.stats import oneway_anova

    rng = np.random.default_rng(13)
    groups = {"a": 0.0, "b": 0.5, "c": 1.0}
    rows = []
    data = {}
    for g, mu in groups.items():
        x = rng.normal(mu, 1.0, 120)
        data[g] = x
        rows += [(g, float(v)) for v in x]
    rows.append((None, 5.0))  # null group excluded
    rows.append(("a", None))  # null value excluded
    df = spark.createDataFrame(rows, "g string, v double")
    got = oneway_anova(df, "g", "v")
    allv = np.concatenate(list(data.values()))
    grand = allv.mean()
    ssb = sum(len(x) * (x.mean() - grand) ** 2 for x in data.values())
    ssw = sum(((x - x.mean()) ** 2).sum() for x in data.values())
    k, n = 3, len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["n"] == n and got["k_groups"] == 3
    assert got["f_stat"] == pytest.approx(f, rel=1e-10)
    assert got["p_value"] == pytest.approx(f_sf(f, k - 1, n - k), rel=1e-10)
    assert got["eta_squared"] == pytest.approx(ssb / (ssb + ssw), rel=1e-10)
    assert got["p_value"] < 1e-6  # planted shift detected
    # no shift -> non-significant at typical levels (level check)
    same = spark.createDataFrame(
        [("a", float(v)) for v in rng.normal(0, 1, 150)]
        + [("b", float(v)) for v in rng.normal(0, 1, 150)],
        "g string, v double",
    )
    assert oneway_anova(same, "g", "v")["p_value"] > 0.01
    with pytest.raises(ValueError, match="2 groups"):
        oneway_anova(df.where(F.col("g") == "a"), "g", "v")


def test_spearman_corr_matches_scipy_convention(spark):
    """Tie-aware Spearman vs a numpy midrank twin (the
    cor(method='spearman') convention): exact on heavy ties, detects a
    monotone-nonlinear association Pearson understates, sign and
    perfect-monotone edge cases."""
    import numpy as np

    from sparkglm_spark.operators.stats import spearman_corr

    def midrank(x):
        order = np.argsort(x, kind="mergesort")
        ranks = np.empty(len(x))
        sx = x[order]
        i = 0
        while i < len(x):
            j = i
            while j < len(x) and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    rng = np.random.default_rng(23)
    x = rng.integers(0, 12, 400).astype(float)  # heavy ties
    y = np.exp(x / 3.0) + rng.integers(0, 3, 400)  # monotone nonlinear, tied
    rows = [(float(a), float(b)) for a, b in zip(x, y)]
    rows += [(None, 1.0), (2.0, float("nan"))]  # dropped pairs
    df = spark.createDataFrame(rows, "x double, y double").repartition(7)
    got = spearman_corr(df, "x", "y")
    ra, rb = midrank(x), midrank(y)
    want = np.corrcoef(ra, rb)[0, 1]
    assert got["n"] == 400
    assert got["rho"] == pytest.approx(float(want), rel=1e-10)
    assert got["p_value"] < 1e-10
    # perfect monotone: rho exactly 1 through the tie-free path
    mono = spark.createDataFrame(
        [(float(i), float(i**3)) for i in range(50)], "x double, y double"
    )
    m = spearman_corr(mono, "x", "y")
    assert m["rho"] == pytest.approx(1.0, abs=1e-12) and m["p_value"] == 0.0
    with pytest.raises(ValueError, match="constant"):
        spearman_corr(mono.withColumn("y", F.lit(1.0)), "x", "y")


def test_oneway_anova_group_cardinality_guard(spark):
    """VERDICT r9 #5: the per-group collect is bounded — a group column
    wider than max_groups raises (LIMIT-pushed, so the wire is bounded
    too) instead of silently collecting millions of rows; at or under
    the cap the statistics are computed on the FULL group set."""
    from sparkglm_spark.operators.stats import oneway_anova

    df = spark.createDataFrame(
        [(i % 40, float(i % 7) + (i % 3)) for i in range(400)],
        "g int, v double",
    )
    with pytest.raises(ValueError, match="distinct levels"):
        oneway_anova(df, "g", "v", max_groups=10)
    got = oneway_anova(df, "g", "v", max_groups=40)  # exactly at the cap
    assert got["k_groups"] == 40 and got["n"] == 400


def test_oneway_anova_large_offset_stability(spark):
    """Third-review r9: the raw-sum-of-squares SSW cancelled
    catastrophically on large-offset data (epoch-timestamp magnitudes),
    reporting F=inf/p=0 for IDENTICAL groups. The var_samp form must
    return a calm, correct F."""
    import numpy as np

    from sparkglm_spark.operators.stats import oneway_anova

    rng = np.random.default_rng(55)
    base = 1.7e12  # epoch-millisecond magnitude
    rows = []
    for g in ("a", "b", "c"):
        for v in rng.normal(0.0, 1e3, 200):
            rows.append((g, float(base + v)))  # identical means
    df = spark.createDataFrame(rows, "g string, v double")
    got = oneway_anova(df, "g", "v")
    assert np.isfinite(got["f_stat"]) and got["f_stat"] < 5.0
    assert got["p_value"] > 0.001  # identical groups: no false positive
    # all-constant groups: undefined F must raise, not report infinity
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)], "g string, v double"
    )
    with pytest.raises(ValueError, match="within-group variance"):
        oneway_anova(const, "g", "v")
