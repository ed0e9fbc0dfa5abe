"""Column stats: correlation matrix vs numpy, standardization properties."""

import numpy as np
import pytest

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
