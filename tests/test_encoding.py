"""Ports of the reference's structural encoding tests
(modelMatrix$Test.scala, utils$Test.scala) + scale-data checks."""

import pytest
from pyspark.sql import functions as F

from sparkglm_spark.functions.encoding import (
    cast_all,
    get_levels,
    match_cols,
    model_matrix,
    omit_na,
)


@pytest.fixture(scope="module")
def dummy_df(spark):
    # F1 fixture (testData.scala:16-22)
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "intField int, strField string, numField double",
    )


@pytest.fixture(scope="module")
def one_less_df(spark):
    # F2 fixture (testData.scala:24-29)
    return spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)],
        "intField int, strField string, numField double",
    )


def test_model_matrix_mixed(dummy_df):
    out = model_matrix(dummy_df)
    # reference: modelMatrix$Test.scala:10-18
    assert out.columns == ["intField", "strField_b", "strField_c", "numField"]
    assert all(t == "double" for _, t in out.dtypes)
    rows = {r["intField"]: r for r in out.collect()}
    assert rows[1]["strField_b"] == 0.0 and rows[1]["strField_c"] == 0.0
    assert rows[2]["strField_b"] == 1.0 and rows[2]["strField_c"] == 0.0
    assert rows[3]["strField_b"] == 0.0 and rows[3]["strField_c"] == 1.0


def test_model_matrix_numeric_only(dummy_df):
    out = model_matrix(dummy_df.select("intField", "numField"))
    assert out.columns == ["intField", "numField"]
    assert all(t == "double" for _, t in out.dtypes)


def test_model_matrix_string_only(dummy_df):
    out = model_matrix(dummy_df.select("strField"))
    assert out.columns == ["strField_b", "strField_c"]


def test_match_cols_backfills_zero(one_less_df):
    # reference: utils$Test.scala:10-24
    enc = model_matrix(one_less_df)
    assert enc.columns == ["intField", "strField_b", "numField"]
    aligned = match_cols(enc, ["intField", "strField_b", "strField_c", "numField"])
    assert aligned.columns == ["intField", "strField_b", "strField_c", "numField"]
    vals = [r["strField_c"] for r in aligned.collect()]
    assert vals == [0.0, 0.0, 0.0]


def test_match_cols_drops_extras(dummy_df):
    enc = model_matrix(dummy_df)
    aligned = match_cols(enc, ["numField", "intField"])
    assert aligned.columns == ["numField", "intField"]


def test_get_levels_sorted(dummy_df):
    assert get_levels(dummy_df, "strField") == ["a", "b", "c"]


def test_cast_all(dummy_df):
    out = cast_all(dummy_df.select("intField", "numField"))
    assert all(t == "double" for _, t in out.dtypes)


def test_omit_na(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 3.0), (4.0, None)], "a double, b double"
    )
    assert omit_na(df).count() == 1


def test_scoring_encoding_stable_under_novel_levels(one_less_df, dummy_df):
    """Novel scoring-time categories get all-zero dummies (SURVEY §2.13.8)."""
    levels = {"strField": get_levels(one_less_df, "strField")}  # a, b only
    scored = model_matrix(dummy_df, levels=levels)  # dummy_df has level c
    row_c = [r for r in scored.collect() if r["intField"] == 3.0][0]
    assert row_c["strField_b"] == 0.0  # novel level c → all-zero dummies


def test_high_cardinality_column_rejected_before_collect(spark):
    """A mistyped id column must be rejected by the cheap HLL pre-guard
    (ValueError) rather than building a million-entry collect_set."""
    from sparkglm_spark.functions.encoding import get_levels_multi

    ids = spark.range(5000).select(
        F.concat(F.lit("id_"), F.col("id")).alias("k")
    )
    with pytest.raises(ValueError, match="approx"):
        get_levels_multi(ids, ["k"], max_levels=100)


def test_cardinality_near_boundary_uses_exact_check(spark):
    """Estimates under the 1.5× headroom fall through to the exact check:
    exactly max_levels levels must still succeed."""
    from sparkglm_spark.functions.encoding import get_levels_multi

    df = spark.range(100).select(
        F.concat(F.lit("v"), F.format_string("%03d", F.col("id"))).alias("k")
    )
    out = get_levels_multi(df, ["k"], max_levels=100)
    assert len(out["k"]) == 100
    assert out["k"] == sorted(out["k"])


def test_model_matrix_lineitem_scale(lineitem):
    out = model_matrix(
        lineitem.select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    )
    flags = sorted(
        r[0] for r in lineitem.select("l_returnflag").distinct().collect()
    )
    statuses = sorted(
        r[0] for r in lineitem.select("l_linestatus").distinct().collect()
    )
    expected = (
        [f"l_returnflag_{v}" for v in flags[1:]]
        + [f"l_linestatus_{v}" for v in statuses[1:]]
        + ["l_quantity", "l_extendedprice"]
    )
    assert out.columns == expected
    assert out.count() == lineitem.count()
    # dummies partition correctly: each row's returnflag dummies sum to 0 or 1
    s = out.select(
        sum([F.col(c) for c in out.columns if c.startswith("l_returnflag_")], F.lit(0.0)).alias("s")
    ).agg(F.min("s"), F.max("s")).collect()[0]
    assert 0.0 <= s[0] and s[1] <= 1.0
