"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query smoke check on sf0.001.
`queries()` — one entry per implemented operator from SURVEY.md §2 plus the
north-star extension ops; each callable (spark, sf_dir) → DataFrame.
`oracle_sql()` — equivalent DuckDB ANSI SQL per query (omitted only for
genuinely non-SQL-expressible ops: GLM IRLS fit, pandas-UDF feature
extraction → rows-only checks).

Determinism strategy (Spark vs DuckDB value-hash):
- money-style aggregates run in DECIMAL (exact, engine-independent), final
  CAST to DOUBLE → bit-identical;
- integer counts/ratios are exact; single double divisions are IEEE-
  deterministic;
- transcendental per-row kernels (log/exp) are rounded to 6 decimals
  (both engines within ulps — rounding margin ≫ divergence);
- fitted coefficients are rounded to the digit where numpy-solve vs SQL
  closed-form agree (documented per query).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkglm_spark.session import read_table

DEC = "decimal(18,6)"  # product = decimal(37,12): exact, fits both engines


def _dec(c):
    return F.col(c).cast(DEC) if isinstance(c, str) else c.cast(DEC)


def _sum_dec(expr) -> F.Column:
    return F.sum(expr).cast("double")


# ===========================================================================
# §2.2 projections / encoding (reference: modelMatrix.scala, utils.scala)
# ===========================================================================


def q_model_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/P3/P5: model_matrix on lineitem categoricals + numerics
    (modelMatrix.scala:18-30)."""
    from sparkglm_spark.functions.encoding import model_matrix

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
    )
    return model_matrix(
        li, levels={"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
    )


SQL_MODEL_MATRIX_LINEITEM = """
SELECT CAST(l_orderkey AS DOUBLE) AS l_orderkey,
       CAST(l_linenumber AS DOUBLE) AS l_linenumber,
       CAST(l_quantity AS DOUBLE) AS l_quantity,
       CASE WHEN l_returnflag = 'N' THEN 1.0 ELSE 0.0 END AS l_returnflag_N,
       CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS l_returnflag_R,
       CASE WHEN l_linestatus = 'O' THEN 1.0 ELSE 0.0 END AS l_linestatus_O
FROM lineitem
"""


def q_match_cols_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: match_cols zero-backfill of a predictor column absent from the
    data (utils.scala:21-33)."""
    from sparkglm_spark.functions.encoding import match_cols, model_matrix

    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment")
    enc = model_matrix(
        cust,
        levels={
            "c_mktsegment": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
        },
    )
    return match_cols(
        enc,
        ["c_custkey", "c_acctbal", "c_mktsegment_BUILDING", "c_mktsegment_MISSING"],
    )


SQL_MATCH_COLS_CUSTOMER = """
SELECT CAST(c_custkey AS DOUBLE) AS c_custkey,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS c_mktsegment_BUILDING,
       0.0 AS c_mktsegment_MISSING
FROM customer
"""


def q_distinct_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/O1: sorted distinct category levels (modelMatrix.scala:56-58)."""
    from sparkglm_spark.functions.encoding import get_levels

    li = read_table(spark, sf_dir, "lineitem")
    rows = [("l_returnflag", lvl) for lvl in get_levels(li, "l_returnflag")] + [
        ("l_linestatus", lvl) for lvl in get_levels(li, "l_linestatus")
    ]
    return spark.createDataFrame(rows, "col string, level string")


SQL_DISTINCT_LEVELS = """
SELECT 'l_returnflag' AS col, l_returnflag AS level FROM lineitem GROUP BY 2
UNION ALL
SELECT 'l_linestatus' AS col, l_linestatus AS level FROM lineitem GROUP BY 2
"""


def q_omit_na_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: omit_na + cast_all (utils.R:24-27, modelMatrix.scala:79-85)."""
    from sparkglm_spark.functions.encoding import cast_all, omit_na

    sup = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_acctbal")
    return cast_all(omit_na(sup))


SQL_OMIT_NA_CAST = """
SELECT CAST(s_suppkey AS DOUBLE) AS s_suppkey,
       CAST(s_nationkey AS DOUBLE) AS s_nationkey,
       CAST(s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier
WHERE s_suppkey IS NOT NULL AND s_nationkey IS NOT NULL AND s_acctbal IS NOT NULL
"""


# ===========================================================================
# §2.4 aggregations: Gram matrices (reference: LM.scala:142-155,
# utils.scala:83-100 — partial-agg + tree-reduce → here one SQL agg)
# ===========================================================================

_GRAM_COLS = ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]


def q_gram_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3: Gram matrix upper triangle (X'X with y appended) in exact
    decimal, long format (term, value)."""
    from sparkglm_spark.plans.gram import gram_query

    li = read_table(spark, sf_dir, "lineitem")
    return gram_query(li, _GRAM_COLS[:3], y_col=_GRAM_COLS[3], decimal=True)


def _sql_gram(cols: list[str]) -> str:
    parts = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            a, b = cols[i], cols[j]
            parts.append(
                f"SELECT '{a}__{b}' AS term, "
                f"CAST(CAST(SUM(CAST({a} AS DECIMAL(19,6)) * CAST({b} AS DECIMAL(19,6))) AS DECIMAL(38,6)) AS VARCHAR) AS value "
                f"FROM lineitem"
            )
    return " UNION ALL ".join(parts) + " ORDER BY term"


SQL_GRAM_LINEITEM = _sql_gram(_GRAM_COLS)


def q_gram_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: weighted Gram (X'WX core of WLS — utils.scala:83-100), weight =
    l_quantity, exact decimal (9,3)·(12,4)·(12,4) → (35,11) fits 38."""
    li = read_table(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("decimal(9,3)")
    cols = ["l_discount", "l_tax", "l_extendedprice"]
    aggs, names = [], []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            a = F.col(cols[i]).cast("decimal(12,4)")
            b = F.col(cols[j]).cast("decimal(12,4)")
            nm = f"{cols[i]}__{cols[j]}"
            aggs.append(
                F.sum(w * a * b).cast("decimal(38,6)").cast("string").alias(nm)
            )
            names.append(nm)
    wide = li.agg(*aggs)
    stack = "stack({n}, {args}) as (term, value)".format(
        n=len(names), args=", ".join(f"'{nm}', {nm}" for nm in names)
    )
    return wide.selectExpr(stack).orderBy("term")


def _sql_gram_weighted() -> str:
    cols = ["l_discount", "l_tax", "l_extendedprice"]
    parts = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            a, b = cols[i], cols[j]
            parts.append(
                f"SELECT '{a}__{b}' AS term, "
                f"CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,3)) * CAST({a} AS DECIMAL(19,4)) * CAST({b} AS DECIMAL(19,4))) AS DECIMAL(38,6)) AS VARCHAR) AS value "
                f"FROM lineitem"
            )
    return " UNION ALL ".join(parts) + " ORDER BY term"


SQL_GRAM_WEIGHTED = _sql_gram_weighted()


def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A10/A11: count / sum / mean / min / max (LM.scala:167-168,247;
    GLM.scala:420-423)."""
    li = read_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))

    def dstr(c):
        return F.sum(_dec(c)).cast("decimal(38,6)").cast("string")

    return li.agg(
        n.alias("n_rows"),
        dstr("l_quantity").alias("sum_qty"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / n, 6).alias("mean_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dstr("l_extendedprice").alias("sum_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


SQL_COLUMN_STATS = """
SELECT count(*) AS n_rows,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_qty,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) / count(*), 6) AS mean_qty,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
"""


# ===========================================================================
# §2.11 LM (reference: LM.scala) — fit, stats, predict
# ===========================================================================


def q_lm_fit_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: OLS l_extendedprice ~ l_quantity via the engine's Gram+solve
    path. Oracle: closed-form Cramer from exact decimal sums. Both rounded
    to 1 decimal (double-sum vs decimal-sum Gram divergence ≲1e-4 abs at
    this conditioning; rounding margin 0.05 ≫)."""
    from sparkglm_spark.operators.lm import lm

    li = read_table(spark, sf_dir, "lineitem")
    model = lm(li, "l_extendedprice ~ l_quantity")
    rows = [(name, round(float(c), 1)) for name, c in zip(model.xnames, model.coefs)]
    return spark.createDataFrame(rows, "term string, coef double").orderBy("term")


SQL_LM_FIT_SIMPLE = """
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy
  FROM lineitem)
SELECT 'intercept' AS term, ROUND((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 1) AS coef FROM s
UNION ALL
SELECT 'l_quantity' AS term, ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 1) AS coef FROM s
ORDER BY term
"""


def q_lm_fit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2/M4: R² and n from the same fit (LM.scala:185,206-207), R² rounded
    to 5 (divergence ≲1e-9)."""
    from sparkglm_spark.operators.lm import lm

    li = read_table(spark, sf_dir, "lineitem")
    model = lm(li, "l_extendedprice ~ l_quantity")
    return spark.createDataFrame(
        [(round(model.r2, 5), model.nrow)], "r2 double, n_rows bigint"
    )


SQL_LM_FIT_STATS = """
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM lineitem)
SELECT ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 5) AS r2,
       n_rows
FROM s
"""


def q_lm_predict_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: predict as a pure Catalyst linear combination with fixed
    coefficients (LM.scala:29-61 surface, no RDD round-trip). Bit-exact:
    identical left-associated double arithmetic in both engines."""
    import numpy as np

    from sparkglm_spark.operators.lm import LM

    li = read_table(spark, sf_dir, "lineitem")
    model = LM(
        xnames=["intercept", "l_quantity", "l_discount"],
        yname="l_extendedprice",
        coefs=np.array([-1000.0, 150.0, 2000.0]),
        std_err=np.zeros(3),
        sigma=0.0,
        r2=0.0,
        f_stat=0.0,
        nrow=0,
    )
    return model.predict(li).select("l_orderkey", "l_linenumber", "prediction")


SQL_LM_PREDICT_FIXED = """
SELECT l_orderkey, l_linenumber,
       -1000.0 * 1.0 + 150.0 * CAST(l_quantity AS DOUBLE) + 2000.0 * CAST(l_discount AS DOUBLE) AS prediction
FROM lineitem
"""


# ===========================================================================
# §2.11 GLM (reference: GLM.scala) — kernels oracle-checked; full IRLS fit
# is iterative (rows-only check)
# ===========================================================================

_GB0, _GB1 = -0.4, 2.0e-6  # fixed beta for kernel queries


def q_glm_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4 + IRLS z/w (GLM.scala:125-129,190-204,282-290): logit-link
    kernels at fixed β over orders; per-row transcendentals rounded to 6."""
    from sparkglm_spark.functions.links import Logit, variance_binomial

    od = read_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    m = F.lit(1.0)
    eta = F.lit(_GB0) + F.lit(_GB1) * F.col("o_totalprice")
    lnk = Logit()
    mu = lnk.unlink(eta, m)
    grad = lnk.lprime(mu, m)
    w = F.lit(1.0) / (variance_binomial(mu, m) * grad * grad)
    z = eta + (y - mu) * grad
    return od.select(
        "o_orderkey",
        F.round(mu, 6).alias("mu"),
        F.round(w, 6).alias("w"),
        F.round(z, 6).alias("z"),
    )


SQL_GLM_KERNELS = f"""
WITH base AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         {_GB0} + {_GB1} * o_totalprice AS eta
  FROM orders),
k AS (
  SELECT o_orderkey, y, eta,
         1.0 / (1.0 + exp(-eta)) AS mu
  FROM base),
k2 AS (
  SELECT o_orderkey, y, eta, mu,
         mu * (1.0 - mu / 1.0) AS var,
         1.0 / (mu * (1.0 - mu)) AS grad
  FROM k)
SELECT o_orderkey,
       ROUND(mu, 6) AS mu,
       ROUND(1.0 / (var * grad * grad), 6) AS w,
       ROUND(eta + (y - mu) * grad, 6) AS z
FROM k2
"""


def q_glm_deviance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 deviance aggregate at fixed β (devBinomial, GLM.scala:162-170),
    rounded to 3 (ulp-sum divergence ≪ 1e-6)."""
    from sparkglm_spark.functions.links import Logit, deviance_binomial_expr

    od = read_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    m = F.lit(1.0)
    eta = F.lit(_GB0) + F.lit(_GB1) * F.col("o_totalprice")
    mu = Logit().unlink(eta, m)
    return od.agg(
        F.round(F.lit(2.0) * F.sum(deviance_binomial_expr(y, mu, m)), 3).alias("deviance")
    )


SQL_GLM_DEVIANCE = f"""
WITH k AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         1.0 / (1.0 + exp(-({_GB0} + {_GB1} * o_totalprice))) AS mu
  FROM orders)
SELECT ROUND(2.0 * SUM(
         (CASE WHEN y = 0 THEN 0.0 ELSE y * ln(greatest(y, 1.0) / mu) END)
       + (CASE WHEN 1.0 - y = 0 THEN 0.0 ELSE (1.0 - y) * ln(greatest(1.0 - y, 1.0) / (1.0 - mu)) END)
       ), 3) AS deviance
FROM k
"""


def q_glm_fit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7-M9: full binomial IRLS fit (iterative — rows-only check; numeric
    oracle lives in tests/test_glm.py against driver-side IRLS)."""
    from sparkglm_spark.operators.glm import glm

    od = read_table(spark, sf_dir, "orders").withColumn(
        "is_f", F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    )
    model = glm(od, "is_f ~ o_totalprice", family="binomial", link="logit")
    rows = [
        (name, round(float(c), 6)) for name, c in zip(model.xnames, model.coefs)
    ] + [
        ("deviance", round(model.deviance, 3)),
        ("null_deviance", round(model.null_deviance, 3)),
        ("aic", round(model.aic, 3)),
        ("iterations", float(model.iter)),
    ]
    return spark.createDataFrame(rows, "stat string, value double").orderBy("stat")


def q_wls_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/M6: weighted least squares (utils.wlsSingle/wlsMultiple,
    utils.scala:70-80,103-112), weight = l_quantity. Oracle: closed-form
    weighted Cramer from exact decimal sums; both rounded to 1 decimal."""
    from sparkglm_spark.operators.lm import wls

    li = read_table(spark, sf_dir, "lineitem")
    model = wls(li, "l_extendedprice ~ l_discount", weight_col="l_quantity")
    rows = [(name, round(float(c), 1)) for name, c in zip(model.xnames, model.coefs)]
    return spark.createDataFrame(rows, "term string, coef double").orderBy("term")


SQL_WLS_FIT = """
WITH s AS (
  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sw,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS swx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS swy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) AS swxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_discount AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS swxy
  FROM lineitem)
SELECT 'intercept' AS term,
       ROUND((swy - ((sw * swxy - swx * swy) / (sw * swxx - swx * swx)) * swx) / sw, 1) AS coef FROM s
UNION ALL
SELECT 'l_discount' AS term,
       ROUND((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 1) AS coef FROM s
ORDER BY term
"""


def q_glm_gaussian_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family plug-in (SURVEY §2.13.1): gaussian/identity GLM ≡ OLS — the
    IRLS path collapses to one normal-equations solve, so the closed-form
    OLS oracle applies. Coefs rounded to 1 decimal (same conditioning as
    lm_fit_simple)."""
    from sparkglm_spark.operators.glm import glm

    li = read_table(spark, sf_dir, "lineitem")
    model = glm(li, "l_extendedprice ~ l_quantity", family="gaussian")
    rows = [(name, round(float(c), 1)) for name, c in zip(model.xnames, model.coefs)]
    return spark.createDataFrame(rows, "term string, coef double").orderBy("term")


SQL_GLM_GAUSSIAN_FIT = SQL_LM_FIT_SIMPLE


def q_glm_poisson_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson/log GLM on counts (iterative IRLS — rows-only check; numeric
    oracle lives in tests/test_glm.py against driver-side numpy IRLS)."""
    from sparkglm_spark.operators.glm import glm

    li = read_table(spark, sf_dir, "lineitem")
    model = glm(li, "l_quantity ~ l_discount + l_tax", family="poisson")
    rows = [
        (name, round(float(c), 6)) for name, c in zip(model.xnames, model.coefs)
    ] + [
        ("deviance", round(model.deviance, 3)),
        ("iterations", float(model.iter)),
    ]
    return spark.createDataFrame(rows, "stat string, value double").orderBy("stat")


def q_glm_gamma_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gamma/log GLM on positive amounts (iterative IRLS — rows-only;
    numeric oracle in tests/test_glm.py vs driver-side numpy IRLS)."""
    from sparkglm_spark.operators.glm import glm

    li = read_table(spark, sf_dir, "lineitem")
    model = glm(li, "l_extendedprice ~ l_quantity", family="gamma")
    rows = [
        (name, round(float(c), 6)) for name, c in zip(model.xnames, model.coefs)
    ] + [
        ("deviance", round(model.deviance, 3)),
        ("iterations", float(model.iter)),
    ]
    return spark.createDataFrame(rows, "stat string, value double").orderBy("stat")


def q_glm_cloglog_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-F10: cloglog link kernels at fixed β over orders (GLM.scala:
    237-251); per-row transcendentals rounded to 6."""
    from sparkglm_spark.functions.links import Cloglog, variance_binomial

    od = read_table(spark, sf_dir, "orders")
    y = F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    m = F.lit(1.0)
    eta = F.lit(_GB0) + F.lit(_GB1) * F.col("o_totalprice")
    lnk = Cloglog()
    mu = lnk.unlink(eta, m)
    grad = lnk.lprime(mu, m)
    w = F.lit(1.0) / (variance_binomial(mu, m) * grad * grad)
    z = eta + (y - mu) * grad
    return od.select(
        "o_orderkey",
        F.round(mu, 6).alias("mu"),
        F.round(w, 6).alias("w"),
        F.round(z, 6).alias("z"),
    )


SQL_GLM_CLOGLOG_KERNELS = f"""
WITH base AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
         {_GB0} + {_GB1} * o_totalprice AS eta
  FROM orders),
k AS (
  SELECT o_orderkey, y, eta,
         1.0 - exp(-exp(eta)) AS mu
  FROM base),
k2 AS (
  SELECT o_orderkey, y, eta, mu,
         mu * (1.0 - mu / 1.0) AS var,
         1.0 / ((mu - 1.0) * ln(1.0 - mu)) AS grad
  FROM k)
SELECT o_orderkey,
       ROUND(mu, 6) AS mu,
       ROUND(1.0 / (var * grad * grad), 6) AS w,
       ROUND(eta + (y - mu) * grad, 6) AS z
FROM k2
"""


# ===========================================================================
# Relational coverage (joins/agg/sort/limit — free from Spark SQL, declared
# for the harness; reference aligns tables positionally instead, SURVEY §2.3)
# ===========================================================================


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: group-agg with decimal-exact sums."""
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    n = F.count(F.lit(1))

    def dstr(e):
        return F.sum(e).cast("decimal(38,6)").cast("string")

    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dstr(_dec("l_quantity")).alias("sum_qty"),
            dstr(_dec("l_extendedprice")).alias("sum_base_price"),
            dstr(disc_price).alias("sum_disc_price"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_discount")).cast("double") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * (CAST(1 AS DECIMAL(19,6)) - CAST(l_discount AS DECIMAL(19,6)))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(19,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + group + top-10 by revenue. Only the
    segment-filtered customer dim is broadcast; lineitem⋈orders is fact⋈fact
    (both grow with SF) so the join strategy is left to AQE — at 100 TB a
    forced broadcast of orders would OOM every executor."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .where(F.col("o_orderdate") < F.lit("1998-01-01"))
        .groupBy("l_orderkey")
        .agg(F.sum(revenue).cast("decimal(38,6)").alias("rev_d"))
        .orderBy(F.col("rev_d").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", F.col("rev_d").cast("string").alias("revenue"))
    )


SQL_TOP_ORDERS = """
WITH agg AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * (CAST(1 AS DECIMAL(19,6)) - CAST(l_discount AS DECIMAL(19,6)))) AS DECIMAL(38,6)) AS rev_d
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY l_orderkey)
SELECT l_orderkey, CAST(rev_d AS VARCHAR) AS revenue
FROM agg ORDER BY rev_d DESC, l_orderkey ASC LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 5-way star join → revenue per nation. True dims
    (region, nation) are broadcast; customer and orders are facts that grow
    with SF, so those joins are left to AQE (shuffle join at scale,
    runtime-broadcast when a filtered side turns out small)."""
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("decimal(38,6)").alias("rev_d"))
        .orderBy(F.col("rev_d").desc(), F.col("n_name"))
        .select("n_name", F.col("rev_d").cast("string").alias("revenue"))
    )


SQL_REGION_REVENUE = """
WITH agg AS (
  SELECT n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * (CAST(1 AS DECIMAL(19,6)) - CAST(l_discount AS DECIMAL(19,6)))) AS DECIMAL(38,6)) AS rev_d
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
  GROUP BY n_name)
SELECT n_name, CAST(rev_d AS VARCHAR) AS revenue
FROM agg ORDER BY rev_d DESC, n_name
"""


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set coverage: ROLLUP over (returnflag, linestatus) with
    decimal-exact revenue; NULL group keys mapped to 'ALL' for a stable
    hash."""
    li = read_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(revenue).cast("decimal(38,6)").cast("string").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_rows",
        )
    )


SQL_ROLLUP_REVENUE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS VARCHAR) AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation per group (linear interpolation — the
    same definition as DuckDB quantile_cont), rounded to 6."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(l_quantity, 0.99)"), 6).alias("p99"),
        )
        .orderBy("l_returnflag")
    )


SQL_QUANTITY_PERCENTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
       ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90,
       ROUND(quantile_cont(l_quantity, 0.99), 6) AS p99
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function coverage: per-customer running order-value total in
    order-date order (rows-unbounded-preceding frame; deterministic
    tie-break by orderkey). Decimal-exact running sums."""
    od = read_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.where(F.col("o_custkey") < 200).select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("decimal(38,6)").cast("string").alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


SQL_CUSTOMER_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6)) AS VARCHAR) AS running_total,
       row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS order_seq
FROM orders WHERE o_custkey < 200
"""


def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: group-HAVING on an aggregate (orders whose total
    lineitem quantity exceeds a threshold)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("decimal(38,6)").alias("qty_d"))
        .where(F.col("qty_d") > 150)
        .select("l_orderkey", F.col("qty_d").cast("string").alias("total_qty"))
    )


SQL_BIG_ORDERS = """
SELECT l_orderkey,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
"""


def q_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style correlated EXISTS (reference has no joins — SURVEY §2.3):
    count orders per priority having at least one lineitem shipped more than
    60 days after the order date. Spark expresses the EXISTS as a left-semi
    join with a compound condition (key equality + correlated date predicate);
    the semi-join never fans out order rows, and AQE picks broadcast when the
    probe side is small."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


SQL_LATE_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage: customers with no orders (left_anti on the
    broadcast fact keys)."""
    cust = read_table(spark, sf_dir, "customer")
    od = read_table(spark, sf_dir, "orders")
    return (
        cust.join(od, cust.c_custkey == od.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def q_nation_region_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op coverage: union + except over key sets (nations present in
    supplier vs customer)."""
    sup = read_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    both = sup.intersect(cust).withColumn("which", F.lit("both"))
    sup_only = sup.distinct().exceptAll(cust.distinct()).withColumn(
        "which", F.lit("supplier_only")
    )
    return both.unionByName(sup_only)


SQL_NATION_REGION_SETOPS = """
SELECT nationkey, 'both' AS which FROM (
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
  INTERSECT
  SELECT DISTINCT c_nationkey AS nationkey FROM customer)
UNION ALL
SELECT nationkey, 'supplier_only' AS which FROM (
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
  EXCEPT
  SELECT DISTINCT c_nationkey AS nationkey FROM customer)
"""


# ===========================================================================
# North-star extensions: dedup / similarity / text / multimodal / events
# ===========================================================================


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.dedup import exact_dedup_hashed

    return exact_dedup_hashed(docs, "text", "doc_id").select("doc_id", "source")


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source
FROM documents GROUP BY text
"""


def q_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group summary: canonical key + group size for groups >1
    (pure groupBy — partial aggregation)."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.dedup import duplicate_groups

    return duplicate_groups(docs, ["text"], "doc_id").select(
        "canonical_id", "group_size"
    )


SQL_DUPLICATE_GROUPS = """
SELECT min(doc_id) AS canonical_id, count(*) AS group_size
FROM documents GROUP BY text HAVING count(*) > 1
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, Hamming ≤ 3 (rows-only: the 64-bit signature
    hinges on Spark's xxhash64, which DuckDB lacks)."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3)


def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH near-dup (rows-only: approximate candidate set;
    the exact re-rank keeps precision 1 but recall < 1 by design)."""
    emb = read_table(spark, sf_dir, "embeddings")
    from sparkglm_spark.operators.similarity import lsh_near_dup_pairs

    out = lsh_near_dup_pairs(emb, dim=64, threshold=0.35, n_bits=64)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.dedup import jaccard_pairs

    out = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


SQL_DEDUP_JACCARD = """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct([substring(lower(text), i, 3) FOR i IN range(1, length(text) - 1)])) AS shingle
  FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
"""


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH (128 perms, 32 bands) + exact verification — output
    equals exact Jaccard pairs (P(miss at j≥0.8) ≈ 5e-8), so the exact
    oracle applies."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.dedup import minhash_dedup_pairs

    out = minhash_dedup_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


SQL_DEDUP_MINHASH = SQL_DEDUP_JACCARD


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    from sparkglm_spark.operators.similarity import cosine_topk

    queries = emb.where(F.col("vec_id") < 50)
    out = cosine_topk(emb, queries, k=3)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


SQL_SIMILARITY_TOPK = """
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
           / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS cosine
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs)
SELECT query_id, neighbor_id, ROUND(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= 3
"""


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with full probing (n_probe = n_lists): exhaustive search
    through the inverted-file plan — must equal the brute-force oracle
    exactly. (Partial-probe recall is covered in tests/test_similarity.py.)"""
    emb = read_table(spark, sf_dir, "embeddings")
    from sparkglm_spark.operators.similarity import ivf_topk

    queries = emb.where(F.col("vec_id") < 50)
    out = ivf_topk(emb, queries, k=3, n_lists=8, n_probe=8)
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


def q_similarity_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    from sparkglm_spark.operators.similarity import cosine_near_dup_pairs

    out = cosine_near_dup_pairs(emb, threshold=0.35)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


SQL_SIMILARITY_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.35
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.text import text_stats

    return text_stats(docs)


SQL_TEXT_STATS = r"""
WITH t AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
         length(text) - length(replace(text, ' ', '')) AS n_space,
         len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> list_contains(['the','a','an','and','or','is','are','was','to','of','in','on','it','that','this','with','for','as','be'], x))) AS hits
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       CAST(n_chars AS DOUBLE) / nullif(n_tokens, 0) AS avg_token_len,
       CAST(hits AS DOUBLE) / nullif(n_tokens, 0) AS stopword_ratio,
       CAST(n_alpha AS DOUBLE) / nullif(n_chars, 0) AS alpha_ratio,
       CAST(n_digit AS DOUBLE) / nullif(n_chars, 0) AS digit_ratio,
       CAST(n_space AS DOUBLE) / nullif(n_chars, 0) AS space_ratio
FROM t
"""


def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.text import language_id

    return language_id(docs)


def _sql_language_id() -> str:
    from sparkglm_spark.operators.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    hits = ",\n         ".join(
        "len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
        f"x -> list_contains({LANG_PROFILES[lg]!r}, x))) AS hits_{lg}".replace("'", "'")
        for lg in langs
    )
    hit_list = ", ".join(f"hits_{lg}" for lg in langs)
    pick = "CASE " + " ".join(
        f"WHEN hits_{lg} = best THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH t AS (
  SELECT doc_id,
         {hits}
  FROM documents),
b AS (SELECT doc_id, {hit_list}, greatest({hit_list}) AS best FROM t)
SELECT doc_id, {pick} AS detected_lang, CAST(best AS BIGINT) AS lang_score FROM b
"""


SQL_TEXT_LANGUAGE_ID = _sql_language_id()


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex pre-tokenizer."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.text import bpe_token_count

    return bpe_token_count(docs)


SQL_TEXT_TOKENS = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens_ws,
       len(list_filter(
           regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+', 0),
           x -> length(trim(x)) > 0)) AS n_tokens_bpe
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score over the text stats (fixed weights; IEEE
    double arithmetic in identical order in both engines, rounded to 6)."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.text import quality_score

    out = quality_score(docs)
    return out.select(
        "doc_id", "n_tokens", F.round("quality_score", 6).alias("quality_score")
    )


SQL_TEXT_QUALITY = r"""
WITH t AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
         len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> list_contains(['the','a','an','and','or','is','are','was','to','of','in','on','it','that','this','with','for','as','be'], x))) AS hits
  FROM documents),
r AS (
  SELECT doc_id, n_tokens,
         coalesce(CAST(n_alpha AS DOUBLE) / nullif(n_chars, 0), 0.0) AS alpha_ratio,
         coalesce(CAST(hits AS DOUBLE) / nullif(n_tokens, 0), 0.0) AS stopword_ratio
  FROM t)
SELECT doc_id, n_tokens,
       ROUND(0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
           + 0.3 * alpha_ratio
           + 0.3 * least(stopword_ratio * 5.0, 1.0), 6) AS quality_score
FROM r
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.text import fingerprint

    return fingerprint(docs)


SQL_TEXT_FINGERPRINT = """
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN 0
            ELSE list_reduce([CAST(ord(c) AS BIGINT) FOR c IN split(text, '')],
                             (a, b) -> (a * 31 + b) % 1000000007) END AS fingerprint
FROM documents
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    from sparkglm_spark.streaming.events import windowed_event_stats

    out = windowed_event_stats(ev, window="1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        "n_events",
        "n_users",
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_events_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime totals — the batch core of the stateful streaming
    operator (applyInPandasWithState); decimal-exact value sums."""
    ev = read_table(spark, sf_dir, "events")
    from sparkglm_spark.streaming.events import user_running_totals

    out = user_running_totals(ev.withColumn("value", _dec("value")))
    return out.select(
        "user_id",
        "n_events",
        F.col("value_sum").cast("decimal(38,6)").cast("string").alias("value_sum"),
    )


SQL_EVENTS_USER_TOTALS = """
SELECT user_id, count(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS value_sum
FROM events GROUP BY user_id
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    from sparkglm_spark.streaming.events import sessionize

    out = sessionize(ev, gap="30 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    )


SQL_EVENTS_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked)
SELECT user_id,
       strftime(date_trunc('second', min(ts)), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events
FROM sess
GROUP BY user_id, sess_id
"""


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction from the `props` payload column (from_json
    with an explicit schema — JVM-side parsing, codegen-friendly; the
    reference has no JSON functions, SURVEY §2.8) aggregated per event
    type."""
    ev = read_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k", F.from_json(F.col("props"), "k BIGINT").getField("k")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_JSON_PROPS = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS avg_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent purchase at-or-before it
    (kdb/pandas `merge_asof` semantics). Executed as union + ONE window
    pass — both sides shuffle once on user_id, no join explosion
    (operators/asof.py). Purchases are pre-deduped per (user, ts) so the
    tie-winner is engine-independent."""
    ev = read_table(spark, sf_dir, "events")
    from sparkglm_spark.operators.asof import asof_join

    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(clicks, purch, on="user_id", left_ts="ts", how="inner")
    return out.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("purchase_value_right", 6).alias("purchase_value"),
    )


SQL_EVENTS_ASOF_JOIN = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
purch AS (
  SELECT user_id, ts, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT c.event_id,
       strftime(date_trunc('second', c.ts), '%Y-%m-%d %H:%M:%S') AS click_ts,
       strftime(date_trunc('second', p.ts), '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       ROUND(p.purchase_value, 6) AS purchase_value
FROM clicks c
ASOF JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks landing inside [signup, signup + 1h] per user, counted per
    signup — a point-in-interval range join executed as interval-bucket
    explode + hash equi-join (each point hits exactly one bucket → every
    true pair once, no θ-join cross product; operators/asof.py)."""
    ev = read_table(spark, sf_dir, "events")
    from sparkglm_spark.operators.asof import range_join_points

    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("s_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e_ts"),
    )
    pairs = range_join_points(
        clicks,
        signups,
        point_ts="cts",
        start_col="s_ts",
        end_col="e_ts",
        on="user_id",
        bucket_seconds=3600,
    )
    return pairs.groupBy("signup_id").agg(F.count(F.lit(1)).alias("n_clicks"))


SQL_EVENTS_RANGE_JOIN = """
WITH clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
s AS (SELECT event_id AS signup_id, user_id, ts
      FROM events WHERE event_type = 'signup')
SELECT s.signup_id, count(*) AS n_clicks
FROM s JOIN clicks c
  ON c.user_id = s.user_id
 AND c.ts BETWEEN s.ts AND s.ts + INTERVAL 1 HOUR
GROUP BY 1
"""


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-invariant hash split (rows-only: assignment hinges on
    Spark's xxhash64; determinism/disjointness proven in tests/test_split.py)."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.split import with_split_column

    return (
        with_split_column(docs, "doc_id", {"train": 0.8, "test": 0.2})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus prep (exact dedup → quality ≥ 0.5 →
    language = en → MinHash near-dup removal). Full-pipeline exact oracle:
    every stage is deterministic and the LSH stage has recall ≈ 1 at the
    threshold (see q_dedup_minhash)."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.pipeline import prepare_training_corpus

    out = prepare_training_corpus(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_tokens_bpe",
        F.round("quality_score", 6).alias("quality_score"),
        "detected_lang",
    )


def _sql_corpus_prep() -> str:
    from sparkglm_spark.operators.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    hits = ",\n         ".join(
        "len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
        f"x -> list_contains({LANG_PROFILES[lg]!r}, x))) AS hits_{lg}"
        for lg in langs
    )
    hit_list = ", ".join(f"hits_{lg}" for lg in langs)
    pick = "CASE " + " ".join(
        f"WHEN hits_{lg} = greatest({hit_list}) THEN '{lg}'" for lg in langs
    ) + " END"
    return rf"""
WITH s1 AS (  -- exact dedup: min id per content
  SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
st AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
         len(list_filter(
             regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+', 0),
             x -> length(trim(x)) > 0)) AS n_tokens_bpe,
         length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
         len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             x -> list_contains(['the','a','an','and','or','is','are','was','to','of','in','on','it','that','this','with','for','as','be'], x))) AS sw_hits,
         {hits}
  FROM s1),
s2 AS (
  SELECT doc_id, text, n_tokens, n_tokens_bpe,
         0.4 * least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
       + 0.3 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / n_chars END)
       + 0.3 * least((CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(sw_hits AS DOUBLE) / n_tokens END) * 5.0, 1.0)
           AS quality_score,
         {pick} AS detected_lang
  FROM st),
s3 AS (
  SELECT * FROM s2 WHERE quality_score >= 0.5 AND detected_lang = 'en'),
sh AS (
  SELECT doc_id, unnest(list_distinct([substring(lower(text), i, 3) FOR i IN range(1, length(text) - 1)])) AS shingle
  FROM s3),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
drops AS (
  SELECT DISTINCT id_b AS doc_id
  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8)
SELECT doc_id, n_tokens, n_tokens_bpe, ROUND(quality_score, 6) AS quality_score, detected_lang
FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM drops)
"""


SQL_CORPUS_PREP = _sql_corpus_prep()


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.multimodal import (
        frame_sample_plan,
        synth_media_from_documents,
    )

    media = synth_media_from_documents(docs, kind="video")
    return frame_sample_plan(media, every_ms=1000)


SQL_FRAME_SAMPLE = """
SELECT doc_id AS media_id,
       unnest(range(0, greatest(CAST(floor((n_chars * 10) / 1000.0) AS BIGINT), 1))) AS frame_idx,
       unnest(range(0, greatest(CAST(floor((n_chars * 10) / 1000.0) AS BIGINT), 1))) * 1000 AS ts_ms
FROM documents
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow mapInPandas feature extraction over binary payloads (decode
    stubbed — deterministic fake; rows-only check)."""
    docs = read_table(spark, sf_dir, "documents")
    from sparkglm_spark.operators.multimodal import (
        extract_features,
        synth_media_from_documents,
    )

    return extract_features(synth_media_from_documents(docs))


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: cross-nation shipping volume by year. The nation
    dim is filtered to the two nations of interest BEFORE the join (625×
    selectivity applied at the broadcast build side); lineitem⋈orders stays
    a shuffle join — at 100 TB neither fact side is broadcastable, and the
    date filter pushes to the lineitem scan."""
    nation = read_table(spark, sf_dir, "nation")
    supp = read_table(spark, sf_dir, "supplier")
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    vol = _dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))
    return (
        li.where(F.col("l_shipdate").between("1996-01-01", "1997-12-31"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(vol).cast("decimal(38,6)").cast("string").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_NATION_TRADE_VOLUME = """
SELECT supp_nation, cust_nation, l_year, CAST(rev AS VARCHAR) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
                  (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6))))
              AS DECIMAL(38,6)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  GROUP BY 1, 2, 3)
ORDER BY supp_nation, cust_nation, l_year
"""


def q_priority_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (absent from the reference; SURVEY §2.4 note):
    per-priority exact distinct customers + order stats. Catalyst plans
    count(distinct) as a two-stage expand/partial-agg — the distinct key
    shuffle is per-group, not global."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("decimal(38,6)").cast("string").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


SQL_PRIORITY_DISTINCT_CUSTOMERS = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_lm_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS — one model per l_returnflag segment, fully distributed:
    one Gram groupBy (O(G·k²) on the wire) + per-group numpy solve inside
    mapInPandas (no driver collect; G unbounded). Oracle: per-group
    closed-form Cramer from exact decimal sums; coefs rounded to 1 decimal,
    r2 to 5 (same margins as lm_fit_simple / lm_fit_stats)."""
    from sparkglm_spark.operators.lm import lm_grouped

    li = read_table(spark, sf_dir, "lineitem")
    out = lm_grouped(li, "l_extendedprice ~ l_quantity", ["l_returnflag"])
    return (
        out.select(
            "l_returnflag",
            "term",
            F.round(F.col("estimate"), 1).alias("coef"),
            "n_rows",
            F.round(F.col("r2"), 5).alias("r2"),
        )
        .orderBy("l_returnflag", "term")
    )


SQL_LM_PER_GROUP = """
WITH s AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n, count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag),
r AS (
  SELECT l_returnflag, n, n_rows, sx, sy, sxx, sxy,
         ROUND(((n*sxy - sx*sy)*(n*sxy - sx*sy))
               / ((n*sxx - sx*sx)*(n*syy - sy*sy)), 5) AS r2
  FROM s)
SELECT l_returnflag, 'intercept' AS term,
       ROUND((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 1) AS coef,
       n_rows, r2
FROM r
UNION ALL
SELECT l_returnflag, 'l_quantity' AS term,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 1) AS coef,
       n_rows, r2
FROM r
ORDER BY l_returnflag, term
"""


def q_lm_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass k-fold CV via Gram additivity (train stats = total − fold):
    the entire CV is a single groupBy(fold) aggregation + driver algebra.
    Oracle: per-fold Cramer closed form over exact decimal fold-sums, with
    training statistics derived by subtraction exactly as the engine does.
    rmse rounded to 2, r2 to 5 (cancellation analysis: divergence ≲1e-9)."""
    from sparkglm_spark.operators.lm import lm_cross_validate

    li = read_table(spark, sf_dir, "lineitem")
    out = lm_cross_validate(
        li,
        "l_extendedprice ~ l_quantity",
        F.pmod(F.col("l_orderkey"), F.lit(4)),
        n_folds=4,
    )
    return out.select(
        "fold",
        "n_train",
        "n_val",
        F.round("rmse_val", 2).alias("rmse_val"),
        F.round("r2_val", 5).alias("r2_val"),
    ).orderBy("fold")


SQL_LM_CV_FOLDS = """
WITH s AS (
  SELECT CAST(l_orderkey % 4 AS INT) AS fold,
         CAST(count(*) AS DOUBLE) AS n, count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY 1),
tot AS (
  SELECT SUM(n) AS n, CAST(SUM(n_rows) AS BIGINT) AS n_rows, SUM(sx) AS sx,
         SUM(sy) AS sy, SUM(sxx) AS sxx, SUM(sxy) AS sxy, SUM(syy) AS syy
  FROM s),
tr AS (
  SELECT s.fold,
         t.n - s.n AS n_t, CAST(t.n_rows - s.n_rows AS BIGINT) AS n_train,
         t.sx - s.sx AS sx_t, t.sy - s.sy AS sy_t,
         t.sxx - s.sxx AS sxx_t, t.sxy - s.sxy AS sxy_t,
         s.n AS n_v, s.n_rows AS n_val, s.sx AS sx_v, s.sy AS sy_v,
         s.sxx AS sxx_v, s.sxy AS sxy_v, s.syy AS syy_v
  FROM s CROSS JOIN tot t),
m AS (
  SELECT *,
         (n_t * sxy_t - sx_t * sy_t) / (n_t * sxx_t - sx_t * sx_t) AS b1
  FROM tr),
m2 AS (
  SELECT *, (sy_t - b1 * sx_t) / n_t AS b0 FROM m),
e AS (
  SELECT fold, n_train, n_val,
         syy_v - 2.0 * (b0 * sy_v + b1 * sxy_v)
               + (b0 * b0 * n_v + 2.0 * b0 * b1 * sx_v + b1 * b1 * sxx_v) AS sse_v,
         syy_v - sy_v * sy_v / n_v AS tss_v,
         n_v
  FROM m2)
SELECT fold, n_train, n_val,
       ROUND(SQRT(sse_v / n_v), 2) AS rmse_val,
       ROUND(1.0 - sse_v / tss_v, 5) AS r2_val
FROM e
ORDER BY fold
"""


def q_events_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch profile (rows-only: HLL/quantile-sketch estimates are
    engine-specific): exact count + approx_count_distinct (HyperLogLog++,
    O(1) state, map-side mergeable) + approx median/p95 (KLL-style). The
    only shapes that profile a 100 TB key column without shuffling it;
    accuracy vs exact is asserted in tests/test_sources.py."""
    from sparkglm_spark.sources.io import approx_table_stats

    ev = read_table(spark, sf_dir, "events")
    stats = approx_table_stats(ev, ["user_id", "event_type"])
    pct = ev.agg(
        F.percentile_approx("value", 0.5).alias("median_value"),
        F.percentile_approx("value", 0.95).alias("p95_value"),
    )
    return stats.crossJoin(pct)


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword search over documents (operators/text.py
    bm25_search): one corpus pass, query-term filter BEFORE the tf shuffle,
    broadcast idf. Score rounded to 6 (pure arithmetic over exact integer
    tf/df/dl counts — both engines within ulps)."""
    from sparkglm_spark.operators.text import bm25_search

    docs = read_table(spark, sf_dir, "documents")
    out = bm25_search(docs, ["spark", "join", "window"], top_k=20)
    return out.select(
        "doc_id", F.round(F.col("score"), 6).alias("score"), "dl"
    ).orderBy(F.col("score").desc(), "doc_id")


SQL_TEXT_BM25 = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), s -> s <> '')) AS term,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), s -> s <> '')) AS dl
  FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         AVG(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), s -> s <> ''))) AS avgdl
  FROM documents),
hits AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM toks WHERE term IN ('spark', 'join', 'window')
  GROUP BY doc_id, term),
idf AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM hits GROUP BY term),
scored AS (
  SELECT doc_id,
         SUM( ln((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
              * (tf * 2.2)
              / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) ) AS score,
         min(dl) AS dl
  FROM hits JOIN idf USING (term) CROSS JOIN stats
  GROUP BY doc_id)
SELECT doc_id, ROUND(score, 6) AS score, dl
FROM scored
ORDER BY score DESC, doc_id
LIMIT 20
"""


def q_lineitem_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA (operators/pca.py): covariance from ONE Gram pass,
    driver 4×4 eigh, deterministic sign convention. Rows-only (no SQL
    eigendecomposition); loadings verified vs numpy in tests/test_pca.py.
    Output: per-component explained variance + loadings, rounded 6."""
    from sparkglm_spark.operators.pca import pca_fit

    li = read_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    m = pca_fit(li, cols, n_components=2)
    rows = []
    for i in range(2):
        rows.append(
            (
                i + 1,
                round(float(m.explained_variance[i]), 4),
                round(float(m.explained_variance_ratio[i]), 6),
                *[round(float(v), 6) for v in m.components[i]],
            )
        )
    schema = "component int, variance double, variance_ratio double, " + ", ".join(
        f"load_{c} double" for c in cols
    )
    return spark.createDataFrame(rows, schema)


def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag(): days between a customer's consecutive orders,
    summarized per priority of the later order. Deterministic window order
    via (o_orderdate, o_orderkey) tie-break; gaps are exact day integers so
    only the final avg needs rounding."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        "o_orderpriority",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap"),
    ).where(F.col("gap").isNotNull())
    return (
        gaps.groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("gap"), 6).alias("avg_gap_days"),
            F.max("gap").cast("long").alias("max_gap_days"),
            F.count(F.lit(1)).alias("n_gaps"),
        )
        .orderBy("o_orderpriority")
    )


SQL_CUSTOMER_ORDER_GAPS = """
WITH g AS (
  SELECT o_orderpriority,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap
  FROM orders)
SELECT o_orderpriority,
       ROUND(AVG(gap), 6) AS avg_gap_days,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days,
       COUNT(*) AS n_gaps
FROM g
WHERE gap IS NOT NULL
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_orders_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% key-hash sample (operators/split.py::hash_sample):
    engine-portable affine hash, so the oracle reproduces the EXACT sample
    — the property TABLESAMPLE/rand() can never give. Output: summary of
    the sampled subset (exact decimal sum)."""
    from sparkglm_spark.operators.split import hash_sample

    orders = read_table(spark, sf_dir, "orders")
    s = hash_sample(orders, "o_orderkey", 0.10)
    return s.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(_dec("o_totalprice")).cast("decimal(38,6)").cast("string").alias("total_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


SQL_ORDERS_HASH_SAMPLE = """
SELECT count(*) AS n_sampled,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS total_price,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders
WHERE ((o_orderkey % 4294967296) * 536870923 + 976369154383)
      % 2305843009213693951 % 1000000 < 100000
"""


def q_lineitem_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of 4 measures from ONE Gram pass
    (operators/stats.py::corr_matrix). Oracle: closed form from exact
    decimal sums; rounded to 6 (cancellation analysis: divergence ≲1e-10)."""
    from sparkglm_spark.operators.stats import corr_matrix

    li = read_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    out = corr_matrix(li, cols)
    return out.select(
        "col_a", "col_b", F.round("corr", 6).alias("corr")
    ).orderBy("col_a", "col_b")


def _corr_sql_pair(a: str, b: str, ia: int, ib: int) -> str:
    return (
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
        f"ROUND((n * m{ia}{ib} - s{ia} * s{ib}) / "
        f"SQRT((n * m{ia}{ia} - s{ia} * s{ia}) * (n * m{ib}{ib} - s{ib} * s{ib})), 6) AS corr "
        "FROM s"
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_SUMS = ", ".join(
    f"CAST(SUM(CAST({c} AS DECIMAL(18,6))) AS DOUBLE) AS s{i + 1}"
    for i, c in enumerate(_CORR_COLS)
)
_CORR_MOMS = ", ".join(
    f"CAST(SUM(CAST({_CORR_COLS[i]} AS DECIMAL(19,6)) * CAST({_CORR_COLS[j]} AS DECIMAL(19,6))) AS DOUBLE) AS m{i + 1}{j + 1}"
    for i in range(4)
    for j in range(i, 4)
)
SQL_LINEITEM_CORR = (
    "WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
    + _CORR_SUMS
    + ", "
    + _CORR_MOMS
    + " FROM lineitem) "
    + " UNION ALL ".join(
        _corr_sql_pair(_CORR_COLS[i], _CORR_COLS[j], i + 1, j + 1)
        for i in range(4)
        for j in range(i + 1, 4)
    )
    + " ORDER BY col_a, col_b"
)


def q_lineitem_standardized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score standardization (operators/stats.py::standardize): one
    2k-scalar agg + codegen projection, rows untouched. Full-row oracle:
    (x − avg)/stddev_samp, rounded to 6."""
    from sparkglm_spark.operators.stats import standardize

    li = read_table(spark, sf_dir, "lineitem")
    out = standardize(li, ["l_quantity", "l_extendedprice"])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity_z", 6).alias("l_quantity_z"),
        F.round("l_extendedprice_z", 6).alias("l_extendedprice_z"),
    ).orderBy("l_orderkey", "l_linenumber")


SQL_LINEITEM_STANDARDIZED = """
WITH s AS (
  SELECT AVG(l_quantity) AS mq, STDDEV_SAMP(l_quantity) AS sq,
         AVG(l_extendedprice) AS mp, STDDEV_SAMP(l_extendedprice) AS sp
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       ROUND((l_quantity - mq) / sq, 6) AS l_quantity_z,
       ROUND((l_extendedprice - mp) / sp, 6) AS l_extendedprice_z
FROM lineitem CROSS JOIN s
ORDER BY l_orderkey, l_linenumber
"""


def q_glm_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped logistic regression — one IRLS fit per order priority via
    applyInPandas (rows-only: iterative fit; per-group numeric oracle vs
    numpy IRLS lives in tests/test_glm.py)."""
    from sparkglm_spark.operators.glm import glm_grouped

    orders = read_table(spark, sf_dir, "orders")
    od = orders.withColumn(
        "is_f", F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    )
    out = glm_grouped(od, "is_f ~ o_totalprice", ["o_orderpriority"])
    return out.select(
        "o_orderpriority",
        "term",
        F.round("estimate", 6).alias("estimate"),
        F.round("deviance", 3).alias("deviance"),
        "iterations",
        "n_rows",
    ).orderBy("o_orderpriority", "term")


def q_totalprice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals: integer bucket arithmetic
    (exact in both engines), one partial+final aggregation — the
    distributed histogram shape (driver sees only bucket counts)."""
    orders = read_table(spark, sf_dir, "orders")
    w = 25_000.0
    bucket = F.least(F.floor(F.col("o_totalprice") / F.lit(w)), F.lit(19)).cast(
        "int"
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("bucket")
    )


SQL_TOTALPRICE_HISTOGRAM = """
SELECT CAST(LEAST(FLOOR(o_totalprice / 25000.0), 19) AS INT) AS bucket,
       COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS min_price,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
GROUP BY 1
ORDER BY bucket
"""


# ===========================================================================
# driver surface
# ===========================================================================


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: formula-driven OLS with
    categorical encoding on lineitem (the reference's sparkLM flagship path,
    LM.R:24-72), returning the coefficient table."""
    from sparkglm_spark.operators.lm import lm

    sf_dir = "/root/testdata/sf0.001"
    li = read_table(spark, sf_dir, "lineitem")
    model = lm(
        li, "l_extendedprice ~ l_quantity + l_discount + l_returnflag + l_linestatus"
    )
    s = model.summary()
    rows = [
        (n, float(c), float(se), float(t), float(p))
        for n, c, se, t, p in zip(
            model.xnames, model.coefs, model.std_err, s.t_vals, s.p_vals
        )
    ]
    return spark.createDataFrame(
        rows, "term string, estimate double, std_error double, t_value double, p_value double"
    )


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "model_matrix_lineitem": q_model_matrix_lineitem,
    "match_cols_customer": q_match_cols_customer,
    "distinct_levels": q_distinct_levels,
    "omit_na_cast": q_omit_na_cast,
    "gram_lineitem": q_gram_lineitem,
    "gram_weighted": q_gram_weighted,
    "column_stats": q_column_stats,
    "lm_fit_simple": q_lm_fit_simple,
    "lm_fit_stats": q_lm_fit_stats,
    "lm_predict_fixed": q_lm_predict_fixed,
    "wls_fit": q_wls_fit,
    "lm_per_group": q_lm_per_group,
    "lm_cv_folds": q_lm_cv_folds,
    "lineitem_corr": q_lineitem_corr,
    "lineitem_standardized": q_lineitem_standardized,
    "glm_kernels": q_glm_kernels,
    "glm_cloglog_kernels": q_glm_cloglog_kernels,
    "glm_deviance": q_glm_deviance,
    "glm_fit_orders": q_glm_fit_orders,
    "glm_gaussian_fit": q_glm_gaussian_fit,
    "glm_poisson_fit": q_glm_poisson_fit,
    "glm_gamma_fit": q_glm_gamma_fit,
    "glm_per_segment": q_glm_per_segment,
    "pricing_summary": q_pricing_summary,
    "top_orders": q_top_orders,
    "region_revenue": q_region_revenue,
    "rollup_revenue": q_rollup_revenue,
    "quantity_percentiles": q_quantity_percentiles,
    "totalprice_histogram": q_totalprice_histogram,
    "customer_running_total": q_customer_running_total,
    "customer_order_gaps": q_customer_order_gaps,
    "big_orders": q_big_orders,
    "late_order_priority": q_late_order_priority,
    "customers_without_orders": q_customers_without_orders,
    "nation_setops": q_nation_region_setops,
    "nation_trade_volume": q_nation_trade_volume,
    "priority_distinct_customers": q_priority_distinct_customers,
    "events_approx_profile": q_events_approx_profile,
    "dedup_exact": q_dedup_exact,
    "duplicate_groups": q_duplicate_groups,
    "dedup_jaccard": q_dedup_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "similarity_topk": q_similarity_topk,
    "similarity_ivf": q_similarity_ivf,
    "similarity_neardup": q_similarity_neardup,
    "similarity_lsh": q_similarity_lsh,
    "text_stats": q_text_stats,
    "text_language_id": q_text_language_id,
    "text_tokens": q_text_tokens,
    "text_quality": q_text_quality,
    "text_fingerprint": q_text_fingerprint,
    "text_bm25": q_text_bm25,
    "lineitem_pca": q_lineitem_pca,
    "events_hourly": q_events_hourly,
    "events_user_totals": q_events_user_totals,
    "events_sessionize": q_events_sessionize,
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
    "events_json_props": q_events_json_props,
    "train_test_split": q_train_test_split,
    "orders_hash_sample": q_orders_hash_sample,
    "corpus_prep": q_corpus_prep,
    "frame_sample": q_frame_sample,
    "multimodal_features": q_multimodal_features,
}

_ORACLES: dict[str, str] = {
    "model_matrix_lineitem": SQL_MODEL_MATRIX_LINEITEM,
    "match_cols_customer": SQL_MATCH_COLS_CUSTOMER,
    "distinct_levels": SQL_DISTINCT_LEVELS,
    "omit_na_cast": SQL_OMIT_NA_CAST,
    "gram_lineitem": SQL_GRAM_LINEITEM,
    "gram_weighted": SQL_GRAM_WEIGHTED,
    "column_stats": SQL_COLUMN_STATS,
    "lm_fit_simple": SQL_LM_FIT_SIMPLE,
    "lm_fit_stats": SQL_LM_FIT_STATS,
    "lm_predict_fixed": SQL_LM_PREDICT_FIXED,
    "wls_fit": SQL_WLS_FIT,
    "lm_per_group": SQL_LM_PER_GROUP,
    "lm_cv_folds": SQL_LM_CV_FOLDS,
    "lineitem_corr": SQL_LINEITEM_CORR,
    "lineitem_standardized": SQL_LINEITEM_STANDARDIZED,
    "glm_kernels": SQL_GLM_KERNELS,
    "glm_cloglog_kernels": SQL_GLM_CLOGLOG_KERNELS,
    "glm_deviance": SQL_GLM_DEVIANCE,
    "glm_gaussian_fit": SQL_GLM_GAUSSIAN_FIT,
    # glm_fit_orders, glm_poisson_fit: iterative IRLS — rows-only
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_orders": SQL_TOP_ORDERS,
    "region_revenue": SQL_REGION_REVENUE,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "quantity_percentiles": SQL_QUANTITY_PERCENTILES,
    "totalprice_histogram": SQL_TOTALPRICE_HISTOGRAM,
    "customer_running_total": SQL_CUSTOMER_RUNNING_TOTAL,
    "customer_order_gaps": SQL_CUSTOMER_ORDER_GAPS,
    "big_orders": SQL_BIG_ORDERS,
    "late_order_priority": SQL_LATE_ORDER_PRIORITY,
    "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
    "nation_setops": SQL_NATION_REGION_SETOPS,
    "nation_trade_volume": SQL_NATION_TRADE_VOLUME,
    "priority_distinct_customers": SQL_PRIORITY_DISTINCT_CUSTOMERS,
    # events_approx_profile: sketch estimates are engine-specific — rows-only
    #   (accuracy vs exact asserted in tests/test_sources.py)
    "dedup_exact": SQL_DEDUP_EXACT,
    "duplicate_groups": SQL_DUPLICATE_GROUPS,
    "dedup_jaccard": SQL_DEDUP_JACCARD,
    # dedup_simhash: xxhash64-based signature — rows-only
    # similarity_lsh: approximate recall by design — rows-only
    "dedup_minhash": SQL_DEDUP_MINHASH,
    "similarity_topk": SQL_SIMILARITY_TOPK,
    "similarity_ivf": SQL_SIMILARITY_TOPK,
    "similarity_neardup": SQL_SIMILARITY_NEARDUP,
    "text_stats": SQL_TEXT_STATS,
    "text_language_id": SQL_TEXT_LANGUAGE_ID,
    "text_tokens": SQL_TEXT_TOKENS,
    "text_quality": SQL_TEXT_QUALITY,
    "text_fingerprint": SQL_TEXT_FINGERPRINT,
    "text_bm25": SQL_TEXT_BM25,
    # lineitem_pca: eigendecomposition — no SQL oracle; numpy oracle in
    #   tests/test_pca.py (rows-only here)
    "events_hourly": SQL_EVENTS_HOURLY,
    "events_user_totals": SQL_EVENTS_USER_TOTALS,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_asof_join": SQL_EVENTS_ASOF_JOIN,
    "events_range_join": SQL_EVENTS_RANGE_JOIN,
    "events_json_props": SQL_EVENTS_JSON_PROPS,
    "orders_hash_sample": SQL_ORDERS_HASH_SAMPLE,
    "corpus_prep": SQL_CORPUS_PREP,
    "frame_sample": SQL_FRAME_SAMPLE,
    # multimodal_features: pandas-UDF extraction — rows-only
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
