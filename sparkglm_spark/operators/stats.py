"""Column statistics operators: correlation matrix and standardization.

Both reduce to the engine's one-pass Gram aggregation (plans/gram.py): the
correlation of every column pair falls out of the same O(k²) sufficient
statistics the model fitters use, and standardization is a two-scalar-per-
column agg followed by a pure codegen projection. Nothing here shuffles
rows or collects row data — at 100 TB each is one aggregation job.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkglm_spark.plans.gram import gram_aggregate


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation for every pair of `cols` from ONE Gram pass:
    r_ij = (n·s_ij − s_i·s_j) / √((n·s_ii − s_i²)(n·s_jj − s_j²)).
    Column sums ride in the Gram matrix as a ones-column row (same trick as
    PCA). Returns long format (col_a, col_b, corr), upper triangle i < j.
    """
    one = "__one"
    data = df.select(*[F.col(c).cast("double").alias(c) for c in cols]).withColumn(
        one, F.lit(1.0)
    )
    g = gram_aggregate(data, [one, *cols])
    n = float(g.n)
    s = g.xtx[0, 1:]          # column sums
    m = g.xtx[1:, 1:]         # raw second moments
    rows = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            num = n * m[i, j] - s[i] * s[j]
            den = np.sqrt((n * m[i, i] - s[i] ** 2) * (n * m[j, j] - s[j] ** 2))
            rows.append(
                (cols[i], cols[j], float(num / den) if den > 0 else None)
            )
    return df.sparkSession.createDataFrame(
        rows, "col_a string, col_b string, corr double"
    )


def distinct_count_salted(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_salts: int = 64,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key group without a per-key
    distinct hotspot. A plain distinct-count shuffles every (key, value)
    row to ONE reducer per key — a single hot key (the power-law norm in
    events/token data) serializes the whole stage. Salting by
    hash(value) % n_salts splits each key across n_salts reducers; since
    a given distinct value always lands in exactly one salt bucket, the
    per-bucket distinct counts SUM to the exact global count (unlike
    salting a mean/percentile, which would need a merge step).

    Two shuffles: (keys, salt) distinct-count, then an O(keys × n_salts)
    rollup — the second stage's input is tiny regardless of row count.
    At 1000 executors, set n_salts ≳ cores so one hot key saturates the
    cluster instead of one core."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    return (
        df.groupBy(*keys, salt.alias("__salt"))
        .agg(F.count_distinct(F.col(value_col)).alias("__partial"))
        .groupBy(*keys)
        .agg(F.sum("__partial").alias(alias))
    )


def standardize_exprs(
    stats: dict[str, tuple[float, float]], suffix: str = "_z"
) -> list[Column]:
    return [
        ((F.col(c) - F.lit(mu)) / F.lit(sd)).alias(f"{c}{suffix}")
        for c, (mu, sd) in stats.items()
    ]


def standardize(
    df: DataFrame, cols: list[str], suffix: str = "_z", ddof: int = 1
) -> DataFrame:
    """Append z-scored versions of `cols` ((x − mean)/stddev): one tiny agg
    for the 2k scalars, then a codegen projection — rows untouched, zero
    shuffles (the feature-scaling step in front of any distance-based
    operator: similarity search, k-means, PCA on heterogeneous units)."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"m_{c}"))
        aggs.append(
            (F.stddev_samp(c) if ddof == 1 else F.stddev_pop(c)).alias(f"s_{c}")
        )
    row = df.agg(*aggs).collect()[0]
    stats = {c: (float(row[f"m_{c}"]), float(row[f"s_{c}"])) for c in cols}
    for c, (_, sd) in stats.items():
        if not sd > 0:
            raise ValueError(f"column {c!r} has zero variance; cannot standardize")
    return df.select("*", *standardize_exprs(stats, suffix))
