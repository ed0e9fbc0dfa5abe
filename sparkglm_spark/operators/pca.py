"""Distributed PCA over named numeric columns.

Same scale shape as LM fitting (plans/gram.py): ONE declarative aggregation
reduces the data to O(k²) sufficient statistics (here the raw second-moment
matrix plus column sums via an appended ones-column), the k×k covariance
eigendecomposition runs on the driver (k = #features, small), and the
projection is a pure codegen linear combination appended to the input rows —
no shuffle anywhere, no row ever collected.

The reference has no PCA; this extends its linear-algebra surface the same
way its LM does OLS (Gram → driver solve → expression scoring),
LM.scala:142-155,191-214.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkglm_spark.plans.gram import gram_aggregate


@dataclass
class PCAModel:
    cols: list[str]
    means: np.ndarray              # k
    components: np.ndarray         # n_components × k (rows = PCs)
    explained_variance: np.ndarray # eigenvalues, descending
    explained_variance_ratio: np.ndarray

    def projection_exprs(self, prefix: str = "pc_") -> list[Column]:
        """pcᵢ = Σⱼ vᵢⱼ·(xⱼ − μⱼ) as codegen expressions."""
        out = []
        for i, vec in enumerate(self.components):
            expr = F.lit(0.0)
            for j, c in enumerate(self.cols):
                expr = expr + F.lit(float(vec[j])) * (
                    F.col(c) - F.lit(float(self.means[j]))
                )
            out.append(expr.alias(f"{prefix}{i + 1}"))
        return out

    def transform(self, df: DataFrame, prefix: str = "pc_") -> DataFrame:
        return df.select("*", *self.projection_exprs(prefix))


def pca_fit(df: DataFrame, cols: list[str], n_components: int = 2) -> PCAModel:
    """Fit PCA on `cols` via a single Gram pass.

    Covariance from raw moments: C = (X'X − n·x̄x̄')/(n−1), where the column
    sums ride in the Gram matrix as the ones-column row — one aggregation
    total. Driver does a k×k `eigh`. Sign convention: each component's
    largest-|loading| entry is made positive (deterministic across BLAS
    implementations)."""
    one = "__pca_one"
    data = df.select(*[F.col(c).cast("double").alias(c) for c in cols]).withColumn(
        one, F.lit(1.0)
    )
    g = gram_aggregate(data, [one, *cols])
    n = float(g.n)
    sums = g.xtx[0, 1:]            # ones-row = column sums
    raw = g.xtx[1:, 1:]            # X'X
    means = sums / n
    cov = (raw - n * np.outer(means, means)) / (n - 1.0)
    return pca_from_covariance(cols, means, cov, n_components)


def pca_from_covariance(
    cols: list[str], means, cov, n_components: int = 2
) -> PCAModel:
    """Eigen-solve a precomputed k×k covariance into a PCAModel.

    Split out of `pca_fit` so callers that derive the covariance from
    exact-decimal sufficient statistics (driver oracle queries) share the
    identical eigh + deterministic-sign path."""
    means = np.asarray(means, dtype=float)
    cov = np.asarray(cov, dtype=float)
    evals, evecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T                # n_components × k
    evals = evals[order]
    for i in range(comps.shape[0]):          # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.trace(cov))
    return PCAModel(
        cols=list(cols),
        means=means,
        components=comps,
        explained_variance=evals,
        explained_variance_ratio=evals / total_var,
    )


def pca_project(
    df: DataFrame, cols: list[str], n_components: int = 2, prefix: str = "pc_"
) -> DataFrame:
    """Fit + append pc_1..pc_m columns (rows untouched, zero shuffles)."""
    return pca_fit(df, cols, n_components).transform(df, prefix)
