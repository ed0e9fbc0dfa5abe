"""PCA: distributed covariance/eigh vs numpy; BM25 search vs a direct
pandas implementation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators.pca import pca_fit, pca_project

COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_pca_matches_numpy(spark, lineitem):
    m = pca_fit(lineitem, COLS, n_components=4)
    X = lineitem.select(*COLS).toPandas().to_numpy(dtype=np.float64)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    np.testing.assert_allclose(
        m.explained_variance, evals[order], rtol=1e-8
    )
    for i, col_idx in enumerate(order):
        v = evecs[:, col_idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        np.testing.assert_allclose(m.components[i], v, rtol=1e-6, atol=1e-9)
    assert m.explained_variance_ratio.sum() == pytest.approx(1.0, rel=1e-9)


def test_pca_projection_variance_equals_eigenvalues(spark, lineitem):
    """Var(pc_i) over the projected data = i-th eigenvalue, and PCs are
    uncorrelated."""
    proj = pca_project(lineitem, COLS, n_components=2)
    m = pca_fit(lineitem, COLS, n_components=2)
    p = proj.select("pc_1", "pc_2").toPandas().to_numpy()
    c = np.cov(p, rowvar=False, ddof=1)
    np.testing.assert_allclose(np.diag(c), m.explained_variance, rtol=1e-8)
    assert abs(c[0, 1]) < 1e-6 * np.sqrt(c[0, 0] * c[1, 1])
    # projection keeps input rows/columns
    assert proj.count() == lineitem.count()
    assert set(lineitem.columns) < set(proj.columns)


def test_pca_partition_invariance(spark, lineitem):
    a = pca_fit(lineitem.repartition(1), COLS, n_components=2)
    b = pca_fit(lineitem.repartition(16), COLS, n_components=2)
    np.testing.assert_allclose(a.components, b.components, rtol=1e-9)
    np.testing.assert_allclose(
        a.explained_variance, b.explained_variance, rtol=1e-9
    )


def test_bm25_matches_pandas(spark, sf_dir):
    """bm25_search vs a direct pandas/numpy BM25 over the same corpus."""
    import os
    import re

    from sparkglm_spark.operators.text import bm25_search

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    terms = ["spark", "join", "window"]
    got = bm25_search(docs, terms, top_k=10).toPandas()

    pdf = docs.select("doc_id", "text").toPandas()
    tok = {
        r.doc_id: [t for t in re.split("[^a-z0-9]+", r.text.lower()) if t]
        for r in pdf.itertuples()
    }
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    dfreq = {t: sum(1 for v in tok.values() if t in v) for t in terms}
    k1, b = 1.2, 0.75
    scores = {}
    for d, v in tok.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = np.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got.doc_id) == [d for d, _ in want]
    np.testing.assert_allclose(
        got.score.to_numpy(), [s for _, s in want], rtol=1e-9
    )
