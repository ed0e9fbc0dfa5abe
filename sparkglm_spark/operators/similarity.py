"""Similarity search over embedding columns (array<float>).

Two execution strategies, one semantic:
- brute-force top-k — broadcast the query side, JVM-side dot products via
  F.aggregate/zip_with, per-query top-k via window. Exact; the baseline and
  the verifier for the approximate path.
- LSH-bucketed (random hyperplane signatures) — signature via one
  Arrow-batched pandas UDF (matrix multiply per batch), band-bucket join for
  candidates, exact re-rank of candidates only. The 100 TB path: candidate
  generation is a hash-partitioned equi-join instead of a cross product.

(Reference repo has no similarity ops; these are north-star extensions —
BASELINE.json. Public grounding: random-hyperplane LSH, Charikar 2002.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — JVM-side left-to-right fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Σ aᵢ·bᵢ unrolled over a known dimension: stays in whole-stage codegen
    (the zip_with/aggregate fold is interpreted per element). Left-associated
    like the fold → bit-identical result."""
    out = a[0].cast("double") * b[0].cast("double")
    for i in range(1, dim):
        out = out + a[i].cast("double") * b[i].cast("double")
    return out


def norm_unrolled(a: Column, dim: int) -> Column:
    out = a[0].cast("double") * a[0].cast("double")
    for i in range(1, dim):
        out = out + a[i].cast("double") * a[i].cast("double")
    return F.sqrt(out)


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Probe the (fixed) embedding dimension — one 1-row job."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"])


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).
    Plan: broadcast(queries) nested-loop join — scans the corpus ONCE
    regardless of query count; per-query top-k via window over the hash-
    partitioned query key. Ties broken by corpus id (deterministic)."""
    dim = _vec_dim(corpus, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast(ArrayType(DoubleType())).alias("qv"),
    ).withColumn("qn", norm_unrolled(F.col("qv"), dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast(ArrayType(DoubleType())).alias("cv"),
    ).withColumn("cn", norm_unrolled(F.col("cv"), dim))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_unrolled(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold — embedding-based near-dup
    detection. Self-join; at scale use `lsh_near_dup_pairs`."""
    dim = _vec_dim(df, vec_col)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast(ArrayType(DoubleType())).alias("va"),
    ).withColumn("na", norm_unrolled(F.col("va"), dim))
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast(ArrayType(DoubleType())).alias("vb"),
    ).withColumn("nb", norm_unrolled(F.col("vb"), dim))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot_unrolled(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate top-k
# ---------------------------------------------------------------------------


def _train_centroids_sample(
    df: DataFrame, vec_col: str, n_lists: int, seed: int, sample_cap: int = 20000
) -> np.ndarray:
    """K-means centroids (unit-normalized, for cosine) trained on a
    driver-collected sample — centroids are O(n_lists·d) model state, like
    coefficients; the full corpus is never collected. Deterministic:
    seeded init, fixed iteration count, ties to lowest index."""
    frac_rows = df.select(vec_col).limit(sample_cap).collect()
    M = np.array([r[0] for r in frac_rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = M[rng.choice(len(M), size=min(n_lists, len(M)), replace=False)]
    for _ in range(10):
        assign = np.argmax(M @ C.T, axis=1)
        for j in range(len(C)):
            members = M[assign == j]
            if len(members):
                c = members.mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via an inverted file: corpus rows are
    assigned to their nearest centroid list (one Arrow-batched matmul
    projection); each query probes its `n_probe` nearest lists; exact
    cosine re-ranks within the probed lists.

    The cross product of `cosine_topk` becomes a hash-partitioned equi-join
    on `list_id` — candidate count ≈ corpus × n_probe/n_lists. Recall < 1
    by design (tested ≥ 0.9 at 4/16 on the driver corpus); precision is 1
    (exact re-rank)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    dim = _vec_dim(corpus, vec_col)
    C = _train_centroids_sample(corpus, vec_col, n_lists, seed)

    def _assign_fn(vecs):
        M = np.vstack(vecs.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    _assign = pandas_udf(_assign_fn, returnType=IntegerType())

    n_probe = min(n_probe, len(C))

    def _probes_fn(vecs):
        M = np.vstack(vecs.to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(M @ C.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    _probes = pandas_udf(_probes_fn, returnType=ArrayType(IntegerType()))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast(ArrayType(DoubleType())).alias("cv"),
        _assign(F.col(vec_col)).alias("list_id"),
    ).withColumn("cn", norm_unrolled(F.col("cv"), dim))
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast(ArrayType(DoubleType())).alias("qv"),
            _probes(F.col(vec_col)).alias("probe_lists"),
        )
        .withColumn("qn", norm_unrolled(F.col("qv"), dim))
        .withColumn("list_id", F.explode("probe_lists"))
        .drop("probe_lists")
    )
    scored = (
        c.join(q, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_unrolled(F.col("qv"), F.col("cv"), dim) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (approximate path)
# ---------------------------------------------------------------------------


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 64,
    seed: int = 42,
) -> DataFrame:
    """sign(R·v) packed into n_bits/16 16-bit bucket chunks. One pandas UDF
    (Arrow batch → numpy matmul) — the only Python in the pipeline, O(n·d·b)
    flops done by BLAS."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType as AT, LongType

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bits))
    n_chunks = n_bits // 16
    weights = (1 << np.arange(16, dtype=np.int64))

    def _sig_fn(vecs):
        M = np.vstack(vecs.to_numpy())  # batch × dim
        bits = (M @ planes) > 0  # batch × n_bits
        chunks = [
            (bits[:, c * 16 : (c + 1) * 16] @ weights).astype(np.int64)
            for c in range(n_chunks)
        ]
        return pd.Series(list(np.stack(chunks, axis=1)))

    _sig = pandas_udf(_sig_fn, returnType=AT(LongType()))

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        _sig(F.col(vec_col)).alias("chunks"),
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine near-dup: candidates share ≥1 signature chunk
    (16 random hyperplanes agreeing → cos likely high); exact cosine
    re-rank keeps only true pairs ≥ threshold. Recall for θ=0.95
    (angle ≈ 18°): P(chunk match) = (1−18/180)^16 ≈ 0.19 per chunk,
    ≥1-of-4 ≈ 0.57 — raise n_bits/chunks for higher recall; exact re-rank
    keeps precision at 1.0."""
    sig = hyperplane_signatures(df, dim, id_col, vec_col, n_bits, seed)
    sig = sig.persist()
    sig.count()  # materialize: the chunk self-join reads sig twice (pandas UDF)
    n_chunks = n_bits // 16
    exploded = sig.select(
        "id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_id"),
                        F.col("chunks")[c].alias("chunk"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "vec", "cc.chunk_id", "cc.chunk")
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            cosine_expr(
                F.col("va").cast(ArrayType(DoubleType())),
                F.col("vb").cast(ArrayType(DoubleType())),
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
