"""Similarity search vs numpy brute-force oracle on the embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb_np(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], M[order]


def np_cosine_matrix(M):
    norms = np.linalg.norm(M, axis=1)
    return (M @ M.T) / np.outer(norms, norms)


def test_cosine_topk_matches_numpy(embeddings, emb_np):
    ids, M = emb_np
    k = 5
    queries = embeddings.limit(20)
    got = S.cosine_topk(embeddings, queries, k=k).collect()
    C = np_cosine_matrix(M)
    id_to_idx = {int(v): i for i, v in enumerate(ids)}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == k
        qi = id_to_idx[qid]
        sims = C[qi].copy()
        sims[qi] = -np.inf  # exclude self
        # oracle top-k with (cos desc, id asc) tie-break
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:k]
        expect_ids = [int(ids[j]) for j in order]
        got_ids = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert got_ids == expect_ids
        for r in rows:
            assert r["cosine"] == pytest.approx(C[qi, id_to_idx[r["neighbor_id"]]], rel=1e-9)


def test_cosine_near_dup_pairs(embeddings, emb_np):
    ids, M = emb_np
    C = np_cosine_matrix(M)
    thr = 0.9
    expect = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if C[i, j] >= thr:
                expect.add((int(ids[i]), int(ids[j])))
    got = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_near_dup_pairs(embeddings, threshold=thr).collect()
    }
    assert got == expect


def test_lsh_near_dup_subset_of_exact_with_recall(embeddings, emb_np):
    """LSH output ⊆ exact pairs (precision 1.0 by construction via re-rank);
    recall measured and bounded below."""
    ids, M = emb_np
    C = np_cosine_matrix(M)
    thr = 0.9
    exact = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if C[i, j] >= thr
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in S.lsh_near_dup_pairs(
            embeddings, dim=M.shape[1], threshold=thr, n_bits=256
        ).collect()
    }
    assert got <= exact
    if exact:
        recall = len(got) / len(exact)
        assert recall >= 0.5, f"recall {recall}"


def test_dot_norm_exprs(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        S.dot_expr(F.col("a"), F.col("b")).alias("d"),
        S.norm_expr(F.col("a")).alias("na"),
        S.cosine_expr(F.col("a"), F.col("b")).alias("c"),
    ).collect()[0]
    assert r["d"] == pytest.approx(32.0)
    assert r["na"] == pytest.approx(np.sqrt(14.0))
    assert r["c"] == pytest.approx(32.0 / (np.sqrt(14) * np.sqrt(77)), rel=1e-12)


def test_ivf_full_probe_equals_brute_force(spark, embeddings):
    """Probing every list is exhaustive search: IVF must reproduce the
    brute-force top-k exactly (same pairs, same cosines)."""
    from sparkglm_spark.operators.similarity import cosine_topk, ivf_topk

    queries = embeddings.limit(40)
    exact = cosine_topk(embeddings, queries, k=5)
    full = ivf_topk(embeddings, queries, k=5, n_lists=8, n_probe=8)
    e = sorted((r["query_id"], r["neighbor_id"], round(r["cosine"], 9)) for r in exact.collect())
    f = sorted((r["query_id"], r["neighbor_id"], round(r["cosine"], 9)) for r in full.collect())
    assert e == f and len(e) > 0


def test_ivf_partial_probe_recall_floor(spark, embeddings):
    """4/16 probes on the (weakly clustered) driver corpus: recall well
    above the n_probe/n_lists=0.25 baseline, precision 1 by construction."""
    from sparkglm_spark.operators.similarity import cosine_topk, ivf_topk

    queries = embeddings.limit(40)
    exact = cosine_topk(embeddings, queries, k=5)
    approx = ivf_topk(embeddings, queries, k=5, n_lists=16, n_probe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall:.3f}"


def test_ivf_topk_deterministic(spark, embeddings):
    from sparkglm_spark.operators.similarity import ivf_topk

    q = embeddings.limit(10)
    a = sorted(map(tuple, ivf_topk(embeddings, q, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(embeddings, q, k=3).collect()))
    assert a == b


def test_cosine_near_dup_size_gate(spark, embeddings):
    """The exact all-pairs path must refuse to driver-collect an unbounded
    corpus (VERDICT r01: scale-killer) and point at the LSH path."""
    import pytest

    from sparkglm_spark.operators.similarity import cosine_near_dup_pairs

    with pytest.raises(ValueError, match="lsh_near_dup_pairs"):
        cosine_near_dup_pairs(embeddings, threshold=0.35, max_collect_rows=10)


def test_near_dup_router_exact_route_matches_direct(spark, embeddings):
    """Within the gate the router must produce exactly the direct exact
    plan's pairs."""
    from sparkglm_spark.operators.similarity import (
        cosine_near_dup_pairs,
        near_dup_pairs,
    )

    direct = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 9))
        for r in cosine_near_dup_pairs(embeddings, threshold=0.35).collect()
    )
    routed = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 9))
        for r in near_dup_pairs(embeddings, threshold=0.35).collect()
    )
    assert routed == direct


def test_near_dup_router_degrades_to_lsh_past_gate(spark, embeddings):
    """Past the gate the router must RUN (no raise) via the LSH plan:
    subset of exact pairs, precision 1, and recall 1 on exact duplicates
    (identical vectors share every signature chunk)."""
    from pyspark.sql import functions as F

    from sparkglm_spark.operators.similarity import (
        cosine_near_dup_pairs,
        near_dup_pairs,
    )

    # corpus with guaranteed exact duplicates: each vector duplicated under
    # vec_id + 10_000
    base = embeddings.select("vec_id", "embedding")
    dup = base.select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    corpus = base.unionByName(dup)
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(corpus, threshold=0.999).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(
            corpus, threshold=0.999, exact_max_rows=10, n_bits=256
        ).collect()
    }
    assert got <= exact  # precision 1 (every emitted pair is truly >= thr)
    dup_pairs = {p for p in exact if p[1] - p[0] == 10_000}
    assert dup_pairs <= got  # recall 1 on exact duplicates


def test_near_dup_router_warns_when_degrading(spark, embeddings, caplog):
    """Routing to the approximate LSH plan must be loud (WARNING with the
    recall math), mirroring jaccard_pairs' cap warning."""
    import logging

    from sparkglm_spark.operators.similarity import near_dup_pairs

    with caplog.at_level(
        logging.WARNING, logger="sparkglm_spark.operators.similarity"
    ):
        near_dup_pairs(
            embeddings.select("vec_id", "embedding"),
            threshold=0.95,
            exact_max_rows=10,
        ).count()
    assert any("degrading to hyperplane-LSH" in r.message for r in caplog.records)


def test_quantize_int8_reconstruction_and_edges(spark):
    import numpy as np

    from sparkglm_spark.operators.similarity import quantize_int8

    rows = [
        (0, [1.0, -0.5, 0.25, 127.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),          # zero vector -> scale 0, q all 0
        (2, [-3.5, 2.0, 0.001, -0.0009]),
    ]
    edge = [(3, []), (4, None), (5, [1.0, float("nan")])]
    df = spark.createDataFrame(rows + edge, "vec_id long, embedding array<double>")
    out = quantize_int8(df).collect()
    got = {r.vec_id: (r.scale, r.q) for r in out}
    # empty/null vectors are dropped; a NaN element yields q NULL (corrupt
    # data stays visible), and q is BYTES (tinyint) - real 4x compression
    assert set(got) == {0, 1, 2, 5}
    assert got[5][1] is None
    assert dict(quantize_int8(df).dtypes)["q"] == "array<tinyint>"
    for vid, vec in rows:
        x = np.array(vec)
        scale, q = got[vid]
        if np.abs(x).max() == 0:
            assert scale == 0.0 and q == [0, 0, 0, 0]
            continue
        assert scale == pytest.approx(np.abs(x).max() / 127.0, rel=0)
        assert max(abs(v) for v in q) <= 127
        # reconstruction error bounded by scale/2 per element
        recon = np.array(q, dtype=float) * scale
        assert np.abs(recon - x).max() <= scale / 2 + 1e-15


def test_quantize_int8_partition_invariant_and_no_shuffle(spark):
    from sparkglm_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, [float(i) * 0.1, float(-i), 1.5]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    a = sorted(map(str, quantize_int8(df.coalesce(1)).collect()))
    b = sorted(map(str, quantize_int8(df.repartition(8)).collect()))
    assert a == b
    plan = quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection


def test_topk_query_side_collect_is_size_gated(spark, embeddings):
    """cosine_topk / ivf_topk driver-collect the QUERY side; an oversized
    queries frame must raise (naming the scale alternatives) instead of
    OOMing the driver — the same contract as cosine_near_dup_pairs."""
    import pytest

    from sparkglm_spark.operators.similarity import cosine_topk, ivf_topk

    q = embeddings.limit(20)
    with pytest.raises(ValueError, match="near_dup_pairs"):
        cosine_topk(embeddings, q, k=3, max_collect_rows=10)
    with pytest.raises(ValueError, match="near_dup_pairs"):
        ivf_topk(embeddings, q, k=3, max_collect_rows=10)


def test_ivf_reuses_prebuilt_centroids(spark, embeddings):
    """train-once/serve-many: ivf_topk with a prebuilt centroid matrix
    returns exactly the per-call-trained result (same seed), and a
    different index changes routing without touching correctness of the
    exact re-scoring."""
    from sparkglm_spark.operators.similarity import ivf_topk, train_ivf_centroids

    q = embeddings.limit(10)
    C = train_ivf_centroids(embeddings, n_lists=8, seed=7)
    a = sorted(
        map(tuple, ivf_topk(embeddings, q, k=5, n_lists=8, seed=7).collect())
    )
    b = sorted(
        map(
            tuple,
            ivf_topk(embeddings, q, k=5, n_lists=8, seed=7, centroids=C).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_cosine_topk_quantized_recall(spark, embeddings):
    """Search over the int8 table: per-vector scaling cancels in cosine, so
    the quantized ranking should match the float baseline almost everywhere
    (recall@5 ≥ 0.95 on the testdata corpus) and score deltas stay within
    quantization error."""
    from sparkglm_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_quantized,
        quantize_int8,
    )

    q = embeddings.limit(25)
    base = cosine_topk(embeddings, q, k=5).collect()
    corpus_q = quantize_int8(embeddings)
    quant = cosine_topk_quantized(corpus_q, q, k=5).collect()

    def by_query(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    b, g = by_query(base), by_query(quant)
    hits = total = 0
    for qid, neigh in b.items():
        total += len(neigh)
        hits += len(neigh & g.get(qid, set()))
    assert total > 0 and hits / total >= 0.95
    scores_b = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in base}
    for r in quant:
        kk = (r["query_id"], r["neighbor_id"])
        if kk in scores_b:
            assert abs(r["cosine"] - scores_b[kk]) < 0.02


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def _np_semdedup(ids, M, C, thr):
    """Reference: assign by max-cosine (ties → lowest centroid index),
    then all within-cluster pairs ≥ thr on unit vectors."""
    U = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(U @ Cn.T, axis=1)
    pairs = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if assign[i] == assign[j]:
                c = float(U[i] @ U[j])
                if c >= thr:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    pairs[(a, b)] = (int(assign[i]), c)
    return assign, pairs


def test_semantic_dedup_pairs_matches_numpy(embeddings, emb_np):
    ids, M = emb_np
    rng = np.random.default_rng(7)
    C = rng.normal(size=(6, M.shape[1]))
    thr = 0.35
    _, expect = _np_semdedup(ids, M, C, thr)
    got = S.semantic_dedup_pairs(embeddings, centroids=C, threshold=thr).collect()
    got_pairs = {(r["id_a"], r["id_b"]): (r["cluster"], r["cosine"]) for r in got}
    assert set(got_pairs) == set(expect)
    for k, (cl, cos) in got_pairs.items():
        assert cl == expect[k][0]
        assert cos == pytest.approx(expect[k][1], rel=1e-9)


def test_semantic_dedup_keeps_min_id_survivors(embeddings, emb_np):
    ids, M = emb_np
    rng = np.random.default_rng(7)
    C = rng.normal(size=(6, M.shape[1]))
    thr = 0.35
    _, pairs = _np_semdedup(ids, M, C, thr)
    dropped = {b for (_, b) in pairs}
    expect_keep = set(int(i) for i in ids) - dropped
    got = {
        r["vec_id"]
        for r in S.semantic_dedup(embeddings, centroids=C, threshold=thr).collect()
    }
    assert got == expect_keep
    assert 0 < len(got) < len(ids)  # the threshold actually splits the corpus


def test_semantic_dedup_pairs_partition_invariant(embeddings):
    rng = np.random.default_rng(7)
    C = rng.normal(size=(6, 64))
    a = S.semantic_dedup_pairs(
        embeddings.repartition(1), centroids=C, threshold=0.35
    ).collect()
    b = S.semantic_dedup_pairs(
        embeddings.repartition(7), centroids=C, threshold=0.35
    ).collect()
    key = lambda r: (r["cluster"], r["id_a"], r["id_b"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_semantic_dedup_trained_centroids_path(embeddings):
    # no centroids given → deterministic seeded sample k-means; the call
    # must produce a stable pair set across invocations
    a = S.semantic_dedup_pairs(embeddings, threshold=0.35, n_clusters=4, seed=1)
    b = S.semantic_dedup_pairs(embeddings, threshold=0.35, n_clusters=4, seed=1)
    ka = sorted((r["id_a"], r["id_b"]) for r in a.collect())
    kb = sorted((r["id_a"], r["id_b"]) for r in b.collect())
    assert ka == kb and len(ka) > 0


def test_semantic_dedup_cluster_cap_raises(embeddings):
    import pyspark.errors

    C = np.zeros((1, 64))
    C[0, 0] = 1.0  # one centroid → every row in one cluster
    with pytest.raises(pyspark.errors.PySparkException, match="max_cluster_rows"):
        S.semantic_dedup_pairs(
            embeddings, centroids=C, threshold=0.9, max_cluster_rows=10
        ).collect()


def test_semantic_dedup_blocked_gram_equals_unblocked(embeddings):
    # tiny block size forces the tiled path across many blocks; results
    # must be identical to one big gram
    rng = np.random.default_rng(3)
    C = rng.normal(size=(4, 64))
    big = S.semantic_dedup_pairs(embeddings, centroids=C, threshold=0.35)
    tiled = S.semantic_dedup_pairs(
        embeddings, centroids=C, threshold=0.35, block=17
    )
    key = lambda r: (r["cluster"], r["id_a"], r["id_b"], round(r["cosine"], 12))
    assert sorted(map(key, big.collect())) == sorted(map(key, tiled.collect()))

def test_ann_recall(spark, embeddings):
    from sparkglm_spark.operators.similarity import ann_recall, cosine_topk, ivf_topk

    queries = embeddings.limit(20)
    exact = cosine_topk(embeddings, queries, k=10)
    # identical lists -> recall 1 everywhere
    perfect = ann_recall(exact, exact)
    assert perfect["macro_recall"] == 1.0 and perfect["micro_recall"] == 1.0
    assert perfect["n_queries"] == 20
    # a real approximate index: recall in (0, 1], macro consistent with twin
    approx = ivf_topk(embeddings, queries, k=10, n_lists=8, n_probe=2)
    out = ann_recall(exact, approx, k=10)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    hits = len(ex & ap)
    assert out["n_hits"] == hits and out["n_exact_pairs"] == len(ex)
    assert out["micro_recall"] == pytest.approx(hits / len(ex), rel=1e-12)
    qs = {}
    for q, n in ex:
        qs.setdefault(q, [0, 0])[0] += 1
    for q, n in ex & ap:
        qs[q][1] += 1
    macro = sum(h / e for e, h in qs.values()) / len(qs)
    assert out["macro_recall"] == pytest.approx(macro, rel=1e-12)
    assert 0.0 < out["macro_recall"] <= 1.0
    # a query entirely missing from approx counts as zero
    one_q = exact.select("query_id").distinct().limit(1)
    dropped = approx.join(one_q, "query_id", "left_anti")
    worse = ann_recall(exact, dropped)
    assert worse["macro_recall"] < out["macro_recall"] or out["macro_recall"] == 0
    with pytest.raises(ValueError, match="k must"):
        ann_recall(exact, approx, k=0)

def test_ann_recall_duplicate_pairs_do_not_inflate(spark):
    from sparkglm_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, neighbor_id long, rank int"
    )
    # the same approx pair emitted twice (LSH candidate dup)
    approx = spark.createDataFrame(
        [(1, 10, 1), (1, 10, 2)], "query_id long, neighbor_id long, rank int"
    )
    out = ann_recall(exact, approx)
    assert out["n_exact_pairs"] == 2 and out["n_hits"] == 1
    assert out["macro_recall"] == pytest.approx(0.5)
