"""Deterministic split/shuffle: partition invariance is the load-bearing
property (Spark's randomSplit does NOT have it)."""

import pytest
from pyspark.sql import functions as F


def test_hash_split_disjoint_and_complete(spark, documents):
    from sparkglm_spark.operators.split import hash_split

    parts = hash_split(documents, "doc_id", {"train": 0.8, "test": 0.2})
    n = documents.count()
    ids_train = {r["doc_id"] for r in parts["train"].select("doc_id").collect()}
    ids_test = {r["doc_id"] for r in parts["test"].select("doc_id").collect()}
    assert ids_train.isdisjoint(ids_test)
    assert len(ids_train) + len(ids_test) == n
    # approximately proportional (hash uniformity)
    assert 0.7 <= len(ids_train) / n <= 0.9


def test_hash_split_partition_invariant(spark, documents):
    from sparkglm_spark.operators.split import hash_split

    def train_ids(df):
        return sorted(
            r["doc_id"]
            for r in hash_split(df, "doc_id", {"train": 0.8, "test": 0.2})["train"]
            .select("doc_id")
            .collect()
        )

    assert train_ids(documents.repartition(2)) == train_ids(documents.repartition(16))


def test_with_split_column_matches_hash_split(spark, documents):
    from sparkglm_spark.operators.split import hash_split, with_split_column

    labeled = with_split_column(documents, "doc_id", {"train": 0.8, "test": 0.2})
    by_label = {
        r["doc_id"]: r["split"] for r in labeled.select("doc_id", "split").collect()
    }
    parts = hash_split(documents, "doc_id", {"train": 0.8, "test": 0.2})
    for name in ("train", "test"):
        for r in parts[name].select("doc_id").collect():
            assert by_label[r["doc_id"]] == name


def test_shard_and_shuffle_deterministic(spark, documents):
    from sparkglm_spark.operators.split import shard_and_shuffle

    def order(df):
        out = shard_and_shuffle(df, "doc_id", n_shards=4)
        return [
            (r["shard"], r["doc_id"])
            for r in out.select("shard", "doc_id").toLocalIterator()
        ]

    a = order(documents.repartition(3))
    b = order(documents.repartition(11))
    assert a == b
    shards = {s for s, _ in a}
    assert shards == {0, 1, 2, 3}


def test_hash_split_seed_changes_assignment(spark, documents):
    from sparkglm_spark.operators.split import hash_split

    a = {r["doc_id"] for r in hash_split(documents, "doc_id", {"x": 0.5, "y": 0.5}, seed=1)["x"].collect()}
    b = {r["doc_id"] for r in hash_split(documents, "doc_id", {"x": 0.5, "y": 0.5}, seed=2)["x"].collect()}
    assert a != b


def test_hash_sample_fraction_and_invariance(spark, sf_dir):
    """hash_sample hits ~fraction of keys, identically at any partitioning,
    and different salts give independent samples."""
    import os

    from sparkglm_spark.operators.split import hash_sample

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = orders.count()
    s1 = hash_sample(orders, "o_orderkey", 0.2)
    got = s1.count()
    assert abs(got / n - 0.2) < 0.05
    a = sorted(r[0] for r in s1.select("o_orderkey").collect())
    b = sorted(
        r[0]
        for r in hash_sample(orders.repartition(16), "o_orderkey", 0.2)
        .select("o_orderkey")
        .collect()
    )
    assert a == b
    c = set(
        r[0]
        for r in hash_sample(orders, "o_orderkey", 0.2, salt=7)
        .select("o_orderkey")
        .collect()
    )
    overlap = len(set(a) & c) / max(len(c), 1)
    assert 0.05 < overlap < 0.5  # ~independent: expected ≈0.2 of the keys


def test_stratified_sample_nesting_and_fractions(spark, orders):
    from sparkglm_spark.operators.split import stratified_hash_sample

    frs = {"1-URGENT": 1.0, "2-HIGH": 0.5}
    samp = stratified_hash_sample(
        orders, "o_orderkey", "o_orderpriority", frs, default_fraction=0.1
    )
    # fraction 1.0 keeps the whole stratum
    n_urgent = orders.where("o_orderpriority = '1-URGENT'").count()
    assert samp.where("o_orderpriority = '1-URGENT'").count() == n_urgent
    # nesting: kept keys at 0.2 are a subset of kept keys at 0.5
    lo = stratified_hash_sample(
        orders, "o_orderkey", "o_orderpriority", {"2-HIGH": 0.2}
    )
    hi = stratified_hash_sample(
        orders, "o_orderkey", "o_orderpriority", {"2-HIGH": 0.5}
    )
    lo_keys = {r[0] for r in lo.select("o_orderkey").collect()}
    hi_keys = {r[0] for r in hi.select("o_orderkey").collect()}
    assert lo_keys <= hi_keys
    # default 0.0 drops unlisted strata entirely
    assert lo.where("o_orderpriority <> '2-HIGH'").count() == 0


def test_stratified_sample_validates_fractions(spark, orders):
    from sparkglm_spark.operators.split import stratified_hash_sample

    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_hash_sample(orders, "o_orderkey", "o_orderpriority", {"x": 1.5})
    with _pytest.raises(ValueError):
        stratified_hash_sample(
            orders, "o_orderkey", "o_orderpriority", {}, default_fraction=-0.1
        )


def test_portable_paths_reject_string_keys(spark):
    """The affine hash casts keys to long; a string key would NULL every
    bucket and silently return empty samples/splits — plan-time TypeError
    instead (xxhash64-based paths accept any type and are unaffected)."""
    import pytest

    from sparkglm_spark.operators.split import (
        hash_sample, hash_split, stratified_hash_sample, with_split_column,
    )

    df = spark.createDataFrame([("a", "x")], "doc_id string, strata string")
    for call in [
        lambda: hash_sample(df, "doc_id", 0.5),
        lambda: stratified_hash_sample(df, "doc_id", "strata", {"x": 1.0}),
        lambda: hash_split(df, "doc_id", {"train": 0.8, "test": 0.2}, portable=True),
        lambda: with_split_column(df, "doc_id", {"train": 0.8, "test": 0.2}, portable=True),
    ]:
        with pytest.raises(TypeError, match="integral id"):
            call()
    # non-portable split still works on string keys (xxhash64)
    parts = hash_split(df, "doc_id", {"train": 0.5, "test": 0.5})
    assert sum(p.count() for p in parts.values()) == 1


def test_weighted_hash_sample_properties(spark):
    """Keep rate tracks the weight, keep sets nest in scale, weight>=1/scale
    keeps everything, weight<=0 / NULL keeps nothing, and the filter is
    partition-invariant."""
    from sparkglm_spark.operators.split import weighted_hash_sample

    rows = [(i, [0.0, 0.25, 0.5, 1.0, None][i % 5]) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    kept = weighted_hash_sample(df, "doc_id", "w").groupBy("w").count().collect()
    by_w = {r["w"]: r["count"] for r in kept}
    assert None not in by_w and 0.0 not in by_w  # null / zero weight drop
    assert by_w[1.0] == 1000  # full keep
    # ~rate tracks weight (1000 rows per weight level)
    assert abs(by_w[0.25] - 250) < 80
    assert abs(by_w[0.5] - 500) < 100

    a = {r["doc_id"] for r in weighted_hash_sample(df, "doc_id", "w", scale=0.5).collect()}
    b = {r["doc_id"] for r in weighted_hash_sample(df, "doc_id", "w", scale=1.0).collect()}
    assert a <= b  # nested in scale

    c = {r["doc_id"] for r in weighted_hash_sample(df.repartition(13), "doc_id", "w").collect()}
    assert c == b  # partition-invariant at scale=1


def test_mixture_fractions_max_data_policy(spark, documents):
    from sparkglm_spark.operators.split import mixture_fractions

    w = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    fr = mixture_fractions(documents, "source", w)
    assert set(fr) == set(w)
    # python twin: T = min(n/w); frac = floor(w*T/n*1e6)/1e6
    import math

    counts = {
        r["source"]: r["count"]
        for r in documents.groupBy("source").count().collect()
    }
    t = min(counts[s] / wt for s, wt in w.items())
    for s, wt in w.items():
        want = math.floor(wt * t / counts[s] * 1_000_000.0) / 1_000_000
        assert fr[s] == want, s
    # the scarcest source keeps ~everything; all fractions in (0, 1]
    assert max(fr.values()) >= 1.0 - 1e-6
    assert all(0 < f <= 1.0 for f in fr.values())


def test_mixture_sample_hits_target_proportions(spark, documents):
    from sparkglm_spark.operators.split import mixture_fractions, mixture_sample

    w = {"src0": 0.5, "src1": 0.25, "src2": 0.25}
    out = mixture_sample(documents, "doc_id", "source", w)
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # only weighted sources survive
    assert set(got) <= set(w)
    # kept counts equal the deterministic per-source expectation within
    # hash-sampling noise (binomial; generous 5-sigma-ish bound)
    counts = {
        r["source"]: r["count"]
        for r in documents.groupBy("source").count().collect()
    }
    fr = mixture_fractions(documents, "source", w)
    for s, f in fr.items():
        expect = counts[s] * f
        slack = max(5.0 * (expect * max(1 - f, 0.05)) ** 0.5, 3)
        assert abs(got.get(s, 0) - expect) <= slack, (s, got.get(s), expect)
    # determinism: same call → identical kept id set
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample(documents, "doc_id", "source", w).collect()
    )
    assert ids1 == ids2


def test_mixture_sample_validations(spark, documents):
    from sparkglm_spark.operators.split import mixture_fractions, mixture_sample

    with pytest.raises(ValueError, match="non-empty"):
        mixture_fractions(documents, "source", {})
    with pytest.raises(ValueError, match="must be > 0"):
        mixture_fractions(documents, "source", {"src0": 0.0})
    with pytest.raises(ValueError, match="no weighted source"):
        mixture_fractions(documents, "source", {"no_such_source": 1.0})
    with pytest.raises(ValueError, match="distinct sources"):
        mixture_fractions(documents, "source", {"src0": 1.0}, max_sources=2)
    # weighted-but-absent sources are ignored (warning), present ones mix
    fr = mixture_fractions(documents, "source", {"src0": 0.5, "ghost": 0.5})
    assert set(fr) == {"src0"} and fr["src0"] >= 1.0 - 1e-6
    out = mixture_sample(documents, "doc_id", "source", {"src0": 0.5, "ghost": 0.5})
    assert out.select("source").distinct().collect()[0][0] == "src0"


# ---------------------------------------------------------------------------
# cap_per_group (domain quotas)
# ---------------------------------------------------------------------------

from sparkglm_spark.operators import split as SP


def _affine_bucket(key: int, salt: int = 0) -> int:
    a = SP._AFFINE_A + 2 * 1009 * salt
    return ((key % (1 << 32)) * a + SP._AFFINE_B) % SP._AFFINE_P % SP._BUCKETS


def test_cap_per_group_hash_priority(documents):
    cap = 20
    out = SP.cap_per_group(documents, "source", cap, "doc_id").collect()
    rows = documents.select("doc_id", "source").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    expect = set()
    for src, ids in by_src.items():
        keep = sorted(ids, key=lambda i: (_affine_bucket(i), i))[:cap]
        expect.update(keep)
    assert {r["doc_id"] for r in out} == expect
    # caps actually bind on this corpus, and no group exceeds the cap
    from collections import Counter

    sizes = Counter(r["source"] for r in out)
    assert max(sizes.values()) == cap and len(out) < len(rows)


def test_cap_per_group_order_col_descending(documents):
    # keep the 5 LONGEST docs per source (quality-ranked quota)
    out = SP.cap_per_group(
        documents, "source", 5, "doc_id", order_col="n_chars", descending=True
    ).collect()
    rows = documents.select("doc_id", "source", "n_chars").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    expect = set()
    for src, rs in by_src.items():
        keep = sorted(rs, key=lambda r: (-r["n_chars"], r["doc_id"]))[:5]
        expect.update(r["doc_id"] for r in keep)
    assert {r["doc_id"] for r in out} == expect


def test_cap_per_group_partition_invariant(documents):
    a = SP.cap_per_group(documents.repartition(1), "source", 7, "doc_id")
    b = SP.cap_per_group(documents.repartition(13), "source", 7, "doc_id")
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_cap_per_group_never_shuffles_text(documents):
    from sparkglm_spark.plans.inspect import assert_no_columns_in_exchanges

    out = SP.cap_per_group(documents, "source", 10, "doc_id")
    assert_no_columns_in_exchanges(out, ["text"])


def test_cap_per_group_validates(documents):
    with pytest.raises(ValueError, match="cap"):
        SP.cap_per_group(documents, "source", -1, "doc_id")
    with pytest.raises(TypeError):
        SP.cap_per_group(documents, "source", 3, "text")  # non-integral hash key


def test_cap_per_group_null_scores_never_win(spark):
    df = spark.createDataFrame(
        [(1, "g", None), (2, "g", 5.0), (3, "g", 1.0), (4, "g", None)],
        "id long, grp string, score double",
    )
    top = SP.cap_per_group(df, "grp", 2, "id", order_col="score", descending=True)
    assert sorted(r["id"] for r in top.collect()) == [2, 3]
    low = SP.cap_per_group(df, "grp", 2, "id", order_col="score", descending=False)
    assert sorted(r["id"] for r in low.collect()) == [2, 3]
    # with room beyond the scored rows, nulls fill by id order
    three = SP.cap_per_group(df, "grp", 3, "id", order_col="score")
    assert sorted(r["id"] for r in three.collect()) == [1, 2, 3]


# ---------------------------------------------------------------------------
# leakage-safe (cluster-grain) splits (r7)
# ---------------------------------------------------------------------------


def test_leakage_safe_split_keeps_clusters_together(spark):
    from sparkglm_spark.operators.split import (
        leakage_safe_split,
        with_leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # clusters: pair up (2k, 2k+1) for the first 100 ids; rest singleton
    clusters = spark.createDataFrame(
        [(i, (i // 2) * 2) for i in range(100)], "doc_id long, cluster_id long"
    )
    labeled = with_leakage_safe_split(
        docs, clusters, {"train": 0.7, "test": 0.3}, seed=7
    )
    rows = {r["doc_id"]: r["split"] for r in labeled.collect()}
    assert set(rows) == set(range(200))          # all rows covered
    for k in range(50):                          # no cluster straddles
        assert rows[2 * k] == rows[2 * k + 1], k
    # dict variant: disjoint cover, schema restored
    parts = leakage_safe_split(docs, clusters, {"train": 0.7, "test": 0.3}, seed=7)
    n_train = parts["train"].count()
    n_test = parts["test"].count()
    assert n_train + n_test == 200
    assert parts["train"].columns == docs.columns
    # rows not in the cluster table fall back to their own id: same
    # assignment as the plain hash split at the same seed
    from sparkglm_spark.operators.split import with_split_column

    plain = {
        r["doc_id"]: r["split"]
        for r in with_split_column(
            docs.where(F.col("doc_id") >= 100), "doc_id",
            {"train": 0.7, "test": 0.3}, seed=7,
        ).collect()
    }
    for i in range(100, 200):
        assert rows[i] == plain[i]


def test_leakage_safe_split_validations_and_invariance(spark):
    from sparkglm_spark.operators.split import with_leakage_safe_split

    docs = spark.createDataFrame(
        [(i, "t") for i in range(50)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(i, 0) for i in range(50)], "doc_id long, cluster_id long"
    )
    # one giant cluster -> every row in ONE split
    labeled = with_leakage_safe_split(docs, clusters, {"a": 0.5, "b": 0.5})
    assert labeled.select("split").distinct().count() == 1
    # clash guard
    with pytest.raises(ValueError, match="cluster_id"):
        with_leakage_safe_split(
            docs.withColumn("cluster_id", F.lit(1)), clusters, {"a": 1.0}
        )
    # partition invariance (the split.py contract)
    a = {r["doc_id"]: r["split"] for r in with_leakage_safe_split(
        docs.repartition(2), clusters, {"a": 0.5, "b": 0.5}, seed=3).collect()}
    b = {r["doc_id"]: r["split"] for r in with_leakage_safe_split(
        docs.repartition(7), clusters, {"a": 0.5, "b": 0.5}, seed=3).collect()}
    assert a == b

def test_sample_to_token_budget_explicit_order(spark):
    from sparkglm_spark.operators.split import sample_to_token_budget

    rows = [(i, float(10 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, tok double").repartition(7)
    budget = 1500.0
    kept = sample_to_token_budget(df, "tok", budget, order_col="id").collect()
    # pandas twin: prefix of the id order with cumsum <= budget
    cum, want = 0.0, []
    for i, t in rows:
        cum += t
        if cum <= budget:
            want.append((i, cum))
        else:
            break
    got = sorted((r.id, r.cum_tokens) for r in kept)
    assert got == [(i, pytest.approx(c)) for i, c in want]
    assert max(r.cum_tokens for r in kept) <= budget


def test_sample_to_token_budget_hash_order(spark, documents):
    from sparkglm_spark.operators.split import (
        _AFFINE_A,
        _AFFINE_B,
        _AFFINE_P,
        _BUCKETS,
        sample_to_token_budget,
    )

    budget = 100_000.0
    kept = sample_to_token_budget(documents, "n_chars", budget, key_col="doc_id")
    a = {r.doc_id for r in kept.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in sample_to_token_budget(
            documents.repartition(17), "n_chars", budget, key_col="doc_id"
        ).select("doc_id").collect()
    }
    assert a == b and len(a) > 0  # deterministic, partition-invariant
    total = (
        kept.agg(F.sum("n_chars").alias("s")).collect()[0]["s"]
    )
    assert total <= budget
    # maximality: python twin of the portable hash order — the kept set is
    # exactly the maximal prefix (tie groups share fate)
    rows = documents.select("doc_id", "n_chars").collect()
    hashed = sorted(
        rows, key=lambda r: (((r.doc_id % (1 << 32)) * _AFFINE_A + _AFFINE_B)
                             % _AFFINE_P % _BUCKETS, )
    )
    import itertools

    want, cum = set(), 0.0
    keyf = lambda r: ((r.doc_id % (1 << 32)) * _AFFINE_A + _AFFINE_B) % _AFFINE_P % _BUCKETS
    for _, grp in itertools.groupby(sorted(rows, key=keyf), key=keyf):
        grp = list(grp)
        gtok = sum(r.n_chars for r in grp)
        if cum + gtok <= budget:
            cum += gtok
            want |= {r.doc_id for r in grp}
        else:
            break
    assert a == want

    with pytest.raises(ValueError, match="budget"):
        sample_to_token_budget(documents, "n_chars", 0.0, key_col="doc_id")
    with pytest.raises(ValueError, match="order_col or key_col"):
        sample_to_token_budget(documents, "n_chars", 10.0)

def test_sample_to_token_budget_validates_tokens(spark):
    from sparkglm_spark.operators.split import sample_to_token_budget

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0)], "id long, tok double"
    )
    with pytest.raises(ValueError, match="null"):
        sample_to_token_budget(df, "tok", 100.0, order_col="id")
    neg = spark.createDataFrame([(1, 10.0), (2, -3.0)], "id long, tok double")
    with pytest.raises(ValueError, match="negative"):
        sample_to_token_budget(neg, "tok", 100.0, order_col="id")
