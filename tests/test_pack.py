"""Sequence packing (operators/pack.py): window-chunking semantics vs a
pandas reference, the greedy strict-cap contract, and partition
invariance (pack membership must be a pure function of the data)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators.pack import pack_cumulative, pack_greedy, pack_stats
from sparkglm_spark.operators.split import _AFFINE_A, _AFFINE_B, _AFFINE_P


def _docs(spark, tokens_by_id):
    rows = [(i, " ".join(["w"] * t) if t else "") for i, t in tokens_by_id.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket(doc_id, n_buckets):
    return ((doc_id % (1 << 32)) * _AFFINE_A + _AFFINE_B) % _AFFINE_P % 1_000_000 % n_buckets


def test_cumulative_matches_pandas_reference(spark):
    tokens = {i: (i * 37) % 90 + 1 for i in range(60)}
    got = (
        pack_cumulative(_docs(spark, tokens), budget=100, n_buckets=3)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = pd.DataFrame(
        {"doc_id": list(tokens), "n_tokens": list(tokens.values())}
    )
    ref["bucket"] = [_bucket(i, 3) for i in ref["doc_id"]]
    ref = ref.sort_values(["bucket", "doc_id"])
    ref["excl"] = ref.groupby("bucket")["n_tokens"].cumsum() - ref["n_tokens"]
    ref["pack_id"] = ref["excl"] // 100
    ref["offset_tokens"] = ref["excl"] % 100
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    for c in ("bucket", "n_tokens", "pack_id", "offset_tokens"):
        assert got[c].tolist() == ref[c].tolist(), c


def test_cumulative_single_pack_when_budget_large(spark):
    out = pack_cumulative(
        _docs(spark, {i: 5 for i in range(10)}), budget=10_000, n_buckets=2
    )
    assert out.select("pack_id").distinct().collect() == [(0,)]


def test_blank_text_counts_zero_tokens(spark):
    out = pack_cumulative(_docs(spark, {1: 0, 2: 3}), budget=10, n_buckets=1)
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert got == {1: 0, 2: 3}


def test_greedy_strict_cap_and_reference(spark):
    tokens = {i: (i * 53) % 140 + 1 for i in range(80)}  # some docs > budget
    budget = 100
    got = (
        pack_greedy(_docs(spark, tokens), budget=budget, n_buckets=4)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # strict cap: a pack's total exceeds budget only if it is one oversized doc
    sums = got.groupby(["bucket", "pack_id"]).agg(
        total=("n_tokens", "sum"), n=("n_tokens", "size")
    )
    over = sums[sums["total"] > budget]
    assert (over["n"] == 1).all()
    # matches the sequential greedy reference per bucket
    for b, grp in got.groupby("bucket"):
        grp = grp.sort_values("doc_id")
        pack, acc, want = 0, 0, []
        for t in grp["n_tokens"]:
            if acc > 0 and acc + t > budget:
                pack, acc = pack + 1, 0
            want.append(pack)
            acc += int(t)
        assert grp["pack_id"].tolist() == want, f"bucket {b}"


def test_partition_invariance(spark):
    docs = _docs(spark, {i: (i * 29) % 60 + 1 for i in range(50)})
    for fn in (pack_cumulative, pack_greedy):
        a = fn(docs.repartition(1), budget=64, n_buckets=2).toPandas()
        b = fn(docs.repartition(9), budget=64, n_buckets=2).toPandas()
        cols = ["doc_id", "bucket", "pack_id"]
        assert (
            a[cols].sort_values("doc_id").values.tolist()
            == b[cols].sort_values("doc_id").values.tolist()
        ), fn.__name__


def test_pack_stats_rollup(spark):
    packed = pack_cumulative(
        _docs(spark, {i: 10 for i in range(12)}), budget=25, n_buckets=1
    )
    stats = {r["pack_id"]: r for r in pack_stats(packed).collect()}
    # 12 docs x 10 tokens, cut at 25: packs of cumsum ranges
    assert sum(r["n_docs"] for r in stats.values()) == 12
    assert sum(r["pack_tokens"] for r in stats.values()) == 120


def test_bad_budget_raises(spark):
    with pytest.raises(ValueError):
        pack_cumulative(_docs(spark, {1: 1}), budget=0)
    with pytest.raises(ValueError):
        pack_greedy(_docs(spark, {1: 1}), budget=-5)


def test_precomputed_token_col(spark):
    df = spark.createDataFrame([(1, 7), (2, 9)], "doc_id long, n_tok long")
    out = pack_cumulative(
        df, token_count_col="n_tok", budget=10, n_buckets=1
    ).collect()
    assert {r["doc_id"]: r["n_tokens"] for r in out} == {1: 7, 2: 9}


def test_string_ids_raise_at_plan_time(spark):
    from sparkglm_spark.operators.pack import pack_cumulative

    df = spark.createDataFrame([("doc-1", "a b c")], "doc_id string, text string")
    with pytest.raises(TypeError, match="integral id"):
        pack_cumulative(df)
