"""Null-text and filter-edge semantics of the corpus-prep pipeline (the
oracle covers the clean-testdata path; these cover the rows the testdata
doesn't contain)."""

from pyspark.sql import functions as F

from sparkglm_spark.operators.pipeline import (
    _quality_and_lang_cols,
    prepare_training_corpus,
)

GOOD_EN = (
    "the cat and the dog are in the house and it is a good day "
    "for a walk in the park with the dog and the cat"
)


def test_null_text_gets_null_lang_and_null_quality(spark):
    df = spark.createDataFrame(
        [(1, GOOD_EN), (2, None)], "doc_id bigint, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in _quality_and_lang_cols(df, "text").collect()
    }
    assert rows[1]["detected_lang"] == "en"
    assert rows[1]["quality_score"] > 0.5
    # null text must NOT be confidently labeled with the first sorted
    # language, nor score via least()'s null-skipping
    assert rows[2]["detected_lang"] is None
    assert rows[2]["quality_score"] is None


def test_null_text_dropped_even_at_min_quality_zero(spark):
    df = spark.createDataFrame(
        [(1, GOOD_EN), (2, None)], "doc_id bigint, text string"
    )
    out = prepare_training_corpus(df, min_quality=0.0, languages=None)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_pipeline_survivor_columns(spark):
    df = spark.createDataFrame([(7, GOOD_EN)], "doc_id bigint, text string")
    out = prepare_training_corpus(df)
    row = out.collect()[0]
    assert row["doc_id"] == 7
    assert row["detected_lang"] == "en"
    assert row["n_tokens"] == len(GOOD_EN.split())


def test_full_training_data_journey_composes(spark, documents, tmp_path):
    """The actual user journey, end to end on real testdata: clean (line
    dedup) → quality/language filter + exact & near dedup → repetition
    gate → quality-weighted downsample → token-budget packing → sharded
    parquet handoff. Proves the operators compose schema-wise and that
    every stage's invariant holds on the composed output."""
    from pyspark.sql import functions as F

    from sparkglm_spark.operators.pack import pack_cumulative
    from sparkglm_spark.operators.pipeline import prepare_training_corpus
    from sparkglm_spark.operators.split import weighted_hash_sample
    from sparkglm_spark.operators.text import remove_repeated_lines, repetition_stats
    from sparkglm_spark.sources.io import write_training_shards

    cleaned = remove_repeated_lines(documents)
    survivors = prepare_training_corpus(cleaned, min_quality=0.3)
    gated = survivors.join(
        repetition_stats(survivors).where(F.col("top_token_ratio") <= 0.5).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    sampled = weighted_hash_sample(gated, "doc_id", "quality_score")
    n_sampled = sampled.count()
    assert 0 < n_sampled <= gated.count() <= survivors.count() <= documents.count()

    packed = pack_cumulative(sampled, budget=256, n_buckets=2)
    assert packed.count() == n_sampled  # one row per surviving doc
    assert packed.where(F.col("n_tokens") < 0).count() == 0

    out = str(tmp_path / "journey_shards")
    manifest = write_training_shards(sampled, out, n_shards=2)
    assert sum(r["n_rows"] for r in manifest.collect()) == n_sampled
    back = spark.read.parquet(out)
    assert back.count() == n_sampled
    assert set(sampled.columns) <= set(back.columns)

    # and the composed pipeline still never ships text through a keyed
    # exchange (the whole point of the wire discipline)
    from sparkglm_spark.plans.inspect import assert_no_columns_in_exchanges

    assert_no_columns_in_exchanges(sampled, ["text"])


def test_prepare_training_corpus_with_gopher_gate(spark, documents):
    from sparkglm_spark.operators.pipeline import prepare_training_corpus
    from sparkglm_spark.operators.text import gopher_quality_filter

    thr = {"max_dup_token_ratio": 0.95, "max_top_token_ratio": 0.5}
    gated = prepare_training_corpus(
        documents, min_quality=0.0, languages=None, gopher_rules=thr
    )
    # gating first ≡ running the plain chain on pre-gated input
    plain = prepare_training_corpus(
        gopher_quality_filter(documents, **thr), min_quality=0.0, languages=None
    )
    got = sorted(r["doc_id"] for r in gated.collect())
    want = sorted(r["doc_id"] for r in plain.collect())
    assert got == want and len(got) > 0
    # default (None) leaves the chain untouched
    base = prepare_training_corpus(documents, min_quality=0.0, languages=None)
    assert base.count() >= len(got)
