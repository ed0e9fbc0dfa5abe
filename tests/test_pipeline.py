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
