"""Text operators vs pure-Python oracles on collected data."""

import numpy as np
import pytest

from sparkglm_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "la casa es grande y el perro no es pequeno de verdad"),
        (2, "der hund ist nicht der beste freund und die katze"),
        (3, "numbers 123 456 and text 789 mixed"),
        (4, ""),
        (5, "   "),
        (6, "single"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_count(docs):
    got = {r["doc_id"]: r["n_tokens"] for r in T.text_stats(docs).collect()}
    assert got[0] == 9
    assert got[3] == 7
    assert got[4] == 0 and got[5] == 0
    assert got[6] == 1


def test_stats_python_oracle(docs):
    rows = {r["doc_id"]: r for r in T.text_stats(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, s in texts.items():
        r = rows[i]
        assert r["n_chars"] == len(s)
        toks = s.strip().split() if s.strip() else []
        assert r["n_tokens"] == len(toks)
        if len(s) > 0:
            digits = sum(c.isdigit() for c in s)
            assert r["digit_ratio"] == pytest.approx(digits / len(s))
        if toks:
            hits = sum(t in T.EN_STOPWORDS for t in s.lower().split())
            assert r["stopword_ratio"] == pytest.approx(hits / len(toks))


def test_language_id(docs):
    got = {r["doc_id"]: r["detected_lang"] for r in T.language_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "de"


def test_fingerprint_matches_python(docs):
    got = {r["doc_id"]: r["fingerprint"] for r in T.fingerprint(docs).collect()}
    for r in docs.collect():
        h = 0
        for ch in r["text"]:
            # Spark's ascii() = code point of first char
            h = (h * 31 + ord(ch)) % T._FP_MOD
        assert got[r["doc_id"]] == h, r["text"]


def test_fingerprint_distinguishes_and_repeats(documents):
    fp = T.fingerprint(documents)
    n = documents.count()
    assert fp.count() == n
    # deterministic across runs
    a = {r["doc_id"]: r["fingerprint"] for r in fp.collect()}
    b = {r["doc_id"]: r["fingerprint"] for r in T.fingerprint(documents).collect()}
    assert a == b
    # near-unique on real corpus
    assert len(set(a.values())) > n * 0.99


def test_quality_score_range(documents):
    rows = T.quality_score(documents).collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)


def test_language_id_null_text_is_null(spark):
    from sparkglm_spark.operators.text import language_id, text_profile

    docs = spark.createDataFrame(
        [(1, None), (2, "the cat is on the mat and it is not a dog")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in language_id(docs).collect()}
    assert rows[1].detected_lang is None and rows[1].lang_score is None
    assert rows[2].detected_lang == "en"
    prof = {r.doc_id: r for r in text_profile(docs).collect()}
    assert prof[1].detected_lang is None
    assert prof[2].detected_lang == "en"
