"""Text operators vs pure-Python oracles on collected data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

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


def test_repetition_stats_match_python(spark):
    """Repetition signals vs a pure-python twin over handcrafted and
    seeded-random docs (repeats, chanting, blanks, empty)."""
    import random

    from sparkglm_spark.operators.text import repetition_stats

    rng = random.Random(57)
    rows = [
        (0, "a b c\na b c\nunique line"),
        (1, "spam spam spam spam ham"),
        (2, ""),
        (3, "\n\n\n"),
        (4, "one\n\ntwo\nthree"),
    ]
    vocab = ["x", "y", "z", "lorem", "ipsum"]
    for i in range(5, 40):
        n = rng.randrange(1, 30)
        toks = [rng.choice(vocab) for _ in range(n)]
        lines = [" ".join(toks[j : j + 4]) for j in range(0, n, 4)]
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    for did, text in rows:
        lines = [l.strip() for l in text.split("\n") if l.strip()]
        toks = [w for w in text.strip().split() if w]
        r = got[did]
        assert r["n_lines"] == len(lines), did
        if lines:
            assert r["dup_line_ratio"] == pytest.approx(
                (len(lines) - len(set(lines))) / len(lines)
            ), did
        else:
            assert r["dup_line_ratio"] is None
        if toks:
            assert r["dup_token_ratio"] == pytest.approx(
                (len(toks) - len(set(toks))) / len(toks)
            ), did
            top = max(toks.count(w) for w in set(toks))
            assert r["top_token_ratio"] == pytest.approx(top / len(toks)), did
        else:
            assert r["top_token_ratio"] is None


def test_remove_repeated_lines_keeps_first_occurrence(spark):
    from sparkglm_spark.operators.text import remove_repeated_lines

    df = spark.createDataFrame(
        [(0, "keep me\ndup\nother\ndup\nkeep me\nlast")], "doc_id long, text string"
    )
    out = remove_repeated_lines(df).collect()[0]["text"]
    assert out == "keep me\ndup\nother\nlast"
    # zero-shuffle claim
    from sparkglm_spark.plans.inspect import exchange_schemas

    assert exchange_schemas(remove_repeated_lines(df)) == []


def test_redact_patterns_matches_python(spark):
    import re

    from sparkglm_spark.operators.text import (
        DEFAULT_REDACT_PATTERNS,
        redact_patterns,
    )

    rows = [
        (1, "contact me at bob.smith@example.com or 192.168.0.1 thanks"),
        (2, "call +1-555-123-4567 now; backup a@b.io and c@d.org"),
        (3, "clean text no pii at all"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "extra", F.col("doc_id") * 10
    )
    out = {r["doc_id"]: r for r in redact_patterns(df).collect()}
    for doc_id, text in rows:
        # counts on the ORIGINAL text, replacement chained in dict order
        expect_text = text
        for name, p in DEFAULT_REDACT_PATTERNS.items():
            assert out[doc_id][f"n_redact_{name}"] == len(re.findall(p, text)), (
                doc_id,
                name,
            )
            expect_text = re.sub(p, f"<{name.upper()}>", expect_text)
        assert out[doc_id]["text"] == expect_text, doc_id
        assert out[doc_id]["extra"] == doc_id * 10  # other columns survive


def test_redact_patterns_custom_and_validation(spark):
    from sparkglm_spark.operators.text import redact_patterns

    df = spark.createDataFrame(
        [(1, "order #1234 and #99")], "doc_id long, text string"
    )
    out = redact_patterns(
        df, patterns={"order": r"#[0-9]+"}
    ).collect()[0]
    assert out["text"] == "order <ORDER> and <ORDER>"
    assert out["n_redact_order"] == 2
    with pytest.raises(ValueError, match="non-empty"):
        redact_patterns(df, patterns={})


def test_redact_patterns_is_zero_shuffle(spark, documents):
    from sparkglm_spark.operators.text import redact_patterns
    from sparkglm_spark.plans.inspect import exchange_schemas

    assert exchange_schemas(redact_patterns(documents), skip_round_robin=True) == []


def _py_gopher_pass(text, thr):
    toks = [t for t in text.strip().split() if t] if text.strip() else []
    n_tokens = len(toks)
    n_chars = len(text)
    avg_len = n_chars / n_tokens if n_tokens else None
    n_alpha = sum(1 for c in text if c.isascii() and c.isalpha())
    alpha_ratio = n_alpha / n_chars if n_chars else None
    lines = [s.strip() for s in text.split("\n") if s.strip()]
    dup_line = (len(lines) - len(set(lines))) / len(lines) if lines else None
    nb = [t for t in text.strip().split() if t]
    dup_tok = (len(nb) - len(set(nb))) / len(nb) if nb else None
    top_tok = max(nb.count(d) for d in set(nb)) / len(nb) if nb else None

    def ok(v, bound, ge):
        if bound is None:
            return True
        if v is None:
            return False
        return v >= bound if ge else v <= bound

    return (
        ok(n_tokens, thr.get("min_tokens", 50), True)
        and ok(n_tokens, thr.get("max_tokens", 100_000), False)
        and ok(avg_len, thr.get("min_avg_token_len", 3.0), True)
        and ok(avg_len, thr.get("max_avg_token_len", 10.0), False)
        and ok(alpha_ratio, thr.get("min_alpha_ratio", 0.6), True)
        and ok(None if "min_stopword_ratio" not in thr else 1.0,
               thr.get("min_stopword_ratio"), True)
        and ok(dup_line, thr.get("max_dup_line_ratio", 0.30), False)
        and ok(dup_tok, thr.get("max_dup_token_ratio", 0.30), False)
        and ok(top_tok, thr.get("max_top_token_ratio", 0.20), False)
    )


def test_gopher_flags_match_python(spark):
    from sparkglm_spark.operators.text import gopher_quality_flags

    rows = [
        (1, " ".join(["solid"] * 30 + ["prose", "words", "here"] * 10)),  # long, repetitive
        (2, " ".join(f"word{i}" for i in range(60))),  # long, diverse
        (3, "too short"),
        (4, ""),
        (5, "line\n" * 80),  # 80 dup lines, 80 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    thr = {"max_dup_token_ratio": 0.95, "max_top_token_ratio": 0.5}
    got = {
        r["doc_id"]: r["gopher_pass"]
        for r in gopher_quality_flags(df, **thr).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _py_gopher_pass(text, thr), doc_id
    # default thresholds kill the repetitive doc that loose ones let pass
    strict = {
        r["doc_id"]: r["gopher_pass"]
        for r in gopher_quality_flags(df).collect()
    }
    assert strict[1] is False and got[1] is True


def test_gopher_filter_returns_original_rows(spark, documents):
    from sparkglm_spark.operators.text import (
        gopher_quality_filter,
        gopher_quality_flags,
    )
    from sparkglm_spark.plans.inspect import exchange_schemas

    thr = {"max_dup_token_ratio": 0.95, "max_top_token_ratio": 0.5}
    out = gopher_quality_filter(documents, **thr)
    assert out.columns == documents.columns  # incl. the clashing n_chars
    flags = gopher_quality_flags(documents, **thr)
    want_ids = sorted(
        r["doc_id"] for r in flags.where(F.col("gopher_pass")).collect()
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert sorted(got) == want_ids
    orig = {r["doc_id"]: r for r in documents.collect()}
    assert all(got[i] == orig[i] for i in got)  # values untouched
    assert exchange_schemas(out, skip_round_robin=True) == []  # pure filter


def test_gopher_unknown_rule_raises(spark, documents):
    from sparkglm_spark.operators.text import gopher_quality_flags

    with pytest.raises(ValueError, match="unknown gopher rule"):
        gopher_quality_flags(documents, bogus=1.0)


# ---------------------------------------------------------------------------
# normalize_text
# ---------------------------------------------------------------------------


def test_normalize_text_rules(spark):
    from sparkglm_spark.operators.text import normalize_text

    messy = (
        "  “Smart” quotes ‘here’, an – en "
        "and—em dash,\ttabs\t\tand   runs \n   spaced line   \n\n\n\n"
        "after page break\x07\x00 bell  "
    )
    df = spark.createDataFrame([(1, messy), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    expect = (
        '"Smart" quotes \'here\', an - en and-em dash, tabs and runs\n'
        "spaced line\n\nafter page break bell"
    )
    assert out[1]["text"] == expect
    assert out[1]["n_chars_removed"] == len(messy) - len(expect)
    assert out[2]["text"] is None and out[2]["n_chars_removed"] is None


def test_normalize_text_idempotent(documents):
    from sparkglm_spark.operators.text import normalize_text

    once = normalize_text(documents).select("doc_id", "text")
    twice = normalize_text(once).select("doc_id", "text", "n_chars_removed")
    rows = twice.collect()
    assert all(r["n_chars_removed"] == 0 for r in rows if r["text"] is not None)


def test_normalize_text_zero_shuffle(documents):
    from sparkglm_spark.operators.text import normalize_text
    from sparkglm_spark.plans.inspect import exchange_schemas

    out = normalize_text(documents)
    # only the tiny-input round-robin fan-out may appear; no hash/range
    # exchange — the op is a pure projection
    assert exchange_schemas(out) == []


# ---------------------------------------------------------------------------
# hashed_tf_vectors
# ---------------------------------------------------------------------------


def test_hashed_tf_matches_numpy(spark):
    import numpy as np

    from sparkglm_spark.operators.dedup import (
        _SIMHASH_M,
        _SIMHASH_P,
        _SIMHASH_SEED,
    )
    from sparkglm_spark.operators.text import hashed_tf_vectors

    def py_hash(tok):
        h = _SIMHASH_SEED[0]
        for ch in tok:
            h = (h * _SIMHASH_M[0] + ord(ch)) % _SIMHASH_P
        return h

    rows = [
        (1, "The cat sat on the   mat"),
        (2, "dog dog dog"),
        (3, "  "),     # no tokens -> no row
        (4, None),     # no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: np.array(r["vector"])
        for r in hashed_tf_vectors(
            df, n_features=32, hash_fn="portable"
        ).collect()
    }
    assert set(got) == {1, 2}
    import re

    for doc_id, text in rows[:2]:
        v = np.zeros(32)
        for t in re.split(r"\s+", text.strip().lower()):
            v[py_hash(t) % 32] += 1
        v = v / np.linalg.norm(v)
        assert np.allclose(got[doc_id], v, atol=1e-12), doc_id
    # unit norm
    assert abs(np.linalg.norm(got[1]) - 1.0) < 1e-12


def test_hashed_tf_feeds_the_similarity_suite(documents):
    """The embedding-free lexical near-dup path: hashed TF vectors of the
    real corpus through near_dup_pairs must recover the corpus's exact
    text duplicates (cosine 1 pairs ⊇ identical-text pairs)."""
    from sparkglm_spark.operators.similarity import near_dup_pairs
    from sparkglm_spark.operators.text import hashed_tf_vectors

    vecs = hashed_tf_vectors(documents, n_features=128)
    pairs = near_dup_pairs(vecs, id_col="doc_id", vec_col="vector", threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in documents.select("doc_id", "text").collect()
        if r["text"] and r["text"].strip()
    }
    exact = {
        (a, b)
        for a in texts
        for b in texts
        if a < b and texts[a].lower().split() == texts[b].lower().split()
    }
    assert got >= exact
    # and it is selective: nowhere near all-pairs
    n = len(texts)
    assert len(got) < 0.01 * n * (n - 1) / 2


def test_hashed_tf_validation_and_partition_invariance(documents):
    from sparkglm_spark.operators.text import hashed_tf_vectors

    with pytest.raises(ValueError, match="n_features"):
        hashed_tf_vectors(documents, n_features=0)
    with pytest.raises(ValueError, match="hash_fn"):
        hashed_tf_vectors(documents, hash_fn="md5")
    a = {
        r["doc_id"]: tuple(r["vector"])
        for r in hashed_tf_vectors(documents.repartition(2), n_features=64).collect()
    }
    b = {
        r["doc_id"]: tuple(r["vector"])
        for r in hashed_tf_vectors(documents.repartition(9), n_features=64).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# tfidf_vectors (r7)
# ---------------------------------------------------------------------------


def test_tfidf_matches_numpy(spark):
    """Exact parity with a python twin of the Spark ML IDF convention
    idf(b) = ln((m+1)/(df(b)+1)), tf from the same portable hash."""
    import math
    import re

    import numpy as np

    from sparkglm_spark.operators.dedup import (
        _SIMHASH_M,
        _SIMHASH_P,
        _SIMHASH_SEED,
    )
    from sparkglm_spark.operators.text import tfidf_vectors

    def py_hash(tok):
        h = _SIMHASH_SEED[0]
        for ch in tok:
            h = (h * _SIMHASH_M[0] + ord(ch)) % _SIMHASH_P
        return h

    rows = [
        (1, "the cat sat on the mat"),
        (2, "dog dog dog"),
        (3, "the dog chased the cat"),
        (4, "  "),   # no tokens -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: np.array(r["vector"])
        for r in tfidf_vectors(df, n_features=32, hash_fn="portable").collect()
    }
    assert set(got) == {1, 2, 3}

    tf = {}
    for doc_id, text in rows[:3]:
        v = np.zeros(32)
        for t in re.split(r"\s+", text.strip().lower()):
            v[py_hash(t) % 32] += 1
        tf[doc_id] = v
    m = len(tf)
    dfb = np.zeros(32)
    for v in tf.values():
        dfb += (v > 0)
    idf = np.array([math.log((m + 1) / (dfb[b] + 1)) for b in range(32)])
    for doc_id, v in tf.items():
        w = v * idf
        w = w / max(np.linalg.norm(w), 1e-12)
        assert np.allclose(got[doc_id], w, atol=1e-12), doc_id


def test_tfidf_downweights_ubiquitous_terms(spark):
    """A bucket present in every doc gets idf ln(1)=0 — the defining IDF
    property — while a rare bucket keeps weight."""
    import numpy as np

    from sparkglm_spark.operators.text import tfidf_vectors

    df = spark.createDataFrame(
        [(i, "common " + ("rare" if i == 0 else "filler")) for i in range(8)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: np.array(r["vector"])
        for r in tfidf_vectors(
            df, n_features=64, hash_fn="portable", l2_normalize=False
        ).collect()
    }
    # 'common' is in all 8 docs -> weight ~ ln(9/9) = 0 everywhere
    from sparkglm_spark.operators.dedup import (
        _SIMHASH_M,
        _SIMHASH_P,
        _SIMHASH_SEED,
    )

    def b_of(tok):
        h = _SIMHASH_SEED[0]
        for ch in tok:
            h = (h * _SIMHASH_M[0] + ord(ch)) % _SIMHASH_P
        return h % 64

    assert all(abs(v[b_of("common")]) < 1e-12 for v in got.values())
    assert got[0][b_of("rare")] > 0.5  # ln(9/2) ≈ 1.5


def test_tfidf_partition_invariance(documents):
    from sparkglm_spark.operators.text import tfidf_vectors

    a = {
        r["doc_id"]: tuple(r["vector"])
        for r in tfidf_vectors(documents.repartition(2), n_features=64).collect()
    }
    b = {
        r["doc_id"]: tuple(r["vector"])
        for r in tfidf_vectors(documents.repartition(9), n_features=64).collect()
    }
    assert a == b


def test_tfidf_empty_and_blank_corpora(spark):
    # r15: the fused m/df rollup emits NO grand-total row on empty input
    # (unlike a global aggregate) — m must default to 0, the old
    # countDistinct behavior, and the output stays an empty frame
    from sparkglm_spark.operators.text import tfidf_vectors

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert tfidf_vectors(empty, n_features=8).count() == 0
    blank = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string"
    )
    assert tfidf_vectors(blank, n_features=8).count() == 0
