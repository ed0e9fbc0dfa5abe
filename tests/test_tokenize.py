"""WordPiece tokenizer vs a pure-python twin (the standard algorithm)."""

import pytest
from pyspark.sql import functions as F

from sparkglm_spark.operators.tokenize import (
    PAD_TOKEN,
    UNK_TOKEN,
    build_wordpiece_vocab,
    tokenize_wordpiece,
)


def test_tokenize_hand_vocab(spark):
    vocab = [PAD_TOKEN, UNK_TOKEN, "un", "##aff", "##able", "hello", "x", "##y"]
    df = spark.createDataFrame(
        [
            (1, "unaffable hello"),   # classic wordpiece example
            (2, "unaffablez"),        # unmatched tail -> whole word UNK
            (3, "xy xy"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tokenize_wordpiece(df, vocab).collect()}
    assert out[1]["token_ids"] == [2, 3, 4, 5]  # un ##aff ##able hello
    assert out[1]["n_unk"] == 0 and out[1]["n_tokens_wp"] == 4
    assert out[2]["token_ids"] == [1] and out[2]["n_unk"] == 1
    assert out[3]["token_ids"] == [6, 7, 6, 7]
    assert out[4]["token_ids"] is None and out[4]["n_unk"] is None
    # original columns ride through
    assert set(out[1].asDict()) == {
        "doc_id", "text", "token_ids", "n_tokens_wp", "n_unk"
    }


def py_wordpiece(text, vocab, lowercase=True, max_word_chars=64):
    index = {p: i for i, p in enumerate(vocab)}
    ids = []
    for w in (text.lower() if lowercase else text).split():
        if len(w) > max_word_chars:
            ids.append(index[UNK_TOKEN])
            continue
        start, out, n = 0, [], len(w)
        while start < n:
            end, cur = n, None
            while start < end:
                piece = w[start:end] if start == 0 else "##" + w[start:end]
                if piece in index:
                    cur = index[piece]
                    break
                end -= 1
            if cur is None:
                out = [index[UNK_TOKEN]]
                break
            out.append(cur)
            start = end
        ids.extend(out)
    return ids


def test_corpus_vocab_tokenizes_without_unk(documents):
    """A corpus-derived vocab (chars + top words) must tokenize its OWN
    corpus with zero unknowns — the char fallback guarantees it."""
    vocab = build_wordpiece_vocab(documents, vocab_size=2000)
    assert vocab[0] == PAD_TOKEN and vocab[1] == UNK_TOKEN
    assert len(vocab) == len(set(vocab)) <= 2000
    out = tokenize_wordpiece(documents, vocab)
    stats = out.agg(
        F.sum("n_unk").alias("unk"), F.sum("n_tokens_wp").alias("nt")
    ).collect()[0]
    assert stats["unk"] == 0 and stats["nt"] > 0
    # python-twin spot check on a sample
    sample = documents.limit(20).collect()
    got = {
        r["doc_id"]: r["token_ids"]
        for r in tokenize_wordpiece(documents.limit(20), vocab).collect()
    }
    for r in sample:
        assert got[r["doc_id"]] == py_wordpiece(r["text"], vocab), r["doc_id"]


def test_tokenize_partition_invariant_and_composes_with_pack(documents):
    from sparkglm_spark.operators.pack import pack_greedy

    vocab = build_wordpiece_vocab(documents, vocab_size=500)
    a = tokenize_wordpiece(documents.repartition(2), vocab)
    b = tokenize_wordpiece(documents.repartition(9), vocab)
    ka = sorted((r["doc_id"], tuple(r["token_ids"])) for r in a.collect())
    kb = sorted((r["doc_id"], tuple(r["token_ids"])) for r in b.collect())
    assert ka == kb
    # the end-to-end chain: ids -> budgeted packing over the REAL counts
    packed = pack_greedy(a, token_count_col="n_tokens_wp", budget=256)
    rows = packed.collect()
    assert rows
    # every pack respects the budget (oversized docs pack alone)
    from collections import defaultdict

    packs = defaultdict(int)
    for r in rows:
        packs[(r["bucket"], r["pack_id"])] += r["n_tokens"]
    wp = {r["doc_id"]: r["n_tokens_wp"] for r in a.collect()}
    for r in rows:
        assert r["n_tokens"] == wp[r["doc_id"]]  # packing saw the REAL counts
    for (b, p), tot in packs.items():
        members = [r for r in rows if r["bucket"] == b and r["pack_id"] == p]
        assert tot <= 256 or len(members) == 1


def test_vocab_determinism_and_validation(documents, spark):
    v1 = build_wordpiece_vocab(documents, vocab_size=300)
    v2 = build_wordpiece_vocab(documents, vocab_size=300)
    assert v1 == v2
    with pytest.raises(ValueError, match="vocab_size"):
        build_wordpiece_vocab(documents, vocab_size=2)
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="UNK"):
        tokenize_wordpiece(df, ["a", "b"])
    with pytest.raises(ValueError, match="unique"):
        tokenize_wordpiece(df, [UNK_TOKEN, "a", "a"])


def test_vocab_size_below_char_fallback_raises(documents):
    with pytest.raises(ValueError, match="char fallback"):
        build_wordpiece_vocab(documents, vocab_size=10)


def test_single_char_top_words_do_not_shrink_vocab(spark):
    """'a'/'i'-style top words are already in the char fallback; they must
    not consume limit slots (r6 review: limit-before-dedup silently
    returned fewer than vocab_size entries)."""
    rows = [(i, "a a a a i i i i word" + str(i % 3)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = build_wordpiece_vocab(df, vocab_size=30, min_freq=1)
    assert len(vocab) == min(30, len(set(vocab)))
    assert len(vocab) == len(set(vocab))
    # the multi-char words got the slots
    assert {"word0", "word1", "word2"} <= set(vocab)


def test_retokenize_collision_raises(documents):
    vocab = build_wordpiece_vocab(documents, vocab_size=200)
    once = tokenize_wordpiece(documents, vocab)
    with pytest.raises(ValueError, match="re-tokenizing"):
        tokenize_wordpiece(once, vocab)
