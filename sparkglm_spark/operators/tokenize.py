"""WordPiece tokenization: text → token-id arrays at corpus scale — the
step that turns a curated corpus into model-ready sequences (compose with
`pack.pack_greedy(token_count_col=...)` and `io.write_training_shards`).

Design: the VOCABULARY is model state (like centroids/coefficients) —
built once with `build_wordpiece_vocab` (bounded aggregations, driver
holds only the vocab list) or loaded from any BERT-style vocab file, then
broadcast. Tokenization itself is a pure per-row function executed in one
Arrow-batched `mapInPandas` scan: ZERO shuffle, partition-invariant, and
the per-word greedy longest-match is the standard WordPiece algorithm
(Wu et al. 2016; continuation pieces prefixed "##"). Python executes the
match loop — the honest cost of a real tokenizer in this stack (the
production path would swap in a compiled tokenizer behind the same
column contract); everything around it stays JVM/Arrow.

Reference parity: the reference (alteryx/sparkGLM) has no text surface;
this extends the corpus family (SURVEY.md §2 extension ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK_TOKEN = "[UNK]"
PAD_TOKEN = "[PAD]"


def build_wordpiece_vocab(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 8000,
    min_freq: int = 2,
) -> list[str]:
    """A deterministic WordPiece-style vocabulary from the corpus itself:
    [PAD], [UNK], every single character seen in any word (whole-word and
    "##"-continuation form — the fallback that guarantees every word
    tokenizes without [UNK] unless it contains an unseen character), then
    the most frequent whole words down to `min_freq`, capped at
    `vocab_size` entries total. Ordering is (frequency desc, term asc) —
    a pure function of the corpus, reproducible anywhere.

    Cost model: one `vocab_stats` aggregation (distinct (term, doc) rows
    on the wire) + one char-level distinct — both bounded; the driver
    holds O(vocab_size) strings, never rows. This is the pragmatic
    top-K-words vocab (real BPE merge TRAINING is a driver-iterative
    algorithm outside this engine's scope); `tokenize_wordpiece` accepts
    any externally trained BERT-style vocab list unchanged."""
    from sparkglm_spark.operators.corpus import vocab_stats

    if vocab_size < 4:
        raise ValueError("vocab_size must leave room for specials + chars")
    stats = vocab_stats(docs, text_col=text_col, id_col=id_col)
    chars = sorted(
        r[0]
        for r in docs.select(
            F.explode(
                F.array_distinct(F.split(F.lower(F.col(text_col)), ""))
            ).alias("c")
        )
        .where(F.col("c") != "")
        .distinct()
        .collect()
        if not r[0].isspace()
    )
    base = [PAD_TOKEN, UNK_TOKEN] + chars + [f"##{c}" for c in chars]
    if vocab_size < len(base):
        # truncating the char fallback would silently void the zero-UNK
        # guarantee (words containing a dropped char collapse to [UNK])
        raise ValueError(
            f"vocab_size={vocab_size} cannot hold the char fallback "
            f"({len(base)} entries: specials + every corpus character in "
            "word-initial and '##' form); raise vocab_size or pre-filter "
            "the corpus's character set"
        )
    room = vocab_size - len(base)
    if room <= 0:
        return base
    # exclude base entries BEFORE the limit: a top-frequency single-char
    # word ('a', 'i') is already in the char fallback, and letting it eat
    # a limit slot would silently shrink the vocab below vocab_size
    words = [
        r["term"]
        for r in stats.where(
            (F.col("corpus_freq") >= min_freq)
            & ~F.col("term").isin(base)
        )
        .orderBy(F.col("corpus_freq").desc(), F.col("term").asc())
        .limit(room)
        .collect()
    ]
    return base + words


def _wordpiece_word(word: str, index: dict, max_word_chars: int) -> list[int]:
    """Greedy longest-match WordPiece of one word (standard algorithm):
    repeatedly take the longest vocab prefix (continuations carry '##');
    any unmatched position collapses the WHOLE word to [UNK]."""
    if len(word) > max_word_chars:
        return [index[UNK_TOKEN]]
    ids, start, n = [], 0, len(word)
    while start < n:
        end, cur = n, None
        while start < end:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            hit = index.get(piece)
            if hit is not None:
                cur = hit
                break
            end -= 1
        if cur is None:
            return [index[UNK_TOKEN]]
        ids.append(cur)
        start = end
    return ids


def tokenize_wordpiece(
    df: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    max_word_chars: int = 64,
) -> DataFrame:
    """Append `token_ids` (array<int>), `n_tokens_wp` and `n_unk` to every
    row: whitespace pre-split, then greedy longest-match WordPiece per
    word against the broadcast `vocab` (ids = positions in the list — the
    BERT vocab-file convention). One Arrow-batched mapInPandas over the
    scan: zero shuffle, deterministic, partition-invariant. `n_unk` is
    the quality signal (a high unknown rate means the vocab does not fit
    the corpus — gate on it before packing)."""
    if UNK_TOKEN not in vocab:
        raise ValueError(f"vocab must contain {UNK_TOKEN}")
    index = {p: i for i, p in enumerate(vocab)}
    if len(index) != len(vocab):
        raise ValueError("vocab entries must be unique")
    clash = {"token_ids", "n_tokens_wp", "n_unk"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already carries {sorted(clash)} — drop or rename them "
            "before re-tokenizing (e.g. after swapping vocabs)"
        )
    spark = df.sparkSession
    bidx = spark.sparkContext.broadcast(index)
    unk_sentinel = index[UNK_TOKEN]
    cols = df.columns
    out_schema = (
        ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols)
        + ", token_ids array<int>, n_tokens_wp int, n_unk int"
    )
    lower = lowercase
    mx = int(max_word_chars)

    def gen(batches):
        idx = bidx.value
        for pdf in batches:
            toks, nt, nu = [], [], []
            for t in pdf[text_col]:
                if t is None:
                    toks.append(None)
                    nt.append(None)
                    nu.append(None)
                    continue
                ids: list[int] = []
                for w in (t.lower() if lower else t).split():
                    ids.extend(_wordpiece_word(w, idx, mx))
                toks.append(ids)
                nt.append(len(ids))
                nu.append(sum(1 for i in ids if i == unk_sentinel))
            pdf = pdf.copy()
            pdf["token_ids"] = toks
            pdf["n_tokens_wp"] = nt
            pdf["n_unk"] = nu
            yield pdf

    return df.mapInPandas(gen, out_schema)
