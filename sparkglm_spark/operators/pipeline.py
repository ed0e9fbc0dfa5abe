"""End-to-end training-corpus preparation — the composition the individual
operators exist for, as one declarative DataFrame chain:

  1. exact dedup        content-fingerprint groupBy (keep min id)
  2. quality filter     composite quality score ≥ threshold (pure projection)
  3. language filter    stopword-profile language ID ∈ allowed set
  4. near-dup removal   MinHash+LSH pairs on the SURVIVOR set; of each
                        duplicate pair (id_a < id_b) the larger id is dropped

Every stage is shuffle-minimal: stages 2-3 are projections fused into one
scan, stage 1 shuffles (fingerprint, id) not text, stage 4 touches only LSH
candidates. The whole pipeline has an exact DuckDB oracle
(__spark_entry__.q_corpus_prep) — including the near-dup stage, since the
MinHash parameters make candidate recall ≈ 1 at the threshold.

Single-hop near-dup semantics: a doc is dropped iff it is the larger id of
at least one qualifying pair. This is the standard cheap policy (no
transitive closure — connected components would need an iterative join);
canonical docs are exactly those with no smaller near-duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkglm_spark.plans.caching import CacheRegistry

_CACHES = CacheRegistry()

from sparkglm_spark.operators.dedup import minhash_dedup_pairs
from sparkglm_spark.operators.text import (
    EN_STOPWORDS,
    bpe_token_count_expr,
)


def _quality_and_lang_cols(df: DataFrame, text_col: str) -> DataFrame:
    """Append n_tokens / quality_score / detected_lang (no joins, no
    shuffle) — same formulas, hence bit-identical values, as
    text.quality_score and text.language_id.

    The lowered token array is computed ONCE in a sub-projection and every
    count (n_tokens, EN stopword hits, all 5 language profiles) reads it —
    previously `split(trim(lower(text)))` appeared ~7× in the expression
    tree and only codegen subexpression elimination kept it from running
    7× per row. Sharing it explicitly makes the single-tokenize property
    structural instead of optimizer-dependent (measured A/B: warm runtime
    equal — CSE was indeed firing — so this is robustness, not a local
    speedup). CollapseProject keeps the shared array in its own Project
    because it is non-cheap and multiply referenced. Token boundaries are
    whitespace, so lowering first changes no count."""
    from sparkglm_spark.operators.text import LANG_PROFILES, tokens_expr

    t = F.col(text_col)
    df = df.withColumn("__lt", tokens_expr(F.lower(t)))
    lt = F.col("__lt")

    def lt_hits(words: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(lt, lambda x: F.array_contains(arr, x)))

    n_chars = F.length(t)
    n_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(lt))
    n_alpha = n_chars - F.length(F.regexp_replace(t, "[a-zA-Z]", ""))
    hits = lt_hits(EN_STOPWORDS)
    alpha_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        n_alpha.cast("double") / n_chars
    )
    stop_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n_tokens
    )
    score = F.when(
        # Explicit null-text guard: least() SKIPS nulls in both Spark and
        # DuckDB, so without it the len term silently becomes 1.0 for null
        # text and only the (null) alpha term saves the sum. Null score →
        # the >= min_quality filter drops the row, same as the oracle.
        t.isNotNull(),
        F.lit(0.4) * F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0)),
    )
    from sparkglm_spark.operators.text import _lang_pick_expr

    # same argmax struct as text._lang_argmax_struct, but each language's
    # hit count reads the shared token array instead of re-tokenizing
    langs = sorted(LANG_PROFILES)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    lt_hits(LANG_PROFILES[lg]).alias("h"),
                    F.lit(-i).alias("nidx"),
                )
                for i, lg in enumerate(langs)
            ]
        )
    )
    # guarded pick: null text → NULL lang, not the first sorted language
    pick = _lang_pick_expr(best, LANG_PROFILES)
    return df.withColumns(
        {
            "n_tokens": n_tokens.cast("bigint"),
            "n_tokens_bpe": bpe_token_count_expr(t).cast("bigint"),
            "quality_score": score,
            "detected_lang": pick,
        }
    ).drop("__lt")


@_CACHES.scoped
def prepare_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    languages: tuple[str, ...] | None = ("en",),
    neardup_threshold: float = 0.8,
    gopher_rules: dict | None = None,
) -> DataFrame:
    """The full corpus-prep chain; returns surviving docs with
    n_tokens / n_tokens_bpe / quality_score / detected_lang appended.

    `gopher_rules` (optional) prepends the Gopher quality gate
    (text.gopher_quality_filter) with the given threshold overrides —
    pass {} for the published defaults. It runs FIRST: a pure scan-side
    filter, so everything downstream (quality projection, dedup shuffles)
    touches only gate survivors. Like the quality filter, the gate is a
    pure per-row function of the text, so filter-then-dedup ≡
    dedup-then-filter holds for it too."""
    from sparkglm_spark.plans.partitioning import ensure_parallel

    if gopher_rules is not None:
        from sparkglm_spark.operators.text import gopher_quality_filter

        docs = gopher_quality_filter(docs, text_col, id_col, **gopher_rules)

    # quality/language are pure per-row functions of the text, so every
    # member of an identical-text duplicate group passes or fails together:
    # filter-then-dedup ≡ dedup-then-filter, EXACTLY. Run the regexp-heavy
    # projection on the (fanned-out) scan side so it parallelizes across
    # input splits instead of the post-shuffle partitioning (which AQE
    # coalesces to one task on small inputs); the dedup stage itself then
    # shuffles only (fingerprint, id) rows over quality survivors — the
    # text never enters its exchanges.
    q = _quality_and_lang_cols(ensure_parallel(docs), text_col).where(
        F.col("quality_score") >= min_quality
    )
    if languages:
        q = q.where(F.col("detected_lang").isin(list(languages)))
    # Persist the QUALITY SURVIVORS, not the dedup output: the fingerprint
    # keeper selection reads its input twice (drop-list pass + anti-join
    # side), and downstream the survivor set feeds the shingle scan and the
    # final anti-join — without the cache the regexp-heavy quality
    # projection would recompute per consumer. The (tiny) exact-dup drop
    # list is persisted too, so each consumer of `d2` pays only a broadcast
    # anti-join over the cached survivors — one corpus-sized cache total
    # instead of caching both q and the dedup output.
    q = _CACHES.persist(q)
    from sparkglm_spark.operators.dedup import _content_fp, _dedup_drop_list, _drop_keys

    exact_drop = _CACHES.persist(
        _dedup_drop_list(q, _content_fp(q, [text_col]), id_col)
    )
    d2 = _drop_keys(q, exact_drop, id_col, broadcast_drop_list=True)
    pairs = minhash_dedup_pairs(
        d2, id_col, text_col, threshold=neardup_threshold
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    # broadcast the (tiny) near-dup loser ids: without the hint the static
    # plan is a sort-merge anti-join that exchanges the full survivor rows
    # (text included) on id — the one shuffle this pipeline must not do
    return d2.join(F.broadcast(drop), id_col, "left_anti")
