"""Sequence packing: group documents into fixed token-budget packs for
LLM training batches.

Two strategies, both deterministic and partition-invariant (pack
membership is a pure function of (doc ids, budget, n_buckets) — the
property that makes a 100 TB packing job re-runnable and auditable):

- `pack_cumulative` — contiguous token-budget chunking, pure window
  arithmetic (JVM codegen end to end, SQL-oracle-able). Docs are routed
  to `n_buckets` independent streams by a portable hash of the id,
  ordered by id within the bucket, and cut at budget boundaries of the
  running token count: pack = floor(exclusive_cumsum / budget). A pack's
  total may overshoot the budget by (last doc − 1) tokens — the standard
  concat-then-chunk regime where the tokenizer stream is split at the
  context-window boundary downstream.
- `pack_greedy` — strict-cap greedy next-fit (never exceeds the budget
  unless a single doc alone does), sequential per bucket inside an
  Arrow-batched `applyInPandas`. Use when packs must be hard-capped
  (padding-based batching without truncation).

Scale shape: ONE shuffle (repartition by bucket), then a per-bucket sort
— never a global sort. `n_buckets` is the parallelism unit: size it so a
bucket's docs fit one task comfortably (ids are hash-routed, so bucket
sizes are balanced by construction). Token counts ride as one long per
doc; text never shuffles when `token_count_col` is precomputed.

The reference (alteryx/sparkGLM) has no packing surface; this is part of
the LLM-data-pipeline extension ops (SURVEY.md §7 phase 4).
"""

from __future__ import annotations



import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkglm_spark.operators.split import hash_sample_expr
from sparkglm_spark.operators.text import token_count_expr


def _with_tokens_and_bucket(
    df: DataFrame,
    id_col: str,
    text_col: str,
    token_count_col: str | None,
    n_buckets: int,
) -> DataFrame:
    # bucket routing and pack ordering are defined over integer ids; a
    # string id would NULL-route every doc into one bucket (or fail deep
    # in the job under ANSI) — fail at plan time instead
    from sparkglm_spark.plans.partitioning import require_integral_id

    require_integral_id(df, id_col, "sequence packing")
    tokens = (
        F.col(token_count_col)
        if token_count_col
        else token_count_expr(F.col(text_col))
    ).cast("long")
    # portable affine hash -> bucket: reproducible in any SQL engine, so
    # the routing (not just the totals) is oracle-checkable
    bucket = F.pmod(hash_sample_expr(id_col), F.lit(n_buckets))
    return df.select(
        F.col(id_col).cast("long").alias(id_col),
        tokens.alias("n_tokens"),
        bucket.cast("long").alias("bucket"),
    )


def pack_cumulative(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    budget: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Contiguous token-budget packing: returns one row per doc with
    (id, bucket, n_tokens, pack_id, pack-local offset_tokens).

    pack_id = floor(exclusive running token sum / budget) within the
    bucket's id-ordered stream; offset_tokens is the doc's start position
    inside its pack's token stream. Zero Python in the plan — one window
    over the bucket partitioning."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    base = _with_tokens_and_bucket(df, id_col, text_col, token_count_col, n_buckets)
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(excl / F.lit(budget)).cast("long").alias("pack_id"),
        F.pmod(excl, F.lit(budget)).cast("long").alias("offset_tokens"),
    )


def pack_stats(packed: DataFrame) -> DataFrame:
    """Per-(bucket, pack_id) summary of a packing: n_docs, pack_tokens,
    first/last doc id. One aggregation on the already-bucketed frame."""
    return packed.groupBy("bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min(packed.columns[0]).alias("first_doc"),
        F.max(packed.columns[0]).alias("last_doc"),
    )


def pack_greedy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    budget: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Strict-cap greedy NEXT-fit packing: scan the bucket's id-ordered
    docs keeping a single open pack, close it whenever adding the next doc
    would exceed `budget`; an oversized doc (> budget) gets a pack of its
    own. Earlier packs with leftover capacity are never revisited (that
    would be first-fit — denser, but order-destroying and state-heavy;
    next-fit preserves doc order within packs, the property training
    pipelines want). Returns (id, bucket, n_tokens, pack_id).

    Sequential by construction, so it runs per bucket inside
    `applyInPandas` (Arrow batches; only (id, tokens, bucket) rows reach
    Python — ~16 bytes/doc, not text)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    base = _with_tokens_and_bucket(df, id_col, text_col, token_count_col, n_buckets)

    def pack_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        pack_ids = []
        pack, acc = 0, 0
        for t in pdf["n_tokens"]:
            if acc > 0 and acc + t > budget:
                pack += 1
                acc = 0
            pack_ids.append(pack)
            acc += int(t)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf

    from sparkglm_spark.plans.partitioning import fanout_groups

    return fanout_groups(base, ["bucket"]).groupBy("bucket").applyInPandas(
        pack_one, schema=f"{id_col} long, n_tokens long, bucket long, pack_id long"
    )
