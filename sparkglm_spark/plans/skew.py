"""Skew mitigation utilities.

AQE's skew-join handling (on by default in session.get_spark) is the first
line of defense — it splits oversized post-shuffle partitions at runtime.
`salted_join` is the explicit fallback for pathological key skew (one key
≫ a partition) or for engines/paths where AQE can't help (e.g., a skewed
aggregation key feeding a non-AQE stage): the skewed side gets a random
salt in [0, n_salt), the other side is replicated once per salt value, and
the join key becomes (key, salt) — spreading each hot key over n_salt tasks
at the cost of replicating the small side n_salt×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where `skewed`'s join keys are heavily skewed and `small`
    is modest (it is replicated n_salt×). Semantics identical to
    `skewed.join(small, on, how)` for inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = (F.rand(seed) * n_salt).cast("int")
    s = skewed.withColumn("__salt", salt)
    r = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return s.join(r, [*on, "__salt"], how).drop("__salt")


def key_skew_report(
    df: DataFrame, key_cols: list[str], top_n: int = 20
) -> DataFrame:
    """The measurement half of skew mitigation: per-key row counts for the
    `top_n` heaviest join/aggregation keys, with each key's share of all
    rows and its ratio to the MEAN key size — the number that predicts
    shuffle-partition blowup (a key at ratio r occupies ~r partitions'
    worth of one task). Run this before choosing between AQE's skew
    handling and `salted_join`; a top key under ~5× mean is AQE
    territory, orders of magnitude above it wants salting (and appears
    here long before the stage straggles).

    One partial-agg groupBy + a bounded top-n sort: the report is
    `top_n` rows regardless of corpus size — safe to `.collect()`."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("__t"), F.count(F.lit(1)).alias("__k")
    ).first()
    total, n_keys = (tot["__t"] or 0), (tot["__k"] or 0)
    mean = (total / n_keys) if n_keys else 0.0
    return (
        counts.orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(int(top_n))
        .select(
            *key_cols,
            "n_rows",
            (F.col("n_rows") / F.lit(float(total or 1))).alias("share"),
            (F.col("n_rows") / F.lit(float(mean or 1))).alias("ratio_to_mean"),
        )
    )
