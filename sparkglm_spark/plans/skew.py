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
