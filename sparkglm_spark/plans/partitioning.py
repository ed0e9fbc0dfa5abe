"""Partitioning helpers shared by operators.

Spark sizes map-stage parallelism by input splits. Small inputs (one parquet
file → one task) serialize every downstream per-row computation onto a
single core, which is exactly wrong for compute-dense operators (shingling,
minhash, vectorized scans). `ensure_parallel` fans such inputs out to the
session's parallelism; at real scale inputs already have >> cores splits and
it is a no-op (no shuffle inserted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallel(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    has fewer partitions (tiny local inputs); no-op otherwise. Streaming
    frames are returned untouched (no .rdd access on a streaming plan)."""
    if df.isStreaming:
        return df
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        return df.repartition(ncores)
    return df
