"""Distributed global prefix sums (running totals over a TOTAL order).

Spark's own `Window.orderBy(...)` with no partition key collapses the whole
frame into ONE partition ("No Partition Defined" warning) — a scale-killer
for any running total over a large table. The classical two-phase fix used
here:

  1. `repartitionByRange(order_col)` — rows are range-partitioned, so
     partition p holds a contiguous key range and every partition can be
     cumulated independently,
  2. per-partition TOTALS (one tiny aggregate: ≤ n_partitions rows) are
     collected, their exclusive prefix is computed on the driver, and
     broadcast-joined back as a per-partition OFFSET,
  3. a `Window.partitionBy(pid).orderBy(order_col)` running sum + offset
     gives the exact global running sum with NO single-partition stage.

Rows with EQUAL keys: range partitioning never splits a key across
partitions, and the within-partition window orders by the same key, so ties
accumulate in one frame; `rows_mode="range"` (the default) makes the
running sum include ALL tied rows (the SQL `RANGE UNBOUNDED PRECEDING`
semantics — what rank statistics need); `"rows"` gives the positional
variant (nondeterministic across ties, only safe for unique keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkglm_spark.plans.caching import CacheRegistry

_CACHES = CacheRegistry()
_PID = "__prefix_pid"
_OFF = "__prefix_offset"


@_CACHES.scoped
def global_running_sum(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    num_partitions: int | None = None,
    rows_mode: str = "range",
) -> DataFrame:
    """Append `<v>_cum` (inclusive global running sum ordered by
    `order_col`) for each v in `value_cols`."""
    if rows_mode not in ("range", "rows"):
        raise ValueError("rows_mode must be 'range' or 'rows'")
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_part, F.col(order_col)).withColumn(
        _PID, F.spark_partition_id()
    )
    # cache: the ranged frame feeds both the totals probe and the output
    ranged = _CACHES.persist(ranged)
    totals = (
        ranged.groupBy(_PID)
        .agg(*[F.sum(F.col(v)).alias(v) for v in value_cols])
        .collect()
    )
    offsets: dict[int, dict[str, float]] = {}
    running = {v: 0.0 for v in value_cols}
    for row in sorted(totals, key=lambda r: r[_PID]):
        offsets[row[_PID]] = dict(running)
        for v in value_cols:
            running[v] += float(row[v] or 0.0)
    off_rows = [
        (pid, *[vals[v] for v in value_cols]) for pid, vals in offsets.items()
    ]
    off_schema = f"{_PID} int, " + ", ".join(f"{_OFF}_{v} double" for v in value_cols)
    off_df = df.sparkSession.createDataFrame(off_rows, off_schema)
    joined = ranged.join(F.broadcast(off_df), on=_PID, how="left")
    w = Window.partitionBy(_PID).orderBy(order_col)
    w = (
        w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        if rows_mode == "range"
        else w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for v in value_cols:
        out = out.withColumn(
            f"{v}_cum",
            F.sum(F.col(v)).over(w) + F.coalesce(F.col(f"{_OFF}_{v}"), F.lit(0.0)),
        )
    return out.drop(_PID, *[f"{_OFF}_{v}" for v in value_cols])
