"""Bucketed (co-located) joins: pre-shuffle once at write time, join with
no Exchange at read time.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides on
the key. Writing both tables bucketed by that key with the same bucket
count puts co-keyed rows in co-numbered files; Spark then plans a
SortMergeJoin with NO Exchange on either side (only per-bucket sorts).
This is the standard answer for repeated joins on a stable key (e.g.,
lineitem ⋈ orders on orderkey every query).

Requires a session with a warehouse dir (any SparkSession works — tables
register in the in-memory catalog; files live under
`spark.sql.warehouse.dir`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) parquet table.
    `path` makes it an external table (no warehouse dir needed —
    `spark.sql.warehouse.dir` is a static conf)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables previously written with `write_bucketed` on the same
    keys/bucket count: a sort-merge join with no shuffle Exchange on either
    side. The merge hint pins the strategy the utility exists for —
    fact⋈fact joins too big to broadcast (at toy scale the planner would
    otherwise pick broadcast and ignore the buckets)."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), on, how)
    )
