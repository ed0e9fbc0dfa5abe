"""As-of (time-travel) join and point-in-interval range join.

The reference has no joins at all (alignment is positional `RDD.zip` —
LM.scala:145, utils.scala:87-89); these are the time-series operators a
training-data/event pipeline needs that Spark SQL also lacks as builtins,
implemented as scale-first compositions of existing DataFrame ops:

- `asof_join` — for each left row, the nearest right row at-or-before
  (backward) / at-or-after (forward) its timestamp, per key. Executed as
  UNION + one window pass: both tables shuffle ONCE on the key, a single
  partition-local sort orders (ts, side), and `last(..., ignorenulls)`
  carries the most recent right payload onto each left row. No join
  explosion, no per-row probing — the same plan Flink/kdb use for temporal
  joins. Cost at 100 TB: one co-partitioned sort-merge pass, skew handled
  by AQE like any keyed shuffle.

- `range_join_points` — match points to intervals (closed [start, end])
  via time bucketization: each interval explodes to the buckets it covers,
  each point lands in exactly ONE bucket, so the equi-join on
  (keys…, bucket) produces every true pair exactly once (no dedup pass)
  and never builds the cross product a naive θ-join plan would. Bucket
  width trades explode factor against join selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

_TS_TYPES = (TimestampType, TimestampNTZType)
_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _ts_num(c: Column, dtype) -> Column:
    """Timestamp-or-numeric → comparable numeric (µs for timestamps;
    numerics untouched — no precision-losing cast). NTZ converts via
    timestampdiff from the NTZ epoch — timezone-independent, unlike a
    cast through TIMESTAMP_LTZ."""
    if isinstance(dtype, TimestampNTZType):
        return F.timestamp_diff("MICROSECOND", F.expr(_NTZ_EPOCH), c)
    if isinstance(dtype, TimestampType):
        return F.unix_micros(c)
    return c


def _check_same_ts_class(a_name: str, a_type, b_name: str, b_type) -> None:
    """NTZ maps to wall-clock µs, LTZ to instant µs — mixing the two puts
    the sides in different frames and silently mismatches for any non-UTC
    data/session zone, so reject the combination outright."""
    a_ntz = isinstance(a_type, TimestampNTZType)
    b_ntz = isinstance(b_type, TimestampNTZType)
    a_ltz = isinstance(a_type, TimestampType)
    b_ltz = isinstance(b_type, TimestampType)
    if (a_ntz and b_ltz) or (a_ltz and b_ntz):
        raise TypeError(
            f"timestamp class mismatch: {a_name} is "
            f"{'TIMESTAMP_NTZ' if a_ntz else 'TIMESTAMP(LTZ)'} but {b_name} is "
            f"{'TIMESTAMP_NTZ' if b_ntz else 'TIMESTAMP(LTZ)'}; cast both to "
            "one class first (to_timestamp_ntz / to_utc_timestamp)"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    how: str = "left",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the nearest right row per key:
    `backward` → greatest right_ts ≤ left_ts; `forward` → least
    right_ts ≥ left_ts (exact-timestamp matches included in both);
    `nearest` → whichever of the two is closer in time, ties to the
    backward match (pandas merge_asof semantics). `nearest` keeps the
    single-shuffle union plan — the same keyed exchange feeds TWO window
    passes (ascending + descending sorts), then a per-row pick; no join
    node appears in any direction (plan-asserted).

    `right_cols`: payload columns pulled from the matched right row
    (default: all non-key, non-ts columns), appended as `<col><suffix>`
    plus `<right_ts><suffix>`. `tolerance_seconds` drops matches farther
    than the tolerance (seconds for timestamps, plain units for numeric
    ts); for `nearest` it masks each side before the pick. `how='left'`
    keeps unmatched left rows (null payload); `'inner'` drops them.

    Deterministic: right rows tied on (key, ts) resolve by greatest
    payload struct (documented, total order)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    lt_type = left.schema[left_ts].dataType
    rt_type = right.schema[right_ts].dataType
    _check_same_ts_class(f"left.{left_ts}", lt_type, f"right.{right_ts}", rt_type)

    # each side carries its payload as ONE struct column so the union is
    # narrow: (keys, ts, right-payload | left-row)
    r_payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    l_payload = F.struct(*[F.col(c).alias(c) for c in left.columns])
    p_type = right.select(r_payload.alias("__p")).schema["__p"].dataType
    l_type = left.select(l_payload.alias("__l")).schema["__l"].dataType
    r_side = right.select(
        *[F.col(k) for k in keys],
        _ts_num(F.col(right_ts), rt_type).alias("__t"),
        r_payload.alias("__p"),
        F.lit(None).cast(l_type).alias("__l"),
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        _ts_num(F.col(left_ts), lt_type).alias("__t"),
        F.lit(None).cast(p_type).alias("__p"),
        l_payload.alias("__l"),
    )

    # order so that at equal ts the right row is visible to the left row
    # (exact matches included): right (__p non-null) sorts first backward,
    # first in reverse forward. Ties among right rows: struct order, last
    # one wins → a total, partition-invariant order.
    def match_window(asc: bool):
        t_order = F.col("__t").asc() if asc else F.col("__t").desc()
        side_order = F.col("__p").isNull().cast("int").asc()  # right first
        # tie among right rows at the same (key, ts): ALWAYS ascending, so
        # the greatest payload struct sits last and running F.last picks
        # it — in BOTH directions. (r5 review: the old desc tie order on
        # the forward window made forward/nearest pick the SMALLEST
        # payload, contradicting the documented contract.)
        tie_order = F.col("__p").asc_nulls_first()
        return (
            Window.partitionBy(*keys)
            .orderBy(t_order, side_order, tie_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    unioned = r_side.unionByName(l_side)
    scale = 1e6 if isinstance(lt_type, _TS_TYPES) else 1.0
    tol = (
        None
        if tolerance_seconds is None
        else F.lit(tolerance_seconds * scale)
    )

    if direction == "nearest":
        # same keyed exchange, two sorts: the running backward and forward
        # matches, masked by tolerance, then a per-row pick (tie→backward)
        out = (
            unioned.withColumn(
                "__mb", F.last("__p", ignorenulls=True).over(match_window(True))
            )
            .withColumn(
                "__mf", F.last("__p", ignorenulls=True).over(match_window(False))
            )
            .where(F.col("__l").isNotNull())
        )
        if tol is not None:
            out = out.withColumn(
                "__mb",
                F.when(
                    F.col("__t") - _ts_num(F.col("__mb.__ts"), rt_type) <= tol,
                    F.col("__mb"),
                ),
            ).withColumn(
                "__mf",
                F.when(
                    _ts_num(F.col("__mf.__ts"), rt_type) - F.col("__t") <= tol,
                    F.col("__mf"),
                ),
            )
        db = F.col("__t") - _ts_num(F.col("__mb.__ts"), rt_type)
        df_ = _ts_num(F.col("__mf.__ts"), rt_type) - F.col("__t")
        out = out.withColumn(
            "__m",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(db <= df_, F.col("__mb"))
            .otherwise(F.col("__mf")),
        ).drop("__mb", "__mf")
    else:
        asc = direction == "backward"
        out = (
            unioned.withColumn(
                "__m", F.last("__p", ignorenulls=True).over(match_window(asc))
            )
            .where(F.col("__l").isNotNull())
        )
        if tol is not None:
            mt = _ts_num(F.col("__m.__ts"), rt_type)
            dist = (F.col("__t") - mt) if asc else (mt - F.col("__t"))
            out = out.withColumn("__m", F.when(dist <= tol, F.col("__m")))
    if how == "inner":
        out = out.where(F.col("__m").isNotNull())
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__m.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | str | None = None,
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Inner-join each point to every interval with
    start ≤ point_ts ≤ end (closed), optionally also matching key
    columns `on`. Plan: intervals explode to covered buckets (explode
    factor = span/bucket + 1), points map to exactly one bucket, hash
    equi-join on (keys…, bucket), then the exact containment filter —
    every true pair appears exactly once, so no dedup shuffle. Column
    collisions must be resolved by the caller (select/alias first)."""
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    pt_type = points.schema[point_ts].dataType
    st_type = intervals.schema[start_col].dataType
    et_type = intervals.schema[end_col].dataType
    if not isinstance(pt_type, (*_TS_TYPES, NumericType)):
        raise ValueError(f"unsupported point_ts type: {pt_type}")
    _check_same_ts_class(f"points.{point_ts}", pt_type, f"intervals.{start_col}", st_type)
    _check_same_ts_class(f"points.{point_ts}", pt_type, f"intervals.{end_col}", et_type)

    scale = 1e6 if isinstance(pt_type, _TS_TYPES) else 1.0
    width = float(bucket_seconds) * scale

    p_num = _ts_num(F.col(point_ts), pt_type)
    s_num = _ts_num(F.col(start_col), st_type)
    e_num = _ts_num(F.col(end_col), intervals.schema[end_col].dataType)

    p = points.withColumn("__bucket", F.floor(p_num / F.lit(width)))
    intervals = intervals.where(e_num >= s_num)  # sequence() needs start ≤ end
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(s_num / F.lit(width)), F.floor(e_num / F.lit(width))
            )
        ),
    )
    cond = [p["__bucket"] == iv["__bucket"]] + [p[k] == iv[k] for k in keys]
    joined = p.join(iv, cond, "inner").where(
        (p_num >= s_num) & (p_num <= e_num)
    )
    # project: all point columns + interval columns (minus dup keys/bucket)
    iv_cols = [c for c in intervals.columns if c not in keys]
    return joined.select(
        *[p[c] for c in points.columns],
        *[iv[c] for c in iv_cols],
    )
