"""Event-stream operators: the same declarative core serves batch
(testdata `events` table) and Structured Streaming (readStream + watermark).

The transformation is a function DataFrame→DataFrame; in streaming mode the
caller supplies `readStream` input and gets watermark + append-mode-safe
windowed aggregation — identical results to the batch run over the same
data (event-time semantics, not arrival-time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _watermark_time(df: DataFrame, ts_col: str) -> Column:
    """Structured Streaming watermarks require TIMESTAMP (LTZ). Testdata
    event times are TIMESTAMP_NTZ; map NTZ wall-clock to the UTC instant
    with the same wall clock via pure µs arithmetic — timezone-independent,
    unlike a cast through the session zone."""
    c = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.timestamp_micros(
            F.timestamp_diff(
                "MICROSECOND", F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"), c
            )
        )
    return c


def _ntz_restore(col) -> Column:
    """Inverse of `_watermark_time`: LTZ instant → TIMESTAMP_NTZ carrying the
    instant's UTC wall clock (pure µs arithmetic, session-zone independent).
    Applied AFTER the stateful op so streaming outputs keep the batch NTZ
    type/values — without it, collected LTZ values render in the driver's OS
    zone and batch/stream results diverge on non-UTC hosts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add(
        "MICROSECOND", F.unix_micros(c), F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'")
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-event-type stats: count, distinct users, value
    sum/mean. Batch: plain window agg. Streaming: pass `watermark` (e.g.
    '2 hours') — late rows beyond it are dropped, enabling append output.

    distinct users uses approx_count_distinct in streaming mode (exact
    distinct needs the whole window state); exact in batch.
    """
    df = events
    streaming = df.isStreaming
    was_ntz = isinstance(df.schema[ts_col].dataType, TimestampNTZType)
    if streaming:
        if watermark is None:
            watermark = "2 hours"
        df = df.withColumn(ts_col, _watermark_time(df, ts_col))
        df = df.withWatermark(ts_col, watermark)
    uniq = (
        F.approx_count_distinct("user_id")
        if streaming
        else F.count_distinct("user_id")
    )
    # an NTZ input ran through the LTZ watermark mapping in streaming mode;
    # restore NTZ on the way out so both modes emit identical types/values.
    # An already-LTZ input needs NO restore — converting it would flip the
    # output type to NTZ and diverge from the batch twin.
    restore = streaming and was_ntz
    start = _ntz_restore(F.col("win.start")) if restore else F.col("win.start")
    end = _ntz_restore(F.col("win.end")) if restore else F.col("win.end")
    return (
        df.groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            uniq.alias("n_users"),
            F.sum("value").alias("value_sum"),
            F.avg("value").alias("value_avg"),
        )
        .select(
            start.alias("window_start"),
            end.alias("window_end"),
            "event_type",
            "n_events",
            "n_users",
            "value_sum",
            "value_avg",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session aggregation with a dynamic gap window (session_window) —
    works in batch and streaming (streaming requires a watermark set by the
    caller)."""
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


def user_running_totals(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user lifetime totals. Batch: plain groupBy aggregation (partial +
    final hash agg). For the streaming equivalent with explicit state, see
    `user_running_totals_stream`."""
    return events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
    )


def user_running_totals_stream(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState: keeps
    (n_events, value_sum) per user across micro-batches and emits the
    updated running totals each batch (output mode 'update').

    State is O(1) per user (two numbers), Arrow-batched per group — the
    pattern for any custom accumulator Structured Streaming's built-in aggs
    can't express. Converges to the batch `user_running_totals` result once
    the stream drains."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [s]}
        )

    return events.select(user_col, "value").groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, value_sum double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state_stream(
    events: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Streaming twin of `operators.timeseries.latest_state` (changelog
    compaction) via applyInPandasWithState.

    Per key the state is ONLY the current champion's order tuple —
    timestamps stored as epoch micros, so state stays a flat long/primitive
    struct. Each micro-batch reduces its rows to the batch champion
    (pandas lexicographic sort, the same max_by(struct) semantics as the
    batch twin), compares against state, and EMITS ONLY WHEN THE CHAMPION
    ADVANCES (output mode 'update'); the last update per key therefore
    equals the batch `latest_state` once the stream drains
    (stream-equivalence asserted in tests/test_streaming.py). No watermark
    is needed: champion advancement is monotone, so late rows can lose but
    never corrupt state; state is O(1) per key and never evicted —
    compaction state is the live-key set by definition.

    Order-column values must be non-null (same determinism contract as the
    batch twin: include a unique tiebreaker)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    if not key_cols or not order_cols:
        raise ValueError("key_cols and order_cols must be non-empty")

    in_fields = {f.name: f for f in events.schema.fields}
    missing = [
        c for c in key_cols + order_cols + value_cols if c not in in_fields
    ]
    if missing:
        raise ValueError(
            f"latest_state_stream: columns {missing} not in input schema "
            f"{sorted(in_fields)}"
        )
    out_cols = list(dict.fromkeys(key_cols + order_cols + value_cols))
    out_schema = StructType([in_fields[c] for c in out_cols])
    ts_like = (TimestampType, TimestampNTZType)
    is_ts = [isinstance(in_fields[c].dataType, ts_like) for c in order_cols]
    state_schema = StructType(
        [
            StructField(
                f"o{i}",
                LongType() if is_ts[i] else in_fields[c].dataType,
            )
            for i, c in enumerate(order_cols)
        ]
    )

    def _cmp_tuple(row) -> tuple:
        out = []
        for c, ts in zip(order_cols, is_ts):
            v = row[c]
            out.append(int(pd.Timestamp(v).value // 1000) if ts else v)
        return tuple(out)

    def update(key, pdfs, state: GroupState):
        best = None  # (cmp_tuple, row) champion within this batch
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_cols, kind="stable").iloc[-1]
            t = _cmp_tuple(cand)
            if best is None or t > best[0]:
                best = (t, cand)
        if best is None:
            return
        prev = tuple(state.get) if state.exists else None
        if prev is not None and best[0] <= prev:
            return  # champion did not advance — emit nothing
        state.update(best[0])
        row = best[1]
        data = {}
        for i, c in enumerate(out_cols):
            data[c] = [key[key_cols.index(c)] if c in key_cols else row[c]]
        yield pd.DataFrame(data)

    return (
        events.select(*out_cols)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def clicks_within_window_of_signup(
    clicks: DataFrame,
    signups: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Interval join: each click paired with the same user's signup when the
    click lands in [signup_ts, signup_ts + window] (closed). The SAME
    declarative join serves batch and stream-stream: with two streaming
    inputs, watermarks on both event-time columns bound the join state, so
    Spark can discard a signup once no click within `window` can still
    arrive — the state-cleanup contract a stream-stream join needs at scale.

    Batch twin of `operators/asof.range_join_points` on the same condition
    (equivalence asserted in tests/test_streaming.py)."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    s = signups.select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("signup_ts"),
    )
    c_restore = c.isStreaming and isinstance(
        c.schema["click_ts"].dataType, TimestampNTZType
    )
    s_restore = s.isStreaming and isinstance(
        s.schema["signup_ts"].dataType, TimestampNTZType
    )
    if c.isStreaming:
        c = c.withColumn("click_ts", _watermark_time(c, "click_ts"))
        c = c.withWatermark("click_ts", watermark)
    if s.isStreaming:
        s = s.withColumn("signup_ts", _watermark_time(s, "signup_ts"))
        s = s.withWatermark("signup_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("s_user"))
        & (F.col("click_ts") >= F.col("signup_ts"))
        & (F.col("click_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {window}"))
    )
    # restore NTZ only for inputs that WERE NTZ (see windowed_event_stats)
    click_out = _ntz_restore("click_ts") if c_restore else F.col("click_ts")
    signup_out = _ntz_restore("signup_ts") if s_restore else F.col("signup_ts")
    return c.join(s, cond, "inner").select(
        "click_id",
        "signup_id",
        F.col("c_user").alias("user_id"),
        click_out.alias("click_ts"),
        signup_out.alias("signup_ts"),
    )


def dedup_events_within_watermark(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """At-least-once → effectively-once: drop replayed events by id, keeping
    only ids first seen within the watermark horizon
    (`dropDuplicatesWithinWatermark`). State is one entry per id per
    watermark window and is EVICTED as the watermark advances — a plain
    streaming `dropDuplicates` would grow state forever on an unbounded
    stream. On a batch DataFrame the watermark API is unsupported
    (`dropDuplicatesWithinWatermark` raises in batch mode), so the batch
    twin is a plain `dropDuplicates(id_cols)` — same keep-one-per-id
    semantics over the full (bounded) input."""
    id_cols = id_cols or ["event_id"]
    out = events
    if not out.isStreaming:
        return out.dropDuplicates(id_cols)
    out = out.withColumn(ts_col, _watermark_time(out, ts_col))
    out = out.withWatermark(ts_col, watermark)
    out = out.dropDuplicatesWithinWatermark(id_cols)
    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        out = out.withColumn(ts_col, _ntz_restore(ts_col))
    return out


def stream_from_events_table(spark, sf_dir: str):
    """Streaming source over the events parquet (file micro-batches) — used
    by tests to prove the same core runs under readStream."""
    import os

    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return spark.readStream.schema(batch.schema).parquet(sf_dir + "/events.parquet")


def ewma_state_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming twin of `operators.timeseries.ewma_latest` (adjusted
    EWMA state per key) via applyInPandasWithState.

    The adjusted EWMA is exactly incrementally maintainable: with state
    (num, den) where s = num/den,

        fold x (newest):  num ← x + (1−α)·num,   den ← 1 + (1−α)·den

    so a micro-batch of m ordered rows folds VECTORIZED (batch partial
    weighted sums + one (1−α)^m decay of the carried state) — state per
    key is 2 doubles + 2 longs, O(1) forever, no eviction needed. Each
    batch EMITS the key's updated (n_events, ewma, last_ts) (output mode
    'update'); the last update per key equals the batch `ewma_latest`
    once the stream drains — asserted in tests/test_streaming.py over a
    multi-micro-batch replay.

    ORDER CONTRACT: rows are folded in (ts[, tiebreak]) order WITHIN each
    micro-batch, and in arrival order across batches. A row arriving
    after a later-ts row already folded is folded late (weighted as
    newest) — the standard streaming-EWMA caveat; use the batch
    `ewma_latest` for out-of-order backfills.

    NULL POLICY (family-wide — `operators.timeseries._drop_null_values`):
    rows with a null/NaN value are dropped before the fold, exactly as
    in the batch twin, so streaming ≡ batch holds on dirty data too."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha!r}")
    in_fields = {f.name: f for f in events.schema.fields}
    need = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    missing = [c for c in need if c not in in_fields]
    if missing:
        raise ValueError(
            f"ewma_state_stream: columns {missing} not in input schema "
            f"{sorted(in_fields)}"
        )
    out_schema = StructType(
        [
            in_fields[key_col],
            StructField("n_events", LongType()),
            StructField("ewma", DoubleType()),
            StructField("last_ts_micros", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("num", DoubleType()),
            StructField("den", DoubleType()),
            StructField("n", LongType()),
            StructField("last", LongType()),
        ]
    )
    decay = 1.0 - alpha
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    from sparkglm_spark.operators.timeseries import _drop_null_values

    events = _drop_null_values(events, F.col(value_col).cast("double"))

    def update(key, pdfs, state: GroupState):
        num, den, n, last = (
            tuple(state.get) if state.exists else (0.0, 0.0, 0, None)
        )
        # a group's micro-batch arrives as an ITERATOR of Arrow chunks
        # (~10k rows each): concatenate before sorting, or rows that cross
        # a chunk boundary out of (ts, tiebreak) order would fold
        # chunk-by-chunk and be weighted as newest — violating the
        # within-batch order contract below
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        m = len(x)
        w = decay ** np.arange(m - 1, -1, -1, dtype=np.float64)
        carry = decay**m
        num = float((w * x).sum()) + carry * num
        den = float(w.sum()) + carry * den
        n += m
        bt = int(pd.Timestamp(pdf[ts_col].iloc[-1]).value // 1000)
        last = bt if last is None else max(last, bt)
        state.update((num, den, n, last))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "ewma": [num / den],
                "last_ts_micros": [last],
            }
        )

    return (
        events.select(*dict.fromkeys(need))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def holt_state_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    tiebreak_col: str | None = None,
    phi: float = 1.0,
) -> DataFrame:
    """Streaming twin of `operators.timeseries.holt_forecast`'s end state
    (per-key Holt level + trend) via applyInPandasWithState.

    `phi` < 1 is the Gardner-McKenzie damped trend (see `holt_series`);
    the default φ=1 path multiplies by 1.0 — bit-identical to undamped
    Holt, so existing checkpointed streams continue exactly. The damped
    recursion stays an O(1)-state exact continuation: x₂ folds through
    the same one-step update as the batch loop's first iteration (with
    b₁ = x₂ − x₁ from the carried x₁), so a key whose first two rows
    arrive in different micro-batches lands on the batch trajectory at
    any φ.

    Holt's recursion is sequential, so each micro-batch's rows fold in
    (ts[, tiebreak]) order through the carried (level, trend, n) state —
    EXACT continuation of the batch recursion, including the simple
    initialization (b₁ = x₂ − x₁ is formed when the second observation
    arrives, then x₂ folds through the standard update — the batch
    loop's own first step), so a key whose first two rows arrive in
    DIFFERENT micro-batches still lands on the batch trajectory
    (asserted in tests). State per key: 2 doubles + 2 longs, O(1)
    forever.

    ORDER CONTRACT (same as `ewma_state_stream`): within a micro-batch
    rows fold in (ts, tiebreak) order across Arrow chunks; across
    batches in arrival order — late rows fold late; use the batch
    `holt_forecast` for out-of-order backfills.

    Emits the key's updated (n_events, level, trend, forecast_1 =
    level + trend, last_ts_micros) per micro-batch ('update' mode); the
    last update per key equals `holt_forecast` once the stream drains.

    NULL POLICY (family-wide — `operators.timeseries._drop_null_values`):
    rows with a null/NaN value are dropped before the fold — a null in
    one micro-batch no longer NaN-poisons the key's carried (level,
    trend) state for every later batch; streaming ≡ batch on dirty
    data."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha!r}")
    if not 0.0 < beta < 1.0:
        raise ValueError(f"beta must be in (0, 1), got {beta!r}")
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi!r}")
    in_fields = {f.name: f for f in events.schema.fields}
    need = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    missing = [c for c in need if c not in in_fields]
    if missing:
        raise ValueError(
            f"holt_state_stream: columns {missing} not in input schema "
            f"{sorted(in_fields)}"
        )
    out_schema = StructType(
        [
            in_fields[key_col],
            StructField("n_events", LongType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast_1", DoubleType()),
            StructField("last_ts_micros", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("lvl", DoubleType()),
            StructField("trd", DoubleType()),
            StructField("n", LongType()),
            StructField("last", LongType()),
        ]
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    from sparkglm_spark.operators.timeseries import _drop_null_values

    events = _drop_null_values(events, F.col(value_col).cast("double"))

    def update(key, pdfs, state: GroupState):
        lvl, trd, n, last = (
            tuple(state.get) if state.exists else (0.0, 0.0, 0, None)
        )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        for v in x:
            if n == 0:
                lvl, trd = float(v), 0.0
            elif n == 1:
                # simple init b₁ = x₂ − x₁ (lookahead), then x₂ folds
                # through the SAME one-step update as the batch loop's
                # first iteration — bitwise-equal to holt_forecast at any
                # φ (at φ=1 this lands on the (x₂, x₂−x₁) identity)
                b1 = float(v) - lvl
                prev = lvl
                lvl = alpha * float(v) + (1.0 - alpha) * (lvl + phi * b1)
                trd = beta * (lvl - prev) + (1.0 - beta) * (phi * b1)
            else:
                prev = lvl
                lvl = alpha * float(v) + (1.0 - alpha) * (lvl + phi * trd)
                trd = beta * (lvl - prev) + (1.0 - beta) * (phi * trd)
            n += 1
        bt = int(pd.Timestamp(pdf[ts_col].iloc[-1]).value // 1000)
        last = bt if last is None else max(last, bt)
        state.update((lvl, trd, n, last))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "level": [lvl],
                "trend": [trd],
                "forecast_1": [lvl + phi * trd],
                "last_ts_micros": [last],
            }
        )

    return (
        events.select(*dict.fromkeys(need))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def drift_state_stream(
    events: DataFrame,
    value_col: str,
    reference: dict,
    group_col: str | None = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Streaming twin of `operators.stats.distribution_drift` — the
    production drift monitor: PSI/JS of the LIVE stream's running
    distribution against a FIXED reference histogram, updated every
    micro-batch.

    `reference` is the dict `distribution_drift` returns (its `lo`,
    `hi`, `n_bins` and per-bin `p_ref` proportions are used), so the
    deployment story is: profile the training/reference frame once in
    batch, then monitor the serving stream against that snapshot.
    Because the bins are FIXED equal-width over [lo, hi] (exactly why
    `distribution_drift` requires fixed bounds for monitoring), the
    fold is exact: state is one bigint count per bin, micro-batch
    counts add (vectorized bincount per batch), and after any replay
    the metrics equal the batch `distribution_drift` over the union of
    the arrived data — asserted in tests. State per group: n_bins
    longs, O(1) forever.

    `group_col=None` monitors the whole stream (a single state task —
    fine for one metric; the per-batch work is a bincount). Pass
    `group_col` for per-segment monitors (each segment folds in
    parallel — the streaming face of `distribution_drift_grouped`).

    NULL POLICY (family-wide — `operators.timeseries._drop_null_values`):
    null/NaN values are dropped before binning, exactly as the batch
    operator excludes them from its bin counts.

    Emits (group?, n_cur, psi, js_divergence) per micro-batch in
    'update' mode."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if eps <= 0:
        raise ValueError("eps must be > 0")
    for key in ("lo", "hi", "n_bins", "bins"):
        if key not in reference:
            raise ValueError(
                "reference must be a distribution_drift() result dict "
                f"(missing {key!r})"
            )
    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    lo = float(reference["lo"])
    hi = float(reference["hi"])
    n_bins = int(reference["n_bins"])
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    p_ref = [0.0] * n_bins
    for b in reference["bins"]:
        p_ref[int(b["bin"])] = float(b["p_ref"])
    span = hi - lo
    in_fields = {f.name: f for f in events.schema.fields}
    need = ([group_col] if group_col else []) + [value_col]
    missing = [c for c in need if c not in in_fields]
    if missing:
        raise ValueError(
            f"drift_state_stream: columns {missing} not in input schema "
            f"{sorted(in_fields)}"
        )
    out_schema = StructType(
        ([in_fields[group_col]] if group_col else [])
        + [
            StructField("n_cur", LongType()),
            StructField("psi", DoubleType()),
            StructField("js_divergence", DoubleType()),
        ]
    )
    state_schema = StructType([StructField("counts", ArrayType(LongType()))])

    def update(key, pdfs, state: GroupState):
        counts = (
            np.array(state.get[0], dtype=np.int64)
            if state.exists
            else np.zeros(n_bins, dtype=np.int64)
        )
        got = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            got = True
            x = pdf[value_col].to_numpy(dtype=np.float64)
            # the batch operator's binning expression, replayed on the
            # same doubles: floor((x - lo) / (hi - lo) * n_bins), clamped
            b = np.floor((x - lo) / span * n_bins)
            b = np.clip(b, 0, n_bins - 1).astype(np.int64)
            counts += np.bincount(b, minlength=n_bins)
        if not got:
            return
        state.update(([int(c) for c in counts],))
        n_cur = float(counts.sum())
        psi = js = 0.0
        for i in range(n_bins):
            p = p_ref[i]
            q = counts[i] / n_cur
            ps, qs = max(p, eps), max(q, eps)
            psi += (ps - qs) * math.log(ps / qs)
            m = (p + q) / 2.0
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            if q > 0:
                js += 0.5 * q * math.log(q / m)
        row = {}
        if group_col:
            row[group_col] = [key[0]]
        row.update(n_cur=[int(n_cur)], psi=[psi], js_divergence=[js])
        yield pd.DataFrame(row)

    from sparkglm_spark.operators.timeseries import _drop_null_values

    clean = _drop_null_values(
        events.select(*dict.fromkeys(need)),
        F.col(value_col).cast("double"),
    )
    if group_col:
        # NULL group keys are dropped, matching the batch twin
        # (`distribution_drift_grouped` filters group_col.isNotNull())
        clean = clean.where(F.col(group_col).isNotNull())
        grouped = clean.groupBy(group_col)
    else:
        # a literal grouping EXPRESSION doesn't resolve through
        # applyInPandasWithState — materialize the dummy key as a column
        grouped = clean.withColumn("__g", F.lit(0)).groupBy("__g")
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def holt_winters_state_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    tiebreak_col: str | None = None,
    phi: float = 1.0,
    seasonal: str = "add",
) -> DataFrame:
    """Streaming twin of `operators.timeseries.holt_winters_forecast`'s
    end state (per-key level + trend + seasonal slots) via
    applyInPandasWithState. `phi` < 1 damps the trend (`_hw_fold`); the
    default φ=1 multiplies by 1.0 — bit-identical to classical HW, so
    checkpointed streams continue exactly.

    `seasonal="mul"` (r14) runs the multiplicative recursion — the SAME
    `_hw_fold` definition as batch. The batch whole-key NULL policy
    (any non-positive value, or the level collapsing to ≤ 0, nulls the
    key) maps to a POISON flag carried in state (the r13
    `forecast_accuracy_stream` NaN-poison pattern): once `_hw_fold`
    refuses, the key emits NULL level/trend/forecast_1 forever while
    `n_events` keeps counting — a batch re-run over the landed rows
    reports the same NULLs, so stream and batch agree on every key.
    (State gained a `bad` field in r14 — r13 checkpoints don't resume.)

    The classical init consumes the first 2·period observations, so the
    state BUFFERS values until 2·period have arrived, then initializes
    and replays the recursion over the buffer — from that point each
    micro-batch folds one value at a time through the carried (level,
    trend, season[period], phase) state, an EXACT continuation of the
    batch recursion (the same `_hw_fold` single definition runs both
    sides; asserted against `holt_winters_forecast` over a multi-batch
    ts-ordered replay in tests). State per key: period + a bounded
    2·period-value init buffer, O(period) forever.

    ORDER CONTRACT and NULL POLICY as `holt_state_stream` (rows fold in
    (ts, tiebreak) order within a batch, arrival order across batches;
    null/NaN values dropped before the fold).

    Emits (key, n_events, level, trend, forecast_1, last_ts_micros) per
    micro-batch ('update' mode); level/trend/forecast_1 are NULL until
    the key has seen 2·period values."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from sparkglm_spark.operators.timeseries import _drop_null_values, _hw_fold

    for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 < v < 1.0:
            raise ValueError(f"{name} must be in (0, 1), got {v!r}")
    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi!r}")
    if seasonal not in ("add", "mul"):
        raise ValueError(f"seasonal must be 'add' or 'mul', got {seasonal!r}")
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period!r}")
    m = int(period)
    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    in_fields = {f.name: f for f in events.schema.fields}
    need = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    missing = [c for c in need if c not in in_fields]
    if missing:
        raise ValueError(
            f"holt_winters_state_stream: columns {missing} not in input "
            f"schema {sorted(in_fields)}"
        )
    out_schema = StructType(
        [
            in_fields[key_col],
            StructField("n_events", LongType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast_1", DoubleType()),
            StructField("last_ts_micros", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("buf", ArrayType(DoubleType())),
            StructField("lvl", DoubleType()),
            StructField("trd", DoubleType()),
            StructField("season", ArrayType(DoubleType())),
            StructField("phase", LongType()),
            StructField("n", LongType()),
            StructField("inited", BooleanType()),
            StructField("last", LongType()),
            StructField("bad", BooleanType()),
        ]
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    events = _drop_null_values(events, F.col(value_col).cast("double"))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            buf, lvl, trd, season, phase, n, inited, last, bad = state.get
            buf = list(buf or [])
            season = list(season or [])
        else:
            buf, lvl, trd, season, phase, n, inited, last, bad = (
                [], None, None, [], 0, 0, False, None, False
            )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        xs = pdf[value_col].to_numpy(dtype=np.float64)
        n += len(xs)
        if bad:
            pass  # poisoned key: count rows, state stays NULL forever
        elif not inited:
            buf.extend(float(v) for v in xs)
            if len(buf) >= 2 * m:
                res = _hw_fold(
                    np.asarray(buf), alpha, beta, gamma, m, phi=phi,
                    seasonal=seasonal,
                )
                if res is None:  # mul refusal: poison (batch NULL policy)
                    buf, bad = [], True
                else:
                    lvl, trd, season, phase, *_ = res
                    buf, inited = [], True
        else:
            res = _hw_fold(
                xs, alpha, beta, gamma, m,
                state=(lvl, trd, season, phase), phi=phi,
                seasonal=seasonal,
            )
            if res is None:
                lvl, trd, season, phase, inited, bad = (
                    None, None, [], 0, False, True
                )
            else:
                lvl, trd, season, phase, *_ = res
        bt = int(pd.Timestamp(pdf[ts_col].iloc[-1]).value // 1000)
        last = bt if last is None else max(last, bt)
        state.update(
            (buf, lvl, trd, [float(s) for s in season], int(phase), n,
             inited, last, bad)
        )
        if not inited:
            fc1 = None
        elif seasonal == "mul":
            fc1 = (lvl + phi * trd) * season[phase % m]
        else:
            fc1 = lvl + phi * trd + season[phase % m]
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "level": [lvl],
                "trend": [trd],
                "forecast_1": [fc1],
                "last_ts_micros": [last],
            }
        )

    return (
        events.select(*dict.fromkeys(need))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _intermittent_state_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    method: str,
    alpha: float,
    beta: float,
    factor: float,
    tiebreak_col: str | None,
    interval: bool = False,
    level: float = 0.95,
) -> DataFrame:
    """Shared builder of `croston_state_stream`/`tsb_state_stream` (the
    `_intermittent_base` lesson: one scaffold, two folds). State per key
    is (z, p, q, n, nd, bad) — six scalars, O(1) forever: the batch
    folds are Markov in exactly that state, so replaying micro-batches
    in (ts[, tiebreak]) order reproduces the batch trajectory BIT-FOR-BIT
    (the fold runs the same scalar expressions in the same order; no
    vectorized re-association). A NEGATIVE demand permanently degrades
    its key (bad = 1): subsequent updates emit NULL state with
    n_periods still counting — the streaming face of the batch NULL
    policy (a batch re-run over the landed log reports the same NULLs).

    `interval=True` (r14 — the batch twins' interval surface): the
    state grows by the batch fold's (sse, m) error accumulators (still
    O(1); the accumulation is Markov too, so stream ≡ batch stays
    bit-exact) and each emit appends (se, lo, hi). The state schema
    changes ONLY when asked — interval=False checkpoints are untouched.

    ORDER CONTRACT + NULL POLICY: as `ewma_state_stream` (within-batch
    (ts, tiebreak) sort, arrival order across batches; null/NaN values
    dropped before the fold)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha!r}")
    if not 0.0 < beta < 1.0:
        raise ValueError(f"beta must be in (0, 1), got {beta!r}")
    if not 0.0 < level < 1.0:
        raise ValueError("level must be in (0, 1)")
    zq = None
    if interval:
        from sparkglm_spark.functions.special import norm_ppf

        zq = float(norm_ppf(0.5 + level / 2.0))
    in_fields = {f.name: f for f in events.schema.fields}
    need = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    missing = [c for c in need if c not in in_fields]
    if missing:
        raise ValueError(
            f"{method}_state_stream: columns {missing} not in input "
            f"schema {sorted(in_fields)}"
        )
    second = "interval" if method == "croston" else "probability"
    out_schema = StructType(
        [
            in_fields[key_col],
            StructField("n_periods", LongType()),
            StructField("n_demands", LongType()),
            StructField("size", DoubleType()),
            StructField(second, DoubleType()),
            StructField("forecast", DoubleType()),
        ]
        + (
            [
                StructField("se", DoubleType()),
                StructField("lo", DoubleType()),
                StructField("hi", DoubleType()),
            ]
            if interval
            else []
        )
    )
    state_schema = StructType(
        [
            StructField("z", DoubleType()),
            StructField("p", DoubleType()),
            StructField("q", LongType()),
            StructField("n", LongType()),
            StructField("nd", LongType()),
            StructField("bad", BooleanType()),
        ]
        + (
            [
                StructField("sse", DoubleType()),
                StructField("me", LongType()),
            ]
            if interval
            else []
        )
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    from sparkglm_spark.operators.timeseries import _drop_null_values

    events = _drop_null_values(events, F.col(value_col).cast("double"))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            st = tuple(state.get)
        else:
            st = (None, None, 0, 0, 0, False) + ((0.0, 0) if interval else ())
        z, p, q, n, nd, bad = st[:6]
        sse, me = (st[6], st[7]) if interval else (0.0, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        import numpy as np

        x = pdf[value_col].to_numpy(dtype=np.float64)
        n += len(x)
        if not bad and bool(np.any(x < 0.0)):
            bad = True
        if not bad:
            # the batch per_key fold's exact scalar expressions — same
            # order, bit-identical across the stream/batch boundary
            # (incl. the interval accumulators: error against the state
            # ENTERING each period, before its update)
            if method == "croston":
                for v in x:
                    if interval and z is not None:
                        e = float(v) - factor * z / p
                        sse += e * e
                        me += 1
                    q += 1
                    if v > 0.0:
                        nd += 1
                        if z is None:
                            z, p = float(v), float(q)
                        else:
                            z = alpha * float(v) + (1.0 - alpha) * z
                            p = alpha * float(q) + (1.0 - alpha) * p
                        q = 0
            else:
                for v in x:
                    if interval and z is not None:
                        e = float(v) - p * z
                        sse += e * e
                        me += 1
                    if z is None:
                        q += 1
                        if v > 0.0:
                            nd += 1
                            z, p = float(v), 1.0 / float(q)
                    else:
                        p = beta * (1.0 if v > 0.0 else 0.0) + (1.0 - beta) * p
                        if v > 0.0:
                            nd += 1
                            z = alpha * float(v) + (1.0 - alpha) * z
        state.update(
            (z, p, q, n, nd, bad) + ((sse, me) if interval else ())
        )
        if bad:
            out_nd, out_z, out_p, fc = None, None, None, None
        else:
            out_nd, out_z, out_p = nd, z, p
            if z is None:
                fc = None
            elif method == "croston":
                fc = factor * z / p
            else:
                fc = p * z
        row = {
            key_col: [key[0]],
            "n_periods": [n],
            "n_demands": [out_nd],
            "size": [out_z],
            second: [out_p],
            "forecast": [fc],
        }
        if interval:
            se = (
                float(np.sqrt(sse / (me - 1)))
                if (fc is not None and me >= 2)
                else None
            )
            row["se"] = [se]
            row["lo"] = [None if se is None else fc - zq * se]
            row["hi"] = [None if se is None else fc + zq * se]
        yield pd.DataFrame(row)

    return (
        events.select(*dict.fromkeys(need))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def croston_state_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.1,
    variant: str = "classic",
    tiebreak_col: str | None = None,
    interval: bool = False,
    level: float = 0.95,
) -> DataFrame:
    """Streaming twin of `operators.timeseries.croston_forecast` —
    per-key intermittent-demand state via applyInPandasWithState. The
    Croston fold is Markov in (z, p, q), so the stream reproduces the
    batch trajectory bit-for-bit when micro-batches arrive in time
    order (asserted in tests/test_streaming.py); each batch emits the
    key's updated (n_periods, n_demands, size, interval, forecast),
    output mode 'update'. A negative demand permanently NULL-degrades
    its key — the streaming face of the batch NULL policy.
    `interval=True` appends the batch twin's (se, lo, hi) — the (sse, m)
    accumulators join the state, still O(1) and stream ≡ batch."""
    if variant not in ("classic", "sba"):
        raise ValueError(f"variant must be 'classic' or 'sba', got {variant!r}")
    factor = 1.0 - alpha / 2.0 if variant == "sba" else 1.0
    # beta unused by the croston fold — pass a valid in-range dummy
    return _intermittent_state_stream(
        events, key_col, ts_col, value_col, "croston", alpha, 0.5,
        factor, tiebreak_col, interval=interval, level=level,
    )


def tsb_state_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.1,
    beta: float = 0.1,
    tiebreak_col: str | None = None,
    interval: bool = False,
    level: float = 0.95,
) -> DataFrame:
    """Streaming twin of `operators.timeseries.tsb_forecast`
    (Teunter-Syntetos-Babai obsolescence-aware intermittent demand) —
    per-key (z, p, q) state, every-period probability smoothing, output
    mode 'update'. Same contracts as `croston_state_stream` (incl. the
    `interval=True` (se, lo, hi) surface); the forecast p·z decays
    through a demand pause batch-by-batch, which is exactly the
    monitoring shape TSB exists for."""
    return _intermittent_state_stream(
        events, key_col, ts_col, value_col, "tsb", alpha, beta,
        1.0, tiebreak_col, interval=interval, level=level,
    )


def forecast_accuracy_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    actual_col: str,
    forecast_col: str,
    tiebreak_col: str | None = None,
    m: int = 1,
) -> DataFrame:
    """Streaming twin of `operators.timeseries.forecast_accuracy` — the
    LIVE model-quality monitor (each micro-batch emits every touched
    key's updated MAE/RMSE/MAPE/sMAPE/MASE over the whole stream so
    far; pair with `drift_state_stream` for the full scoring-health
    panel). State per key is eight scalars + the previous actual for
    the m = 1 naive denominator — O(1) forever; every metric is a
    ratio of RUNNING SUMS, so the only stream-vs-batch difference is
    float summation order (≲1e-15 relative; asserted at 1e-12 in
    tests).

    SEASONAL MASE (r13, VERDICT r12 #4): `m` > 1 scales by the lag-m
    seasonal naive, carried as an m-deep ring buffer of the last m
    actuals in the key state — m + 8 scalars + 3 grid trackers, still
    O(1) in stream LENGTH. The batch operator's r13 contiguity
    contract is replicated: the state tracks the running min/max lag-1
    ts spacing (prev_ts + two scalars), and a key whose retained rows
    ever leave a regular positive grid — a ts gap, a dropped-null
    hole, a duplicate timestamp — reports mase NULL from then on,
    never a phase-shifted number. Short keys (≤ m scored rows) are
    NULL via the empty naive sum, the batch convention. HAZARD: the
    spacing check sees rows in the family's processing order
    (within-batch ts sort, ARRIVAL order across batches) — feed
    ordered micro-batches, as every stream≡batch contract here
    already requires; a date-typed ts axis is checked on its day
    count like the batch twin.

    ORDER CONTRACT + NULL POLICY: as `ewma_state_stream` (within-batch
    (ts, tiebreak) sort, arrival order across batches; rows with a
    null/NaN actual OR forecast are dropped before scoring and do not
    anchor the naive lag — the batch convention)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    if not isinstance(m, int) or isinstance(m, bool) or m < 1:
        raise ValueError(f"m must be an int >= 1, got {m!r}")
    in_fields = {f.name: f for f in events.schema.fields}
    need = [key_col, ts_col, actual_col, forecast_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    missing = [c for c in need if c not in in_fields]
    if missing:
        raise ValueError(
            f"forecast_accuracy_stream: columns {missing} not in input "
            f"schema {sorted(in_fields)}"
        )
    out_schema = StructType(
        [
            in_fields[key_col],
            StructField("n", LongType()),
            StructField("mae", DoubleType()),
            StructField("rmse", DoubleType()),
            StructField("mape", DoubleType()),
            StructField("n_mape", LongType()),
            StructField("smape", DoubleType()),
            StructField("mase", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("sae", DoubleType()),
            StructField("sse", DoubleType()),
            StructField("sape", DoubleType()),
            StructField("n_mape", LongType()),
            StructField("ssm", DoubleType()),
            StructField("snd", DoubleType()),
            StructField("n_nd", LongType()),
            StructField("prev_y", DoubleType()),
        ]
    )
    if m > 1:
        from pyspark.sql.types import ArrayType

        # seasonal state: the ring buffer of the last ≤ m actuals plus
        # the grid trackers (prev_ts and the running lag-1 spacing
        # min/max — regularity is dt_min == dt_max > 0 at emit time,
        # so one bad spacing poisons the key permanently)
        state_schema = StructType(
            [
                StructField("n", LongType()),
                StructField("sae", DoubleType()),
                StructField("sse", DoubleType()),
                StructField("sape", DoubleType()),
                StructField("n_mape", LongType()),
                StructField("ssm", DoubleType()),
                StructField("snd", DoubleType()),
                StructField("n_nd", LongType()),
                StructField("tail", ArrayType(DoubleType())),
                StructField("prev_ts", DoubleType()),
                StructField("dt_min", DoubleType()),
                StructField("dt_max", DoubleType()),
            ]
        )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    ycol = F.col(actual_col).cast("double")
    fcol = F.col(forecast_col).cast("double")
    from sparkglm_spark.operators.timeseries import _drop_null_values

    events = _drop_null_values(_drop_null_values(events, ycol), fcol)

    def update(key, pdfs, state: GroupState):
        n, sae, sse, sape, n_mape, ssm, snd, n_nd, prev_y = (
            tuple(state.get)
            if state.exists
            else (0, 0.0, 0.0, 0.0, 0, 0.0, 0.0, 0, None)
        )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        y = pdf[actual_col].to_numpy(dtype=np.float64)
        f = pdf[forecast_col].to_numpy(dtype=np.float64)
        e = y - f
        m = len(y)
        n += m
        sae += float(np.abs(e).sum())
        sse += float((e * e).sum())
        nz = y != 0.0
        sape += float(np.abs(e[nz] / y[nz]).sum())
        n_mape += int(nz.sum())
        den = np.abs(y) + np.abs(f)
        ssm += float(
            np.where(den == 0.0, 0.0, 2.0 * np.abs(e) / np.where(den == 0.0, 1.0, den)).sum()
        )
        ylag = np.empty(m)
        ylag[0] = prev_y if prev_y is not None else np.nan
        ylag[1:] = y[:-1]
        nd = np.abs(y - ylag)
        good = ~np.isnan(nd)
        snd += float(nd[good].sum())
        n_nd += int(good.sum())
        prev_y = float(y[-1])
        state.update((n, sae, sse, sape, n_mape, ssm, snd, n_nd, prev_y))
        mae = sae / n
        naive = snd / n_nd if n_nd else None
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "mae": [mae],
                "rmse": [float(np.sqrt(sse / n))],
                "mape": [sape / n_mape if n_mape else None],
                "n_mape": [n_mape],
                "smape": [ssm / n],
                "mase": [
                    mae / naive if naive is not None and naive > 0.0 else None
                ],
            }
        )

    def update_seasonal(key, pdfs, state: GroupState):
        if state.exists:
            (n, sae, sse, sape, n_mape, ssm, snd, n_nd,
             tail, prev_ts, dt_min, dt_max) = tuple(state.get)
            tail = list(tail or [])
        else:
            n, sae, sse, sape, n_mape, ssm, snd, n_nd = 0, 0.0, 0.0, 0.0, 0, 0.0, 0.0, 0
            tail, prev_ts, dt_min, dt_max = [], None, None, None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        y = pdf[actual_col].to_numpy(dtype=np.float64)
        f = pdf[forecast_col].to_numpy(dtype=np.float64)
        e = y - f
        nb = len(y)
        n += nb
        sae += float(np.abs(e).sum())
        sse += float((e * e).sum())
        nz = y != 0.0
        sape += float(np.abs(e[nz] / y[nz]).sum())
        n_mape += int(nz.sum())
        den = np.abs(y) + np.abs(f)
        ssm += float(
            np.where(
                den == 0.0, 0.0,
                2.0 * np.abs(e) / np.where(den == 0.0, 1.0, den),
            ).sum()
        )
        # lag-m naive over [ring buffer ++ batch] — row i pairs with
        # ext[len(tail) + i − m]; indices < 0 are pre-history
        tail_arr = np.asarray(tail, dtype=np.float64)
        ext = np.concatenate([tail_arr, y])
        idx = len(tail_arr) + np.arange(nb) - m
        valid = idx >= 0
        if valid.any():
            snd += float(np.abs(y[valid] - ext[idx[valid]]).sum())
            n_nd += int(valid.sum())
        tail = [float(v) for v in ext[-m:]]
        # grid tracker: lag-1 ts spacings (within batch + the seam to
        # the previous batch), running min/max — the batch operator's
        # r13 contiguity check in streaming form
        sv = pdf[ts_col]
        if str(sv.dtype).startswith("datetime64") or sv.dtype == object:
            # epoch MICROS, floored in int64 BEFORE the float cast:
            # float64's ulp at 2026-era epoch NANOS is 256 ns, which
            # would make a perfectly regular ms grid look irregular
            # (review r13); micros stay < 2^53 and convert exactly —
            # the batch twin's unix_micros semantics
            ts_num = (
                pd.to_datetime(sv).astype("int64") // 1000
            ).to_numpy(dtype=np.float64)
        else:
            ts_num = sv.to_numpy(dtype=np.float64)
        dts = np.diff(ts_num)
        if prev_ts is not None:
            dts = np.concatenate([[ts_num[0] - prev_ts], dts])
        if len(dts):
            # np.min/max PROPAGATE NaN — a null-ts row (NaN after the
            # float conversion) must poison the tracker permanently,
            # not be swallowed by Python min/max's False NaN compares
            # (review r13): the batch twin's null-spacing census NULLs
            # such keys, and the ring buffer has already absorbed the
            # phantom position
            lo, hi = float(np.min(dts)), float(np.max(dts))
            if dt_min is None:
                dt_min, dt_max = lo, hi
            elif np.isnan(lo) or np.isnan(dt_min):
                dt_min = dt_max = float("nan")
            else:
                dt_min = min(dt_min, lo)
                dt_max = max(dt_max, hi)
        prev_ts = float(ts_num[-1])
        state.update(
            (n, sae, sse, sape, n_mape, ssm, snd, n_nd,
             tail, prev_ts, dt_min, dt_max)
        )
        mae = sae / n
        naive = snd / n_nd if n_nd else None
        grid_ok = dt_min is not None and dt_min == dt_max and dt_max > 0.0
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "mae": [mae],
                "rmse": [float(np.sqrt(sse / n))],
                "mape": [sape / n_mape if n_mape else None],
                "n_mape": [n_mape],
                "smape": [ssm / n],
                "mase": [
                    mae / naive
                    if naive is not None and naive > 0.0 and grid_ok
                    else None
                ],
            }
        )

    return (
        events.select(*dict.fromkeys(need))
        .groupBy(key_col)
        .applyInPandasWithState(
            update_seasonal if m > 1 else update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def ar_state_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    p: int = 1,
    horizons: list[int] = (1,),
    tiebreak_col: str | None = None,
    intercept: bool = True,
    interval: bool = False,
    level: float = 0.95,
    assume_contiguous: bool = False,
) -> DataFrame:
    """Streaming twin of `operators.timeseries.ar_forecast` — a LIVE
    per-key AR(p) model that refits from running sufficient statistics
    on every micro-batch (applyInPandasWithState).

    The batch operator's whole design carries over: the OLS normal
    equations are plain sums of lag products, and sums are EXACTLY
    incrementally maintainable — state per key is the O(p²) Gram sums
    + the last-p value ring (the lag seam across batches AND the
    forecast seed) + the 3 grid trackers, O(p²) forever regardless of
    stream length. Each batch emits the key's refit (same columns as
    the batch operator: n_events, n_fit, [intercept,] ar_1…ar_p,
    sigma2, forecast_<h>…[, se/lo/hi_<h>…]) via the SHARED
    `_ar_solve_from_sums` — one solve definition, zero logic drift.
    Stream-vs-batch differs only in float summation order (np pairwise
    per batch + carried state vs the batch aggregate) — asserted at
    1e-9 in tests.

    CONTIGUITY: the batch grid contract in streaming form (the
    `forecast_accuracy_stream(m>1)` tracker): running lag-1 ts-spacing
    min/max + the batch seam; one irregular spacing permanently fails
    the regularity check (a null datetime converts to an absurd
    sentinel spacing, a null numeric ts to NaN that min/max propagate —
    either way the key stays failed) and NULLs every later estimate,
    exactly like the batch guard. `assume_contiguous=True`
    skips it. ORDER CONTRACT and NULL POLICY follow the family
    (within-batch (ts[, tiebreak]) sort; null/NaN values drop before
    the fold — note a dropped interior row is a GAP the grid tracker
    then catches)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from sparkglm_spark.operators.timeseries import (
        _ar_solve_from_sums,
        _drop_null_values,
    )

    if not events.isStreaming:
        raise ValueError("input must be a streaming DataFrame (readStream)")
    if p < 1:
        raise ValueError(f"p must be >= 1, got {p!r}")
    if not horizons:
        raise ValueError("horizons must be non-empty")
    if any(int(h) < 1 for h in horizons):
        raise ValueError("horizons must be >= 1")
    if not 0.0 < level < 1.0:
        raise ValueError("level must be in (0, 1)")
    hs = [int(h) for h in horizons]
    zq = None
    if interval:
        from sparkglm_spark.functions.special import norm_ppf

        zq = float(norm_ppf(0.5 + level / 2.0))
    in_fields = {f.name: f for f in events.schema.fields}
    need = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    missing = [c for c in need if c not in in_fields]
    if missing:
        raise ValueError(
            f"ar_state_stream: columns {missing} not in input schema "
            f"{sorted(in_fields)}"
        )
    k = p + (1 if intercept else 0)
    out_fields = [
        in_fields[key_col],
        StructField("n_events", LongType()),
        StructField("n_fit", LongType()),
    ]
    if intercept:
        out_fields.append(StructField("intercept", DoubleType()))
    out_fields += [
        StructField(f"ar_{i}", DoubleType()) for i in range(1, p + 1)
    ]
    out_fields.append(StructField("sigma2", DoubleType()))
    out_fields += [
        StructField(f"forecast_{h}", DoubleType()) for h in hs
    ]
    if interval:
        for h in hs:
            out_fields += [
                StructField(f"se_{h}", DoubleType()),
                StructField(f"lo_{h}", DoubleType()),
                StructField(f"hi_{h}", DoubleType()),
            ]
    out_schema = StructType(out_fields)
    # sums layout: [s_y, s_yy, s_l1..s_lp, s_l1y..s_lpy, s_ll upper
    # triangle row-major] — 2 + 2p + p(p+1)/2 doubles
    n_sums = 2 + 2 * p + p * (p + 1) // 2
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("nf", LongType()),
            StructField("sums", ArrayType(DoubleType())),
            StructField("tail", ArrayType(DoubleType())),
            StructField("prev_ts", DoubleType()),
            StructField("dt_min", DoubleType()),
            StructField("dt_max", DoubleType()),
        ]
    )
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    events = _drop_null_values(events, F.col(value_col).cast("double"))
    p_, itc, hs_, iv_, chk = p, intercept, hs, interval, not assume_contiguous

    def update(key, pdfs, state: GroupState):
        if state.exists:
            n, nf, sums, tail, prev_ts, dt_min, dt_max = tuple(state.get)
            sums = np.array(sums, dtype=np.float64)
            tail = list(tail or [])
        else:
            n, nf = 0, 0
            sums = np.zeros(n_sums)
            tail, prev_ts, dt_min, dt_max = [], None, None, None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        )
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=np.float64)
        nb = len(x)
        # lag seam: rows see [ring ++ batch]; ext index i aligns with
        # the GLOBAL position whenever the ring is still short (n < p),
        # and is ≥ p for every new row once it is full — so "full lags
        # available" is exactly ext-index ≥ p in both regimes
        ext = np.concatenate([np.asarray(tail, dtype=np.float64), x])
        start = len(tail)
        idxs = np.arange(start, len(ext))
        valid = idxs[idxs >= p_]
        if len(valid):
            yv = ext[valid]
            lags = [ext[valid - j] for j in range(1, p_ + 1)]
            nf += len(valid)
            sums[0] += float(yv.sum())
            sums[1] += float((yv * yv).sum())
            for j in range(p_):
                sums[2 + j] += float(lags[j].sum())
                sums[2 + p_ + j] += float((lags[j] * yv).sum())
            pos = 2 + 2 * p_
            for i in range(p_):
                for j in range(i, p_):
                    sums[pos] += float((lags[i] * lags[j]).sum())
                    pos += 1
        n += nb
        tail = [float(v) for v in ext[-p_:]]
        if chk:
            sv = pdf[ts_col]
            if str(sv.dtype).startswith("datetime64") or sv.dtype == object:
                # int64 epoch MICROS before the float cast (the
                # forecast_accuracy_stream r13 ulp lesson)
                ts_num = (
                    pd.to_datetime(sv).astype("int64") // 1000
                ).to_numpy(dtype=np.float64)
            else:
                ts_num = sv.to_numpy(dtype=np.float64)
            dts = np.diff(ts_num)
            if prev_ts is not None:
                dts = np.concatenate([[ts_num[0] - prev_ts], dts])
            if len(dts):
                # np.min/max propagate NaN — a null-ts row poisons the
                # tracker permanently (the batch null-spacing census)
                lo, hi = float(np.min(dts)), float(np.max(dts))
                if dt_min is None:
                    dt_min, dt_max = lo, hi
                elif np.isnan(lo) or np.isnan(dt_min):
                    dt_min = dt_max = float("nan")
                else:
                    dt_min = min(dt_min, lo)
                    dt_max = max(dt_max, hi)
            prev_ts = float(ts_num[-1])
        state.update(
            (n, nf, [float(v) for v in sums], tail, prev_ts, dt_min, dt_max)
        )
        grid_ok = (not chk) or (
            dt_min is not None and dt_min == dt_max and dt_max > 0.0
        )
        sol = None
        if grid_ok and nf >= k:
            s_l = sums[2:2 + p_]
            s_ly = sums[2 + p_:2 + 2 * p_]
            s_ll = np.empty((p_, p_))
            pos = 2 + 2 * p_
            for i in range(p_):
                for j in range(i, p_):
                    s_ll[i, j] = s_ll[j, i] = sums[pos]
                    pos += 1
            sol = _ar_solve_from_sums(
                nf, float(sums[0]), float(sums[1]), s_l, s_ly, s_ll,
                tail, p_, itc, hs_, iv_, zq,
            )
        row = {key_col: [key[0]], "n_events": [n], "n_fit": [nf]}
        if itc:
            row["intercept"] = [sol["c0"] if sol else None]
        for i in range(1, p_ + 1):
            row[f"ar_{i}"] = [sol["phi"][i - 1] if sol else None]
        row["sigma2"] = [sol["sig2"] if sol else None]
        for h in hs_:
            row[f"forecast_{h}"] = [sol["fcs"][h - 1] if sol else None]
        if iv_:
            for h in hs_:
                se, lo_, hi_ = sol["ses"][h] if sol else (None, None, None)
                row[f"se_{h}"] = [se]
                row[f"lo_{h}"] = [lo_]
                row[f"hi_{h}"] = [hi_]
        yield pd.DataFrame(row)

    return (
        events.select(*dict.fromkeys(need))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
