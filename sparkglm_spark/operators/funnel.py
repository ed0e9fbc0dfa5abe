"""Ordered-sequence event analytics: conversion funnels and retention
cohorts — the product-analytics queries an event log exists to answer
(no reference counterpart; north-star extension like timeseries.py).

Both operators work over a NARROW pruned projection of the event log
(user, timestamp[, type]) — the predicate on the step types and the
column selection push down to the scan, so at 100 TB the working set is
the relevant slice, never the full rows. Every shuffle is keyed on
user_id or on tiny (cohort, offset) group keys; values/props/raw rows
never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkglm_spark.plans.caching import CacheRegistry

_CACHES = CacheRegistry()


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Users completing each prefix of an ordered step sequence:
    (step_idx, step, n_users). A user reaches step k iff they have a
    step-k event STRICTLY after their earliest completion time of step
    k−1 (the classic funnel semantics: ties do not advance — two events
    on the same timestamp are not evidence of ordering). Earliest
    completion times are used throughout, which maximizes downstream
    matches, so the count is the standard maximal-conversion funnel.

    Plan: the scan is filtered to the step types and pruned to
    (user, ts, type); step 1 is one groupBy(user) min, each later step
    one equi-join on user against the PERSISTED previous step's (user, t)
    relation + another groupBy(user) min — k−1 narrow-key joins for a
    k-step funnel, never a window over the whole log. Each step frame is
    persisted (CacheRegistry discipline): it is read twice — by the next
    step's join and by its own count arm — and without the cache every
    union arm re-derived the whole prefix chain (measured: 12 scans of
    the log for 3 steps; Spark's exchange-reuse does not fire across the
    differing prefix plans). With it, the log is scanned once per step
    and each count reads ~|users| cached narrow rows. The per-step counts
    are k tiny single-row aggregates unioned driver-side (plan
    composition, not data collection)."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError("steps must be distinct event types")
    with _CACHES.invocation():
        user, ts, typ = F.col(user_col), F.col(ts_col), F.col(type_col)
        ev = events.where(typ.isin(list(steps))).select(
            user.alias("__u"), ts.alias("__ts"), typ.alias("__ty")
        )
        cur = _CACHES.persist(
            ev.where(F.col("__ty") == steps[0])
            .groupBy("__u")
            .agg(F.min("__ts").alias("__t"))
        )
        per_step = [cur]
        for s in steps[1:]:
            nxt = _CACHES.persist(
                ev.where(F.col("__ty") == s)
                .join(cur.select("__u", F.col("__t").alias("__prev")), "__u")
                .where(F.col("__ts") > F.col("__prev"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
            per_step.append(nxt)
            cur = nxt
        counts = None
        for i, (s, frame) in enumerate(zip(steps, per_step)):
            row = frame.agg(
                F.count(F.lit(1)).alias("n_users")
            ).select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col("n_users"),
            )
            counts = row if counts is None else counts.unionByName(row)
        return counts


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit: str = "week",
) -> DataFrame:
    """Cohorted retention: users bucketed by their first-activity period
    (`unit`: 'week' or 'day'), counted in every later period they return —
    (cohort, offset, n_users) with offset in units since the cohort
    period (offset 0 = the cohort's own size). The retention-curve input
    every activation dashboard draws.

    Plan: one pruned (user, period) DISTINCT (collapses the log to at
    most users × periods narrow rows) — PERSISTED, because both the
    cohort assignment (groupBy(user) min) and the join read it, and
    without the cache each consumer re-scanned the log (exchange reuse
    does not fire across the two differing aggregation plans); then one
    user-key equi-join of those two small relations and a final
    (cohort, offset) count. The event log itself is scanned once."""
    if unit not in ("week", "day"):
        raise ValueError("unit must be 'week' or 'day'")
    days_per = 7 if unit == "week" else 1
    with _CACHES.invocation():
        period = F.date_trunc(unit, F.col(ts_col)).cast("date")
        act = _CACHES.persist(
            events.select(F.col(user_col).alias("__u"), period.alias("__p"))
            .distinct()
        )
        first = act.groupBy("__u").agg(F.min("__p").alias("cohort"))
        return (
            act.join(first, "__u")
            .select(
                "cohort",
                (F.datediff(F.col("__p"), F.col("cohort")) / days_per)
                .cast("int")
                .alias("offset"),
                "__u",
            )
            .groupBy("cohort", "offset")
            .agg(F.count(F.lit(1)).alias("n_users"))
        )
