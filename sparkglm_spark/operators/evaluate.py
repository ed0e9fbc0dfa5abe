"""Binary-classification evaluation over scored frames.

The reference stops at the fitted GLM (GLM.scala:35-51 exposes coefficients
and deviance; predict yields μ) — any user of its logistic models evaluates
them elsewhere. This module closes that loop Spark-side: threshold metrics,
proper scoring rules, tie-aware ROC-AUC, and calibration bins, all over a
(label, score) projection of an arbitrarily large scored frame.

Scale design:
- counts / confusion / log-loss / Brier ride ONE partial+final aggregation
  (no wide shuffle — 12 scalar sums).
- AUC uses the Mann-Whitney rank identity, NOT an all-pairs join:
  group by DISTINCT score (bounded by the score expression's domain; at
  worst one shuffle of (score, 2 longs)), then a global running sum via
  `plans.prefix.global_running_sum` — range-partitioned, per-partition
  windows only, never a single-partition Window.orderBy.
- nothing row-level is ever collected; the driver sees k scalar metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkglm_spark.plans.prefix import global_running_sum

# probability clamp for log-loss: scores at exactly 0/1 with the opposite
# label would yield -inf (the sklearn log_loss eps convention)
_EPS = 1e-15


# distinct-score row budget for the driver AUC/AP path: 1M (p, pos, neg)
# rows ≈ 24 MB on the wire — the same order as the dedup driver gate
# (driver_max_edges); natural score columns (calibrated probabilities,
# bounded-precision model outputs) stay far under it
_AUC_DRIVER_MAX_SCORES = 1_000_000


def _auc_ap_scalar(sc: DataFrame, n_pos: float, n_neg: float) -> tuple[float, float]:
    """Mann-Whitney U and step-rule average precision over the distinct-
    score table `sc` (__p, pos, neg) — two scalars out of a prefix scan.

    Cost-gated driver path (r14, the repo's standard bounded-probe idiom):
    a `limit(cap+1)` collect of the aggregated score table; when it fits,
    U/AP are one numpy cumsum over the sorted (pos, neg) counts — the
    whole computation after the groupBy is ONE job, no range exchange, no
    window. U is exact either way (every term is a half of a bounded
    integer, and so is every partial sum), so AUC is bit-identical to the
    distributed plan; AP reassociates float terms (≤ ulps — the final-
    aggregate merge order was already nondeterministic). Score tables
    over the gate (too many distinct scores to collect) keep the
    range-partitioned global_running_sum plan.

    A partition-once mapInPandas engine (the coxph shape) was tried and
    REJECTED here: with no iteration to amortize over, its two cache
    materializations + Arrow pass cost 3.0 s warm vs 1.3 s for the fused
    prefix chain at sf0.1 — the engine pays off only when the partition
    is reused across passes."""
    import numpy as np

    # persisted BEFORE the bounded probe (ADVICE r14): under the gate the
    # limit consumes every partition fully (rows < cap+1), so the cache
    # is complete and merely unused; over the gate the prefix plan reuses
    # what the probe cached instead of re-running the score aggregation.
    sc = sc.persist()
    try:
        # Arrow transfer, not .collect(): Row-object deserialization costs
        # ~1 s at the 150k-score mark (the _components_driver lesson)
        pdf = sc.limit(_AUC_DRIVER_MAX_SCORES + 1).toPandas()
        if len(pdf) <= _AUC_DRIVER_MAX_SCORES:
            order = np.argsort(pdf["__p"].to_numpy())
            pos = pdf["pos"].to_numpy()[order]
            neg = pdf["neg"].to_numpy()[order]
            # scores are distinct per row (groupBy key) → exclusive prefix =
            # strictly-below counts, ties stay within one term
            neg_lt = np.concatenate(([0.0], np.cumsum(neg)[:-1]))
            pos_lt = np.concatenate(([0.0], np.cumsum(pos)[:-1]))
            P, N = float(n_pos), float(n_neg)
            u = float(np.sum(pos * (neg_lt + neg / 2.0)))
            pos_ge = P - pos_lt
            neg_ge = N - neg_lt
            ap = float(np.sum((pos / P) * (pos_ge / (pos_ge + neg_ge))))
            return u, ap
        cum = global_running_sum(sc, "__p", ["pos", "neg"])
        # at-or-above counts from the ascending sums: ≥s = total − (<s)
        pos_ge = F.lit(n_pos) - (F.col("pos_cum") - F.col("pos"))
        neg_ge = F.lit(n_neg) - (F.col("neg_cum") - F.col("neg"))
        u_row = cum.agg(
            F.sum(
                F.col("pos")
                * (F.col("neg_cum") - F.col("neg") + F.col("neg") / 2.0)
            ).alias("u"),
            F.sum(
                (F.col("pos") / F.lit(n_pos)) * (pos_ge / (pos_ge + neg_ge))
            ).alias("ap"),
        ).collect()[0]
        return float(u_row["u"]), float(u_row["ap"])
    finally:
        sc.unpersist()


def binary_classification_eval(
    df: DataFrame,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Evaluate scores in [0, 1] against binary labels; returns a
    (metric string, value double) table:

      n, n_pos, n_neg, pos_rate
      auc                      — tie-aware Mann-Whitney:
                                 U = Σ_s pos_s·(neg_below(s) + neg_s/2),
                                 AUC = U/(P·N); NaN when P·N = 0
      avg_precision            — PR-AUC by the step rule (the sklearn
                                 average_precision definition, tie groups
                                 entering together): Σ_s (pos_s/P)·
                                 precision(≥s); rides the SAME ascending
                                 prefix-sum pass as the AUC (counts at or
                                 above s recovered as P − strictly-below);
                                 NaN when P·N = 0
      log_loss                 — −mean(y·ln p + (1−y)·ln(1−p)), p clamped
                                 to [1e-15, 1−1e-15]
      brier                    — mean((p − y)²)
      accuracy/precision/recall/f1 at `threshold` (score ≥ t ⇒ positive;
      precision/f1 NaN when nothing is predicted positive, recall NaN
      when P = 0 — the undefined cases, not silent zeros)

    Labels must be 0/1 (checked: any other value raises)."""
    y = F.col("__y")
    p = F.col("__p")
    base = df.select(
        F.col(label_col).cast("double").alias("__y"),
        F.col(score_col).cast("double").alias("__p"),
    )
    pc = F.least(F.greatest(p, F.lit(_EPS)), F.lit(1.0 - _EPS))
    pred_pos = (p >= F.lit(float(threshold))).cast("double")
    row = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos"),
        F.sum(F.lit(1.0) - y).alias("n_neg"),
        F.sum((y != 0.0).cast("int") * (y != 1.0).cast("int")).alias("bad"),
        F.sum(
            F.when(
                y.isNull() | p.isNull() | F.isnan(y) | F.isnan(p), 1
            ).otherwise(0)
        ).alias("nulls"),
        (-F.avg(y * F.log(pc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pc))).alias(
            "log_loss"
        ),
        F.avg((p - y) * (p - y)).alias("brier"),
        F.sum(pred_pos * y).alias("tp"),
        F.sum(pred_pos * (F.lit(1.0) - y)).alias("fp"),
        F.sum((F.lit(1.0) - pred_pos) * y).alias("fn"),
        F.sum((F.lit(1.0) - pred_pos) * (F.lit(1.0) - y)).alias("tn"),
    ).collect()[0]
    if row["nulls"]:
        raise ValueError(f"{row['nulls']} rows have null/NaN label/score")
    if row["bad"]:
        raise ValueError(f"labels must be 0/1 — {row['bad']} other values found")
    n = float(row["n"])
    n_pos, n_neg = float(row["n_pos"]), float(row["n_neg"])
    tp, fp, fn, tn = (float(row[c]) for c in ("tp", "fp", "fn", "tn"))
    nan = float("nan")
    precision = tp / (tp + fp) if tp + fp > 0 else nan
    recall = tp / n_pos if n_pos > 0 else nan
    f1 = (
        2.0 * precision * recall / (precision + recall)
        if precision == precision and recall == recall and precision + recall > 0
        else nan
    )

    if n_pos > 0 and n_neg > 0:
        # Mann-Whitney over distinct scores: |S| rows carry (score, P_s, N_s)
        sc = base.groupBy("__p").agg(
            F.sum(y).alias("pos"), F.sum(F.lit(1.0) - y).alias("neg")
        )
        u, avg_precision = _auc_ap_scalar(sc, n_pos, n_neg)
        auc = u / (n_pos * n_neg)
    else:
        auc = nan
        avg_precision = nan

    rows = [
        ("n", n),
        ("n_pos", n_pos),
        ("n_neg", n_neg),
        ("pos_rate", n_pos / n if n > 0 else nan),
        ("auc", auc),
        ("avg_precision", avg_precision),
        ("log_loss", float(row["log_loss"])),
        ("brier", float(row["brier"])),
        ("accuracy", (tp + tn) / n if n > 0 else nan),
        ("precision", precision),
        ("recall", recall),
        ("f1", f1),
    ]
    return df.sparkSession.createDataFrame(rows, "metric string, value double")


def regression_eval(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    approx_median: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Regression metrics over a scored frame — the `lm`/`quantile_lm`
    counterpart of `binary_classification_eval`; returns (metric, value):

      n, mse, rmse, mae
      median_ae      — exact percentile by default; `approx_median=True`
                       switches to the approx_percentile sketch (the exact
                       aggregate's buffer is unbounded over a continuous
                       error column at scale — same knob as
                       numeric_profile)
      bias           — mean(pred − y): systematic over/under-prediction
      r2             — 1 − Σe²/TSS (can be negative for a bad model)
      explained_variance — 1 − var(e)/var(y) (ignores bias, unlike r2)
      mape           — mean |e/y| over NONZERO labels (NaN when none;
                       the zero-label rows are excluded, the sklearn
                       epsilon-free convention, and n_nonzero_label is
                       reported so the exclusion is visible)
      n_nonzero_label

    ONE aggregation pass (the median rides the same job); nothing
    row-level collected. Labels/predictions must be non-null (checked)."""
    if accuracy < 1:
        raise ValueError("accuracy must be >= 1")
    y = F.col("__y")
    p = F.col("__p")
    base = df.select(
        F.col(label_col).cast("double").alias("__y"),
        F.col(pred_col).cast("double").alias("__p"),
    )
    e = p - y
    abs_e = F.abs(e)
    med = (
        F.percentile_approx(abs_e, F.lit(0.5), F.lit(int(accuracy)))
        if approx_median
        else F.percentile(abs_e, F.lit(0.5))
    )
    nz = (y != 0.0).cast("double")
    row = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                y.isNull() | p.isNull() | F.isnan(y) | F.isnan(p), 1
            ).otherwise(0)
        ).alias("nulls"),
        F.sum(e * e).alias("se2"),
        F.sum(abs_e).alias("sae"),
        F.sum(e).alias("se"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("sy2"),
        med.alias("med_ae"),
        F.sum(nz).alias("n_nz"),
        F.sum(F.when(y != 0.0, abs_e / F.abs(y)).otherwise(0.0)).alias("sape"),
    ).collect()[0]
    if row["nulls"]:
        raise ValueError(f"{row['nulls']} rows have null/NaN label/prediction")
    n = float(row["n"])
    if n == 0:
        raise ValueError("empty input")
    nan = float("nan")
    se2, sae, se = float(row["se2"]), float(row["sae"]), float(row["se"])
    sy, sy2 = float(row["sy"]), float(row["sy2"])
    n_nz = float(row["n_nz"])
    mse = se2 / n
    tss = sy2 - sy * sy / n
    var_e = se2 - se * se / n
    rows = [
        ("n", n),
        ("mse", mse),
        ("rmse", mse**0.5),
        ("mae", sae / n),
        ("median_ae", float(row["med_ae"])),
        ("bias", se / n),
        ("r2", 1.0 - se2 / tss if tss > 0 else nan),
        ("explained_variance", 1.0 - var_e / tss if tss > 0 else nan),
        ("mape", float(row["sape"]) / n_nz if n_nz > 0 else nan),
        ("n_nonzero_label", n_nz),
    ]
    return df.sparkSession.createDataFrame(rows, "metric string, value double")


def calibration_bins(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins over scores in [0, 1]: equal-width bins
    (score 1.0 folds into the top bin), each with its row count, mean
    score and empirical positive rate. One groupBy on an int key —
    `n_bins` groups, partial-agg map-side. A calibrated model has
    mean_score ≈ frac_pos per bin."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    y = F.col(label_col).cast("double")
    p = F.col(score_col).cast("double")
    bin_c = F.least(
        F.floor(p * F.lit(float(n_bins))).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.select(bin_c.alias("bin"), p.alias("__p"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__p").alias("mean_score"),
            F.avg("__y").alias("frac_pos"),
        )
        .orderBy("bin")
    )


def grouped_auc(
    df: DataFrame,
    group_col: str,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Tie-aware ROC-AUC per group (per-segment model monitoring):
    (group, n, n_pos, n_neg, auc). Degenerate groups (one class only)
    report NULL auc rather than a silent 0/1.

    Plan: ONE shuffle on (group, score) for the distinct-score counts,
    then a window PARTITIONED BY GROUP — there is no global order here,
    so the single-partition trap doesn't apply; every group cumulates in
    its own frame. The final per-group aggregate is partial-agg. Skewed
    groups cost what their distinct-score count costs — bounded by group
    size, never by the table."""
    from pyspark.sql import Window

    y = F.col(label_col).cast("double")
    sc = (
        df.select(F.col(group_col).alias("__g"), y.alias("__y"),
                  F.col(score_col).cast("double").alias("__p"))
        .groupBy("__g", "__p")
        .agg(F.sum("__y").alias("pos"), F.sum(F.lit(1.0) - F.col("__y")).alias("neg"))
    )
    w = Window.partitionBy("__g").orderBy("__p").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sc.withColumn("cumneg", F.sum("neg").over(w))
    out = cum.groupBy("__g").agg(
        (F.sum("pos") + F.sum("neg")).cast("bigint").alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(F.col("pos") * (F.col("cumneg") - F.col("neg") + F.col("neg") / 2.0)).alias("__u"),
    )
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("__u") / (F.col("n_pos") * F.col("n_neg")),
    )
    return (
        out.select(
            F.col("__g").alias(group_col), "n", "n_pos", "n_neg",
            auc.alias("auc"),
        )
        .orderBy(group_col)
    )


def lift_table(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Decile (n_bins-ile) lift and cumulative-gains table — "target the
    top k% by score, what fraction of responders do you reach?" (the
    campaign-targeting classic):

      bin            1 = highest scores … n_bins = lowest
      n, n_pos       rows / positives in the bin
      response_rate  n_pos/n
      lift           response_rate / overall positive rate
      cum_n, cum_pos running totals from bin 1
      cum_gain       cum_pos/P  (the gains-curve y-axis)
      cum_lift       cum_gain / (cum_n/N)

    Tie-aware binning: scores are grouped to DISTINCT values first and a
    whole tie group lands in the bin where its cumulative row count ends
    (ceil(n_bins·cum_n/N)) — a tie group spanning a bin boundary is never
    split (the deterministic convention). A huge tie group can leave
    earlier bins EMPTY; empty bins are PADDED with n = 0 rows carrying
    the running cumulative (so the output always has exactly n_bins rows
    and bins can be indexed positionally) with NULL response_rate/lift
    (0/0 is undefined, not zero).

    Plan: the same distinct-score + DESCENDING range-partitioned prefix
    pass the ROC uses, one groupBy(bin) (≤ n_bins groups), cumulative
    columns assembled on the driver from the ≤ n_bins partial rows —
    nothing row-level collected."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    base = df.select(
        F.col(label_col).cast("double").alias("__y"),
        F.col(score_col).cast("double").alias("__p"),
    )
    sc = base.groupBy("__p").agg(
        F.sum("__y").alias("pos"),
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum(
            F.when(
                F.col("__y").isNull() | F.isnan("__y"), 1
            ).otherwise(0)
        ).alias("nulls"),
    ).withColumn("__np", -F.col("__p"))
    # the distinct-score frame feeds both the totals probe and the prefix
    # pass — persist it (ReuseExchange does not fire across differing
    # prefix plans)
    sc = sc.persist()
    try:
        totals = sc.agg(
            F.sum("pos").alias("P"),
            F.sum("cnt").alias("N"),
            F.sum("nulls").alias("nulls"),
            F.sum(
                F.when(
                    F.col("__p").isNull() | F.isnan("__p"), F.col("cnt")
                ).otherwise(0.0)
            ).alias("null_scores"),
        ).collect()[0]
        if float(totals["nulls"] or 0) or float(totals["null_scores"] or 0):
            raise ValueError(
                "lift_table: null/NaN labels/scores present — clean the "
                "frame first (they would silently skew response rates)"
            )
        p_tot = float(totals["P"] or 0.0)
        n_tot = float(totals["N"])
        if n_tot == 0:
            raise ValueError("empty input")
        cum = global_running_sum(sc, "__np", ["cnt"])
        bin_c = F.least(
            F.ceil(F.col("cnt_cum") * F.lit(float(n_bins)) / F.lit(n_tot)).cast(
                "int"
            ),
            F.lit(n_bins),
        )
        parts = (
            cum.groupBy(bin_c.alias("bin"))
            .agg(F.sum("cnt").alias("n"), F.sum("pos").alias("n_pos"))
            .collect()
        )
    finally:
        sc.unpersist()
    overall = p_tot / n_tot
    by_bin = {int(r["bin"]): r for r in parts}
    rows = []
    cum_n = cum_pos = 0.0
    for b in range(1, n_bins + 1):
        r = by_bin.get(b)
        n = float(r["n"]) if r is not None else 0.0
        npos = float(r["n_pos"]) if r is not None else 0.0
        cum_n += n
        cum_pos += npos
        rate = npos / n if n > 0 else None
        rows.append(
            (
                b,
                int(n),
                int(npos),
                rate,
                (rate / overall if overall > 0 else float("nan"))
                if rate is not None
                else None,
                int(cum_n),
                int(cum_pos),
                cum_pos / p_tot if p_tot > 0 else float("nan"),
                ((cum_pos / p_tot) / (cum_n / n_tot) if p_tot > 0 else float("nan"))
                if cum_n > 0
                else None,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "bin int, n bigint, n_pos bigint, response_rate double, lift double, "
        "cum_n bigint, cum_pos bigint, cum_gain double, cum_lift double",
    )


def roc_points(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact ROC curve: one point per DISTINCT score s — the operating
    point of the classifier "predict positive iff score ≥ s":
    (score, tpr, fpr, precision). Rows ordered by descending score (the
    curve from (0,0) toward (1,1)).

    Plan: the same grouped-by-score frame as the AUC, with DESCENDING
    global prefix sums (cum pos/neg at-or-above each score) via the
    range-partitioned prefix plan on the negated score. |distinct scores|
    rows come back — cap downstream with a filter/sample if the score is
    continuous and the table is 100 TB; nothing here collects them."""
    y = F.col(label_col).cast("double")
    base = df.select(y.alias("__y"), F.col(score_col).cast("double").alias("__p"))
    sc = base.groupBy("__p").agg(
        F.sum("__y").alias("pos"), F.sum(F.lit(1.0) - F.col("__y")).alias("neg")
    ).withColumn("__np", -F.col("__p"))
    cum = global_running_sum(sc, "__np", ["pos", "neg"])
    totals = sc.agg(F.sum("pos").alias("P"), F.sum("neg").alias("N")).collect()[0]
    P, N = float(totals["P"]), float(totals["N"])
    if P == 0 or N == 0:
        raise ValueError("roc_points needs both classes present")
    return (
        cum.select(
            F.col("__p").alias("score"),
            (F.col("pos_cum") / F.lit(P)).alias("tpr"),
            (F.col("neg_cum") / F.lit(N)).alias("fpr"),
            (F.col("pos_cum") / (F.col("pos_cum") + F.col("neg_cum"))).alias(
                "precision"
            ),
        )
        .orderBy(F.col("score").desc())
    )


def fit_isotonic_calibration(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> "IsotonicCalibration":
    """Fit an isotonic (monotone non-decreasing) calibration map from raw
    scores to empirical probabilities — the non-parametric recalibrator
    (public convention: pool-adjacent-violators, Zadrozny & Elkan 2002;
    `calibration_bins` DIAGNOSES miscalibration, this FIXES it).

    Plan: scores collapse to distinct values first (one groupBy carrying
    (Σy, n) per score — the same reduction every rank operator here
    uses), then MLlib's `IsotonicRegression` runs its distributed
    parallel-PAV over the weighted distinct-score table: partial PAV per
    partition, merge at the driver — the standard scalable isotonic
    algorithm, state O(distinct scores) worst case and O(#pools) after
    pooling. Labels must be 0/1 and non-null/NaN (validated in the same
    reduction).

    Returns an `IsotonicCalibration` whose `transform(df)` appends
    `calibrated` via MLlib's interpolating piecewise-linear predictor
    (codegen-adjacent JVM path, no Python)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import IsotonicRegression

    y = F.col(label_col).cast("double")
    p = F.col(score_col).cast("double")
    agg = (
        df.select(y.alias("__y"), p.alias("__p"))
        .groupBy("__p")
        .agg(
            F.sum("__y").alias("sy"),
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(
                F.when(
                    F.col("__y").isNull() | F.isnan("__y"), 1
                ).otherwise(0)
            ).alias("nulls"),
            F.sum(
                ((F.col("__y") != 0.0) & (F.col("__y") != 1.0)).cast("int")
            ).alias("bad"),
        )
    )
    # the distinct-score reduction feeds the validation probe AND the
    # isotonic fit (both eager) — persist it for the pair (the lift_table
    # convention: ReuseExchange does not fire across differing plans)
    agg = agg.persist()
    try:
        chk = agg.agg(
            F.sum("nulls").alias("nulls"),
            F.sum("bad").alias("bad"),
            F.sum(
                # inf too: an infinite training score would land inf in the
                # knot table and silently break the upper edge clamp, while
                # transform() treats non-finite scores as invalid (NULL)
                F.when(
                    F.col("__p").isNull()
                    | F.isnan("__p")
                    | (F.abs("__p") == F.lit(float("inf"))),
                    1,
                ).otherwise(0)
            ).alias("badp"),
            F.count(F.lit(1)).alias("k"),
        ).collect()[0]
        if chk["nulls"] or chk["badp"]:
            raise ValueError(
                "null/NaN labels or non-finite scores present — clean the frame"
            )
        if chk["bad"]:
            raise ValueError("labels must be 0/1")
        if not chk["k"]:
            raise ValueError("empty input")
        weighted = agg.select(
            (F.col("sy") / F.col("n")).alias("rate"),
            F.col("__p").alias("score"),
            F.col("n").alias("w"),
        )
        iso = IsotonicRegression(
            featuresCol="features", labelCol="rate", weightCol="w", isotonic=True
        )
        va = VectorAssembler(inputCols=["score"], outputCol="features")
        model = iso.fit(va.transform(weighted))
    finally:
        agg.unpersist()
    return IsotonicCalibration(
        boundaries=model.boundaries.toArray(),
        predictions=model.predictions.toArray(),
        score_col=score_col,
    )


class IsotonicCalibration:
    """Fitted isotonic score→probability map (`fit_isotonic_calibration`).
    `boundaries`/`predictions` are the pooled knots (numpy arrays,
    O(#pools)) — the ENTIRE model state, so the calibrator persists
    through the engine's JSON model layout (`persist.save_model`, kind
    "isotonic") like every other fitted family."""

    def __init__(self, boundaries, predictions, score_col: str):
        import numpy as np

        self.boundaries = np.asarray(boundaries, dtype=np.float64)
        self.predictions = np.asarray(predictions, dtype=np.float64)
        if self.boundaries.shape != self.predictions.shape or not len(
            self.boundaries
        ):
            raise ValueError("boundaries/predictions must be equal-length, non-empty")
        self.score_col = score_col

    def transform(self, df: DataFrame, output_col: str = "calibrated") -> DataFrame:
        """Append the calibrated probability: linear interpolation between
        pool knots, clamped to the edge pools outside the fitted range —
        np.interp over the broadcast knot arrays in ONE vectorized Arrow
        pandas UDF (the probit-kernel pattern; knot count is unbounded by
        pooling, so a codegen CASE chain is not an option). Identical to
        MLlib's IsotonicRegressionModel interpolation (asserted in
        tests). Rows and columns pass through; a null/NaN score
        calibrates to NULL (the `grouped_predict` convention)."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import DoubleType

        bx, by = self.boundaries, self.predictions

        # no type hints: the module's `from __future__ import annotations`
        # turns them into strings pandas_udf cannot resolve at runtime
        @pandas_udf(DoubleType())
        def interp(col):
            import numpy as np

            x = col.to_numpy(dtype=np.float64, na_value=np.nan)
            out = np.interp(x, bx, by)
            out[~np.isfinite(x)] = np.nan
            return pd.Series(out).astype("Float64").mask(~np.isfinite(x))

        p = F.col(self.score_col).cast("double")
        valid = p.isNotNull() & ~F.isnan(p)
        return df.withColumn(
            output_col, F.when(valid, interp(p))
        )
