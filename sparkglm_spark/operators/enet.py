"""Elastic-net / lasso linear regression — L1(+L2)-penalized OLS with the
MLlib `LinearRegression(regParam, elasticNetParam)` objective, fit by
cyclic coordinate descent over the SAME one-pass Gram statistics the OLS
family uses (plans/gram.py).

Objective (matching MLlib, `standardize=True` default):

    min_β  1/(2n)·Σᵢ(yᵢ − β₀ − xᵢ'β)²  +  λ·(α·‖θ‖₁ + (1−α)/2·‖θ‖²)

where θⱼ = βⱼ·σⱼ/σ_y are the coefficients of the centered/standardized
problem (sample std, n−1) and λ is `reg_param`, α `elastic_net_param`
(1 = lasso, 0 = ridge). With `standardize=False` the penalty applies to
the raw β instead (MLlib's `standardization=false`):
λ·(α·Σ|βⱼ| + (1−α)/2·Σβⱼ²). Both reduce to per-coordinate
(λ1ⱼ, λ2ⱼ) pairs on the standardized problem — the solver is one loop.

Scale story (the whole point): the DATA pass is exactly one Gram
aggregation — k(k+1)/2 + k + 3 sums through Catalyst partial+final
aggregation, identical to `LM.fit`'s plan at any data size. Every
coordinate-descent sweep after that is O(k²) DRIVER arithmetic on the
k×k Gram; λ paths and cross-validation reuse the same statistics
(Gram additivity), so a 100-λ CV path over 100 TB still costs one
aggregation job (per fold-grouping, see `elastic_net_cv`).

The reference has no penalized fitter; this extends its LM family
(LM.scala:16-25) the same way ridge did, toward MLlib
`LinearRegression` parity (golden-tested against it)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkglm_spark.plans.gram import gram_aggregate
from sparkglm_spark.operators.lm import (
    _encode_formula,
    check_weight_domain,
    prediction_over_raw,
)


def _cd_enet(
    xtx: np.ndarray,
    xty: np.ndarray,
    n: int,
    sum_y: float,
    sum_y2: float,
    x_cols: list[str],
    reg_param: float,
    elastic_net_param: float,
    standardize: bool,
    max_sweeps: int,
    tol: float,
    exact_sweeps: int | None,
    col_sums: np.ndarray | None = None,
    theta0: np.ndarray | None = None,
    return_theta: bool = False,
    sum_w: float | None = None,
):
    """Cyclic coordinate descent on the centered/standardized problem,
    entirely from Gram sufficient statistics. Returns (beta in ORIGINAL
    scale and `x_cols` order, sweeps, converged, sse).

    Per-coordinate update (soft-threshold):
        ρⱼ = (bⱼ − Σ_{k≠j} Aⱼₖθₖ)/n
        θⱼ ← S(ρⱼ, λ1ⱼ) / (Aⱼⱼ/n + λ2ⱼ)
    with A = X̂'X̂, b = X̂'ŷ assembled from the raw Gram via
    Aⱼₖ = (Gⱼₖ − n·mⱼ·mₖ)/(σⱼσₖ). `exact_sweeps=N` runs exactly N
    cyclic sweeps from θ = 0 with no convergence test (deterministic
    trajectory — the oracle-pin hook, same convention as the GLM/Cox/AFT
    fixed-iteration kernels). With `sum_w` the statistics are the
    W-weighted ones (xtx = X'WX, xty = X'Wy, sum_y = Σwy, …) and every
    statistical n becomes Σw — the MLlib weightCol convention (probed
    exact: population stds over Σw, objective 1/(2Σw))."""
    has_int = "intercept" in x_cols
    i0 = x_cols.index("intercept") if has_int else None
    feats = [i for i in range(len(x_cols)) if i != i0]
    p = len(feats)
    lam = float(reg_param)
    alpha = float(elastic_net_param)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("elastic_net_param must be in [0, 1]")
    if lam < 0.0:
        raise ValueError("reg_param must be >= 0")

    # MLlib LinearRegression scales by the CENTERED POPULATION std
    # (denominator n — probed at 1e-15 agreement; its 1/weightSum
    # normalization differs from LogisticRegression's SAMPLE-std
    # summarizer, see _cd_wls_penalized) and the label std even when
    # fitIntercept=false — only the centering of the DATA follows the
    # intercept flag (golden-matched vs LinearRegression both ways)
    nw = float(sum_w) if sum_w is not None else float(n)
    y_mean = sum_y / nw
    cyy = sum_y2 - nw * y_mean * y_mean
    sig_y = float(np.sqrt(max(cyy, 0.0) / nw))

    if p == 0:
        beta = np.zeros(len(x_cols))
        if has_int:
            beta[i0] = y_mean
        sse = cyy if has_int else sum_y2
        out = (beta, 0, True, float(sse))
        return out + (np.zeros(0),) if return_theta else out

    G = xtx[np.ix_(feats, feats)]
    gy = xty[feats]
    if has_int:
        m = xtx[i0, feats] / nw  # Σw·xⱼ / Σw
    elif col_sums is not None:
        m = col_sums[feats] / nw
    else:
        m = np.zeros(p)
    cvar = (np.diag(G) - nw * m * m) / nw
    sig = np.sqrt(np.maximum(cvar, 0.0))
    if has_int:
        A = G - nw * np.outer(m, m)
        b = gy - m * sum_y
    else:
        A = G.copy()
        b = gy.copy()
    live = sig > 0.0  # constant features get θ = β = 0 (MLlib behavior)
    if sig_y <= 0.0:
        if not has_int:
            raise ValueError(
                "constant label with no intercept — the scaled problem "
                "is undefined (the MLlib yStd == 0 refusal)"
            )
        # constant label: the penalized fit is β = 0, intercept = ȳ
        beta = np.zeros(len(x_cols))
        beta[i0] = y_mean
        out = (beta, 0, True, 0.0)
        return out + (np.zeros(p),) if return_theta else out

    s_out = np.where(live, sig, 1.0)
    A = A / np.outer(s_out, s_out)
    b = b / (s_out * sig_y)
    lam_t = lam / sig_y
    if standardize:
        l1 = np.full(p, alpha * lam_t)
        l2 = np.full(p, (1.0 - alpha) * lam_t)
    else:
        # MLlib standardization=false: both penalties are un-standardized
        # per coordinate IN θ-SPACE — L1Updater gets effectiveL1/σⱼ and
        # L2Regularization (applyFeaturesStd path) gets effectiveL2·θⱼ²/σⱼ²,
        # with effective* = λ·{α, 1−α}/σ_y (golden-matched vs MLlib)
        l1 = alpha * lam_t / s_out
        l2 = (1.0 - alpha) * lam_t / (s_out * s_out)

    theta = np.zeros(p) if theta0 is None else np.asarray(theta0, float).copy()
    denom = np.diag(A) / nw + l2
    sweeps = 0
    converged = False
    n_sweeps = exact_sweeps if exact_sweeps is not None else max_sweeps
    for _ in range(n_sweeps):
        max_d = 0.0
        for j in range(p):
            if not live[j]:
                continue
            rho = (b[j] - A[j] @ theta + A[j, j] * theta[j]) / nw
            t_new = np.sign(rho) * max(abs(rho) - l1[j], 0.0) / denom[j]
            max_d = max(max_d, abs(t_new - theta[j]))
            theta[j] = t_new
        sweeps += 1
        if exact_sweeps is None and max_d <= tol:
            converged = True
            break
    if exact_sweeps is not None:
        converged = True

    beta = np.zeros(len(x_cols))
    bf = np.where(live, theta * sig_y / s_out, 0.0)
    for idx, j in enumerate(feats):
        beta[j] = bf[idx]
    if has_int:
        beta[i0] = y_mean - float(m @ bf)
    # SSE from the same moments: ||y−Xβ||² = y'y − 2β'X'y + β'Gβ
    sse = float(sum_y2 - 2.0 * beta @ xty + beta @ xtx @ beta)
    if return_theta:
        return beta, sweeps, converged, sse, theta
    return beta, sweeps, converged, sse


@dataclass
class ElasticNetLM:
    """Fitted elastic-net linear model. Scoring is the LM path — one
    codegen projection over raw columns via `prediction_over_raw`
    (dummies / intercept / zero-backfill inline, no encoding pass)."""

    xnames: list[str]
    yname: str
    coefs: np.ndarray
    reg_param: float
    elastic_net_param: float
    standardize: bool
    nrow: int
    sse: float
    sweeps: int
    converged: bool
    levels: dict[str, list[str]] = field(default_factory=dict)
    call: str = ""

    @property
    def n_nonzero(self) -> int:
        """Selected support size, intercept excluded — the lasso's point."""
        return _count_nonzero(self.xnames, self.coefs)

    def predict(self, df: DataFrame, output_col: str = "prediction") -> DataFrame:
        expr = prediction_over_raw(self.xnames, self.coefs, self.levels, df.columns)
        return df.withColumn(output_col, expr)


def _count_nonzero(x_cols: list[str], beta) -> int:
    """Selected support size, intercept excluded — the single point of
    truth for every surface's n_nonzero (exact-zero convention: CD's
    soft-threshold produces literal 0.0 for dropped coordinates)."""
    return int(
        sum(1 for nm, c in zip(x_cols, beta) if nm != "intercept" and c != 0.0)
    )


def _prepare_gram(
    x: DataFrame, y_col: str, x_cols: list[str], weight_col: str | None = None
):
    """One Gram job for the CD solvers, with the no-intercept twist:
    without an 'intercept' column the fit still scales by the CENTERED
    stds (the MLlib fitIntercept=false convention), so the Gram carries
    one extra ones-column row for the feature means — still a single
    aggregation. With `weight_col` every sum is W-weighted (the ones
    row then carries Σw·xⱼ — exactly the weighted means the solver
    needs). Returns (gram_result, col_sums-or-None)."""
    has_int = "intercept" in x_cols
    gram_cols = list(x_cols)
    if not has_int:
        x = x.withColumn("__one", F.lit(1.0))
        gram_cols = gram_cols + ["__one"]
    g = gram_aggregate(x, gram_cols, y_col=y_col, weight_col=weight_col)
    if g.n <= 1:
        raise ValueError("need more than one row")
    if weight_col is not None:
        # weight-domain guards (same aggregation — min_w/n_w ride the
        # Gram job; shared guard: operators/lm.py::check_weight_domain)
        check_weight_domain(
            weight_col,
            n=g.n,
            n_w=g.n_w if g.n_w is not None else g.n,
            min_w=g.min_w,
            sum_w=g.sum_w,
        )
    p = len(x_cols)
    col_sums = None if has_int else g.xtx[p, :p].copy()
    return g, col_sums


def elastic_net_fit(
    x: DataFrame,
    y_col: str,
    x_cols: list[str],
    reg_param: float,
    elastic_net_param: float = 1.0,
    standardize: bool = True,
    max_sweeps: int = 10_000,
    tol: float = 1e-10,
    exact_sweeps: int | None = None,
    weight_col: str | None = None,
) -> ElasticNetLM:
    """Low-level fit over a pre-encoded frame (the `LM.fit` contract:
    `x` holds predictors + label; an 'intercept' column of ones marks an
    unpenalized, centered intercept). ONE Gram aggregation job, then
    driver-side coordinate descent — see the module docstring. Without
    an intercept column the fit goes through the origin but still
    scales by the CENTERED stds (the MLlib fitIntercept=false
    convention), so the Gram carries one extra ones-column row for the
    feature means — still a single job (`_prepare_gram`)."""
    if exact_sweeps is not None and exact_sweeps < 1:
        raise ValueError("exact_sweeps must be >= 1")
    g, col_sums = _prepare_gram(x, y_col, x_cols, weight_col=weight_col)
    p = len(x_cols)
    beta, sweeps, converged, sse = _cd_enet(
        g.xtx[:p, :p],
        g.xty[:p],
        g.n,
        float(g.sum_y),
        float(g.sum_y2),
        x_cols,
        reg_param,
        elastic_net_param,
        standardize,
        max_sweeps,
        tol,
        exact_sweeps,
        col_sums=col_sums,
        sum_w=float(g.sum_w) if weight_col else None,
    )
    return ElasticNetLM(
        xnames=list(x_cols),
        yname=y_col,
        coefs=beta,
        reg_param=float(reg_param),
        elastic_net_param=float(elastic_net_param),
        standardize=standardize,
        nrow=g.n,
        sse=sse,
        sweeps=sweeps,
        converged=converged,
    )


def elastic_net(
    df: DataFrame,
    formula: str,
    reg_param: float,
    elastic_net_param: float = 1.0,
    standardize: bool = True,
    na_action: str = "omit",
    max_sweeps: int = 10_000,
    tol: float = 1e-10,
    exact_sweeps: int | None = None,
    weight_col: str | None = None,
) -> ElasticNetLM:
    """Formula front-end (`lm`'s scaffold: parse → omit NAs → encode
    categoricals with global levels → inject intercept → fit).
    `elastic_net_param=1` is the lasso, `0` pure ridge (matching
    `ridge()` only under `standardize=False`, since MLlib's default
    penalizes standardized coefficients). `weight_col` gives the
    penalized-WLS fit with the MLlib weightCol convention: every
    statistic is W-weighted and the objective is
    1/(2Σw)·Σwᵢ(yᵢ−ŷᵢ)² + penalty (same single Gram job)."""
    encoded, x_cols, target, levels = _encode_formula(
        df, formula, na_action, extra_cols=[weight_col] if weight_col else []
    )
    model = elastic_net_fit(
        encoded,
        y_col=target,
        x_cols=x_cols,
        reg_param=reg_param,
        elastic_net_param=elastic_net_param,
        standardize=standardize,
        max_sweeps=max_sweeps,
        tol=tol,
        exact_sweeps=exact_sweeps,
        weight_col=weight_col,
    )
    model.levels = levels
    model.call = (
        f"elastic_net({formula}, reg_param={reg_param}, "
        f"elastic_net_param={elastic_net_param})"
    )
    return model


def lasso_lm(df: DataFrame, formula: str, reg_param: float, **kwargs) -> ElasticNetLM:
    """Pure-L1 shorthand: `elastic_net(elastic_net_param=1.0)`."""
    return elastic_net(df, formula, reg_param, elastic_net_param=1.0, **kwargs)


def elastic_net_cv(
    df: DataFrame,
    formula: str,
    reg_params: list[float],
    fold_expr,
    n_folds: int = 5,
    elastic_net_param: float = 1.0,
    standardize: bool = True,
    na_action: str = "omit",
    max_sweeps: int = 10_000,
    tol: float = 1e-10,
    weight_col: str | None = None,
) -> DataFrame:
    """K-fold cross-validation over a λ path in ONE data pass — the
    `lm_cross_validate` shape: Gram statistics are additive, so a single
    `groupBy(fold)` aggregation yields every fold's (X'X, X'y, y'y, …);
    each (fold, λ) model is a driver-side coordinate descent on
    (total − fold) statistics and its held-out SSE evaluates from the
    fold's own moments. A 100-λ path over any data size costs exactly
    one aggregation job.

    `fold_expr` must land in [0, n_folds) — an out-of-range fold id
    raises (it would ride every training set but never be validated).

    `weight_col` runs the penalized-WLS CV (the `elastic_net(weight_col=)`
    fit applied per training set — same Σw conventions, same single
    job): rmse_train/rmse_val become the W-weighted RMS error
    √(Σw·e²/Σw), the natural weighted generalization.

    Returns one row per (reg_param, fold): reg_param, fold, n_train,
    n_val, rmse_train, rmse_val, n_nonzero."""
    if not reg_params:
        raise ValueError("reg_params must be non-empty")
    if isinstance(fold_expr, str):
        fold_expr = F.col(fold_expr)
    encoded, x_cols, target, _levels = _encode_formula(
        df.withColumn("__fold", fold_expr.cast("int")),
        formula,
        na_action,
        extra_cols=["__fold"] + ([weight_col] if weight_col else []),
    )
    from sparkglm_spark.operators.lm import fold_gram_collect

    has_int = "intercept" in x_cols
    folds = fold_gram_collect(
        encoded, x_cols, target, n_folds, weight_col=weight_col
    )
    tot = tuple(
        sum(v[i] for v in folds.values()) for i in range(6)
    ) + ((sum(v[6] for v in folds.values()),) if weight_col else (None,))
    out = []
    for lam in reg_params:
        for f in range(n_folds):
            if f not in folds:
                continue
            xtx_v, xty_v, sy_v, syy_v, n_v, xs_v, sw_v = folds[f]
            xtx_t = tot[0] - xtx_v
            xty_t = tot[1] - xty_v
            sy_t, syy_t, n_t = tot[2] - sy_v, tot[3] - syy_v, tot[4] - n_v
            sw_t = (tot[6] - sw_v) if weight_col else None
            if n_t <= 1 or (sw_t is not None and sw_t <= 0.0):
                continue
            beta, _sw, _cv, sse_t = _cd_enet(
                xtx_t, xty_t, n_t, sy_t, syy_t, x_cols,
                lam, elastic_net_param, standardize, max_sweeps, tol, None,
                # no-intercept designs still standardize by the CENTERED
                # stds (the fit path's MLlib convention) — feed the
                # training col sums so CV scores the model it would fit
                col_sums=None if has_int else (tot[5] - xs_v),
                sum_w=sw_t,
            )
            sse_v = float(syy_v - 2.0 * beta @ xty_v + beta @ xtx_v @ beta)
            nz = _count_nonzero(x_cols, beta)
            # weighted: RMS errors over Σw (the statistical sample size)
            den_t = sw_t if weight_col else n_t
            den_v = sw_v if weight_col else n_v
            out.append(
                (
                    float(lam),
                    f,
                    n_t,
                    n_v,
                    float(np.sqrt(max(sse_t, 0.0) / den_t)),
                    float(np.sqrt(max(sse_v, 0.0) / den_v)) if den_v else None,
                    nz,
                )
            )
    return df.sparkSession.createDataFrame(
        out,
        "reg_param double, fold int, n_train bigint, n_val bigint, "
        "rmse_train double, rmse_val double, n_nonzero int",
    )


def elastic_net_path(
    df: DataFrame,
    formula: str,
    reg_params: list[float],
    elastic_net_param: float = 1.0,
    standardize: bool = True,
    na_action: str = "omit",
    max_sweeps: int = 10_000,
    tol: float = 1e-10,
    weight_col: str | None = None,
) -> DataFrame:
    """The whole regularization path from ONE data pass: a single Gram
    aggregation, then one warm-started coordinate descent per λ on the
    driver (λ sorted descending so each solution seeds the next — the
    standard pathwise trick; identical fixed points to cold starts,
    just fewer sweeps). Returns one (reg_param, term) row block per
    INPUT λ — duplicates in `reg_params` produce duplicate blocks
    (differing at most in `sweeps`), so the output shape is always
    len(reg_params) × n_terms.

    Each row also carries the λ-selection criteria for the whole fit:
    aic = n·ln(SSE/n) + 2·df and bic = n·ln(SSE/n) + ln(n)·df with
    df = n_nonzero (+1 with an intercept) — the standard lasso
    degrees-of-freedom estimate (Zou, Hastie & Tibshirani 2007: the
    active-set size is unbiased for the lasso's df), so a path fit
    selects λ with one argmin over the output, no held-out pass.

    `weight_col` fits the penalized-WLS path (the
    `elastic_net(weight_col=)` conventions); SSE in the criteria is
    then the W-weighted SSE over the raw row count n — the WLS
    log-likelihood's σ̂² = Σw·e²/n form (the Σln wᵢ term is constant
    across λ, so it cancels out of the argmin)."""
    if not reg_params:
        raise ValueError("reg_params must be non-empty")
    encoded, x_cols, target, _levels = _encode_formula(
        df, formula, na_action, extra_cols=[weight_col] if weight_col else []
    )
    g, col_sums = _prepare_gram(encoded, target, x_cols, weight_col=weight_col)
    p = len(x_cols)
    out = []
    theta = None
    # duplicates are kept (one output block per input λ — the
    # documented contract); descending order preserves the warm starts
    for lam in sorted((float(v) for v in reg_params), reverse=True):
        beta, sweeps, _conv, _sse, theta = _cd_enet(
            g.xtx[:p, :p], g.xty[:p], g.n, float(g.sum_y), float(g.sum_y2),
            x_cols, lam, elastic_net_param, standardize, max_sweeps, tol,
            None, col_sums=col_sums, theta0=theta, return_theta=True,
            sum_w=float(g.sum_w) if weight_col else None,
        )
        nz = _count_nonzero(x_cols, beta)
        dof = nz + (1 if "intercept" in x_cols else 0)
        n = g.n
        ll_core = n * float(np.log(max(_sse, 1e-300) / n))
        aic = ll_core + 2.0 * dof
        bic = ll_core + float(np.log(n)) * dof
        for nm, c in zip(x_cols, beta):
            out.append((lam, nm, float(c), nz, sweeps, aic, bic))
    return df.sparkSession.createDataFrame(
        out,
        "reg_param double, term string, estimate double, "
        "n_nonzero int, sweeps int, aic double, bic double",
    )


def elastic_net_grouped(
    df: DataFrame,
    formula: str,
    group_cols: list[str],
    reg_param: float,
    elastic_net_param: float = 1.0,
    standardize: bool = True,
    na_action: str = "omit",
    max_sweeps: int = 10_000,
    tol: float = 1e-10,
    exact_sweeps: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """One elastic-net model per segment — the `lm_grouped` shape, which
    is STRONGER than the IRLS-grouped fitters' at scale: stage 1 is one
    `groupBy(group_cols)` over the Gram sum expressions (partial
    map-side aggregation; the wire carries O(G·k²) doubles, never rows),
    stage 2 runs each group's coordinate descent DISTRIBUTED via
    Arrow-batched `mapInPandas` over the G-row Gram table. No per-group
    driver work, no row materialization — G (number of segments) is
    unbounded.

    Encoding levels are computed once on the whole input (the grouped
    convention: groups missing a level get zero dummies). Degenerate
    groups (n ≤ 1, a constant label in a no-intercept design, or —
    with `weight_col` — negative/null weights or Σw ≤ 0 in the group)
    yield NULL estimates (the grouped NULL policy; the single-fit
    surface raises instead). Returns long format: group_cols…, term,
    estimate, n_rows, n_nonzero, sweeps, converged."""
    from pyspark.sql import types as T

    from sparkglm_spark.operators.lm import _design

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if exact_sweeps is not None and exact_sweeps < 1:
        raise ValueError("exact_sweeps must be >= 1")
    encoded, x_cols, target = _design(
        df, formula, group_cols, na_action=na_action, weight_col=weight_col
    )
    k = len(x_cols)
    has_int = "intercept" in x_cols
    xs = [F.col(c) for c in x_cols]
    y = F.col(target)
    w = F.col(weight_col) if weight_col else None

    def wgt(e):
        return e if w is None else e * w

    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(wgt(xs[i] * xs[j])).alias(f"__g_{i}_{j}"))
    for i in range(k):
        aggs.append(F.sum(wgt(xs[i] * y)).alias(f"__xy_{i}"))
        aggs.append(F.sum(wgt(xs[i])).alias(f"__xs_{i}"))
    aggs.append(F.sum(wgt(y)).alias("__sy"))
    aggs.append(F.sum(wgt(y * y)).alias("__syy"))
    aggs.append(F.count(F.lit(1)).alias("__n"))
    if w is not None:
        aggs.append(F.sum(w).alias("__sw"))
        aggs.append(F.min(w).alias("__minw"))
        aggs.append(F.count(w).alias("__nw"))
    gram = encoded.groupBy(*group_cols).agg(*aggs)

    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField("term", T.StringType()),
            T.StructField("estimate", T.DoubleType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_nonzero", T.IntegerType()),
            T.StructField("sweeps", T.IntegerType()),
            T.StructField("converged", T.BooleanType()),
        ]
    )
    names = list(x_cols)
    gcols = list(group_cols)
    lam, alpha, std = float(reg_param), float(elastic_net_param), standardize
    msw, ctol, nex = max_sweeps, tol, exact_sweeps
    weighted = weight_col is not None
    # validate once on the driver, not per group inside the UDF
    _cd_enet(
        np.eye(k), np.zeros(k), 2, 0.0, 1.0, x_cols, lam, alpha, std,
        1, ctol, None,
    )

    def solve_groups(batches):
        import pandas as pd

        for pdf in batches:
            cols: dict[str, list] = {c: [] for c in gcols}
            cols.update(
                term=[], estimate=[], n_rows=[], n_nonzero=[],
                sweeps=[], converged=[],
            )
            for r in pdf.to_dict("records"):
                n = int(r["__n"])
                xtx = np.empty((k, k))
                for i in range(k):
                    for j in range(i, k):
                        xtx[i, j] = xtx[j, i] = r[f"__g_{i}_{j}"]
                xty = np.array([r[f"__xy_{i}"] for i in range(k)])
                csums = np.array([r[f"__xs_{i}"] for i in range(k)])
                sw = None
                ok_w = True
                if weighted:
                    # per-group weight-domain check — the boolean twin of
                    # lm.py::check_weight_domain: a bad group gets NULL
                    # estimates (grouped NULL policy), never raises
                    sw = r["__sw"]
                    ok_w = (
                        int(r["__nw"]) == n
                        and r["__minw"] is not None
                        and float(r["__minw"]) >= 0.0
                        and sw is not None
                        and float(sw) > 0.0
                    )
                    sw = float(sw) if ok_w else None
                beta, sweeps, conv, nz = None, 0, False, None
                if (
                    n > 1 and ok_w
                    and np.all(np.isfinite(xtx)) and np.all(np.isfinite(xty))
                ):
                    try:
                        beta, sweeps, conv, _sse = _cd_enet(
                            xtx, xty, n, float(r["__sy"]), float(r["__syy"]),
                            names, lam, alpha, std, msw, ctol, nex,
                            col_sums=None if has_int else csums,
                            sum_w=sw,
                        )
                        nz = _count_nonzero(names, beta)
                    except (ValueError, np.linalg.LinAlgError):
                        beta = None
                for i, name in enumerate(names):
                    for c in gcols:
                        cols[c].append(r[c])
                    cols["term"].append(name)
                    cols["estimate"].append(
                        float(beta[i]) if beta is not None else None
                    )
                    cols["n_rows"].append(n)
                    cols["n_nonzero"].append(nz)
                    cols["sweeps"].append(sweeps)
                    cols["converged"].append(bool(conv) if beta is not None else False)
            yield pd.DataFrame(cols)

    # the G-row Gram table is byte-small, so AQE would coalesce the
    # solve stage onto 1-2 cores (the fanout_groups pathology) — a
    # ROUND-ROBIN repartition of G tiny rows costs nothing and keeps
    # the G coordinate descents CPU-parallel (a keyed repartition would
    # match the aggregation's partitioning and be optimizer-eliminated)
    from sparkglm_spark.plans.partitioning import fanout_groups

    return fanout_groups(gram, []).mapInPandas(solve_groups, out_schema)


def _cd_wls_penalized(
    A: np.ndarray,
    b: np.ndarray,
    n: int,
    sig: np.ndarray,
    lam: float,
    alpha: float,
    standardize: bool,
    theta: np.ndarray,
    max_sweeps: int,
    tol: float,
) -> np.ndarray:
    """Inner solver of the penalized IRLS (glmnet's middle loop): cyclic
    coordinate descent on (1/(2n))[θ'Ãθ − 2b̃'θ] + λ1ⱼ‖θ‖₁-ish with
    Ã = A/(σσ'), b̃ = b/σ over the FIXED upfront feature stds. A/b are
    the weighted-CENTERED raw-scale normal-equation pieces of the
    current quadratic approximation. Updates θ in place and returns it;
    constant features (σ = 0) stay at 0."""
    p = len(b)
    live = sig > 0.0
    s = np.where(live, sig, 1.0)
    At = A / np.outer(s, s)
    bt = b / s
    if standardize:
        l1 = np.full(p, alpha * lam)
        l2 = np.full(p, (1.0 - alpha) * lam)
    else:
        l1 = alpha * lam / s
        l2 = (1.0 - alpha) * lam / (s * s)
    denom = np.diag(At) / n + l2
    for _ in range(max_sweeps):
        max_d = 0.0
        for j in range(p):
            if not live[j]:
                theta[j] = 0.0
                continue
            rho = (bt[j] - At[j] @ theta + At[j, j] * theta[j]) / n
            t_new = np.sign(rho) * max(abs(rho) - l1[j], 0.0) / denom[j]
            max_d = max(max_d, abs(t_new - theta[j]))
            theta[j] = t_new
        if max_d <= tol:
            break
    return theta


def _penalized_irls_update(
    Gw, gz, sw, swz, k, feats, i0, sig, nw, lam, alpha, standardize,
    theta, max_sweeps, cd_tol,
):
    """ONE prox-Newton quadratic-subproblem solve from the zw-Gram
    pieces: weighted centering against the free intercept, the
    `_cd_wls_penalized` sweep, σ-unscaling, intercept back-solve.
    Shared by `glm_elastic_net`, `_glm_enet_pathwise` and
    `glm_elastic_net_grouped` (code-review r11: the block had drifted
    into three copies). Returns (new_beta, theta)."""
    Gf = Gw[np.ix_(feats, feats)]
    bf = gz[feats]
    if i0 is not None:
        wx = Gw[i0, feats]  # Σ w·xⱼ
        A = Gf - np.outer(wx, wx) / sw
        bvec = bf - wx * (swz / sw)
    else:
        A = Gf
        bvec = bf
    theta = _cd_wls_penalized(
        A, bvec, nw, sig, lam, alpha, standardize, theta, max_sweeps, cd_tol
    )
    new_beta = np.zeros(k)
    bfeat = np.where(sig > 0, theta / np.where(sig > 0, sig, 1.0), 0.0)
    for idx, j in enumerate(feats):
        new_beta[j] = bfeat[idx]
    if i0 is not None:
        new_beta[i0] = (swz - wx @ bfeat) / sw
    return new_beta, theta


@dataclass
class GLMElasticNet:
    """Fitted L1/L2-penalized GLM (`glm_elastic_net`). Scoring mirrors
    `GLM.predict`: one codegen projection over raw columns, response
    scale by default or `type='link'` for η.

    `deviance` convention: each outer iteration aggregates deviance at
    the CURRENT β before solving the update, so on a `converged` exit
    the value is the deviance at the second-to-last β — within `tol` of
    the returned coefficients' (the iteration that converged changed no
    coefficient by more than tol). When the fit stops at `max_iter`
    without converging, the fitter RE-AGGREGATES deviance at the
    returned β (one extra scalar job), so `deviance` always describes
    `coefs`. Under `exact_iterations=N` (the oracle-pin hook) the value
    is deliberately the N-th aggregation — i.e. deviance at β_{N−1} —
    because the pinned SQL trajectory replays exactly N aggregations."""

    xnames: list[str]
    yname: str
    coefs: np.ndarray
    family: str
    link: str
    reg_param: float
    elastic_net_param: float
    standardize: bool
    deviance: float
    nrow: int
    iter: int
    converged: bool
    levels: dict[str, list[str]] = field(default_factory=dict)
    call: str = ""

    @property
    def n_nonzero(self) -> int:
        return _count_nonzero(self.xnames, self.coefs)

    def predict(
        self, df: DataFrame, output_col: str = "prediction", type: str = "response"
    ) -> DataFrame:
        from sparkglm_spark.functions.links import get_link

        eta = prediction_over_raw(self.xnames, self.coefs, self.levels, df.columns)
        if type == "link":
            return df.withColumn(output_col, eta)
        if type != "response":
            raise ValueError("type must be 'response' or 'link'")
        lnk = get_link(self.link)
        return df.withColumn(output_col, lnk.unlink(eta, F.lit(1.0)))


def glm_elastic_net(
    df: DataFrame,
    formula: str,
    reg_param: float,
    elastic_net_param: float = 1.0,
    family: str = "binomial",
    standardize: bool = True,
    na_action: str = "omit",
    max_iter: int = 100,
    tol: float = 1e-10,
    max_sweeps: int = 1000,
    exact_iterations: int | None = None,
    offset_col: str | None = None,
    weight_col: str | None = None,
    var_power: float = 1.5,
    nb_alpha: float = 1.0,
) -> GLMElasticNet:
    """Sparse GLM — L1(+L2)-penalized logistic / Poisson regression with
    the MLlib `LogisticRegression(regParam, elasticNetParam,
    standardization)` objective (golden-tested for binomial; Poisson has
    no MLlib elastic-net analog and is verified by its KKT conditions):

        min_β  (1/n)·Σᵢ −ℓᵢ(β)  +  λ·(α‖θ‖₁ + (1−α)/2·‖θ‖²)

    with θⱼ = βⱼ·σⱼ (upfront UNWEIGHTED sample feature stds — the MLlib
    summarizer convention; no label scaling, unlike the linear case) and
    the intercept unpenalized. `standardize=False` un-standardizes the
    penalties per coordinate (L1/σⱼ, L2/σⱼ²), matching MLlib.

    `weight_col` gives the prior-weighted fit with the MLlib
    `LogisticRegression(weightCol)` convention (golden-tested): every
    statistical n becomes Σω — the objective is (1/Σω)·Σωᵢ(−ℓᵢ) + the
    same penalty, feature stds use MLlib's weighted summarizer variance
    (Σωx² − Σω·m²)/(Σω − Σω²/Σω) — the RELIABILITY-weights unbiased
    denominator, PROBED at 3e-8 against candidate conventions (sample
    Σω−1 and population Σω are each ~1e-4 off); with unit weights
    Σω² = n so it degrades exactly to the unweighted n−1. The IRLS
    working weights pick up the ω factor and deviance is Σω-weighted.
    An integer weight is EXACTLY row replication ONLY in the fitted
    objective sense (the reliability denominator W−Σω²/W ≠ the
    replicated frame's W−1, an O(1/n) std difference the penalty
    scaling sees — tested at the matching tolerance). Weights must be
    non-null, ≥ 0, Σω > 0, and carry > 1 effective row
    (Σω − Σω²/Σω > 0) — violations raise upfront on the same
    aggregation.

    Algorithm — penalized IRLS (glmnet's prox-Newton): each outer
    iteration is ONE aggregation job (the `GLM.fit` zw-Gram shape — the
    weighted Gram over [intercept]+features carries Σw / ΣWx / X'WX /
    X'Wz / deviance in one pass), then the quadratic subproblem solves
    by weighted-centered coordinate descent on the DRIVER — the same
    100 TB cost profile per iteration as the unpenalized `glm`.

    Families: binomial/logit (Bernoulli y ∈ [0,1]), poisson/log
    (y ≥ 0), gamma/log (r13; y > 0; working weight μ²/V = 1,
    the constant-weight log-link case), tweedie(`var_power`)/log
    (r13; 1 < p < 2; y ≥ 0 with an exact point mass at 0 — sparse
    insurance severity/total-cost models; w = μ^(2−p)), and
    negbinomial(`nb_alpha`)/log (r14; NB2 with FIXED dispersion α > 0,
    variance μ + αμ², w = μ/(1+αμ) — the sparse overdispersed-count
    model a penalized poisson silently mis-weights; α→0 recovers
    poisson). All reuse the same prox-Newton with the family's
    variance/deviance kernels swapped in (families.py), golden-tested
    against the unpenalized `glm` at λ = 0. `offset_col` adds a fixed per-row term to η (the `glm`
    offset contract: η = Xβ + offset, fit unchanged in cost — one extra
    column in the per-iteration expressions, zero extra jobs) —
    penalized Poisson with `offset_col=log(exposure)` is the standard
    sparse rate model. At λ = 0 the fit matches `glm(offset_col=)`
    (parity-tested). Scoring note: like `GLM.predict`, `predict()`
    scores η = Xβ WITHOUT the offset — add it on the link scale when
    scoring rate models. No m_col on this surface (use `glm`,
    unpenalized). Converges on max coefficient change ≤ `tol`;
    `exact_iterations=N` runs exactly N outer solves with no
    convergence test (deterministic trajectory — the oracle-pin hook;
    with a single covariate the inner CD is exact in one update, so
    the whole trajectory is closed-form)."""
    from sparkglm_spark.functions.families import get_family
    from sparkglm_spark.functions.links import get_link

    if family not in _ENET_FAMILIES:
        raise ValueError(
            f"glm_elastic_net supports {'/'.join(_ENET_FAMILIES)}, "
            f"got {family!r}"
        )
    lam = float(reg_param)
    alpha = float(elastic_net_param)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("elastic_net_param must be in [0, 1]")
    if lam < 0.0:
        raise ValueError("reg_param must be >= 0")
    if exact_iterations is not None and exact_iterations < 1:
        raise ValueError("exact_iterations must be >= 1")
    fam = get_family(family, var_power, nb_alpha)  # var_power: tweedie; nb_alpha: negbinomial
    lnk = get_link(fam.default_link)
    extra = [c for c in (offset_col, weight_col) if c]
    encoded, x_cols, target, levels = _encode_formula(
        df, formula, na_action, extra_cols=extra,
    )
    has_int = "intercept" in x_cols
    i0 = x_cols.index("intercept") if has_int else None
    feats = [i for i in range(len(x_cols)) if i != i0]
    fnames = [x_cols[i] for i in feats]
    k = len(x_cols)
    p = len(feats)

    from sparkglm_spark.plans.partitioning import ensure_parallel

    work = ensure_parallel(
        encoded.select(target, *x_cols, *extra)
    ).persist()
    try:
        y = F.col(target)
        one = F.lit(1.0)
        off = F.col(offset_col).cast("double") if offset_col else None
        wt = F.col(weight_col).cast("double") if weight_col else None
        wr = wt if wt is not None else one  # per-row prior weight ω
        # upfront pass: n, ȳ, and the (ω-weighted but IRLS-unweighted)
        # feature moments for the fixed standardization (computed once —
        # MLlib's summarizer, which weights by ω when weightCol is set)
        aggs0 = [
            F.count(F.lit(1)).alias("n"),
            F.sum(wr * y).alias("sy"),
            F.min(y).alias("ymin"),
            F.max(y).alias("ymax"),
        ]
        if wt is not None:
            aggs0 += [
                F.sum(wt).alias("sw0"),
                F.sum(wt * wt).alias("sww"),
                F.min(wt).alias("minw"),
                F.count(wt).alias("n_w"),
            ]
        if off is not None:
            aggs0.append(F.sum(wr * off).alias("soff"))
        for i, j in enumerate(feats):
            c = F.col(x_cols[j])
            aggs0.append(F.sum(wr * c).alias(f"s_{i}"))
            aggs0.append(F.sum(wr * c * c).alias(f"ss_{i}"))
        from sparkglm_spark.plans.partitioning import no_aqe

        # every collect in this fit is a one-row aggregate over the cached
        # working frame — AQE's stage barrier doubles the job count for
        # nothing (r15, see no_aqe)
        with no_aqe(work.sparkSession):
            r0 = work.agg(*aggs0).collect()[0]
        n = int(r0["n"])
        if n <= 1:
            raise ValueError("need more than one row")
        if wt is not None:
            # weight-domain guards ride the same aggregation (shared
            # guard: operators/lm.py::check_weight_domain; the sww term
            # adds the ≤-1-effective-row reliability-denominator check)
            check_weight_domain(
                weight_col,
                n=n,
                n_w=int(r0["n_w"]),
                min_w=r0["minw"],
                sum_w=float(r0["sw0"]),
                sum_w2=float(r0["sww"]),
            )
        # label-domain guards ride the same upfront aggregation: the
        # mean-only checks below can't see individual out-of-domain rows
        # (the IRLS clamp bounds μ, not y — a y = −3 would silently
        # corrupt the working response/deviance). glm raises likewise.
        ymin, ymax = float(r0["ymin"]), float(r0["ymax"])
        dom_err = _enet_label_domain_error(family, ymin, ymax)
        if dom_err:
            raise ValueError(dom_err)
        nw = float(r0["sw0"]) if wt is not None else float(n)
        # std denominator: MLlib's weighted summarizer uses the
        # RELIABILITY-weights form Σω − Σω²/Σω (probed — see docstring);
        # with unit weights Σω² = n, so it IS the unweighted n−1
        sdenom = (
            nw - float(r0["sww"]) / nw if wt is not None else float(n - 1)
        )
        y_mean = float(r0["sy"]) / nw
        ms = np.array([float(r0[f"s_{i}"]) for i in range(p)]) / nw
        sig = np.sqrt(
            np.maximum(
                (np.array([float(r0[f"ss_{i}"]) for i in range(p)]) - nw * ms * ms)
                / sdenom,
                0.0,
            )
        )

        # family domain guards (cheap second scan avoided: trust + clamp)
        if family == "binomial" and not 0.0 < y_mean < 1.0:
            raise ValueError("binomial label is constant 0 or 1")
        if family in ("poisson", "tweedie", "negbinomial") and y_mean <= 0.0:
            raise ValueError(
                f"{family} label sums to 0 — no signal to fit"
            )

        beta = np.zeros(k)
        if has_int:
            # standard glmnet start: β = 0, intercept = link(ȳ); with an
            # offset, subtract its mean so the start's η ≈ link(ȳ) at
            # the typical row (a Newton start, not a fit convention —
            # the trajectory converges to the same optimum either way)
            mu0 = min(max(y_mean, 1e-10), 1 - 1e-10) if family == "binomial" else y_mean
            beta[i0] = float(lnk.link_np(np.array([mu0]), 1.0)[0]) if hasattr(
                lnk, "link_np"
            ) else float(np.log(mu0 / (1 - mu0)) if family == "binomial" else np.log(mu0))
            if off is not None:
                beta[i0] -= float(r0["soff"]) / nw

        theta = np.zeros(p)
        xs = [F.col(c) for c in x_cols]
        dev = None
        converged = False
        n_iter = 0
        if exact_iterations is not None:
            max_iter = exact_iterations
        for _ in range(max_iter):
            eta_lin = F.lit(0.0)
            for c, bb in zip(xs, beta):
                eta_lin = eta_lin + F.lit(float(bb)) * c
            eta = eta_lin if off is None else eta_lin + off
            mu = lnk.unlink(eta, one)
            if family == "binomial":
                mu = F.least(F.greatest(mu, F.lit(1e-10)), F.lit(1.0 - 1e-10))
            grad = lnk.lprime(mu, one)
            w = wr / (fam.variance(mu, one) * grad * grad)
            # working response for the LINEAR part only — the offset is
            # fixed, so it drops out of the WLS subproblem (z = η−off +
            # (y−μ)g', the glm convention at glm.py:181)
            z = eta_lin + (y - mu) * grad
            proj = work.select(
                *xs, w.alias("__w"), z.alias("__z"),
                (wr * fam.deviance_term(y, mu, one)).alias("__devt"),
            )
            w_c, z_c = F.col("__w"), F.col("__z")
            aggs = []
            for i in range(k):
                for j in range(i, k):
                    aggs.append(F.sum(w_c * xs[i] * xs[j]).alias(f"g_{i}_{j}"))
                aggs.append(F.sum(w_c * xs[i] * z_c).alias(f"xz_{i}"))
            aggs.append(F.sum(w_c).alias("sw"))
            aggs.append(F.sum(w_c * z_c).alias("swz"))
            aggs.append((F.lit(2.0) * F.sum(F.col("__devt"))).alias("dev"))
            with no_aqe(work.sparkSession):
                r = proj.agg(*aggs).collect()[0]
            dev = float(r["dev"])
            Gw = np.empty((k, k))
            for i in range(k):
                for j in range(i, k):
                    Gw[i, j] = Gw[j, i] = float(r[f"g_{i}_{j}"])
            gz = np.array([float(r[f"xz_{i}"]) for i in range(k)])
            sw = float(r["sw"])
            swz = float(r["swz"])
            new_beta, theta = _penalized_irls_update(
                Gw, gz, sw, swz, k, feats, i0, sig, nw, lam, alpha,
                standardize, theta, max_sweeps, tol * 0.01,
            )
            delta = float(np.max(np.abs(new_beta - beta))) if k else 0.0
            beta = new_beta
            n_iter += 1
            if exact_iterations is None and delta <= tol:
                converged = True
                break
        if exact_iterations is not None:
            converged = True
        elif not converged and n_iter > 0:
            # stopped at max_iter: the loop's deviance is one iteration
            # stale (see GLMElasticNet.deviance) — recompute at the
            # returned β with one scalar-only aggregation
            eta = F.lit(0.0)
            for c, bb in zip(xs, beta):
                eta = eta + F.lit(float(bb)) * c
            if off is not None:
                eta = eta + off
            mu = lnk.unlink(eta, one)
            if family == "binomial":
                mu = F.least(F.greatest(mu, F.lit(1e-10)), F.lit(1.0 - 1e-10))
            with no_aqe(work.sparkSession):
                dev = float(
                    work.agg(
                        (F.lit(2.0) * F.sum(wr * fam.deviance_term(y, mu, one)))
                        .alias("dev")
                    ).collect()[0]["dev"]
                )
    finally:
        work.unpersist()

    return GLMElasticNet(
        xnames=list(x_cols),
        yname=target,
        coefs=beta,
        family=family,
        link=fam.default_link,
        reg_param=lam,
        elastic_net_param=alpha,
        standardize=standardize,
        deviance=dev if dev is not None else float("nan"),
        nrow=n,
        iter=n_iter,
        converged=converged,
        levels=levels,
        call=(
            f"glm_elastic_net({formula}, family={family}, reg_param={lam}, "
            f"elastic_net_param={alpha}"
            + (f", var_power={var_power}" if family == "tweedie" else "")
            + (f", nb_alpha={nb_alpha}" if family == "negbinomial" else "")
            + (f", weight_col={weight_col}" if weight_col else "")
            + ")"
        ),
    )


def _collect_fold_rows(proj, aggs) -> dict:
    """ONE `groupBy('__fold')` aggregation job — the only data pass of a
    pathwise-CV outer iteration (`_glm_enet_pathwise`). Split out as the
    monkeypatch point for the job-count plan test: the lock-step design's
    load-bearing claim is that EVERY fold model (and the λ warm-start
    machinery) advances from this single aggregation."""
    from sparkglm_spark.plans.partitioning import no_aqe

    with no_aqe(proj.sparkSession):  # n_folds tiny rows; no AQE barrier
        return {
            int(r["__fold"]): r
            for r in proj.groupBy("__fold").agg(*aggs).collect()
        }


def _glm_enet_pathwise(
    df: DataFrame,
    formula: str,
    reg_params: list[float],
    fold_expr,
    n_folds: int,
    elastic_net_param: float,
    family: str,
    standardize: bool,
    na_action: str,
    max_iter: int,
    tol: float,
    max_sweeps: int,
    offset_col: str | None,
    exact_iterations: int | None,
    mode: str,
    weight_col: str | None = None,
    var_power: float = 1.5,
    nb_alpha: float = 1.0,
):
    """Shared engine of `glm_elastic_net_cv` (mode='cv') and
    `glm_elastic_net_path` (mode='path') — pathwise penalized IRLS with
    every model advancing in LOCK-STEP from one aggregation per outer
    iteration. `weight_col` applies the `glm_elastic_net(weight_col=)`
    convention per model: all statistical n's become the model's
    training Σω (assembled fold-additively like the moments), feature
    stds use the reliability-weights denominator Σω − Σω²/Σω (the
    probed MLlib summarizer convention — see `glm_elastic_net`), IRLS
    working weights and deviances pick up ω, and weight-domain
    violations raise upfront; a training set with ≤ 1 effective row
    degenerates that fold (skipped like a constant-label fold).
    Details:

    * mode='cv': one model per fold j (trained on all rows with
      __fold ≠ j). Each outer iteration projects every ACTIVE model's
      (w, z) columns and runs ONE `groupBy(__fold)`
      zw-Gram aggregation; model j's training Gram is the sum of the
      other folds' blocks (Gram additivity over groups — the
      `fold_gram_collect` idea lifted to IRLS working responses, which
      depend on each model's own β and so need per-model blocks).
    * mode='path': a single full-data model, same machinery with one
      constant fold group.

    λs run DESCENDING with warm starts (glmnet's pathwise design), so
    each λ's IRLS usually converges in 1-3 iterations after the first.
    Per-model standardization uses the model's own TRAINING sample stds
    (assembled from per-fold Σx/Σx² — the convention a cold fit on the
    filtered training rows would use, parity-tested at 1e-8). Total
    jobs: 1 upfront moments pass + Σ_λ(iterations) Gram passes + a
    final deviance pass evaluating every (λ, model) at its CONVERGED β
    (so reported deviances describe the returned fits, not the
    penultimate iterate — the `GLMElasticNet.deviance` lesson applied
    from birth).

    Returns (rows, x_cols, has_int, n_total) where rows is a list of
    dicts, one per (λ, state)."""
    from sparkglm_spark.functions.families import get_family
    from sparkglm_spark.functions.links import get_link
    from sparkglm_spark.plans.partitioning import ensure_parallel

    if family not in _ENET_FAMILIES:
        raise ValueError(
            f"glm_elastic_net supports {'/'.join(_ENET_FAMILIES)}, "
            f"got {family!r}"
        )
    if not reg_params:
        raise ValueError("reg_params must be non-empty")
    alpha = float(elastic_net_param)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("elastic_net_param must be in [0, 1]")
    if any(float(l) < 0.0 for l in reg_params):
        raise ValueError("reg_param must be >= 0")
    if exact_iterations is not None and exact_iterations < 1:
        raise ValueError("exact_iterations must be >= 1")
    fam = get_family(family, var_power, nb_alpha)
    lnk = get_link(fam.default_link)

    if mode == "cv":
        if isinstance(fold_expr, str):
            fold_expr = F.col(fold_expr)
        base = df.withColumn("__fold", fold_expr.cast("int"))
    else:
        base = df.withColumn("__fold", F.lit(0))
        n_folds = 1
    extra = [c for c in (offset_col, weight_col) if c]
    encoded, x_cols, target, _levels = _encode_formula(
        base, formula, na_action, extra_cols=["__fold"] + extra,
    )
    has_int = "intercept" in x_cols
    i0 = x_cols.index("intercept") if has_int else None
    feats = [i for i in range(len(x_cols)) if i != i0]
    k = len(x_cols)
    p = len(feats)
    y = F.col(target)
    one = F.lit(1.0)
    off = F.col(offset_col).cast("double") if offset_col else None
    wt = F.col(weight_col).cast("double") if weight_col else None
    wr = wt if wt is not None else one  # per-row prior weight ω

    work = ensure_parallel(
        encoded.select("__fold", target, *x_cols, *extra)
    ).persist()
    try:
        # ------ upfront pass: per-fold moments (one job) ------
        aggs0 = [
            F.count(F.lit(1)).alias("n"),
            F.sum(wr * y).alias("sy"),
            F.min(y).alias("ymin"),
            F.max(y).alias("ymax"),
        ]
        if wt is not None:
            aggs0 += [
                F.sum(wt).alias("sw0"),
                F.sum(wt * wt).alias("sww"),
                F.min(wt).alias("minw"),
                F.count(wt).alias("n_w"),
            ]
        if off is not None:
            aggs0.append(F.sum(wr * off).alias("soff"))
        for i, j in enumerate(feats):
            c = F.col(x_cols[j])
            aggs0.append(F.sum(wr * c).alias(f"s_{i}"))
            aggs0.append(F.sum(wr * c * c).alias(f"ss_{i}"))
        groups = _collect_fold_rows(work, aggs0)
        if wt is not None and groups:
            # weight-domain guards over ALL rows, assembled from the
            # same per-fold aggregation (shared guard: operators/lm.py::
            # check_weight_domain); an EMPTY groups dict falls through
            # to the n_total guard below (code-review r11: the old
            # inline min() crashed on it)
            check_weight_domain(
                weight_col,
                n=sum(int(r["n"]) for r in groups.values()),
                n_w=sum(int(r["n_w"]) for r in groups.values()),
                min_w=min(
                    (
                        float(r["minw"])
                        for r in groups.values()
                        if r["minw"] is not None
                    ),
                    default=None,
                ),
                sum_w=sum(float(r["sw0"]) for r in groups.values()),
            )
        bad = sorted(g for g in groups if not 0 <= g < n_folds)
        if bad:
            raise ValueError(
                f"fold ids {bad} are outside [0, {n_folds}) — fix "
                "fold_expr or n_folds (a dropped fold would bias every "
                "training set)"
            )
        n_total = sum(int(r["n"]) for r in groups.values())
        if n_total <= 1:
            raise ValueError("need more than one row")
        ymin = min(float(r["ymin"]) for r in groups.values())
        ymax = max(float(r["ymax"]) for r in groups.values())
        dom_err = _enet_label_domain_error(family, ymin, ymax)
        if dom_err:
            raise ValueError(dom_err)


        # ------ per-state fixed stats from group-moment additivity ------
        states = []
        for j in (range(n_folds) if mode == "cv" else [None]):
            tg = [g for g in groups if g != j] if mode == "cv" else list(groups)
            if mode == "cv" and j not in groups:
                continue  # no validation rows — nothing to report
            n_t = sum(int(groups[g]["n"]) for g in tg)
            if n_t <= 1:
                continue
            if wt is not None:
                nw_t = sum(float(groups[g]["sw0"]) for g in tg)
                sww_t = sum(float(groups[g]["sww"]) for g in tg)
                if nw_t <= 0.0 or nw_t - sww_t / nw_t <= 0.0:
                    continue  # ≤ 1 effective training row — degenerate
                sdenom = nw_t - sww_t / nw_t
            else:
                nw_t = float(n_t)
                sdenom = float(n_t - 1)
            sy_t = sum(float(groups[g]["sy"]) for g in tg)
            ybar = sy_t / nw_t
            if family == "binomial" and not 0.0 < ybar < 1.0:
                continue  # constant training label — degenerate fold
            if family != "binomial" and ybar <= 0.0:
                continue  # log init needs ybar > 0 (all-zero fold)
            ms = np.array(
                [sum(float(groups[g][f"s_{i}"]) for g in tg) for i in range(p)]
            ) / nw_t
            ss = np.array(
                [sum(float(groups[g][f"ss_{i}"]) for g in tg) for i in range(p)]
            )
            sig = np.sqrt(np.maximum((ss - nw_t * ms * ms) / sdenom, 0.0))
            beta = np.zeros(k)
            if has_int:
                beta[i0] = _np_link_init(family, ybar)
                if off is not None:
                    soff_t = sum(float(groups[g]["soff"]) for g in tg)
                    beta[i0] -= soff_t / nw_t
            states.append(
                dict(
                    j=j, train=tg, n_t=n_t, nw_t=nw_t, sig=sig,
                    beta=beta, theta=np.zeros(p),
                )
            )
        if not states:
            # ADVICE r11: in path mode this IS the single full-data model
            # — fail with the single-fit vocabulary, not fold-speak (and
            # never return an empty frame for degenerate data)
            if mode == "path":
                raise ValueError(
                    "degenerate input: constant label or <= 1 effective "
                    "row — nothing to fit (glm_elastic_net would raise on "
                    "the same data)"
                )
            raise ValueError("no fittable fold models (degenerate folds)")

        # ------ pathwise λ loop, folds in lock-step ------
        def state_exprs(s):
            eta_lin = F.lit(0.0)
            for c_name, bb in zip(x_cols, s["beta"]):
                eta_lin = eta_lin + F.lit(float(bb)) * F.col(c_name)
            eta = eta_lin if off is None else eta_lin + off
            mu = lnk.unlink(eta, one)
            if family == "binomial":
                mu = F.least(F.greatest(mu, F.lit(1e-10)), F.lit(1.0 - 1e-10))
            grad = lnk.lprime(mu, one)
            w = wr / (fam.variance(mu, one) * grad * grad)
            z = eta_lin + (y - mu) * grad
            return w, z

        results = []  # one dict per (λ, state)
        # duplicate input λs fit ONCE (code-review r11: a duplicate
        # re-ran the whole lock-step IRLS only for its results to be
        # discarded); rows are re-expanded to the input multiset after
        # the deviance pass
        lam_in_sorted = sorted((float(v) for v in reg_params), reverse=True)
        lams = sorted(set(lam_in_sorted), reverse=True)
        for lam in lams:
            for s in states:
                s["active"] = True
                s["iters"] = 0
                s["conv"] = False
            n_pass = exact_iterations if exact_iterations is not None else max_iter
            for _ in range(n_pass):
                live = [s for s in states if s["active"]]
                if not live:
                    break
                sel = [F.col("__fold")] + [F.col(c) for c in x_cols]
                aggs = []
                for si, s in enumerate(live):
                    # no per-iteration deviance column: nothing reads it —
                    # the FINAL chunked pass evaluates every (λ, model) at
                    # its returned β (code-review r11: the dead dv{si}
                    # agg cost one full-data deviance scan per live model
                    # per iteration)
                    w, z = state_exprs(s)
                    sel.append(w.alias(f"__w{si}"))
                    sel.append(z.alias(f"__z{si}"))
                proj = work.select(*sel)
                xs = [F.col(c) for c in x_cols]
                for si in range(len(live)):
                    w_c, z_c = F.col(f"__w{si}"), F.col(f"__z{si}")
                    for i in range(k):
                        for j2 in range(i, k):
                            aggs.append(
                                F.sum(w_c * xs[i] * xs[j2]).alias(f"g{si}_{i}_{j2}")
                            )
                        aggs.append(F.sum(w_c * xs[i] * z_c).alias(f"xz{si}_{i}"))
                    aggs.append(F.sum(w_c).alias(f"sw{si}"))
                    aggs.append(F.sum(w_c * z_c).alias(f"swz{si}"))
                rows = _collect_fold_rows(proj, aggs)
                for si, s in enumerate(live):
                    Gw = np.zeros((k, k))
                    gz = np.zeros(k)
                    sw = swz = 0.0
                    for g in s["train"]:
                        r = rows[g]
                        for i in range(k):
                            for j2 in range(i, k):
                                v = float(r[f"g{si}_{i}_{j2}"])
                                Gw[i, j2] += v
                                if j2 != i:
                                    Gw[j2, i] += v
                            gz[i] += float(r[f"xz{si}_{i}"])
                        sw += float(r[f"sw{si}"])
                        swz += float(r[f"swz{si}"])
                    new_beta, s["theta"] = _penalized_irls_update(
                        Gw, gz, sw, swz, k, feats, i0, s["sig"], s["nw_t"],
                        lam, alpha, standardize, s["theta"], max_sweeps,
                        tol * 0.01,
                    )
                    delta = float(np.max(np.abs(new_beta - s["beta"])))
                    s["beta"] = new_beta
                    s["iters"] += 1
                    if exact_iterations is None and delta <= tol:
                        s["conv"] = True
                        s["active"] = False
            if exact_iterations is not None:
                for s in states:
                    s["conv"] = True
            for s in states:
                results.append(
                    dict(
                        lam=lam, j=s["j"], beta=s["beta"].copy(),
                        n_t=s["n_t"], iters=s["iters"], conv=s["conv"],
                    )
                )

        # ------ final deviance pass: every (λ, model) at its FINAL β ------
        # (chunked if the grid is huge — ≤64 deviance columns per pass)
        dev_cols = {}
        chunk = 64
        for lo in range(0, len(results), chunk):
            part = results[lo : lo + chunk]
            sel = [F.col("__fold")]
            for ri, res in enumerate(part):
                eta = F.lit(0.0)
                for c_name, bb in zip(x_cols, res["beta"]):
                    eta = eta + F.lit(float(bb)) * F.col(c_name)
                if off is not None:
                    eta = eta + off
                mu = lnk.unlink(eta, one)
                if family == "binomial":
                    mu = F.least(F.greatest(mu, F.lit(1e-10)), F.lit(1.0 - 1e-10))
                sel.append((wr * fam.deviance_term(y, mu, one)).alias(f"__fd{ri}"))
            proj = work.select(*sel)
            aggs = [
                (F.lit(2.0) * F.sum(F.col(f"__fd{ri}"))).alias(f"dv{ri}")
                for ri in range(len(part))
            ]
            rows = _collect_fold_rows(proj, aggs)
            for ri, res in enumerate(part):
                per_group = {g: float(rows[g][f"dv{ri}"]) for g in rows}
                dev_cols[lo + ri] = per_group
        for idx, res in enumerate(results):
            per_group = dev_cols[idx]
            if res["j"] is None:
                res["dev_train"] = sum(per_group.values())
                res["dev_val"] = None
                res["n_v"] = 0
            else:
                res["dev_train"] = sum(
                    v for g, v in per_group.items() if g != res["j"]
                )
                res["dev_val"] = per_group.get(res["j"])
                res["n_v"] = int(groups[res["j"]]["n"]) if res["j"] in groups else 0
        if len(lams) != len(lam_in_sorted):
            # re-expand duplicate input λs (row dicts shared read-only —
            # both wrappers only read them)
            by_lam_rows: dict[float, list] = {}
            for r in results:
                by_lam_rows.setdefault(r["lam"], []).append(r)
            results = [r for lam in lam_in_sorted for r in by_lam_rows[lam]]
    finally:
        work.unpersist()
    return results, x_cols, has_int, n_total


def glm_elastic_net_cv(
    df: DataFrame,
    formula: str,
    reg_params: list[float],
    fold_expr,
    n_folds: int = 5,
    elastic_net_param: float = 1.0,
    family: str = "binomial",
    standardize: bool = True,
    na_action: str = "omit",
    max_iter: int = 100,
    tol: float = 1e-10,
    max_sweeps: int = 1000,
    offset_col: str | None = None,
    exact_iterations: int | None = None,
    weight_col: str | None = None,
    var_power: float = 1.5,
    nb_alpha: float = 1.0,
) -> DataFrame:
    """K-fold cross-validation for the penalized GLM (`glm_elastic_net`)
    over a λ grid — the sparse-logistic λ-selection surface (VERDICT
    r10 #1). A naive loop costs folds × λs separate IRLS fits, each
    paying its own per-iteration aggregation; here every fold model
    advances in LOCK-STEP from ONE `groupBy(fold)` zw-Gram aggregation
    per outer iteration (each model's training Gram = the sum of the
    other folds' blocks), and the λ grid runs descending with warm
    starts so later λs converge in 1-3 iterations. Total data passes:
    1 moments pass + Σ_λ(iterations) + 1 final deviance pass — at any
    data size (see `_glm_enet_pathwise`).

    Held-out metric: `deviance_val` is the model's deviance over its
    OWN fold's rows, evaluated at the final converged β (the natural
    GLM generalization of CV RMSE; select λ by the Σ over folds —
    glmnet's cv deviance). `deviance_train` is the training-rows twin.

    `fold_expr`: integer column/expression in [0, n_folds); out-of-range
    ids raise. Degenerate folds (constant training label) are skipped.
    `offset_col` follows the `glm_elastic_net` offset contract;
    `weight_col` the `glm_elastic_net(weight_col=)` convention (per-fold
    training Σω as the statistical n, ω-weighted deviances — so
    `deviance_val` is the ω-weighted held-out deviance).
    `exact_iterations=N` runs exactly N lock-step iterations per λ (the
    oracle-pin hook).

    Returns one row per (reg_param, fold): reg_param, fold, n_train,
    n_val, deviance_train, deviance_val, n_nonzero, iterations,
    converged."""
    results, x_cols, _has_int, _n = _glm_enet_pathwise(
        df, formula, reg_params, fold_expr, n_folds, elastic_net_param,
        family, standardize, na_action, max_iter, tol, max_sweeps,
        offset_col, exact_iterations, mode="cv", weight_col=weight_col,
        var_power=var_power,
        nb_alpha=nb_alpha,
    )
    out = [
        (
            float(r["lam"]),
            int(r["j"]),
            int(r["n_t"]),
            int(r["n_v"]),
            float(r["dev_train"]),
            float(r["dev_val"]) if r["dev_val"] is not None else None,
            _count_nonzero(x_cols, r["beta"]),
            int(r["iters"]),
            bool(r["conv"]),
        )
        for r in results
    ]
    return df.sparkSession.createDataFrame(
        out,
        "reg_param double, fold int, n_train bigint, n_val bigint, "
        "deviance_train double, deviance_val double, n_nonzero int, "
        "iterations int, converged boolean",
    )


def glm_elastic_net_path(
    df: DataFrame,
    formula: str,
    reg_params: list[float],
    elastic_net_param: float = 1.0,
    family: str = "binomial",
    standardize: bool = True,
    na_action: str = "omit",
    max_iter: int = 100,
    tol: float = 1e-10,
    max_sweeps: int = 1000,
    offset_col: str | None = None,
    weight_col: str | None = None,
    exact_iterations: int | None = None,
    var_power: float = 1.5,
    nb_alpha: float = 1.0,
) -> DataFrame:
    """The whole penalized-GLM regularization path — full-data fits for
    every λ, descending with warm starts on the shared pathwise engine
    (`_glm_enet_pathwise`; each outer iteration is one aggregation, the
    `glm_elastic_net` cost shape). Coefficients per λ come back in long
    format with the λ-selection criteria:

        aic = deviance + 2·df      bic = deviance + ln(n)·df

    with df = n_nonzero (+1 with an intercept) — the deviance-based
    information criteria (they differ from −2ℓℓ + penalty by the
    saturated-model constant, which is λ-independent and cancels out of
    the argmin; the lasso-df estimate is the `elastic_net_path`
    convention, Zou-Hastie-Tibshirani 2007). Deviance is evaluated at
    the FINAL β of each λ (one chunked deviance pass). With
    `weight_col` the deviance (hence aic/bic) is ω-weighted while
    bic's ln(n) keeps the ROW count (the glmnet nobs convention).

    `exact_iterations=N` runs exactly N outer solves per λ (warm starts
    still carry β across λs) with no convergence exit — the oracle-pin
    hook, same contract as `glm_elastic_net_cv`.

    Returns one (reg_param, term) row block per input λ: reg_param,
    term, estimate, n_nonzero, iterations, deviance, aic, bic."""
    results, x_cols, has_int, n_total = _glm_enet_pathwise(
        df, formula, reg_params, None, 1, elastic_net_param,
        family, standardize, na_action, max_iter, tol, max_sweeps,
        offset_col, exact_iterations, mode="path", weight_col=weight_col,
        var_power=var_power,
        nb_alpha=nb_alpha,
    )
    # one block per INPUT λ (duplicates produce duplicate blocks — the
    # elastic_net_path contract); the engine deduplicates nothing
    by_lam: dict[float, dict] = {}
    for r in results:
        by_lam.setdefault(r["lam"], r)
    out = []
    for lam_in in sorted((float(v) for v in reg_params), reverse=True):
        r = by_lam[lam_in]
        nz = _count_nonzero(x_cols, r["beta"])
        dof = nz + (1 if has_int else 0)
        dev = float(r["dev_train"])
        aic = dev + 2.0 * dof
        bic = dev + float(np.log(n_total)) * dof
        for nm, c in zip(x_cols, r["beta"]):
            out.append(
                (lam_in, nm, float(c), nz, int(r["iters"]), dev, aic, bic)
            )
    return df.sparkSession.createDataFrame(
        out,
        "reg_param double, term string, estimate double, n_nonzero int, "
        "iterations int, deviance double, aic double, bic double",
    )


def _np_link_init(fam_name: str, mu0: float) -> float:
    """Shared intercept-init link — binomial logit with the μ clamp,
    poisson log with the underflow floor: ONE definition for
    `_glm_enet_pathwise`, `glm_elastic_net_grouped` and
    `glm_elastic_net_cv_grouped` (review r12: three copies had
    appeared — the `_np_glm_irls_kernels` lesson again; upstream
    ybar-domain guards make the poisson floor a no-op, so the grouped
    paths are bitwise-unchanged)."""
    if fam_name == "binomial":
        mu0 = min(max(mu0, 1e-10), 1 - 1e-10)
        return float(np.log(mu0 / (1 - mu0)))
    return float(np.log(max(mu0, 1e-300)))


def _np_glm_irls_kernels(
    fam_name: str, y, eta_lin, ov, var_power: float = 1.5,
    nb_alpha: float = 1.0,
):
    """One IRLS step's per-row kernels, numpy twin of the distributed
    engine's (μ, w, z) projection — shared by `glm_elastic_net_grouped`
    and `glm_elastic_net_cv_grouped` (the `_penalized_irls_update`
    dedup lesson applied before a third copy could drift). η = Xβ + o;
    binomial clamps μ to [1e-10, 1−1e-10] BEFORE the weight/working
    response (the `glm_elastic_net` convention). Log-link working
    weight w = μ²/V(μ): poisson μ, gamma 1, tweedie μ^(2−p) (r13)."""
    eta = eta_lin + ov
    # errstate: a deviance-only caller discards z, but an underflowed
    # poisson μ = 0 would still warn on (y−μ)/μ (code-review r12)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        if fam_name == "binomial":
            mu = np.clip(1 / (1 + np.exp(-eta)), 1e-10, 1 - 1e-10)
            w = mu * (1 - mu)
            z = eta_lin + (y - mu) / (mu * (1 - mu))
        else:
            mu = np.exp(eta)
            if fam_name == "gamma":
                w = np.ones_like(mu)
            elif fam_name == "tweedie":
                w = mu ** (2.0 - var_power)
            elif fam_name == "negbinomial":
                # log link, V = mu + alpha*mu^2: w = mu^2/V = mu/(1+alpha*mu)
                w = mu / (1.0 + nb_alpha * mu)
            else:  # poisson (quasi twins route through their base)
                w = mu
            z = eta_lin + (y - mu) / mu
    return mu, w, z


def _np_glm_deviance(
    fam_name: str, y, mu, wv, var_power: float = 1.5,
    nb_alpha: float = 1.0,
) -> float:
    """ω-weighted deviance at μ, numpy twin of the engine's final
    deviance pass (binomial clamp already applied by the caller)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        if fam_name == "binomial":
            t1 = np.where(y > 0, y * np.log(y / mu), 0.0)
            t2 = np.where(y < 1, (1 - y) * np.log((1 - y) / (1 - mu)), 0.0)
            return float(2.0 * (wv * (t1 + t2)).sum())
        if fam_name == "gamma":
            # −log(y/μ) + (y−μ)/μ (y > 0 guarded upstream)
            return float(
                2.0 * (wv * (-np.log(y / mu) + (y - mu) / mu)).sum()
            )
        if fam_name == "tweedie":
            # ½·unit deviance for 1 < p < 2; y = 0 keeps only the tail
            # μ^(2−p)/(2−p) (the families.py when() twin)
            p = var_power
            tail = mu ** (2.0 - p) / (2.0 - p)
            full = (
                y ** (2.0 - p) / ((1.0 - p) * (2.0 - p))
                - y * mu ** (1.0 - p) / (1.0 - p)
                + tail
            )
            return float(2.0 * (wv * np.where(y == 0, tail, full)).sum())
        if fam_name == "negbinomial":
            # NB2 unit deviance (families.py twin): y*ln(y/mu) -
            # (y+1/a)*ln((1+ay)/(1+a*mu)); y = 0 keeps (1/a)*ln(1+a*mu)
            a = nb_alpha
            zero = (1.0 / a) * np.log(1.0 + a * mu)
            full = np.where(y > 0, y * np.log(np.where(y > 0, y, 1.0) / mu), 0.0) - (
                y + 1.0 / a
            ) * np.log((1.0 + a * y) / (1.0 + a * mu))
            return float(2.0 * (wv * np.where(y == 0, zero, full)).sum())
        t1 = np.where(y > 0, y * np.log(y / mu), 0.0)
        return float(2.0 * (wv * (t1 - (y - mu))).sum())


_ENET_FAMILIES = ("binomial", "poisson", "gamma", "tweedie", "negbinomial")


def _check_tweedie_var_power(family: str, var_power: float) -> None:
    """Tweedie's (1, 2) p-domain raise for entry-point guards — ONE
    definition (review r13: the same 4-line block had appeared in all
    three grouped fitters; the grouped twins call the numpy kernels
    directly, so without an upfront check a bad p returns
    plausible-but-wrong deviances where the single fit raises)."""
    if family == "tweedie":
        from sparkglm_spark.functions.families import get_family

        get_family(family, float(var_power))


def _check_nb_alpha(family: str, nb_alpha: float) -> None:
    """negbinomial's alpha > 0 raise for entry-point guards — the
    `_check_tweedie_var_power` twin (r14): the grouped fitters call the
    numpy kernels directly, so a bad alpha would NULL-degrade where the
    single fit raises."""
    if family == "negbinomial":
        from sparkglm_spark.functions.families import get_family

        get_family(family, alpha=float(nb_alpha))


def _enet_label_domain_error(family: str, ymin: float, ymax: float):
    """Shared penalized-fitter label-domain check: None when [ymin, ymax]
    lies in the family's support, else the raise/NULL-degrade message
    (one definition for all four fitters — the `_np_link_init` dedup
    lesson). binomial [0, 1]; poisson/tweedie/negbinomial ≥ 0; gamma
    STRICTLY > 0 (its deviance has log(y))."""
    if family == "binomial" and (ymin < 0.0 or ymax > 1.0):
        return (
            f"binomial label must lie in [0, 1]; observed [{ymin}, {ymax}]"
        )
    if family in ("poisson", "tweedie", "negbinomial") and ymin < 0.0:
        return f"{family} label must be >= 0; observed min = {ymin}"
    if family == "gamma" and ymin <= 0.0:
        return f"gamma label must be > 0; observed min = {ymin}"
    return None


def glm_elastic_net_grouped(
    df: DataFrame,
    formula: str,
    group_cols: list[str],
    reg_param: float | str,
    elastic_net_param: float = 1.0,
    family: str = "binomial",
    standardize: bool = True,
    na_action: str = "omit",
    max_iter: int = 100,
    tol: float = 1e-10,
    max_sweeps: int = 1000,
    weight_col: str | None = None,
    offset_col: str | None = None,
    exact_iterations: int | None = None,
    var_power: float = 1.5,
    nb_alpha: float = 1.0,
) -> DataFrame:
    """One sparse GLM per segment — the per-campaign / per-tenant
    feature-selection shape (L1 zeroes each segment's irrelevant
    covariates independently). Completes the grouped-fitter family:
    LM/GLM/Huber/quantile/Cox/AFT and the LINEAR elastic net all have
    grouped twins; this is the penalized-GLM one.

    Like `glm_grouped` (and unlike `elastic_net_grouped`'s pure-Gram
    shape) the penalized IRLS re-weights every iteration, so each
    group's rows materialize in its worker's Arrow batch and the numpy
    fold replicates `glm_elastic_net`'s exact conventions: upfront
    (reliability-weighted, when `weight_col`) sample feature stds,
    glmnet prox-Newton with the weighted-centered CD subproblem
    (`_cd_wls_penalized` — the SAME solver the distributed fit calls),
    unpenalized intercept, μ-clamp for binomial. `offset_col` follows
    the `glm_elastic_net` contract (η = Xβ + offset).

    Degenerate groups — n ≤ 1, out-of-domain labels, constant labels,
    bad weights (null/negative/NaN/Σω ≤ 0/≤ 1 effective row),
    non-finite offsets, singular subproblems — yield NULL estimates
    (the grouped NULL policy; note that under the default
    `na_action='omit'` a null OR NaN weight/offset drops its ROW before
    the fit like any other modeling column (na.drop treats NaN as
    missing) — the NULL policy catches what remains:
    negative/Σω ≤ 0, and null/NaN under 'keep'. ADVICE r11, review
    r12).
    `deviance` is evaluated at the RETURNED
    β (unlike the single fit's historical exit convention — a fresh
    surface gets the clean contract; this holds under
    `exact_iterations` too — the pinned SQL evaluates deviance at the
    N-th β). `exact_iterations=N` runs exactly N penalized-IRLS solves
    per group with no convergence exit (the oracle-pin hook, same
    contract as `glm_elastic_net`).

    `reg_param` may be a COLUMN NAME (r12): each group fits at ITS OWN
    λ read from that column — the refit half of the per-tenant
    selection workflow (`glm_elastic_net_cv_grouped` →
    `cv_select_lambda` → join the chosen reg_param back by group →
    refit here). The column must be constant within each group and
    finite ≥ 0; a violating group (mixed/null/NaN/negative λ)
    NULL-degrades like every other grouped degeneracy. Returns long
    format: group_cols…, term, estimate, n_rows, n_nonzero,
    iterations, converged, deviance."""
    from pyspark.sql import types as T

    from sparkglm_spark.operators.lm import _design

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if family not in _ENET_FAMILIES:
        raise ValueError(
            f"glm_elastic_net_grouped supports {'/'.join(_ENET_FAMILIES)}, "
            f"got {family!r}"
        )
    if isinstance(reg_param, str):
        if reg_param not in df.columns:
            raise ValueError(
                f"reg_param column {reg_param!r} not in the input frame"
            )
        # collision / type guards (review r12: a group-col or formula
        # collision crashed mid-job with an opaque worker error, and a
        # non-numeric column aborted every healthy group's Arrow batch)
        if reg_param in group_cols:
            raise ValueError(
                f"reg_param column {reg_param!r} is also a group column"
            )
        if reg_param in (weight_col, offset_col):
            raise ValueError(
                f"reg_param column {reg_param!r} is also the "
                "weight/offset column"
            )
        from sparkglm_spark.formula import parse_formula

        parsed0 = parse_formula(formula)
        if reg_param == parsed0.target or reg_param in parsed0.predictors:
            raise ValueError(
                f"reg_param column {reg_param!r} is referenced by the "
                "formula — a penalty cannot also be a modeling column"
            )
        t = df.schema[reg_param].dataType.simpleString()
        if t not in ("double", "float", "int", "bigint", "smallint",
                     "tinyint") and not t.startswith("decimal"):
            raise ValueError(
                f"reg_param column {reg_param!r} must be numeric, got {t}"
            )
        lam, lam_col = None, reg_param
    else:
        lam, lam_col = float(reg_param), None
        if lam < 0.0:
            raise ValueError("reg_param must be >= 0")
    alpha = float(elastic_net_param)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("elastic_net_param must be in [0, 1]")
    if exact_iterations is not None and exact_iterations < 1:
        raise ValueError("exact_iterations must be >= 1")
    _check_tweedie_var_power(family, var_power)
    _check_nb_alpha(family, nb_alpha)
    encoded, x_cols, target = _design(
        df, formula,
        list(group_cols) + ([lam_col] if lam_col else []),
        na_action=na_action,
        weight_col=weight_col, offset_col=offset_col,
    )
    if lam_col:
        # double-cast so EVERY numeric λ type reaches the Arrow batch as
        # float64 (review r12: a DecimalType column ships
        # decimal.Decimal objects whose None crashed to_numpy instead of
        # NULL-degrading; a double NULL becomes NaN → isfinite → NULL)
        encoded = encoded.withColumn(lam_col, F.col(lam_col).cast("double"))
    k = len(x_cols)
    has_int = "intercept" in x_cols
    i0 = x_cols.index("intercept") if has_int else None
    feats = [i for i in range(k) if i != i0]
    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField("term", T.StringType()),
            T.StructField("estimate", T.DoubleType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("n_nonzero", T.IntegerType()),
            T.StructField("iterations", T.IntegerType()),
            T.StructField("converged", T.BooleanType()),
            T.StructField("deviance", T.DoubleType()),
        ]
    )
    names = list(x_cols)
    gcols = list(group_cols)
    fam_name, std = family, standardize
    vp = float(var_power)
    na = float(nb_alpha)
    wname, oname = weight_col, offset_col
    lamname = lam_col
    exact_n = exact_iterations

    def fit_group(pdf):
        import pandas as pd

        X = pdf[names].to_numpy(dtype=np.float64)
        y = pdf[target].to_numpy(dtype=np.float64)
        n = len(y)
        wv = (
            pdf[wname].to_numpy(dtype=np.float64)
            if wname is not None
            else np.ones(n)
        )
        ov = (
            pdf[oname].to_numpy(dtype=np.float64)
            if oname is not None
            else np.zeros(n)
        )
        beta, it, conv, dev, nz = None, 0, False, None, None
        nw = float(wv.sum())
        sdenom = nw - float((wv * wv).sum()) / nw if nw > 0 else 0.0
        ok = (
            n > 1
            and np.all(np.isfinite(X))
            and np.all(np.isfinite(y))
            and np.all(np.isfinite(wv))
            and np.all(np.isfinite(ov))
            and np.all(wv >= 0.0)
            and nw > 0.0
            and sdenom > 0.0
        )
        lam_g = lam
        if ok and lamname is not None:
            lv = pdf[lamname].to_numpy(dtype=np.float64)
            # per-group λ: constant within the group, finite, ≥ 0 —
            # anything else NULL-degrades (the grouped policy)
            if (
                np.all(np.isfinite(lv))
                and float(lv.min()) >= 0.0
                and float(lv.min()) == float(lv.max())
            ):
                lam_g = float(lv[0])
            else:
                ok = False
        if ok:
            # the shared four-fitter domain rule (one definition —
            # review r13: three hand-written boolean twins had appeared)
            ok = _enet_label_domain_error(
                fam_name, float(y.min()), float(y.max())
            ) is None
        if ok:
            ybar = float((wv * y).sum()) / nw
            if fam_name == "binomial":
                ok = 0.0 < ybar < 1.0
            else:
                ok = ybar > 0.0
        if ok:
            Xf = X[:, feats]
            m_f = (wv[:, None] * Xf).sum(0) / nw
            ss_f = (wv[:, None] * Xf * Xf).sum(0)
            sig = np.sqrt(np.maximum((ss_f - nw * m_f * m_f) / sdenom, 0.0))
            b = np.zeros(k)
            if has_int:
                b[i0] = _np_link_init(fam_name, ybar)
                if oname is not None:
                    b[i0] -= float((wv * ov).sum()) / nw
            theta = np.zeros(len(feats))
            n_pass = exact_n if exact_n is not None else max_iter
            try:
                for _ in range(n_pass):
                    eta_lin = X @ b
                    _mu, w0, z = _np_glm_irls_kernels(
                        fam_name, y, eta_lin, ov, vp, na
                    )
                    wirls = wv * w0
                    sw = float(wirls.sum())
                    swz = float((wirls * z).sum())
                    Xw = X * wirls[:, None]
                    Gw = X.T @ Xw
                    gz = Xw.T @ z
                    nb, theta = _penalized_irls_update(
                        Gw, gz, sw, swz, k, feats, i0, sig, nw, lam_g,
                        alpha, std, theta, max_sweeps, tol * 0.01,
                    )
                    delta = float(np.max(np.abs(nb - b)))
                    b = nb
                    it += 1
                    if exact_n is None and delta <= tol:
                        conv = True
                        break
                if exact_n is not None:
                    conv = True
                # deviance at the RETURNED beta
                mu, _w0, _z = _np_glm_irls_kernels(fam_name, y, X @ b, ov, vp, na)
                dev = _np_glm_deviance(fam_name, y, mu, wv, vp, na)
                if not np.all(np.isfinite(b)) or not np.isfinite(dev):
                    b, dev = None, None
                else:
                    beta = b
                    nz = _count_nonzero(names, beta)
            except (ValueError, np.linalg.LinAlgError):
                beta = None
        cols: dict[str, list] = {c: [] for c in gcols}
        cols.update(
            term=[], estimate=[], n_rows=[], n_nonzero=[], iterations=[],
            converged=[], deviance=[],
        )
        for i, name in enumerate(names):
            for c in gcols:
                cols[c].append(pdf[c].iloc[0])
            cols["term"].append(name)
            cols["estimate"].append(
                float(beta[i]) if beta is not None else None
            )
            cols["n_rows"].append(n)
            cols["n_nonzero"].append(nz)
            cols["iterations"].append(it)
            cols["converged"].append(bool(conv) if beta is not None else False)
            cols["deviance"].append(dev if beta is not None else None)
        return pd.DataFrame(cols)

    from sparkglm_spark.plans.partitioning import fanout_groups

    return fanout_groups(encoded, gcols).groupBy(*gcols).applyInPandas(
        fit_group, out_schema
    )


def glm_elastic_net_path_grouped(
    df: DataFrame,
    formula: str,
    group_cols: list[str],
    reg_params: list[float],
    elastic_net_param: float = 1.0,
    family: str = "binomial",
    standardize: bool = True,
    na_action: str = "omit",
    max_iter: int = 100,
    tol: float = 1e-10,
    max_sweeps: int = 1000,
    weight_col: str | None = None,
    offset_col: str | None = None,
    exact_iterations: int | None = None,
    var_power: float = 1.5,
    nb_alpha: float = 1.0,
) -> DataFrame:
    """Per-segment regularization PATH (VERDICT r12 #9) — the grouped
    sibling `glm_elastic_net_path` lacked: one warm-started descending-λ
    coefficient path per group, for per-tenant regularization
    diagnostics (which features enter at which λ, per segment). Each
    group's rows land in one Arrow batch and the numpy twin replays the
    single-fit path's exact conventions: fixed upfront stds
    (reliability-weighted under `weight_col`), glmnet prox-Newton via
    the shared `_penalized_irls_update`/`_np_glm_irls_kernels`, λs
    DESCENDING with warm starts (β carries across λs), deviance per λ
    at ITS final β, and deviance-based aic/bic with the lasso-df
    estimate (df = n_nonzero + intercept; bic's ln(n) keeps the ROW
    count — the glmnet nobs convention). Duplicate input λs re-expand
    to duplicate row blocks (the path contract). Families per
    `glm_elastic_net` (binomial/poisson/gamma/tweedie(`var_power`)).

    Degenerate groups (n ≤ 1, out-of-domain/constant labels, bad
    weights/offsets, non-finite values, solver failure) emit NULL
    estimate/deviance rows per (λ, term) — the grouped NULL policy,
    where the single-fit path raises. `exact_iterations=N` runs exactly
    N solves per λ (warm starts still carry β — the pin hook). Returns
    long format: group_cols…, reg_param, term, estimate, n_nonzero,
    iterations, deviance, aic, bic, converged."""
    from pyspark.sql import types as T

    from sparkglm_spark.operators.lm import _design

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if family not in _ENET_FAMILIES:
        raise ValueError(
            f"glm_elastic_net_path_grouped supports "
            f"{'/'.join(_ENET_FAMILIES)}, got {family!r}"
        )
    if not reg_params:
        raise ValueError("reg_params must be non-empty")
    if any(float(l) < 0.0 for l in reg_params):
        raise ValueError("reg_param must be >= 0")
    alpha = float(elastic_net_param)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("elastic_net_param must be in [0, 1]")
    if exact_iterations is not None and exact_iterations < 1:
        raise ValueError("exact_iterations must be >= 1")
    _check_tweedie_var_power(family, var_power)
    _check_nb_alpha(family, nb_alpha)
    encoded, x_cols, target = _design(
        df, formula, list(group_cols), na_action=na_action,
        weight_col=weight_col, offset_col=offset_col,
    )
    k = len(x_cols)
    has_int = "intercept" in x_cols
    i0 = x_cols.index("intercept") if has_int else None
    feats = [i for i in range(k) if i != i0]
    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField("reg_param", T.DoubleType()),
            T.StructField("term", T.StringType()),
            T.StructField("estimate", T.DoubleType()),
            T.StructField("n_nonzero", T.IntegerType()),
            T.StructField("iterations", T.IntegerType()),
            T.StructField("deviance", T.DoubleType()),
            T.StructField("aic", T.DoubleType()),
            T.StructField("bic", T.DoubleType()),
            T.StructField("converged", T.BooleanType()),
        ]
    )
    names = list(x_cols)
    gcols = list(group_cols)
    fam_name, std = family, standardize
    vp = float(var_power)
    na = float(nb_alpha)
    wname, oname = weight_col, offset_col
    lam_in_sorted = sorted((float(v) for v in reg_params), reverse=True)
    lams = sorted(set(lam_in_sorted), reverse=True)
    exact_n = exact_iterations

    def fit_group(pdf):
        import pandas as pd

        X = pdf[names].to_numpy(dtype=np.float64)
        y = pdf[target].to_numpy(dtype=np.float64)
        n = len(y)
        wv = (
            pdf[wname].to_numpy(dtype=np.float64)
            if wname is not None
            else np.ones(n)
        )
        ov = (
            pdf[oname].to_numpy(dtype=np.float64)
            if oname is not None
            else np.zeros(n)
        )
        gkey = tuple(pdf[c].iloc[0] for c in gcols)

        def null_rows():
            return pd.DataFrame(
                [
                    gkey + (lam, nm, None, None, 0, None, None, None, False)
                    for lam in lam_in_sorted
                    for nm in names
                ],
                columns=[f.name for f in out_schema],
            )

        nw = float(wv.sum())
        sdenom = nw - float((wv * wv).sum()) / nw if nw > 0 else 0.0
        ok = (
            n > 1
            and np.all(np.isfinite(X))
            and np.all(np.isfinite(y))
            and np.all(np.isfinite(wv))
            and np.all(wv >= 0.0)
            and np.all(np.isfinite(ov))
            and nw > 0.0
            and sdenom > 0.0
        )
        if ok:
            # the shared four-fitter domain rule (one definition —
            # review r13: three hand-written boolean twins had appeared)
            ok = _enet_label_domain_error(
                fam_name, float(y.min()), float(y.max())
            ) is None
        if ok:
            ybar = float((wv * y).sum()) / nw
            if fam_name == "binomial":
                ok = 0.0 < ybar < 1.0
            else:
                ok = ybar > 0.0
        if not ok:
            return null_rows()
        Xf = X[:, feats]
        m_f = (wv[:, None] * Xf).sum(0) / nw
        ss_f = (wv[:, None] * Xf * Xf).sum(0)
        sig = np.sqrt(np.maximum((ss_f - nw * m_f * m_f) / sdenom, 0.0))
        b = np.zeros(k)
        if has_int:
            b[i0] = _np_link_init(fam_name, ybar)
            if oname is not None:
                b[i0] -= float((wv * ov).sum()) / nw
        theta = np.zeros(len(feats))
        by_lam: dict[float, tuple] = {}
        try:
            for lam_g in lams:
                it, conv = 0, False
                n_pass = exact_n if exact_n is not None else max_iter
                for _ in range(n_pass):
                    eta_lin = X @ b
                    _mu, w0, z = _np_glm_irls_kernels(
                        fam_name, y, eta_lin, ov, vp, na
                    )
                    wirls = wv * w0
                    sw = float(wirls.sum())
                    swz = float((wirls * z).sum())
                    Xw = X * wirls[:, None]
                    Gw = X.T @ Xw
                    gz = Xw.T @ z
                    nb, theta = _penalized_irls_update(
                        Gw, gz, sw, swz, k, feats, i0, sig, nw, lam_g,
                        alpha, std, theta, max_sweeps, tol * 0.01,
                    )
                    delta = float(np.max(np.abs(nb - b)))
                    b = nb
                    it += 1
                    if exact_n is None and delta <= tol:
                        conv = True
                        break
                if exact_n is not None:
                    conv = True
                # deviance/aic/bic at THIS λ's final β (the path
                # convention — same evaluation the single fit makes)
                mu, _w0, _z = _np_glm_irls_kernels(fam_name, y, X @ b, ov, vp, na)
                dev = _np_glm_deviance(fam_name, y, mu, wv, vp, na)
                nz = _count_nonzero(names, b)
                dof = nz + (1 if has_int else 0)
                aic = dev + 2.0 * dof
                bic = dev + float(np.log(n)) * dof
                if not np.all(np.isfinite(b)) or not np.isfinite(dev):
                    return null_rows()
                by_lam[lam_g] = (b.copy(), nz, it, dev, aic, bic, conv)
        except (ValueError, np.linalg.LinAlgError):
            return null_rows()
        rows = []
        for lam_in in lam_in_sorted:  # duplicate input λs re-expand
            bb, nz, it, dev, aic, bic, conv = by_lam[lam_in]
            for j, nm in enumerate(names):
                rows.append(
                    gkey
                    + (lam_in, nm, float(bb[j]), nz, it, dev, aic, bic,
                       bool(conv))
                )
        return pd.DataFrame(rows, columns=[f.name for f in out_schema])

    from sparkglm_spark.plans.partitioning import fanout_groups

    sel = [*gcols, target, *x_cols]
    for c in (wname, oname):
        if c:
            sel.append(c)
    return fanout_groups(encoded.select(*sel), gcols).groupBy(*gcols).applyInPandas(
        fit_group, out_schema
    )


def glm_elastic_net_cv_grouped(
    df: DataFrame,
    formula: str,
    group_cols: list[str],
    reg_params: list[float],
    fold_expr,
    n_folds: int = 5,
    elastic_net_param: float = 1.0,
    family: str = "binomial",
    standardize: bool = True,
    na_action: str = "omit",
    max_iter: int = 100,
    tol: float = 1e-10,
    max_sweeps: int = 1000,
    weight_col: str | None = None,
    offset_col: str | None = None,
    exact_iterations: int | None = None,
    var_power: float = 1.5,
    nb_alpha: float = 1.0,
) -> DataFrame:
    """Per-segment λ selection for the sparse GLM — K-fold CV of
    `glm_elastic_net` inside EVERY group (the per-tenant workflow the
    grouped fitter implies: each segment picks its own regularization).
    Completes the r11 grouped sparse GLM with its CV sibling (VERDICT
    r11 #8).

    Like `glm_elastic_net_grouped`, each group's rows materialize in
    one Arrow batch and a numpy twin replays the distributed engine's
    exact conventions per fold model: training-only moments
    (reliability-weighted stds Σω − Σω²/Σω under `weight_col`), logit/
    log init minus the mean offset, glmnet prox-Newton through the
    SAME `_penalized_irls_update`/`_np_glm_irls_kernels` the other
    fitters call, λs DESCENDING with per-fold warm starts, held-out
    deviance at each λ's final β — so a (group, λ, fold) row matches
    `glm_elastic_net_cv` run cold on that group's frame (tested at
    1e-8).

    Degeneracy policy (grouped NULL): a fold model with ≤ 1 effective
    training row or a constant training label is SKIPPED (the engine
    convention — no row); a group that is wholly unfittable (bad
    weights/labels/fold ids outside [0, n_folds), non-finite values,
    NO fittable fold) emits one NULL row per λ (fold NULL) so the
    group stays visible. `exact_iterations=N` runs exactly N solves
    per (group, λ, fold) with no convergence exit (the oracle-pin
    hook; converged reports True, the family convention). Returns
    long format: group_cols…, reg_param, fold, n_train, n_val,
    deviance_train, deviance_val, n_nonzero, iterations, converged.

    ROUTING — this vs per-group `glm_elastic_net_cv` (VERDICT r12 #7):
    this fitter's parallelism unit is the GROUP — each group's whole
    (λ-grid × folds) CV runs serially inside ONE Arrow batch on one
    core. That is exactly right for MANY SMALL groups (thousands of
    tenants, each fitting in memory: one shuffle, no driver loop). For
    FEW groups × a BIG λ grid the shape inverts: a 5-group × 50-λ ×
    5-fold run occupies 5 cores while each serializes 250 fits, and
    the distributed lock-step engine — `glm_elastic_net_cv` called
    per group, every fold advancing from one aggregation per outer
    iteration — uses the whole cluster per group instead. Heuristic:
    route by `n_groups ≫ n_cores` (grouped) vs `n_groups ≲ n_cores
    and len(reg_params) × n_folds large` (lock-step per group). A grid
    of ≥ 25 λs here emits a UserWarning pointing at the lock-step
    route (work per group grows with the grid; rows per group with
    the data — the warning fires on the shape you can see upfront)."""
    from pyspark.sql import types as T

    from sparkglm_spark.operators.lm import _design

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if family not in _ENET_FAMILIES:
        raise ValueError(
            f"glm_elastic_net_cv_grouped supports "
            f"{'/'.join(_ENET_FAMILIES)}, got {family!r}"
        )
    if not reg_params:
        raise ValueError("reg_params must be non-empty")
    alpha = float(elastic_net_param)
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("elastic_net_param must be in [0, 1]")
    if any(float(l) < 0.0 for l in reg_params):
        raise ValueError("reg_param must be >= 0")
    if n_folds < 2:
        raise ValueError(f"n_folds must be >= 2, got {n_folds!r}")
    if len(set(float(v) for v in reg_params)) >= 25:
        import warnings

        warnings.warn(
            f"glm_elastic_net_cv_grouped with {len(reg_params)} lambdas "
            f"x {n_folds} folds runs the whole grid SERIALLY inside each "
            "group's Arrow batch; with few groups and a big grid, "
            "per-group glm_elastic_net_cv (the distributed lock-step "
            "engine) uses the cluster per group instead — see the "
            "ROUTING docstring",
            UserWarning,
            stacklevel=2,
        )
    if exact_iterations is not None and exact_iterations < 1:
        raise ValueError("exact_iterations must be >= 1")
    _check_tweedie_var_power(family, var_power)
    _check_nb_alpha(family, nb_alpha)
    if isinstance(fold_expr, str):
        fold_expr = F.col(fold_expr)
    base = df.withColumn("__fold", fold_expr.cast("int"))
    if na_action == "omit":
        # engine parity (code-review r12): glm_elastic_net_cv routes
        # '__fold' through _encode_formula's NA-omit, so a null fold id
        # drops its ROW; _design treats keep_cols as pass-through, which
        # would otherwise NULL the whole group on one bad row
        base = base.where(F.col("__fold").isNotNull())
    encoded, x_cols, target = _design(
        base, formula, list(group_cols) + ["__fold"], na_action=na_action,
        weight_col=weight_col, offset_col=offset_col,
    )
    k = len(x_cols)
    has_int = "intercept" in x_cols
    i0 = x_cols.index("intercept") if has_int else None
    feats = [i for i in range(k) if i != i0]
    out_schema = T.StructType(
        [df.schema[c] for c in group_cols]
        + [
            T.StructField("reg_param", T.DoubleType()),
            T.StructField("fold", T.IntegerType()),
            T.StructField("n_train", T.LongType()),
            T.StructField("n_val", T.LongType()),
            T.StructField("deviance_train", T.DoubleType()),
            T.StructField("deviance_val", T.DoubleType()),
            T.StructField("n_nonzero", T.IntegerType()),
            T.StructField("iterations", T.IntegerType()),
            T.StructField("converged", T.BooleanType()),
        ]
    )
    names = list(x_cols)
    gcols = list(group_cols)
    fam_name, std = family, standardize
    vp = float(var_power)
    na = float(nb_alpha)
    wname, oname = weight_col, offset_col
    lam_in_sorted = sorted((float(v) for v in reg_params), reverse=True)
    lams = sorted(set(lam_in_sorted), reverse=True)
    nf = int(n_folds)
    exact_n = exact_iterations

    def fit_group(pdf):
        import pandas as pd

        X = pdf[names].to_numpy(dtype=np.float64)
        y = pdf[target].to_numpy(dtype=np.float64)
        fd = pdf["__fold"].to_numpy()
        n = len(y)
        wv = (
            pdf[wname].to_numpy(dtype=np.float64)
            if wname is not None
            else np.ones(n)
        )
        ov = (
            pdf[oname].to_numpy(dtype=np.float64)
            if oname is not None
            else np.zeros(n)
        )
        rows: list[tuple] = []
        gkey = tuple(pdf[c].iloc[0] for c in gcols)

        def null_rows():
            return [
                gkey + (lam, None, None, None, None, None, None, None, None)
                for lam in lam_in_sorted
            ]

        ok = (
            n > 1
            and np.all(np.isfinite(X))
            and np.all(np.isfinite(y))
            and np.all(np.isfinite(wv))
            and np.all(wv >= 0.0)
            and np.all(np.isfinite(ov))
            and bool(np.all((fd >= 0) & (fd < nf)))
        )
        if ok:
            # the shared four-fitter domain rule (one definition —
            # review r13: three hand-written boolean twins had appeared)
            ok = _enet_label_domain_error(
                fam_name, float(y.min()), float(y.max())
            ) is None
        if not ok:
            return pd.DataFrame(null_rows(), columns=[f.name for f in out_schema])

        # per-fold states with training-only fixed stats (engine parity)
        states = []
        present = set(int(j) for j in np.unique(fd))
        for j in sorted(present):
            tr = fd != j
            n_t = int(tr.sum())
            if n_t <= 1:
                continue
            wt_t = wv[tr]
            nw_t = float(wt_t.sum())
            if wname is not None:
                sww_t = float((wt_t * wt_t).sum())
                if nw_t <= 0.0 or nw_t - sww_t / nw_t <= 0.0:
                    continue
                sdenom = nw_t - sww_t / nw_t
            else:
                sdenom = float(n_t - 1)
            if nw_t <= 0.0:
                continue
            ybar = float((wt_t * y[tr]).sum()) / nw_t
            if fam_name == "binomial" and not 0.0 < ybar < 1.0:
                continue
            if fam_name != "binomial" and ybar <= 0.0:
                continue
            Xf = X[tr][:, feats]
            ms = (wt_t[:, None] * Xf).sum(0) / nw_t
            ss = (wt_t[:, None] * Xf * Xf).sum(0)
            sig = np.sqrt(np.maximum((ss - nw_t * ms * ms) / sdenom, 0.0))
            beta = np.zeros(k)
            if has_int:
                beta[i0] = _np_link_init(fam_name, ybar)
                if oname is not None:
                    beta[i0] -= float((wt_t * ov[tr]).sum()) / nw_t
            states.append(
                dict(j=j, tr=tr, n_t=n_t, nw_t=nw_t, sig=sig,
                     beta=beta, theta=np.zeros(len(feats)),
                     # fold slices cached ONCE — re-fancy-indexing per
                     # (λ, fold) copied the training design L·F times
                     # per group (review r12)
                     Xt=X[tr], yt=y[tr], wt=wt_t, ot=ov[tr])
            )
        if not states:
            return pd.DataFrame(null_rows(), columns=[f.name for f in out_schema])

        by_lam: dict[float, list] = {}
        try:
            for lam in lams:
                recs = []
                for s in states:
                    tr = s["tr"]
                    Xt, yt, wt_t, ot = s["Xt"], s["yt"], s["wt"], s["ot"]
                    b, theta = s["beta"], s["theta"]
                    it, conv = 0, False
                    n_pass = exact_n if exact_n is not None else max_iter
                    for _ in range(n_pass):
                        eta_lin = Xt @ b
                        _mu, w0, z = _np_glm_irls_kernels(
                            fam_name, yt, eta_lin, ot, vp, na
                        )
                        wirls = wt_t * w0
                        sw = float(wirls.sum())
                        swz = float((wirls * z).sum())
                        Xw = Xt * wirls[:, None]
                        Gw = Xt.T @ Xw
                        gz = Xw.T @ z
                        nb, theta = _penalized_irls_update(
                            Gw, gz, sw, swz, k, feats, i0, s["sig"],
                            s["nw_t"], lam, alpha, std, theta,
                            max_sweeps, tol * 0.01,
                        )
                        delta = float(np.max(np.abs(nb - b)))
                        b = nb
                        it += 1
                        if exact_n is None and delta <= tol:
                            conv = True
                            break
                    if exact_n is not None:
                        conv = True
                    s["beta"], s["theta"] = b, theta
                    # held-out split at the final beta
                    mu_all, _w, _z = _np_glm_irls_kernels(
                        fam_name, y, X @ b, ov, vp, na
                    )
                    dev_t = _np_glm_deviance(fam_name, yt, mu_all[tr], wt_t, vp, na)
                    va = ~tr
                    dev_v = _np_glm_deviance(
                        fam_name, y[va], mu_all[va], wv[va], vp, na
                    )
                    # emit the row even if the fit diverged (NaN/inf
                    # deviances) — the engine does, and a silently
                    # missing (λ, fold) cell would break the cold-parity
                    # contract (code-review r12)
                    recs.append(
                        gkey
                        + (
                            lam, int(s["j"]), int(s["n_t"]),
                            int(n - s["n_t"]), dev_t, dev_v,
                            _count_nonzero(names, b), it, bool(conv),
                        )
                    )
                by_lam[lam] = recs
        except (ValueError, np.linalg.LinAlgError):
            return pd.DataFrame(null_rows(), columns=[f.name for f in out_schema])
        for lam in lam_in_sorted:  # duplicate input λs re-expand
            rows.extend(by_lam.get(lam, []))
        if not rows:
            rows = null_rows()
        return pd.DataFrame(rows, columns=[f.name for f in out_schema])

    from sparkglm_spark.plans.partitioning import fanout_groups

    sel = [*gcols, "__fold", target, *x_cols]
    for c in (wname, oname):
        if c:
            sel.append(c)
    return fanout_groups(encoded.select(*sel), gcols).groupBy(*gcols).applyInPandas(
        fit_group, out_schema
    )


def cv_select_lambda(
    cv: DataFrame,
    group_cols: list[str] | None = None,
    rule: str = "min",
    metric_col: str = "deviance_val",
) -> DataFrame:
    """λ selection over a CV result frame — the glmnet `lambda.min` /
    `lambda.1se` rules, as one declarative aggregation chain (works on
    `glm_elastic_net_cv` output and, with `group_cols`, on
    `glm_elastic_net_cv_grouped`'s per-segment grid):

      per (group?, λ):  cvm = mean over folds of deviance_val
                        cvse = stddev_samp(deviance_val)/√k  (NULL at
                               k = 1 — no spread estimate from one fold)
      rule='min':  the λ minimizing cvm
      rule='1se':  the LARGEST λ with cvm ≤ cvm(λ_min) + cvse(λ_min)
                   (the parsimony rule; falls back to λ_min when
                   cvse(λ_min) is NULL)

    Degenerate-fold rows (fold NULL — the grouped NULL policy) and
    diverged rows (NaN deviance) are EXCLUDED from the means, and the
    COMPARISON is restricted to λs with the group's maximal scoreable
    fold count — a λ that diverged on its hardest fold must not win on
    an optimistic partial mean (glmnet compares every λ over the same
    observation set; review r12). A group with no scoreable row emits
    no output row (it already signalled via its NULL CV rows). Ties on
    cvm break toward the LARGER λ (more regularization at equal error —
    the glmnet direction). Returns one row per group: group_cols…,
    reg_param, cvm, cvse, n_folds.

    `metric_col` (r13) names the held-out loss column — the default
    'deviance_val' fits the GLM CVs; pass 'rmse_val' to select over the
    LINEAR `elastic_net_cv` frame (glmnet applies the same
    min/1se rules to any cv loss), completing the λ workflow for both
    penalized families."""
    from pyspark.sql import Window

    if rule not in ("min", "1se"):
        raise ValueError(f"rule must be 'min' or '1se', got {rule!r}")
    gcols = list(group_cols or [])
    if metric_col not in cv.columns:
        raise ValueError(
            f"metric_col {metric_col!r} not in the CV frame "
            f"{sorted(cv.columns)}"
        )
    dv = F.col(metric_col)
    ok = dv.isNotNull() & ~F.isnan(dv) & F.col("fold").isNotNull()
    # Duplicate reg_params in the CV grid emit duplicate (λ, fold)
    # blocks (documented on glm_elastic_net_cv/_cv_grouped); counting
    # those rows as extra folds would inflate n_folds for duplicated λs
    # and evict every non-duplicated λ from the max-fold comparison
    # (ADVICE r12). The blocks are exact replicas of a deterministic
    # fit, so one row per (group, λ, fold) is the whole signal.
    per_lam = (
        cv.where(ok)
        .dropDuplicates([*gcols, "reg_param", "fold"])
        .groupBy(*gcols, "reg_param")
        .agg(
            F.avg(dv).alias("cvm"),
            (F.stddev_samp(dv) / F.sqrt(F.count(F.lit(1)))).alias("cvse"),
            F.count(F.lit(1)).alias("n_folds"),
        )
    )
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    per_lam = per_lam.withColumn(
        "__maxk", F.max("n_folds").over(w)
    ).where(F.col("n_folds") == F.col("__maxk"))
    best = per_lam.withColumn(
        "__best",
        F.min(F.struct(F.col("cvm"), (-F.col("reg_param")).alias("nl"))).over(w),
    )
    if rule == "min":
        sel = best.where(
            (F.col("cvm") == F.col("__best.cvm"))
            & (F.col("reg_param") == -F.col("__best.nl"))
        )
    else:
        # threshold = cvm(λ_min) + cvse(λ_min); cvse carried through the
        # same struct-min trick (a second window keyed on the argmin row)
        thr = best.withColumn(
            "__thr",
            F.max(
                F.when(
                    (F.col("cvm") == F.col("__best.cvm"))
                    & (F.col("reg_param") == -F.col("__best.nl")),
                    F.col("cvm") + F.coalesce(F.col("cvse"), F.lit(0.0)),
                )
            ).over(w),
        )
        sel = thr.withColumn(
            "__pick", F.max(F.when(F.col("cvm") <= F.col("__thr"),
                                   F.col("reg_param"))).over(w)
        ).where(F.col("reg_param") == F.col("__pick"))
    out = sel.select(*gcols, "reg_param", "cvm", "cvse", "n_folds")
    return out.orderBy(*gcols) if gcols else out
