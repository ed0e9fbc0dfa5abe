"""Scipy-free special functions (scipy is not available in this
environment). Driver-side scalar use (p-values: k values per model) and
Arrow-batched vectorized use (probit link kernels) share these.

Accuracy notes:
- erf/erfc/lgamma delegate elementwise to CPython's libm-backed math module
  (machine precision). Vectorization is via np.frompyfunc — acceptable for
  the probit link (a non-headline path); logit/cloglog run as pure Spark SQL
  expressions JVM-side and never touch this module.
- norm_ppf: Acklam's rational approximation (~1e-9) + one Halley refinement
  against erfc → ~1e-15 relative.
- betainc (for Student-t p-values): Lentz continued fraction, driver-side.
"""

from __future__ import annotations

import math

import numpy as np

_erf_u = np.frompyfunc(math.erf, 1, 1)
_erfc_u = np.frompyfunc(math.erfc, 1, 1)
_lgamma_u = np.frompyfunc(math.lgamma, 1, 1)

_SQRT2 = math.sqrt(2.0)
_SQRT2PI = math.sqrt(2.0 * math.pi)


def erf(x):
    return np.asarray(_erf_u(np.asarray(x, dtype=np.float64)), dtype=np.float64)


def erfc(x):
    return np.asarray(_erfc_u(np.asarray(x, dtype=np.float64)), dtype=np.float64)


def lgamma(x):
    return np.asarray(_lgamma_u(np.asarray(x, dtype=np.float64)), dtype=np.float64)


def norm_cdf(x):
    """Φ(x), vectorized."""
    x = np.asarray(x, dtype=np.float64)
    return 0.5 * erfc(-x / _SQRT2)


def norm_pdf(x):
    x = np.asarray(x, dtype=np.float64)
    return np.exp(-0.5 * x * x) / _SQRT2PI


def norm_sf(x):
    """1 - Φ(x), computed stably via erfc."""
    x = np.asarray(x, dtype=np.float64)
    return 0.5 * erfc(x / _SQRT2)


# Acklam's inverse normal CDF rational approximation coefficients.
_PPF_A = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
          1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
_PPF_B = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
          6.680131188771972e01, -1.328068155288572e01)
_PPF_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
          -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
_PPF_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
          3.754408661907416e00)


def norm_ppf(p):
    """Φ⁻¹(p), vectorized, ~machine precision after Halley refinement."""
    p = np.asarray(p, dtype=np.float64)
    out = np.full_like(p, np.nan)
    a, b, c, d = _PPF_A, _PPF_B, _PPF_C, _PPF_D

    plow, phigh = 0.02425, 1 - 0.02425
    with np.errstate(divide="ignore", invalid="ignore"):
        lo = (p > 0) & (p < plow)
        if np.any(lo):
            q = np.sqrt(-2 * np.log(p[lo]))
            out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
                (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
            )
        mid = (p >= plow) & (p <= phigh)
        if np.any(mid):
            q = p[mid] - 0.5
            r = q * q
            out[mid] = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
                ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
            )
        hi = (p > phigh) & (p < 1)
        if np.any(hi):
            q = np.sqrt(-2 * np.log(1 - p[hi]))
            out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
                (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
            )
    out[p == 0] = -np.inf
    out[p == 1] = np.inf

    # One Halley step: e = Φ(x) - p ; x -= u / (1 + x*u/2), u = e/φ(x)
    ok = np.isfinite(out)
    if np.any(ok):
        x = out[ok]
        e = 0.5 * erfc(-x / _SQRT2) - p[ok]
        u = e * _SQRT2PI * np.exp(x * x / 2.0)
        out[ok] = x - u / (1 + x * u / 2)
    return out


def _betacf(a: float, b: float, x: float, max_iter: int = 300, eps: float = 3e-16) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < 1e-300:
        d = 1e-300
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < 1e-300:
            d = 1e-300
        c = 1.0 + aa / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b). Scalar (driver-side)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log1p(-x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf(t: float, df: float) -> float:
    """P(T_df > t) for Student-t. Scalar (driver-side p-values)."""
    if math.isnan(t):
        return float("nan")
    x = df / (df + t * t)
    p = 0.5 * betainc(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def t_pvalue_two_sided(t: float, df: float) -> float:
    """2·P(T_df > |t|) (reference: LM.scala:88-90)."""
    return 2.0 * t_sf(abs(t), df)


def norm_pvalue_two_sided(z: float) -> float:
    """2·(1 - Φ(|z|)) (reference: GLM.scala:1002-1003)."""
    return float(2.0 * norm_sf(abs(z)))


def binom_logpmf(y, m, p):
    """log C(m,y) + y·log(p) + (m-y)·log(1-p), vectorized; matches breeze
    Binomial.logProbabilityOf for integer inputs (reference: GLM.scala:139-141)."""
    y = np.asarray(y, dtype=np.float64)
    m = np.asarray(m, dtype=np.float64)
    p = np.asarray(p, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        comb = lgamma(m + 1) - lgamma(y + 1) - lgamma(m - y + 1)
        lp = np.where(y > 0, y * np.log(p), 0.0)
        lq = np.where(m - y > 0, (m - y) * np.log1p(-p), 0.0)
    return comb + lp + lq


def t_ppf(p: float, df: float) -> float:
    """Student-t quantile (inverse CDF) for p ∈ (0, 1) — bisection on the
    existing `t_sf` survival function (driver-side scalar; interval
    construction calls it once per fit, so a 200-step bisection to
    ~1e-13 relative is the simple correct tool here, not a perf path).
    Symmetric: t_ppf(1−p) = −t_ppf(p)."""
    import math

    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    if df <= 0:
        raise ValueError("df must be > 0")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -t_ppf(1.0 - p, df)
    # target: P(T <= t) = p  <=>  t_sf(t) = 1 - p, t > 0
    target = 1.0 - p
    lo, hi = 0.0, 1.0
    while t_sf(hi, df) > target:
        hi *= 2.0
        if hi > 1e12:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_sf(mid, df) > target:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-13 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)


def _gamma_p(a: float, x: float, max_iter: int = 500, eps: float = 3e-16) -> float:
    """Regularized lower incomplete gamma P(a, x) — series for x < a+1,
    Lentz continued fraction for the complement otherwise (the classical
    split; public convention set: Abramowitz & Stegun §6.5)."""
    if x < 0.0 or a <= 0.0:
        raise ValueError("need x >= 0 and a > 0")
    if x == 0.0:
        return 0.0
    ln_front = a * math.log(x) - x - math.lgamma(a)
    if x < a + 1.0:
        # series: P = front · Σ x^n / (a·(a+1)···(a+n))
        ap = a
        s = 1.0 / a
        term = s
        for _ in range(max_iter):
            ap += 1.0
            term *= x / ap
            s += term
            if abs(term) < abs(s) * eps:
                break
        return s * math.exp(ln_front)
    # continued fraction for Q, then P = 1 − Q
    b = x + 1.0 - a
    c = 1e300
    d = 1.0 / b
    h = d
    for i in range(1, max_iter + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < 1e-300:
            d = 1e-300
        c = b + an / c
        if abs(c) < 1e-300:
            c = 1e-300
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return 1.0 - math.exp(ln_front) * h


def chisq_sf(x: float, df: float) -> float:
    """P(χ²_df > x). Scalar (driver-side LRT p-values)."""
    if math.isnan(x):
        return float("nan")
    if x <= 0.0:
        return 1.0
    return max(0.0, min(1.0, 1.0 - _gamma_p(df / 2.0, x / 2.0)))


def f_sf(f: float, df1: float, df2: float) -> float:
    """P(F_{df1,df2} > f) via the incomplete beta identity
    I_{d2/(d2+d1·f)}(d2/2, d1/2). Scalar (driver-side anova p-values)."""
    if math.isnan(f):
        return float("nan")
    if f <= 0.0:
        return 1.0
    return betainc(df2 / 2.0, df1 / 2.0, df2 / (df2 + df1 * f))


def kolmogorov_sf(lam: float) -> float:
    """Survival function of the Kolmogorov distribution,
    Q_KS(λ) = 2 Σ_{j≥1} (−1)^{j−1} e^{−2 j² λ²} — the asymptotic
    two-sample KS p-value at λ = √(n₁n₂/(n₁+n₂))·D (public convention:
    Kolmogorov 1933).

    TWO series, switched at λ = 1.18 (the scipy/cephes convention): the
    alternating series above converges in a few terms for large λ but
    needs unboundedly many for small λ (a naive 100-term truncation
    returns ~0.01 instead of ~1.0 at λ ~ 1e-3 — the huge-n
    near-identical-samples regime); below the switch point the Jacobi
    theta dual Q = 1 − (√(2π)/λ)·Σ_{j odd} e^{−j²π²/(8λ²)} converges in
    ≤ 3 terms."""
    if lam <= 0.0:
        return 1.0
    if lam < 1.18:
        # dual (theta-transformed) series: P(K ≤ λ), 3 terms ≫ double
        # precision in this range
        a = math.pi * math.pi / (8.0 * lam * lam)
        p = (
            math.sqrt(2.0 * math.pi)
            / lam
            * (math.exp(-a) + math.exp(-9.0 * a) + math.exp(-25.0 * a))
        )
        return min(max(1.0 - p, 0.0), 1.0)
    s = 0.0
    sign = 1.0
    for j in range(1, 101):
        term = math.exp(-2.0 * j * j * lam * lam)
        s += sign * term
        sign = -sign
        if term < 1e-18 * max(abs(s), 1e-300):
            break
    return min(max(2.0 * s, 0.0), 1.0)


def digamma(x):
    """ψ(x) for x > 0, vectorized numpy (no scipy in the runtime): the
    recurrence ψ(x) = ψ(x+1) − 1/x shifts every argument to z ≥ 8, then
    the Stirling asymptotic series ψ(z) ≈ ln z − 1/(2z) − Σ B₂ₙ/(2n·z²ⁿ)
    (Abramowitz & Stegun 6.3.18, terms through z⁻¹⁰). At z = 8 the first
    dropped term (−691/(32760·z¹²)) is ~3e-13 — below the 1e-12 the
    negbinomial θ-score aggregation needs. Any x ∈ (0, 8) reaches z ≥ 8
    in exactly 8 unit shifts, so the loop is a FIXED 8 iterations
    (vectorized masks, no data-dependent control flow)."""
    z = np.asarray(x, dtype=np.float64).copy()
    if np.any(z <= 0.0):
        raise ValueError("digamma requires x > 0")
    acc = np.zeros_like(z)
    for _ in range(8):
        small = z < 8.0
        if not small.any():
            break
        acc -= np.where(small, 1.0 / z, 0.0)
        z = np.where(small, z + 1.0, z)
    iz = 1.0 / z
    iz2 = iz * iz
    # B2/2 = 1/12, B4/4 = -1/120, B6/6 = 1/252, B8/8 = -1/240, B10/10 = 1/132
    ser = iz2 * (
        1.0 / 12.0
        - iz2 * (1.0 / 120.0 - iz2 * (1.0 / 252.0 - iz2 * (1.0 / 240.0 - iz2 / 132.0)))
    )
    return acc + np.log(z) - 0.5 * iz - ser


def trigamma(x):
    """ψ′(x) for x > 0, vectorized: recurrence ψ′(x) = ψ′(x+1) + 1/x² to
    z ≥ 8, then ψ′(z) ≈ 1/z + 1/(2z²) + Σ B₂ₙ/z²ⁿ⁺¹ (A&S 6.4.12, through
    z⁻¹¹; first dropped term ~5e-13 at z = 8). Same fixed-8-shift
    structure as `digamma`."""
    z = np.asarray(x, dtype=np.float64).copy()
    if np.any(z <= 0.0):
        raise ValueError("trigamma requires x > 0")
    acc = np.zeros_like(z)
    for _ in range(8):
        small = z < 8.0
        if not small.any():
            break
        acc += np.where(small, 1.0 / (z * z), 0.0)
        z = np.where(small, z + 1.0, z)
    iz = 1.0 / z
    iz2 = iz * iz
    # 1/z + 1/(2z²) + 1/(6z³) − 1/(30z⁵) + 1/(42z⁷) − 1/(30z⁹) + 5/(66z¹¹)
    ser = iz * (
        1.0
        + iz * (0.5 + iz * (1.0 / 6.0 - iz2 * (1.0 / 30.0 - iz2 * (1.0 / 42.0 - iz2 * (1.0 / 30.0 - iz2 * 5.0 / 66.0)))))
    )
    return acc + ser
