"""Pure-math statistical special functions (no scipy in this sandbox).

The reference's KS / chi-square expectations are scipy-based and
pandas-engine-only upstream (ref: expectations/core/
expect_column_chisquare_test_p_value_to_be_greater_than.py,
expect_column_bootstrapped_ks_test_p_value_to_be_greater_than.py,
expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than.py
— SURVEY.md §2.9).  We close that gap natively: the p-value math below uses
only classical published algorithms (series / continued-fraction expansions
of the regularized incomplete gamma and beta functions, and the asymptotic
Kolmogorov distribution), as given in Abramowitz & Stegun §6.5/§26.5 and
Numerical Recipes §6.2/§6.4/§14.3 — all public knowledge.

Everything here is driver-side math over tiny aggregate values; the heavy
lifting (counts, quantile sketches, samples) stays in Spark.
"""

from __future__ import annotations

import math

_EPS = 3.0e-15
_FPMIN = 1.0e-300
_MAX_ITER = 500


# ---------------------------------------------------------------------------
# regularized incomplete gamma  P(a, x) / Q(a, x)
# ---------------------------------------------------------------------------

def _gser(a: float, x: float) -> float:
    """P(a,x) by series expansion (converges fast for x < a+1)."""
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(_MAX_ITER):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * _EPS:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gcf(a: float, x: float) -> float:
    """Q(a,x) by Lentz continued fraction (converges fast for x >= a+1)."""
    b = x + 1.0 - a
    c = 1.0 / _FPMIN
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = b + an / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0.0 or a <= 0.0:
        raise ValueError("gammainc_p requires x >= 0, a > 0")
    if x == 0.0:
        return 0.0
    if x < a + 1.0:
        return _gser(a, x)
    return 1.0 - _gcf(a, x)


def gammainc_q(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x)."""
    if x < 0.0 or a <= 0.0:
        raise ValueError("gammainc_q requires x >= 0, a > 0")
    if x == 0.0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gser(a, x)
    return _gcf(a, x)


# ---------------------------------------------------------------------------
# regularized incomplete beta  I_x(a, b)
# ---------------------------------------------------------------------------

def _betacf(a: float, b: float, x: float) -> float:
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x < 0.0 or x > 1.0:
        raise ValueError("betainc requires 0 <= x <= 1")
    if x == 0.0:
        return 0.0
    if x == 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
        + a * math.log(x) + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


# ---------------------------------------------------------------------------
# chi-square
# ---------------------------------------------------------------------------

def chi2_cdf(x: float, k: float) -> float:
    if x <= 0.0:
        return 0.0
    return gammainc_p(k / 2.0, x / 2.0)


def chi2_sf(x: float, k: float) -> float:
    """Survival function 1 - CDF of chi-square with k dof (the p-value of a
    chi-square test statistic)."""
    if x <= 0.0:
        return 1.0
    return gammainc_q(k / 2.0, x / 2.0)


# ---------------------------------------------------------------------------
# Kolmogorov-Smirnov
# ---------------------------------------------------------------------------

def kolmogorov_sf(lam: float) -> float:
    """Q_KS(lambda) = 2 * sum_{j>=1} (-1)^{j-1} exp(-2 j^2 lambda^2)
    (asymptotic KS distribution; Numerical Recipes §14.3)."""
    if lam <= 0.0:
        return 1.0
    total = 0.0
    fac = 2.0
    term_prev = 0.0
    for j in range(1, 101):
        term = fac * math.exp(-2.0 * j * j * lam * lam)
        total += term
        if abs(term) <= 0.001 * abs(term_prev) or abs(term) <= 1e-12 * total:
            return min(max(total, 0.0), 1.0)
        fac = -fac
        term_prev = term
    return 1.0  # failed to converge -> lam tiny -> p ~ 1


def ks_p_value(d: float, n: float) -> float:
    """Asymptotic p-value of a one-sample KS statistic d at sample size n,
    with the Stephens small-sample correction
    lambda = (sqrt(n) + 0.12 + 0.11/sqrt(n)) * d."""
    if n <= 0:
        return 1.0
    sq = math.sqrt(n)
    return kolmogorov_sf((sq + 0.12 + 0.11 / sq) * d)


# ---------------------------------------------------------------------------
# distribution CDFs (scipy loc/scale conventions, as the reference's
# parameterized KS expectation uses them)
# ---------------------------------------------------------------------------

def norm_cdf(x: float, loc: float = 0.0, scale: float = 1.0) -> float:
    return 0.5 * (1.0 + math.erf((x - loc) / (scale * math.sqrt(2.0))))


def uniform_cdf(x: float, loc: float = 0.0, scale: float = 1.0) -> float:
    z = (x - loc) / scale
    return min(max(z, 0.0), 1.0)


def expon_cdf(x: float, loc: float = 0.0, scale: float = 1.0) -> float:
    z = (x - loc) / scale
    return 0.0 if z <= 0.0 else 1.0 - math.exp(-z)


def gamma_cdf(x: float, alpha: float, loc: float = 0.0, scale: float = 1.0) -> float:
    z = (x - loc) / scale
    return 0.0 if z <= 0.0 else gammainc_p(alpha, z)


def beta_cdf(x: float, alpha: float, beta: float,
             loc: float = 0.0, scale: float = 1.0) -> float:
    z = (x - loc) / scale
    if z <= 0.0:
        return 0.0
    if z >= 1.0:
        return 1.0
    return betainc(alpha, beta, z)


def chi2_dist_cdf(x: float, df: float, loc: float = 0.0, scale: float = 1.0) -> float:
    z = (x - loc) / scale
    return 0.0 if z <= 0.0 else chi2_cdf(z, df)


def distribution_cdf(distribution: str, params: dict) -> "callable":
    """Return cdf(x) for a named distribution + scipy-style params dict.
    Matches the reference's supported set (ref: expectations/core/
    expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than.py
    — norm/beta/gamma/uniform/chi2/expon)."""
    p = dict(params or {})
    loc = float(p.get("loc", 0.0))
    scale = float(p.get("scale", 1.0))
    if scale <= 0.0:
        raise ValueError("scale must be positive")
    d = distribution.lower()
    if d == "norm":
        # allow mean/std aliases
        loc = float(p.get("mean", loc))
        scale = float(p.get("std_dev", p.get("std", scale)))
        return lambda x: norm_cdf(x, loc, scale)
    if d == "uniform":
        if "min" in p or "max" in p:
            lo = float(p.get("min", 0.0))
            hi = float(p.get("max", 1.0))
            loc, scale = lo, hi - lo
        return lambda x: uniform_cdf(x, loc, scale)
    if d == "expon":
        return lambda x: expon_cdf(x, loc, scale)
    if d == "gamma":
        alpha = float(p["alpha"])
        return lambda x: gamma_cdf(x, alpha, loc, scale)
    if d == "beta":
        alpha = float(p["alpha"])
        beta = float(p["beta"])
        return lambda x: beta_cdf(x, alpha, beta, loc, scale)
    if d == "chi2":
        df = float(p["df"])
        return lambda x: chi2_dist_cdf(x, df, loc, scale)
    raise ValueError(f"unsupported distribution: {distribution!r}")


def partition_cdf(partition_object: dict) -> "callable":
    """Piecewise-linear CDF from a continuous partition object
    {bins: [b0..bk], weights: [w1..wk]} (the reference's
    expect_column_bootstrapped_ks_test baseline; weights renormalized)."""
    bins = [float(b) for b in partition_object["bins"]]
    weights = [float(w) for w in partition_object["weights"]]
    total = sum(weights)
    if total <= 0:
        raise ValueError("partition_object weights sum to zero")
    cum = [0.0]
    for w in weights:
        cum.append(cum[-1] + w / total)

    def cdf(x: float) -> float:
        if x <= bins[0]:
            return 0.0
        if x >= bins[-1]:
            return 1.0
        # linear within the containing bin
        for i in range(len(bins) - 1):
            if x < bins[i + 1]:
                lo, hi = bins[i], bins[i + 1]
                frac = 0.0 if hi == lo else (x - lo) / (hi - lo)
                return cum[i] + frac * (cum[i + 1] - cum[i])
        return 1.0

    return cdf
