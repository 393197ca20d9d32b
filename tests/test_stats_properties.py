"""Property-based checks of the scipy-free special functions (pure math,
no Spark session)."""

from __future__ import annotations

import math
import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gx_spark import stats  # noqa: E402

finite = {"allow_nan": False, "allow_infinity": False}


@given(a=st.floats(0.05, 50, **finite), x=st.floats(0, 200, **finite))
@settings(max_examples=200, deadline=None)
def test_gammainc_complementarity_and_range(a, x):
    p = stats.gammainc_p(a, x)
    q = stats.gammainc_q(a, x)
    assert -1e-12 <= p <= 1 + 1e-12
    assert abs(p + q - 1.0) < 1e-9


@given(a=st.floats(0.05, 50, **finite),
       x1=st.floats(0, 100, **finite), x2=st.floats(0, 100, **finite))
@settings(max_examples=200, deadline=None)
def test_gammainc_monotone_in_x(a, x1, x2):
    lo, hi = sorted((x1, x2))
    assert stats.gammainc_p(a, lo) <= stats.gammainc_p(a, hi) + 1e-9


@given(a=st.floats(0.1, 30, **finite), b=st.floats(0.1, 30, **finite),
       x=st.floats(0, 1, **finite))
@settings(max_examples=200, deadline=None)
def test_betainc_range(a, b, x):
    v = stats.betainc(a, b, x)
    assert -1e-12 <= v <= 1 + 1e-12


@given(a=st.floats(0.1, 30, **finite), b=st.floats(0.1, 30, **finite),
       # keep x away from 0/1: the identity's 1-x loses x below ~1e-16
       x=st.floats(1e-6, 1 - 1e-6, **finite))
@settings(max_examples=200, deadline=None)
def test_betainc_symmetry(a, b, x):
    # I_x(a,b) = 1 - I_{1-x}(b,a)
    v = stats.betainc(a, b, x)
    assert abs(v - (1.0 - stats.betainc(b, a, 1.0 - x))) < 1e-8


@given(x1=st.floats(0, 300, **finite), x2=st.floats(0, 300, **finite),
       k=st.integers(1, 50))
@settings(max_examples=200, deadline=None)
def test_chi2_sf_monotone_decreasing(x1, x2, k):
    lo, hi = sorted((x1, x2))
    assert stats.chi2_sf(hi, k) <= stats.chi2_sf(lo, k) + 1e-9


@given(lam1=st.floats(0.01, 5, **finite), lam2=st.floats(0.01, 5, **finite))
@settings(max_examples=200, deadline=None)
def test_kolmogorov_sf_monotone_and_bounded(lam1, lam2):
    lo, hi = sorted((lam1, lam2))
    qlo, qhi = stats.kolmogorov_sf(lo), stats.kolmogorov_sf(hi)
    assert 0.0 <= qhi <= qlo <= 1.0 + 1e-12


@given(x=st.floats(-50, 50, **finite),
       loc=st.floats(-10, 10, **finite), scale=st.floats(0.1, 10, **finite))
@settings(max_examples=200, deadline=None)
def test_norm_cdf_symmetry(x, loc, scale):
    # F(loc + d) + F(loc - d) = 1
    d = x - loc
    s = stats.norm_cdf(loc + d, loc, scale) + stats.norm_cdf(loc - d, loc, scale)
    assert abs(s - 1.0) < 1e-12


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_distribution_cdfs_are_cdfs(data):
    dist, params = data.draw(st.sampled_from([
        ("norm", {"mean": 1.0, "std_dev": 2.0}),
        ("uniform", {"min": -1.0, "max": 3.0}),
        ("expon", {"loc": 0.0, "scale": 2.0}),
        ("gamma", {"alpha": 2.5, "scale": 1.5}),
        ("beta", {"alpha": 2.0, "beta": 3.0}),
        ("chi2", {"df": 4.0}),
    ]))
    cdf = stats.distribution_cdf(dist, params)
    x1 = data.draw(st.floats(-20, 20, **finite))
    x2 = data.draw(st.floats(-20, 20, **finite))
    lo, hi = sorted((x1, x2))
    vlo, vhi = cdf(lo), cdf(hi)
    assert 0.0 <= vlo <= vhi <= 1.0 + 1e-9


@given(n=st.integers(10, 100_000), d=st.floats(0.0, 1.0, **finite))
@settings(max_examples=200, deadline=None)
def test_ks_p_value_in_unit_interval(n, d):
    p = stats.ks_p_value(d, n)
    assert 0.0 <= p <= 1.0


def test_partition_cdf_matches_weights_at_boundaries():
    po = {"bins": [0.0, 1.0, 2.0, 4.0], "weights": [0.2, 0.3, 0.5]}
    cdf = stats.partition_cdf(po)
    assert cdf(0.0) == 0.0
    assert abs(cdf(1.0) - 0.2) < 1e-12
    assert abs(cdf(2.0) - 0.5) < 1e-12
    assert cdf(4.0) == 1.0
