"""Distribution-drift tests D1-D3 (SURVEY.md §2.2) — driver-side numpy.

Inputs are *aggregated profiles* (histograms / 101-point quantile
vectors), never row data, so these run on the driver in O(K) where K ≤
#categories or #quantile points.  This mirrors the reference's
``Schema.contrast`` (rdv drift report, SURVEY.md O6/E3): numeric drift
is the max ECDF gap between two stored percentile vectors (KS-style),
categoric drift compares frequency maps (chi-squared), plus PSI.

scipy is absent in the sandbox, so the chi-squared p-value uses a
from-scratch regularized incomplete gamma (series + continued fraction,
Numerical-Recipes-style) implemented on top of ``math.lgamma``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from data_validation_spark.functions.stats import interp_ecdf
from data_validation_spark.plans.suite import QUANTILE_PROBS


# ---------------------------------------------------------------------------
# regularized incomplete gamma (for the chi-squared survival function)
# ---------------------------------------------------------------------------

def _gamma_p_series(a: float, x: float, eps: float = 1e-14) -> float:
    """Lower regularized gamma P(a,x) by power series (x < a+1)."""
    if x <= 0:
        return 0.0
    ap, total, delta = a, 1.0 / a, 1.0 / a
    for _ in range(10000):
        ap += 1.0
        delta *= x / ap
        total += delta
        if abs(delta) < abs(total) * eps:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))

def _gamma_q_contfrac(a: float, x: float, eps: float = 1e-14) -> float:
    """Upper regularized gamma Q(a,x) by Lentz continued fraction (x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 10000):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))

def gammainc_upper(a: float, x: float) -> float:
    """Regularized upper incomplete gamma Q(a, x) = Γ(a,x)/Γ(a)."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc_upper requires x >= 0, a > 0")
    if x == 0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _gamma_p_series(a, x)
    return _gamma_q_contfrac(a, x)

def chi2_sf(x: float, dof: int) -> float:
    """Chi-squared survival function P(X² >= x) = Q(dof/2, x/2)."""
    return gammainc_upper(dof / 2.0, x / 2.0)


# ---------------------------------------------------------------------------
# the three drift tests
# ---------------------------------------------------------------------------

@dataclass
class DriftResult:
    test: str
    statistic: float
    p_value: float | None  # chi2 only
    threshold: float
    drifted: bool

    def to_jcr(self) -> dict:
        return {"test": self.test, "statistic": self.statistic,
                "p_value": self.p_value, "threshold": self.threshold,
                "drifted": self.drifted}


def chi2_drift(observed: dict[str, int], expected_freq: dict[str, float],
               alpha: float = 0.01) -> DriftResult:
    """D1: chi-squared on a categorical histogram vs expected relative
    frequencies.  Drifted iff p < alpha.  Categories absent from the
    expected map get a small epsilon mass (they are, after all, the
    strongest drift signal)."""
    n = sum(observed.values())
    keys = sorted(set(observed) | set(expected_freq))
    eps = 1e-9
    exp_raw = np.array([max(expected_freq.get(k, 0.0), eps) for k in keys])
    exp = exp_raw / exp_raw.sum() * n
    obs = np.array([observed.get(k, 0) for k in keys], dtype=float)
    stat = float(np.sum((obs - exp) ** 2 / exp))
    dof = max(len(keys) - 1, 1)
    p = chi2_sf(stat, dof)
    return DriftResult("chi2", stat, p, alpha, p < alpha)


def ks_drift(quantiles_a: list[float], quantiles_b: list[float],
             threshold: float = 0.1,
             probs: list[float] = QUANTILE_PROBS) -> DriftResult:
    """D2: KS distance between two distributions stored as quantile
    vectors (inverse ECDFs) — exactly rdv's numeric drift measure.
    D = max over the merged support of |F_a(x) - F_b(x)|."""
    fa, fb = interp_ecdf(quantiles_a, probs), interp_ecdf(quantiles_b, probs)
    support = np.unique(np.concatenate([np.asarray(quantiles_a, dtype=float),
                                        np.asarray(quantiles_b, dtype=float)]))
    d = float(np.max(np.abs(fa(support) - fb(support))))
    return DriftResult("ks", d, None, threshold, d > threshold)


def psi_drift(quantiles_cur: list[float], quantiles_ref: list[float],
              threshold: float = 0.2, n_bins: int = 10,
              probs: list[float] = QUANTILE_PROBS) -> DriftResult:
    """D3: Population Stability Index over bins derived from the
    *reference* deciles; bin masses reconstructed from each ECDF,
    epsilon-smoothed.  Common rule of thumb: PSI > 0.2 = drifted."""
    ref_v = np.asarray(quantiles_ref, dtype=float)
    edges = np.quantile(ref_v, np.linspace(0, 1, n_bins + 1))
    edges[0], edges[-1] = -np.inf, np.inf
    fc, fr = interp_ecdf(quantiles_cur, probs), interp_ecdf(quantiles_ref, probs)

    def bin_mass(cdf):
        inner = edges[1:-1]
        cum = np.concatenate([[0.0], cdf(inner), [1.0]])
        return np.clip(np.diff(cum), 1e-6, None)

    p, q = bin_mass(fc), bin_mass(fr)
    p, q = p / p.sum(), q / q.sum()
    stat = float(np.sum((p - q) * np.log(p / q)))
    return DriftResult("psi", stat, None, threshold, stat > threshold)
