"""Multiple-testing-corrected p-value columns (plink2 --adjust analog).

Given the per-variant association p-values (and the Wald/t statistics
they came from), computes plink2's .adjusted column family, vectorized:

    UNADJ     the raw p
    GC        genomic-control corrected: chisq_i = stat_i^2 scaled by
              lambda = median(chisq)/qchisq(0.5, 1) (clamped >= 1), then
              p = chi2_1 survival = erfc(sqrt(chisq'/2)) — using the
              squared stat avoids any inverse-CDF evaluation
    BONF      min(1, m p)
    HOLM      Holm step-down: cummax_i min(1, (m - i) p_(i))
    SIDAK_SS  1 - (1 - p)^m (single-step)
    SIDAK_SD  step-down: cummax_i (1 - (1 - p_(i))^(m - i))
    FDR_BH    Benjamini-Hochberg step-up: rev-cummin_i min(1, m/(i+1) p_(i))
    FDR_BY    Benjamini-Yekutieli: BH with the harmonic factor c(m)

m counts the TESTED (finite-p) variants only, matching plink2 (NA rows
are excluded from the report). Reference: plink2 --adjust documentation;
the reference CLI has no analog (query/filter tool only).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

# median of the 1-df chi-square distribution, qchisq(0.5, 1)
_CHI2_1_MEDIAN = 0.45493642311957184


class AdjustResult(NamedTuple):
    order: np.ndarray      # (M,) indices into the input arrays, UNADJ asc
    unadj: np.ndarray      # (M,) each sorted ascending along `order`
    gc: np.ndarray
    bonf: np.ndarray
    holm: np.ndarray
    sidak_ss: np.ndarray
    sidak_sd: np.ndarray
    fdr_bh: np.ndarray
    fdr_by: np.ndarray
    lambda_gc: float


def _chi2_1_sf(x: np.ndarray) -> np.ndarray:
    """chi2(1 df) survival = two-sided normal tail of sqrt(x):
    erfc(sqrt(x/2)); reuses ops/logistic's vectorized erfc."""
    from pgen_tpu.ops.logistic import normal_sf2

    return normal_sf2(np.sqrt(np.maximum(x, 0.0)))


def adjust_pvalues(p: np.ndarray, stat: np.ndarray | None = None,
                   lambda_gc: float | None = None) -> AdjustResult:
    """p: raw p-values (NaN = untested, dropped). stat: the z/t statistic
    per variant (needed for GC; without it GC falls back to UNADJ and
    lambda reports NaN). lambda_gc overrides the estimated lambda
    (plink2 --lambda)."""
    p = np.asarray(p, dtype=np.float64)
    tested = np.flatnonzero(np.isfinite(p))
    m = len(tested)
    if m == 0:
        z = np.zeros(0)
        return AdjustResult(tested, z, z, z, z, z, z, z, z, float("nan"))
    order = tested[np.argsort(p[tested], kind="stable")]
    ps = p[order]

    if stat is not None:
        chisq = np.asarray(stat, dtype=np.float64)[order] ** 2
        if lambda_gc is None:
            lambda_gc = float(np.median(chisq) / _CHI2_1_MEDIAN)
        lambda_gc = max(lambda_gc, 1.0)  # plink2 clamps deflation to 1
        gc = _chi2_1_sf(chisq / lambda_gc)
    else:
        lambda_gc = float("nan")
        gc = ps.copy()

    idx = np.arange(m, dtype=np.float64)
    bonf = np.minimum(m * ps, 1.0)
    holm = np.maximum.accumulate(np.minimum((m - idx) * ps, 1.0))
    # log1p form keeps precision for tiny p (1-(1-p)^k = -expm1(k log1p(-p)))
    with np.errstate(divide="ignore"):
        l1p = np.log1p(-np.minimum(ps, 1.0 - 1e-300))
    sidak_ss = -np.expm1(m * l1p)
    sidak_sd = np.maximum.accumulate(-np.expm1((m - idx) * l1p))
    bh_terms = np.minimum(m / (idx + 1.0) * ps, 1.0)
    fdr_bh = np.minimum.accumulate(bh_terms[::-1])[::-1]
    cm = float(np.sum(1.0 / np.arange(1, m + 1)))
    fdr_by = np.minimum.accumulate(
        np.minimum(cm * m / (idx + 1.0) * ps, 1.0)[::-1]
    )[::-1]
    return AdjustResult(
        order, ps, gc, bonf, holm, sidak_ss, sidak_sd, fdr_bh, fdr_by,
        lambda_gc,
    )
