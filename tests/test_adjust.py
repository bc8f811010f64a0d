"""plink2 --adjust analog (ops/adjust.py): corrected-p columns vs
independent oracles (scipy.stats.false_discovery_control for BH/BY,
hand-rolled Holm/Sidak/Bonferroni), plus the glm --adjust CLI surface."""

import math

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.ops.adjust import adjust_pvalues

scipy_stats = pytest.importorskip("scipy.stats")


def _oracle(ps):
    """Textbook formulas, straightforward loops — no shared code."""
    m = len(ps)
    order = np.argsort(ps, kind="stable")
    s = np.asarray(ps)[order]
    bonf = np.minimum(s * m, 1)
    holm = np.empty(m)
    run = 0.0
    for i in range(m):
        run = max(run, min((m - i) * s[i], 1.0))
        holm[i] = run
    sid_ss = 1 - (1 - s) ** m
    sid_sd = np.empty(m)
    run = 0.0
    for i in range(m):
        run = max(run, 1 - (1 - s[i]) ** (m - i))
        sid_sd[i] = run
    bh = scipy_stats.false_discovery_control(s, method="bh")
    by = scipy_stats.false_discovery_control(s, method="by")
    return order, s, bonf, holm, sid_ss, sid_sd, bh, by


def test_adjust_matches_oracles():
    rng = np.random.default_rng(5)
    ps = rng.uniform(1e-12, 1, size=57)
    res = adjust_pvalues(ps)
    order, s, bonf, holm, sid_ss, sid_sd, bh, by = _oracle(ps)
    np.testing.assert_array_equal(res.order, order)
    np.testing.assert_allclose(res.unadj, s, rtol=1e-14)
    np.testing.assert_allclose(res.bonf, bonf, rtol=1e-12)
    np.testing.assert_allclose(res.holm, holm, rtol=1e-12)
    np.testing.assert_allclose(res.sidak_ss, sid_ss, rtol=1e-9)
    np.testing.assert_allclose(res.sidak_sd, sid_sd, rtol=1e-9)
    np.testing.assert_allclose(res.fdr_bh, bh, rtol=1e-12)
    np.testing.assert_allclose(res.fdr_by, by, rtol=1e-12)


def test_adjust_gc_identity_at_null_lambda():
    # stats drawn so that median chisq == chi2_1 median -> lambda == 1
    # -> GC must equal UNADJ (p computed from the same stat)
    z = np.array([0.1, 0.3, 0.6744897501960817, 1.2, 2.5])
    p = np.array([math.erfc(abs(v) / math.sqrt(2)) for v in z])
    res = adjust_pvalues(p, stat=z)
    assert res.lambda_gc == pytest.approx(1.0, abs=1e-12)
    np.testing.assert_allclose(res.gc, res.unadj, rtol=1e-12)


def test_adjust_gc_deflates_inflated_stats():
    rng = np.random.default_rng(3)
    z = rng.normal(scale=2.0, size=501)  # inflated: lambda ~ 4
    p = np.array([math.erfc(abs(v) / math.sqrt(2)) for v in z])
    res = adjust_pvalues(p, stat=z)
    assert res.lambda_gc > 3
    assert np.all(res.gc >= res.unadj - 1e-15)  # correction only weakens
    # spot-check one value against the closed form
    i = 7
    exp = math.erfc(math.sqrt(z[res.order[i]] ** 2 / res.lambda_gc / 2))
    np.testing.assert_allclose(res.gc[i], exp, rtol=1e-12)


def test_adjust_gc_small_df_t_not_inflated():
    """GC chisq comes from the p-value (qchisq(1-p,1)), so a null
    Student-t at tiny df must give lambda ~ 1 — squaring the t itself
    would give ~df/(df-2) (r4 advisor finding)."""
    df = 4
    # exact null: t values at the uniform p quantiles for this df
    qs = (np.arange(1, 402) - 0.5) / 401.0
    t = scipy_stats.t.ppf(1.0 - qs / 2.0, df)
    p = 2.0 * scipy_stats.t.sf(np.abs(t), df)
    res = adjust_pvalues(p, stat=t)
    # t^2 median here is ~ df/(df-2) * chi2 median ~= 1.32; p-derived must be ~1
    assert res.lambda_gc == pytest.approx(1.0, abs=0.02)
    np.testing.assert_allclose(res.gc, res.unadj, rtol=1e-6)
    # underflowed p == 0.0 falls back to stat^2 (finite GC input)
    p0 = np.array([0.0, 0.5, 0.9])
    z0 = np.array([40.0, 0.6744898, 0.1256613])
    res0 = adjust_pvalues(p0, stat=z0, lambda_gc=1.0)
    assert np.isfinite(res0.gc).all() and res0.gc[0] < 1e-300


def test_adjust_nan_rows_excluded_and_lambda_override():
    p = np.array([0.01, np.nan, 0.5, np.nan, 0.2])
    z = np.array([2.575829, np.nan, 0.6744898, np.nan, 1.281552])
    res = adjust_pvalues(p, stat=z, lambda_gc=2.0)
    assert len(res.order) == 3
    assert res.lambda_gc == 2.0
    assert list(res.order) == [0, 4, 2]
    # monotonicity of every step-wise column
    for col in (res.holm, res.sidak_sd):
        assert np.all(np.diff(col) >= -1e-15)
    for col in (res.fdr_bh, res.fdr_by):
        assert np.all(np.diff(col) >= -1e-15)


def test_cli_glm_adjust(tmp_path):
    rng = np.random.default_rng(21)
    nv, ns = 12, 80
    codes = rng.binomial(2, 0.4, size=(nv, ns)).astype(np.uint8)
    y = 1.1 * codes[5].astype(float) + rng.normal(size=ns)
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nv)]
    psam_rows = [f"s{i}\tM\t{y[i]:.8g}" for i in range(ns)]
    prefix = build_fileset(
        tmp_path, "adj", codes, pvar_rows, psam_rows,
        psam_columns="#IID\tSEX\tPHENO1",
    )
    out = tmp_path / "o.glm.linear"
    assert run_cli(["glm", prefix, "-o", str(out), "--adjust"]) == 0
    lines = (tmp_path / "o.glm.linear.adjusted").read_text().splitlines()
    assert lines[0].split("\t") == [
        "#CHROM", "POS", "ID", "REF", "ALT", "A1", "UNADJ", "GC", "BONF",
        "HOLM", "SIDAK_SS", "SIDAK_SD", "FDR_BH", "FDR_BY",
    ]
    rows = [ln.split("\t") for ln in lines[1:]]
    assert rows[0][2] == "rs5"  # the planted signal sorts first
    ps = [float(r[6]) for r in rows]
    assert ps == sorted(ps)
    # BONF = min(1, m * UNADJ) row-wise
    m = len(rows)
    for r in rows:
        assert float(r[8]) == pytest.approx(min(1.0, m * float(r[6])),
                                            rel=1e-5)
    # stdout mode rejects --adjust
    assert run_cli(["glm", prefix, "-o", "-", "--adjust"]) != 0


def test_cli_glm_adjust_stdout_rejected_before_emission(tmp_path, capsys):
    # the incompatibility must error BEFORE any table reaches the stream
    codes = np.ones((2, 6), dtype=np.uint8)
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(2)]
    psam_rows = [f"s{i}\tM\t{i}.5" for i in range(6)]
    prefix = build_fileset(
        tmp_path, "adjs", codes, pvar_rows, psam_rows,
        psam_columns="#IID\tSEX\tPHENO1",
    )
    assert run_cli(["glm", prefix, "-o", "-", "--adjust"]) != 0
    assert capsys.readouterr().out == ""
