"""plink2 --glm model modifiers (genotypic/hethom/dominant/recessive):
indicator-decomposed masked moments (ops/glm.py glm_solve_modifier),
multi-column logistic IRLS (ops/logistic.py glm_logistic_modifier), the
joint GENO_2DF tests, and the CLI/table layout."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.formats.writer import write_pgen
from pgen_tpu.ops.glm import (
    JOINT_TEST_NAME,
    MODIFIER_COLS,
    MODIFIER_TESTS,
    glm_linear_modifier,
)
from pgen_tpu.ops.logistic import glm_logistic_modifier


def _pack(codes, tmp_path, name="p"):
    path = str(tmp_path / f"{name}.pgen")
    write_pgen(path, codes)
    rec = (2 * codes.shape[1] + 7) // 8
    return np.fromfile(path, dtype=np.uint8)[12:].reshape(codes.shape[0], rec)


def _recode(g, cols):
    het = (g == 1).astype(float)
    hom = (g == 2).astype(float)
    return [a1 * het + a2 * hom for a1, a2 in cols]


@pytest.mark.parametrize("k", [0, 2])
@pytest.mark.parametrize("modifier", sorted(MODIFIER_COLS))
def test_linear_modifier_matches_lstsq_oracle(modifier, k, tmp_path):
    rng = np.random.default_rng(40 + k)
    nv, ns = 25, 35
    codes = rng.integers(0, 4, size=(nv, ns)).astype(np.uint8)
    y = rng.normal(size=ns)
    cov = rng.normal(size=(ns, k))
    packed = _pack(codes, tmp_path)
    res = glm_linear_modifier(packed, ns, y, cov, modifier)
    cols = MODIFIER_COLS[modifier]
    nt = len(cols)
    checked = 0
    for v in range(nv):
        cal = codes[v] != 3
        n = int(cal.sum())
        x = np.column_stack(
            [np.ones(n), cov[cal]] + _recode(codes[v][cal], cols)
        )
        degenerate = (
            n - x.shape[1] < 1 or np.linalg.matrix_rank(x) < x.shape[1]
        )
        if degenerate:
            assert not np.isfinite(res.beta[v]).any()
            continue
        if not np.isfinite(res.beta[v]).all():
            continue  # production near-singularity gate
        checked += 1
        yv = y[cal]
        coef = np.linalg.lstsq(x, yv, rcond=None)[0]
        resid = yv - x @ coef
        df = n - x.shape[1]
        s2 = resid @ resid / df
        xtxi = np.linalg.inv(x.T @ x)
        for t in range(nt):
            j = 1 + k + t
            np.testing.assert_allclose(res.beta[v, t], coef[j], rtol=1e-8)
            np.testing.assert_allclose(
                res.se[v, t], np.sqrt(s2 * xtxi[j, j]), rtol=1e-8
            )
        if nt == 2:
            x0 = np.column_stack([np.ones(n), cov[cal]])
            c0 = np.linalg.lstsq(x0, yv, rcond=None)[0]
            rss0 = ((yv - x0 @ c0) ** 2).sum()
            f = ((rss0 - resid @ resid) / 2.0) / s2
            np.testing.assert_allclose(
                res.joint_stat[v], f, rtol=1e-6, atol=1e-10
            )
            assert 0.0 <= res.joint_p[v] <= 1.0
    assert checked >= nv // 2


def _newton_oracle(x, yy, iters=80):
    b = np.zeros(x.shape[1])
    for _ in range(iters):
        eta = np.clip(x @ b, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        h = x.T @ (w[:, None] * x)
        try:
            d = np.linalg.solve(h, x.T @ (yy - mu))
        except np.linalg.LinAlgError:
            return None
        b = b + d
        if np.abs(d).max() < 1e-10:
            return b, np.linalg.inv(h)
    return None


@pytest.mark.parametrize("modifier", sorted(MODIFIER_COLS))
def test_logistic_modifier_matches_newton_oracle(modifier, tmp_path):
    rng = np.random.default_rng(17)
    nv, ns, k = 15, 120, 1
    codes = rng.integers(0, 4, size=(nv, ns)).astype(np.uint8)
    cov = rng.normal(size=(ns, k))
    logit = 0.3 * cov[:, 0] + 0.5 * (codes[3] == 2)
    y = (rng.random(ns) < 1.0 / (1.0 + np.exp(-logit))).astype(float)
    packed = _pack(codes, tmp_path)
    res = glm_logistic_modifier(packed, ns, y, cov, modifier, firth="none")
    cols = MODIFIER_COLS[modifier]
    nt = len(cols)
    checked = 0
    for v in range(nv):
        if not np.isfinite(res.beta[v]).all():
            continue
        cal = codes[v] != 3
        x = np.column_stack(
            [np.ones(int(cal.sum())), cov[cal]]
            + _recode(codes[v][cal], cols)
        )
        o = _newton_oracle(x, y[cal])
        if o is None:
            continue
        b, hi = o
        checked += 1
        for t in range(nt):
            j = 1 + k + t
            np.testing.assert_allclose(res.beta[v, t], b[j], atol=1e-5)
            np.testing.assert_allclose(
                res.se[v, t], np.sqrt(hi[j, j]), atol=1e-5
            )
        if nt == 2:
            s = hi[1 + k :, 1 + k :]
            chi2 = b[1 + k :] @ np.linalg.solve(s, b[1 + k :])
            np.testing.assert_allclose(
                res.joint_stat[v], chi2, rtol=1e-5, atol=1e-8
            )
            np.testing.assert_allclose(
                res.joint_p[v], np.exp(-res.joint_stat[v] / 2.0), rtol=1e-12
            )
    assert checked >= nv // 2


def test_logistic_modifier_firth_rescues_separation(tmp_path):
    """A separated REC site: vanilla IRLS fails, Firth fallback reports a
    finite estimate (same behavior as the additive path)."""
    rng = np.random.default_rng(5)
    ns = 60
    hom = np.zeros(ns, dtype=np.uint8)
    hom[:20] = 2
    codes = np.stack([hom, rng.integers(0, 3, ns).astype(np.uint8)])
    y = np.zeros(ns)
    y[:25] = 1.0  # every hom-alt sample is a case: separation for REC
    packed = _pack(codes, tmp_path)
    none = glm_logistic_modifier(
        packed, ns, y, np.zeros((ns, 0)), "recessive", firth="none"
    )
    fb = glm_logistic_modifier(
        packed, ns, y, np.zeros((ns, 0)), "recessive", firth="fallback"
    )
    assert np.isnan(none.beta[0, 0])
    assert np.isfinite(fb.beta[0, 0]) and fb.firth[0]


def test_device_moments_match_numpy(tmp_path):
    rng = np.random.default_rng(9)
    nv, ns = 12, 30
    codes = rng.integers(0, 4, size=(nv, ns)).astype(np.uint8)
    y = rng.normal(size=ns)
    cov = rng.normal(size=(ns, 2))
    packed = _pack(codes, tmp_path)
    from pgen_tpu.ops.glm import glm_geno_moments

    a = glm_geno_moments(packed, ns, y, cov, provider="numpy")
    b = glm_geno_moments(packed, ns, y, cov, provider="device")
    for x, z in zip(a, b):
        np.testing.assert_allclose(x, z, rtol=1e-5, atol=1e-4)


def _mk_fileset(tmp_path, codes, pheno):
    nv, ns = codes.shape
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nv)]
    psam_rows = [f"s{i}\tM\t{pheno[i]:.6g}" for i in range(ns)]
    return build_fileset(
        tmp_path, "md", codes, pvar_rows, psam_rows,
        psam_columns="#IID\tSEX\tQT",
    )


def test_cli_modifier_table_layout(tmp_path):
    rng = np.random.default_rng(33)
    nv, ns = 6, 50
    codes = rng.binomial(2, 0.4, size=(nv, ns)).astype(np.uint8)
    qt = 0.9 * codes[2] + rng.normal(size=ns)
    prefix = _mk_fileset(tmp_path, codes, qt)
    out = tmp_path / "g.glm"
    # genotypic: 3 rows per variant (ADD, DOMDEV, GENO_2DF), F stat header
    assert run_cli(["glm", prefix, "--pheno-name", "QT",
                    "--modifier", "genotypic", "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].split("\t")[-2] == "T_OR_F_STAT"
    body = [ln.split("\t") for ln in lines[1:]]
    assert len(body) == 3 * nv
    assert [r[6] for r in body[:3]] == ["ADD", "DOMDEV", JOINT_TEST_NAME]
    joint = body[2]
    assert joint[8] == "NA" and joint[9] == "NA"
    assert float(joint[10]) > 0 and 0 < float(joint[11]) <= 1
    # dominant: single DOM row per variant, plain T_STAT header
    assert run_cli(["glm", prefix, "--pheno-name", "QT",
                    "--modifier", "dominant", "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].split("\t")[-2] == "T_STAT"
    body = [ln.split("\t") for ln in lines[1:]]
    assert len(body) == nv and all(r[6] == "DOM" for r in body)
    # hethom rows
    assert run_cli(["glm", prefix, "--pheno-name", "QT",
                    "--modifier", "hethom", "-o", str(out)]) == 0
    body = [ln.split("\t") for ln in out.read_text().splitlines()[1:]]
    assert [r[6] for r in body[:3]] == ["HOM", "HET", JOINT_TEST_NAME]
    # --modifier + --interaction rejected
    assert run_cli(["glm", prefix, "--pheno-name", "QT",
                    "--modifier", "genotypic", "--interaction",
                    "-o", str(out)]) == 1


def test_cli_modifier_logistic_layout(tmp_path):
    rng = np.random.default_rng(34)
    nv, ns = 5, 80
    codes = rng.binomial(2, 0.4, size=(nv, ns)).astype(np.uint8)
    cc = (rng.random(ns) < 0.5).astype(int) + 1  # 1/2 case-control
    prefix = _mk_fileset(tmp_path, codes, cc.astype(float))
    out = tmp_path / "g.glm"
    assert run_cli(["glm", prefix, "--pheno-name", "QT",
                    "--modifier", "hethom", "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].split("\t")[-2] == "Z_OR_CHISQ_STAT"
    body = [ln.split("\t") for ln in lines[1:]]
    assert len(body) == 3 * nv
    assert [r[6] for r in body[:3]] == ["HOM", "HET", JOINT_TEST_NAME]


def test_modifier_adjust_uses_first_test(tmp_path):
    rng = np.random.default_rng(35)
    nv, ns = 8, 60
    codes = rng.binomial(2, 0.4, size=(nv, ns)).astype(np.uint8)
    qt = 0.8 * codes[1] + rng.normal(size=ns)
    prefix = _mk_fileset(tmp_path, codes, qt)
    out = tmp_path / "g.glm"
    assert run_cli(["glm", prefix, "--pheno-name", "QT",
                    "--modifier", "genotypic", "--adjust",
                    "-o", str(out)]) == 0
    adj = (tmp_path / "g.glm.adjusted").read_text().splitlines()
    assert len(adj) >= 2  # header + tested rows (first-test column p's)


def test_geno_moments_mesh_matches_numpy(tmp_path):
    """8-virtual-device variant-sharded modifier moments == host f64
    (pad rows 0xFF contribute zero; outputs unshard to the exact count)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    rng = np.random.default_rng(19)
    nv, ns = 37, 30  # deliberately not a multiple of the device count
    codes = rng.integers(0, 4, size=(nv, ns)).astype(np.uint8)
    y = rng.normal(size=ns)
    cov = rng.normal(size=(ns, 2))
    packed = _pack(codes, tmp_path)
    from pgen_tpu.ops.glm import glm_geno_moments, glm_geno_moments_mesh

    a = glm_geno_moments(packed, ns, y, cov, provider="numpy")
    b = glm_geno_moments_mesh(packed, ns, y, cov)
    for x, z in zip(a, b):
        np.testing.assert_allclose(x, z, rtol=1e-5, atol=1e-4)
    # and the full modifier solve via the device provider (mesh path)
    r_host = glm_linear_modifier(packed, ns, y, cov, "genotypic",
                                 provider="numpy")
    r_mesh = glm_linear_modifier(packed, ns, y, cov, "genotypic",
                                 provider="device")
    both = np.isfinite(r_host.beta) & np.isfinite(r_mesh.beta)
    np.testing.assert_allclose(
        r_host.beta[both], r_mesh.beta[both], rtol=1e-4, atol=1e-6
    )


def test_native_geno_moments_match_numpy(tmp_path):
    """The C++ sparse-complement modifier moments (pgen_glm_geno_moments)
    are bit-equivalent to the numpy path, full and subset cohorts."""
    from pgen_tpu.ops.glm import (
        glm_geno_moments_native,
        glm_geno_moments_numpy,
        glm_solve_modifier,
    )

    rng = np.random.default_rng(51)
    nv, ns, k = 30, 41, 2
    codes = rng.integers(0, 4, size=(nv, ns)).astype(np.uint8)
    codes[2] = 0
    codes[4] = 3
    packed = _pack(codes, tmp_path)
    y = rng.normal(size=ns)
    cov = rng.normal(size=(ns, k))
    b = glm_geno_moments_native(packed, ns, y, cov)
    if b is None:
        pytest.skip("native runtime unavailable")
    a = glm_geno_moments_numpy(packed, ns, y, cov)
    for x, z, name in zip(a, b, a._fields):
        np.testing.assert_allclose(x, z, rtol=1e-12, atol=1e-9,
                                   err_msg=name)
    idx = np.sort(rng.choice(ns, size=25, replace=False)).astype(np.int32)
    a2 = glm_geno_moments_numpy(packed, ns, y[idx], cov[idx],
                                sample_idx=idx)
    b2 = glm_geno_moments_native(packed, ns, y[idx], cov[idx],
                                 sample_idx=idx)
    for x, z, name in zip(a2, b2, a2._fields):
        np.testing.assert_allclose(x, z, rtol=1e-12, atol=1e-9,
                                   err_msg=f"subset {name}")
    # full modifier solve via the provider switch
    ra = glm_linear_modifier(packed, ns, y, cov, "genotypic",
                             provider="numpy")
    rb = glm_linear_modifier(packed, ns, y, cov, "genotypic",
                             provider="native")
    both = np.isfinite(ra.beta) & np.isfinite(rb.beta)
    np.testing.assert_allclose(ra.beta[both], rb.beta[both], rtol=1e-10)
    np.testing.assert_allclose(
        ra.joint_stat[np.isfinite(ra.joint_stat)],
        rb.joint_stat[np.isfinite(rb.joint_stat)], rtol=1e-9,
    )


def test_dominant_equals_additive_without_homalt(tmp_path):
    """Exact invariant: with no hom-alt calls, the additive dosage IS
    the dominant indicator (g in {0,1}), so the two fits agree to
    machine precision — and REC has no variance (all-NA)."""
    rng = np.random.default_rng(70)
    nv, ns = 12, 45
    codes = rng.choice([0, 1, 3], p=[0.6, 0.3, 0.1],
                       size=(nv, ns)).astype(np.uint8)
    packed = _pack(codes, tmp_path)
    y = rng.normal(size=ns)
    cov = rng.normal(size=(ns, 1))
    from pgen_tpu.ops.glm import glm_linear

    add = glm_linear(packed, ns, y, cov, provider="numpy")
    dom = glm_linear_modifier(packed, ns, y, cov, "dominant")
    both = np.isfinite(add.beta) & np.isfinite(dom.beta[:, 0])
    assert both.any()
    np.testing.assert_allclose(dom.beta[both, 0], add.beta[both],
                               rtol=1e-12)
    np.testing.assert_allclose(dom.se[both, 0], add.se[both], rtol=1e-12)
    rec = glm_linear_modifier(packed, ns, y, cov, "recessive")
    assert np.isnan(rec.beta).all()
    # logistic: same identity
    yb = (rng.random(ns) < 0.5).astype(float)
    from pgen_tpu.ops.logistic import glm_logistic, glm_logistic_modifier

    ladd = glm_logistic(packed, ns, yb, cov, firth="none")
    ldom = glm_logistic_modifier(packed, ns, yb, cov, "dominant",
                                 firth="none")
    both = np.isfinite(ladd.beta) & np.isfinite(ldom.beta[:, 0])
    np.testing.assert_allclose(ldom.beta[both, 0], ladd.beta[both],
                               atol=1e-8)
