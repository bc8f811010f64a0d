"""glm --interaction (plink2 '--glm interaction', linear): solver vs a
raw-design per-variant OLS oracle, signal detection, provider parity,
and the CLI multi-TEST row surface."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from tests.oracle import t_sf2_oracle

from pgen_tpu.formats.writer import write_pgen
from pgen_tpu.ops.glm import glm_linear_interaction
from pgen_tpu.ops.logistic import glm_logistic_interaction


def _pack(codes, tmp_path, name="gi"):
    path = str(tmp_path / f"{name}.pgen")
    write_pgen(path, codes)
    ns = codes.shape[1]
    rec = (2 * ns + 7) // 8
    return np.fromfile(path, dtype=np.uint8)[12:].reshape(codes.shape[0], rec)


def _t_sf2(t, df):
    # independent mpmath tail — NOT the production betainc_reg
    return t_sf2_oracle(t, df)


def _oracle(codes_v, y, covars):
    """Raw-design complete-case OLS of y on [1, C, g, g*C]; returns
    (n, beta_tests, se_tests, t_tests, p_tests) for [g, g*c_1..]."""
    cal = codes_v != 3
    g = codes_v[cal].astype(np.float64)
    c = covars[cal]
    yy = y[cal]
    x = np.column_stack([np.ones(cal.sum()), c, g, g[:, None] * c])
    d = x.shape[1]
    n = int(cal.sum())
    xtx = x.T @ x
    xty = x.T @ yy
    inv = np.linalg.inv(xtx)
    beta = inv @ xty
    rss = float(yy @ yy - beta @ xty)
    df = n - d
    sigma2 = max(rss, 0.0) / df
    k = covars.shape[1]
    idxs = list(range(1 + k, d))
    b = beta[idxs]
    se = np.sqrt(sigma2 * np.diag(inv)[idxs])
    t = b / se
    p = np.array([_t_sf2(tv, df) for tv in t])
    return n, b, se, t, p


def test_solver_matches_raw_oracle(tmp_path):
    rng = np.random.default_rng(12)
    V, S, k = 8, 80, 2
    codes = rng.integers(0, 4, size=(V, S), dtype=np.uint8)
    covars = np.column_stack([
        rng.normal(50, 5, S),          # large-mean covariate (age-like)
        rng.integers(1, 3, S).astype(float),
    ])
    y = rng.normal(size=S) + 0.3 * covars[:, 0]
    packed = _pack(codes, tmp_path)
    res = glm_linear_interaction(packed, S, y, covars, provider="numpy")
    for v in range(V):
        n, b, se, t, p = _oracle(codes[v], y, covars)
        assert res.n_obs[v] == n
        np.testing.assert_allclose(res.beta[v], b, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(res.se[v], se, rtol=1e-8)
        np.testing.assert_allclose(res.t_stat[v], t, rtol=1e-8)
        np.testing.assert_allclose(res.p[v], p, rtol=1e-6)


def test_interaction_signal_detected(tmp_path):
    rng = np.random.default_rng(5)
    V, S = 4, 400
    codes = rng.integers(0, 3, size=(V, S), dtype=np.uint8)
    c = rng.normal(size=S)
    # variant 1 has a pure interaction effect: y depends on g*c only
    y = 0.8 * codes[1].astype(float) * c + rng.normal(scale=0.5, size=S)
    packed = _pack(codes, tmp_path)
    res = glm_linear_interaction(packed, S, y, c[:, None], provider="numpy")
    assert res.p[1, 1] < 1e-20      # ADDxC highly significant
    assert res.p[0, 1] > 1e-4       # null variant is not
    # main ADD effect at variant 1 is near zero (effect is pure interaction)
    assert abs(res.beta[1, 0]) < 0.2


def test_provider_parity(tmp_path):
    rng = np.random.default_rng(3)
    V, S = 6, 50
    codes = rng.integers(0, 4, size=(V, S), dtype=np.uint8)
    covars = rng.normal(size=(S, 2)) + 5.0
    y = rng.normal(size=S)
    packed = _pack(codes, tmp_path)
    a = glm_linear_interaction(packed, S, y, covars, provider="numpy")
    b = glm_linear_interaction(packed, S, y, covars, provider="device")
    np.testing.assert_allclose(a.beta, b.beta, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(a.se, b.se, rtol=2e-4, atol=1e-6)


def test_cli_interaction_rows(tmp_path):
    rng = np.random.default_rng(9)
    V, S = 5, 60
    codes = rng.integers(0, 3, size=(V, S), dtype=np.uint8)
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(V)]
    psam_rows = [
        f"s{i}\t{rng.integers(1,3)}\t{rng.normal():.4f}" for i in range(S)
    ]
    prefix = build_fileset(
        tmp_path, "gi", codes, pvar_rows, psam_rows,
        psam_columns="#IID\tSEX\tPHENO1",
    )
    out = tmp_path / "o.glm.linear"
    assert run_cli([
        "glm", prefix, "--linear", "--pheno-name", "PHENO1",
        "--covar-name", "SEX", "--interaction", "-o", str(out),
    ]) == 0
    lines = out.read_text().splitlines()
    rows = [ln.split("\t") for ln in lines[1:]]
    assert len(rows) == 2 * V  # ADD + ADDxSEX per variant
    assert [r[6] for r in rows[:2]] == ["ADD", "ADDxSEX"]
    # logistic + interaction is a clear error
    psam_rows_cc = [f"s{i}\t1\t{1 + (i % 2)}" for i in range(S)]
    prefix2 = build_fileset(
        tmp_path, "gc", codes, pvar_rows, psam_rows_cc,
        psam_columns="#IID\tSEX\tPHENO1",
    )
    assert run_cli([
        "glm", prefix2, "--pheno-name", "PHENO1", "--covar-name", "SEX",
        "--interaction", "-o", str(out),
    ]) != 0


def test_interaction_requires_covariate(tmp_path):
    codes = np.zeros((2, 10), dtype=np.uint8)
    packed = _pack(codes, tmp_path)
    with pytest.raises(ValueError, match="covariate"):
        glm_linear_interaction(
            packed, 10, np.zeros(10), np.zeros((10, 0)), provider="numpy"
        )


# ---- logistic interaction (plink2 --glm interaction, logistic) -------------


def _logit_int_oracle(g, yv, cv, max_iter=200, tol=1e-12):
    """Explicit-design Newton oracle on [1, C, g, g*C]; returns
    (beta_tests, se_tests) for [g, g*c_1..] — no shared code with the
    blocked masked-moment IRLS under test."""
    n = len(yv)
    x = np.column_stack([np.ones(n), cv, g, g[:, None] * cv])
    d = x.shape[1]
    b = np.zeros(d)
    b[0] = np.log(yv.mean() / (1 - yv.mean()))
    h = None
    for _ in range(max_iter):
        eta = np.clip(x @ b, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        h = x.T @ ((mu * (1 - mu))[:, None] * x)
        step = np.linalg.solve(h, x.T @ (yv - mu))
        sc = np.abs(step).max()
        if sc > 10:
            step *= 10.0 / sc
        b += step
        if sc < tol:
            break
    k = cv.shape[1]
    idxs = list(range(1 + k, d))
    se = np.sqrt(np.diag(np.linalg.inv(h))[idxs])
    return b[idxs], se


@pytest.mark.parametrize("k", [1, 2])
def test_logistic_interaction_matches_oracle(k, tmp_path):
    from pgen_tpu.ops.logistic import glm_logistic_interaction, normal_sf2

    rng = np.random.default_rng(40 + k)
    V, S = 10, 220
    codes = rng.binomial(2, 0.35, size=(V, S)).astype(np.uint8)
    codes[rng.random((V, S)) < 0.04] = 3
    codes[0] = 3  # all-missing -> NA
    cv = rng.normal(size=(S, k))
    logit = -0.3 + 0.5 * np.where(codes[4] == 3, 0, codes[4]) \
        + 0.4 * np.where(codes[4] == 3, 0, codes[4]) * cv[:, 0]
    y = (rng.random(S) < 1.0 / (1.0 + np.exp(-logit))).astype(float)
    packed = _pack(codes, tmp_path)
    res = glm_logistic_interaction(packed, S, y, cv, block_variants=4)
    assert res.beta.shape == (V, 1 + k)
    import math

    for v in range(V):
        cal = codes[v] != 3
        g = codes[v][cal].astype(float)
        yv = y[cal]
        if v == 0 or np.var(g) == 0 or yv.sum() in (0, cal.sum()):
            assert np.isnan(res.beta[v]).all()
            continue
        b, se = _logit_int_oracle(g, yv, cv[cal])
        np.testing.assert_allclose(res.beta[v], b, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(res.se[v], se, rtol=1e-4)
        # p from the independent stdlib tail
        for c in range(1 + k):
            exp_p = math.erfc(abs(b[c] / se[c]) / math.sqrt(2))
            np.testing.assert_allclose(res.p[v, c], exp_p, rtol=1e-3)


def test_logistic_interaction_provider_parity(tmp_path):
    from pgen_tpu.ops.logistic import glm_logistic_interaction

    rng = np.random.default_rng(9)
    V, S = 8, 150
    codes = rng.binomial(2, 0.4, size=(V, S)).astype(np.uint8)
    cv = rng.normal(size=(S, 2))
    y = (rng.random(S) < 0.5).astype(float)
    packed = _pack(codes, tmp_path)
    a = glm_logistic_interaction(packed, S, y, cv)
    b = glm_logistic_interaction(packed, S, y, cv, provider="device")
    np.testing.assert_allclose(b.beta, a.beta, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(b.se, a.se, rtol=2e-3, atol=2e-5)


def test_cli_glm_logistic_interaction(tmp_path):
    rng = np.random.default_rng(13)
    V, S = 6, 160
    codes = rng.binomial(2, 0.4, size=(V, S)).astype(np.uint8)
    age = rng.normal(50, 8, size=S)
    logit = -0.2 + 0.6 * codes[2] + 0.02 * (age - 50)
    y = (rng.random(S) < 1.0 / (1.0 + np.exp(-logit))).astype(int) + 1
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(V)]
    psam_rows = [f"s{i}\t{y[i]}\t{age[i]:.4f}" for i in range(S)]
    prefix = build_fileset(
        tmp_path, "gli", codes, pvar_rows, psam_rows,
        psam_columns="#IID\tPHENO1\tAGE",
    )
    out = tmp_path / "o.glm"
    assert run_cli([
        "glm", prefix, "--covar-name", "AGE", "--interaction",
        "-o", str(out),
    ]) == 0
    lines = open(out).read().splitlines()
    assert lines[0].endswith("OR\tLOG(OR)_SE\tZ_STAT\tP")
    rows = [l.split("\t") for l in lines[1:]]
    # two TEST rows per variant: ADD then ADDxAGE
    assert [r[6] for r in rows[:4]] == ["ADD", "ADDxAGE", "ADD", "ADDxAGE"]
    assert len(rows) == 2 * V
    # the planted main effect shows up as OR > 1 on rs2's ADD row
    add_rs2 = next(r for r in rows if r[2] == "rs2" and r[6] == "ADD")
    assert float(add_rs2[8]) > 1.2
    # --firth with --interaction works (r5: the Firth hat quadratic
    # splits over the interaction design's A blocks)
    assert run_cli([
        "glm", prefix, "--covar-name", "AGE", "--interaction", "--firth",
        "-o", str(out),
    ]) == 0
    rows = [ln.split("\t") for ln in out.read_text().splitlines()[1:]]
    assert any(r[8] != "NA" for r in rows)


def test_interaction_cell_fast_path_matches_per_sample(tmp_path):
    """The interaction design [1, C, g, g*C] is cell-determined when
    covariates take few distinct row values, so it rides the same
    sufficient-statistics fast path as the base model — must agree with
    the per-sample IRLS on full and subset cohorts (r5)."""
    import numpy as np

    from pgen_tpu.formats.writer import write_pgen
    from pgen_tpu.ops.logistic import glm_logistic_interaction

    rng = np.random.default_rng(95)
    nv, ns = 20, 180
    codes = rng.integers(0, 4, size=(nv, ns)).astype(np.uint8)
    sex = (rng.random(ns) < 0.5).astype(float)
    cov = sex[:, None]
    y = (rng.random(ns) < 1.0 / (1.0 + np.exp(
        -(0.3 * sex + 0.4 * (codes[3] == 2)
          + 0.3 * sex * (codes[3] == 2))))).astype(float)
    write_pgen(str(tmp_path / "i.pgen"), codes)
    rec = (2 * ns + 7) // 8
    packed = np.fromfile(
        str(tmp_path / "i.pgen"), dtype=np.uint8
    )[12:].reshape(nv, rec)
    passthrough = lambda a, b: a @ b  # noqa: E731 - forces per-sample
    fast = glm_logistic_interaction(packed, ns, y, cov)
    slow = glm_logistic_interaction(packed, ns, y, cov,
                                    matmul=passthrough)
    for name in ("n_obs", "beta", "se", "z_stat", "p"):
        a = np.asarray(getattr(fast, name), float)
        b = np.asarray(getattr(slow, name), float)
        np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
        fin = np.isfinite(a)
        np.testing.assert_allclose(a[fin], b[fin], rtol=5e-6, atol=1e-9,
                                   err_msg=name)
    idx = np.sort(rng.permutation(ns)[:140]).astype(np.int32)
    f2 = glm_logistic_interaction(packed, ns, y[idx], cov[idx],
                                  sample_idx=idx)
    s2 = glm_logistic_interaction(packed, ns, y[idx], cov[idx],
                                  sample_idx=idx, matmul=passthrough)
    fin = np.isfinite(f2.beta) & np.isfinite(s2.beta)
    np.testing.assert_allclose(f2.beta[fin], s2.beta[fin], rtol=5e-6,
                               atol=1e-9)


def _firth_oracle(x, yy, iters=2000, tol=1e-11):
    """Independent penalized-likelihood Newton (no step caps — the
    stationary point is algorithm-independent)."""
    b = np.zeros(x.shape[1])
    ncs = yy.sum()
    b[0] = np.log((ncs + 0.5) / (len(yy) - ncs + 0.5))
    for _ in range(iters):
        eta = np.clip(x @ b, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        h = x.T @ (w[:, None] * x)
        try:
            a = np.linalg.inv(h)
        except np.linalg.LinAlgError:
            return None
        hat = w * np.einsum("si,ij,sj->s", x, a, x)
        d = a @ (x.T @ (yy - mu + hat * (0.5 - mu)))
        nrm = np.abs(d).max()
        if nrm > 1.0:
            d *= 1.0 / nrm
        b = b + d
        if nrm < tol:
            return b, a
    return None


@pytest.mark.parametrize("covkind", ["categorical", "continuous"])
def test_interaction_firth_matches_penalized_oracle(covkind, tmp_path):
    """firth='always' interaction fits equal an independent
    penalized-likelihood Newton on both the cell fast path (categorical
    covariate) and the per-sample path (continuous); firth-fallback
    rescues an engineered separated site that vanilla reports NA."""
    rng = np.random.default_rng(23)
    nv, ns = 10, 90
    codes = rng.integers(0, 3, size=(nv, ns)).astype(np.uint8)
    y = np.zeros(ns)
    y[:40] = 1.0
    codes[2] = 0
    codes[2, :15] = 2  # every hom-alt is a case: separation at v2
    cov = (
        (rng.random(ns) < 0.5).astype(float)[:, None]
        if covkind == "categorical"
        else rng.normal(size=(ns, 1))
    )
    packed = _pack(codes, tmp_path)
    res = glm_logistic_interaction(packed, ns, y, cov, firth="always")
    checked = 0
    for v in range(nv):
        if not np.isfinite(res.beta[v]).all():
            continue
        cal = codes[v] != 3
        g = codes[v][cal].astype(float)
        x = np.column_stack(
            [np.ones(int(cal.sum())), cov[cal], g, g * cov[cal, 0]]
        )
        o = _firth_oracle(x, y[cal])
        if o is None:
            continue
        b, a = o
        checked += 1
        np.testing.assert_allclose(res.beta[v, 0], b[2], rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(res.beta[v, 1], b[3], rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(res.se[v, 0], np.sqrt(a[2, 2]),
                                   rtol=2e-4)
    assert checked >= nv // 2
    none_r = glm_logistic_interaction(packed, ns, y, cov, firth="none")
    fb_r = glm_logistic_interaction(packed, ns, y, cov, firth="fallback")
    assert np.isnan(none_r.beta[2, 0])
    assert np.isfinite(fb_r.beta[2, 0]) and fb_r.firth[2]
