"""PCA / GRM: providers vs an explicit-Z oracle, eigen path, mesh psum,
and the CLI .eigenvec/.eigenval surface."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.formats.writer import write_pgen
from pgen_tpu.ops.pca import (
    grm_device,
    grm_numpy,
    pca_from_grm,
)


def _pack(codes: np.ndarray, tmp_path, name="p") -> np.ndarray:
    path = str(tmp_path / f"{name}.pgen")
    write_pgen(path, codes)
    rec = (2 * codes.shape[1] + 7) // 8
    return np.fromfile(path, dtype=np.uint8)[12:].reshape(codes.shape[0], rec)


def _grm_oracle(codes: np.ndarray):
    """Explicit-Z f64 reference: standardize every variant, Z^T Z, count."""
    called = codes != 3
    g = codes.astype(np.float64) * called
    acc = np.zeros((codes.shape[1],) * 2)
    m = 0
    for v in range(codes.shape[0]):
        n = called[v].sum()
        if n == 0:
            continue
        p = g[v].sum() / (2.0 * n)
        var = 2.0 * p * (1.0 - p)
        if var <= 0:
            continue
        z = np.where(called[v], (g[v] - 2.0 * p) / np.sqrt(var), 0.0)
        acc += np.outer(z, z)
        m += 1
    return acc, m


@pytest.mark.parametrize("shape", [(9, 4), (60, 7), (33, 13)])
def test_grm_numpy_matches_oracle(shape, tmp_path):
    rng = np.random.default_rng(shape[0])
    codes = rng.integers(0, 4, size=shape, dtype=np.uint8)
    codes[0] = 0  # monomorphic row: must be excluded
    codes[1] = 3  # all-missing row: must be excluded
    packed = _pack(codes, tmp_path)
    ref, m_ref = _grm_oracle(codes)
    got = grm_numpy(packed, shape[1], block_variants=8)
    assert got.m_used == m_ref
    np.testing.assert_allclose(got.grm_sum, ref, rtol=1e-12, atol=1e-12)


def test_grm_device_matches_numpy(tmp_path):
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(50, 9), dtype=np.uint8)
    packed = _pack(codes, tmp_path)
    ref = grm_numpy(packed, 9)
    got = grm_device(packed, 9, block_variants=16, interpret=True)
    assert got.m_used == ref.m_used
    np.testing.assert_allclose(got.grm_sum, ref.grm_sum, rtol=2e-5, atol=2e-5)


def test_grm_sample_subset(tmp_path):
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=(40, 10), dtype=np.uint8)
    packed = _pack(codes, tmp_path)
    sel = np.array([1, 2, 6, 9], dtype=np.int32)
    ref, m_ref = _grm_oracle(codes[:, sel])
    got = grm_numpy(packed, 10, sample_idx=sel)
    assert got.m_used == m_ref
    np.testing.assert_allclose(got.grm_sum, ref, rtol=1e-12, atol=1e-12)
    dev = grm_device(packed, 10, interpret=True, sample_idx=sel,
                     block_variants=16)
    assert dev.m_used == m_ref
    np.testing.assert_allclose(dev.grm_sum, ref, rtol=2e-5, atol=2e-5)


def test_pca_recovers_planted_structure():
    # two clusters of samples -> PC1 separates them
    rng = np.random.default_rng(7)
    nv, ns = 300, 12
    group = np.array([0] * 6 + [1] * 6)
    p0 = rng.uniform(0.1, 0.9, size=nv)
    p1 = np.clip(p0 + rng.choice([-0.4, 0.4], size=nv), 0.05, 0.95)
    codes = np.empty((nv, ns), dtype=np.uint8)
    for s in range(ns):
        p = p0 if group[s] == 0 else p1
        codes[:, s] = rng.binomial(2, p)
    acc, m = _grm_oracle(codes)
    vals, vecs = pca_from_grm(acc, m, k=3)
    assert vals[0] > vals[1] > 0
    pc1 = vecs[:, 0]
    # PC1 splits the groups: signs within each group agree
    assert len(set(np.sign(pc1[:6]))) == 1
    assert len(set(np.sign(pc1[6:]))) == 1
    assert np.sign(pc1[0]) != np.sign(pc1[6])
    # deterministic sign: max-|entry| positive
    assert pc1[np.argmax(np.abs(pc1))] > 0


def test_pca_from_grm_errors_with_no_used_variants():
    with pytest.raises(ValueError):
        pca_from_grm(np.zeros((3, 3)), 0, 2)


def test_grm_mesh_psum_matches_single_device(tmp_path):
    import jax

    from pgen_tpu.ops.pca import build_grm_mesh_step
    from pgen_tpu.parallel.mesh import make_mesh, pad_to_multiple

    ndev = len(jax.devices())
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(41, 5), dtype=np.uint8)
    packed = _pack(codes, tmp_path)
    ref = grm_numpy(packed, 5)
    padded = pad_to_multiple(packed, ndev)
    padded[packed.shape[0]:] = 0xFF  # all-missing pad rows
    step = build_grm_mesh_step(make_mesh(), num_samples=5, block_variants=4)
    acc, m = step(padded)
    assert int(m) == ref.m_used
    np.testing.assert_allclose(
        np.asarray(acc, np.float64), ref.grm_sum, rtol=2e-5, atol=2e-5
    )


def _pca_fileset(tmp_path, codes):
    nvar, ns = codes.shape
    pvar_rows = [f"1\t{100 + i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nvar)]
    psam_rows = [f"s{i}\t{'F' if i % 2 else 'M'}" for i in range(ns)]
    return build_fileset(tmp_path, "pca", codes, pvar_rows, psam_rows)


def test_cli_pca_outputs(tmp_path):
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 3, size=(80, 8), dtype=np.uint8)
    prefix = _pca_fileset(tmp_path, codes)
    out = str(tmp_path / "out")
    assert run_cli(["pca", prefix, "-k", "3", "-o", out]) == 0
    vec_lines = (tmp_path / "out.eigenvec").read_text().splitlines()
    assert vec_lines[0] == "#IID\tPC1\tPC2\tPC3"
    assert len(vec_lines) == 9
    vals = [float(x) for x in (tmp_path / "out.eigenval").read_text().split()]
    assert len(vals) == 3 and vals == sorted(vals, reverse=True)
    # unit-norm columns
    mat = np.array([[float(x) for x in l.split("\t")[1:]] for l in vec_lines[1:]])
    np.testing.assert_allclose(np.linalg.norm(mat, axis=0), 1.0, rtol=1e-6)
    # parity with the oracle eigen path (up to the fixed sign convention)
    acc, m = _grm_oracle(codes)
    _, vecs = pca_from_grm(acc, m, k=3)
    np.testing.assert_allclose(mat, vecs, atol=1e-6)


def test_cli_pca_provider_parity_and_subset(tmp_path):
    rng = np.random.default_rng(12)
    codes = rng.integers(0, 4, size=(60, 7), dtype=np.uint8)
    prefix = _pca_fileset(tmp_path, codes)
    texts = []
    for prov in ("numpy", "device"):
        out = str(tmp_path / prov)
        assert run_cli([
            "pca", prefix, "-k", "2", "-o", out, "--provider", prov,
            "--samples", "s0,s2,s3,s5,s6",
        ]) == 0
        vec = (tmp_path / f"{prov}.eigenvec").read_text()
        assert vec.splitlines()[1].split("\t")[0] == "s0"
        texts.append(
            np.array([[float(x) for x in l.split("\t")[1:]]
                      for l in vec.splitlines()[1:]])
        )
    np.testing.assert_allclose(texts[0], texts[1], atol=5e-5)


def test_cli_make_rel(tmp_path):
    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, size=(50, 6), dtype=np.uint8)
    prefix = _pca_fileset(tmp_path, codes)
    out = str(tmp_path / "rel")
    assert run_cli(["pca", prefix, "-k", "0", "-o", out, "--make-rel"]) == 0
    ids = (tmp_path / "rel.rel.id").read_text().split()
    assert ids == [f"s{i}" for i in range(6)]
    mat = np.fromfile(tmp_path / "rel.rel.bin", dtype="<f8").reshape(6, 6)
    acc, m = _grm_oracle(codes)
    np.testing.assert_allclose(mat, acc / m, rtol=1e-12, atol=1e-12)
    assert not (tmp_path / "rel.eigenvec").exists()  # k=0 skips eigh
    # text flavor agrees
    out2 = str(tmp_path / "relt")
    assert run_cli([
        "pca", prefix, "-k", "2", "-o", out2, "--make-rel", "text",
    ]) == 0
    txt = np.loadtxt(tmp_path / "relt.rel", delimiter="\t")
    np.testing.assert_allclose(txt, mat, rtol=1e-9, atol=1e-9)
    assert (tmp_path / "relt.eigenvec").exists()


def test_pca_k0_without_rel_errors(tmp_path):
    rng = np.random.default_rng(22)
    codes = rng.integers(0, 3, size=(10, 4), dtype=np.uint8)
    prefix = _pca_fileset(tmp_path, codes)
    assert run_cli(["pca", prefix, "-k", "0"]) == 1


# -- randomized PCA (--approx, plink2 --pca approx analog) -------------------


def _structured_codes(rng, nv, ns, ngroups=3):
    """Genotypes with planted population structure: ngroups subpopulations
    with distinct allele frequencies give ngroups-1 dominant PCs."""
    group = np.arange(ns) % ngroups
    base = rng.uniform(0.15, 0.85, size=nv)
    shift = rng.uniform(-0.3, 0.3, size=(ngroups, nv))
    codes = np.empty((nv, ns), dtype=np.uint8)
    for s in range(ns):
        p = np.clip(base + shift[group[s]], 0.02, 0.98)
        codes[:, s] = rng.binomial(2, p)
    return codes


def test_pca_approx_matches_exact(tmp_path):
    """Randomized subspace iteration vs the exact GRM + eigh path at
    basic1-like scale: leading eigenpairs to rtol 1e-3 (VERDICT item 7)."""
    from pgen_tpu.ops.pca import grm_numpy, pca_approx, pca_from_grm

    rng = np.random.default_rng(42)
    nv, ns = 800, 180
    codes = _structured_codes(rng, nv, ns)
    packed = _pack(codes, tmp_path)
    ref = grm_numpy(packed, ns)
    vals_e, vecs_e = pca_from_grm(ref.grm_sum, ref.m_used, 4)
    got = pca_approx(packed, ns, k=4, iters=10, seed=1)
    assert got.m_used == ref.m_used
    # the structured components (ngroups=3 plants 2) must match to 1e-3;
    # PC3+ sit in the noise bulk where the eigengap is ~0 — individual
    # components there are not identifiable by ANY method (exact included:
    # they rotate freely within the near-degenerate subspace), so only
    # their eigenvalue MAGNITUDE is checked, loosely.
    np.testing.assert_allclose(got.eigenvalues[:2], vals_e[:2], rtol=1e-3)
    np.testing.assert_allclose(got.eigenvalues[2:], vals_e[2:], rtol=0.05)
    for c in range(2):
        dot = abs(float(got.eigenvectors[:, c] @ vecs_e[:, c]))
        assert dot > 1 - 1e-3, f"PC{c + 1} alignment {dot}"


def test_pca_approx_device_matches_numpy(tmp_path):
    """The device pass (variant-sharded psum over the virtual mesh) must
    agree with the host pass up to f32 Gram noise."""
    from pgen_tpu.ops.pca import pca_approx

    rng = np.random.default_rng(43)
    nv, ns = 160, 24
    codes = _structured_codes(rng, nv, ns, ngroups=2)
    codes[rng.random((nv, ns)) < 0.05] = 3  # missingness
    packed = _pack(codes, tmp_path)
    host = pca_approx(packed, ns, k=2, iters=8, seed=3)
    dev = pca_approx(
        packed, ns, k=2, iters=8, seed=3, provider="device",
        block_variants=32,
    )
    assert host.m_used == dev.m_used
    np.testing.assert_allclose(dev.eigenvalues, host.eigenvalues, rtol=1e-3)
    for c in range(2):
        dot = abs(float(dev.eigenvectors[:, c] @ host.eigenvectors[:, c]))
        assert dot > 1 - 1e-4


def test_pca_approx_bounded_memory_100k_samples(tmp_path):
    """S = 100k: the exact path's Gram would be 80 GB — approx must run in
    bounded memory (its only O(S) state is the (S, k+8) subspace)."""
    from pgen_tpu.ops.pca import pca_approx

    rng = np.random.default_rng(5)
    nv, ns = 24, 100_000
    codes = _structured_codes(rng, nv, ns, ngroups=2)
    packed = _pack(codes, tmp_path)
    got = pca_approx(packed, ns, k=2, iters=4, seed=1, block_variants=8)
    assert got.eigenvectors.shape == (ns, 2)
    assert np.isfinite(got.eigenvalues).all() and got.eigenvalues[0] > 0
    np.testing.assert_allclose(
        np.linalg.norm(got.eigenvectors, axis=0), 1.0, rtol=1e-9
    )
    # the two planted groups separate on PC1 (24 variants -> noisy PCs;
    # demand clear but not perfect separation)
    pc1 = got.eigenvectors[:, 0]
    g0, g1 = pc1[0::2], pc1[1::2]
    assert abs(g0.mean() - g1.mean()) > 1.0 * (g0.std() + g1.std())


def test_cli_pca_approx(tmp_path):
    rng = np.random.default_rng(17)
    codes = _structured_codes(rng, 300, 30, ngroups=2)
    prefix = _pca_fileset(tmp_path, codes)
    out = str(tmp_path / "ap")
    assert run_cli(["pca", prefix, "-k", "2", "-o", out, "--approx"]) == 0
    vec_lines = (tmp_path / "ap.eigenvec").read_text().splitlines()
    assert vec_lines[0] == "#IID\tPC1\tPC2"
    mat = np.array([[float(x) for x in l.split("\t")[1:]] for l in vec_lines[1:]])
    acc, m = _grm_oracle(codes)
    _, vecs = pca_from_grm(acc, m, k=2)
    for c in range(2):
        assert abs(float(mat[:, c] @ vecs[:, c])) > 1 - 1e-3
    # --approx + --make-rel contradict
    assert run_cli([
        "pca", prefix, "-k", "2", "-o", out, "--approx", "--make-rel",
    ]) == 1
