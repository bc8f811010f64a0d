"""`fst` between cohorts (pipeline/fst.py; plink2 --fst analog):
Hudson and Weir-Cockerham estimators against textbook brute-force
oracles, cohort assignment surfaces, and the CLI/file layout."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.pipeline.fst import fst_pfile


def _fileset(tmp_path, codes, cats, name="fs"):
    nv, ns = codes.shape
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nv)]
    psam_rows = [f"s{i}\tM\t{cats[i]}" for i in range(ns)]
    return build_fileset(
        tmp_path, name, codes, pvar_rows, psam_rows,
        psam_columns="#IID\tSEX\tPOP",
    )


def _oracle_pair(codes, idx1, idx2, method):
    """Straightforward per-variant loops — no shared code with the
    pipeline."""
    nums, dens, per_var = [], [], []
    for v in range(codes.shape[0]):
        stats = []
        for idx in (idx1, idx2):
            g = codes[v, idx]
            g = g[g != 3]
            n = len(g)
            het = int((g == 1).sum())
            ac = int((g == 1).sum() + 2 * (g == 2).sum())
            p = ac / (2.0 * n) if n else float("nan")
            stats.append((n, p, het))
        (n1, p1, h1), (n2, p2, h2) = stats
        if method == "hudson":
            if 2 * n1 < 2 or 2 * n2 < 2:
                per_var.append(np.nan)
                continue
            num = (
                (p1 - p2) ** 2
                - p1 * (1 - p1) / (2 * n1 - 1)
                - p2 * (1 - p2) / (2 * n2 - 1)
            )
            den = p1 * (1 - p2) + p2 * (1 - p1)
        else:
            if n1 < 1 or n2 < 1 or (n1 + n2) / 2.0 <= 1:
                per_var.append(np.nan)
                continue
            r = 2
            nbar = (n1 + n2) / 2.0
            nc = (n1 + n2 - (n1**2 + n2**2) / (n1 + n2)) / (r - 1)
            if nc <= 0:
                per_var.append(np.nan)
                continue
            pbar = (n1 * p1 + n2 * p2) / (n1 + n2)
            s2 = (
                n1 * (p1 - pbar) ** 2 + n2 * (p2 - pbar) ** 2
            ) / ((r - 1) * nbar)
            hbar = (h1 + h2) / (n1 + n2)
            a = (nbar / nc) * (
                s2
                - (pbar * (1 - pbar) - (r - 1) / r * s2 - hbar / 4.0)
                / (nbar - 1)
            )
            b = (nbar / (nbar - 1)) * (
                pbar * (1 - pbar)
                - (r - 1) / r * s2
                - (2 * nbar - 1) / (4 * nbar) * hbar
            )
            c = hbar / 2.0
            num, den = a, a + b + c
        if den == 0:
            per_var.append(np.nan)
            continue
        nums.append(num)
        dens.append(den)
        per_var.append(num / den)
    fst = sum(nums) / sum(dens) if dens else float("nan")
    return fst, len(nums), per_var


@pytest.mark.parametrize("method", ["hudson", "wc"])
def test_fst_matches_bruteforce_oracle(method, tmp_path):
    rng = np.random.default_rng(11)
    nv, ns = 40, 60
    # two drifted populations + missing calls + monomorphic rows
    codes = np.empty((nv, ns), dtype=np.uint8)
    cats = ["A"] * 30 + ["B"] * 30
    for v in range(nv):
        pa, pb = rng.random() * 0.9 + 0.05, rng.random() * 0.9 + 0.05
        codes[v, :30] = rng.binomial(2, pa, 30)
        codes[v, 30:] = rng.binomial(2, pb, 30)
    codes[rng.random((nv, ns)) < 0.05] = 3
    codes[5] = 0  # monomorphic in both: D == 0, excluded
    prefix = _fileset(tmp_path, codes, cats)
    res = fst_pfile(prefix, pheno_name="POP", method=method,
                    out_file=str(tmp_path / "o"))
    exp_fst, exp_used, _ = _oracle_pair(
        codes, np.arange(30), np.arange(30, 60), method
    )
    (p1, p2, fst, used), = res.pairs
    assert (p1, p2) == ("A", "B")
    assert used == exp_used
    np.testing.assert_allclose(fst, exp_fst, rtol=1e-10)
    # drifted pops must show positive differentiation
    assert fst > 0


def test_fst_report_variants_and_summary_layout(tmp_path):
    rng = np.random.default_rng(12)
    nv, ns = 12, 40
    codes = rng.binomial(2, 0.4, size=(nv, ns)).astype(np.uint8)
    cats = ["A"] * 20 + ["B"] * 20
    prefix = _fileset(tmp_path, codes, cats)
    base = tmp_path / "out"
    res = fst_pfile(prefix, pheno_name="POP", report_variants=True,
                    out_file=str(base))
    summary = (tmp_path / "out.fst.summary").read_text().splitlines()
    assert summary[0] == "#POP1\tPOP2\tHUDSON_FST\tVARIANT_CT"
    assert len(summary) == 2
    var = (tmp_path / "out.A.B.fst.var").read_text().splitlines()
    assert var[0] == "#CHROM\tPOS\tID\tOBS_CT\tHUDSON_FST"
    assert len(var) == 1 + nv
    _, _, per_var = _oracle_pair(
        codes, np.arange(20), np.arange(20, 40), "hudson"
    )
    for ln, exp in zip(var[1:], per_var):
        cell = ln.split("\t")[4]
        if np.isnan(exp):
            assert cell == "NA"
        else:
            np.testing.assert_allclose(float(cell), exp, rtol=1e-5)


def test_fst_multi_cohort_pairs_and_missing_category(tmp_path):
    rng = np.random.default_rng(13)
    nv, ns = 10, 45
    codes = rng.binomial(2, 0.5, size=(nv, ns)).astype(np.uint8)
    cats = ["A"] * 15 + ["B"] * 15 + ["C"] * 10 + ["NA"] * 5
    prefix = _fileset(tmp_path, codes, cats)
    res = fst_pfile(prefix, pheno_name="POP", out_file=str(tmp_path / "o"))
    assert [(a, b) for a, b, _, _ in res.pairs] == [
        ("A", "B"), ("A", "C"), ("B", "C")
    ]
    assert res.num_samples == 40  # NA samples unassigned


def test_fst_within_file_and_cli(tmp_path):
    rng = np.random.default_rng(14)
    nv, ns = 8, 30
    codes = rng.binomial(2, 0.4, size=(nv, ns)).astype(np.uint8)
    prefix = _fileset(tmp_path, codes, ["x"] * ns)
    within = tmp_path / "w.txt"
    within.write_text(
        "".join(f"s{i} {'P1' if i < 15 else 'P2'}\n" for i in range(ns))
    )
    out = tmp_path / "cli"
    assert run_cli(["fst", prefix, "--within", str(within), "--method",
                    "wc", "-o", str(out)]) == 0
    summary = (tmp_path / "cli.fst.summary").read_text().splitlines()
    assert summary[0] == "#POP1\tPOP2\tWC_FST\tVARIANT_CT"
    exp_fst, _, _ = _oracle_pair(
        codes, np.arange(15), np.arange(15, 30), "wc"
    )
    got = float(summary[1].split("\t")[2])
    np.testing.assert_allclose(got, exp_fst, rtol=1e-5)
    # cohort interacts with --include-sam (kept samples only)
    assert run_cli(["fst", prefix, "--within", str(within),
                    "--include-sam", 'IID!="s0"', "-o", str(out)]) == 0
    # errors: missing assignment flags, single cohort
    assert run_cli(["fst", prefix, "-o", str(out)]) == 1
    one = tmp_path / "one.txt"
    one.write_text("".join(f"s{i} P1\n" for i in range(ns)))
    assert run_cli(["fst", prefix, "--within", str(one),
                    "-o", str(out)]) == 1
