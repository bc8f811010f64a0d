"""`ld` report (plink --r2 analog): r2 values vs a corrcoef oracle,
windowing knobs, chromosome isolation, and provider parity."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset


def _r2_oracle(codes, i, j):
    """Mean-imputed centered-dosage r2 between variant rows i and j."""
    def center(row):
        called = row != 3
        g = row.astype(float) * called
        mean = g.sum() / max(called.sum(), 1)
        return (g - mean) * called

    a, b = center(codes[i]), center(codes[j])
    den = np.sqrt((a * a).sum() * (b * b).sum())
    return 0.0 if den == 0 else float((a @ b) ** 2 / den**2)


def _fileset(tmp_path, codes, chroms=None, pos=None):
    nvar, ns = codes.shape
    chroms = chroms or ["1"] * nvar
    pos = pos if pos is not None else [100 + i * 10 for i in range(nvar)]
    pvar_rows = [
        f"{chroms[i]}\t{pos[i]}\trs{i}\tA\tG\t.\tPASS\t."
        for i in range(nvar)
    ]
    psam_rows = [f"s{i}\tM" for i in range(ns)]
    return build_fileset(tmp_path, "ld", codes, pvar_rows, psam_rows)


def _read(path):
    lines = open(path).read().splitlines()
    return [ln.split("\t") for ln in lines[1:]]


def test_ld_values_match_oracle(tmp_path):
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=(12, 40), dtype=np.uint8)
    codes[3] = codes[2]  # perfect LD pair
    prefix = _fileset(tmp_path, codes)
    out = tmp_path / "t.ld"
    assert run_cli([
        "ld", prefix, "-o", str(out), "--ld-window", "5",
        "--ld-window-r2", "0",
    ]) == 0
    rows = _read(out)
    # every in-window pair present (j - i < 5), values match the oracle
    exp_pairs = [(i, j) for i in range(12) for j in range(i + 1, min(i + 5, 12))]
    assert len(rows) == len(exp_pairs)
    by_pair = {(r[2], r[5]): float(r[6]) for r in rows}
    for i, j in exp_pairs:
        assert by_pair[(f"rs{i}", f"rs{j}")] == pytest.approx(
            _r2_oracle(codes, i, j), abs=1e-6
        )
    assert by_pair[("rs2", "rs3")] == pytest.approx(1.0)


def test_ld_r2_threshold_and_kb_window(tmp_path):
    codes = np.array(
        [[0, 1, 2, 0, 1, 2, 0, 1], [0, 1, 2, 0, 1, 2, 0, 1],
         [0, 1, 2, 0, 1, 2, 0, 1]],
        dtype=np.uint8,
    )  # three identical variants: r2 = 1 for all pairs
    prefix = _fileset(tmp_path, codes, pos=[1000, 2000, 900_000])
    out = tmp_path / "t.ld"
    # kb window 100: the 900 kb-distant pairs drop
    assert run_cli([
        "ld", prefix, "-o", str(out), "--ld-window-kb", "100",
    ]) == 0
    rows = _read(out)
    assert [(r[2], r[5]) for r in rows] == [("rs0", "rs1")]
    # r2 threshold above 1 removes everything
    assert run_cli([
        "ld", prefix, "-o", str(out), "--ld-window-r2", "1.1",
    ]) == 0
    assert _read(out) == []


def test_ld_chromosome_isolation(tmp_path):
    codes = np.tile(
        np.array([[0, 1, 2, 0, 1, 2]], dtype=np.uint8), (4, 1)
    )
    prefix = _fileset(tmp_path, codes, chroms=["1", "1", "2", "2"],
                      pos=[100, 200, 100, 200])
    out = tmp_path / "t.ld"
    assert run_cli(["ld", prefix, "-o", str(out)]) == 0
    rows = _read(out)
    assert [(r[0], r[2], r[5]) for r in rows] == [
        ("1", "rs0", "rs1"), ("2", "rs2", "rs3"),
    ]


def test_ld_provider_parity(tmp_path):
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=(20, 16), dtype=np.uint8)
    prefix = _fileset(tmp_path, codes)
    texts = []
    for prov in ("numpy", "device"):
        out = tmp_path / f"{prov}.ld"
        assert run_cli([
            "ld", prefix, "-o", str(out), "--provider", prov,
            "--ld-window", "6", "--ld-window-r2", "0.1",
        ]) == 0
        texts.append(out.read_text())
    assert texts[0] == texts[1]


def test_ld_kb_window_uses_absolute_distance(tmp_path):
    # POS out of ascending order: the (rs0, rs1) distance is NEGATIVE as a
    # signed difference; |.| must still apply the kb window to it
    codes = np.tile(np.array([[0, 1, 2, 0, 1, 2]], dtype=np.uint8), (2, 1))
    prefix = _fileset(tmp_path, codes, pos=[500_000, 100])
    out = tmp_path / "t.ld"
    assert run_cli([
        "ld", prefix, "-o", str(out), "--ld-window-kb", "100",
        "--ld-window-r2", "0",
    ]) == 0
    assert _read(out) == []  # 499.9 kb apart: outside the 100 kb window
