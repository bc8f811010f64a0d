"""`diff` (plink2 --pgen-diff analog): matching, discordance detection,
missing handling, and the CLI surface."""

import numpy as np

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset


def _fileset(tmp_path, name, codes, poss=None, iids=None):
    nvar, ns = codes.shape
    poss = poss or [100 + i for i in range(nvar)]
    iids = iids or [f"s{i}" for i in range(ns)]
    pvar_rows = [
        f"1\t{poss[i]}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nvar)
    ]
    psam_rows = [f"{iid}\tM" for iid in iids]
    return build_fileset(tmp_path, name, codes, pvar_rows, psam_rows)


def test_identical_filesets_no_diff(tmp_path):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(10, 4), dtype=np.uint8)
    a = _fileset(tmp_path, "a", codes)
    b = _fileset(tmp_path, "b", codes)
    out = tmp_path / "d.pdiff"
    assert run_cli(["diff", a, b, "-o", str(out)]) == 0
    assert out.read_text().splitlines() == ["#CHROM\tPOS\tID\tIID\tGT1\tGT2"]


def test_discordant_cells_reported(tmp_path):
    codes_a = np.zeros((4, 3), dtype=np.uint8)
    codes_b = codes_a.copy()
    codes_b[1, 2] = 2   # hom mismatch
    codes_b[3, 0] = 3   # missing-vs-called
    a = _fileset(tmp_path, "a", codes_a)
    b = _fileset(tmp_path, "b", codes_b)
    out = tmp_path / "d.pdiff"
    # default matches plink2 --pgen-diff: half-missing pairs are skipped
    assert run_cli(["diff", a, b, "-o", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()[1:]]
    assert len(rows) == 1
    assert rows[0] == ["1", "101", "rs1", "s2", "0/0", "1/1"]
    # --include-missing opts into counting the half-missing pair
    assert run_cli(["diff", a, b, "-o", str(out), "--include-missing"]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()[1:]]
    assert len(rows) == 2
    assert rows[1] == ["1", "103", "rs3", "s0", "0/0", "./."]


def test_partial_variant_and_sample_overlap(tmp_path):
    rng = np.random.default_rng(5)
    codes_a = rng.integers(0, 3, size=(6, 3), dtype=np.uint8)
    # B: variants shifted (only positions 102..105 shared), samples s1,s2,x
    codes_b = rng.integers(0, 3, size=(6, 3), dtype=np.uint8)
    a = _fileset(tmp_path, "a", codes_a, poss=[100, 101, 102, 103, 104, 105])
    b = _fileset(tmp_path, "b", codes_b, poss=[102, 103, 104, 105, 106, 107],
                 iids=["s1", "s2", "x"])
    out = tmp_path / "d.pdiff"
    assert run_cli(["diff", a, b, "-o", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()[1:]]
    # matched: A rows 2..5 vs B rows 0..3 x samples s1, s2
    exp = 0
    for av, bv in zip(range(2, 6), range(0, 4)):
        for asmp, bsmp in ((1, 0), (2, 1)):
            if codes_a[av, asmp] != codes_b[bv, bsmp]:
                exp += 1
    assert len(rows) == exp
    assert all(r[3] in ("s1", "s2") for r in rows)
    # ID column is A's
    assert all(r[2] in (f"rs{v}" for v in range(2, 6)) for r in rows)


def test_duplicate_keys_first_occurrence(tmp_path):
    codes_a = np.array([[0], [1]], dtype=np.uint8)
    codes_b = np.array([[2], [1]], dtype=np.uint8)
    # same POS twice on both sides: only the first A row vs first B row
    a = _fileset(tmp_path, "a", codes_a, poss=[100, 100])
    b = _fileset(tmp_path, "b", codes_b, poss=[100, 100])
    out = tmp_path / "d.pdiff"
    assert run_cli(["diff", a, b, "-o", str(out)]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()[1:]]
    assert len(rows) == 1
    assert rows[0][4:] == ["0/0", "1/1"]


def test_per_sample_summary(tmp_path):
    codes_a = np.array([[0, 1], [1, 1], [2, 3], [3, 3]], dtype=np.uint8)
    codes_b = np.array([[0, 2], [1, 1], [2, 0], [3, 3]], dtype=np.uint8)
    a = _fileset(tmp_path, "a", codes_a)
    b = _fileset(tmp_path, "b", codes_b)
    out = tmp_path / "d.pdiff"
    assert run_cli(["diff", a, b, "-o", str(out), "--per-sample"]) == 0
    rows = [l.split("\t") for l in
            (tmp_path / "d.pdiff.sdiff").read_text().splitlines()]
    assert rows[0] == ["#IID", "DIFF_CT", "CMP_CT", "CONCORDANCE"]
    # s0: rows 0-2 compared (row 3 both-missing), 0 diffs
    assert rows[1] == ["s0", "0", "3", "1"]
    # s1 (default: half-missing pairs skipped): row 0 diff (0/1 vs 1/1),
    # row 1 equal; rows 2 (half-missing) and 3 (both-missing) not compared
    assert rows[2][0] == "s1" and rows[2][1] == "1" and rows[2][2] == "2"
    # --include-missing: row 2's half-missing pair compares and diffs
    assert run_cli(["diff", a, b, "-o", str(out), "--per-sample",
                    "--include-missing"]) == 0
    rows = [l.split("\t") for l in
            (tmp_path / "d.pdiff.sdiff").read_text().splitlines()]
    assert rows[2][0] == "s1" and rows[2][1] == "2" and rows[2][2] == "3"
