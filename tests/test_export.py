"""`export` (.raw A/AD): golden text, NA handling, psam column mapping,
cohort subsets, and stdout emission."""

import numpy as np

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset


def _fileset(tmp_path, codes, psam_columns="#IID\tSEX", psam_rows=None):
    nvar, ns = codes.shape
    pvar_rows = [
        f"1\t{100 + i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nvar)
    ]
    if psam_rows is None:
        psam_rows = [f"s{i}\t{'F' if i % 2 else 'M'}" for i in range(ns)]
    return build_fileset(
        tmp_path, "ex", codes, pvar_rows, psam_rows,
        psam_columns=psam_columns,
    )


def test_export_a_golden(tmp_path):
    codes = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)  # V=2, S=3
    prefix = _fileset(tmp_path, codes)
    out = tmp_path / "a.raw"
    assert run_cli(["export", prefix, "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0] == ("FID\tIID\tPAT\tMAT\tSEX\tPHENOTYPE\t"
                        "rs0_G\trs1_G")
    # SEX: s0=M->1, s1=F->2; no FID/PAT/MAT/PHENO1 columns -> 0/0/0/NA
    assert lines[1] == "0\ts0\t0\t0\t1\tNA\t0\tNA"
    assert lines[2] == "0\ts1\t0\t0\t2\tNA\t1\t0"
    assert lines[3] == "0\ts2\t0\t0\t1\tNA\t2\t1"


def test_export_ad_golden(tmp_path):
    codes = np.array([[0, 1, 2, 3]], dtype=np.uint8)  # V=1, S=4
    prefix = _fileset(tmp_path, codes)
    out = tmp_path / "ad.raw"
    assert run_cli(["export", prefix, "AD", "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].endswith("PHENOTYPE\trs0_G\trs0_HET")
    vals = [l.split("\t")[6:] for l in lines[1:]]
    assert vals == [["0", "0"], ["1", "1"], ["2", "0"], ["NA", "NA"]]


def test_export_psam_columns_pass_through(tmp_path):
    codes = np.zeros((1, 2), dtype=np.uint8)
    prefix = _fileset(
        tmp_path, codes,
        psam_columns="#FID\tIID\tPAT\tMAT\tSEX\tPHENO1",
        psam_rows=["fam1\ts0\tp1\tp2\t2\t1.5", "fam2\ts1\t0\t0\tU\t-9"],
    )
    out = tmp_path / "p.raw"
    assert run_cli(["export", prefix, "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert lines[1].startswith("fam1\ts0\tp1\tp2\t2\t1.5\t")
    # unknown SEX token and -9 phenotype both map to NA
    assert lines[2].startswith("fam2\ts1\t0\t0\tNA\tNA\t")


def test_export_subsets_match_matrix(tmp_path):
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(12, 6), dtype=np.uint8)
    prefix = _fileset(tmp_path, codes)
    out = tmp_path / "s.raw"
    assert run_cli([
        "export", prefix, "-o", str(out),
        "--samples", "s1,s4", "--include-var", 'POS!="100"',
    ]) == 0
    lines = out.read_text().splitlines()
    assert len(lines) == 3  # header + 2 samples
    want = codes[1:][:, [1, 4]]  # variant rs0 dropped, samples s1/s4
    for r, s in enumerate(lines[1:]):
        cells = s.split("\t")[6:]
        got = [c for c in cells]
        exp = ["NA" if v == 3 else str(v) for v in want[:, r]]
        assert got == exp


def test_export_stdout(tmp_path, capfd):
    codes = np.array([[1, 3]], dtype=np.uint8)
    prefix = _fileset(tmp_path, codes)
    assert run_cli(["export", prefix, "-o", "-"]) == 0
    out = capfd.readouterr().out
    rows = out.splitlines()
    assert rows[0].startswith("FID\t") and len(rows) == 3
    assert rows[1].endswith("\t1") and rows[2].endswith("\tNA")
