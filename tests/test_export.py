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


# ---- export ped (PLINK1 text pair; plink2 --export ped analog) -------------


def test_export_ped_pair(tmp_path):
    codes = np.array(
        [[0, 1, 2, 3], [2, 2, 0, 1]], dtype=np.uint8
    )
    pvar_rows = ["1\t100\trs0\tA\tG\t.\tPASS\t.",
                 "2\t200\trs1\tC\tT\t.\tPASS\t."]
    psam_rows = [f"s{i}\tM\t0.5" for i in range(4)]
    prefix = build_fileset(
        tmp_path, "pd", codes, pvar_rows, psam_rows,
        psam_columns="#IID\tSEX\tPHENO1",
    )
    out = tmp_path / "o"
    assert run_cli(["export", prefix, "ped", "-o", str(out)]) == 0
    mapl = (tmp_path / "o.map").read_text().splitlines()
    assert mapl == ["1\trs0\t0\t100", "2\trs1\t0\t200"]
    ped = (tmp_path / "o.ped").read_text().splitlines()
    assert len(ped) == 4
    # s0: FID=0 (no FID col), sex M->1, pheno 0.5; rs0 code 0 -> A A,
    # rs1 code 2 -> T T
    assert ped[0] == "0\ts0\t0\t0\t1\t0.5\tA\tA\tT\tT"
    # s1: rs0 het -> A G, rs1 hom-alt -> T T
    assert ped[1].split("\t")[6:] == ["A", "G", "T", "T"]
    # s3: rs0 missing -> 0 0, rs1 het -> C T
    assert ped[3].split("\t")[6:] == ["0", "0", "C", "T"]


def test_export_ped_indel_alleles_general_path(tmp_path):
    # multi-char REF/ALT forces the variable-width gather path
    codes = np.array([[0, 1, 2], [1, 3, 0]], dtype=np.uint8)
    pvar_rows = ["1\t100\tv0\tAT\tG\t.\tPASS\t.",
                 "1\t200\tv1\tC\tCTT\t.\tPASS\t."]
    psam_rows = [f"s{i}\tF" for i in range(3)]
    prefix = build_fileset(tmp_path, "pi", codes, pvar_rows, psam_rows)
    out = tmp_path / "o"
    assert run_cli(["export", prefix, "ped", "-o", str(out)]) == 0
    ped = (tmp_path / "o.ped").read_text().splitlines()
    assert ped[0].split("\t")[6:] == ["AT", "AT", "C", "CTT"]
    assert ped[1].split("\t")[6:] == ["AT", "G", "0", "0"]
    assert ped[2].split("\t")[6:] == ["G", "G", "C", "C"]


def test_export_ped_fast_vs_general_paths_agree(tmp_path):
    rng = np.random.default_rng(17)
    nv, ns = 23, 9
    codes = rng.integers(0, 4, size=(nv, ns), dtype=np.uint8)
    pvar_rows = [
        f"1\t{100+i}\trs{i}\t{'ACGT'[i % 4]}\t{'TGCA'[i % 4]}\t.\tPASS\t."
        for i in range(nv)
    ]
    psam_rows = [f"s{i}\tM" for i in range(ns)]
    prefix = build_fileset(tmp_path, "pf", codes, pvar_rows, psam_rows)
    from pgen_tpu.pipeline import export_raw as er

    out1 = tmp_path / "fast"
    assert run_cli(["export", prefix, "ped", "-o", str(out1)]) == 0
    # force the general path by patching the single-char detection
    import unittest.mock as mock

    out2 = tmp_path / "gen"
    real_all = all
    with mock.patch.object(er, "all", create=True,
                           side_effect=lambda it: False):
        er.export_ped(prefix, out_prefix=str(out2))
    assert (tmp_path / "fast.ped").read_bytes() == (
        tmp_path / "gen.ped").read_bytes()


def test_export_ped_filters_and_sex_pheno_defaults(tmp_path):
    codes = np.array([[0, 1], [1, 2], [2, 0]], dtype=np.uint8)
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(3)]
    psam_rows = ["s0\tX", "s1\t."]  # unknown sex -> 0; no PHENO1 -> -9
    prefix = build_fileset(tmp_path, "ps", codes, pvar_rows, psam_rows)
    out = tmp_path / "o"
    assert run_cli(["export", prefix, "ped", "-o", str(out),
                    "--include-var", 'ID!="rs1"',
                    "--include-sam", 'IID=="s1"']) == 0
    ped = (tmp_path / "o.ped").read_text().splitlines()
    assert ped == ["0\ts1\t0\t0\t0\t-9\tA\tG\tA\tA"]
    mapl = (tmp_path / "o.map").read_text().splitlines()
    assert [r.split("\t")[1] for r in mapl] == ["rs0", "rs2"]
    # '-' out is rejected for the pair format
    assert run_cli(["export", prefix, "ped", "-o", "-"]) == 2


def test_export_ped_rejects_multiallelic(tmp_path):
    codes = np.zeros((2, 3), dtype=np.uint8)
    pvar_rows = ["1\t100\tv0\tA\tG\t.\tPASS\t.",
                 "1\t200\tv1\tC\tG,T\t.\tPASS\t."]
    psam_rows = [f"s{i}\tM" for i in range(3)]
    prefix = build_fileset(tmp_path, "pm", codes, pvar_rows, psam_rows)
    assert run_cli(["export", prefix, "ped",
                    "-o", str(tmp_path / "o")]) != 0
    # filtering the multiallelic row away makes it exportable
    assert run_cli(["export", prefix, "ped", "-o", str(tmp_path / "o"),
                    "--include-var", 'ID=="v0"']) == 0
