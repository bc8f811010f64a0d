"""plink2 report-file family: freq/missing/hardy/het vs scalar oracles
and the CLI surfaces (pipeline/reports.py)."""

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset


@pytest.fixture()
def fileset(tmp_path):
    rng = np.random.default_rng(8)
    nv, ns = 40, 12
    codes = rng.integers(0, 4, size=(nv, ns), dtype=np.uint8)
    codes[0] = 0  # monomorphic
    codes[1] = 3  # all-missing
    rows = [
        f"{1 if i < 30 else 2}\t{100 + i}\trs{i}\tA\tG\t.\t.\t."
        for i in range(nv)
    ]
    prefix = build_fileset(
        tmp_path, "rep", codes, rows, [f"s{i}\tM" for i in range(ns)]
    )
    return prefix, codes


def _read_table(path):
    lines = open(path).read().splitlines()
    header = lines[0].lstrip("#").split("\t")
    return header, [dict(zip(header, ln.split("\t"))) for ln in lines[1:]]


def test_freq_matches_oracle(fileset, tmp_path):
    prefix, codes = fileset
    out = tmp_path / "f.afreq"
    assert run_cli(["freq", prefix, "-o", str(out)]) == 0
    header, rows = _read_table(out)
    assert header == ["CHROM", "ID", "REF", "ALT", "ALT_FREQS", "OBS_CT"]
    assert len(rows) == codes.shape[0]
    for v, row in enumerate(rows):
        cal = codes[v] != 3
        an = 2 * int(cal.sum())
        ac = int(codes[v][cal].sum())
        assert int(row["OBS_CT"]) == an
        if an == 0:
            assert row["ALT_FREQS"] == "NA"
        else:
            assert float(row["ALT_FREQS"]) == pytest.approx(ac / an, rel=1e-5)


def test_missing_matches_oracle(fileset, tmp_path):
    prefix, codes = fileset
    nv, ns = codes.shape
    assert run_cli(["missing", prefix, "-o", str(tmp_path / "m")]) == 0
    _, vrows = _read_table(tmp_path / "m.vmiss")
    for v, row in enumerate(vrows):
        miss = int((codes[v] == 3).sum())
        assert int(row["MISSING_CT"]) == miss
        assert int(row["OBS_CT"]) == ns
        assert float(row["F_MISS"]) == pytest.approx(miss / ns, rel=1e-5)
    _, srows = _read_table(tmp_path / "m.smiss")
    assert [r["IID"] for r in srows] == [f"s{i}" for i in range(ns)]
    for s, row in enumerate(srows):
        miss = int((codes[:, s] == 3).sum())
        assert int(row["MISSING_CT"]) == miss
        assert int(row["OBS_CT"]) == nv


def test_hardy_matches_oracle(fileset, tmp_path):
    from pgen_tpu.ops.hwe import hwe_exact_p

    prefix, codes = fileset
    out = tmp_path / "h.hardy"
    assert run_cli(["hardy", prefix, "-o", str(out)]) == 0
    header, rows = _read_table(out)
    assert header == [
        "CHROM", "ID", "A1", "AX", "HOM_A1_CT", "HET_A1_CT", "TWO_AX_CT",
        "O(HET_A1)", "E(HET_A1)", "P",
    ]
    counts = np.stack(
        [(codes == k).sum(axis=1) for k in range(4)], axis=1
    )
    p_ref = hwe_exact_p(counts)
    for v, row in enumerate(rows):
        hr, het, ha = (int((codes[v] == k).sum()) for k in (0, 1, 2))
        assert (row["A1"], row["AX"]) == ("G", "A")  # A1 = ALT
        assert int(row["HOM_A1_CT"]) == ha
        assert int(row["HET_A1_CT"]) == het
        assert int(row["TWO_AX_CT"]) == hr
        n = hr + het + ha
        if n:
            assert float(row["O(HET_A1)"]) == pytest.approx(het / n, rel=1e-5)
            a1, ax = 2 * ha + het, 2 * hr + het
            t = a1 + ax
            if t > 1:
                assert float(row["E(HET_A1)"]) == pytest.approx(
                    2 * a1 * ax / (t * (t - 1)), rel=1e-5
                )
            assert float(row["P"]) == pytest.approx(p_ref[v], rel=1e-5)
        else:
            assert row["O(HET_A1)"] == "NA" and row["P"] == "NA"


def _het_oracle(codes):
    """Scalar per-sample O(HOM)/E(HOM)/OBS/F (plink --het method of
    moments): e_v = 1 - 2AB/(T(T-1)) summed over the sample's called
    variants."""
    nv, ns = codes.shape
    e_v = np.empty(nv)
    for v in range(nv):
        cal = codes[v] != 3
        a = int(codes[v][cal].sum())
        t = 2 * int(cal.sum())
        b = t - a
        e_v[v] = 1.0 - 2.0 * a * b / (t * (t - 1)) if t > 1 else 1.0
    out = []
    for s in range(ns):
        cal = codes[:, s] != 3
        o_hom = int(((codes[:, s] == 0) | (codes[:, s] == 2)).sum())
        e_hom = float(e_v[cal].sum())
        obs = int(cal.sum())
        denom = obs - e_hom
        f = (o_hom - e_hom) / denom if abs(denom) > 1e-12 else np.nan
        out.append((o_hom, e_hom, obs, f))
    return out


def test_het_matches_oracle(fileset, tmp_path):
    prefix, codes = fileset
    out = tmp_path / "h.het"
    assert run_cli(["het", prefix, "-o", str(out)]) == 0
    header, rows = _read_table(out)
    assert header == ["IID", "O(HOM)", "E(HOM)", "OBS_CT", "F"]
    oracle = _het_oracle(codes)
    for s, row in enumerate(rows):
        o_hom, e_hom, obs, f = oracle[s]
        assert int(row["O(HOM)"]) == o_hom
        assert float(row["E(HOM)"]) == pytest.approx(e_hom, rel=1e-5)
        assert int(row["OBS_CT"]) == obs
        if np.isnan(f):
            assert row["F"] == "NA"
        else:
            assert float(row["F"]) == pytest.approx(f, rel=1e-4)


def test_reports_respect_predicates(fileset, tmp_path):
    """Cohort/variant predicates restrict every report (freq shown; the
    load path is shared)."""
    prefix, codes = fileset
    out = tmp_path / "sub.afreq"
    assert run_cli([
        "freq", prefix, "-o", str(out),
        "--include-var", 'CHROM == "2"',
        "--samples", "s0,s1,s2,s3",
    ]) == 0
    _, rows = _read_table(out)
    assert len(rows) == 10  # CHROM 2 rows only
    sub = codes[30:, :4]
    for v, row in enumerate(rows):
        cal = sub[v] != 3
        an = 2 * int(cal.sum())
        assert int(row["OBS_CT"]) == an


def test_report_default_out_paths(fileset, tmp_path):
    prefix, _ = fileset
    assert run_cli(["freq", prefix]) == 0
    assert (tmp_path / "rep.afreq").exists()
    assert run_cli(["missing", prefix]) == 0
    assert (tmp_path / "rep.vmiss").exists()
    assert (tmp_path / "rep.smiss").exists()
    assert run_cli(["hardy", prefix]) == 0
    assert (tmp_path / "rep.hardy").exists()
    assert run_cli(["het", prefix]) == 0
    assert (tmp_path / "rep.het").exists()


def test_freq_counts_mode(fileset, tmp_path):
    prefix, codes = fileset
    out = tmp_path / "f.acount"
    assert run_cli(["freq", prefix, "--counts", "-o", str(out)]) == 0
    header, rows = _read_table(out)
    assert header == ["CHROM", "ID", "REF", "ALT", "ALT_CTS", "OBS_CT"]
    for v, row in enumerate(rows):
        cal = codes[v] != 3
        assert int(row["ALT_CTS"]) == int(codes[v][cal].sum())
        assert int(row["OBS_CT"]) == 2 * int(cal.sum())
    # default out path gets the .acount extension
    assert run_cli(["freq", prefix, "--counts"]) == 0
    assert (tmp_path / "rep.acount").exists()


def test_gcount_matches_oracle(fileset, tmp_path):
    prefix, codes = fileset
    out = tmp_path / "g.gcount"
    assert run_cli(["gcount", prefix, "-o", str(out)]) == 0
    header, rows = _read_table(out)
    assert header == ["CHROM", "ID", "REF", "ALT", "HOM_REF_CT",
                      "HET_REF_ALT_CTS", "TWO_ALT_GENO_CTS", "MISSING_CT"]
    assert len(rows) == codes.shape[0]
    for v, row in enumerate(rows):
        for col, code in (("HOM_REF_CT", 0), ("HET_REF_ALT_CTS", 1),
                          ("TWO_ALT_GENO_CTS", 2), ("MISSING_CT", 3)):
            assert int(row[col]) == int((codes[v] == code).sum())


def test_gcount_respects_cohort(fileset, tmp_path):
    prefix, codes = fileset
    out = tmp_path / "g2.gcount"
    assert run_cli([
        "gcount", prefix, "-o", str(out), "--samples", "s0,s1,s2",
    ]) == 0
    _, rows = _read_table(out)
    sub = codes[:, :3]
    for v, row in enumerate(rows):
        assert int(row["MISSING_CT"]) == int((sub[v] == 3).sum())
