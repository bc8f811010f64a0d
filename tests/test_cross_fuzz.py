"""Cross-subcommand consistency fuzz: random filesets, invariants that
tie independent tools to each other (counts vs exports vs reports vs
diff) — integration regressions surface as inter-tool disagreement."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset


def _random_fileset(tmp_path, rng, trial):
    nvar = int(rng.integers(2, 40))
    nsamp = int(rng.integers(2, 30))
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    pos = np.cumsum(rng.integers(1, 1000, nvar)) + 100
    pvar_rows = [
        f"1\t{pos[i]}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nvar)
    ]
    psam_rows = [f"s{i}\tM" for i in range(nsamp)]
    prefix = build_fileset(
        tmp_path, f"cf{trial}", codes, pvar_rows, psam_rows
    )
    return prefix, codes


def _read_table(path):
    lines = open(path).read().splitlines()
    header = lines[0].lstrip("#").split("\t")
    return [dict(zip(header, ln.split("\t"))) for ln in lines[1:]]


@pytest.mark.parametrize("trial", range(6))
def test_cross_tool_invariants(tmp_path, trial):
    rng = np.random.default_rng(1000 + trial)
    prefix, codes = _random_fileset(tmp_path, rng, trial)
    nvar, nsamp = codes.shape

    # gcount classes sum to the cohort size
    assert run_cli(["gcount", prefix, "-o", str(tmp_path / "g.gcount")]) == 0
    grows = _read_table(tmp_path / "g.gcount")
    for r in grows:
        total = sum(int(r[c]) for c in
                    ("HOM_REF_CT", "HET_REF_ALT_CTS", "TWO_ALT_GENO_CTS",
                     "MISSING_CT"))
        assert total == nsamp

    # freq --counts ALT_CTS equals the export A matrix's column sums
    assert run_cli(["freq", prefix, "--counts",
                    "-o", str(tmp_path / "f.acount")]) == 0
    frows = _read_table(tmp_path / "f.acount")
    assert run_cli(["export", prefix, "-o", str(tmp_path / "e.raw")]) == 0
    elines = (tmp_path / "e.raw").read_text().splitlines()[1:]
    mat = np.array([
        [np.nan if c == "NA" else float(c) for c in ln.split("\t")[6:]]
        for ln in elines
    ])
    for v, r in enumerate(frows):
        assert int(r["ALT_CTS"]) == int(np.nansum(mat[:, v]))
        assert int(r["OBS_CT"]) == 2 * int(np.sum(~np.isnan(mat[:, v])))

    # diff against itself reports zero discordance
    assert run_cli(["diff", prefix, prefix,
                    "-o", str(tmp_path / "d.pdiff")]) == 0
    assert len((tmp_path / "d.pdiff").read_text().splitlines()) == 1

    # genome NSNP == missing-report agreement: per-pair both-called
    # count can never exceed either sample's called count
    assert run_cli(["genome", prefix, "-o", str(tmp_path / "g.genome")]) == 0
    called = (codes != 3).sum(axis=0)
    for r in _read_table(tmp_path / "g.genome"):
        i = int(r["IID1"][1:])
        j = int(r["IID2"][1:])
        assert int(r["NSNP"]) <= min(called[i], called[j])
        assert (int(r["IBS0"]) + int(r["IBS1"]) + int(r["IBS2"])
                == int(r["NSNP"]))

    # stats missing-call total == gcount MISSING_CT sum
    miss_total = sum(int(r["MISSING_CT"]) for r in grows)
    assert miss_total == int((codes == 3).sum())


@pytest.mark.parametrize("trial", range(4))
def test_ped_vcf_raw_consistency(tmp_path, trial):
    """export ped pairs <-> filter VCF GT cells <-> export A dosages."""
    rng = np.random.default_rng(2000 + trial)
    prefix, codes = _random_fileset(tmp_path, rng, trial)
    nvar, nsamp = codes.shape

    assert run_cli(["export", prefix, "ped", "-o", str(tmp_path / "p")]) == 0
    assert run_cli(["filter", prefix, "-o", str(tmp_path / "f.vcf")]) == 0
    ped = [ln.split("\t") for ln in
           (tmp_path / "p.ped").read_text().splitlines()]
    vcf = [ln.split("\t") for ln in
           (tmp_path / "f.vcf").read_text().splitlines()
           if not ln.startswith("#")]
    gt_to_pair = {"0/0": ("A", "A"), "0/1": ("A", "G"),
                  "1/1": ("G", "G"), "./.": ("0", "0")}
    for s in range(nsamp):
        pairs = ped[s][6:]
        assert len(pairs) == 2 * nvar
        for v in range(nvar):
            gt = vcf[v][9 + s]
            assert tuple(pairs[2 * v : 2 * v + 2]) == gt_to_pair[gt], (
                s, v, gt
            )
    # map row count matches VCF body rows
    assert len((tmp_path / "p.map").read_text().splitlines()) == len(vcf)


@pytest.mark.parametrize("trial", range(3))
def test_rm_dup_invariants(tmp_path, trial):
    """force-first output has unique IDs; exclude-all is a subset of it;
    list mode names exactly the IDs force-first deduplicates."""
    rng = np.random.default_rng(3000 + trial)
    nvar = int(rng.integers(4, 30))
    nsamp = int(rng.integers(2, 10))
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    # duplicate-rich ID space
    ids = [f"rs{rng.integers(0, max(2, nvar // 2))}" for _ in range(nvar)]
    pos = np.cumsum(rng.integers(1, 100, nvar)) + 100
    pvar_rows = [
        f"1\t{pos[i]}\t{ids[i]}\tA\tG\t.\tPASS\t." for i in range(nvar)
    ]
    psam_rows = [f"s{i}\tM" for i in range(nsamp)]
    prefix = build_fileset(tmp_path, f"rd{trial}", codes, pvar_rows, psam_rows)

    def body_ids(path):
        return [ln.split("\t")[2] for ln in open(path).read().splitlines()
                if not ln.startswith("#")]

    assert run_cli(["filter", prefix, "--rm-dup", "force-first",
                    "-o", str(tmp_path / "ff.vcf")]) == 0
    ff = body_ids(tmp_path / "ff.vcf")
    assert len(ff) == len(set(ff))              # unique IDs
    assert ff == list(dict.fromkeys(ids))       # first occurrences, in order

    assert run_cli(["filter", prefix, "--rm-dup", "exclude-all",
                    "-o", str(tmp_path / "ea.vcf")]) == 0
    ea = body_ids(tmp_path / "ea.vcf")
    assert set(ea) <= set(ff)
    assert ea == [i for i in ids if ids.count(i) == 1]

    assert run_cli(["filter", prefix, "--rm-dup", "list",
                    "-o", str(tmp_path / "ls.vcf")]) == 0
    lst = set((tmp_path / "ls.vcf.rmdup.list").read_text().split())
    assert lst == {i for i in ids if ids.count(i) > 1}
    assert body_ids(tmp_path / "ls.vcf") == ids  # list filters nothing
