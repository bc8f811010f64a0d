"""ROH (`roh`): windowed-state oracle, segment calling (trim/gap/
thresholds), chromosome isolation, and the CLI surface."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.ops.roh import RohParams, roh_segments_chrom, roh_state


def _state_oracle(het, miss, p):
    L, S = het.shape
    W = p.window_snp
    st = np.zeros((L, S), dtype=bool)
    if L < W:
        return st
    for s in range(S):
        acc = [
            het[i : i + W, s].sum() <= p.window_het
            and miss[i : i + W, s].sum() <= p.window_missing
            for i in range(L - W + 1)
        ]
        for j in range(L):
            cov = range(max(0, j - W + 1), min(j, L - W) + 1)
            hits = sum(acc[i] for i in cov)
            st[j, s] = hits >= p.window_threshold * len(cov)
    return st


@pytest.mark.parametrize("shape", [(5, 2), (30, 3), (83, 4)])
def test_state_matches_oracle(shape):
    rng = np.random.default_rng(shape[0])
    het = rng.random(shape) < 0.3
    miss = rng.random(shape) < 0.1
    p = RohParams(window_snp=7, window_het=1, window_missing=1,
                  window_threshold=0.3)
    np.testing.assert_array_equal(
        roh_state(het, miss, p), _state_oracle(het, miss, p)
    )


def test_state_short_chromosome_all_false():
    p = RohParams(window_snp=50)
    st = roh_state(np.zeros((10, 2), bool), np.zeros((10, 2), bool), p)
    assert not st.any()


def _het_background(L, S, run=None, seed=0):
    """het on even rows everywhere; `run`=(lo, hi_ex, sample) clears a
    homozygous stretch for one sample."""
    het = np.zeros((L, S), dtype=bool)
    het[::2, :] = True
    if run:
        lo, hi, s = run
        het[lo:hi, s] = False
    return het


def test_segment_basic_call_and_trim():
    L, S = 400, 2
    het = _het_background(L, S, run=(100, 300, 0))
    miss = np.zeros((L, S), dtype=bool)
    pos = (np.arange(L) + 1) * 10_000  # 10 kb spacing
    p = RohParams(window_snp=20, window_het=1, window_missing=2,
                  window_threshold=0.05, min_snp=50, min_kb=100,
                  density=50, gap=1000)
    segs = roh_segments_chrom("1", pos, het, miss, p)
    assert len(segs) == 1
    g = segs[0]
    assert g.sample == 0 and g.chrom == "1"
    # covers the hom run's interior, bounds near [100, 300), ends clean
    assert g.lo <= 110 and g.hi >= 290
    assert 90 <= g.lo and g.hi <= 310
    assert not het[g.lo, 0] and not het[g.hi, 0]
    assert g.nhet <= 3
    assert g.pos1 == pos[g.lo] and g.pos2 == pos[g.hi]
    assert g.nsnp == g.hi - g.lo + 1


def test_segment_thresholds_filter():
    L = 400
    het = _het_background(L, 1, run=(100, 300, 0))
    miss = np.zeros((L, 1), dtype=bool)
    pos = (np.arange(L) + 1) * 10_000
    # min_snp larger than the run: nothing reported
    p = RohParams(window_snp=20, window_threshold=0.05, min_snp=250,
                  min_kb=100, density=50, gap=1000, window_missing=2)
    assert roh_segments_chrom("1", pos, het, miss, p) == []
    # min_kb larger than the 2 Mb span: nothing reported
    p = p._replace(min_snp=50, min_kb=3000)
    assert roh_segments_chrom("1", pos, het, miss, p) == []
    # density stricter than 10 kb/SNP: nothing reported
    p = p._replace(min_kb=100, density=5)
    assert roh_segments_chrom("1", pos, het, miss, p) == []


def test_gap_splits_run():
    L = 400
    het = _het_background(L, 1, run=(50, 350, 0))
    miss = np.zeros((L, 1), dtype=bool)
    pos = (np.arange(L) + 1) * 10_000
    pos[200:] += 2_000_000  # 2 Mb hole between rows 199 and 200
    p = RohParams(window_snp=20, window_het=1, window_missing=2,
                  window_threshold=0.05, min_snp=50, min_kb=100,
                  density=50, gap=1000)
    segs = roh_segments_chrom("1", pos, het, miss, p)
    assert len(segs) == 2
    assert segs[0].hi <= 199 < segs[1].lo


def test_missing_tolerated_and_counted():
    L = 300
    het = _het_background(L, 1, run=(50, 250, 0))
    miss = np.zeros((L, 1), dtype=bool)
    miss[120:123, 0] = True  # 3 missing inside the run
    pos = (np.arange(L) + 1) * 10_000
    p = RohParams(window_snp=20, window_het=1, window_missing=5,
                  window_threshold=0.05, min_snp=50, min_kb=100,
                  density=50, gap=1000)
    segs = roh_segments_chrom("1", pos, het, miss, p)
    assert len(segs) == 1
    assert segs[0].nmiss == 3


def _roh_fileset(tmp_path, codes, chroms, pos):
    nvar, ns = codes.shape
    pvar_rows = [
        f"{chroms[i]}\t{pos[i]}\trs{i}\tA\tG\t.\tPASS\t."
        for i in range(nvar)
    ]
    psam_rows = [f"s{i}\tM" for i in range(ns)]
    return build_fileset(tmp_path, "roh", codes, pvar_rows, psam_rows)


def test_cli_roh(tmp_path):
    L, S = 400, 3
    rng = np.random.default_rng(2)
    codes = np.where(
        _het_background(L, S, run=(100, 300, 1)),
        np.uint8(1),
        rng.integers(0, 2, size=(L, S), dtype=np.uint8) * 2,
    )
    pos = (np.arange(L) + 1) * 10_000
    prefix = _roh_fileset(tmp_path, codes, ["1"] * L, pos)
    out = tmp_path / "r"
    assert run_cli([
        "roh", prefix, "-o", str(out),
        "--window-snp", "20", "--min-snp", "50", "--min-kb", "100",
    ]) == 0
    hom = (tmp_path / "r.hom").read_text().splitlines()
    assert hom[0].startswith("#IID\tCHROM\tSNP1\tSNP2\tPOS1")
    rows = [l.split("\t") for l in hom[1:]]
    assert len(rows) == 1 and rows[0][0] == "s1" and rows[0][1] == "1"
    assert rows[0][2].startswith("rs") and int(rows[0][7]) >= 50
    indiv = (tmp_path / "r.hom.indiv").read_text().splitlines()
    by_iid = {r.split("\t")[0]: r.split("\t") for r in indiv[1:]}
    assert by_iid["s1"][1] == "1" and by_iid["s0"][1] == "0"
    assert len(indiv) == 1 + S


def test_cli_roh_chromosome_isolation(tmp_path):
    # a hom run crossing a chromosome boundary must NOT merge
    L, S = 400, 1
    codes = np.ones((L, S), dtype=np.uint8)  # all het
    codes[100:300, 0] = 0  # hom run rows 100..299 spans the boundary
    chroms = ["1"] * 200 + ["2"] * 200
    pos = np.concatenate(
        [(np.arange(200) + 1) * 10_000, (np.arange(200) + 1) * 10_000]
    )
    prefix = _roh_fileset(tmp_path, codes, chroms, pos)
    out = tmp_path / "x"
    assert run_cli([
        "roh", prefix, "-o", str(out),
        "--window-snp", "20", "--min-snp", "50", "--min-kb", "100",
    ]) == 0
    rows = [l.split("\t") for l in
            (tmp_path / "x.hom").read_text().splitlines()[1:]]
    assert len(rows) == 2
    assert {r[1] for r in rows} == {"1", "2"}
