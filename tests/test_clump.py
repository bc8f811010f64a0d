"""`clump` subcommand: LD-aware clumping of association results
(pipeline/clump.py) against hand-built LD structure."""

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset

from pgen_tpu.pipeline.clump import clump_pfile


def _fixture(tmp_path):
    """6 variants with hand-built LD:
      v0 @1:1000  and v1 @1:2000  IDENTICAL genotypes      -> r2 = 1
      v2 @1:3000  independent noise                        -> r2 ~ 0
      v3 @1:900000  same genotypes as v0 but FAR (>250kb)  -> out of window
      v4 @2:1500  same genotypes as v0 but other CHROM     -> never a member
      v5 @1:2500  anti-correlated with v0 (2 - g)          -> r2 = 1
    """
    rng = np.random.default_rng(4)
    ns = 40
    g0 = rng.integers(0, 3, size=ns, dtype=np.uint8)
    g2 = rng.integers(0, 3, size=ns, dtype=np.uint8)
    codes = np.stack([g0, g0, g2, g0, g0, 2 - g0])
    rows = [
        "1\t1000\tv0\tA\tG\t.\t.\t.",
        "1\t2000\tv1\tA\tG\t.\t.\t.",
        "1\t3000\tv2\tA\tG\t.\t.\t.",
        "1\t900000\tv3\tA\tG\t.\t.\t.",
        "2\t1500\tv4\tA\tG\t.\t.\t.",
        "1\t2500\tv5\tA\tG\t.\t.\t.",
    ]
    prefix = build_fileset(
        tmp_path, "cl", codes, rows, [f"s{i}\tM" for i in range(ns)]
    )
    return prefix


def _assoc(tmp_path, entries):
    p = tmp_path / "assoc.tsv"
    lines = ["#CHROM\tPOS\tID\tREF\tALT\tA1\tTEST\tOBS_CT\tBETA\tSE\tT_STAT\tP"]
    for vid, pval in entries:
        lines.append(f"1\t0\t{vid}\tA\tG\tG\tADD\t40\t1\t1\t1\t{pval}")
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clump_basic_structure(tmp_path):
    prefix = _fixture(tmp_path)
    assoc = _assoc(tmp_path, [
        ("v0", "1e-8"),   # index
        ("v1", "0.002"),  # member (r2=1, in window, P<=p2 -> SP2)
        ("v2", "0.2"),    # in window but r2~0 -> own row? P>p1 -> no clump
        ("v3", "0.03"),   # r2=1 but 899kb away -> not a member
        ("v4", "0.04"),   # r2=1 but CHROM 2 -> not a member
        ("v5", "0.3"),    # member via anti-correlation, P>p2 -> counted, no SP2
    ])
    res = clump_pfile(prefix, assoc, out_file=str(tmp_path / "o.clumps"))
    assert res.num_clumps == 1
    assert res.num_assigned == 3  # v0 + v1 + v5
    text = (tmp_path / "o.clumps").read_text().splitlines()
    assert text[0] == (
        "#CHROM\tPOS\tID\tP\tTOTAL\tNONSIG\tS0.05\tS0.01\tS0.001\tS0.0001\tSP2"
    )
    row = text[1].split("\t")
    assert row[:4] == ["1", "1000", "v0", "1e-08"]
    assert row[4] == "2"  # TOTAL: v1 + v5
    assert row[5] == "1"  # NONSIG: v5 (P=0.3)
    assert row[7] == "1"  # S0.01: v1 (0.001 < 0.002 <= 0.01)
    assert row[10] == "v1"  # SP2 lists only P <= p2 members


def test_clump_assigned_cannot_index(tmp_path):
    """A variant absorbed into a clump can't start its own even if it
    passes p1; an unabsorbed one can."""
    prefix = _fixture(tmp_path)
    assoc = _assoc(tmp_path, [
        ("v0", "1e-8"),
        ("v1", "1e-6"),   # passes p1 but is clumped into v0's
        ("v2", "1e-5"),   # independent: its own (empty) clump
    ])
    res = clump_pfile(prefix, assoc, out_file=str(tmp_path / "o.clumps"))
    assert res.num_clumps == 2
    lines = (tmp_path / "o.clumps").read_text().splitlines()[1:]
    ids = [ln.split("\t")[2] for ln in lines]
    assert ids == ["v0", "v2"]  # index order = P ascending
    v2row = lines[1].split("\t")
    assert v2row[4] == "0" and v2row[10] == "NONE"


def test_clump_kb_and_r2_flags(tmp_path):
    prefix = _fixture(tmp_path)
    assoc = _assoc(tmp_path, [("v0", "1e-8"), ("v3", "0.005")])
    # default 250kb: v3 at 899kb is not reachable
    res = clump_pfile(prefix, assoc, out_file=str(tmp_path / "a.clumps"))
    assert res.num_assigned == 1
    # 1000kb window: v3 joins (identical genotypes)
    res = clump_pfile(
        prefix, assoc, out_file=str(tmp_path / "b.clumps"), kb=1000
    )
    assert res.num_assigned == 2
    # impossible r2 keeps it out again
    res = clump_pfile(
        prefix, assoc, out_file=str(tmp_path / "c.clumps"), kb=1000, r2=1.01
    )
    assert res.num_assigned == 1


def test_clump_unmatched_and_na_rows(tmp_path):
    prefix = _fixture(tmp_path)
    assoc = _assoc(tmp_path, [
        ("v0", "1e-8"), ("nosuch", "1e-9"), ("v1", "NA"),
    ])
    res = clump_pfile(prefix, assoc, out_file=str(tmp_path / "o.clumps"))
    assert res.num_unmatched == 2
    assert res.num_candidates == 1


def test_clump_cli(tmp_path):
    prefix = _fixture(tmp_path)
    assoc = _assoc(tmp_path, [("v0", "1e-8"), ("v1", "0.002")])
    out = str(tmp_path / "c.clumps")
    assert run_cli([
        "clump", prefix, "--clump", assoc, "-o", out,
        "--clump-r2", "0.8", "--clump-kb", "100",
    ]) == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 2 and lines[1].split("\t")[2] == "v0"
    # glm -> clump end-to-end: field names match glm's output by default
    assert run_cli([
        "clump", prefix, "--clump", assoc, "-o", out,
        "--clump-p-field", "NOPE",
    ]) == 1
