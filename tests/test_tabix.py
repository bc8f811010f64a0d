"""Tabix index emission + reader-side validation (VERDICT round-1 item 6).

No tabix binary exists in the environment, so validation is reader-side:
`fetch_region` uses only the index structure (bins, chunks, linear index,
virtual offsets) to pull records, and its results must equal a brute-force
decompress-and-scan for randomized regions.
"""

import gzip

import numpy as np
import pytest

from pgen_tpu.formats.tabix import (
    bgzf_member_table,
    fetch_region,
    read_tbi,
    reg2bin,
    reg2bins,
    virtual_offsets,
)
from pgen_tpu.pipeline.filter import filter_to_vcf


def test_reg2bin_spec_values():
    # spec: level offsets 0, 1..8, 9..72, 73..584, 585..4680, 4681..37448
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(1 << 14, (1 << 14) + 5) == 4682
    assert reg2bin(0, 1 << 29) == 0


def test_reg2bin_in_reg2bins():
    rng = np.random.default_rng(0)
    for _ in range(300):
        beg = int(rng.integers(0, 1 << 28))
        end = beg + int(rng.integers(1, 1 << 18))
        q0 = int(rng.integers(max(0, beg - 100), end + 100))
        q1 = q0 + int(rng.integers(1, 1 << 16))
        if q0 < end and beg < q1:  # overlapping query must include the bin
            assert reg2bin(beg, end) in reg2bins(q0, q1)


@pytest.fixture(scope="module")
def indexed_vcf(tmp_path_factory):
    from conftest import build_fileset

    td = tmp_path_factory.mktemp("tbx")
    rng = np.random.default_rng(21)
    nvar, nsamp = 900, 40  # several BGZF blocks of output
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    # two chromosomes, non-trivial REF lengths, positions spread over 2^21
    pvar_rows = []
    pos = np.sort(rng.integers(1, 2_000_000, nvar // 2))
    for i in range(nvar // 2):
        ref = "ACGT"[: 1 + i % 4]
        pvar_rows.append(f"21\t{pos[i]}\tv{i}\t{ref}\tG\t.\t.\t.")
    pos2 = np.sort(rng.integers(1, 500_000, nvar - nvar // 2))
    for i in range(nvar - nvar // 2):
        pvar_rows.append(f"22\t{pos2[i]}\tw{i}\tA\tC\t.\t.\t.")
    prefix = build_fileset(
        td, "t", codes, pvar_rows, [f"s{i}\tM" for i in range(nsamp)]
    )
    gz = td / "t.vcf.gz"
    filter_to_vcf(prefix, out_file=gz, index=True)
    return gz


def test_member_table_roundtrip(indexed_vcf):
    c_offs, u_offs = bgzf_member_table(indexed_vcf)
    raw = gzip.decompress(indexed_vcf.read_bytes())
    assert u_offs[-1] == len(raw)
    assert c_offs[-1] == indexed_vcf.stat().st_size
    # virtual offset of position 0 is (0, 0)
    assert virtual_offsets(np.array([0]), c_offs, u_offs)[0] == 0


def test_tbi_structure(indexed_vcf):
    tbi = str(indexed_vcf) + ".tbi"
    names, refs = read_tbi(tbi)
    assert names == ["21", "22"]
    for name in names:
        bins, lidx = refs[name]
        assert bins and lidx
        for b, chunks in bins.items():
            for cb, ce in chunks:
                assert cb < ce


def _brute_force(gz, ref, beg, end):
    out = []
    for line in gzip.decompress(gz.read_bytes()).split(b"\n"):
        if not line or line.startswith(b"#"):
            continue
        cols = line.split(b"\t", 4)
        if cols[0].decode() != ref:
            continue
        p0 = int(cols[1]) - 1
        if p0 < end and p0 + max(len(cols[3]), 1) > beg:
            out.append(line)
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fetch_matches_brute_force(indexed_vcf, seed):
    tbi = str(indexed_vcf) + ".tbi"
    rng = np.random.default_rng(seed)
    for ref, span in (("21", 2_000_000), ("22", 500_000)):
        for _ in range(12):
            beg = int(rng.integers(0, span))
            end = beg + int(rng.integers(1, span // 3))
            got = fetch_region(str(indexed_vcf), tbi, ref, beg, end)
            want = _brute_force(indexed_vcf, ref, beg, end)
            assert got == want, (ref, beg, end)


def test_fetch_whole_and_empty(indexed_vcf):
    tbi = str(indexed_vcf) + ".tbi"
    all21 = fetch_region(str(indexed_vcf), tbi, "21", 0, 1 << 29)
    assert len(all21) == 450
    assert fetch_region(str(indexed_vcf), tbi, "19", 0, 1 << 29) == []
    assert fetch_region(str(indexed_vcf), tbi, "21", 3_000_000, 4_000_000) == []


def test_cli_index_flag(tmp_path):
    from conftest import build_fileset
    from cli_helpers import run_cli

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(30, 7), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "c",
        codes,
        [f"1\t{100 + i}\tr{i}\tA\tC\t.\t.\t." for i in range(30)],
        [f"s{i}\tF" for i in range(7)],
    )
    out = tmp_path / "c.vcf.gz"
    assert run_cli(["filter", prefix, "-o", str(out), "--index"]) == 0
    assert (tmp_path / "c.vcf.gz.tbi").exists()
    names, _ = read_tbi(str(out) + ".tbi")
    assert names == ["1"]
    # --index without .gz is a clean error
    assert run_cli(["filter", prefix, "-o", str(tmp_path / "p.vcf"), "--index"]) == 1


def test_index_requires_gz(tmp_path):
    from conftest import build_fileset

    codes = np.zeros((2, 3), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "e",
        codes,
        ["1\t5\ta\tA\tC\t.\t.\t.", "1\t9\tb\tA\tC\t.\t.\t."],
        ["s0\tM", "s1\tM", "s2\tM"],
    )
    with pytest.raises(ValueError, match="gz"):
        filter_to_vcf(prefix, out_file=tmp_path / "e.vcf", index=True)
