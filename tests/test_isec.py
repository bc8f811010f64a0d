"""`isec` subcommand: variant set operations (pipeline/isec.py)."""

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset
from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.ops.unpack import unpack_codes_numpy
from pgen_tpu.pipeline.isec import isec_pgen


def _fileset(tmp_path, name, rows, codes, n_sam):
    return build_fileset(
        tmp_path, name, codes, rows, [f"{name}_s{i}\tM" for i in range(n_sam)]
    )


def _codes_of(prefix):
    h = read_pgen_header(f"{prefix}.pgen")
    raw = np.fromfile(f"{prefix}.pgen", dtype=np.uint8)[12:]
    packed = raw.reshape(h.num_variants, h.record_size)
    return unpack_codes_numpy(packed, h.num_samples)


@pytest.fixture()
def two_filesets(tmp_path):
    rng = np.random.default_rng(1)
    # A: 5 variants; B: 4 variants; overlap = {1:101:C:T, 2:200:G:A}
    rows_a = [
        "1\t100\ta0\tA\tG\t.\t.\t.",
        "1\t101\ta1\tC\tT\t.\t.\t.",
        "2\t200\ta2\tG\tA\t.\t.\t.",
        "2\t201\ta3\tT\tC\t.\t.\t.",
        "3\t300\ta4\tA\tC\t.\t.\t.",
    ]
    rows_b = [
        "1\t101\tb0\tC\tT\t.\t.\t.",
        "2\t200\tb1\tG\tA\t.\t.\t.",
        "2\t201\tb2\tT\tG\t.\t.\t.",  # same pos as a3, different ALT
        "9\t900\tb3\tA\tG\t.\t.\t.",
    ]
    codes_a = rng.integers(0, 4, size=(5, 3), dtype=np.uint8)
    codes_b = rng.integers(0, 4, size=(4, 6), dtype=np.uint8)
    pa = _fileset(tmp_path, "A", rows_a, codes_a, 3)
    pb = _fileset(tmp_path, "B", rows_b, codes_b, 6)
    return pa, pb, codes_a, codes_b


def test_isec_full_key(two_filesets, tmp_path):
    pa, pb, codes_a, codes_b = two_filesets
    res = isec_pgen(pa, pb, str(tmp_path / "out"))
    assert res.counts == {"a_only": 3, "b_only": 2, "both_a": 2, "both_b": 2}
    both_a = read_metadata(f"{res.out_prefixes['both_a']}.pvar")
    assert both_a.get_column_strs("ID") == ["a1", "a2"]
    both_b = read_metadata(f"{res.out_prefixes['both_b']}.pvar")
    assert both_b.get_column_strs("ID") == ["b0", "b1"]
    a_only = read_metadata(f"{res.out_prefixes['a_only']}.pvar")
    assert a_only.get_column_strs("ID") == ["a0", "a3", "a4"]
    b_only = read_metadata(f"{res.out_prefixes['b_only']}.pvar")
    assert b_only.get_column_strs("ID") == ["b2", "b3"]
    # genotypes gathered from the right side, byte-exact
    np.testing.assert_array_equal(
        _codes_of(res.out_prefixes["both_a"]), codes_a[[1, 2]]
    )
    np.testing.assert_array_equal(
        _codes_of(res.out_prefixes["both_b"]), codes_b[[0, 1]]
    )
    np.testing.assert_array_equal(
        _codes_of(res.out_prefixes["a_only"]), codes_a[[0, 3, 4]]
    )
    # psam passes through from the matching side
    psam_b = read_metadata(f"{res.out_prefixes['b_only']}.psam")
    assert psam_b.get_column_strs("IID")[0] == "B_s0"


def test_isec_pos_key(two_filesets, tmp_path):
    pa, pb, _, _ = two_filesets
    res = isec_pgen(pa, pb, str(tmp_path / "pk"), key="pos")
    # a3/b2 now match (2:201), so overlap grows to 3
    assert res.counts == {"a_only": 2, "b_only": 1, "both_a": 3, "both_b": 3}


def test_isec_write_selection_and_cli(two_filesets, tmp_path):
    pa, pb, _, _ = two_filesets
    out = str(tmp_path / "sel")
    assert run_cli([
        "isec", pa, pb, "-o", out, "--write", "both_a",
    ]) == 0
    assert (tmp_path / "sel.both_a.pgen").exists()
    assert not (tmp_path / "sel.a_only.pgen").exists()
    # concat-compatible round trip: both_a + a_only reorders to A
    res = isec_pgen(pa, pb, str(tmp_path / "rt"))
    n = sum(res.counts[k] for k in ("a_only", "both_a"))
    assert n == read_pgen_header(f"{pa}.pgen").num_variants


def test_isec_errors(two_filesets, tmp_path):
    pa, pb, _, _ = two_filesets
    with pytest.raises(ValueError, match="--write"):
        isec_pgen(pa, pb, str(tmp_path / "e"), write="nope")
    with pytest.raises(ValueError, match="--key"):
        isec_pgen(pa, pb, str(tmp_path / "e"), key="fuzzy")


# -- multi-file -n/--nfiles mode (bcftools isec -n semantics) ----------------


@pytest.fixture()
def three_filesets(tmp_path):
    """Keys: k1 in A only, k2 in A+B, k3 in A+B+C, k4 in B+C, k5 in C."""
    rng = np.random.default_rng(2)
    rows = {
        "k1": "1\t100\tv1\tA\tG\t.\t.\t.",
        "k2": "1\t200\tv2\tC\tT\t.\t.\t.",
        "k3": "2\t300\tv3\tG\tA\t.\t.\t.",
        "k4": "2\t400\tv4\tT\tC\t.\t.\t.",
        "k5": "3\t500\tv5\tA\tC\t.\t.\t.",
    }
    members = {"A": ["k1", "k2", "k3"], "B": ["k2", "k3", "k4"],
               "C": ["k3", "k4", "k5"]}
    prefixes, codes = [], {}
    for name, ks in members.items():
        c = rng.integers(0, 4, size=(len(ks), 4), dtype=np.uint8)
        codes[name] = c
        prefixes.append(
            _fileset(tmp_path, name, [rows[k] for k in ks], c, 4)
        )
    return prefixes, codes


def test_isec_nfiles_exact(three_filesets, tmp_path):
    """-n=2: keys present in exactly two inputs (k2, k4)."""
    from pgen_tpu.pipeline.isec import isec_pgen_multi

    prefixes, codes = three_filesets
    res = isec_pgen_multi(prefixes, str(tmp_path / "o"), nfiles="=2")
    assert res.counts["0000"] == 1  # A: k2
    assert res.counts["0001"] == 2  # B: k2, k4
    assert res.counts["0002"] == 1  # C: k4
    ids_b = read_metadata(f"{res.out_prefixes['0001']}.pvar").get_column_strs("ID")
    assert ids_b == ["v2", "v4"]
    # genotypes gathered, never re-coded
    got = _codes_of(res.out_prefixes["0001"])
    np.testing.assert_array_equal(got, codes["B"][[0, 2]])
    sites = (tmp_path / "o.sites.txt").read_text().splitlines()
    assert sorted(sites) == sorted(
        ["1\t200\tC\tT\t110", "2\t400\tT\tC\t011"]
    )


def test_isec_nfiles_plus_minus_bitmap(three_filesets, tmp_path):
    from pgen_tpu.pipeline.isec import isec_pgen_multi

    prefixes, _ = three_filesets
    # +3: present in all three -> only k3
    res = isec_pgen_multi(prefixes, str(tmp_path / "p"), nfiles="+3")
    assert [res.counts[f"{i:04d}"] for i in range(3)] == [1, 1, 1]
    sites = (tmp_path / "p.sites.txt").read_text().splitlines()
    assert sites == ["2\t300\tG\tA\t111"]
    # -1: private keys only -> k1 (A), k5 (C)
    res = isec_pgen_multi(prefixes, str(tmp_path / "m"), nfiles="-1")
    assert [res.counts[f"{i:04d}"] for i in range(3)] == [1, 0, 1]
    # ~110: exactly A and B, not C -> k2
    res = isec_pgen_multi(prefixes, str(tmp_path / "b"), nfiles="~110")
    assert [res.counts[f"{i:04d}"] for i in range(3)] == [1, 1, 0]
    sites = (tmp_path / "b.sites.txt").read_text().splitlines()
    assert sites == ["1\t200\tC\tT\t110"]


def test_isec_nfiles_cli(three_filesets, tmp_path):
    prefixes, _ = three_filesets
    out = str(tmp_path / "c")
    assert run_cli(["isec", *prefixes, "-o", out, "-n", "=2"]) == 0
    assert (tmp_path / "c.sites.txt").exists()
    assert (tmp_path / "c.0002.pgen").exists()
    # two-file mode still demands exactly two prefixes without -n
    assert run_cli(["isec", *prefixes, "-o", out]) == 1
    # bad specs error
    assert run_cli(["isec", *prefixes, "-o", out, "-n", "~10"]) == 1
    assert run_cli(["isec", *prefixes, "-o", out, "-n", "x"]) == 1
