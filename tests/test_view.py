"""`view`: indexed region reads of an existing .vcf.gz (pipeline/view.py).

Pins: whole-file view reproduces the decompressed bytes, region view
equals the brute-force scan (and the filter-side -r selection), header
handling, ':'-contig resolution against the index, and the missing-index
error."""

import gzip
import io

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset

from pgen_tpu.pipeline.filter import filter_to_vcf
from pgen_tpu.pipeline.view import VcfViewError, parse_region_coords, view_vcf_gz


@pytest.fixture()
def gz(tmp_path):
    rng = np.random.default_rng(5)
    n = 400
    codes = rng.integers(0, 4, size=(n, 5), dtype=np.uint8)
    chroms = ["1"] * 150 + ["2"] * 150 + ["HLA-A*01:01"] * 100
    pvar_rows = [
        f"{chroms[i]}\t{50 + 11 * i}\trs{i}\tAC\tG\t.\tPASS\t." for i in range(n)
    ]
    prefix = build_fileset(
        tmp_path, "v", codes, pvar_rows, [f"s{i}\tF" for i in range(5)]
    )
    out = tmp_path / "v.vcf.gz"
    filter_to_vcf(prefix, out_file=out, index=True)
    return out


def _raw(gz_path) -> bytes:
    return gzip.decompress(open(gz_path, "rb").read())


def test_whole_file_view(gz):
    buf = io.BytesIO()
    rows = view_vcf_gz(str(gz), out=buf)
    assert buf.getvalue() == _raw(gz)
    assert rows == 400


def test_whole_file_no_header(gz):
    buf = io.BytesIO()
    view_vcf_gz(str(gz), header=False, out=buf)
    want = b"".join(
        ln + b"\n" for ln in _raw(gz).split(b"\n") if ln and not ln.startswith(b"#")
    )
    assert buf.getvalue() == want


def test_region_view_matches_bruteforce(gz):
    buf = io.BytesIO()
    rows = view_vcf_gz(str(gz), regions="1:100-500", header=False, out=buf)
    want = [
        ln
        for ln in _raw(gz).split(b"\n")
        if ln and not ln.startswith(b"#")
        and ln.split(b"\t")[0] == b"1"
        and 100 <= int(ln.split(b"\t")[1]) + 1 <= 501  # overlap incl. REF len 2
    ]
    got = [ln for ln in buf.getvalue().split(b"\n") if ln]
    assert rows == len(got)
    # every returned row overlaps the span; exact set equals brute force
    brute = [
        ln
        for ln in _raw(gz).split(b"\n")
        if ln and not ln.startswith(b"#") and ln.split(b"\t")[0] == b"1"
        and int(ln.split(b"\t")[1]) - 1 < 500
        and int(ln.split(b"\t")[1]) - 1 + 2 > 99
    ]
    assert got == brute


def test_region_view_header_included(gz):
    buf = io.BytesIO()
    view_vcf_gz(str(gz), regions="2", out=buf)
    data = buf.getvalue().split(b"\n")
    assert data[0].startswith(b"##")
    body = [ln for ln in data if ln and not ln.startswith(b"#")]
    assert len(body) == 150
    assert all(ln.split(b"\t")[0] == b"2" for ln in body)


def test_colon_contig_resolves_via_index(gz):
    buf = io.BytesIO()
    rows = view_vcf_gz(str(gz), regions="HLA-A*01:01", header=False, out=buf)
    assert rows == 100


def test_parse_region_coords():
    assert parse_region_coords("1:5-10") == [("1", 4, 10)]
    assert parse_region_coords("1:7") == [("1", 6, 7)]
    assert parse_region_coords("1:7-")[0][:2] == ("1", 6)
    assert parse_region_coords("a:1", known_contigs=["a:1"]) == [
        ("a:1", 0, 1 << 60)
    ]


def test_missing_index_errors(gz, tmp_path):
    import os

    os.unlink(str(gz) + ".tbi")
    with pytest.raises(VcfViewError, match="index"):
        view_vcf_gz(str(gz), regions="1", out=io.BytesIO())


def test_cli_view(gz, capsysbinary):
    rc = run_cli(["view", str(gz), "-r", "2:50-5000", "-H"])
    assert rc == 0
    out = capsysbinary.readouterr().out
    assert out and all(
        ln.split(b"\t")[0] == b"2" for ln in out.split(b"\n") if ln
    )
