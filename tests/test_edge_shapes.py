"""Extreme-shape edges: zero variants, zero samples, very wide records."""

import numpy as np
import pytest

from conftest import build_fileset
from oracle import scalar_filter_vcf
from pgen_tpu.pipeline.filter import filter_to_vcf
from pgen_tpu.pipeline.query import query_metadata


def test_zero_variants(tmp_path):
    codes = np.zeros((0, 4), dtype=np.uint8)
    prefix = build_fileset(tmp_path, "zv", codes, [], ["s0\tM", "s1\tF", "s2\tM", "s3\tF"])
    out = tmp_path / "o.vcf"
    res = filter_to_vcf(prefix, out_file=out)
    assert res.num_variants_kept == 0
    assert out.read_bytes() == scalar_filter_vcf(prefix, None, None)


def test_zero_samples(tmp_path):
    codes = np.zeros((3, 0), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path, "zs", codes, [f"1\t{i}\tr{i}\tA\tC\t.\t.\t." for i in range(3)], []
    )
    out = tmp_path / "o.vcf"
    res = filter_to_vcf(prefix, out_file=out)
    assert res.num_samples_kept == 0
    got = out.read_bytes()
    assert got == scalar_filter_vcf(prefix, None, None)
    body = [l for l in got.split(b"\n") if l and not l.startswith(b"#")]
    assert all(l.endswith(b"\tGT") for l in body)


@pytest.mark.slow
def test_wide_records_100k_samples(tmp_path):
    """100k samples: 25KB records exercise wide-lane emission paths."""
    rng = np.random.default_rng(3)
    nsamp, nvar = 100_000, 5
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "wide",
        codes,
        [f"1\t{100 + i}\tr{i}\tA\tC\t.\t.\t." for i in range(nvar)],
        [f"s{i}\tM" for i in range(nsamp)],
    )
    out = tmp_path / "o.vcf"
    res = filter_to_vcf(prefix, out_file=out, provider="native")
    assert res.num_samples_kept == nsamp
    assert out.read_bytes() == scalar_filter_vcf(prefix, None, None)
    # subset through the masked path at this width too
    out2 = tmp_path / "o2.vcf"
    filter_to_vcf(
        prefix,
        sam_query='IID == "s0" || IID == "s99999"',
        out_file=out2,
        provider="native",
    )
    assert out2.read_bytes() == scalar_filter_vcf(
        prefix, None, lambda s: s["IID"] in ("s0", "s99999")
    )


def test_single_cell(tmp_path):
    codes = np.array([[3]], dtype=np.uint8)
    prefix = build_fileset(tmp_path, "one", codes, ["1\t5\tr0\tA\tC\t.\t.\t."], ["s0\tM"])
    out = tmp_path / "o.vcf"
    filter_to_vcf(prefix, out_file=out)
    assert out.read_bytes().endswith(b"r0\tA\tC\t.\t.\t.\tGT\t./.\n")
    import io

    buf = io.StringIO()
    assert query_metadata(prefix, "ID", out=buf) == 1
