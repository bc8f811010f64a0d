"""--regions: bcftools-style region restriction (query/regions.py).

Desugars to include-expressions, so every pipeline inherits it; these
tests pin the desugaring, the CLI wiring, and equality with the
hand-written expression."""

import io
from contextlib import redirect_stdout

import pytest

from tests.cli_helpers import run_cli

from pgen_tpu.query.regions import RegionSpecError, apply_regions, regions_to_expr


def test_desugar_forms():
    # ':'-bearing tokens also match the whole token as an exact contig
    # name (GRCh38 alt contigs contain ':'; a context-free desugar cannot
    # consult the header's contig list the way bcftools does)
    assert regions_to_expr("19") == 'CHROM == "19"'
    assert (
        regions_to_expr("19:500")
        == '(CHROM == "19:500" || (CHROM == "19" && num(POS) == 500))'
    )
    assert (
        regions_to_expr("19:100-200")
        == '(CHROM == "19:100-200" || (CHROM == "19" && num(POS) >= 100 && num(POS) <= 200))'
    )
    assert (
        regions_to_expr("19:100-")
        == '(CHROM == "19:100-" || (CHROM == "19" && num(POS) >= 100))'
    )
    assert regions_to_expr("19:100-200,X").endswith(' || CHROM == "X"')


def test_apply_regions_combines_with_include():
    assert apply_regions(None, None) is None
    assert apply_regions('ALT=="G"', None) == 'ALT=="G"'
    assert apply_regions(None, "19") == 'CHROM == "19"'
    assert apply_regions('ALT=="G"', "19") == '(CHROM == "19") && (ALT=="G")'


@pytest.mark.parametrize(
    "bad", ["", " , ", "19:x-200", "19:200-100", '1"9:1-2', "19:1-2-3"]
)
def test_bad_specs_raise(bad):
    with pytest.raises(RegionSpecError):
        regions_to_expr(bad)


def _query_out(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_cli(argv)
    assert rc == 0
    return buf.getvalue().splitlines()


def test_cli_query_regions_equals_expression(basic1_prefix):
    via_r = _query_out(["query", basic1_prefix, "-f", "POS", "-r", "19:300000-400000"])
    via_i = _query_out(
        [
            "query",
            basic1_prefix,
            "-f",
            "POS",
            "-i",
            'CHROM=="19" && num(POS) >= 300000 && num(POS) <= 400000',
        ]
    )
    assert via_r == via_i
    assert len(via_r) > 0
    assert all(300000 <= int(p) <= 400000 for p in via_r)


def test_cli_query_regions_and_include_combine(basic1_prefix):
    combined = _query_out(
        ["query", basic1_prefix, "-f", "POS", "-r", "19:300000-400000", "-i", 'ALT=="G"']
    )
    manual = _query_out(
        [
            "query",
            basic1_prefix,
            "-f",
            "POS",
            "-i",
            '(CHROM=="19" && num(POS) >= 300000 && num(POS) <= 400000) && ALT=="G"',
        ]
    )
    assert combined == manual
    assert 0 < len(combined) < 36


def test_cli_regions_with_samples_flag_errors(basic1_prefix, capsys):
    rc = run_cli(["query", basic1_prefix, "-f", "IID", "-s", "-r", "19"])
    assert rc == 1
    assert "--regions" in capsys.readouterr().err


def test_cli_filter_regions(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    out = tmp_path / "r.vcf"
    rc = run_cli(
        ["filter", prefix, "-r", "1:101-103", "-o", str(out)]
    )
    assert rc == 0
    body = [
        line for line in out.read_bytes().split(b"\n") if line and not line.startswith(b"#")
    ]
    assert [r.split(b"\t")[1] for r in body] == [b"101", b"102", b"103"]


def test_cli_filter_regions_whole_contig_keeps_all(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    a, b = tmp_path / "a.vcf", tmp_path / "b.vcf"
    assert run_cli(["filter", prefix, "-r", "1", "-o", str(a)]) == 0
    assert run_cli(["filter", prefix, "-o", str(b)]) == 0
    assert a.read_bytes() == b.read_bytes()


def test_colon_bearing_contig_whole_match(tmp_path):
    """A contig whose NAME contains ':' is reachable as a whole-token
    region (the exact-contig alternative in the desugar)."""
    from tests.cli_helpers import run_cli
    from tests.conftest import build_fileset
    import numpy as np

    prefix = build_fileset(
        tmp_path,
        "alt",
        np.zeros((2, 2), dtype=np.uint8),
        ["HLA-DRB1*15:01:01\t100\ta\tA\tG\t.\t.\t.", "19\t200\tb\tA\tG\t.\t.\t."],
        ["s0\tM", "s1\tF"],
    )
    out = tmp_path / "r.vcf"
    assert run_cli(["filter", prefix, "-r", "HLA-DRB1*15:01:01", "-o", str(out)]) == 0
    body = [r for r in out.read_text().splitlines() if not r.startswith("#")]
    assert len(body) == 1 and body[0].startswith("HLA-DRB1*15:01:01\t")
