"""-R/--regions-file: region lists from BED / tab-delimited files
(query/regions.py regions_file_to_expr).

Like -r, a file desugars to include-expressions so every pipeline
inherits it; exact position lists group into ONE vectorized
in_list(num(POS), ...) membership sweep per contig. These tests pin the
desugaring (incl. BED 0-based half-open coordinates), the CLI wiring on
query/filter/stats, and equality with the equivalent -r / -i runs.
"""

import gzip
import io
from contextlib import redirect_stdout

import pytest

from cli_helpers import run_cli

from pgen_tpu.query.regions import (
    RegionSpecError,
    apply_regions,
    regions_file_to_expr,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_positions_group_into_in_list(tmp_path):
    f = _write(tmp_path, "pos.txt", "19\t100\n19\t200\nX\t5\n19\t100\n")
    expr = regions_file_to_expr(f)
    assert expr == (
        '(CHROM == "19" && in_list(num(POS), "100,200"))'
        ' || (CHROM == "X" && num(POS) == 5)'
    )


def test_three_column_tab_is_inclusive_span(tmp_path):
    f = _write(tmp_path, "spans.txt", "19\t100\t200\n19\t300\t300\n")
    expr = regions_file_to_expr(f)
    assert '(CHROM == "19" && num(POS) >= 100 && num(POS) <= 200)' in expr
    assert 'num(POS) == 300' in expr  # beg == end collapses to exact


def test_bed_is_zero_based_half_open(tmp_path):
    f = _write(
        tmp_path,
        "r.bed",
        "track name=x\n# comment\n19\t99\t200\n19\t299\t300\n19\t50\t50\n",
    )
    expr = regions_file_to_expr(f)
    assert '(CHROM == "19" && num(POS) >= 100 && num(POS) <= 200)' in expr
    assert 'num(POS) == 300' in expr  # [299, 300) = 1-based position 300
    assert "50" not in expr  # empty BED interval matches nothing


def test_single_column_and_spec_tokens(tmp_path):
    f = _write(tmp_path, "mix.txt", "20\n21\n19:100-200\n")
    expr = regions_file_to_expr(f)
    assert expr.startswith('in_list(CHROM, "20,21")')
    assert "num(POS) >= 100" in expr


def test_gz_region_file(tmp_path):
    p = tmp_path / "pos.txt.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("19\t100\n")
    assert regions_file_to_expr(str(p)) == '(CHROM == "19" && num(POS) == 100)'


@pytest.mark.parametrize(
    "text",
    ["", "#only\n\n", "19\tx\n", "19\t200\t100\n", '1"9\t1\t2\n'],
)
def test_bad_files_raise(tmp_path, text):
    f = _write(tmp_path, "bad.txt", text)
    with pytest.raises(RegionSpecError):
        regions_file_to_expr(f)


def test_bed_rejects_single_column(tmp_path):
    f = _write(tmp_path, "bad.bed", "19\n")
    with pytest.raises(RegionSpecError):
        regions_file_to_expr(f)


def test_apply_regions_rejects_both():
    with pytest.raises(RegionSpecError):
        apply_regions(None, "19", "somefile")


def _query_out(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_cli(argv)
    assert rc == 0
    return buf.getvalue().splitlines()


def test_cli_query_regions_file_equals_inline(basic1_prefix, tmp_path):
    f = _write(tmp_path, "r.txt", "19\t300000\t400000\n")
    via_file = _query_out(["query", basic1_prefix, "-f", "POS", "-R", f])
    via_r = _query_out(
        ["query", basic1_prefix, "-f", "POS", "-r", "19:300000-400000"]
    )
    assert via_file == via_r
    assert len(via_file) > 0


def test_cli_query_positions_file(basic1_prefix, tmp_path):
    pairs = [
        ln.split()
        for ln in _query_out(
            ["query", basic1_prefix, "-f", 'CHROM + " " + POS']
        )[:5]
    ]
    f = _write(
        tmp_path, "pos.txt", "".join(f"{c}\t{p}\n" for c, p in pairs[:3])
    )
    got = _query_out(["query", basic1_prefix, "-f", "POS", "-R", f])
    assert got == [p for _, p in pairs[:3]]


def test_cli_filter_regions_file(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    f = _write(tmp_path, "pos.txt", "1\t101\n1\t103\n")
    out = tmp_path / "rf.vcf"
    assert run_cli(["filter", prefix, "-R", f, "-o", str(out)]) == 0
    body = [
        ln
        for ln in out.read_bytes().split(b"\n")
        if ln and not ln.startswith(b"#")
    ]
    assert [r.split(b"\t")[1] for r in body] == [b"101", b"103"]


def test_cli_stats_regions_file_equals_regions(tiny_fileset, tmp_path, capsys):
    prefix, codes = tiny_fileset
    f = _write(tmp_path, "r.txt", "1\t101\t103\n")
    assert run_cli(["stats", prefix, "-R", f]) == 0
    via_file = capsys.readouterr().out
    assert run_cli(["stats", prefix, "-r", "1:101-103"]) == 0
    via_r = capsys.readouterr().out
    assert via_file == via_r


def test_cli_both_r_and_big_r_error(tiny_fileset, tmp_path, capsys):
    prefix, codes = tiny_fileset
    f = _write(tmp_path, "r.txt", "1\t101\n")
    rc = run_cli(["filter", prefix, "-r", "1", "-R", f, "-o", str(tmp_path / "x.vcf")])
    assert rc == 1
    assert "not both" in capsys.readouterr().err
