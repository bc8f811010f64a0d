"""Exclude-expression flags: -e/--exclude (query), --exclude-var/
--exclude-sam (filter, stats).

bcftools' -e vs -i semantics: exclude keeps the complement. The spec
desugars to `!(EXPR)` AND-ed with any include (query/exclude.py), so
these tests pin (a) the desugar, (b) CLI equivalence with the manual
negated include on every subcommand, and (c) the conjunction with
include/regions/samples flags.
"""

import io
from contextlib import redirect_stdout

from cli_helpers import run_cli

from pgen_tpu.query.exclude import apply_exclude


def test_apply_exclude_desugar():
    assert apply_exclude(None, None) is None
    assert apply_exclude('ALT=="G"', None) == 'ALT=="G"'
    assert apply_exclude(None, 'ALT=="G"') == '!(ALT=="G")'
    assert apply_exclude('FILTER=="PASS"', 'ALT=="G"') == (
        '!(ALT=="G") && (FILTER=="PASS")'
    )


def _query_out(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_cli(argv)
    assert rc == 0
    return buf.getvalue().splitlines()


def test_cli_query_exclude_is_complement(basic1_prefix):
    all_rows = _query_out(["query", basic1_prefix, "-f", "ID"])
    kept = _query_out(["query", basic1_prefix, "-f", "ID", "-i", 'ALT=="G"'])
    dropped = _query_out(["query", basic1_prefix, "-f", "ID", "-e", 'ALT=="G"'])
    assert len(kept) + len(dropped) == len(all_rows)
    assert set(kept).isdisjoint(dropped)
    # order-stable complement: concatenating preserves no row, merging does
    assert sorted(kept + dropped) == sorted(all_rows)


def test_cli_query_exclude_combines_with_include(basic1_prefix):
    combined = _query_out(
        ["query", basic1_prefix, "-f", "POS", "-i", 'ALT=="G"', "-e", 'REF=="A"']
    )
    manual = _query_out(
        ["query", basic1_prefix, "-f", "POS", "-i", '!(REF=="A") && (ALT=="G")']
    )
    assert combined == manual
    assert len(combined) > 0


def test_cli_query_exclude_samples_axis(basic1_prefix):
    ex = _query_out(["query", basic1_prefix, "-f", "IID", "-s", "-e", 'SEX=="1"'])
    manual = _query_out(
        ["query", basic1_prefix, "-f", "IID", "-s", "-i", '!(SEX=="1")']
    )
    assert ex == manual


def test_cli_filter_exclude_var_and_sam(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    a, b = tmp_path / "a.vcf", tmp_path / "b.vcf"
    argv_ex = [
        "filter", prefix,
        "--exclude-var", 'POS=="102"',
        "--exclude-sam", 'IID=="s3"',
        "-o", str(a),
    ]
    argv_in = [
        "filter", prefix,
        "--include-var", '!(POS=="102")',
        "--include-sam", '!(IID=="s3")',
        "-o", str(b),
    ]
    assert run_cli(argv_ex) == 0
    assert run_cli(argv_in) == 0
    assert a.read_bytes() == b.read_bytes()
    body = [
        ln for ln in a.read_bytes().split(b"\n") if ln and not ln.startswith(b"#")
    ]
    assert [r.split(b"\t")[1] for r in body] == [b"100", b"101", b"103", b"104"]
    header = [
        ln for ln in a.read_bytes().split(b"\n") if ln.startswith(b"#CHROM")
    ][0]
    assert b"s3" not in header


def test_cli_filter_exclude_with_regions(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    out = tmp_path / "r.vcf"
    rc = run_cli(
        ["filter", prefix, "-r", "1:101-103", "--exclude-var", 'POS=="102"',
         "-o", str(out)]
    )
    assert rc == 0
    body = [
        ln for ln in out.read_bytes().split(b"\n") if ln and not ln.startswith(b"#")
    ]
    assert [r.split(b"\t")[1] for r in body] == [b"101", b"103"]


def test_cli_filter_exclude_var_accepts_gt_stats(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    a, b = tmp_path / "g.vcf", tmp_path / "h.vcf"
    assert run_cli(
        ["filter", prefix, "--exclude-var", "GT_MISSING > 0", "-o", str(a)]
    ) == 0
    assert run_cli(
        ["filter", prefix, "--include-var", "!(GT_MISSING > 0)", "-o", str(b)]
    ) == 0
    assert a.read_bytes() == b.read_bytes()


def test_cli_stats_exclude(tiny_fileset, capsys):
    prefix, codes = tiny_fileset
    assert run_cli(["stats", prefix, "--exclude-var", 'POS=="102"']) == 0
    ex = capsys.readouterr().out
    assert run_cli(["stats", prefix, "--include-var", '!(POS=="102")']) == 0
    manual = capsys.readouterr().out
    assert ex == manual


def test_cli_exclude_non_boolean_errors(basic1_prefix, capsys):
    rc = run_cli(["query", basic1_prefix, "-f", "ID", "-e", "POS"])
    assert rc == 1
    assert "error" in capsys.readouterr().err
