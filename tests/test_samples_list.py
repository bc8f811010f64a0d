"""--samples / --samples-file: bcftools-style sample lists (query/samples.py)."""

import pytest

from tests.cli_helpers import run_cli

from pgen_tpu.query.samples import (
    SampleListError,
    apply_samples,
    samples_file_to_expr,
    samples_to_expr,
)


def test_desugar_basic():
    assert samples_to_expr("a,b") == 'str::regex_matches(IID, "^(?:a|b)$")'
    assert samples_to_expr("^a,b") == '!(str::regex_matches(IID, "^(?:a|b)$"))'


def test_desugar_escapes_regex_specials():
    # a dot in a sample name must not act as a wildcard
    expr = samples_to_expr("s.1")
    from pgen_tpu.query.interp import eval_boolean
    from pgen_tpu.query.parser import parse

    node = parse(expr)
    assert eval_boolean(node, {"IID": "s.1"}) is True
    assert eval_boolean(node, {"IID": "sx1"}) is False


def test_apply_combines_with_include_sam():
    assert apply_samples(None, None, None) is None
    assert apply_samples('SEX=="F"', None, None) == 'SEX=="F"'
    got = apply_samples('SEX=="F"', "a", None)
    assert got == '(str::regex_matches(IID, "^(?:a)$")) && (SEX=="F")'
    with pytest.raises(SampleListError):
        apply_samples(None, "a", "f.txt")
    with pytest.raises(SampleListError):
        samples_to_expr("")
    with pytest.raises(SampleListError):
        samples_to_expr('bad"name')


def test_samples_file(tmp_path):
    f = tmp_path / "s.txt"
    f.write_text("# cohort\n\ns1\ns3\n")
    assert samples_file_to_expr(str(f)) == 'str::regex_matches(IID, "^(?:s1|s3)$")'
    f.write_text("^s1\ns3\n")
    assert samples_file_to_expr(str(f)).startswith("!(")
    f.write_text("# only comments\n")
    with pytest.raises(SampleListError):
        samples_file_to_expr(str(f))


def test_cli_filter_samples(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    out = tmp_path / "s.vcf"
    assert run_cli(["filter", prefix, "--samples", "s1,s4", "-o", str(out)]) == 0
    header = next(
        line for line in out.read_text().splitlines() if line.startswith("#CHROM")
    )
    assert header.split("\t")[9:] == ["s1", "s4"]  # .psam order preserved
    # exclusion
    out2 = tmp_path / "x.vcf"
    assert run_cli(["filter", prefix, "--samples", "^s1,s4", "-o", str(out2)]) == 0
    header2 = next(
        line for line in out2.read_text().splitlines() if line.startswith("#CHROM")
    )
    assert header2.split("\t")[9:] == ["s0", "s2", "s3", "s5"]


def test_cli_filter_samples_file_equals_inline(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    f = tmp_path / "list.txt"
    f.write_text("s1\ns4\n")
    a, b = tmp_path / "a.vcf", tmp_path / "b.vcf"
    assert run_cli(["filter", prefix, "--samples", "s1,s4", "-o", str(a)]) == 0
    assert run_cli(["filter", prefix, "--samples-file", str(f), "-o", str(b)]) == 0
    assert a.read_bytes() == b.read_bytes()


def test_cli_samples_combines_with_include_sam(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    out = tmp_path / "c.vcf"
    # s1 is F (odd index), s4 is M: the AND keeps only s1
    assert (
        run_cli(
            ["filter", prefix, "--samples", "s1,s4", "--include-sam", 'SEX=="F"', "-o", str(out)]
        )
        == 0
    )
    header = next(
        line for line in out.read_text().splitlines() if line.startswith("#CHROM")
    )
    assert header.split("\t")[9:] == ["s1"]


def test_large_list_single_pass(tiny_fileset, tmp_path, basic1_prefix):
    """A 1000-name list must not blow the parser/interp recursion (it is a
    single regex node, not a 1000-deep || chain)."""
    import io
    from contextlib import redirect_stdout

    names = [f"ZZ{i:05d}" for i in range(1000)] + ["HG00096"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_cli(
            ["query", basic1_prefix, "-s", "-f", "IID", "-i", samples_to_expr(",".join(names))]
        )
    assert rc == 0
    assert buf.getvalue().splitlines() == ["HG00096"]


def test_cli_stats_samples(tiny_fileset, capsys):
    prefix, _ = tiny_fileset
    assert run_cli(["stats", prefix, "--samples", "s0,s2", "--per-sample"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "samples\t2" in out
    rows = out[out.index(next(l for l in out if l.startswith("#IID"))) + 1 :]
    assert [r.split("\t")[0] for r in rows] == ["s0", "s2"]


def test_samples_file_exclusion_after_comment(tmp_path):
    """A leading comment/blank must not disarm the ^ exclusion marker."""
    f = tmp_path / "s.txt"
    f.write_text("# cohort to drop\n\n^s1\ns2\n")
    expr = samples_file_to_expr(str(f))
    assert expr.startswith("!(")
    assert "s1|s2" in expr
