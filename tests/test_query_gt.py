"""GT_* genotype-stat variables in `query` (pipeline/query.py).

Referencing GT_* in -i or -f opts the query into one pass over the packed
records; every other query keeps the metadata-only scaling property
(pinned by test_query.py::test_query_never_touches_records). Variant axis
matches filter's --include-var stats; -s binds the per-sample histograms
(the stats --per-sample numbers) under the same names.
"""

import io

import numpy as np
import pytest

from cli_helpers import run_cli

from pgen_tpu.pipeline.query import query_metadata


def _run(prefix, fstring, **kw):
    buf = io.StringIO()
    n = query_metadata(prefix, fstring, out=buf, **kw)
    return n, buf.getvalue().splitlines()


def test_variant_axis_counts_match_codes(tiny_fileset):
    prefix, codes = tiny_fileset
    n, lines = _run(prefix, 'ID + " " + str::from(GT_MISSING)')
    assert n == codes.shape[0]
    for i, line in enumerate(lines):
        rsid, miss = line.split()
        assert rsid == f"rs{i}"
        assert int(miss) == int((codes[i] == 3).sum())


def test_variant_axis_include_filters(tiny_fileset):
    prefix, codes = tiny_fileset
    n, lines = _run(prefix, "ID", query="GT_MISSING == 0")
    want = [f"rs{i}" for i in range(codes.shape[0]) if (codes[i] != 3).all()]
    assert lines == want


def test_sample_axis_stats(tiny_fileset):
    prefix, codes = tiny_fileset
    n, lines = _run(
        prefix,
        'IID + " " + str::from(GT_HET) + " " + str::from(GT_NOBS)',
        query_samples=True,
    )
    assert n == codes.shape[1]
    for s, line in enumerate(lines):
        iid, het, nobs = line.split()
        assert iid == f"s{s}"
        assert int(het) == int((codes[:, s] == 1).sum())
        assert int(nobs) == codes.shape[0] - int((codes[:, s] == 3).sum())


def test_sample_axis_ac_is_carried_alt_alleles(tiny_fileset):
    prefix, codes = tiny_fileset
    n, lines = _run(prefix, "str::from(GT_AC)", query_samples=True)
    for s, line in enumerate(lines):
        want = int((codes[:, s] == 1).sum() + 2 * (codes[:, s] == 2).sum())
        assert int(line) == want


def test_gt_query_matches_filter_mask(tiny_fileset, tmp_path):
    """query -i GT_EXPR keeps exactly the variants filter keeps."""
    from pgen_tpu.pipeline.filter import filter_to_vcf

    prefix, codes = tiny_fileset
    expr = "GT_AC >= 3"
    _, ids = _run(prefix, "ID", query=expr)
    out = tmp_path / "f.vcf"
    filter_to_vcf(prefix, var_query=expr, out_file=out)
    body_ids = [
        ln.split(b"\t")[2].decode()
        for ln in out.read_bytes().split(b"\n")
        if ln and not ln.startswith(b"#")
    ]
    assert ids == body_ids


def test_cli_query_gt(tiny_fileset, capsys):
    prefix, codes = tiny_fileset
    rc = run_cli(["query", prefix, "-f", "str::from(GT_AC)", "-i", "GT_NOBS > 0"])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert all(v.isdigit() for v in out)


def test_gt_af_expression(tiny_fileset):
    """Allele frequency via arithmetic on GT_* (needs float division)."""
    prefix, codes = tiny_fileset
    n, lines = _run(prefix, "str::from(GT_AC / (2.0 * GT_NOBS))")
    for i, line in enumerate(lines):
        ac = int((codes[i] == 1).sum() + 2 * (codes[i] == 2).sum())
        nobs = int((codes[i] != 3).sum())
        assert float(line) == pytest.approx(ac / (2.0 * nobs))


def test_row_count_mismatch_errors(tiny_fileset, tmp_path):
    import shutil

    prefix, codes = tiny_fileset
    bad = tmp_path / "bad"
    shutil.copyfile(f"{prefix}.pgen", f"{bad}.pgen")
    shutil.copyfile(f"{prefix}.psam", f"{bad}.psam")
    pvar = open(f"{prefix}.pvar").read()
    extra_rows = pvar + "1\t999\trs99\tA\tC\t.\t.\t.\n"
    (tmp_path / "bad.pvar").write_text(extra_rows)
    with pytest.raises(ValueError, match="matching counts"):
        _run(str(bad), "str::from(GT_AC)")


def test_str_from_vectorized_matches_interp(tiny_fileset):
    """str::from lowers vectorized for Int columns and stays row-exact."""
    prefix, codes = tiny_fileset
    _, fast = _run(prefix, 'ID + ":" + str::from(GT_MISSING)')
    # force the row interpreter with a float-typed value
    _, slow = _run(prefix, 'ID + ":" + str::from(GT_MISSING * 1.0)')
    assert [x.split(":")[0] for x in fast] == [x.split(":")[0] for x in slow]
    assert [float(x.split(":")[1]) for x in slow] == [
        float(x.split(":")[1]) for x in fast
    ]
