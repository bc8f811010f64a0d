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


# ---- GT()/GT_TEXT()/GT_ROW per-sample genotype indexing (gt_index.py) ----
# Closes the reference's wished-for redesign: indexing into genotypes in
# filters and format strings (/root/reference/README.md:200-204, 259-264).

TOKS = ["0/0", "0/1", "1/1", "./."]
DOS = [0, 1, 2, -9]


def test_gt_call_fstring_and_predicate_vs_oracle(tiny_fileset):
    prefix, codes = tiny_fileset
    nv, ns = codes.shape
    # by IID and by index, text and dosage, against the scalar oracle
    n, lines = _run(prefix, 'ID + " " + GT_TEXT("s2") + " " + str::from(GT(2))')
    assert lines == [
        f"rs{i} {TOKS[codes[i, 2]]} {DOS[codes[i, 2]]}" for i in range(nv)
    ]
    n, lines = _run(prefix, "ID", query='GT("s2") == 1')
    assert lines == [f"rs{i}" for i in range(nv) if codes[i, 2] == 1]
    # missing calls are -9, selectable
    n, lines = _run(prefix, "ID", query="GT(0) == -9")
    assert lines == [f"rs{i}" for i in range(nv) if codes[i, 0] == 3]


def test_gt_row_expansion(tiny_fileset):
    prefix, codes = tiny_fileset
    nv, ns = codes.shape
    n, lines = _run(prefix, 'ID + "\t" + GT_ROW')
    assert lines == [
        f"rs{i}\t" + "\t".join(TOKS[c] for c in codes[i]) for i in range(nv)
    ]


def test_gt_sample_axis(tiny_fileset):
    """Under -s the argument names a variant; GT_ROW spans variants."""
    prefix, codes = tiny_fileset
    nv, ns = codes.shape
    n, lines = _run(
        prefix, 'IID + " " + str::from(GT("rs3"))', query_samples=True
    )
    assert lines == [f"s{j} {DOS[codes[3, j]]}" for j in range(ns)]
    n, lines = _run(prefix, "GT_ROW", query_samples=True)
    assert lines == [
        "\t".join(TOKS[codes[i, j]] for i in range(nv)) for j in range(ns)
    ]


def test_gt_call_in_filter_both_axes(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    nv, ns = codes.shape
    out = tmp_path / "o.vcf"
    assert run_cli(["filter", prefix, "--include-var", 'GT("s0")==2',
                    "-o", str(out)]) == 0
    kept = [l.split("\t")[2] for l in open(out) if not l.startswith("#")]
    assert kept == [f"rs{i}" for i in range(nv) if codes[i, 0] == 2]
    # sample axis: keep samples het-or-hom-alt at rs1
    assert run_cli(["filter", prefix, "--include-sam", 'GT("rs1")>=1',
                    "-o", str(out)]) == 0
    hdr = [l for l in open(out) if l.startswith("#CHROM")][0]
    assert hdr.rstrip("\n").split("\t")[9:] == [
        f"s{j}" for j in range(ns) if codes[1, j] in (1, 2)
    ]
    # sharded parity
    out2 = tmp_path / "o2.vcf"
    assert run_cli(["filter", prefix, "--include-var", 'GT("s0")==2',
                    "-o", str(out2), "--shards", "2"]) == 0
    assert out.exists()


def test_gt_call_composes_with_interpreter_fallback(tiny_fileset):
    """Rewritten GT columns are plain variables: regex and other
    row-exact constructs see them too."""
    prefix, codes = tiny_fileset
    nv, _ = codes.shape
    n, lines = _run(
        prefix, "ID", query='str::regex_matches(GT_TEXT("s1"), "^0/")'
    )
    assert lines == [f"rs{i}" for i in range(nv) if codes[i, 1] in (0, 1)]


def test_gt_call_errors(tiny_fileset):
    from pgen_tpu.query.ast import ExprError

    prefix, codes = tiny_fileset
    with pytest.raises(ExprError, match="not found"):
        _run(prefix, 'str::from(GT("nosuch"))')
    with pytest.raises(ExprError, match="out of range"):
        _run(prefix, "str::from(GT(99))")
    with pytest.raises(ExprError, match="literal"):
        _run(prefix, "str::from(GT(ID))")
    with pytest.raises(ExprError, match="one argument"):
        _run(prefix, 'str::from(GT("a", "b"))')


def test_gt_query_without_index_stays_metadata_only(tiny_fileset, tmp_path):
    """Queries not referencing GT*/GT_ROW never open the records (the
    reference's metadata-only scaling property)."""
    import shutil

    prefix, codes = tiny_fileset
    bad = tmp_path / "trunc"
    shutil.copyfile(f"{prefix}.pvar", f"{bad}.pvar")
    shutil.copyfile(f"{prefix}.psam", f"{bad}.psam")
    # valid 12-byte header, zero record bytes
    with open(f"{prefix}.pgen", "rb") as f:
        hdr12 = f.read(12)
    (tmp_path / "trunc.pgen").write_bytes(hdr12)
    n, lines = _run(str(bad), "ID")  # fine: metadata only
    assert n == codes.shape[0]


def test_gt_string_id_bounds_checked_against_pgen(tiny_fileset, tmp_path):
    """String-ID lookups resolve through the (possibly oversized)
    metadata file; rows past the pgen's axis must error cleanly, not
    read pad bits or crash (r5 review finding)."""
    import shutil

    from pgen_tpu.query.ast import ExprError

    prefix, codes = tiny_fileset
    nv, ns = codes.shape
    big = tmp_path / "big"
    shutil.copyfile(f"{prefix}.pgen", f"{big}.pgen")
    shutil.copyfile(f"{prefix}.pvar", f"{big}.pvar")
    psam = open(f"{prefix}.psam").read()
    (tmp_path / "big.psam").write_text(
        psam + "".join(f"s{ns + i}\tM\n" for i in range(3))
    )
    with pytest.raises(ExprError, match="out of range"):
        _run(str(big), f'str::from(GT("s{ns + 1}"))')
    # sample axis: variant-ID rows past the pgen's record count
    big2 = tmp_path / "big2"
    shutil.copyfile(f"{prefix}.pgen", f"{big2}.pgen")
    shutil.copyfile(f"{prefix}.psam", f"{big2}.psam")
    pvar = open(f"{prefix}.pvar").read()
    (tmp_path / "big2.pvar").write_text(
        pvar + f"1\t999\trs{nv + 2}\tA\tG\t100\tPASS\t.\n"
    )
    with pytest.raises(ExprError, match="out of range"):
        _run(str(big2), f'str::from(GT("rs{nv + 2}"))', query_samples=True)
