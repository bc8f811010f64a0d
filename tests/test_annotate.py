"""`annotate` subcommand: metadata rewrites (pipeline/annotate.py)."""

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.pipeline.annotate import annotate_pgen, gather_spans


def _fileset(tmp_path, comments="##fileformat=VCFv4.2\n"):
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(6, 5), dtype=np.uint8)
    rows = [
        f"{c}\t{100 + i}\trs{i}\t{r}\t{a}\t.\t.\tAF=0.{i}"
        for i, (c, r, a) in enumerate(
            [
                ("1", "A", "G"),
                ("1", "C", "T"),
                ("2", "AT", "A"),
                ("2", "G", "C"),
                ("X", "T", "A"),
                ("X", "A", "AC"),
            ]
        )
    ]
    prefix = build_fileset(
        tmp_path,
        "an",
        codes,
        rows,
        [f"s{i}\t{'MF'[i % 2]}" for i in range(5)],
        pvar_comments=comments,
    )
    return prefix, codes


def test_gather_spans_basic():
    buf = np.frombuffer(b"abcdefgh", dtype=np.uint8)
    got = gather_spans(
        buf, np.array([0, 4, 2]), np.array([2, 3, 0])
    )
    assert bytes(got) == b"abefg"


def test_set_id_expression(tmp_path):
    prefix, _ = _fileset(tmp_path)
    res = annotate_pgen(
        prefix,
        str(tmp_path / "out"),
        set_id='CHROM + ":" + POS + ":" + REF + ":" + ALT',
    )
    t = read_metadata(f"{res.out_prefix}.pvar")
    assert t.get_column_strs("ID") == [
        "1:100:A:G",
        "1:101:C:T",
        "2:102:AT:A",
        "2:103:G:C",
        "X:104:T:A",
        "X:105:A:AC",
    ]
    # every other column byte-identical; genotypes copied verbatim
    src = read_metadata(f"{prefix}.pvar")
    for col in ("CHROM", "POS", "REF", "ALT", "QUAL", "FILTER", "INFO"):
        assert t.get_column_strs(col) == src.get_column_strs(col)
    assert (
        open(f"{res.out_prefix}.pgen", "rb").read()
        == open(f"{prefix}.pgen", "rb").read()
    )
    assert (
        open(f"{res.out_prefix}.psam", "rb").read()
        == open(f"{prefix}.psam", "rb").read()
    )


def test_set_id_info_subfield(tmp_path):
    prefix, _ = _fileset(tmp_path)
    res = annotate_pgen(prefix, str(tmp_path / "o2"), set_id='"af" + INFO_AF')
    t = read_metadata(f"{res.out_prefix}.pvar")
    assert t.get_column_strs("ID") == [f"af0.{i}" for i in range(6)]


def test_rename_chrs_with_contig_comments(tmp_path):
    comments = (
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=1,length=9>\n"
        "##contig=<ID=2,length=9>\n"
        "##contig=<ID=X,length=9>\n"
    )
    prefix, _ = _fileset(tmp_path, comments=comments)
    mapping = tmp_path / "map.txt"
    mapping.write_text("1 chr1\nX chrX\n# a comment\n")
    res = annotate_pgen(prefix, str(tmp_path / "out"), rename_chrs=str(mapping))
    t = read_metadata(f"{res.out_prefix}.pvar")
    assert t.get_column_strs("CHROM") == [
        "chr1", "chr1", "2", "2", "chrX", "chrX",
    ]
    assert "##contig=<ID=chr1,length=9>" in t.comments
    assert "##contig=<ID=2,length=9>" in t.comments  # unlisted passes through
    assert "##contig=<ID=chrX,length=9>" in t.comments


def test_set_id_sees_renamed_chroms(tmp_path):
    prefix, _ = _fileset(tmp_path)
    mapping = tmp_path / "map.txt"
    mapping.write_text("1\tchr1\n")
    res = annotate_pgen(
        prefix,
        str(tmp_path / "out"),
        set_id='CHROM + ":" + POS',
        rename_chrs=str(mapping),
    )
    t = read_metadata(f"{res.out_prefix}.pvar")
    assert t.get_column_strs("ID")[:2] == ["chr1:100", "chr1:101"]


def test_rename_samples_pairs_and_positional(tmp_path):
    prefix, _ = _fileset(tmp_path)
    pairs = tmp_path / "pairs.txt"
    pairs.write_text("s0 alpha\ns3 delta\n")
    res = annotate_pgen(prefix, str(tmp_path / "o1"), rename_samples=str(pairs))
    t = read_metadata(f"{res.out_prefix}.psam")
    assert t.get_column_strs("IID") == ["alpha", "s1", "s2", "delta", "s4"]
    assert t.get_column_strs("SEX") == ["M", "F", "M", "F", "M"]
    # pvar untouched on a psam-only run
    assert (
        open(f"{res.out_prefix}.pvar", "rb").read()
        == open(f"{prefix}.pvar", "rb").read()
    )

    allnames = tmp_path / "all.txt"
    allnames.write_text("".join(f"n{i}\n" for i in range(5)))
    res2 = annotate_pgen(prefix, str(tmp_path / "o2"), rename_samples=str(allnames))
    t2 = read_metadata(f"{res2.out_prefix}.psam")
    assert t2.get_column_strs("IID") == [f"n{i}" for i in range(5)]


def test_rename_samples_errors(tmp_path):
    prefix, _ = _fileset(tmp_path)
    short = tmp_path / "short.txt"
    short.write_text("a\nb\n")
    with pytest.raises(ValueError, match="2 names for 5 samples"):
        annotate_pgen(prefix, str(tmp_path / "x"), rename_samples=str(short))
    dup = tmp_path / "dup.txt"
    dup.write_text("s0 s1\n")
    with pytest.raises(ValueError, match="duplicate IIDs"):
        annotate_pgen(prefix, str(tmp_path / "y"), rename_samples=str(dup))


def test_annotate_value_validation(tmp_path):
    prefix, _ = _fileset(tmp_path)
    with pytest.raises(ValueError, match="empty ID"):
        annotate_pgen(prefix, str(tmp_path / "x"), set_id='""')
    with pytest.raises(ValueError, match="tabs or newlines"):
        annotate_pgen(prefix, str(tmp_path / "y"), set_id='"a\tb"')


def test_annotate_requires_an_operation(tmp_path):
    prefix, _ = _fileset(tmp_path)
    with pytest.raises(ValueError, match="at least one"):
        annotate_pgen(prefix, str(tmp_path / "x"))


def test_annotate_cli_roundtrip_filter(tmp_path, capsys):
    prefix, codes = _fileset(tmp_path)
    out = str(tmp_path / "cli")
    rc = run_cli(
        ["annotate", prefix, "--set-id", 'CHROM + "_" + POS', "-o", out]
    )
    assert rc == 0
    rc = run_cli(["query", out, "-f", "ID", "-i", 'CHROM == "2"'])
    assert rc == 0
    assert capsys.readouterr().out.splitlines() == ["2_102", "2_103"]


def _expected_counts(codes):
    out = np.zeros((codes.shape[0], 4), dtype=np.int64)
    for k in range(4):
        out[:, k] = (codes == k).sum(axis=1)
    return out


def test_fill_info_values_and_decls(tmp_path):
    prefix, codes = _fileset(tmp_path)
    res = annotate_pgen(
        prefix, str(tmp_path / "fi"), fill_info="AC,AN,NS"
    )
    t = read_metadata(f"{res.out_prefix}.pvar")
    cnt = _expected_counts(codes)
    ac = cnt[:, 1] + 2 * cnt[:, 2]
    an = 2 * (cnt[:, 0] + cnt[:, 1] + cnt[:, 2])
    ns = cnt[:, 0] + cnt[:, 1] + cnt[:, 2]
    infos = t.get_column_strs("INFO")
    for i, info in enumerate(infos):
        # the fixture's existing AF=0.i field passes through untouched
        assert info == f"AF=0.{i};AC={ac[i]};AN={an[i]};NS={ns[i]}"
    # declarations added once, before the column header
    assert "##INFO=<ID=AC,Number=A,Type=Integer" in t.comments
    assert "##INFO=<ID=AN," in t.comments and "##INFO=<ID=NS," in t.comments


def test_fill_info_replaces_existing_tag(tmp_path):
    prefix, codes = _fileset(tmp_path)
    res = annotate_pgen(prefix, str(tmp_path / "fr"), fill_info="AF")
    t = read_metadata(f"{res.out_prefix}.pvar")
    cnt = _expected_counts(codes)
    ac = cnt[:, 1] + 2 * cnt[:, 2]
    an = 2 * (cnt[:, 0] + cnt[:, 1] + cnt[:, 2])
    for i, info in enumerate(t.get_column_strs("INFO")):
        af = ac[i] / an[i] if an[i] else 0.0
        assert info == f"AF={af:.6g}", (i, info)  # old AF=0.i stripped


def test_fill_info_dot_info_and_all(tmp_path):
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=(3, 4), dtype=np.uint8)
    rows = [f"1\t{200 + i}\trs{i}\tA\tG\t.\t.\t." for i in range(3)]
    prefix = build_fileset(
        tmp_path, "dot", codes, rows, [f"s{i}\tM" for i in range(4)]
    )
    res = annotate_pgen(prefix, str(tmp_path / "da"), fill_info="all")
    t = read_metadata(f"{res.out_prefix}.pvar")
    for info in t.get_column_strs("INFO"):
        assert info.startswith("AC=")  # '.' replaced, not prepended
        names = [f.split("=")[0] for f in info.split(";")]
        assert names == ["AC", "AN", "AF", "MAF", "NS", "F_MISSING", "HWE"]


def test_fill_info_cohort_restriction(tmp_path):
    prefix, codes = _fileset(tmp_path)
    assert run_cli([
        "annotate", prefix, "-o", str(tmp_path / "co"),
        "--fill-info", "AC", "--samples", "s0,s2",
    ]) == 0
    t = read_metadata(str(tmp_path / "co.pvar"))
    sub = codes[:, [0, 2]]
    ac = (sub == 1).sum(axis=1) + 2 * (sub == 2).sum(axis=1)
    for i, info in enumerate(t.get_column_strs("INFO")):
        assert info.endswith(f";AC={ac[i]}")


def test_fill_info_then_set_id_sees_tags(tmp_path):
    prefix, codes = _fileset(tmp_path)
    res = annotate_pgen(
        prefix, str(tmp_path / "fs"), fill_info="AC",
        set_id='ID + "_" + INFO_AC',
    )
    t = read_metadata(f"{res.out_prefix}.pvar")
    cnt = _expected_counts(codes)
    ac = cnt[:, 1] + 2 * cnt[:, 2]
    assert t.get_column_strs("ID") == [f"rs{i}_{ac[i]}" for i in range(6)]


def test_fill_info_errors(tmp_path):
    prefix, _ = _fileset(tmp_path)
    with pytest.raises(ValueError, match="unsupported tag"):
        annotate_pgen(prefix, str(tmp_path / "x"), fill_info="AC,BOGUS")
    with pytest.raises(ValueError, match="sample selections"):
        annotate_pgen(prefix, str(tmp_path / "y"), set_id="ID",
                      sam_query='IID=="s0"')


# -- --annotations transfer (bcftools annotate -a analog) --------------------


def _src_fileset(tmp_path):
    """Annotation source: overlaps the _fileset keys at rows 1, 3, 4
    (1:101:C:T, 2:103:G:C, X:104:T:A) plus a non-matching extra."""
    rng = np.random.default_rng(9)
    rows = [
        "1\t101\tSRC1\tC\tT\t.\t.\tDB=1;CAF=0.25",
        "2\t103\tSRC3\tG\tC\t.\t.\tCAF=0.5",
        "X\t104\tSRC4\tT\tA\t.\t.\tDB=7",
        "9\t999\tSRCX\tA\tG\t.\t.\tCAF=0.9",
    ]
    codes = rng.integers(0, 4, size=(4, 2), dtype=np.uint8)
    return build_fileset(
        tmp_path, "src", codes, rows, ["t0\tM", "t1\tF"],
        pvar_comments=(
            "##fileformat=VCFv4.2\n"
            '##INFO=<ID=CAF,Number=1,Type=Float,Description="x">\n'
            '##INFO=<ID=DB,Number=0,Type=Flag,Description="y">\n'
        ),
    )


def test_annotations_transfer_id(tmp_path):
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.pipeline.annotate import annotate_pgen

    prefix, _ = _fileset(tmp_path)
    src = _src_fileset(tmp_path)
    res = annotate_pgen(prefix, str(tmp_path / "o"), annotations=src)
    ids = read_metadata(f"{res.out_prefix}.pvar").get_column_strs("ID")
    # matched rows take the source ID; others keep theirs
    assert ids == ["rs0", "SRC1", "rs2", "SRC3", "SRC4", "rs5"]


def test_annotations_transfer_whole_info(tmp_path):
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.pipeline.annotate import annotate_pgen

    prefix, _ = _fileset(tmp_path)
    src = _src_fileset(tmp_path)
    res = annotate_pgen(
        prefix, str(tmp_path / "o"), annotations=src, columns="INFO"
    )
    pv = read_metadata(f"{res.out_prefix}.pvar")
    infos = pv.get_column_strs("INFO")
    assert infos[1] == "DB=1;CAF=0.25"
    assert infos[3] == "CAF=0.5"
    assert infos[0] == "AF=0.0"  # unmatched: untouched
    # source ##INFO declarations copied into the header
    assert "##INFO=<ID=CAF," in pv.comments
    assert "##INFO=<ID=DB," in pv.comments


def test_annotations_transfer_single_tag(tmp_path):
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.pipeline.annotate import annotate_pgen

    prefix, _ = _fileset(tmp_path)
    src = _src_fileset(tmp_path)
    res = annotate_pgen(
        prefix, str(tmp_path / "o"), annotations=src, columns="INFO/CAF"
    )
    pv = read_metadata(f"{res.out_prefix}.pvar")
    infos = pv.get_column_strs("INFO")
    # tag SPLICED into the existing INFO, other fields intact
    assert infos[1] == "AF=0.1;CAF=0.25"
    assert infos[3] == "AF=0.3;CAF=0.5"
    assert infos[4] == "AF=0.4"  # matched but source lacks CAF: untouched
    assert infos[0] == "AF=0.0"
    assert "##INFO=<ID=CAF," in pv.comments
    assert "##INFO=<ID=DB," not in pv.comments  # only the asked tag's decl


def test_annotations_combined_columns_and_set_id(tmp_path):
    """ID+INFO/CAF in one run, then --set-id sees the transferred data."""
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.pipeline.annotate import annotate_pgen

    prefix, _ = _fileset(tmp_path)
    src = _src_fileset(tmp_path)
    res = annotate_pgen(
        prefix, str(tmp_path / "o"), annotations=src,
        columns="ID,INFO/CAF", set_id='ID + "|" + CHROM',
    )
    pv = read_metadata(f"{res.out_prefix}.pvar")
    assert pv.get_column_strs("ID")[1] == "SRC1|1"
    assert pv.get_column_strs("INFO")[1] == "AF=0.1;CAF=0.25"


def test_annotations_cli(tmp_path):
    from cli_helpers import run_cli
    from pgen_tpu.formats.metadata import read_metadata

    prefix, _ = _fileset(tmp_path)
    src = _src_fileset(tmp_path)
    out = str(tmp_path / "c")
    assert run_cli([
        "annotate", prefix, "-o", out, "-a", src, "-c", "ID,INFO/DB",
    ]) == 0
    pv = read_metadata(out + ".pvar")
    assert pv.get_column_strs("ID")[4] == "SRC4"
    assert pv.get_column_strs("INFO")[4] == "AF=0.4;DB=7"
    # bad column spec errors
    assert run_cli([
        "annotate", prefix, "-o", out, "-a", src, "-c", "QUAL",
    ]) == 1


def test_remove_annotations(tmp_path):
    import numpy as np

    codes = np.zeros((3, 2), dtype=np.uint8)
    pvar_rows = [
        "1\t100\trs0\tA\tG\t50\tPASS\tAC=1;AN=4;AF=0.25",
        "1\t200\trs1\tA\tG\t60\tPASS\tAN=4",
        "1\t300\trs2\tA\tG\t.\t.\t.",
    ]
    comments = (
        "##fileformat=VCFv4.2\n"
        '##INFO=<ID=AC,Number=A,Type=Integer,Description="x">\n'
        '##INFO=<ID=AN,Number=1,Type=Integer,Description="y">\n'
    )
    prefix = build_fileset(
        tmp_path, "rx", codes, pvar_rows, ["s0\tM", "s1\tF"],
        pvar_comments=comments,
    )
    # strip one INFO tag: value gone per row, header declaration gone
    out = tmp_path / "o1"
    assert run_cli(["annotate", prefix, "-o", str(out), "-x", "INFO/AN"]) == 0
    text = (tmp_path / "o1.pvar").read_text()
    assert "AN=4" not in text and "AC=1;AF=0.25" in text
    assert "##INFO=<ID=AN" not in text and "##INFO=<ID=AC" in text
    # rs1's INFO had only AN -> becomes "."
    assert text.splitlines()[-2].endswith("\t.")
    # blank whole columns
    out2 = tmp_path / "o2"
    assert run_cli([
        "annotate", prefix, "-o", str(out2), "-x", "ID,QUAL,INFO",
    ]) == 0
    lines = (tmp_path / "o2.pvar").read_text().splitlines()
    assert "##INFO" not in "\n".join(lines)
    body = [l.split("\t") for l in lines if not l.startswith("#")]
    assert all(r[2] == "." and r[5] == "." and r[7] == "." for r in body)
    # unknown spec errors
    assert run_cli(["annotate", prefix, "-o", str(out2), "-x", "FOO"]) != 0
