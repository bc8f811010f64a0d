"""INFO subfield virtual variables (INFO_<KEY>) — the reference's
"next steps" item (README.md:205-207, bcftools INFO/AF equivalent)."""

import io

import numpy as np
import pytest

from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.pipeline.filter import filter_to_vcf
from pgen_tpu.pipeline.query import query_metadata


@pytest.fixture()
def info_table(tmp_path):
    rows = [
        "1\t100\tr0\tA\tC\t.\t.\tAC=2;AF=0.5;VT=SNP",
        "1\t101\tr1\tA\tG\t.\t.\tAF=0.25;FLAGGED;VT=SNP",
        "1\t102\tr2\tA\tT\t.\t.\tVT=INDEL;AFX=9",  # AFX must not match AF
        "1\t103\tr3\tA\tC\t.\t.\t.",
        "1\t104\tr4\tA\tC\t.\t.\tAF=",  # empty value
    ]
    p = tmp_path / "i.pvar"
    p.write_text("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n" + "\n".join(rows) + "\n")
    return read_metadata(p)


def test_extraction_values(info_table):
    assert info_table.get_virtual_strs("INFO_AF") == ["0.5", "0.25", ".", ".", ""]
    assert info_table.get_virtual_strs("INFO_VT") == ["SNP", "SNP", "INDEL", ".", "."]
    assert info_table.get_virtual_strs("INFO_FLAGGED") == [".", "1", ".", ".", "."]
    assert info_table.get_virtual_strs("INFO_AC") == ["2", ".", ".", ".", "."]
    assert info_table.get_virtual_strs("INFO_NOPE") == [".", ".", ".", ".", "."]
    assert info_table.get_virtual_bytes("NOT_INFO") is None
    assert info_table.get_virtual_bytes("INFO_") is None


def test_python_fallback_matches_native(info_table):
    from pgen_tpu.native import HAVE_NATIVE

    if not HAVE_NATIVE:
        pytest.skip("needs native to compare")
    # the small table takes the python path in _info_extract (<=1024 rows);
    # cross-check it against the native extractor directly
    from pgen_tpu.native import native

    j = info_table.column_index("INFO")
    starts, ends = info_table.field_starts(j), info_table.field_ends(j)
    nvs, nvl = native.info_extract(info_table.data_buffer, starts, ends, b"AF")
    pvs, pvl = info_table._info_extract(starts, ends, b"AF")
    assert (nvl == pvl).all()
    sel = nvl >= 0
    assert (nvs[sel] == pvs[sel]).all()


def test_predicate_on_subfield(info_table):
    from pgen_tpu.query.compile import compile_predicate

    mask = compile_predicate('INFO_VT == "SNP"', info_table)
    assert mask.tolist() == [True, True, False, False, False]
    mask2 = compile_predicate('INFO_FLAGGED == "1"', info_table)
    assert mask2.tolist() == [False, True, False, False, False]
    # fallback path (function call) sees the virtual too
    mask3 = compile_predicate('len(INFO_AF) == 3', info_table)
    assert mask3.tolist() == [True, False, False, False, False]


def test_query_and_filter_with_subfields(tmp_path):
    from conftest import build_fileset

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(4, 3), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "iv",
        codes,
        [
            "1\t100\tr0\tA\tC\t.\t.\tAF=0.9;VT=SNP",
            "1\t101\tr1\tA\tG\t.\t.\tAF=0.1;VT=SNP",
            "1\t102\tr2\tA\tT\t.\t.\tVT=INDEL",
            "1\t103\tr3\tA\tC\t.\t.\tAF=0.9;VT=INDEL",
        ],
        ["s0\tM", "s1\tF", "s2\tM"],
    )
    buf = io.StringIO()
    n = query_metadata(prefix, 'ID + ":" + INFO_AF', 'INFO_VT == "SNP"', out=buf)
    assert buf.getvalue() == "r0:0.9\nr1:0.1\n"
    assert n == 2

    out = tmp_path / "o.vcf"
    res = filter_to_vcf(prefix, var_query='INFO_AF == "0.9"', out_file=out)
    assert res.num_variants_kept == 2
    body = [l for l in out.read_bytes().split(b"\n") if l and not l.startswith(b"#")]
    assert body[0].startswith(b"1\t100\t") and body[1].startswith(b"1\t103\t")


def test_real_basic1_info_af():
    t = read_metadata("/root/reference/data/basic1/basic1.pvar")
    af = t.get_virtual_strs("INFO_AF")
    assert af[0] == "0.545327"  # row 0: AF=0.545327
    vt = t.get_virtual_bytes("INFO_VT")
    assert (vt == b"SNP").all()


def test_multiallelic_comma_value_workaround(tmp_path):
    """Number=A comma lists: num() fails fast; regex-strip composition
    takes the first value bcftools-style (documented in README)."""
    p = tmp_path / "ma.pvar"
    p.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t1\tr0\tA\tC,G\t.\t.\tAF=0.9,0.01\n"
        "1\t2\tr1\tA\tC\t.\t.\tAF=0.2\n"
    )
    t = read_metadata(p)
    from pgen_tpu.query.ast import ExprError
    from pgen_tpu.query.compile import compile_predicate

    with pytest.raises(ExprError, match="cannot parse"):
        compile_predicate("num(INFO_AF) > 0.5", t)
    mask = compile_predicate(
        'num(str::regex_replace(INFO_AF, ",.*", "")) > 0.5', t
    )
    assert mask.tolist() == [True, False]
