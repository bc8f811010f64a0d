"""Query path: metadata-only, stdout discipline (SURVEY.md §3.2)."""

import io

import pytest

from pgen_tpu.pipeline.query import query_metadata

from oracle import scalar_query


def test_query_variants(tiny_fileset):
    prefix, _ = tiny_fileset
    buf = io.StringIO()
    n = query_metadata(prefix, 'CHROM + " " + POS', 'REF == "A"', out=buf)
    expected = scalar_query(prefix, lambda c: c["CHROM"] + " " + c["POS"], lambda c: c["REF"] == "A")
    assert buf.getvalue() == "".join(e + "\n" for e in expected)
    assert n == len(expected)


def test_query_samples_flag(tiny_fileset):
    prefix, _ = tiny_fileset
    buf = io.StringIO()
    query_metadata(prefix, "IID", 'SEX == "M"', query_samples=True, out=buf)
    expected = scalar_query(prefix, lambda c: c["IID"], lambda c: c["SEX"] == "M", samples=True)
    assert buf.getvalue() == "".join(e + "\n" for e in expected)


def test_query_no_include_keeps_all(tiny_fileset):
    prefix, _ = tiny_fileset
    buf = io.StringIO()
    n = query_metadata(prefix, "ID", out=buf)
    assert n == 5
    assert buf.getvalue().splitlines() == [f"rs{i}" for i in range(5)]


def test_query_validates_pgen(tmp_path, tiny_fileset):
    # Pfile::from_prefix runs before the reader is chosen (main.rs:101)
    import shutil

    prefix, _ = tiny_fileset
    bad = tmp_path / "bad"
    shutil.copyfile(f"{prefix}.pvar", f"{bad}.pvar")
    shutil.copyfile(f"{prefix}.psam", f"{bad}.psam")
    (tmp_path / "bad.pgen").write_bytes(b"\x00\x00garbage-padding")
    with pytest.raises(Exception, match="magic"):
        query_metadata(str(bad), "ID", out=io.StringIO())


def test_query_never_touches_records(tiny_fileset, tmp_path):
    """The stated scaling property: query reads only metadata
    (README.md:158-160) — truncating the records after the header must not
    affect query."""
    import shutil
    import struct

    prefix, _ = tiny_fileset
    clone = tmp_path / "clone"
    shutil.copyfile(f"{prefix}.pvar", f"{clone}.pvar")
    shutil.copyfile(f"{prefix}.psam", f"{clone}.psam")
    hdr = open(f"{prefix}.pgen", "rb").read(12)
    (tmp_path / "clone.pgen").write_bytes(hdr)  # header only, zero records
    buf = io.StringIO()
    n = query_metadata(str(clone), "ID", out=buf)
    assert n == 5


def test_query_fstring_type_error(tiny_fileset):
    from pgen_tpu.query.ast import ExprError

    prefix, _ = tiny_fileset
    with pytest.raises(ExprError):
        query_metadata(prefix, 'ID == "rs0"', out=io.StringIO())  # Boolean fstring
