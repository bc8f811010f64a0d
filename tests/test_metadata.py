"""Metadata loader: header location, '#'-strip, columnar access
(SURVEY.md C4/C5/C6; pfile.rs:202-287)."""

import numpy as np
import pytest

from pgen_tpu.formats.metadata import MetadataFormatError, read_metadata


def _write(tmp_path, text, name="m.pvar"):
    p = tmp_path / name
    p.write_bytes(text.encode() if isinstance(text, str) else text)
    return p


def test_basic_parse(tmp_path):
    p = _write(
        tmp_path,
        "##one\n##two\n#CHROM\tPOS\tID\n1\t100\trs1\n2\t200\trs2\n",
    )
    t = read_metadata(p)
    assert t.columns == ("CHROM", "POS", "ID")  # '#' stripped from first col
    assert t.comments == "##one\n##two\n"
    assert t.header_line == "#CHROM\tPOS\tID"
    assert t.num_rows == 2
    assert t.row_fields(0) == ["1", "100", "rs1"]
    assert t.row_bytes(1) == b"2\t200\trs2"


def test_last_hash_line_is_header(tmp_path):
    # the LAST leading '#' line holds column names (pfile.rs:248-268)
    t = read_metadata(_write(tmp_path, "#junk\tx\n#IID\tSEX\na\tM\n"))
    assert t.columns == ("IID", "SEX")
    assert t.comments == "#junk\tx\n"


def test_no_header_errors(tmp_path):
    with pytest.raises(MetadataFormatError, match="header"):
        read_metadata(_write(tmp_path, "1\t2\n"))


def test_no_trailing_newline(tmp_path):
    t = read_metadata(_write(tmp_path, "#A\tB\n1\t2\n3\t4"))
    assert t.num_rows == 2
    assert t.row_fields(1) == ["3", "4"]


def test_field_count_mismatch_errors(tmp_path):
    # the reference's csv reader errors on ragged rows; so do we
    with pytest.raises(MetadataFormatError, match="fields"):
        read_metadata(_write(tmp_path, "#A\tB\n1\t2\t3\n"))


def test_empty_fields(tmp_path):
    t = read_metadata(_write(tmp_path, "#A\tB\tC\n\tmid\t\nx\t\tz\n"))
    assert t.row_fields(0) == ["", "mid", ""]
    assert t.row_fields(1) == ["x", "", "z"]
    assert t.get_column_strs("A") == ["", "x"]
    assert t.get_column_strs("C") == ["", "z"]


def test_column_bytes_padded(tmp_path):
    t = read_metadata(_write(tmp_path, "#A\tB\nabc\t1\nz\t22\n"))
    col = t.get_column_bytes("A")
    assert col.tolist() == [b"abc", b"z"]
    mat, lens = t.get_column_padded("B")
    assert mat.shape == (2, 2)
    assert lens.tolist() == [1, 2]
    assert mat[0].tolist() == [ord("1"), 0]


def test_crlf_normalized(tmp_path):
    t = read_metadata(_write(tmp_path, b"#A\tB\r\n1\t2\r\n"))
    assert t.num_rows == 1
    assert t.row_fields(0) == ["1", "2"]


def test_header_only_no_rows(tmp_path):
    t = read_metadata(_write(tmp_path, "#A\tB\n"))
    assert t.num_rows == 0
    assert t.get_column_bytes("A").shape == (0,)


def test_column_index_missing(tmp_path):
    t = read_metadata(_write(tmp_path, "#A\tB\n1\t2\n"))
    with pytest.raises(MetadataFormatError, match="IID not among the headers"):
        t.column_index("IID")


def test_real_basic1_pvar():
    t = read_metadata("/root/reference/data/basic1/basic1.pvar")
    assert t.columns == ("CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO")
    assert t.num_rows == 17784
    assert t.comments.count("\n") == 165
    assert t.get_column_strs("ID")[0] == "rs8100066"
    assert (t.get_column_bytes("CHROM") == b"19").all()
