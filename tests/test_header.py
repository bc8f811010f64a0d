"""Mode-0x02 header parse + geometry (SURVEY.md C3/C9; pfile.rs:38-76)."""

import struct

import numpy as np
import pytest

from pgen_tpu.formats.header import (
    PgenFormatError,
    parse_pgen_header,
    read_pgen_header,
    variant_record_size,
)
from pgen_tpu.formats.writer import pack_codes, write_pgen


def _hdr(magic=b"\x6c\x1b", mode=0x02, nvar=7, nsamp=10, fmt=0x40):
    return magic + bytes([mode]) + struct.pack("<II", nvar, nsamp) + bytes([fmt])


def test_parse_ok():
    h = parse_pgen_header(_hdr())
    assert h.num_variants == 7
    assert h.num_samples == 10
    assert h.record_size == 3  # ceil(20/8)
    assert h.records_offset == 12
    assert h.record_offset(4) == 12 + 4 * 3
    assert h.expected_file_size == 12 + 7 * 3


def test_bad_magic():
    with pytest.raises(PgenFormatError, match="magic"):
        parse_pgen_header(_hdr(magic=b"\x00\x00"))


def test_bad_storage_mode():
    with pytest.raises(PgenFormatError, match="storage mode"):
        parse_pgen_header(_hdr(mode=0x10))


def test_bad_format_byte():
    with pytest.raises(PgenFormatError, match="format byte"):
        parse_pgen_header(_hdr(fmt=0x41))


def test_truncated():
    with pytest.raises(PgenFormatError, match="truncated"):
        parse_pgen_header(b"\x6c\x1b\x02")


@pytest.mark.parametrize(
    "nsamp,rec", [(1, 1), (3, 1), (4, 1), (5, 2), (8, 2), (2504, 626)]
)
def test_record_size(nsamp, rec):
    # ceil(2S/8), pfile.rs:196-200
    assert variant_record_size(nsamp) == rec


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(11, 13), dtype=np.uint8)
    p = tmp_path / "t.pgen"
    write_pgen(p, codes)
    h = read_pgen_header(p)
    assert (h.num_variants, h.num_samples) == (11, 13)
    raw = p.read_bytes()
    assert len(raw) == h.expected_file_size
    # decode by the reference bit rule and compare
    rec = raw[12:]
    for v in range(11):
        for s in range(13):
            byte = rec[v * h.record_size + s // 4]
            assert (byte >> ((s % 4) * 2)) & 3 == codes[v, s]


def test_pack_codes_lsb_first():
    # sample 0 occupies the LOW two bits (pfile.rs:175)
    packed = pack_codes(np.array([[1, 2, 3, 0]], dtype=np.uint8))
    assert packed[0, 0] == 0b00_11_10_01


def test_pack_codes_tail_padding():
    packed = pack_codes(np.array([[3, 3, 3, 3, 3]], dtype=np.uint8))
    assert packed.shape == (1, 2)
    assert packed[0, 1] == 0b11  # only low 2 bits used


def test_pack_codes_rejects_bad_values():
    with pytest.raises(ValueError):
        pack_codes(np.array([[4]], dtype=np.uint8))
