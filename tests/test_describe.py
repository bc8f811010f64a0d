"""General-header introspection (SURVEY.md C12; reference pgen.rs:5-259)."""

import struct

import numpy as np
import pytest

from pgen_tpu.formats.describe import describe_pgen
from pgen_tpu.formats.header import PgenFormatError


def _general_pgen(path, n_var=70000, type_bits=4, len_bytes=2):
    """Synthesize a variable-record pgen header (2 variant blocks)."""
    record_storage_mode = (0 if type_bits == 4 else 4) + (len_bytes - 1)
    fmt = (0b01 << 6) | (0 << 4) | record_storage_mode
    blocks = (n_var + (1 << 16) - 1) >> 16
    out = bytearray()
    out += b"\x6c\x1b"
    out += bytes([0x10])
    out += struct.pack("<II", n_var, 100)
    out += bytes([fmt])
    # ascending block offsets (values arbitrary but increasing)
    for b in range(blocks):
        out += struct.pack("<Q", 1000 + 7777 * b)
    rng = np.random.default_rng(0)
    for b in range(blocks):
        count = min(1 << 16, n_var - (b << 16))
        tsize = (count + 1) // 2 if type_bits == 4 else count
        out += rng.integers(0, 256, tsize, dtype=np.uint8).tobytes()
        out += rng.integers(0, 256, count * len_bytes, dtype=np.uint8).tobytes()
    path.write_bytes(bytes(out))
    return len(out)


def test_describe_general(tmp_path):
    p = tmp_path / "g.pgen"
    total = _general_pgen(p)
    d = describe_pgen(p)
    assert d.storage_mode == 0x10
    assert d.num_variants == 70000
    assert d.num_samples == 100
    assert d.record_type_bits == 4
    assert d.record_length_bytes == 2
    assert len(d.block_offsets) == 2
    assert d.variant_records_offset == total
    assert "storage mode: 0x10" in d.summary()


def test_describe_8bit_types(tmp_path):
    p = tmp_path / "g8.pgen"
    _general_pgen(p, n_var=100, type_bits=8, len_bytes=3)
    d = describe_pgen(p)
    assert d.record_type_bits == 8
    assert d.record_length_bytes == 3
    assert len(d.block_offsets) == 1


def test_describe_rejects_mode2(tmp_path, tiny_fileset):
    prefix, _ = tiny_fileset
    with pytest.raises(PgenFormatError, match="fixed-width"):
        describe_pgen(f"{prefix}.pgen")


def test_describe_rejects_descending_offsets(tmp_path):
    p = tmp_path / "bad.pgen"
    _general_pgen(p, n_var=70000)
    raw = bytearray(p.read_bytes())
    # swap the two block offsets so they descend
    o1 = raw[12:20]
    raw[12:20] = raw[20:28]
    raw[20:28] = o1
    p.write_bytes(bytes(raw))
    with pytest.raises(PgenFormatError, match="ascending"):
        describe_pgen(p)


def test_describe_bad_provisional_ref(tmp_path):
    p = tmp_path / "pr.pgen"
    out = b"\x6c\x1b" + bytes([0x10]) + struct.pack("<II", 1, 1) + bytes([0x00])
    p.write_bytes(out + b"\x00" * 16)
    with pytest.raises(PgenFormatError, match="provisional"):
        describe_pgen(p)
