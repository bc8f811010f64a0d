"""BGZF (.vcf.gz) output: bcftools/tabix-compatible blocked gzip."""

import gzip

import numpy as np
import pytest

from pgen_tpu.pipeline.filter import filter_to_vcf

from oracle import scalar_filter_vcf


def test_gz_output_roundtrip(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    plain = tmp_path / "p.vcf"
    gzout = tmp_path / "p.vcf.gz"
    filter_to_vcf(prefix, var_query='REF == "A"', out_file=plain)
    filter_to_vcf(prefix, var_query='REF == "A"', out_file=gzout)
    decompressed = gzip.decompress(gzout.read_bytes())
    assert decompressed == plain.read_bytes()
    assert decompressed == scalar_filter_vcf(prefix, lambda v: v["REF"] == "A", None)


def test_gz_block_structure(tiny_fileset, tmp_path):
    """Each member must carry the BC extra field and end with the 28-byte
    BGZF EOF block (random-access contract)."""
    prefix, _ = tiny_fileset
    gzout = tmp_path / "b.vcf.gz"
    filter_to_vcf(prefix, out_file=gzout)
    raw = gzout.read_bytes()
    assert raw[:4] == b"\x1f\x8b\x08\x04"  # gzip + FEXTRA
    assert raw[12:14] == b"BC"
    from pgen_tpu.pipeline.filter import BGZF_EOF

    assert raw.endswith(BGZF_EOF)


def test_gz_large_multiblock(tmp_path):
    """Output > one 65280-byte block decompresses intact."""
    from conftest import build_fileset

    rng = np.random.default_rng(9)
    nvar, nsamp = 300, 200  # ~240KB of VCF body
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "big",
        codes,
        [f"1\t{i}\tr{i}\tA\tC\t.\t.\t." for i in range(nvar)],
        [f"s{i}\tM" for i in range(nsamp)],
    )
    plain = tmp_path / "x.vcf"
    gzout = tmp_path / "x.vcf.gz"
    filter_to_vcf(prefix, out_file=plain)
    filter_to_vcf(prefix, out_file=gzout)
    assert gzip.decompress(gzout.read_bytes()) == plain.read_bytes()
    # more than one BGZF block was produced
    assert gzout.read_bytes().count(b"\x1f\x8b\x08\x04") > 2


def test_gz_shared_file_shard_rejected(tiny_fileset, tmp_path):
    # pwriting compressed shards at precomputed offsets is impossible; only
    # the standalone/sequential modes may compress
    from pgen_tpu.parallel.shard import filter_to_vcf_sharded

    prefix, _ = tiny_fileset
    with pytest.raises(ValueError, match="shared"):
        filter_to_vcf_sharded(
            prefix, out_file=tmp_path / "x.vcf.gz", num_shards=2, shard_index=1
        )


def test_gz_sequential_sharded_matches_unsharded(tiny_fileset, tmp_path):
    from pgen_tpu.parallel.shard import filter_to_vcf_sharded

    prefix, _ = tiny_fileset
    plain = tmp_path / "p.vcf"
    gzout = tmp_path / "p.vcf.gz"
    filter_to_vcf(prefix, var_query='REF == "A"', out_file=plain)
    filter_to_vcf_sharded(
        prefix, var_query='REF == "A"', out_file=gzout, num_shards=3
    )
    assert gzip.decompress(gzout.read_bytes()) == plain.read_bytes()


def test_gz_parallel_workers_match_unsharded(tmp_path):
    """--workers N -o out.vcf.gz: standalone BGZF shard parts concatenate to
    a file that decompresses byte-equal to the unsharded run."""
    from conftest import build_fileset
    from pgen_tpu.parallel.shard import filter_to_vcf_parallel
    from pgen_tpu.pipeline.filter import BGZF_EOF

    rng = np.random.default_rng(11)
    nvar, nsamp = 257, 61
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "pw",
        codes,
        [f"1\t{i}\tr{i}\tA\tC\t.\t.\t." for i in range(nvar)],
        [f"s{i}\tM" for i in range(nsamp)],
    )
    plain = tmp_path / "w.vcf"
    gzout = tmp_path / "w.vcf.gz"
    filter_to_vcf(prefix, out_file=plain)
    res = filter_to_vcf_parallel(prefix, out_file=str(gzout), num_workers=3)
    raw = gzout.read_bytes()
    assert gzip.decompress(raw) == plain.read_bytes()
    assert raw.endswith(BGZF_EOF)
    assert res.num_variants_kept == nvar
    # no leftover shard parts or manifest
    assert not list(tmp_path.glob("*.part"))
    assert not list(tmp_path.glob("*.manifest.json"))


def test_native_bgzf_decompress_matches_gzip(tmp_path, tiny_fileset):
    """The parallel BGZF decoder (import input path) inverts our writer and
    agrees with the gzip module; non-BGZF streams return None (fallback)."""
    from pgen_tpu.native import HAVE_NATIVE, native

    if not HAVE_NATIVE or not getattr(native, "has_bgzf_decompress", False):
        pytest.skip("native bgzf decoder unavailable")
    prefix, _ = tiny_fileset
    gz = tmp_path / "d.vcf.gz"
    filter_to_vcf(prefix, out_file=str(gz))
    comp = np.fromfile(gz, dtype=np.uint8)
    out = native.bgzf_decompress(comp)
    assert out is not None
    assert out.tobytes() == gzip.decompress(comp.tobytes())
    # multi-member: concatenated BGZF streams decode as one
    comp2 = np.concatenate([comp, comp])
    out2 = native.bgzf_decompress(comp2)
    assert out2.tobytes() == out.tobytes() * 2
    # generic (non-BGZF) gzip lacks the BC extra field -> None
    plain_gz = np.frombuffer(gzip.compress(b"hello world"), dtype=np.uint8)
    assert native.bgzf_decompress(plain_gz) is None
    # corruption inside a member payload -> None (per-member CRC32 check),
    # never silently-wrong bytes. Flip a byte inside the first member's
    # deflate payload (past the 18-byte header, before its 8-byte tail).
    bad = comp.copy()
    bad[24] ^= 0xFF
    assert native.bgzf_decompress(bad) is None


def test_sink_pipeline_overlap_byte_identical(tmp_path, monkeypatch):
    """The gated 1-deep emit/sink overlap (multi-core hosts) must produce
    byte-identical .vcf.gz output to the inline sink path."""
    import numpy as np

    from conftest import build_fileset
    from pgen_tpu.pipeline.filter import filter_to_vcf

    rng = np.random.default_rng(31)
    codes = rng.integers(0, 4, size=(300, 11), dtype=np.uint8)
    pvar_rows = [f"1\t{100 + i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(300)]
    prefix = build_fileset(
        tmp_path, "ov", codes, pvar_rows, [f"s{i}\tM" for i in range(11)]
    )
    a, b = tmp_path / "a.vcf.gz", tmp_path / "b.vcf.gz"
    monkeypatch.delenv("PGEN_TPU_SINK_PIPELINE", raising=False)
    filter_to_vcf(prefix, out_file=a, block_variants=64)
    monkeypatch.setenv("PGEN_TPU_SINK_PIPELINE", "1")
    filter_to_vcf(prefix, out_file=b, block_variants=64)
    assert a.read_bytes() == b.read_bytes()
