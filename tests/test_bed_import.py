"""PLINK1 .bed/.bim/.fam -> pgen conversion (pipeline/bed_import.py).

The oracle is the inverse construction: build a .bed from known codes via
the inverse code map, convert, and require the .pgen to byte-match
formats/writer.write_pgen on the same codes."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli

from pgen_tpu.formats.writer import write_pgen
from pgen_tpu.pipeline.bed_import import BED_MAGIC, BedImportError, import_bed

# pgen code -> plink1 code (inverse of the converter's map)
_INV = {2: 0, 3: 1, 1: 2, 0: 3}


def _write_bed_fileset(d, codes, sep=b"\t"):
    """Build PREFIX.bed/.bim/.fam whose true genotypes are `codes`."""
    nv, ns = codes.shape
    rec = (ns + 3) // 4
    body = np.zeros((nv, rec), dtype=np.uint8)
    for v in range(nv):
        for s in range(ns):
            body[v, s >> 2] |= _INV[int(codes[v, s])] << ((s & 3) * 2)
    prefix = d / "x"
    with open(f"{prefix}.bed", "wb") as f:
        f.write(BED_MAGIC)
        f.write(body.tobytes())
    with open(f"{prefix}.bim", "wb") as f:
        for i in range(nv):
            f.write(sep.join([b"19", f"rs{i}".encode(), b"0", str(100 + i).encode(), b"G", b"A"]) + b"\n")
    with open(f"{prefix}.fam", "wb") as f:
        for i in range(ns):
            f.write(sep.join([b"fam0", f"s{i}".encode(), b"0", b"0", b"1", b"-9"]) + b"\n")
    return prefix


@pytest.mark.parametrize("ns", [1, 3, 4, 6, 17])
def test_bed_matches_write_pgen(tmp_path, ns):
    rng = np.random.default_rng(ns)
    codes = rng.integers(0, 4, size=(7, ns), dtype=np.uint8)
    prefix = _write_bed_fileset(tmp_path, codes)
    res = import_bed(f"{prefix}.bed", out_prefix=str(tmp_path / "out"))
    assert (res.num_variants, res.num_samples) == codes.shape
    ref = tmp_path / "ref.pgen"
    write_pgen(str(ref), codes)
    assert (tmp_path / "out.pgen").read_bytes() == ref.read_bytes()


def test_bed_pad_bits_are_canonical_zero(tmp_path):
    """plink1 zero pad bits would remap to code 2; converter must clear them."""
    codes = np.zeros((1, 5), dtype=np.uint8)  # 5 samples -> 6 pad bits
    prefix = _write_bed_fileset(tmp_path, codes)
    # poison the pad bits with plink1 hom-A2 (0b11) — still legal plink input
    raw = bytearray((prefix.parent / "x.bed").read_bytes())
    raw[-1] |= 0b11111100 & ~0b11  # set pad bits of the tail byte
    (prefix.parent / "x.bed").write_bytes(bytes(raw))
    import_bed(f"{prefix}.bed", out_prefix=str(tmp_path / "out"))
    ref = tmp_path / "ref.pgen"
    write_pgen(str(ref), codes)
    assert (tmp_path / "out.pgen").read_bytes() == ref.read_bytes()


def test_bim_fam_to_pvar_psam(tmp_path):
    codes = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    prefix = _write_bed_fileset(tmp_path, codes)
    import_bed(f"{prefix}.bed", out_prefix=str(tmp_path / "out"))
    pvar = (tmp_path / "out.pvar").read_text().splitlines()
    assert pvar[0] == "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    # A2 -> REF, A1 -> ALT, QUAL/FILTER/INFO filled with '.'
    assert pvar[1] == "19\t100\trs0\tA\tG\t.\t.\t."
    psam = (tmp_path / "out.psam").read_text().splitlines()
    assert psam[0] == "#FID\tIID\tPAT\tMAT\tSEX\tPHENO1"
    assert psam[1].split("\t")[1] == "s0"


def test_space_delimited_bim_fam(tmp_path):
    codes = np.array([[1, 2, 0]], dtype=np.uint8)
    prefix = _write_bed_fileset(tmp_path, codes, sep=b" ")
    import_bed(f"{prefix}.bed", out_prefix=str(tmp_path / "out"))
    assert "19\t100\trs0\tA\tG" in (tmp_path / "out.pvar").read_text()


def test_converted_fileset_filters_to_vcf(tmp_path):
    from pgen_tpu.pipeline.filter import filter_to_vcf

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(4, 6), dtype=np.uint8)
    prefix = _write_bed_fileset(tmp_path, codes)
    import_bed(f"{prefix}.bed", out_prefix=str(tmp_path / "out"))
    out = tmp_path / "o.vcf"
    filter_to_vcf(str(tmp_path / "out"), out_file=str(out))
    body = [r for r in out.read_text().splitlines() if not r.startswith("#")]
    assert len(body) == 4
    tok = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
    assert body[0].split("\t")[9:] == [tok[int(c)] for c in codes[0]]


def test_errors(tmp_path):
    codes = np.array([[0]], dtype=np.uint8)
    prefix = _write_bed_fileset(tmp_path, codes)
    # bad magic
    raw = bytearray((tmp_path / "x.bed").read_bytes())
    raw[0] = 0
    (tmp_path / "bad.bed").write_bytes(bytes(raw))
    (tmp_path / "bad.bim").write_bytes((tmp_path / "x.bim").read_bytes())
    (tmp_path / "bad.fam").write_bytes((tmp_path / "x.fam").read_bytes())
    with pytest.raises(BedImportError, match="magic"):
        import_bed(f"{tmp_path}/bad.bed")
    # sample-major
    raw = bytearray((tmp_path / "x.bed").read_bytes())
    raw[2] = 0
    (tmp_path / "bad.bed").write_bytes(bytes(raw))
    with pytest.raises(BedImportError, match="sample-major"):
        import_bed(f"{tmp_path}/bad.bed")
    # size mismatch
    (tmp_path / "bad.bed").write_bytes(BED_MAGIC + b"\x00\x00")
    with pytest.raises(BedImportError, match="size"):
        import_bed(f"{tmp_path}/bad.bed")
    # ragged bim
    (tmp_path / "bad.bed").write_bytes((tmp_path / "x.bed").read_bytes())
    (tmp_path / "bad.bim").write_bytes(b"19 rs0 0 100 G\n")
    with pytest.raises(BedImportError, match=".bim row 1"):
        import_bed(f"{tmp_path}/bad.bed")


def test_cli_bed_import_roundtrip_with_vcf(tmp_path, capsys):
    """bed -> pgen -> vcf -> pgen: both pgens byte-identical."""
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=(6, 5), dtype=np.uint8)
    prefix = _write_bed_fileset(tmp_path, codes)
    assert run_cli(["import", f"{prefix}.bed", "-o", str(tmp_path / "p1")]) == 0
    assert run_cli(["filter", str(tmp_path / "p1"), "-o", str(tmp_path / "v.vcf")]) == 0
    assert run_cli(["import", str(tmp_path / "v.vcf"), "-o", str(tmp_path / "p2")]) == 0
    assert (tmp_path / "p1.pgen").read_bytes() == (tmp_path / "p2.pgen").read_bytes()


class TestBedExport:
    """filter --out-format bed (filter_to_bed): the export twin."""

    def test_roundtrip_pgen_to_bed_to_pgen(self, tiny_fileset, tmp_path):
        from pgen_tpu.pipeline.bed_import import filter_to_bed

        prefix, codes = tiny_fileset
        filter_to_bed(prefix, out_prefix=str(tmp_path / "e"))
        import_bed(f"{tmp_path}/e.bed", out_prefix=str(tmp_path / "back"))
        assert (tmp_path / "back.pgen").read_bytes() == open(
            f"{prefix}.pgen", "rb"
        ).read()
        # bim carries ALT as A1, REF as A2; fam maps M/F -> 1/2
        bim = (tmp_path / "e.bim").read_text().splitlines()
        assert bim[0].split("\t") == ["1", "rs0", "0", "100", "G", "A"]
        fam = (tmp_path / "e.fam").read_text().splitlines()
        assert fam[0].split("\t") == ["0", "s0", "0", "0", "1", "-9"]
        assert fam[1].split("\t")[4] == "2"  # s1 is F

    def test_export_pad_bits_zero(self, tiny_fileset, tmp_path):
        from pgen_tpu.pipeline.bed_import import filter_to_bed

        prefix, codes = tiny_fileset  # 6 samples -> 4 pad bits
        filter_to_bed(prefix, out_prefix=str(tmp_path / "e"))
        body = np.frombuffer((tmp_path / "e.bed").read_bytes()[3:], dtype=np.uint8)
        rec = (6 + 3) // 4
        tail = body.reshape(-1, rec)[:, -1]
        assert not np.any(tail & 0b11110000)  # plink zero padding

    def test_export_with_predicates(self, tiny_fileset, tmp_path):
        from pgen_tpu.pipeline.bed_import import filter_to_bed

        prefix, codes = tiny_fileset
        filter_to_bed(
            prefix,
            var_query='num(POS) >= 102',
            sam_query='SEX=="M"',
            out_prefix=str(tmp_path / "e"),
        )
        import_bed(f"{tmp_path}/e.bed", out_prefix=str(tmp_path / "back"))
        from pgen_tpu.ops.unpack import unpack_codes_reference

        raw = (tmp_path / "back.pgen").read_bytes()
        got = unpack_codes_reference(
            np.frombuffer(raw[12:], dtype=np.uint8).reshape(3, -1), 3
        )
        assert np.array_equal(got, codes[2:, 0::2])  # POS>=102, M = s0,s2,s4

    def test_cli_bed_export(self, tiny_fileset, tmp_path):
        from tests.cli_helpers import run_cli

        prefix, _ = tiny_fileset
        rc = run_cli(
            ["filter", prefix, "--out-format", "bed", "-o", str(tmp_path / "x"), "--stats"]
        )
        assert rc == 0
        assert (tmp_path / "x.bed").read_bytes()[:3] == BED_MAGIC
        rc = run_cli(["filter", prefix, "--out-format", "bed", "-o", str(tmp_path / "y"), "--index"])
        assert rc == 1  # --index is VCF-only
