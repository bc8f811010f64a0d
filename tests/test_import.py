"""VCF -> PGEN import (pipeline/vcf_import.py).

The reference has no VCF input at all (pgen -> VCF only,
/root/reference/src/pfile.rs:104-194); import is the beyond-parity reverse
direction. The load-bearing invariant is the ROUND TRIP: `filter` keep-all
output re-imported must reproduce the original .pgen bytes, the .pvar data
rows, and the psam IID order exactly.
"""

import gzip

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.pipeline.filter import filter_to_vcf
from pgen_tpu.pipeline.vcf_import import VcfImportError, import_vcf

PROVIDERS = ["numpy", "native", "device"]


def _roundtrip(prefix, tmp_path, provider, **imp_kwargs):
    if provider == "native":
        from pgen_tpu.native import HAVE_NATIVE

        if not HAVE_NATIVE:
            pytest.skip("native helper unavailable (PGEN_TPU_NO_NATIVE)")
    tmp_path.mkdir(parents=True, exist_ok=True)
    vcf = tmp_path / "rt.vcf"
    filter_to_vcf(prefix, out_file=str(vcf))
    out = tmp_path / "rt_out"
    res = import_vcf(str(vcf), out_prefix=str(out), provider=provider, **imp_kwargs)
    return res, out


@pytest.mark.parametrize("provider", PROVIDERS)
def test_roundtrip_pgen_bytes_identical(tiny_fileset, tmp_path, provider):
    prefix, codes = tiny_fileset
    res, out = _roundtrip(prefix, tmp_path, provider)
    assert res.num_variants == codes.shape[0]
    assert res.num_samples == codes.shape[1]
    orig = open(f"{prefix}.pgen", "rb").read()
    assert open(f"{out}.pgen", "rb").read() == orig


def test_roundtrip_pvar_rows_and_psam(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    _, out = _roundtrip(prefix, tmp_path, "numpy")

    def rows(p):
        return [
            line
            for line in open(p, "rb").read().split(b"\n")
            if line and not line.startswith(b"#")
        ]

    assert rows(f"{out}.pvar") == rows(f"{prefix}.pvar")
    # psam keeps the IID column (other columns don't exist in a VCF)
    orig_iids = [r.split(b"\t")[0] for r in rows(f"{prefix}.psam")]
    assert rows(f"{out}.psam") == orig_iids
    # ## comment lines pass through verbatim (the emitter's own two lines
    # plus the original pvar comments)
    comments = [
        line
        for line in open(f"{out}.pvar", "rb").read().split(b"\n")
        if line.startswith(b"##")
    ]
    assert b"##fileformat=VCFv4.2" in comments
    assert b"##source=test" in comments


def test_providers_agree(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    outs = {}
    for p in PROVIDERS:
        _, out = _roundtrip(prefix, tmp_path / p, p)
        outs[p] = open(f"{out}.pgen", "rb").read()
    assert outs["numpy"] == outs["native"] == outs["device"]


def test_chunked_equals_single_chunk(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    _, one = _roundtrip(prefix, tmp_path / "one", "numpy")
    # tiny chunks force many newline-aligned chunk boundaries
    _, many = _roundtrip(prefix, tmp_path / "many", "numpy", chunk_bytes=48)
    assert open(f"{one}.pgen", "rb").read() == open(f"{many}.pgen", "rb").read()
    assert open(f"{one}.pvar", "rb").read() == open(f"{many}.pvar", "rb").read()


def _write_vcf(path, body_rows, samples=("s0", "s1"), comments="##fileformat=VCFv4.2\n"):
    cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(samples)
    with open(path, "w") as f:
        f.write(comments)
        f.write(cols + "\n")
        f.writelines(r + "\n" for r in body_rows)
    return str(path)


def test_format_subfields_phased_and_missing(tmp_path):
    vcf = _write_vcf(
        tmp_path / "x.vcf",
        [
            "1\t100\trs0\tA\tG\t.\tPASS\t.\tGT:DP\t0/1:13\t1|1:7",
            "1\t101\trs1\tA\tG\t.\tPASS\t.\tGT\t./.\t.",
            "1\t102\trs2\tA\tG\t.\tPASS\t.\tGT:AD\t0|0:1,2\t1/0:3,4",
        ],
    )
    res = import_vcf(vcf, out_prefix=str(tmp_path / "x"))
    from pgen_tpu.ops.unpack import unpack_codes_reference

    raw = open(f"{tmp_path}/x.pgen", "rb").read()
    codes = unpack_codes_reference(
        np.frombuffer(raw[12:], dtype=np.uint8).reshape(res.num_variants, -1), 2
    )
    assert codes.tolist() == [[1, 2], [3, 3], [0, 1]]


def test_gzip_input_roundtrip(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    vcf = tmp_path / "rt.vcf"
    filter_to_vcf(prefix, out_file=str(vcf))
    gz = tmp_path / "rt.vcf.gz"
    gz.write_bytes(gzip.compress(vcf.read_bytes()))
    res = import_vcf(str(gz))  # default out prefix strips .vcf.gz
    assert res.out_prefix == str(tmp_path / "rt")
    assert open(f"{tmp_path}/rt.pgen", "rb").read() == open(f"{prefix}.pgen", "rb").read()


def test_bgzf_output_roundtrip(tiny_fileset, tmp_path):
    pytest.importorskip("ctypes")
    from pgen_tpu.native import HAVE_NATIVE

    if not HAVE_NATIVE:
        pytest.skip("bgzf output needs the native helper")
    prefix, _ = tiny_fileset
    gz = tmp_path / "rt.vcf.gz"
    filter_to_vcf(prefix, out_file=str(gz))
    res = import_vcf(str(gz), out_prefix=str(tmp_path / "rt"))
    assert res.num_variants == 5
    assert open(f"{tmp_path}/rt.pgen", "rb").read() == open(f"{prefix}.pgen", "rb").read()


def test_error_multiallelic_gt_names_row_and_sample(tmp_path):
    vcf = _write_vcf(
        tmp_path / "bad.vcf",
        [
            "1\t100\trs0\tA\tG\t.\tPASS\t.\tGT\t0/0\t0/1",
            "1\t101\trs1\tA\tG,C\t.\tPASS\t.\tGT\t2/0\t0/0",
        ],
    )
    with pytest.raises(VcfImportError, match=r"row 2.*sample 1.*'2/0'"):
        import_vcf(vcf, out_prefix=str(tmp_path / "bad"))


def test_error_format_without_gt(tmp_path):
    vcf = _write_vcf(
        tmp_path / "bad.vcf", ["1\t100\trs0\tA\tG\t.\tPASS\t.\tDP\t3\t4"]
    )
    with pytest.raises(VcfImportError, match="FORMAT does not begin with GT"):
        import_vcf(vcf, out_prefix=str(tmp_path / "bad"))


def test_error_ragged_row(tmp_path):
    vcf = _write_vcf(
        tmp_path / "bad.vcf",
        [
            "1\t100\trs0\tA\tG\t.\tPASS\t.\tGT\t0/0\t0/1",
            "1\t101\trs1\tA\tG\t.\tPASS\t.\tGT\t0/0",
        ],
    )
    with pytest.raises(VcfImportError, match="row 2"):
        import_vcf(vcf, out_prefix=str(tmp_path / "bad"))


def test_error_no_samples(tmp_path):
    p = tmp_path / "s.vcf"
    p.write_text(
        "##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\n"
        "1\t1\t.\tA\tG\t.\t.\t.\tGT\n"
    )
    with pytest.raises(VcfImportError, match="no sample columns"):
        import_vcf(str(p))
    # sites-only VCF (no FORMAT at all) is also rejected, at the header
    p2 = tmp_path / "s2.vcf"
    p2.write_text("##x\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n1\t1\t.\tA\tG\t.\t.\t.\n")
    with pytest.raises(VcfImportError, match="unsupported column layout"):
        import_vcf(str(p2))


def test_error_no_column_header(tmp_path):
    p = tmp_path / "h.vcf"
    p.write_text("1\t1\t.\tA\tG\t.\t.\t.\tGT\t0/0\n")
    with pytest.raises(VcfImportError, match="no #CHROM"):
        import_vcf(str(p))


def test_cli_import_roundtrip(tiny_fileset, tmp_path, capsys):
    prefix, _ = tiny_fileset
    vcf = tmp_path / "c.vcf"
    filter_to_vcf(prefix, out_file=str(vcf))
    rc = run_cli(["import", str(vcf), "-o", str(tmp_path / "c"), "--stats"])
    assert rc == 0
    assert open(f"{tmp_path}/c.pgen", "rb").read() == open(f"{prefix}.pgen", "rb").read()
    # imported fileset is directly queryable
    rc = run_cli(["query", str(tmp_path / "c"), "-f", "POS"])
    assert rc == 0
    assert capsys.readouterr().out.splitlines() == [str(100 + i) for i in range(5)]


def test_import_then_filter_vcf_stable(tiny_fileset, tmp_path):
    """pgen -> vcf -> pgen -> vcf is a fixed point (minus the comment lines
    the emitter itself prepends)."""
    prefix, _ = tiny_fileset
    v1 = tmp_path / "v1.vcf"
    filter_to_vcf(prefix, out_file=str(v1))
    import_vcf(str(v1), out_prefix=str(tmp_path / "p2"))
    v2 = tmp_path / "v2.vcf"
    filter_to_vcf(str(tmp_path / "p2"), out_file=str(v2))

    def body(p):
        return [r for r in open(p, "rb").read().split(b"\n") if r and not r.startswith(b"#")]

    assert body(v1) == body(v2)


def test_missing_trailing_newline(tmp_path):
    vcf = _write_vcf(
        tmp_path / "t.vcf", ["1\t100\trs0\tA\tG\t.\tPASS\t.\tGT\t0/0\t1/1"]
    )
    raw = open(vcf, "rb").read()
    open(vcf, "wb").write(raw.rstrip(b"\n"))
    res = import_vcf(vcf, out_prefix=str(tmp_path / "t"))
    assert res.num_variants == 1


def test_fuzz_roundtrip_random_matrices(tmp_path):
    rng = np.random.default_rng(123)
    for trial in range(4):
        nv = int(rng.integers(1, 40))
        ns = int(rng.integers(1, 30))
        codes = rng.integers(0, 4, size=(nv, ns), dtype=np.uint8)
        pvar_rows = [
            f"{rng.integers(1, 23)}\t{int(p)}\tv{trial}_{i}\tA\tG\t.\tPASS\tAC={i}"
            for i, p in enumerate(sorted(rng.integers(1, 10**9, size=nv)))
        ]
        psam_rows = [f"z{i}\tM" for i in range(ns)]
        d = tmp_path / f"f{trial}"
        d.mkdir()
        prefix = build_fileset(d, "f", codes, pvar_rows, psam_rows)
        _, out = _roundtrip(prefix, tmp_path / f"o{trial}", "numpy")
        assert open(f"{out}.pgen", "rb").read() == open(f"{prefix}.pgen", "rb").read()


def test_fuzz_parser_agreement_on_malformed_gt(tmp_path):
    """Differential fuzz: the native single-pass parser and the vectorized
    numpy parser must agree on accept/reject AND on the imported bytes for
    every row, across adversarial GT-ish tokens."""
    from pgen_tpu.native import HAVE_NATIVE

    if not HAVE_NATIVE:
        pytest.skip("needs both parsers")
    import random

    rng = random.Random(77)
    tokens = [
        "0/0", "0/1", "1/0", "1/1", "./.", ".", "0|1", "1|.", "./0",
        "0/2", "2/0", "00/1", "0/", "/1", "0:1", "0/1x", "", "0/1:9,2",
        ".:Z", "1|1:.:.", "0\\0", "|", "0//1",
    ]
    for trial in range(60):
        n_sam = rng.randint(1, 4)
        rows = []
        for r in range(rng.randint(1, 5)):
            fmt = rng.choice(["GT", "GT:DP"])
            fields = [rng.choice(tokens) for _ in range(n_sam)]
            rows.append(
                f"1\t{100+r}\trs{r}\tA\tG\t.\t.\t.\t{fmt}\t" + "\t".join(fields)
            )
        vcf = _write_vcf(tmp_path / f"f{trial}.vcf", rows, samples=[f"s{i}" for i in range(n_sam)])
        outcomes = {}
        for prov in ("native", "numpy"):
            out = tmp_path / f"o{trial}_{prov}"
            try:
                import_vcf(vcf, out_prefix=str(out), provider=prov)
                outcomes[prov] = ("ok", (tmp_path / f"o{trial}_{prov}.pgen").read_bytes()[12:])
            except VcfImportError as e:
                # row number must agree; message text may differ
                row = str(e).split("data row ")[1].split(":")[0]
                outcomes[prov] = ("err", row)
        assert outcomes["native"][0] == outcomes["numpy"][0], (trial, rows, outcomes)
        assert outcomes["native"][1] == outcomes["numpy"][1], (trial, rows, outcomes)
