"""`split`: one fileset -> many (pipeline/split.py), the inverse of
`concat`. Pins: --parts round-trips through concat byte-exactly,
--by-chrom groups by first appearance with byte-exact metadata, psam
passthrough, and the CLI wiring."""

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset

from pgen_tpu.pipeline.concat import concat_pgen
from pgen_tpu.pipeline.split import split_pgen


@pytest.fixture()
def multi_chrom(tmp_path):
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=(9, 5), dtype=np.uint8)
    chroms = ["1", "1", "2", "2", "2", "X", "1", "X", "3"]
    pvar_rows = [
        f"{chroms[i]}\t{100 + i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(9)
    ]
    psam_rows = [f"s{i}\tM" for i in range(5)]
    prefix = build_fileset(tmp_path, "mc", codes, pvar_rows, psam_rows)
    return prefix, codes, chroms


def test_parts_concat_round_trip(multi_chrom, tmp_path):
    prefix, codes, _ = multi_chrom
    res = split_pgen(prefix, str(tmp_path / "p"), parts=3)
    assert len(res.out_prefixes) == 3
    concat_pgen(res.out_prefixes, str(tmp_path / "joined"))
    for ext in (".pgen", ".pvar", ".psam"):
        orig = open(f"{prefix}{ext}", "rb").read()
        back = open(str(tmp_path / "joined") + ext, "rb").read()
        assert back == orig, ext


def test_by_chrom_groups(multi_chrom, tmp_path):
    prefix, codes, chroms = multi_chrom
    res = split_pgen(prefix, str(tmp_path / "c"), by_chrom=True)
    # first-appearance order: 1, 2, X, 3
    names = [p.rsplit(".", 1)[-1] for p in res.out_prefixes]
    assert names == ["1", "2", "X", "3"]
    from pgen_tpu.formats.header import read_pgen_header
    from pgen_tpu.ops.unpack import unpack_codes_reference

    for name, chrom in zip(res.out_prefixes, names):
        idx = [i for i, c in enumerate(chroms) if c == chrom]
        h = read_pgen_header(f"{name}.pgen")
        assert h.num_variants == len(idx)
        assert h.num_samples == 5
        mm = np.fromfile(f"{name}.pgen", dtype=np.uint8)[12:]
        got = unpack_codes_reference(mm.reshape(len(idx), h.record_size), 5)
        np.testing.assert_array_equal(got, codes[idx])
        pvar_lines = [
            ln
            for ln in open(f"{name}.pvar").read().splitlines()
            if not ln.startswith("#")
        ]
        assert [ln.split("\t")[0] for ln in pvar_lines] == [chrom] * len(idx)
        assert open(f"{name}.psam", "rb").read() == open(f"{prefix}.psam", "rb").read()


def test_by_chrom_sanitizes_names(tmp_path):
    codes = np.zeros((2, 3), dtype=np.uint8)
    pvar_rows = [
        "HLA-A*01:01\t5\trs0\tA\tG\t.\t.\t.",
        "1\t6\trs1\tA\tG\t.\t.\t.",
    ]
    prefix = build_fileset(
        tmp_path, "hla", codes, pvar_rows, [f"s{i}\tF" for i in range(3)]
    )
    res = split_pgen(prefix, str(tmp_path / "h"), by_chrom=True)
    assert res.out_prefixes[0].endswith("HLA-A_01_01")


def test_mode_required(multi_chrom, tmp_path):
    prefix, _, _ = multi_chrom
    with pytest.raises(ValueError, match="exactly one"):
        split_pgen(prefix, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="parts"):
        split_pgen(prefix, str(tmp_path / "x"), parts=0)


def test_cli_split_and_filter_one_part(multi_chrom, tmp_path, capsys):
    prefix, codes, chroms = multi_chrom
    rc = run_cli(["split", prefix, "--parts", "2", "-o", str(tmp_path / "s")])
    assert rc == 0
    assert "2 filesets" in capsys.readouterr().err
    # each part is a valid fileset: filter it straight to VCF
    out = tmp_path / "part1.vcf"
    assert run_cli(["filter", str(tmp_path / "s.part1"), "-o", str(out)]) == 0
    body = [
        ln
        for ln in out.read_bytes().split(b"\n")
        if ln and not ln.startswith(b"#")
    ]
    assert len(body) == 4  # linspace split of 9 -> 4 + 5
