"""pgen-tpu merge (pipeline/merge.py): sample-axis cohort join.

Load-bearing invariant: splitting a fileset into sample cohorts (via
`filter --out-format pgen --include-sam`) and merging the parts back
reproduces the original .pgen bytes — exercising the bit-level splice
through unpack -> hstack -> pack at non-multiple-of-4 widths."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.pipeline.merge import MergeError, merge_pgen
from pgen_tpu.pipeline.pgen_out import filter_to_pgen


def _cohort_split(prefix, tmp_path, expr_a, expr_b):
    a = tmp_path / "a"
    b = tmp_path / "b"
    filter_to_pgen(prefix, sam_query=expr_a, out_prefix=str(a))
    filter_to_pgen(prefix, sam_query=expr_b, out_prefix=str(b))
    return str(a), str(b)


def test_split_merge_roundtrip(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset  # 6 samples: s0..s5
    # 3 + 3 split: neither cohort is a multiple of 4 -> bit-level splice
    a, b = _cohort_split(
        prefix, tmp_path,
        'IID=="s0" || IID=="s1" || IID=="s2"',
        'IID=="s3" || IID=="s4" || IID=="s5"',
    )
    res = merge_pgen([a, b], str(tmp_path / "m"))
    assert (res.num_variants, res.num_samples) == codes.shape
    assert (tmp_path / "m.pgen").read_bytes() == open(f"{prefix}.pgen", "rb").read()
    assert (tmp_path / "m.pvar").read_bytes() == open(f"{prefix}.pvar", "rb").read()
    # psam: same schema -> concatenated data rows under the shared header
    psam = (tmp_path / "m.psam").read_text().splitlines()
    assert [r.split("\t")[0] for r in psam[1:]] == [f"s{i}" for i in range(6)]


@pytest.mark.parametrize("widths", [(1, 1), (1, 4), (5, 3), (4, 4, 4)])
def test_merge_widths(tmp_path, widths):
    rng = np.random.default_rng(sum(widths))
    nv = 11
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\t.\t." for i in range(nv)]
    parts = []
    all_codes = []
    base = 0
    for w in widths:
        codes = rng.integers(0, 4, size=(nv, w), dtype=np.uint8)
        d = tmp_path / f"w{base}"
        d.mkdir()
        parts.append(
            build_fileset(
                d, "p", codes, pvar_rows, [f"q{base + i}\tM" for i in range(w)]
            )
        )
        all_codes.append(codes)
        base += w
    merge_pgen(parts, str(tmp_path / "m"))
    from pgen_tpu.formats.writer import write_pgen

    ref = tmp_path / "ref.pgen"
    write_pgen(str(ref), np.hstack(all_codes))
    assert (tmp_path / "m.pgen").read_bytes() == ref.read_bytes()


def test_merge_rejects_mismatched_variants(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    other = build_fileset(
        tmp_path,
        "o",
        np.zeros((codes.shape[0], 2), dtype=np.uint8),
        [f"2\t{200+i}\tx{i}\tA\tC\t.\t.\t." for i in range(codes.shape[0])],
        ["q0\tM", "q1\tM"],
    )
    with pytest.raises(MergeError, match="variant rows differ"):
        merge_pgen([prefix, other], str(tmp_path / "bad"))


def test_merge_rejects_duplicate_iids(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    with pytest.raises(MergeError, match="duplicate sample IID"):
        merge_pgen([prefix, prefix], str(tmp_path / "bad"))


def test_merge_heterogeneous_psam_schemas(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset  # psam columns: #IID SEX
    nv = codes.shape[0]
    other = build_fileset(
        tmp_path,
        "o",
        np.zeros((nv, 2), dtype=np.uint8),
        [f"1\t{100+i}\trs{i}\tA\tG\t100\tPASS\tAF=0.{i}" for i in range(nv)],
        ["q0", "q1"],
        psam_columns="#IID",
    )
    merge_pgen([prefix, other], str(tmp_path / "m"))
    psam = (tmp_path / "m.psam").read_text().splitlines()
    assert psam[0] == "#IID"
    assert psam[1:] == [f"s{i}" for i in range(6)] + ["q0", "q1"]


def test_cli_merge_then_filter(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    a, b = _cohort_split(prefix, tmp_path, 'SEX=="M"', 'SEX=="F"')
    assert run_cli(["merge", a, b, "-o", str(tmp_path / "m"), "--stats"]) == 0
    v = tmp_path / "v.vcf"
    assert run_cli(["filter", str(tmp_path / "m"), "-o", str(v)]) == 0
    header = next(
        line for line in v.read_text().splitlines() if line.startswith("#CHROM")
    )
    # M cohort (s0,s2,s4) then F cohort (s1,s3,s5): merge order is argument order
    assert header.split("\t")[9:] == ["s0", "s2", "s4", "s1", "s3", "s5"]
