"""pgen-tpu concat (pipeline/concat.py).

Load-bearing invariant: splitting a fileset by variant ranges (via
`filter --out-format pgen` with region predicates) and concatenating the
parts reproduces the original .pgen bytes and .pvar data rows exactly."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli

from pgen_tpu.pipeline.concat import ConcatError, concat_pgen
from pgen_tpu.pipeline.pgen_out import filter_to_pgen


def _split(prefix, tmp_path, cut):
    a = tmp_path / "a"
    b = tmp_path / "b"
    filter_to_pgen(prefix, var_query=f"num(POS) < {cut}", out_prefix=str(a))
    filter_to_pgen(prefix, var_query=f"num(POS) >= {cut}", out_prefix=str(b))
    return str(a), str(b)


def test_split_concat_roundtrip(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    a, b = _split(prefix, tmp_path, 102)  # POS 100..104 -> [100,101] + [102..104]
    res = concat_pgen([a, b], str(tmp_path / "cat"))
    assert res.num_variants == codes.shape[0]
    assert (tmp_path / "cat.pgen").read_bytes() == open(f"{prefix}.pgen", "rb").read()

    def rows(p):
        return [
            r for r in open(p, "rb").read().split(b"\n") if r and not r.startswith(b"#")
        ]

    assert rows(f"{tmp_path}/cat.pvar") == rows(f"{prefix}.pvar")
    assert (tmp_path / "cat.psam").read_bytes() == open(f"{prefix}.psam", "rb").read()


def test_concat_three_and_empty_middle(tiny_fileset, tmp_path):
    prefix, codes = tiny_fileset
    a = tmp_path / "a"
    e = tmp_path / "e"
    c = tmp_path / "c"
    filter_to_pgen(prefix, var_query='POS=="100"', out_prefix=str(a))
    filter_to_pgen(prefix, var_query='POS=="nope"', out_prefix=str(e))  # empty
    filter_to_pgen(prefix, var_query='POS!="100"', out_prefix=str(c))
    res = concat_pgen([str(a), str(e), str(c)], str(tmp_path / "cat"))
    assert res.num_variants == codes.shape[0]
    assert (tmp_path / "cat.pgen").read_bytes() == open(f"{prefix}.pgen", "rb").read()


def test_concat_single_input_copies(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    concat_pgen([prefix], str(tmp_path / "one"))
    assert (tmp_path / "one.pgen").read_bytes() == open(f"{prefix}.pgen", "rb").read()


def test_concat_rejects_mismatched_samples(tiny_fileset, tmp_path):
    from tests.conftest import build_fileset

    prefix, _ = tiny_fileset
    other = build_fileset(
        tmp_path,
        "other",
        np.zeros((2, 3), dtype=np.uint8),
        ["1\t1\ta\tA\tG\t.\t.\t.", "1\t2\tb\tA\tG\t.\t.\t."],
        ["x0\tM", "x1\tF", "x2\tM"],
    )
    with pytest.raises(ConcatError, match="samples"):
        concat_pgen([prefix, other], str(tmp_path / "bad"))


def test_concat_rejects_mismatched_iids(tiny_fileset, tmp_path):
    from tests.conftest import build_fileset

    prefix, codes = tiny_fileset
    other = build_fileset(
        tmp_path,
        "other",
        np.zeros((1, codes.shape[1]), dtype=np.uint8),
        ["1\t1\ta\tA\tG\t.\t.\t."],
        [f"DIFFERENT{i}\tM" for i in range(codes.shape[1])],
    )
    with pytest.raises(ConcatError, match="IID"):
        concat_pgen([prefix, other], str(tmp_path / "bad"))


def test_cli_concat_then_filter_matches_direct(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    a, b = _split(prefix, tmp_path, 103)
    assert run_cli(["concat", a, b, "-o", str(tmp_path / "cat"), "--stats"]) == 0
    v1 = tmp_path / "v1.vcf"
    v2 = tmp_path / "v2.vcf"
    assert run_cli(["filter", str(tmp_path / "cat"), "-o", str(v1)]) == 0
    assert run_cli(["filter", prefix, "-o", str(v2)]) == 0
    # identical body; header comments may differ only by pvar passthrough
    body = lambda p: [r for r in p.read_bytes().split(b"\n") if r and not r.startswith(b"#")]
    assert body(v1) == body(v2)
