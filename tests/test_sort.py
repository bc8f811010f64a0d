"""`sort` subcommand: chromosomal ordering of a fileset (pipeline/sort.py)."""

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.pipeline.sort import sort_pgen, sort_permutation


def _fileset(tmp_path, rows, codes=None, comments="##fileformat=VCFv4.2\n"):
    if codes is None:
        codes = np.arange(len(rows) * 3, dtype=np.uint8).reshape(len(rows), 3) % 4
    return (
        build_fileset(
            tmp_path,
            "srt",
            codes,
            rows,
            [f"s{i}\tM" for i in range(codes.shape[1])],
            pvar_comments=comments,
        ),
        codes,
    )


def _ids(prefix):
    return read_metadata(f"{prefix}.pvar").get_column_strs("ID")


def test_sort_natural_chrom_order_and_pos(tmp_path):
    rows = [
        "chr10\t5\ta\tA\tG\t.\t.\t.",
        "chr2\t9\tb\tA\tG\t.\t.\t.",
        "X\t1\tc\tA\tG\t.\t.\t.",
        "chr2\t3\td\tA\tG\t.\t.\t.",
        "MT\t7\te\tA\tG\t.\t.\t.",
        "Y\t2\tf\tA\tG\t.\t.\t.",
        "foo\t1\tg\tA\tG\t.\t.\t.",
    ]
    prefix, codes = _fileset(tmp_path, rows)
    res = sort_pgen(prefix, str(tmp_path / "out"))
    assert not res.already_sorted
    # numeric (2 < 10), then X, Y, MT, then others lexicographic
    assert _ids(res.out_prefix) == ["d", "b", "a", "c", "f", "e", "g"]
    # genotype records follow the permutation
    mm = np.memmap(f"{res.out_prefix}.pgen", dtype=np.uint8, mode="r")
    rec = (2 * codes.shape[1] + 7) // 8
    got = mm[12:].reshape(len(rows), rec)
    src = np.memmap(f"{prefix}.pgen", dtype=np.uint8, mode="r")[12:].reshape(
        len(rows), rec
    )
    perm = [3, 1, 0, 2, 5, 4, 6]
    assert (got == src[perm]).all()


def test_sort_contig_header_order_wins(tmp_path):
    comments = (
        "##fileformat=VCFv4.2\n"
        '##contig=<ID=Z,length=100>\n'
        '##contig=<ID=1,length=100>\n'
    )
    rows = [
        "1\t5\ta\tA\tG\t.\t.\t.",
        "Z\t9\tb\tA\tG\t.\t.\t.",
        "B\t1\tc\tA\tG\t.\t.\t.",  # unlisted: after listed, natural order
    ]
    prefix, _ = _fileset(tmp_path, rows, comments=comments)
    res = sort_pgen(prefix, str(tmp_path / "out"))
    assert _ids(res.out_prefix) == ["b", "a", "c"]


def test_sort_stable_on_position_ties(tmp_path):
    rows = [
        "1\t100\tfirst\tA\tG\t.\t.\t.",
        "1\t100\tsecond\tA\tG\t.\t.\t.",
        "1\t50\tearly\tA\tG\t.\t.\t.",
    ]
    prefix, _ = _fileset(tmp_path, rows)
    res = sort_pgen(prefix, str(tmp_path / "out"))
    assert _ids(res.out_prefix) == ["early", "first", "second"]


def test_sort_already_sorted_is_byte_exact_copy(tmp_path):
    rows = [f"1\t{100 + i}\tv{i}\tA\tG\t.\t.\t." for i in range(5)]
    prefix, _ = _fileset(tmp_path, rows)
    res = sort_pgen(prefix, str(tmp_path / "out"))
    assert res.already_sorted
    for ext in (".pgen", ".pvar", ".psam"):
        assert open(f"{res.out_prefix}{ext}", "rb").read() == open(
            f"{prefix}{ext}", "rb"
        ).read()


def test_sort_check_mode_cli(tmp_path):
    sorted_rows = [f"1\t{i}\tv{i}\tA\tG\t.\t.\t." for i in (1, 2, 3)]
    prefix, _ = _fileset(tmp_path, sorted_rows)
    assert run_cli(["sort", prefix, "--check"]) == 0
    unsorted = [f"1\t{i}\tv{i}\tA\tG\t.\t.\t." for i in (3, 1, 2)]
    prefix2 = build_fileset(
        tmp_path, "u", np.zeros((3, 2), dtype=np.uint8), unsorted, ["s0\tM", "s1\tM"]
    )
    assert run_cli(["sort", prefix2, "--check"]) == 1
    import os

    assert not os.path.exists(f"{prefix2}.sorted.pgen")  # --check writes nothing


def test_sort_non_numeric_pos_fails(tmp_path):
    rows = ["1\tabc\tv0\tA\tG\t.\t.\t."]
    prefix, _ = _fileset(tmp_path, rows)
    with pytest.raises(ValueError, match="non-numeric POS"):
        sort_pgen(prefix, str(tmp_path / "out"))


def test_sort_then_filter_round_trip(tmp_path):
    rng = np.random.default_rng(5)
    order = rng.permutation(20)
    rows = [f"1\t{100 + int(i)}\tv{int(i)}\tA\tG\t.\t.\t." for i in order]
    codes = rng.integers(0, 4, size=(20, 7), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path, "rt", codes, rows, [f"s{i}\tM" for i in range(7)]
    )
    res = sort_pgen(prefix, str(tmp_path / "out"))
    perm = np.argsort(order, kind="stable")
    from pgen_tpu.pipeline.filter import filter_to_vcf

    filter_to_vcf(res.out_prefix, out_file=str(tmp_path / "s.vcf"))
    body = [
        l.split("\t")
        for l in open(tmp_path / "s.vcf").read().splitlines()
        if not l.startswith("#")
    ]
    oracle_codes = codes[perm]
    tok = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
    for r, fields in enumerate(body):
        assert fields[2] == f"v{r}"
        assert fields[9:] == [tok[int(c)] for c in oracle_codes[r]]
