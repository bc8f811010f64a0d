"""plink2 --keep/--remove sample-ID files (registered on every
sample-list subcommand, folded centrally into include-sam)."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset

from pgen_tpu.query.samples import (
    SampleListError,
    apply_keep_remove,
    keep_remove_file_to_names,
)


def _fileset(tmp_path, ns=5, nv=4):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(nv, ns), dtype=np.uint8)
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(nv)]
    psam_rows = [f"s{i}\tM" for i in range(ns)]
    return build_fileset(tmp_path, "kr", codes, pvar_rows, psam_rows)


def test_file_parsing(tmp_path):
    p = tmp_path / "k.txt"
    p.write_text("# comment\ns0\nfam1 s1\n\nfam2\ts2\n")
    assert keep_remove_file_to_names(str(p)) == ["s0", "s1", "s2"]
    (tmp_path / "e.txt").write_text("# only comments\n")
    with pytest.raises(SampleListError):
        keep_remove_file_to_names(str(tmp_path / "e.txt"))


def test_apply_keep_remove_composition(tmp_path):
    k = tmp_path / "k.txt"
    k.write_text("s0\ns1\n")
    r = tmp_path / "r.txt"
    r.write_text("s1\n")
    expr = apply_keep_remove('SEX=="M"', str(k), str(r))
    assert expr.count("regex_matches") == 2
    assert 'SEX=="M"' in expr and "!(" in expr
    assert apply_keep_remove(None, None, None) is None


def test_cli_filter_keep_remove(tmp_path):
    prefix = _fileset(tmp_path)
    k = tmp_path / "k.txt"
    k.write_text("s3\nfam s1\n")
    r = tmp_path / "r.txt"
    r.write_text("s3\n")
    out = tmp_path / "o.vcf"
    assert run_cli(["filter", prefix, "--keep", str(k), "-o", str(out)]) == 0
    head = [l for l in out.read_text().splitlines() if l.startswith("#CHROM")]
    assert head[0].endswith("FORMAT\ts1\ts3")
    assert run_cli([
        "filter", prefix, "--keep", str(k), "--remove", str(r),
        "-o", str(out),
    ]) == 0
    head = [l for l in out.read_text().splitlines() if l.startswith("#CHROM")]
    assert head[0].endswith("FORMAT\ts1")


def test_cli_export_keep(tmp_path):
    prefix = _fileset(tmp_path)
    k = tmp_path / "k.txt"
    k.write_text("s0\ns4\n")
    out = tmp_path / "o.raw"
    assert run_cli(["export", prefix, "--keep", str(k), "-o", str(out)]) == 0
    lines = out.read_text().splitlines()
    assert [l.split("\t")[1] for l in lines[1:]] == ["s0", "s4"]
