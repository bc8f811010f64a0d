"""`stats` subcommand: genotype summary from one packed-matrix pass."""

import io

import numpy as np

from conftest import build_fileset
from pgen_tpu.pipeline.stats import genotype_stats


def _fileset(tmp_path):
    rng = np.random.default_rng(8)
    codes = rng.integers(0, 4, size=(40, 11), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "st",
        codes,
        [f"1\t{100+i}\tr{i}\tA\t{'CG'[i % 2]}\t.\t.\t." for i in range(40)],
        [f"s{i}\t{'MF'[i % 2]}" for i in range(11)],
    )
    return prefix, codes


def test_stats_totals(tmp_path):
    prefix, codes = _fileset(tmp_path)
    buf = io.StringIO()
    s = genotype_stats(prefix, out=buf)
    assert s["variants"] == 40
    assert s["samples"] == 11
    assert s["genotypes"] == 40 * 11
    for k, code in (("hom_ref", 0), ("het", 1), ("hom_alt", 2), ("missing", 3)):
        assert s[k] == int((codes == code).sum())
    ac = (codes == 1).sum(axis=1) + 2 * (codes == 2).sum(axis=1)
    assert s["nonref_variants"] == int((ac > 0).sum())
    assert s["singletons"] == int((ac == 1).sum())
    assert f"variants\t40" in buf.getvalue()


def test_stats_with_predicates(tmp_path):
    prefix, codes = _fileset(tmp_path)
    buf = io.StringIO()
    s = genotype_stats(
        prefix, var_query='ALT == "G"', sam_query='SEX == "F"', out=buf
    )
    keep_v = np.arange(40) % 2 == 1
    keep_s = np.arange(11) % 2 == 1
    sub = codes[keep_v][:, keep_s]
    assert s["variants"] == int(keep_v.sum())
    assert s["samples"] == int(keep_s.sum())
    assert s["missing"] == int((sub == 3).sum())


def test_stats_cli(tmp_path, capsys):
    from cli_helpers import run_cli

    prefix, _ = _fileset(tmp_path)
    rc = run_cli(["stats", prefix, "--include-sam", 'SEX == "M"'])
    assert rc == 0
    out = capsys.readouterr().out
    assert "missing_rate\t" in out and "samples\t6" in out
