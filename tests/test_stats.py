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


def test_stats_variant_classes_and_tstv(tmp_path):
    # hand-built mix: 2 ts SNPs, 1 tv SNP, insertion, deletion, MNP,
    # multiallelic, symbolic — across two contigs
    rows = [
        ("1", "A", "G"),      # ts (purine-purine)
        ("1", "C", "T"),      # ts (pyrimidine-pyrimidine)
        ("1", "A", "C"),      # tv
        ("1", "A", "AT"),     # insertion
        ("2", "CTA", "C"),    # deletion
        ("2", "AG", "CT"),    # MNP
        ("2", "A", "G,T"),    # multiallelic
        ("2", "A", "<DEL>"),  # symbolic -> other
    ]
    codes = np.tile(np.array([[0, 1, 2]], dtype=np.uint8), (len(rows), 1))
    prefix = build_fileset(
        tmp_path,
        "cls",
        codes,
        [
            f"{c}\t{100 + i}\tv{i}\t{ref}\t{alt}\t.\t.\t."
            for i, (c, ref, alt) in enumerate(rows)
        ],
        [f"s{i}\t{'MF'[i % 2]}" for i in range(3)],
    )
    buf = io.StringIO()
    s = genotype_stats(prefix, out=buf)
    assert s["snps"] == 3
    assert s["transitions"] == 2
    assert s["transversions"] == 1
    assert s["ts_tv"] == 2.0
    assert s["indels"] == 2
    assert s["mnps"] == 1
    assert s["multiallelic"] == 1
    assert s["other"] == 1
    text = buf.getvalue()
    assert "chrom\t1\t4\n" in text and "chrom\t2\t4\n" in text
    # per-chrom order is first-appearance
    assert text.index("chrom\t1\t") < text.index("chrom\t2\t")


def test_stats_classes_respect_variant_filter(tmp_path):
    rows = [("1", "A", "G"), ("1", "A", "C"), ("2", "A", "AT")]
    codes = np.zeros((3, 2), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "clf",
        codes,
        [
            f"{c}\t{100 + i}\tv{i}\t{ref}\t{alt}\t.\t.\t."
            for i, (c, ref, alt) in enumerate(rows)
        ],
        [f"s{i}\tM" for i in range(2)],
    )
    s = genotype_stats(prefix, var_query='CHROM == "1"', out=io.StringIO())
    assert s["snps"] == 2 and s["indels"] == 0
    assert s["transitions"] == 1 and s["transversions"] == 1 and s["ts_tv"] == 1.0
