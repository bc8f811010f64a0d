"""Exact HWE test (ops/hwe.py) against a from-scratch exact-fraction oracle,
and the derived GT_* float variables (GT_AF/GT_MAF/GT_MISSING_RATE/
GT_HET_RATE/GT_HWE_P) across filter/query/exclude surfaces."""

import io
import math
from fractions import Fraction

import numpy as np

from conftest import build_fileset
from pgen_tpu.ops.gt_stats import gt_variables
from pgen_tpu.ops.hwe import hwe_exact_p
from pgen_tpu.pipeline.query import query_metadata


def hwe_oracle(homref: int, het: int, homalt: int) -> float:
    """Exact-fraction SNP-HWE p-value: enumerate the full conditional
    distribution of het counts given allele counts and sample size."""
    n = homref + het + homalt
    rare = 2 * min(homref, homalt) + het
    if n == 0 or rare < 2:
        return 1.0
    weights = {}
    for h in range(rare % 2, rare + 1, 2):
        hr = (rare - h) // 2
        hc = n - h - hr
        if hr < 0 or hc < 0:
            continue
        w = Fraction(
            math.factorial(n),
            math.factorial(hr) * math.factorial(h) * math.factorial(hc),
        ) * (2**h)
        weights[h] = w
    total = sum(weights.values())
    obs = weights[het]
    p = sum(w for w in weights.values() if w <= obs) / total
    return float(min(p, Fraction(1)))


def _counts(rows):
    c = np.zeros((len(rows), 4), dtype=np.int64)
    for i, (a, b, d) in enumerate(rows):
        c[i, 0], c[i, 1], c[i, 2] = a, b, d
    return c


def test_hwe_monomorphic_and_singletons_are_one():
    rows = [(10, 0, 0), (0, 0, 10), (9, 1, 0), (0, 1, 9), (0, 0, 0)]
    assert (hwe_exact_p(_counts(rows)) == 1.0).all()


def test_hwe_matches_exact_fraction_oracle_randomized():
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(300):
        n = int(rng.integers(1, 41))
        a = int(rng.integers(0, n + 1))
        b = int(rng.integers(0, n - a + 1))
        rows.append((a, b, n - a - b))
    got = hwe_exact_p(_counts(rows))
    want = np.array([hwe_oracle(*r) for r in rows])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_hwe_exhaustive_small_cohort():
    rows = [
        (a, b, n - a - b)
        for n in range(1, 13)
        for a in range(n + 1)
        for b in range(n + 1 - a)
    ]
    got = hwe_exact_p(_counts(rows))
    want = np.array([hwe_oracle(*r) for r in rows])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_hwe_extreme_het_excess_is_significant():
    # 50 samples, all heterozygous: textbook HWE violation
    (p,) = hwe_exact_p(_counts([(0, 50, 0)]))
    assert p < 1e-6


def test_hwe_duplicate_rows_share_group_results():
    rows = [(5, 10, 5), (2, 3, 4), (5, 10, 5), (2, 3, 4), (5, 10, 5)]
    p = hwe_exact_p(_counts(rows))
    assert p[0] == p[2] == p[4]
    assert p[1] == p[3]
    np.testing.assert_allclose(
        p[:2], [hwe_oracle(*rows[0]), hwe_oracle(*rows[1])], rtol=1e-9
    )


def test_hwe_missing_column_is_ignored():
    c = _counts([(6, 8, 6)])
    c2 = c.copy()
    c2[0, 3] = 17
    assert hwe_exact_p(c)[0] == hwe_exact_p(c2)[0]


# --- derived float variables -------------------------------------------------


def _fileset(tmp_path):
    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, size=(30, 16), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        "hw",
        codes,
        [f"1\t{100 + i}\trs{i}\tA\tG\t.\t.\t." for i in range(30)],
        [f"s{i}\t{'MF'[i % 2]}" for i in range(16)],
    )
    return prefix, codes


def _expected_vars(codes):
    counts = np.zeros((codes.shape[0], 4), dtype=np.int64)
    for k in range(4):
        counts[:, k] = (codes == k).sum(axis=1)
    return gt_variables(counts, codes.shape[1])


def test_gt_af_maf_rates_in_query(tmp_path):
    prefix, codes = _fileset(tmp_path)
    want = _expected_vars(codes)
    buf = io.StringIO()
    n = query_metadata(prefix, "ID", query="GT_AF > 0.5", out=buf)
    got = buf.getvalue().splitlines()
    keep = np.flatnonzero(want["GT_AF"] > 0.5)
    assert got == [f"rs{i}" for i in keep]
    assert n == len(keep)

    buf = io.StringIO()
    query_metadata(prefix, "ID", query="GT_MAF < 0.2", out=buf)
    keep = np.flatnonzero(want["GT_MAF"] < 0.2)
    assert buf.getvalue().splitlines() == [f"rs{i}" for i in keep]

    buf = io.StringIO()
    query_metadata(
        prefix, "ID", query="GT_MISSING_RATE == 0.0 && GT_HET_RATE >= 0.25", out=buf
    )
    keep = np.flatnonzero(
        (want["GT_MISSING_RATE"] == 0.0) & (want["GT_HET_RATE"] >= 0.25)
    )
    assert buf.getvalue().splitlines() == [f"rs{i}" for i in keep]


def test_gt_hwe_p_in_filter(tmp_path):
    prefix, codes = _fileset(tmp_path)
    want = _expected_vars(codes)
    from pgen_tpu.pipeline.filter import filter_to_vcf

    out = str(tmp_path / "hwe.vcf")
    res = filter_to_vcf(prefix, var_query="GT_HWE_P >= 0.05", out_file=out)
    keep = np.flatnonzero(want["GT_HWE_P"] >= 0.05)
    assert res.num_variants_kept == len(keep)
    body = [
        l for l in open(out).read().splitlines() if l and not l.startswith("#")
    ]
    assert [row.split("\t")[2] for row in body] == [f"rs{i}" for i in keep]


def test_gt_af_cohort_aware_with_sample_subset(tmp_path):
    prefix, codes = _fileset(tmp_path)
    from pgen_tpu.pipeline.filter import filter_to_vcf

    out = str(tmp_path / "sub.vcf")
    res = filter_to_vcf(
        prefix, var_query="GT_AF > 0.5", sam_query='SEX == "F"', out_file=out
    )
    sub = codes[:, 1::2]
    counts = np.zeros((codes.shape[0], 4), dtype=np.int64)
    for k in range(4):
        counts[:, k] = (sub == k).sum(axis=1)
    want = gt_variables(counts, sub.shape[1])
    assert res.num_variants_kept == int((want["GT_AF"] > 0.5).sum())


def test_gt_float_vars_on_sample_axis(tmp_path):
    prefix, codes = _fileset(tmp_path)
    buf = io.StringIO()
    query_metadata(prefix, "IID", query="GT_MISSING_RATE > 0.3", query_samples=True, out=buf)
    miss = (codes == 3).mean(axis=0)
    keep = np.flatnonzero(miss > 0.3)
    assert buf.getvalue().splitlines() == [f"s{i}" for i in keep]


def test_gt_hwe_p_exclude_surface(tmp_path, capsys):
    prefix, codes = _fileset(tmp_path)
    want = _expected_vars(codes)
    from cli_helpers import run_cli

    rc = run_cli(["query", prefix, "-f", "ID", "-e", "GT_HWE_P < 0.05"])
    assert rc == 0
    out = capsys.readouterr().out
    keep = np.flatnonzero(~(want["GT_HWE_P"] < 0.05))
    assert out.splitlines() == [f"rs{i}" for i in keep]


def hwe_midp_oracle(homref: int, het: int, homalt: int) -> float:
    """Mid-p oracle: exact p minus half the observed config's mass."""
    n = homref + het + homalt
    rare = 2 * min(homref, homalt) + het
    if n == 0:
        return 1.0  # no data: agree with GT_HWE_P's no-data convention
    if rare < 2:
        return 0.5
    weights = {}
    for h in range(rare % 2, rare + 1, 2):
        hr = (rare - h) // 2
        hc = n - h - hr
        if hr < 0 or hc < 0:
            continue
        w = Fraction(
            math.factorial(n),
            math.factorial(hr) * math.factorial(h) * math.factorial(hc),
        ) * (2**h)
        weights[h] = w
    total = sum(weights.values())
    obs = weights[het]
    p = sum(w for w in weights.values() if w <= obs) / total
    return float(min(p - Fraction(obs, total) / 2, Fraction(1)))


def test_hwe_midp_matches_oracle_randomized():
    rng = np.random.default_rng(31)
    rows = rng.integers(0, 12, size=(60, 3))
    got = hwe_exact_p(_counts(rows), midp=True)
    for k, (hr, he, ha) in enumerate(rows):
        exp = hwe_midp_oracle(int(hr), int(he), int(ha))
        assert abs(got[k] - exp) < 1e-10, (hr, he, ha)


def test_hwe_midp_monomorphic_is_half():
    c = _counts([(5, 0, 0), (0, 0, 7), (0, 1, 3)])
    got = hwe_exact_p(c, midp=True)
    assert got[0] == 0.5 and got[1] == 0.5 and got[2] == 0.5


def test_hwe_midp_all_missing_is_one():
    # zero-genotype rows report 1.0 under both modes (GT_HWE_P agreement)
    c = _counts([(0, 0, 0), (3, 4, 5)])
    assert hwe_exact_p(c, midp=True)[0] == 1.0
    assert hwe_exact_p(c, midp=False)[0] == 1.0


def test_hwe_midp_flag_requires_hwe(tmp_path, capsys):
    from tests.cli_helpers import run_cli

    codes = np.ones((2, 4), dtype=np.uint8)
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(2)]
    psam_rows = [f"s{i}\tM" for i in range(4)]
    prefix = build_fileset(tmp_path, "mq", codes, pvar_rows, psam_rows)
    rc = run_cli(["filter", prefix, "--hwe-midp",
                  "-o", str(tmp_path / "x.vcf")])
    assert rc == 2
    assert "--hwe-midp requires --hwe" in capsys.readouterr().err


def test_hwe_midp_below_exact_p():
    rng = np.random.default_rng(7)
    rows = rng.integers(1, 15, size=(40, 3))
    c = _counts(rows)
    assert np.all(hwe_exact_p(c, midp=True) < hwe_exact_p(c))


def test_gt_hwe_midp_variable_and_cli(tmp_path):
    from tests.cli_helpers import run_cli

    rng = np.random.default_rng(4)
    codes = rng.integers(0, 3, size=(30, 20), dtype=np.uint8)
    codes[0] = 1  # all-het: strong HWE violation
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(30)]
    psam_rows = [f"s{i}\tM" for i in range(20)]
    prefix = build_fileset(tmp_path, "mp", codes, pvar_rows, psam_rows)
    # rs0 (all-het, 20 samples): exact p = 8.95e-6, mid-p = 5.14e-6 — a
    # threshold between the two shows the flag switching the test
    out = tmp_path / "h.vcf"
    assert run_cli(["filter", prefix, "--hwe", "7e-6", "-o", str(out)]) == 0
    body = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert any(l.split("\t")[2] == "rs0" for l in body)
    assert run_cli([
        "filter", prefix, "--hwe", "7e-6", "--hwe-midp", "-o", str(out),
    ]) == 0
    body = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert not any(l.split("\t")[2] == "rs0" for l in body)
    # hardy --midp column strictly below the exact table's P
    h1 = tmp_path / "a.hardy"
    h2 = tmp_path / "b.hardy"
    assert run_cli(["hardy", prefix, "-o", str(h1)]) == 0
    assert run_cli(["hardy", prefix, "--midp", "-o", str(h2)]) == 0
    p1 = [float(l.split("\t")[-1]) for l in h1.read_text().splitlines()[1:]]
    p2 = [float(l.split("\t")[-1]) for l in h2.read_text().splitlines()[1:]]
    assert all(b < a for a, b in zip(p1, p2))
