"""plink2 QC sugar flags (--maf/--max-maf/--geno/--hwe/--mind) and the
sample-axis GT_* predicate support behind --mind."""

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset

from pgen_tpu.pipeline.filter import compute_masks, filter_to_vcf
from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata


@pytest.fixture()
def fileset(tmp_path):
    rng = np.random.default_rng(9)
    nv, ns = 60, 20
    codes = rng.integers(0, 3, size=(nv, ns), dtype=np.uint8)
    codes[rng.random((nv, ns)) < 0.08] = 3
    codes[5] = 0  # monomorphic: MAF 0
    codes[:, 2] = 3  # sample 2: all-missing -> --mind drops it
    codes[: nv // 2, 3] = 3  # sample 3: half-missing
    rows = [f"1\t{100 + i}\trs{i}\tA\tG\t.\t.\t." for i in range(nv)]
    prefix = build_fileset(
        tmp_path, "qc", codes, rows, [f"s{i}\tM" for i in range(ns)]
    )
    return prefix, codes


def _body(path):
    return [
        ln for ln in open(path).read().splitlines() if not ln.startswith("#")
    ]


def test_maf_geno_hwe_desugar_identical(fileset, tmp_path):
    """The sugar flags must produce byte-identical output to their
    spelled-out GT_* expressions."""
    prefix, _ = fileset
    a, b = tmp_path / "a.vcf", tmp_path / "b.vcf"
    assert run_cli([
        "filter", prefix, "--maf", "0.1", "--geno", "0.1", "--hwe", "1e-6",
        "-o", str(a),
    ]) == 0
    assert run_cli([
        "filter", prefix, "--include-var",
        "(GT_MAF >= 0.1) && (GT_MISSING_RATE <= 0.1) && (GT_HWE_P >= 1e-06)",
        "-o", str(b),
    ]) == 0
    assert a.read_bytes() == b.read_bytes()
    assert len(_body(a)) > 0


def test_maf_excludes_monomorphic(fileset, tmp_path):
    prefix, codes = fileset
    out = tmp_path / "m.vcf"
    assert run_cli(["filter", prefix, "--maf", "0.01", "-o", str(out)]) == 0
    kept_ids = [ln.split("\t")[2] for ln in _body(out)]
    assert "rs5" not in kept_ids  # the monomorphic row


def test_mind_drops_missing_samples(fileset, tmp_path):
    prefix, codes = fileset
    out = tmp_path / "mind.vcf"
    assert run_cli(["filter", prefix, "--mind", "0.4", "-o", str(out)]) == 0
    header_line = next(
        ln for ln in open(out) if ln.startswith("#CHROM")
    ).rstrip("\n")
    samples = header_line.split("\t")[9:]
    assert "s2" not in samples  # all-missing
    assert "s3" not in samples  # half-missing (0.5 > 0.4)
    assert "s0" in samples and len(samples) == codes.shape[1] - 2


def test_mind_then_maf_cohort_aware(fileset, tmp_path):
    """--maf is computed over the cohort AFTER --mind drops samples —
    identical to --include-sam with the spelled-out sample-axis GT_*."""
    prefix, _ = fileset
    a, b = tmp_path / "a.vcf", tmp_path / "b.vcf"
    assert run_cli([
        "filter", prefix, "--mind", "0.4", "--maf", "0.15", "-o", str(a),
    ]) == 0
    assert run_cli([
        "filter", prefix,
        "--include-sam", "GT_MISSING_RATE <= 0.4",
        "--include-var", "GT_MAF >= 0.15",
        "-o", str(b),
    ]) == 0
    assert a.read_bytes() == b.read_bytes()


def test_sample_axis_gt_in_compute_masks(fileset):
    """Direct API: sample-axis GT_* binds per-sample histograms over ALL
    variants (the --mind convention)."""
    prefix, codes = fileset
    header = read_pgen_header(f"{prefix}.pgen")
    pvar = read_metadata(f"{prefix}.pvar")
    psam = read_metadata(f"{prefix}.psam")
    records = np.fromfile(f"{prefix}.pgen", dtype=np.uint8)[12:].reshape(
        header.num_variants, header.record_size
    )
    var_mask, sam_mask = compute_masks(
        None, "GT_MISSING >= 10", pvar, psam, header, records, "numpy"
    )
    expected = (codes == 3).sum(axis=0) >= 10
    np.testing.assert_array_equal(sam_mask, expected)
    assert var_mask.all()


def test_mind_on_device_mesh_path(fileset, tmp_path):
    """--provider device + --mind: the sample GT query must route through
    the host-mask path and stay byte-identical to the host provider."""
    prefix, _ = fileset
    a, b = tmp_path / "h.vcf", tmp_path / "d.vcf"
    assert run_cli([
        "filter", prefix, "--mind", "0.4", "--include-var", 'ALT == "G"',
        "-o", str(a),
    ]) == 0
    assert run_cli([
        "filter", prefix, "--mind", "0.4", "--include-var", 'ALT == "G"',
        "--provider", "device", "-o", str(b),
    ]) == 0
    assert a.read_bytes() == b.read_bytes()


# -- --extract / --exclude-ids (plink2 variant-ID lists) ---------------------


def test_extract_and_exclude_ids(fileset, tmp_path):
    prefix, _ = fileset
    idfile = tmp_path / "ids.txt"
    idfile.write_text("# picked\nrs3\nrs7\nrs11\n\n")
    out = tmp_path / "x.vcf"
    assert run_cli([
        "filter", prefix, "--extract", str(idfile), "-o", str(out),
    ]) == 0
    assert [ln.split("\t")[2] for ln in _body(out)] == ["rs3", "rs7", "rs11"]
    # --exclude-ids drops exactly those
    out2 = tmp_path / "e.vcf"
    assert run_cli([
        "filter", prefix, "--exclude-ids", str(idfile), "-o", str(out2),
    ]) == 0
    kept = [ln.split("\t")[2] for ln in _body(out2)]
    assert "rs3" not in kept and "rs7" not in kept and len(kept) == 57
    # composes with --include-var
    out3 = tmp_path / "c.vcf"
    assert run_cli([
        "filter", prefix, "--extract", str(idfile),
        "--include-var", 'POS >= "107"', "-o", str(out3),
    ]) == 0
    assert [ln.split("\t")[2] for ln in _body(out3)] == ["rs7", "rs11"]
    # empty list errors
    empty = tmp_path / "empty.txt"
    empty.write_text("# nothing\n")
    assert run_cli([
        "filter", prefix, "--extract", str(empty), "-o", str(out),
    ]) == 1


def test_extract_comma_id_regex_fallback(tmp_path):
    from pgen_tpu.query.idlist import ids_to_expr

    assert ids_to_expr(["rs1", "rs2"], False) == 'in_list(ID, "rs1,rs2")'
    expr = ids_to_expr(["a,b", "rs2"], False)
    assert expr.startswith("str::regex_matches(ID,")
