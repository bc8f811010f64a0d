"""Standalone `index` subcommand (pipeline/index_vcf.py): tabix-indexing
an already-written .vcf.gz by scanning its BGZF members.

The strongest pin: the scanned index must be byte-identical to the one
`filter --index` computes arithmetically at write time — both feed
build_index_for_vcf_gz with the same per-row (chrom, pos, ref_len,
uncompressed span) data, so any scan drift shows up as a byte diff.
"""

import gzip

import numpy as np
import pytest

from cli_helpers import run_cli
from conftest import build_fileset

from pgen_tpu.pipeline.filter import filter_to_vcf
from pgen_tpu.pipeline.index_vcf import VcfIndexError, index_vcf_gz


@pytest.fixture()
def gz_vcf(tmp_path):
    rng = np.random.default_rng(21)
    n = 500
    codes = rng.integers(0, 4, size=(n, 7), dtype=np.uint8)
    chroms = ["1"] * 200 + ["2"] * 150 + ["X"] * 150
    pvar_rows = [
        f"{chroms[i]}\t{10 + 37 * i}\trs{i}\t{'ACGT'[i % 4] * (1 + i % 3)}\tG\t.\tPASS\t."
        for i in range(n)
    ]
    psam_rows = [f"s{i}\tF" for i in range(7)]
    prefix = build_fileset(tmp_path, "g", codes, pvar_rows, psam_rows)
    out = tmp_path / "g.vcf.gz"
    filter_to_vcf(prefix, out_file=out, index=True)
    return out


def test_scanned_index_matches_writetime(gz_vcf):
    writetime = open(str(gz_vcf) + ".tbi", "rb").read()
    scanned_path = index_vcf_gz(str(gz_vcf))
    assert scanned_path == str(gz_vcf) + ".tbi"
    assert open(scanned_path, "rb").read() == writetime


def test_scanned_index_small_chunks(gz_vcf):
    writetime = open(str(gz_vcf) + ".tbi", "rb").read()
    # tiny chunk size forces many carry splits across member groups
    index_vcf_gz(str(gz_vcf), chunk_bytes=1 << 12)
    assert open(str(gz_vcf) + ".tbi", "rb").read() == writetime


def test_csi_format(gz_vcf):
    p = index_vcf_gz(str(gz_vcf), fmt="csi")
    assert p.endswith(".csi")
    from pgen_tpu.formats.tabix import read_csi

    read_csi(p)  # parses as a structurally valid .csi


def test_cli_index(gz_vcf, tmp_path, capsys):
    import os

    os.unlink(str(gz_vcf) + ".tbi")
    rc = run_cli(["index", str(gz_vcf)])
    assert rc == 0
    assert "wrote" in capsys.readouterr().err
    assert os.path.exists(str(gz_vcf) + ".tbi")


def test_rejects_plain_gzip(tmp_path):
    p = tmp_path / "plain.vcf.gz"
    p.write_bytes(gzip.compress(b"##x\n#CHROM\tPOS\tID\tREF\tALT\n1\t5\t.\tA\tG\n"))
    with pytest.raises(VcfIndexError, match="not BGZF"):
        index_vcf_gz(str(p))


def test_rejects_headerless_garbage(gz_vcf, tmp_path):
    from pgen_tpu.pipeline.vcf_import import _gz_windows  # bgzf writer reuse

    # a BGZF file with no data rows: compress just a header via the
    # pipeline's own writer (filter of an empty selection)
    prefix_dir = tmp_path
    codes = np.zeros((1, 2), dtype=np.uint8)
    prefix = build_fileset(
        prefix_dir, "empty", codes, ["1\t5\trs0\tA\tG\t.\t.\t."], ["s0\tM", "s1\tM"]
    )
    out = tmp_path / "empty.vcf.gz"
    filter_to_vcf(prefix, var_query='POS=="999"', out_file=out)
    with pytest.raises(VcfIndexError, match="no data rows"):
        index_vcf_gz(str(out))


def test_fetch_through_scanned_index(gz_vcf):
    """Region fetch via the scanned index returns exactly the right rows."""
    import os

    from test_tabix import _brute_force

    from pgen_tpu.formats.tabix import fetch_region

    os.unlink(str(gz_vcf) + ".tbi")
    tbi = index_vcf_gz(str(gz_vcf))
    got = fetch_region(str(gz_vcf), tbi, "2", 100, 9000)
    want = _brute_force(gz_vcf, "2", 100, 9000)
    assert got == want and len(got) > 0
