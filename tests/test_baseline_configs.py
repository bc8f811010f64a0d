"""The five BASELINE.json benchmark configs, exercised at test scale.

1. basic1 filter (--include-sam IID=="NA20900" --include-var ALT=="G") —
   covered at full scale in test_filter.py::test_basic1_baseline_config.
2. query mode on basic2: variant predicate + fstring over .pvar only.
3. sample-axis filtering on random1: PHENO1 subsetting of the packed matrix.
4. chr22 keep-two / drop-two filters (NB: the reference's drop-two query
   'POS!="a" || POS!="b"' is a tautology that keeps everything — semantics
   must match, README.md:176-183).
5. multi-host variant-sharded decode with ordered merge — covered in
   test_distributed.py / test_sharding.py.

basic2/random1 here use the REAL reference .psam (300 samples, columns
IID/SEX/PHENO1) with reduced variant counts for speed; the full-size
fixtures come from tools/make_fixtures.py.
"""

import io
import shutil
from pathlib import Path

import numpy as np
import pytest

from pgen_tpu.formats.writer import write_pgen
from pgen_tpu.pipeline.filter import filter_to_vcf
from pgen_tpu.pipeline.query import query_metadata

from oracle import scalar_filter_vcf, scalar_query

REF_PSAM = Path("/root/reference/data/basic2/basic2.psam")


@pytest.fixture(scope="module")
def basic2_small(tmp_path_factory):
    d = tmp_path_factory.mktemp("basic2s")
    prefix = d / "basic2"
    shutil.copyfile(REF_PSAM, f"{prefix}.psam")
    n_samples = sum(1 for _ in open(f"{prefix}.psam")) - 1
    rng = np.random.default_rng(12)
    nvar = 3000
    codes = rng.integers(0, 4, size=(nvar, n_samples), dtype=np.uint8)
    write_pgen(f"{prefix}.pgen", codes)
    with open(f"{prefix}.pvar", "w") as f:
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        pos = 10000
        for i in range(nvar):
            pos += int(rng.integers(5, 400))
            f.write(f"1\t{pos}\tsnp{i}\tA\t{'GCT'[i % 3]}\t100\tPASS\t.\n")
    return str(prefix)


def test_basic2_query_config(basic2_small):
    """Config 2: variant predicate + fstring formatting over .pvar only."""
    buf = io.StringIO()
    n = query_metadata(
        basic2_small,
        query_fstring='ID + " " + POS',
        query='ALT == "G"',
        out=buf,
    )
    expected = scalar_query(
        basic2_small,
        lambda c: c["ID"] + " " + c["POS"],
        lambda c: c["ALT"] == "G",
    )
    assert buf.getvalue().splitlines() == expected
    assert n == 1000  # every i % 3 == 0


def test_basic2_psam_has_pheno_column(basic2_small):
    from pgen_tpu.formats.metadata import read_metadata

    t = read_metadata(f"{basic2_small}.psam")
    assert t.columns == ("IID", "SEX", "PHENO1")
    assert t.num_rows == 300


@pytest.mark.parametrize("provider", ["native", "numpy", "device"])
def test_random1_sample_axis_config(basic2_small, tmp_path, provider):
    """Config 3: sample-axis filtering — column subsetting of the packed
    genotype matrix driven by a psam predicate (binary phenotype)."""
    out = tmp_path / f"r1-{provider}.vcf"
    res = filter_to_vcf(
        basic2_small,
        sam_query='PHENO1 == "2"',
        var_query='POS < "20000"',
        out_file=out,
        provider=provider,
    )
    expected = scalar_filter_vcf(
        basic2_small,
        lambda v: v["POS"] < "20000",
        lambda s: s["PHENO1"] == "2",
    )
    assert out.read_bytes() == expected
    assert 0 < res.num_samples_kept < 300


def test_keep_two_and_drop_two_semantics(basic2_small, tmp_path):
    """Config 4 at test scale: keep-two matches exactly two variants;
    drop-two as the reference wrote it is a tautology keeping all."""
    from pgen_tpu.formats.metadata import read_metadata

    pvar = read_metadata(f"{basic2_small}.pvar")
    pos = pvar.get_column_strs("POS")
    a, b = pos[10], pos[2000]

    out = tmp_path / "k2.vcf"
    res = filter_to_vcf(
        basic2_small, var_query=f'POS=="{a}" || POS=="{b}"', out_file=out
    )
    assert res.num_variants_kept == 2

    out2 = tmp_path / "d2.vcf"
    res2 = filter_to_vcf(
        basic2_small, var_query=f'POS!="{a}" || POS!="{b}"', out_file=out2
    )
    assert res2.num_variants_kept == 3000  # tautology keeps all
