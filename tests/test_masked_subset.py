"""Property test: random sample subsets through the masked-LUT native
emitter are byte-identical to the scalar oracle."""

import os

import numpy as np
import pytest

from conftest import build_fileset
from oracle import scalar_filter_vcf
from pgen_tpu.pipeline.filter import filter_to_vcf


@pytest.mark.parametrize("trial", range(12))
def test_random_subsets(tmp_path, trial):
    rng = np.random.default_rng(1000 + trial)
    nvar = int(rng.integers(1, 30))
    nsamp = int(rng.integers(1, 40))
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    prefix = build_fileset(
        tmp_path,
        f"f{trial}",
        codes,
        [f"1\t{100 + i}\tr{i}\tA\tC\t.\t.\t." for i in range(nvar)],
        [f"s{i}\tM" for i in range(nsamp)],
    )
    kept = set(
        int(x)
        for x in rng.choice(nsamp, size=int(rng.integers(0, nsamp + 1)), replace=False)
    )
    q = (
        " || ".join(f'IID=="s{i}"' for i in sorted(kept))
        if kept
        else 'IID=="none"'
    )
    out = os.path.join(tmp_path, "o.vcf")
    filter_to_vcf(prefix, sam_query=q, out_file=out, provider="native")
    expected = scalar_filter_vcf(
        prefix, None, lambda s: int(s["IID"][1:]) in kept
    )
    with open(out, "rb") as f:
        assert f.read() == expected
