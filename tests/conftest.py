"""Test configuration: force an 8-device CPU JAX platform.

Set BEFORE jax imports so device-path tests exercise the same sharding code
that runs on a real pod slice (SURVEY.md §4: multi-host tests must be
CI-runnable without TPUs).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# some environments inject a site hook that pins jax_platforms to a TPU
# plugin; force the CPU platform regardless so tests run the 8-device mesh
jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np
import pytest

from pgen_tpu.formats.writer import write_pgen


@pytest.fixture(scope="session")
def data_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("fixtures")


def build_fileset(
    dirpath,
    name: str,
    codes: np.ndarray,
    pvar_rows: list,
    psam_rows: list,
    pvar_comments: str = "##fileformat=VCFv4.2\n##source=test\n",
    pvar_columns: str = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    psam_columns: str = "#IID\tSEX",
):
    """Write a tiny pgen/pvar/psam triple; returns the prefix path."""
    prefix = Path(dirpath) / name
    write_pgen(f"{prefix}.pgen", codes)
    with open(f"{prefix}.pvar", "w") as f:
        f.write(pvar_comments)
        f.write(pvar_columns + "\n")
        f.writelines(r + "\n" for r in pvar_rows)
    with open(f"{prefix}.psam", "w") as f:
        f.write(psam_columns + "\n")
        f.writelines(r + "\n" for r in psam_rows)
    return str(prefix)


@pytest.fixture()
def tiny_fileset(tmp_path):
    """5 variants x 6 samples with every code value exercised."""
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=(5, 6), dtype=np.uint8)
    codes[0, :4] = [0, 1, 2, 3]  # pin all four tokens
    pvar_rows = [
        f"1\t{100+i}\trs{i}\tA\tG\t100\tPASS\tAF=0.{i}" for i in range(5)
    ]
    psam_rows = [f"s{i}\t{'F' if i % 2 else 'M'}" for i in range(6)]
    prefix = build_fileset(tmp_path, "tiny", codes, pvar_rows, psam_rows)
    return prefix, codes


@pytest.fixture(scope="session")
def basic1_prefix(data_dir):
    from make_fixtures import ensure_basic1

    return str(ensure_basic1(Path(data_dir)))
