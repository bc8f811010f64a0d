"""Multi-process jax.distributed filtering (SURVEY.md §4: multi-host tests
must run without a pod — N local processes + a local coordinator)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from oracle import scalar_filter_vcf

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from pgen_tpu.parallel.distributed import run_distributed_filter
run_distributed_filter(
    {prefix!r},
    var_query={var_query!r},
    out_file={out!r},
    coordinator_address="localhost:{port}",
    num_processes={n},
    process_id=int(sys.argv[1]),
    shared_fs={shared_fs},
)
"""


def _launch(prefix, out, n, port, var_query=None, shared_fs=True):
    script = _WORKER.format(
        repo=str(REPO),
        prefix=prefix,
        var_query=var_query,
        out=str(out),
        port=port,
        n=n,
        shared_fs=shared_fs,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=str(REPO),
        )
        for i in range(n)
    ]
    for p in procs:
        try:
            outb, errb = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, errb.decode()[-2000:]


@pytest.mark.slow
def test_two_process_shared_file(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    out = tmp_path / "dist.vcf"
    _launch(prefix, out, n=2, port=12399, var_query='REF == "A"')
    expected = scalar_filter_vcf(prefix, lambda v: v["REF"] == "A", None)
    assert out.read_bytes() == expected


@pytest.mark.slow
def test_two_process_standalone_shards_concatenate(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    out = tmp_path / "dist.vcf"
    _launch(prefix, out, n=2, port=12401, shared_fs=False)
    got = b"".join(
        (tmp_path / f"dist.vcf.shard{i}").read_bytes() for i in range(2)
    )
    assert got == scalar_filter_vcf(prefix, None, None)
