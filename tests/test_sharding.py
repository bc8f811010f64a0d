"""Sharded filtering + the device-mesh step (SURVEY.md §7 L4).

Invariants: byte-identical output regardless of shard count, execution
order, or which worker writes first (order-preserving merge); the mesh
step's all-gathered counts/offsets match host arithmetic.
"""

import numpy as np
import pytest

from pgen_tpu.parallel.shard import filter_to_vcf_sharded, plan_shards
from pgen_tpu.pipeline.filter import filter_to_vcf

from oracle import scalar_filter_vcf


def _read(p):
    with open(p, "rb") as f:
        return f.read()


def test_plan_shards_balanced_contiguous():
    shards = plan_shards(10, 3)
    assert shards == [(0, 3), (3, 6), (6, 10)]
    assert plan_shards(2, 4) == [(0, 0), (0, 1), (1, 1), (1, 2)]
    assert plan_shards(0, 2) == [(0, 0), (0, 0)]


@pytest.mark.parametrize("num_shards", [1, 2, 3, 5])
def test_sharded_matches_unsharded(tiny_fileset, tmp_path, num_shards):
    prefix, _ = tiny_fileset
    a = tmp_path / "one.vcf"
    b = tmp_path / "many.vcf"
    filter_to_vcf(prefix, var_query='REF == "A"', out_file=a)
    filter_to_vcf_sharded(
        prefix, var_query='REF == "A"', out_file=b, num_shards=num_shards
    )
    assert _read(a) == _read(b)


def test_shard_workers_any_order(tiny_fileset, tmp_path):
    """Each worker writes its own shard; completion order must not matter."""
    prefix, _ = tiny_fileset
    out = tmp_path / "w.vcf"
    for si in (2, 0, 1):  # out of order
        filter_to_vcf_sharded(prefix, out_file=out, num_shards=3, shard_index=si)
    assert _read(out) == scalar_filter_vcf(prefix, None, None)


def test_sharded_basic1(basic1_prefix, tmp_path):
    out1 = tmp_path / "u.vcf"
    out4 = tmp_path / "s.vcf"
    q = 'ALT == "G"'
    filter_to_vcf(basic1_prefix, var_query=q, out_file=out1)
    filter_to_vcf_sharded(basic1_prefix, var_query=q, out_file=out4, num_shards=4)
    assert _read(out1) == _read(out4)


# -- device mesh -----------------------------------------------------------


def test_mesh_has_8_cpu_devices():
    import jax

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


def test_sharded_filter_step():
    import jax
    import jax.numpy as jnp

    from pgen_tpu.ops.gt_text import genotype_text_reference
    from pgen_tpu.ops.unpack import unpack_codes_reference
    from pgen_tpu.parallel.mesh import build_sharded_filter_step, make_mesh

    mesh = make_mesh()
    ndev = len(jax.devices())
    nvar, nsamp = 16 * ndev, 12
    rec = (2 * nsamp + 7) // 8
    rng = np.random.default_rng(0)
    packed = rng.integers(0, 256, size=(nvar, rec), dtype=np.uint8)
    mask = rng.random(nvar) < 0.4

    step = build_sharded_filter_step(mesh)
    text_words, counts, offsets = jax.block_until_ready(
        step(jnp.asarray(packed), jnp.asarray(mask))
    )

    # counts/offsets: per-shard kept counts and exclusive cumsum
    per = nvar // ndev
    exp_counts = [int(mask[i * per : (i + 1) * per].sum()) for i in range(ndev)]
    assert np.asarray(counts).tolist() == exp_counts
    assert np.asarray(offsets).tolist() == np.concatenate(
        [[0], np.cumsum(exp_counts)[:-1]]
    ).tolist()

    # each shard's leading `count` rows are its kept variants, in order,
    # decoded to text words (LE bytes == the VCF GT text)
    tw = np.asarray(text_words)
    for d in range(ndev):
        local = slice(d * per, (d + 1) * per)
        kept = np.flatnonzero(mask[local])
        exp_codes = unpack_codes_reference(packed[local][kept], 4 * rec)
        exp_text = genotype_text_reference(exp_codes)
        got = tw[local][: len(kept)]
        assert got.view(np.uint8).reshape(len(kept), -1).tolist() == exp_text.tolist()


def test_sharded_predicate_step():
    import jax
    import jax.numpy as jnp

    from pgen_tpu.parallel.mesh import (
        build_sharded_predicate_and_filter_step,
        make_mesh,
    )
    from pgen_tpu.query.parser import parse

    mesh = make_mesh()
    ndev = len(jax.devices())
    nvar = 8 * ndev
    rec = 3
    rng = np.random.default_rng(4)
    packed = rng.integers(0, 256, size=(nvar, rec), dtype=np.uint8)
    alts = rng.choice([b"G", b"TT", b"A"], nvar)
    width = 2
    mat = np.zeros((nvar, width), dtype=np.uint8)
    for i, a in enumerate(alts):
        mat[i, : len(a)] = np.frombuffer(a, np.uint8)
    lens = np.array([len(a) for a in alts], np.int32)

    expr = parse('ALT == "G"')
    step = build_sharded_predicate_and_filter_step(mesh, expr, ["ALT"])
    text_words, counts, offsets = jax.block_until_ready(
        step(jnp.asarray(packed), {"ALT": (jnp.asarray(mat), jnp.asarray(lens))})
    )
    per = nvar // ndev
    exp_mask = alts == b"G"
    exp_counts = [int(exp_mask[i * per : (i + 1) * per].sum()) for i in range(ndev)]
    assert np.asarray(counts).tolist() == exp_counts
    assert int(np.asarray(counts).sum()) == int(exp_mask.sum())


@pytest.mark.parametrize("workers", [1, 2, 3])
def test_parallel_workers_match(tiny_fileset, tmp_path, workers):
    from pgen_tpu.parallel.shard import filter_to_vcf_parallel

    prefix, _ = tiny_fileset
    a = tmp_path / "seq.vcf"
    b = tmp_path / "par.vcf"
    filter_to_vcf(prefix, var_query='REF == "A"', out_file=a)
    res = filter_to_vcf_parallel(
        prefix, var_query='REF == "A"', out_file=b, num_workers=workers
    )
    assert _read(a) == _read(b)
    assert res.num_variants_kept == 5


@pytest.mark.parametrize("suffix", [".vcf", ".vcf.gz"])
def test_worker_failure_manifest_and_resume(
    tiny_fileset, tmp_path, monkeypatch, suffix
):
    """Kill-a-worker recovery (SURVEY.md §5 checkpoint/resume): a failed
    shard leaves a manifest recording the completed shards; --resume
    re-runs only the failed one and completes the byte-identical file."""
    import json

    from pgen_tpu.parallel.shard import filter_to_vcf_parallel

    prefix, _ = tiny_fileset
    ref = tmp_path / ("ref" + suffix)
    out = tmp_path / ("out" + suffix)
    filter_to_vcf(prefix, out_file=ref)

    monkeypatch.setenv("PGEN_TPU_TEST_FAIL_SHARD", "1")
    with pytest.raises(RuntimeError, match="resume"):
        filter_to_vcf_parallel(prefix, out_file=str(out), num_workers=3)
    mpath = tmp_path / (out.name + ".manifest.json")
    manifest = json.loads(mpath.read_text())
    statuses = [s["status"] for s in manifest["shards"]]
    assert statuses[1] == "failed"
    assert statuses[0] == statuses[2] == "done"

    monkeypatch.delenv("PGEN_TPU_TEST_FAIL_SHARD")
    res = filter_to_vcf_parallel(
        prefix, out_file=str(out), num_workers=3, resume=True
    )
    if suffix.endswith(".gz"):
        import gzip

        assert gzip.decompress(out.read_bytes()) == gzip.decompress(
            ref.read_bytes()
        )
    else:
        assert _read(out) == _read(ref)
    assert res.num_variants_kept == 5
    assert not mpath.exists()


def test_resume_rejects_changed_params(tiny_fileset, tmp_path, monkeypatch):
    from pgen_tpu.parallel.shard import filter_to_vcf_parallel

    prefix, _ = tiny_fileset
    out = tmp_path / "o.vcf"
    monkeypatch.setenv("PGEN_TPU_TEST_FAIL_SHARD", "0")
    with pytest.raises(RuntimeError):
        filter_to_vcf_parallel(prefix, out_file=str(out), num_workers=2)
    monkeypatch.delenv("PGEN_TPU_TEST_FAIL_SHARD")
    with pytest.raises(ValueError, match="different parameters"):
        filter_to_vcf_parallel(
            prefix,
            var_query='REF == "A"',
            out_file=str(out),
            num_workers=2,
            resume=True,
        )


def test_parallel_parent_does_not_recompute_masks(
    tiny_fileset, tmp_path, monkeypatch
):
    """The parent must take kept counts from the workers' reports — a
    second predicate/GT pass in the parent would double the work for GT_*
    queries. Spawn-context workers get fresh modules, so poisoning
    compute_masks in the parent only detects a parent-side call."""
    from pgen_tpu.parallel.shard import filter_to_vcf_parallel
    import pgen_tpu.pipeline.filter as fmod

    def _boom(*a, **k):  # pragma: no cover
        raise AssertionError("parent recomputed the masks")

    monkeypatch.setenv("PGEN_TPU_MP_CONTEXT", "spawn")
    monkeypatch.setattr(fmod, "compute_masks", _boom)
    prefix, _ = tiny_fileset
    out = tmp_path / "n.vcf"
    res = filter_to_vcf_parallel(prefix, out_file=str(out), num_workers=2)
    assert res.num_variants_kept == 5
    assert _read(out) == scalar_filter_vcf(prefix, None, None)


def test_shard_rerun_idempotent(tiny_fileset, tmp_path):
    """A shard is a resumable unit: re-running any shard (e.g. after a
    worker failure) leaves the output byte-identical (SURVEY.md §5
    checkpoint/resume: per-shard outputs are implicitly resumable)."""
    prefix, _ = tiny_fileset
    out = tmp_path / "r.vcf"
    for si in range(3):
        filter_to_vcf_sharded(prefix, out_file=out, num_shards=3, shard_index=si)
    first = _read(out)
    filter_to_vcf_sharded(prefix, out_file=out, num_shards=3, shard_index=1)
    filter_to_vcf_sharded(prefix, out_file=out, num_shards=3, shard_index=1)
    assert _read(out) == first == scalar_filter_vcf(prefix, None, None)
