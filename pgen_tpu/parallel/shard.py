"""Variant-dimension sharding with an order-preserving merge.

The reference is strictly single-threaded (SURVEY.md §2 "Parallelism").
The TPU-native design shards the VARIANT axis — the long axis, up to ~10^6
rows for chr22 — across workers/hosts, per SURVEY.md §7 L4:

* metadata (.pvar/.psam) is small and loaded by every worker, so predicate
  masks, kept-row indices, and therefore every row's exact output byte
  offset are computed *deterministically everywhere*: the ordered merge
  needs no inter-host communication at all. (The generic design's
  all-gather-of-sizes collective degenerates to local arithmetic; the
  device-side collective path lives in parallel/mesh.py.)
* each worker gathers only its contiguous slice of kept variant records
  from the .pgen (its byte range ~ [12 + lo*rec, 12 + hi*rec)) and pwrites
  its rows at the precomputed offset of the shared output file — no host-0
  serialization, stable output order regardless of completion order
  (SURVEY.md §5 "Race detection": order stability is the tested invariant).

Single-process mode runs the shards sequentially (num_shards=N,
shard_index=None); a launcher runs one process per shard with
shard_index=i against the same out_file for true parallel writes.
"""

from __future__ import annotations

import os

import numpy as np

from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.pipeline.filter import (
    FilterResult,
    _emit_block_meta,
    _gather_rows,
    _resolve_provider,
)
from pgen_tpu.pipeline.vcf import DEFAULT_SOURCE_TAG, vcf_header_bytes
from pgen_tpu.query.compile import compile_predicate
from pgen_tpu.utils.timer import StageTimer


def filter_to_vcf_parallel(
    pfile_prefix: str,
    var_query: str | None = None,
    sam_query: str | None = None,
    out_file: str | None = None,
    provider: str = "auto",
    num_workers: int = 2,
    block_variants: int = 1 << 16,
) -> FilterResult:
    """Run the shards in parallel worker processes (fork), one shard each.

    The single-file ordered merge needs no coordination: every worker
    derives the same offsets and pwrites its own byte range. This is the
    single-host stand-in for the multi-host deployment (one process per
    host); fork keeps worker startup free of reimport cost.
    """
    import multiprocessing as mp

    if num_workers <= 1:
        return filter_to_vcf_sharded(
            pfile_prefix,
            var_query=var_query,
            sam_query=sam_query,
            out_file=out_file,
            provider=provider,
            num_shards=1,
            block_variants=block_variants,
        )
    if out_file is None:
        out_file = f"{pfile_prefix}.pgen-rs.vcf"

    ctx = mp.get_context("fork")
    procs = []
    for i in range(num_workers):
        p = ctx.Process(
            target=filter_to_vcf_sharded,
            kwargs=dict(
                pfile_prefix=pfile_prefix,
                var_query=var_query,
                sam_query=sam_query,
                out_file=out_file,
                provider=provider,
                num_shards=num_workers,
                shard_index=i,
                block_variants=block_variants,
            ),
        )
        p.start()
        procs.append(p)
    failed = []
    for i, p in enumerate(procs):
        p.join()
        if p.exitcode != 0:
            failed.append((i, p.exitcode))
    if failed:
        raise RuntimeError(f"shard workers failed: {failed}")
    # summarize with the same mask computation the workers used (handles
    # GT_* genotype-stat variables too)
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.pipeline.filter import compute_masks

    header = read_pgen_header(f"{pfile_prefix}.pgen")
    pvar = read_metadata(f"{pfile_prefix}.pvar")
    psam = read_metadata(f"{pfile_prefix}.psam")
    rec = header.record_size
    mm = np.memmap(f"{pfile_prefix}.pgen", dtype=np.uint8, mode="r")
    records = mm[12 : 12 + header.num_variants * rec].reshape(
        header.num_variants, rec
    )
    var_mask, sam_mask = compute_masks(
        var_query, sam_query, pvar, psam, header, records, _resolve_provider(provider)
    )
    nv = int(var_mask.sum())
    ns = int(sam_mask.sum())
    return FilterResult(
        out_path=str(out_file),
        num_variants_kept=nv,
        num_samples_kept=ns,
        bytes_written=os.path.getsize(out_file),
        timer=StageTimer(),
    )


def plan_shards(num_kept: int, num_shards: int) -> list:
    """Contiguous, balanced partition of kept-variant positions.

    Returns [(lo, hi)] with lo/hi indices into the kept-variant list; shard
    sizes differ by at most 1. Contiguity keeps each shard's .pgen reads a
    single byte range and the output merge order-preserving by construction.
    """
    bounds = [(num_kept * i) // num_shards for i in range(num_shards + 1)]
    return [(bounds[i], bounds[i + 1]) for i in range(num_shards)]


def filter_to_vcf_sharded(
    pfile_prefix: str,
    var_query: str | None = None,
    sam_query: str | None = None,
    out_file: str | None = None,
    provider: str = "auto",
    num_shards: int = 1,
    shard_index: int | None = None,
    block_variants: int = 1 << 16,
    source_tag: str = DEFAULT_SOURCE_TAG,
    standalone: bool = False,
) -> FilterResult:
    """Shard the kept variants over ``num_shards`` workers writing one VCF.

    With shard_index=None all shards run in this process (sequentially);
    otherwise only that shard's rows are written (plus the header, by shard
    0) into the common preallocated output file. With standalone=True the
    shard writes its own bytes from offset 0 of its own file (no shared
    filesystem; files concatenate to the full VCF in shard order).
    """
    provider = _resolve_provider(provider)
    timer = StageTimer()
    if out_file is None:
        out_file = f"{pfile_prefix}.pgen-rs.vcf"
    out_file = str(out_file)
    if out_file.endswith(".gz"):
        raise ValueError(
            "bgzf (.gz) output is not yet supported for sharded writes — "
            "compressed shard sizes aren't precomputable for the offset "
            "merge; run without --shards/--workers"
        )

    with timer.stage("metadata_load"):
        header = read_pgen_header(f"{pfile_prefix}.pgen")
        pvar = read_metadata(f"{pfile_prefix}.pvar")
        psam = read_metadata(f"{pfile_prefix}.psam")
    psam.column_index("IID")

    rec = header.record_size
    pgen_mm = np.memmap(f"{pfile_prefix}.pgen", dtype=np.uint8, mode="r")
    records = pgen_mm[12 : 12 + header.num_variants * rec].reshape(
        header.num_variants, rec
    )

    from pgen_tpu.pipeline.filter import compute_masks

    with timer.stage("predicates"):
        var_mask, sam_mask = compute_masks(
            var_query, sam_query, pvar, psam, header, records, provider
        )
    var_idx = np.flatnonzero(var_mask)
    sam_idx = np.flatnonzero(sam_mask)
    all_iids = psam.get_column_strs("IID")
    sample_ids = [all_iids[i] for i in sam_idx]
    n_kept = len(sam_idx)
    keep_all_fast = n_kept == psam.num_rows == header.num_samples
    sample_idx_arg = None if keep_all_fast else sam_idx.astype(np.int32)

    header_bytes = vcf_header_bytes(pvar, sample_ids, source_tag)
    line_starts_all, line_ends_all = pvar.row_line_spans()
    v_starts = line_starts_all[var_idx]
    v_ends = line_ends_all[var_idx]
    prefix_sizes = np.zeros(len(var_idx) + 1, dtype=np.int64)
    np.cumsum(v_ends - v_starts + 3, out=prefix_sizes[1:])
    row_fixed = 4 * n_kept + 1
    total = len(header_bytes) + int(prefix_sizes[-1]) + len(var_idx) * row_fixed

    # Every worker derives the same shard plan and byte offsets — the
    # order-preserving merge is pure arithmetic.
    shards = plan_shards(len(var_idx), num_shards)

    def shard_byte_start(lo: int) -> int:
        # bytes of all rows before kept-position lo
        return len(header_bytes) + int(prefix_sizes[lo]) + lo * row_fixed

    # Byte base: 0 for the shared file; the shard's own start offset when
    # writing a standalone per-shard file (header only in shard 0's file).
    base = 0
    local_total = total
    if standalone:
        if shard_index is None:
            raise ValueError("standalone mode needs an explicit shard_index")
        s_lo, s_hi = plan_shards(len(var_idx), num_shards)[shard_index]
        base = len(header_bytes) + int(prefix_sizes[s_lo]) + s_lo * row_fixed
        if shard_index == 0:
            base = 0  # shard 0's standalone file carries the header
        local_total = (
            len(header_bytes) + int(prefix_sizes[s_hi]) + s_hi * row_fixed
        ) - base

    fd = os.open(out_file, os.O_RDWR | os.O_CREAT, 0o644)
    try:
        os.ftruncate(fd, local_total)
        my_shards = (
            range(num_shards) if shard_index is None else [shard_index]
        )
        if shard_index is None or shard_index == 0:
            os.pwrite(fd, header_bytes, 0)
        written = 0
        for si in my_shards:
            lo, hi = shards[si]
            pos = shard_byte_start(lo) - base
            for blo in range(lo, hi, block_variants):
                bhi = min(blo + block_variants, hi)
                idx_blk = var_idx[blo:bhi]
                with timer.stage("gather", nbytes=int(len(idx_blk) * rec)):
                    packed_blk = _gather_rows(records, idx_blk)
                cap = int(prefix_sizes[bhi] - prefix_sizes[blo]) + len(idx_blk) * row_fixed
                scratch = np.empty(cap, dtype=np.uint8)
                with timer.stage("emit", nbytes=cap):
                    n = _emit_block_meta(
                        provider,
                        packed_blk,
                        pvar.data_buffer,
                        v_starts[blo:bhi],
                        v_ends[blo:bhi],
                        sample_idx_arg,
                        n_kept,
                        scratch,
                    )
                with timer.stage("pwrite", nbytes=n):
                    os.pwrite(fd, memoryview(scratch[:n]), pos)
                pos += n
                written += n
            assert pos == shard_byte_start(hi) - base, "shard offset accounting bug"
    finally:
        os.close(fd)

    return FilterResult(
        out_path=out_file,
        num_variants_kept=len(var_idx),
        num_samples_kept=n_kept,
        bytes_written=written + (len(header_bytes) if 0 in list(my_shards) or shard_index is None else 0),
        timer=timer,
    )
