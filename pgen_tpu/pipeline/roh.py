"""`pgen-tpu roh`: runs of homozygosity (plink --homozyg analog).

An extension — the reference's scope stops at query/filter
(/root/reference/README.md:3-5). Accepts the same include/exclude
predicates, regions, and sample lists as `filter`, runs the vectorized
windowed scan (ops/roh.py) per chromosome, and writes plink-flavored
reports:

    {out}.hom        #IID CHROM SNP1 SNP2 POS1 POS2 KB NSNP NHET NMISS DENSITY
    {out}.hom.indiv  #IID NSEG KB KBAVG

one .hom row per called segment (samples in psam order, segments in
position order), KB = (POS2-POS1)/1000, DENSITY = KB/NSNP; .hom.indiv
totals cover every kept sample (zero rows included, like plink).

Variants are scanned in fileset order and must be grouped by
chromosome with ascending positions for meaningful output (run
`pgen-tpu sort` first if unsure) — each contiguous CHROM run is scanned
independently, windows never span runs.

Memory: the scan materializes two (V_kept, S_kept) byte matrices
(het/missing) — 2 bytes per genotype; chromosome-at-a-time slices of
the unpacked code matrix are released between chromosomes.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.ops.roh import RohParams, roh_segments_chrom
from pgen_tpu.pipeline.filter import _gather_rows, _resolve_provider, compute_masks
from pgen_tpu.utils.timer import StageTimer


@dataclass
class RohResult:
    num_variants: int
    num_samples: int
    num_segments: int
    out_paths: list
    timer: StageTimer = field(default_factory=StageTimer)


def _chrom_runs(chroms: list):
    """Maximal contiguous runs of equal CHROM value: [(chrom, lo, hi))."""
    runs = []
    lo = 0
    for i in range(1, len(chroms) + 1):
        if i == len(chroms) or chroms[i] != chroms[lo]:
            runs.append((chroms[lo], lo, i))
            lo = i
    return runs


def roh_report(
    pfile_prefix: str,
    out_prefix: str | None = None,
    var_query: str | None = None,
    sam_query: str | None = None,
    provider: str = "auto",
    params: RohParams = RohParams(),
    block_variants: int = 1 << 13,
) -> RohResult:
    provider = _resolve_provider(provider)
    timer = StageTimer()

    header = read_pgen_header(f"{pfile_prefix}.pgen")
    pvar = read_metadata(f"{pfile_prefix}.pvar")
    psam = read_metadata(f"{pfile_prefix}.psam")
    psam.column_index("IID")

    rec = header.record_size
    mm = np.memmap(f"{pfile_prefix}.pgen", dtype=np.uint8, mode="r")
    records = mm[12 : 12 + header.num_variants * rec].reshape(
        header.num_variants, rec
    )
    with timer.stage("predicates"):
        var_mask, sam_mask = compute_masks(
            var_query, sam_query, pvar, psam, header, records, provider
        )
        var_idx = np.flatnonzero(var_mask)
        sam_idx = np.flatnonzero(sam_mask)
    nv, ns = len(var_idx), len(sam_idx)

    with timer.stage("gather", nv * rec):
        kept = _gather_rows(records, var_idx)

    all_chroms = pvar.get_column_strs("CHROM")
    all_pos = pvar.get_column_strs("POS")
    all_ids = pvar.get_column_strs("ID")
    chroms = [all_chroms[int(v)] for v in var_idx]
    try:
        pos = np.array([int(all_pos[int(v)]) for v in var_idx], dtype=np.int64)
    except ValueError as e:
        raise ValueError(f"roh: non-integer POS in {pvar.path}: {e}") from None

    # het/miss bool matrices, built blockwise from the packed rows
    from pgen_tpu.ops.unpack_host import unpack_codes_numpy

    subset = sam_idx if ns != header.num_samples else None
    het = np.empty((nv, ns), dtype=bool)
    miss = np.empty((nv, ns), dtype=bool)
    with timer.stage("decode", nv * rec):
        bv = max(int(block_variants), 1)
        for lo in range(0, nv, bv):
            blk = unpack_codes_numpy(kept[lo : lo + bv], header.num_samples)
            if subset is not None:
                blk = blk[:, subset]
            het[lo : lo + blk.shape[0]] = blk == 1
            miss[lo : lo + blk.shape[0]] = blk == 3

    segs = []
    with timer.stage("scan", 2 * nv * ns):
        for chrom, lo, hi in _chrom_runs(chroms):
            segs.extend(roh_segments_chrom(
                chrom, pos[lo:hi], het[lo:hi], miss[lo:hi], params,
                row_offset=lo,
            ))
    # psam order by sample, then position order (scan yields position
    # order per chromosome already)
    segs.sort(key=lambda g: (g.sample, g.lo))

    iids = psam.get_column_strs("IID")
    kept_iids = [iids[int(s)] for s in sam_idx]
    kept_ids = [all_ids[int(v)] for v in var_idx]

    out_prefix = out_prefix or pfile_prefix
    hom_path = f"{out_prefix}.hom"
    indiv_path = f"{out_prefix}.hom.indiv"
    per_sample_n = np.zeros(ns, dtype=np.int64)
    per_sample_kb = np.zeros(ns, dtype=np.float64)
    with timer.stage("emit"):
        with open(hom_path, "w") as fh:
            fh.write("#IID\tCHROM\tSNP1\tSNP2\tPOS1\tPOS2\tKB\tNSNP\t"
                     "NHET\tNMISS\tDENSITY\n")
            for g in segs:
                kb = (g.pos2 - g.pos1) / 1000.0
                per_sample_n[g.sample] += 1
                per_sample_kb[g.sample] += kb
                fh.write(
                    f"{kept_iids[g.sample]}\t{g.chrom}\t{kept_ids[g.lo]}\t"
                    f"{kept_ids[g.hi]}\t{g.pos1}\t{g.pos2}\t{kb:.3f}\t"
                    f"{g.nsnp}\t{g.nhet}\t{g.nmiss}\t{kb / g.nsnp:.4f}\n"
                )
        with open(indiv_path, "w") as fh:
            fh.write("#IID\tNSEG\tKB\tKBAVG\n")
            for s in range(ns):
                avg = per_sample_kb[s] / per_sample_n[s] if per_sample_n[s] else 0.0
                fh.write(f"{kept_iids[s]}\t{per_sample_n[s]}\t"
                         f"{per_sample_kb[s]:.3f}\t{avg:.3f}\n")
    return RohResult(
        num_variants=nv,
        num_samples=ns,
        num_segments=len(segs),
        out_paths=[hom_path, indiv_path],
        timer=timer,
    )
