"""`pgen-tpu diff`: genotype concordance between two filesets.

The plink2 `--pgen-diff` analog — an extension (the reference's scope
is query/filter, /root/reference/README.md:3-5). Variants are matched
on CHROM:POS:REF:ALT (or CHROM:POS with ``--key pos``, isec's keying),
samples on shared IIDs, and every matched (variant, sample) cell is
compared across the two packed matrices blockwise-vectorized. Output is
a plink2 `.pdiff`-flavored TSV of the DISCORDANT calls:

    #CHROM POS ID IID GT1 GT2

(GT as 0/0, 0/1, 1/1, ./.), one row per mismatching call, variants in
fileset-A order then sample order, plus a summary line on stderr.

Conventions pinned here (documented, testable):
  * Duplicate keys: the FIRST occurrence on each side participates.
  * Missing-vs-called pairs are NOT counted as discordant by default —
    plink2's --pgen-diff likewise skips half-missing pairs unless the
    ``include-missing`` modifier is given; ``--include-missing`` opts
    into counting them.
  * CHROM/POS/ID columns come from fileset A's pvar.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.pipeline.isec import _load_side, _variant_keys
from pgen_tpu.utils.timer import StageTimer

_GT = ["0/0", "0/1", "1/1", "./."]


@dataclass
class DiffResult:
    num_variants: int      # matched variant pairs
    num_samples: int       # shared samples
    num_discordant: int
    num_cells: int         # compared (variant, sample) cells
    out_path: str | None
    timer: StageTimer = field(default_factory=StageTimer)


def _first_occurrence_match(ka: np.ndarray, kb: np.ndarray):
    """(aidx, bidx): for each A key present in B, the first matching row
    on each side. Vectorized: stable argsort + searchsorted."""
    # first occurrence per duplicate A key
    _, a_first = np.unique(ka, return_index=True)
    a_first.sort()
    ka_f = ka[a_first]
    order = np.argsort(kb, kind="stable")
    skb = kb[order]
    pos = np.searchsorted(skb, ka_f)
    pos_c = np.minimum(pos, max(len(skb) - 1, 0))
    valid = (pos < len(skb)) & (skb[pos_c] == ka_f) if len(skb) else (
        np.zeros(len(ka_f), dtype=bool)
    )
    aidx = a_first[valid]
    bidx = order[pos[valid]]
    return aidx, bidx


def diff_pgen(
    prefix_a: str,
    prefix_b: str,
    out_file: str | None = None,
    key: str = "full",
    include_missing: bool = False,
    block_variants: int = 1 << 13,
    out=None,
    per_sample: bool = False,
) -> DiffResult:
    """per_sample=True additionally writes {out}.sdiff — per shared
    sample: DIFF_CT, CMP_CT (compared cells; excludes both-missing and,
    unless --include-missing, half-missing pairs), CONCORDANCE — the
    plink2 --sample-diff counts analog."""
    if key not in ("full", "pos"):
        raise ValueError(f"--key must be 'full' or 'pos', got {key!r}")
    timer = StageTimer()
    ha, pa, ra = _load_side(prefix_a)
    hb, pb, rb = _load_side(prefix_b)
    psa = read_metadata(f"{prefix_a}.psam")
    psb = read_metadata(f"{prefix_b}.psam")

    with timer.stage("keys"):
        aidx, bidx = _first_occurrence_match(
            _variant_keys(pa, key), _variant_keys(pb, key)
        )
    iids_a = psa.get_column_strs("IID")
    iids_b = psb.get_column_strs("IID")
    b_by_iid = {}
    for i, iid in enumerate(iids_b):
        b_by_iid.setdefault(iid, i)  # first occurrence
    seen = set()
    sa, sb, shared_iids = [], [], []
    for i, iid in enumerate(iids_a):
        j = b_by_iid.get(iid)
        if j is not None and iid not in seen:
            seen.add(iid)
            sa.append(i)
            sb.append(j)
            shared_iids.append(iid)
    sa = np.asarray(sa, dtype=np.int64)
    sb = np.asarray(sb, dtype=np.int64)

    from pgen_tpu.ops.unpack_host import unpack_codes_numpy
    from pgen_tpu.pipeline.filter import _gather_rows

    chroms = pa.get_column_strs("CHROM")
    poss = pa.get_column_strs("POS")
    ids = pa.get_column_strs("ID")

    n_disc = 0
    nv, ns = len(aidx), len(sa)
    s_diff = np.zeros(ns, dtype=np.int64)
    s_cmp = np.zeros(ns, dtype=np.int64)

    def emit(fh):
        nonlocal n_disc
        fh.write("#CHROM\tPOS\tID\tIID\tGT1\tGT2\n")
        bv = max(int(block_variants), 1)
        for lo in range(0, nv, bv):
            ab = aidx[lo : lo + bv]
            bb = bidx[lo : lo + bv]
            ca = unpack_codes_numpy(_gather_rows(ra, ab), ha.num_samples)[:, sa]
            cb = unpack_codes_numpy(_gather_rows(rb, bb), hb.num_samples)[:, sb]
            neq = ca != cb
            if include_missing:
                called = (ca != 3) | (cb != 3)  # both-missing never compares
            else:
                # plink2 default: half-missing pairs neither compare nor diff
                called = (ca != 3) & (cb != 3)
                neq &= called
            for r, c in zip(*np.nonzero(neq)):
                v = int(ab[r])
                fh.write(
                    f"{chroms[v]}\t{poss[v]}\t{ids[v]}\t{shared_iids[c]}\t"
                    f"{_GT[ca[r, c]]}\t{_GT[cb[r, c]]}\n"
                )
            n_disc += int(neq.sum())
            s_diff[:] += neq.sum(axis=0)
            s_cmp[:] += called.sum(axis=0)

    with timer.stage("compare", nv * (ha.record_size + hb.record_size)):
        if out is not None:
            emit(out)
            out_path = None
        else:
            out_path = out_file or f"{prefix_a}.pdiff"
            with open(out_path, "w") as fh:
                emit(fh)
    if per_sample:
        sdiff_path = f"{out_path or prefix_a}.sdiff"
        with timer.stage("sdiff_emit"), open(sdiff_path, "w") as fh:
            fh.write("#IID\tDIFF_CT\tCMP_CT\tCONCORDANCE\n")
            for c in range(ns):
                conc = (
                    f"{1.0 - s_diff[c] / s_cmp[c]:.6g}" if s_cmp[c] else "NA"
                )
                fh.write(f"{shared_iids[c]}\t{s_diff[c]}\t{s_cmp[c]}\t"
                         f"{conc}\n")
    return DiffResult(
        num_variants=nv,
        num_samples=ns,
        num_discordant=n_disc,
        num_cells=nv * ns,
        out_path=out_path,
        timer=timer,
    )
