"""`pgen-tpu stats`: dataset-level genotype summary.

A bcftools-stats-flavored report computed from one pass over the packed
matrix (ops/gt_stats reductions — no decode to text). Supports the same
--include-var/--include-sam predicates as filter, so the summary covers an
arbitrary cohort/variant subset. Output goes to stdout as TSV-ish lines
(stable, greppable); diagnostics to stderr.
"""

from __future__ import annotations

import sys

import numpy as np

from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.pipeline.filter import _gather_rows, _resolve_provider, compute_masks


def genotype_stats(
    pfile_prefix: str,
    var_query: str | None = None,
    sam_query: str | None = None,
    provider: str = "auto",
    per_sample: bool = False,
    out=None,
) -> dict:
    provider = _resolve_provider(provider)
    out = sys.stdout if out is None else out

    header = read_pgen_header(f"{pfile_prefix}.pgen")
    pvar = read_metadata(f"{pfile_prefix}.pvar")
    psam = read_metadata(f"{pfile_prefix}.psam")
    psam.column_index("IID")

    rec = header.record_size
    mm = np.memmap(f"{pfile_prefix}.pgen", dtype=np.uint8, mode="r")
    records = mm[12 : 12 + header.num_variants * rec].reshape(
        header.num_variants, rec
    )
    var_mask, sam_mask = compute_masks(
        var_query, sam_query, pvar, psam, header, records, provider
    )
    var_idx = np.flatnonzero(var_mask)
    sam_idx = np.flatnonzero(sam_mask)
    kept = _gather_rows(records, var_idx)

    from pgen_tpu.ops.gt_stats import gt_counts, gt_counts_subset

    if len(sam_idx) == header.num_samples:
        counts = gt_counts(kept, header.num_samples, provider)
    else:
        counts = gt_counts_subset(kept, sam_idx.astype(np.int32), provider)

    n_var = len(var_idx)
    n_sam = len(sam_idx)
    tot = counts.sum(axis=0)  # (4,)
    calls = int(tot.sum())
    missing = int(tot[3])
    called = calls - missing
    ac = counts[:, 1] + 2 * counts[:, 2]
    an = 2 * (counts[:, 0] + counts[:, 1] + counts[:, 2])
    nonref = int((ac > 0).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        af = np.where(an > 0, ac / np.maximum(an, 1), 0.0)
    singletons = int((ac == 1).sum())
    stats = {
        "variants": n_var,
        "samples": n_sam,
        "genotypes": calls,
        "hom_ref": int(tot[0]),
        "het": int(tot[1]),
        "hom_alt": int(tot[2]),
        "missing": missing,
        "missing_rate": missing / calls if calls else 0.0,
        "nonref_variants": nonref,
        "singletons": singletons,
        "mean_af": float(af.mean()) if n_var else 0.0,
        "het_hom_ratio": (int(tot[1]) / int(tot[2])) if tot[2] else float("inf"),
    }
    for k, v in stats.items():
        if isinstance(v, float):
            out.write(f"{k}\t{v:.6g}\n")
        else:
            out.write(f"{k}\t{v}\n")

    if per_sample:
        # column-axis reduction over the kept variants' records; computed
        # for all samples (one pass), reported for the kept cohort
        from pgen_tpu.ops.gt_stats import sample_counts

        sc = sample_counts(kept, header.num_samples, provider)[sam_idx]
        iids = psam.get_column_strs("IID")
        out.write("#IID\tHOM_REF\tHET\tHOM_ALT\tMISSING\tNOBS\tMISSING_RATE\n")
        for row, s in enumerate(sam_idx):
            hr, het_n, ha, mi = (int(x) for x in sc[row])
            nobs = hr + het_n + ha
            rate = mi / n_var if n_var else 0.0
            out.write(
                f"{iids[int(s)]}\t{hr}\t{het_n}\t{ha}\t{mi}\t{nobs}\t{rate:.6g}\n"
            )
        stats["per_sample"] = sc
    return stats
