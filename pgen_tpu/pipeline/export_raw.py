"""`pgen-tpu export`: sample-major additive dosage matrix (.raw).

The plink2 `--export A` / `--export AD` analog — an extension (the
reference emits VCF only, /root/reference/src/pfile.rs:104-194). Writes
the tab-delimited .raw layout downstream R/statsmodels tooling consumes:

    FID IID PAT MAT SEX PHENOTYPE  <ID>_<ALT> ...            (format A)
    FID IID PAT MAT SEX PHENOTYPE  <ID>_<ALT> <ID>_HET ...   (format AD)

one row per kept sample, one (A) or two (AD) columns per kept variant.
Cell values are ALT-allele counts 0/1/2 (the framework's code value IS
the ALT dosage: 2-bit code 0=0/0, 1=0/1, 2=1/1 — pfile.rs:177-183), with
`NA` for missing; AD's _HET column is the dominant-deviation indicator
(1 = het, else 0, NA if missing).

Conventions pinned here (documented, testable):
  * Counted allele = ALT, column named `ID_ALT` — matching the glm/score
    dosage convention (ALT-allele count), plink2's default counting.
  * FID from the psam FID column when present, else `0`; PAT/MAT from
    psam when present, else `0`; SEX passes through psam (`M`->1,
    `F`->2, `1`/`2` kept, anything else `NA`); PHENOTYPE from the psam
    PHENO1 column when present (`-9`, `.`, `` -> `NA`), else `NA`.
  * Tab-delimited (plink2's .raw is tab-delimited; plink 1.9's was
    space) with a literal `FID` header first cell.

Text emission is vectorized: each sample row's genotype text comes from
one (4, W)-byte token-table gather over the codes row, `tobytes()`, and
a single C-speed `replace` that rewrites the fixed-width missing token
`\t.` to `\tNA` — no per-cell Python. The (S_kept, V_kept) code matrix
is materialized once (1 byte/cell; document: chr22-scale 2504 x 1M =
2.5 GB — export a subset for biobank-wide matrices).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

import numpy as np

from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.pipeline.filter import _gather_rows, _resolve_provider, compute_masks
from pgen_tpu.utils.timer import StageTimer

# token tables: code -> emitted bytes, fixed width so one np.take +
# tobytes() builds the row; the "\t." missing cell widens to "\tNA" in a
# single bytes.replace afterwards (no other "\t." can occur: every other
# cell is a digit)
_TOKENS_A = np.frombuffer(b"\t0\t1\t2\t.", dtype=np.uint8).reshape(4, 2)
_TOKENS_AD = np.frombuffer(
    b"\t0\t0\t1\t1\t2\t0\t.\t.", dtype=np.uint8
).reshape(4, 4)


@dataclass
class ExportResult:
    fmt: str
    num_variants: int
    num_samples: int
    out_path: str | None
    timer: StageTimer = field(default_factory=StageTimer)


def _sex_str(v: str) -> str:
    v = v.strip()
    if v in ("1", "M", "m"):
        return "1"
    if v in ("2", "F", "f"):
        return "2"
    return "NA"


def _pheno_str(v: str) -> str:
    v = v.strip()
    return "NA" if v in ("-9", ".", "") else v


def _sample_prefixes(psam, sam_idx) -> list:
    """FID IID PAT MAT SEX PHENOTYPE prefix cells per kept sample."""
    iids = psam.get_column_strs("IID")

    def col_or(name, default):
        if name in psam.columns:
            return psam.get_column_strs(name)
        return None if default is None else [default] * psam.num_rows

    fids = col_or("FID", "0")
    pats = col_or("PAT", "0")
    mats = col_or("MAT", "0")
    sexes = col_or("SEX", None)
    phenos = col_or("PHENO1", None)
    out = []
    for s in sam_idx:
        s = int(s)
        sex = _sex_str(sexes[s]) if sexes is not None else "NA"
        ph = _pheno_str(phenos[s]) if phenos is not None else "NA"
        out.append(f"{fids[s]}\t{iids[s]}\t{pats[s]}\t{mats[s]}\t{sex}\t{ph}")
    return out


def export_raw(
    pfile_prefix: str,
    fmt: str = "A",
    out_file: str | None = None,
    var_query: str | None = None,
    sam_query: str | None = None,
    provider: str = "auto",
    block_variants: int = 1 << 13,
    out=None,
) -> ExportResult:
    if fmt not in ("A", "AD"):
        raise ValueError(f"export format must be A or AD, got {fmt!r}")
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

    # sample-major code matrix: blocked unpack + transposed stores
    from pgen_tpu.ops.unpack_host import unpack_codes_numpy

    with timer.stage("gather", nv * rec):
        kept = _gather_rows(records, var_idx)
    codes_sm = np.empty((ns, nv), dtype=np.uint8)
    subset = sam_idx if ns != header.num_samples else None
    with timer.stage("decode", nv * rec):
        bv = max(int(block_variants), 1)
        for lo in range(0, nv, bv):
            blk = unpack_codes_numpy(kept[lo : lo + bv], header.num_samples)
            if subset is not None:
                blk = blk[:, subset]
            codes_sm[:, lo : lo + blk.shape[0]] = blk.T

    ids = pvar.get_column_strs("ID")
    alts = pvar.get_column_strs("ALT")
    heads = []
    for v in var_idx:
        v = int(v)
        heads.append(f"{ids[v]}_{alts[v]}")
        if fmt == "AD":
            heads.append(f"{ids[v]}_HET")
    prefixes = _sample_prefixes(psam, sam_idx)
    tokens = _TOKENS_A if fmt == "A" else _TOKENS_AD

    def emit(fh):
        head = "FID\tIID\tPAT\tMAT\tSEX\tPHENOTYPE"
        if heads:
            head += "\t" + "\t".join(heads)
        fh.write((head + "\n").encode())
        for s in range(ns):
            row = tokens[codes_sm[s]].tobytes().replace(b"\t.", b"\tNA")
            fh.write(prefixes[s].encode() + row + b"\n")

    with timer.stage("emit", ns * nv * (2 if fmt == "A" else 4)):
        if out is not None:
            emit(out)
            out_path = None
        else:
            out_path = out_file or f"{pfile_prefix}.raw"
            with open(out_path, "wb") as fh:
                emit(fh)
    return ExportResult(
        fmt=fmt,
        num_variants=nv,
        num_samples=ns,
        out_path=out_path,
        timer=timer,
    )


def _ped_prefixes(psam, sam_idx) -> list:
    """PLINK1 .ped leading fields: FID IID PAT MAT SEX PHENO with the
    classic conventions (unknown sex -> 0, missing phenotype -> -9)."""
    iids = psam.get_column_strs("IID")

    def col_or(name):
        return psam.get_column_strs(name) if name in psam.columns else None

    fids = col_or("FID")
    pats = col_or("PAT")
    mats = col_or("MAT")
    sexes = col_or("SEX")
    phenos = col_or("PHENO1")
    out = []
    for s in sam_idx:
        s = int(s)
        sex = "0"
        if sexes is not None:
            v = sexes[s].strip()
            sex = "1" if v in ("1", "M", "m") else (
                "2" if v in ("2", "F", "f") else "0"
            )
        ph = "-9"
        if phenos is not None:
            v = phenos[s].strip()
            ph = v if v not in ("-9", ".", "") else "-9"
        out.append(
            f"{fids[s] if fids else '0'}\t{iids[s]}\t"
            f"{pats[s] if pats else '0'}\t{mats[s] if mats else '0'}\t"
            f"{sex}\t{ph}"
        )
    return out


def export_ped(
    pfile_prefix: str,
    out_prefix: str | None = None,
    var_query: str | None = None,
    sam_query: str | None = None,
    provider: str = "auto",
    block_variants: int = 1 << 13,
) -> ExportResult:
    """plink2 `--export ped` analog: writes {out}.ped / {out}.map.

    .map rows: CHROM ID 0 POS (tab-delimited). .ped rows: the six
    classic leading fields then one `\\tA1\\tA2` allele pair per kept
    variant — code 0 -> REF REF, 1 -> REF ALT, 2 -> ALT ALT,
    3 -> 0 0 (2-bit code semantics per pfile.rs:177-183).

    Emission is vectorized along two paths: when every REF/ALT is a
    single base, each variant's four possible pair-cells are a (V, 4)
    uint32 token table and a sample row is ONE elementwise gather
    (tok32[arange(V), codes_row]); with indel alleles the row is built
    by the standard variable-length segment gather
    (arange(total) + repeat(src_start - out_start, lens)) — both are
    O(V) numpy, no per-cell Python."""
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

    from pgen_tpu.ops.unpack_host import unpack_codes_numpy

    with timer.stage("gather", nv * rec):
        kept = _gather_rows(records, var_idx)
    codes_sm = np.empty((ns, nv), dtype=np.uint8)
    subset = sam_idx if ns != header.num_samples else None
    with timer.stage("decode", nv * rec):
        bv = max(int(block_variants), 1)
        for lo in range(0, nv, bv):
            blk = unpack_codes_numpy(kept[lo : lo + bv], header.num_samples)
            if subset is not None:
                blk = blk[:, subset]
            codes_sm[:, lo : lo + blk.shape[0]] = blk.T

    out_prefix = out_prefix or pfile_prefix
    if out_prefix.endswith(".ped"):
        out_prefix = out_prefix[: -len(".ped")]

    chroms = pvar.get_column_strs("CHROM")
    poss = pvar.get_column_strs("POS")
    ids = pvar.get_column_strs("ID")
    refs = pvar.get_column_strs("REF")
    alts = pvar.get_column_strs("ALT")

    with timer.stage("map_emit"), open(f"{out_prefix}.map", "w") as fh:
        for v in var_idx:
            v = int(v)
            fh.write(f"{chroms[v]}\t{ids[v]}\t0\t{poss[v]}\n")

    kept_refs = [refs[int(v)] for v in var_idx]
    kept_alts = [alts[int(v)] for v in var_idx]
    bad = [i for i, a in enumerate(kept_alts) if "," in a]
    if bad:
        raise ValueError(
            f"export ped: {len(bad)} kept variant(s) are multiallelic "
            f"(first: ID {ids[int(var_idx[bad[0]])]} ALT "
            f"{kept_alts[bad[0]]!r}); .ped cells hold one allele pair — "
            "split or filter them first (plink2 --export ped errors too)"
        )
    single = all(len(r) == 1 for r in kept_refs) and all(
        len(a) == 1 for a in kept_alts
    )
    prefixes = _ped_prefixes(psam, sam_idx)

    with timer.stage("ped_emit", ns * nv * 4), open(
        f"{out_prefix}.ped", "wb"
    ) as fh:
        if single and nv:
            r8 = np.frombuffer(
                "".join(kept_refs).encode(), dtype=np.uint8
            )
            a8 = np.frombuffer(
                "".join(kept_alts).encode(), dtype=np.uint8
            )
            tok = np.empty((nv, 4, 4), dtype=np.uint8)
            tok[:, :, 0] = ord("\t")
            tok[:, :, 2] = ord("\t")
            tok[:, 0, 1] = r8
            tok[:, 0, 3] = r8
            tok[:, 1, 1] = r8
            tok[:, 1, 3] = a8
            tok[:, 2, 1] = a8
            tok[:, 2, 3] = a8
            tok[:, 3, 1] = ord("0")
            tok[:, 3, 3] = ord("0")
            tok32 = tok.reshape(nv, 16).view(np.uint32)  # (nv, 4) LE words
            vix = np.arange(nv)
            for s in range(ns):
                row = tok32[vix, codes_sm[s]]
                fh.write(prefixes[s].encode() + row.tobytes() + b"\n")
        else:
            toks = []
            for r, a in zip(kept_refs, kept_alts):
                toks += [f"\t{r}\t{r}", f"\t{r}\t{a}", f"\t{a}\t{a}", "\t0\t0"]
            buf = "".join(toks).encode()
            buf8 = np.frombuffer(buf, dtype=np.uint8)
            lens = np.array([len(t) for t in toks], dtype=np.int64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            base = 4 * np.arange(nv, dtype=np.int64)
            for s in range(ns):
                tok_idx = base + codes_sm[s]
                ls = lens[tok_idx]
                ends = np.cumsum(ls)
                out_starts = ends - ls
                src = np.repeat(starts[tok_idx] - out_starts, ls) + np.arange(
                    ends[-1] if len(ends) else 0
                )
                fh.write(prefixes[s].encode() + buf8[src].tobytes() + b"\n")

    return ExportResult(
        fmt="ped",
        num_variants=nv,
        num_samples=ns,
        out_path=f"{out_prefix}.ped",
        timer=timer,
    )
