"""PLINK1 .bed/.bim/.fam <-> mode-0x02 .pgen/.pvar/.psam conversion.

The legacy on-ramp and off-ramp (besides VCF, pipeline/vcf_import.py) a
pgen user needs; the reference supports neither direction. PLINK1's
variant-major .bed shares the mode-0x02 record geometry exactly —
ceil(S/4) bytes per variant, 2 bits per sample, LSB-first — so genotype
conversion is a single 256-entry byte LUT over the record stream:

  plink1 code            pgen hard call (ALT dosage)
  00 hom A1 (ALT)   ->   2
  01 missing        ->   3
  10 het            ->   1
  11 hom A2 (REF)   ->   0

(A1 maps to ALT and A2 to REF, as plink2's own converter does.) The last
record byte's pad bits are cleared to the canonical zero padding the rest
of this codebase emits (plink1 zero-pads, which would remap to code 2).

Metadata: .bim rows (CHROM ID CM POS A1 A2, whitespace-delimited, no
header) become full 8-column .pvar rows with QUAL/FILTER/INFO = '.', so
downstream `filter` emits standard VCF; .fam rows become a
#FID IID PAT MAT SEX PHENO1 .psam (IID is what the engine requires).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from pgen_tpu.formats.header import (
    FIXED_WIDTH_STORAGE_MODE,
    MODE2_FORMAT_BYTE,
    PGEN_MAGIC,
)
from pgen_tpu.utils.timer import StageTimer

BED_MAGIC = b"\x6c\x1b\x01"
DEFAULT_CHUNK_ROWS = 1 << 16

# plink1 2-bit code -> pgen 2-bit code (and its inverse for export),
# expanded to whole bytes
_CODE_MAP = np.array([2, 3, 1, 0], dtype=np.uint8)
_CODE_MAP_INV = np.array([3, 2, 0, 1], dtype=np.uint8)


def _byte_lut(code_map: np.ndarray) -> np.ndarray:
    lut = np.zeros(256, dtype=np.uint8)
    for b in range(256):
        v = 0
        for k in range(4):
            v |= int(code_map[(b >> (2 * k)) & 3]) << (2 * k)
        lut[b] = v
    return lut


_BYTE_LUT = _byte_lut(_CODE_MAP)
_BYTE_LUT_INV = _byte_lut(_CODE_MAP_INV)


class BedImportError(ValueError):
    """The .bed/.bim/.fam fileset violated a conversion invariant."""


@dataclass
class BedImportResult:
    out_prefix: str
    num_variants: int
    num_samples: int
    timer: StageTimer


def _read_table(path: str, n_cols_expected: tuple, what: str) -> list:
    """Whitespace-delimited, headerless PLINK1 table -> list of row tuples."""
    rows = []
    with open(path, "rb") as fh:
        for i, line in enumerate(fh):
            parts = line.split()
            if not parts:
                continue
            if len(parts) not in n_cols_expected:
                raise BedImportError(
                    f"{path}: {what} row {i + 1} has {len(parts)} fields, "
                    f"expected {' or '.join(map(str, n_cols_expected))}"
                )
            rows.append(parts)
    return rows


def import_bed(
    bed_path: str | Path,
    out_prefix: str | Path | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
) -> BedImportResult:
    """Convert PREFIX.bed/.bim/.fam into OUT_PREFIX.pgen/.pvar/.psam."""
    bed_path = str(bed_path)
    if not bed_path.endswith(".bed"):
        raise BedImportError(f"{bed_path}: expected a .bed path")
    prefix_in = bed_path[: -len(".bed")]
    out_prefix = str(out_prefix) if out_prefix is not None else prefix_in
    timer = StageTimer()

    with timer.stage("metadata"):
        bim = _read_table(f"{prefix_in}.bim", (6,), ".bim")
        fam = _read_table(f"{prefix_in}.fam", (6,), ".fam")
    num_variants, num_samples = len(bim), len(fam)
    rec_size = (num_samples + 3) // 4  # == ceil(2S/8), same geometry

    mm = np.memmap(bed_path, dtype=np.uint8, mode="r")
    if mm.nbytes < 3 or bytes(mm[:3]) != BED_MAGIC:
        if mm.nbytes >= 3 and bytes(mm[:2]) == BED_MAGIC[:2] and mm[2] == 0:
            raise BedImportError(
                f"{bed_path}: sample-major .bed (third byte 0x00) is not "
                f"supported — regenerate variant-major with plink"
            )
        raise BedImportError(f"{bed_path}: bad magic, want 6C 1B 01 (variant-major)")
    want = 3 + num_variants * rec_size
    if mm.nbytes != want:
        raise BedImportError(
            f"{bed_path}: size {mm.nbytes} != 3 + {num_variants} x {rec_size} "
            f"(V from .bim, S from .fam)"
        )

    # tail-byte pad mask: keep only the 2*(S%4) used bits
    tail_used = num_samples % 4
    tail_mask = np.uint8((1 << (2 * tail_used)) - 1) if tail_used else np.uint8(0xFF)

    with timer.stage("pvar"):
        with open(f"{out_prefix}.pvar", "wb") as f:
            f.write(b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
            out = []
            for chrom, vid, _cm, pos, a1, a2 in bim:
                out.append(b"\t".join([chrom, pos, vid, a2, a1, b".", b".", b"."]))
            f.write(b"\n".join(out) + (b"\n" if out else b""))
    with timer.stage("psam"):
        with open(f"{out_prefix}.psam", "wb") as f:
            f.write(b"#FID\tIID\tPAT\tMAT\tSEX\tPHENO1\n")
            f.write(b"\n".join(b"\t".join(r) for r in fam) + (b"\n" if fam else b""))

    with open(f"{out_prefix}.pgen", "wb") as pgen:
        pgen.write(PGEN_MAGIC + bytes([FIXED_WIDTH_STORAGE_MODE]))
        pgen.write(struct.pack("<II", num_variants, num_samples))
        pgen.write(bytes([MODE2_FORMAT_BYTE]))
        body = mm[3:]
        for lo in range(0, num_variants, chunk_rows):
            hi = min(lo + chunk_rows, num_variants)
            with timer.stage("remap", (hi - lo) * rec_size):
                blk = _BYTE_LUT[
                    np.asarray(body[lo * rec_size : hi * rec_size]).reshape(
                        hi - lo, rec_size
                    )
                ]
                if rec_size:
                    blk[:, -1] &= tail_mask
            with timer.stage("write", blk.nbytes):
                pgen.write(blk.tobytes())

    return BedImportResult(
        out_prefix=out_prefix,
        num_variants=num_variants,
        num_samples=num_samples,
        timer=timer,
    )


def _sex_code(v: str) -> str:
    u = v.strip().upper()
    if u in ("1", "M", "MALE"):
        return "1"
    if u in ("2", "F", "FEMALE"):
        return "2"
    return "0"


def filter_to_bed(
    pfile_prefix: str,
    var_query: str | None = None,
    sam_query: str | None = None,
    out_prefix: str | None = None,
    provider: str = "auto",
    block_variants: int = DEFAULT_CHUNK_ROWS,
):
    """Filter a pgen fileset into PLINK1 OUT_PREFIX.bed/.bim/.fam.

    The export twin of import_bed (pgen code -> plink1 code is the inverse
    byte LUT; .bed pad bits are written as the canonical zeros plink
    emits). .bim: CHROM ID CM=0 POS A1=ALT A2=REF; .fam: FID=0 IID PAT=0
    MAT=0 SEX (mapped from the psam SEX column when present) PHENO1 (or
    -9). Same predicate surface as the other filter outputs."""
    from pgen_tpu.formats.header import read_pgen_header
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.pipeline.filter import _gather_rows, _resolve_provider, compute_masks
    from pgen_tpu.pipeline.pgen_out import _subset_block

    provider = _resolve_provider(provider)
    timer = StageTimer()
    if out_prefix is None:
        out_prefix = f"{pfile_prefix}.pgen-rs"
    out_prefix = str(out_prefix)

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
    n_kept = len(sam_idx)
    keep_all = n_kept == psam.num_rows == header.num_samples

    tail_used = n_kept % 4
    tail_mask = np.uint8((1 << (2 * tail_used)) - 1) if tail_used else np.uint8(0xFF)

    with timer.stage("bed"):
        with open(f"{out_prefix}.bed", "wb") as f:
            f.write(BED_MAGIC)
            for lo in range(0, len(var_idx), block_variants):
                hi = min(lo + block_variants, len(var_idx))
                blk = _gather_rows(records, var_idx[lo:hi])
                if not keep_all:
                    blk = _subset_block(
                        blk, sam_idx.astype(np.int32), header.num_samples, provider
                    )
                out = _BYTE_LUT_INV[np.asarray(blk)]
                if out.shape[1]:
                    out[:, -1] &= tail_mask
                f.write(out.tobytes())

    with timer.stage("bim"):
        chrom = pvar.get_column_strs("CHROM")
        pos = pvar.get_column_strs("POS")
        vid = pvar.get_column_strs("ID")
        ref = pvar.get_column_strs("REF")
        alt = pvar.get_column_strs("ALT")
        with open(f"{out_prefix}.bim", "w") as f:
            for i in var_idx:
                i = int(i)
                f.write(
                    f"{chrom[i]}\t{vid[i]}\t0\t{pos[i]}\t{alt[i]}\t{ref[i]}\n"
                )

    with timer.stage("fam"):
        iids = psam.get_column_strs("IID")
        sex = (
            psam.get_column_strs("SEX")
            if "SEX" in psam.columns
            else ["0"] * len(iids)
        )
        pheno = (
            psam.get_column_strs("PHENO1")
            if "PHENO1" in psam.columns
            else ["-9"] * len(iids)
        )
        with open(f"{out_prefix}.fam", "w") as f:
            for s in sam_idx:
                s = int(s)
                f.write(f"0\t{iids[s]}\t0\t0\t{_sex_code(sex[s])}\t{pheno[s]}\n")

    return BedImportResult(
        out_prefix=out_prefix,
        num_variants=len(var_idx),
        num_samples=n_kept,
        timer=timer,
    )
