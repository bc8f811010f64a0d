"""`pgen-tpu merge`: sample-axis merge of pgen filesets.

The cohort-joining counterpart of `concat` (variant axis): inputs hold
DIFFERENT samples over the SAME variants, and the output carries every
input's samples in argument order. Because mode-0x02 packs 4 samples per
byte, sample splicing is bit-level unless each input's width is a
multiple of 4 — so blocks stream through the existing 2-bit codecs:

  per 65536-variant block:  unpack each input -> hstack code columns ->
                            pack  (native C++ LUT codecs; numpy fallback)

Validation (fail-fast): identical .pvar data rows (same variants, same
order — the identity a merge is keyed on), identical pvar column lines,
no duplicate IIDs across inputs. .psam data rows concatenate under the
first input's column line when all inputs share it; otherwise a minimal
`#IID` psam is written (per-input extra columns are not reconcilable).

The reference has no multi-file operations (784 LoC, single fileset).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from pgen_tpu.formats.header import (
    FIXED_WIDTH_STORAGE_MODE,
    MODE2_FORMAT_BYTE,
    PGEN_MAGIC,
    read_pgen_header,
    variant_record_size,
)
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.utils.timer import StageTimer

DEFAULT_BLOCK = 1 << 16


class MergeError(ValueError):
    """Inputs cannot be merged."""


@dataclass
class MergeResult:
    out_prefix: str
    num_variants: int
    num_samples: int
    num_inputs: int
    timer: StageTimer


def _codecs():
    try:
        from pgen_tpu.native import HAVE_NATIVE, native
    except ImportError:
        HAVE_NATIVE = False
    if HAVE_NATIVE:
        return native.unpack_codes, native.pack_codes
    from pgen_tpu.formats.writer import pack_codes
    from pgen_tpu.ops.unpack_host import unpack_codes_reference

    return unpack_codes_reference, pack_codes


def _psam_lines(path: str) -> tuple:
    """(column line, data lines) of a .psam (comments before the last #
    line are preserved only from the first input)."""
    column = None
    rows = []
    with open(path, "rb") as fh:
        for line in fh:
            line = line.rstrip(b"\n")
            if line.startswith(b"#"):
                column = line
            elif line:
                rows.append(line)
    if column is None:
        raise MergeError(f"{path}: no # column header line")
    return column, rows


def merge_pgen(
    prefixes: list, out_prefix: str, block_variants: int | None = None
) -> MergeResult:
    """Merge the filesets at `prefixes` (same variants, disjoint samples)
    into OUT_PREFIX.{pgen,pvar,psam}.

    block_variants defaults to a ~256 MB code-matrix budget: the splice
    holds one unpacked byte per (variant, sample) for the inputs plus the
    hstacked copy, so a fixed 64Ki block would need tens of GB at biobank
    sample counts."""
    if len(prefixes) < 1:
        raise MergeError("need at least one input prefix")
    timer = StageTimer()

    with timer.stage("validate"):
        headers = [read_pgen_header(f"{p}.pgen") for p in prefixes]
        n_var = headers[0].num_variants
        for h in headers[1:]:
            if h.num_variants != n_var:
                raise MergeError(
                    f"{h.path}: {h.num_variants} variants != {n_var} "
                    f"({headers[0].path}); merge needs one variant set"
                )
        def _rows_span(prefix):
            """(row_count, joined row bytes) in O(1) allocations: the span
            from the first row's start to the last row's end covers every
            row including interior newlines."""
            t = read_metadata(f"{prefix}.pvar")
            lo, hi = t.row_line_spans()
            if len(lo) == 0:
                return 0, b""
            return len(lo), t.data_buffer[int(lo[0]) : int(hi[-1])].tobytes()

        rows0_n, rows0 = _rows_span(prefixes[0])
        if rows0_n != n_var:
            raise MergeError(
                f"{prefixes[0]}.pvar: {rows0_n} data rows != {n_var} "
                f"variants in the .pgen header"
            )
        for p in prefixes[1:]:
            n, span = _rows_span(p)
            if n != n_var or span != rows0:
                raise MergeError(
                    f"{p}.pvar: variant rows differ from {prefixes[0]}.pvar "
                    f"(merge is keyed on identical variants in identical order)"
                )
        psams = [_psam_lines(f"{p}.psam") for p in prefixes]
        iids = []
        for p, (_, rows) in zip(prefixes, psams):
            t = read_metadata(f"{p}.psam")
            iids.append(t.get_column_strs("IID"))
        flat = [i for ids in iids for i in ids]
        if len(set(flat)) != len(flat):
            dup = next(i for i in flat if flat.count(i) > 1)
            raise MergeError(f"duplicate sample IID across inputs: {dup!r}")

    n_out = sum(h.num_samples for h in headers)
    rec_out = variant_record_size(n_out)
    if block_variants is None:
        block_variants = int(min(DEFAULT_BLOCK, max(1024, (128 << 20) // max(n_out, 1))))
    unpack, pack = _codecs()

    mms = [np.memmap(f"{p}.pgen", dtype=np.uint8, mode="r") for p in prefixes]
    recs = [
        mm[12 : 12 + n_var * h.record_size].reshape(n_var, h.record_size)
        for mm, h in zip(mms, headers)
    ]

    with open(f"{out_prefix}.pgen", "wb") as out:
        out.write(PGEN_MAGIC + bytes([FIXED_WIDTH_STORAGE_MODE]))
        out.write(struct.pack("<II", n_var, n_out))
        out.write(bytes([MODE2_FORMAT_BYTE]))
        for lo in range(0, n_var, block_variants):
            hi = min(lo + block_variants, n_var)
            with timer.stage("splice", (hi - lo) * rec_out):
                cols = [
                    unpack(np.ascontiguousarray(r[lo:hi]), h.num_samples)
                    for r, h in zip(recs, headers)
                ]
                merged = cols[0] if len(cols) == 1 else np.hstack(cols)
                out.write(pack(np.ascontiguousarray(merged)).tobytes())
        if n_var == 0:
            pass  # header-only output is valid

    with timer.stage("pvar"):
        import shutil

        shutil.copyfile(f"{prefixes[0]}.pvar", f"{out_prefix}.pvar")

    with timer.stage("psam"):
        col0 = psams[0][0]
        same_columns = all(c == col0 for c, _ in psams)
        with open(f"{out_prefix}.psam", "wb") as f:
            if same_columns:
                f.write(col0 + b"\n")
                for _, rows in psams:
                    f.write(b"\n".join(rows) + (b"\n" if rows else b""))
            else:
                # heterogeneous psam schemas: keep the one shared column
                f.write(b"#IID\n")
                for ids in iids:
                    f.write(("\n".join(ids) + "\n").encode())

    return MergeResult(
        out_prefix=out_prefix,
        num_variants=n_var,
        num_samples=n_out,
        num_inputs=len(prefixes),
        timer=timer,
    )
