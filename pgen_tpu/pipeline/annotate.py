"""`pgen-tpu annotate`: rewrite fileset metadata without touching genotypes.

bcftools annotate / reheader analogs, absent from the reference (it never
writes filesets at all). Three operations, combinable in one run:

  --set-id EXPR         recompute the .pvar ID column per variant from an
                        fstring expression over the metadata columns
                        (bcftools `annotate --set-id '%CHROM:%POS:%REF:%ALT'`
                        becomes --set-id 'CHROM+":"+POS+":"+REF+":"+ALT');
                        INFO_* virtual variables work here too
  --rename-chrs FILE    remap CHROM values ("old<TAB>new" lines, bcftools
                        annotate --rename-chrs); unlisted contigs pass
                        through; ##contig=<ID=...> comment lines are
                        remapped to stay consistent
  --rename-samples FILE remap .psam IIDs (bcftools reheader -s: either
                        "old<TAB>new" lines or one new name per line for
                        all samples in order)

The .pgen is never re-coded — record geometry is sample/variant counts
only (SURVEY.md C9) — so it is copied verbatim. Column splicing is
vectorized: rows are reassembled as (prefix bytes, new value, suffix
bytes) span triples gathered in one fancy-index pass, no per-row string
work on the hot path.
"""

from __future__ import annotations

import re
import shutil
from dataclasses import dataclass

import numpy as np

from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.utils.timer import StageTimer


@dataclass
class AnnotateResult:
    out_prefix: str
    num_variants: int
    num_samples: int
    timer: StageTimer


def gather_spans(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate buf[starts[i] : starts[i]+lens[i]] for all i — one
    fancy-index gather, no Python-level loop."""
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint8)
    out_ends = np.cumsum(lens)
    out_starts = out_ends - lens
    idx = np.arange(total, dtype=np.int64)
    idx += np.repeat(starts.astype(np.int64) - out_starts, lens)
    return buf[idx]


def replace_column_bytes(table, col_name: str, new_vals: np.ndarray) -> np.ndarray:
    """Rows of ``table`` with column ``col_name`` replaced by ``new_vals``
    (numpy 'S' array, one value per row), newline-terminated, as uint8."""
    j = table.column_index(col_name)
    line_starts, line_ends = table.row_line_spans()
    fs = table.field_starts(j)
    fe = table.field_ends(j)
    buf = table.data_buffer

    new_vals = np.asarray(new_vals)
    width = new_vals.dtype.itemsize
    new_mat = np.ascontiguousarray(new_vals).view(np.uint8).reshape(-1, width)
    new_lens = np.char.str_len(new_vals).astype(np.int64)
    if (new_lens == 0).any():
        bad = int(np.flatnonzero(new_lens == 0)[0])
        raise ValueError(f"annotate: empty {col_name} value for row {bad}")
    # a tab or newline inside a value would corrupt the table geometry
    offs = np.arange(width, dtype=np.int64)
    in_value = offs[None, :] < new_lens[:, None]
    if (((new_mat == 9) | (new_mat == 10)) & in_value).any():
        raise ValueError(
            f"annotate: {col_name} values must not contain tabs or newlines"
        )
    # one source buffer for all three pieces: data buffer, then the new
    # values (padded matrix — spans address only the real bytes), then \n
    src = np.concatenate(
        [buf, new_mat.reshape(-1), np.frombuffer(b"\n", dtype=np.uint8)]
    )
    new_starts = len(buf) + np.arange(len(new_vals), dtype=np.int64) * width
    nl = np.int64(len(src) - 1)
    n = table.num_rows
    starts = np.empty((n, 4), dtype=np.int64)
    lens = np.empty((n, 4), dtype=np.int64)
    starts[:, 0] = line_starts
    lens[:, 0] = fs - line_starts
    starts[:, 1] = new_starts
    lens[:, 1] = new_lens
    starts[:, 2] = fe
    lens[:, 2] = line_ends - fe
    starts[:, 3] = nl
    lens[:, 3] = 1
    return gather_spans(src, starts.reshape(-1), lens.reshape(-1))


def _read_pairs(path: str, what: str) -> dict:
    """Parse "old<whitespace>new" mapping lines; '#' comments skipped."""
    mapping: dict = {}
    with open(path, "r", encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) != 2:
                raise ValueError(
                    f"{what} file {path}:{ln}: expected 'old new', got {line!r}"
                )
            mapping[parts[0].encode()] = parts[1].encode()
    return mapping


def _read_names_or_pairs(path: str, what: str):
    """reheader -s semantics: all-pairs -> mapping dict; otherwise a
    plain list of new names (one per line, positional)."""
    lines = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                lines.append(line.split())
    if lines and all(len(p) == 2 for p in lines):
        return {old.encode(): new.encode() for old, new in lines}
    if any(len(p) != 1 for p in lines):
        raise ValueError(
            f"{what} file {path}: use 'old new' pairs OR one name per line"
        )
    return [p[0].encode() for p in lines]


def _remap(col: np.ndarray, mapping: dict) -> np.ndarray:
    """Apply mapping to an 'S' column (unlisted values pass through)."""
    values, inverse = np.unique(col, return_inverse=True)
    out_vals = [mapping.get(v, v) for v in values.tolist()]
    width = max((len(v) for v in out_vals), default=1)
    return np.array(out_vals, dtype=f"S{max(width, 1)}")[inverse]


def _remap_contig_comments(comments: str, mapping: dict) -> str:
    def sub(m: re.Match) -> str:
        old = m.group(2).encode()
        new = mapping.get(old, old).decode()
        return f"{m.group(1)}{new}"

    return re.sub(r"(##contig=<[^>]*?\bID=)([^,>]+)", sub, comments)


def _fstring_column(expr: str, table, extra=None) -> np.ndarray:
    """Evaluate an fstring expression for every row -> 'S' array."""
    from pgen_tpu.query.compile import compile_fstring

    vals = compile_fstring(expr, table, extra=extra)
    width = max((len(v.encode("utf-8")) for v in vals), default=1)
    return np.array([v.encode("utf-8") for v in vals], dtype=f"S{max(width, 1)}")


def annotate_pgen(
    pfile_prefix: str,
    out_prefix: str | None = None,
    set_id: str | None = None,
    rename_chrs: str | None = None,
    rename_samples: str | None = None,
) -> AnnotateResult:
    if set_id is None and rename_chrs is None and rename_samples is None:
        raise ValueError(
            "annotate: pass at least one of --set-id / --rename-chrs / "
            "--rename-samples"
        )
    timer = StageTimer()
    out_prefix = (
        f"{pfile_prefix}.annotated" if out_prefix is None else str(out_prefix)
    )
    with timer.stage("metadata_load"):
        header = read_pgen_header(f"{pfile_prefix}.pgen")
        pvar = read_metadata(f"{pfile_prefix}.pvar")
        psam = read_metadata(f"{pfile_prefix}.psam")
        psam.column_index("IID")
    if (set_id or rename_chrs) and pvar.num_rows != header.num_variants:
        raise ValueError(
            f"{pfile_prefix}.pvar has {pvar.num_rows} rows but the pgen "
            f"holds {header.num_variants} variant records"
        )

    with timer.stage("annotate_pvar"):
        comments = pvar.comments
        rows = None
        if rename_chrs is not None:
            mapping = _read_pairs(rename_chrs, "--rename-chrs")
            rows = replace_column_bytes(
                pvar, "CHROM", _remap(pvar.get_column_bytes("CHROM"), mapping)
            )
            comments = _remap_contig_comments(comments, mapping)
            if set_id is not None:
                # --set-id sees the REMAPPED contig names (bcftools order:
                # rename first, then expressions) — reparse the spliced rows
                pvar = _table_from_rows(pvar, comments, rows)
                rows = None
        if set_id is not None:
            rows = replace_column_bytes(pvar, "ID", _fstring_column(set_id, pvar))
        with open(f"{out_prefix}.pvar", "wb") as f:
            if rows is None:
                with open(f"{pfile_prefix}.pvar", "rb") as src:
                    shutil.copyfileobj(src, f)
            else:
                f.write(comments.encode("utf-8"))
                f.write(pvar.header_line.encode("utf-8"))
                f.write(b"\n")
                rows.tofile(f)

    with timer.stage("annotate_psam"):
        if rename_samples is None:
            shutil.copyfile(f"{pfile_prefix}.psam", f"{out_prefix}.psam")
        else:
            spec = _read_names_or_pairs(rename_samples, "--rename-samples")
            iid = psam.get_column_bytes("IID")
            if isinstance(spec, dict):
                new_iid = _remap(iid, spec)
            else:
                if len(spec) != len(iid):
                    raise ValueError(
                        f"--rename-samples: {len(spec)} names for "
                        f"{len(iid)} samples"
                    )
                width = max((len(v) for v in spec), default=1)
                new_iid = np.array(spec, dtype=f"S{width}")
            if len(np.unique(new_iid)) != len(new_iid):
                raise ValueError("--rename-samples: duplicate IIDs after rename")
            rows = replace_column_bytes(psam, "IID", new_iid)
            with open(f"{out_prefix}.psam", "wb") as f:
                f.write(psam.comments.encode("utf-8"))
                f.write(psam.header_line.encode("utf-8"))
                f.write(b"\n")
                rows.tofile(f)

    with timer.stage("copy_pgen"):
        shutil.copyfile(f"{pfile_prefix}.pgen", f"{out_prefix}.pgen")
    return AnnotateResult(
        out_prefix, header.num_variants, header.num_samples, timer
    )


def _table_from_rows(src_table, comments: str, rows: np.ndarray):
    """Reparse spliced row bytes into a fresh MetadataTable (used when a
    later annotate step must see an earlier step's output)."""
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(suffix=".pvar")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(comments.encode("utf-8"))
            f.write(src_table.header_line.encode("utf-8"))
            f.write(b"\n")
            rows.tofile(f)
        return read_metadata(tmp)
    finally:
        os.unlink(tmp)
