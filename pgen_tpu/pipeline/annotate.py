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

  --fill-info TAGS      bcftools +fill-tags analog: compute genotype-
                        derived INFO tags (AC, AN, AF, MAF, NS, F_MISSING,
                        HWE — or 'all') from the packed matrix in one
                        gt_counts pass and splice them into the .pvar INFO
                        column. Existing instances of the chosen tags are
                        replaced; other INFO fields pass through; matching
                        ##INFO declarations are added to the header when
                        absent. An optional sample cohort (--include-sam /
                        --samples/--samples-file) restricts the counts;
                        the .psam itself always passes through unchanged.

The .pgen is never re-coded — record geometry is sample/variant counts
only (SURVEY.md C9) — so it is copied verbatim. Column splicing is
vectorized: rows are reassembled as (prefix bytes, new value, suffix
bytes) span triples gathered in one fancy-index pass, no per-row string
work on the hot path (fill-info rows whose INFO already holds a target
tag take a per-row strip path; typical INFO columns don't).
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


FILL_INFO_TAGS = ("AC", "AN", "AF", "MAF", "NS", "F_MISSING", "HWE")

_INFO_DECLS = {
    "AC": '##INFO=<ID=AC,Number=A,Type=Integer,Description='
    '"Allele count in genotypes">\n',
    "AN": '##INFO=<ID=AN,Number=1,Type=Integer,Description='
    '"Total number of alleles in called genotypes">\n',
    "AF": '##INFO=<ID=AF,Number=A,Type=Float,Description='
    '"Allele frequency">\n',
    "MAF": '##INFO=<ID=MAF,Number=1,Type=Float,Description='
    '"Minor allele frequency">\n',
    "NS": '##INFO=<ID=NS,Number=1,Type=Integer,Description='
    '"Number of samples with data">\n',
    "F_MISSING": '##INFO=<ID=F_MISSING,Number=1,Type=Float,Description='
    '"Fraction of missing genotypes">\n',
    "HWE": '##INFO=<ID=HWE,Number=1,Type=Float,Description='
    '"HWE exact test p-value">\n',
}


def _parse_fill_tags(spec: str) -> list:
    if spec.strip().lower() == "all":
        return list(FILL_INFO_TAGS)
    tags = [t.strip().upper() for t in spec.split(",") if t.strip()]
    bad = [t for t in tags if t not in FILL_INFO_TAGS]
    if bad:
        raise ValueError(
            f"--fill-info: unsupported tag(s) {','.join(bad)}; "
            f"supported: {','.join(FILL_INFO_TAGS)} or 'all'"
        )
    if not tags:
        raise ValueError("--fill-info: no tags given")
    return tags


def _fill_info_values(tags, counts, n_cohort) -> np.ndarray:
    """Per-variant 'TAG=val;TAG=val' byte strings from a (V,4) count
    matrix — vectorized formatting (np.char.mod), no per-row Python."""
    homref, het, homalt, missing = (
        counts[:, k].astype(np.int64) for k in range(4)
    )
    ac = het + 2 * homalt
    nobs = homref + het + homalt
    an = 2 * nobs
    with np.errstate(divide="ignore", invalid="ignore"):
        af = np.where(an > 0, ac / np.maximum(an, 1), 0.0)
    vals = {}
    for t in tags:
        if t == "AC":
            vals[t] = np.char.mod(b"%d", ac)
        elif t == "AN":
            vals[t] = np.char.mod(b"%d", an)
        elif t == "NS":
            vals[t] = np.char.mod(b"%d", nobs)
        elif t == "AF":
            vals[t] = np.char.mod(b"%.6g", af)
        elif t == "MAF":
            vals[t] = np.char.mod(b"%.6g", np.minimum(af, 1.0 - af))
        elif t == "F_MISSING":
            denom = max(n_cohort, 1)
            vals[t] = np.char.mod(b"%.6g", missing / denom)
        elif t == "HWE":
            from pgen_tpu.ops.hwe import hwe_exact_p

            vals[t] = np.char.mod(b"%.6g", hwe_exact_p(counts))
    parts = None
    for t in tags:
        piece = np.char.add(f"{t}=".encode(), vals[t])
        parts = piece if parts is None else np.char.add(
            np.char.add(parts, b";"), piece
        )
    return parts


def _strip_tags_py(info: bytes, tags) -> bytes:
    """Remove existing 'TAG=...' fields (boundary-exact) from one INFO."""
    fields = [
        f for f in info.split(b";")
        if f.split(b"=", 1)[0].decode("latin-1") not in tags
    ]
    return b";".join(fields)


def fill_info_column(pvar, psam, records, header, tags, sam_query=None,
                     provider: str = "native") -> tuple:
    """New INFO column values + augmented comments for --fill-info.

    Returns (new_info 'S' array, comments str with missing ##INFO decls).
    """
    from pgen_tpu.ops.gt_stats import gt_counts, gt_counts_subset
    from pgen_tpu.query.compile import compile_predicate

    n_cohort = header.num_samples
    if sam_query is not None:
        sam_mask = compile_predicate(sam_query, psam)
        sam_idx = np.flatnonzero(sam_mask)
        n_cohort = len(sam_idx)
        counts = gt_counts_subset(records, sam_idx.astype(np.int32), provider)
    else:
        counts = gt_counts(records, header.num_samples, provider)
    new_tags = _fill_info_values(tags, counts, n_cohort)

    old = pvar.get_column_bytes("INFO")
    empty = (old == b".") | (old == b"")
    # rows that may already contain a target tag: crude substring probe,
    # exact boundary-aware strip in Python only for those rows
    probe = np.zeros(len(old), dtype=bool)
    for t in tags:
        probe |= np.char.find(old, f"{t}=".encode()) >= 0
    if probe.any():
        tagset = set(tags)
        stripped = old.astype(object)
        for i in np.flatnonzero(probe):
            stripped[i] = _strip_tags_py(old[i], tagset)
        width = max(max((len(s) for s in stripped[probe]), default=1), 1)
        old = old.astype(f"S{max(old.dtype.itemsize, width)}")
        old[probe] = np.array(
            [stripped[i] for i in np.flatnonzero(probe)], dtype=f"S{width}"
        )
        empty = (old == b".") | (old == b"")
    joined = np.char.add(np.char.add(old, b";"), new_tags)
    new_info = np.where(empty, new_tags, joined)

    comments = pvar.comments
    missing_decls = "".join(
        _INFO_DECLS[t] for t in tags if f"##INFO=<ID={t}," not in comments
    )
    if missing_decls:
        comments = comments + missing_decls
    return new_info, comments


def _match_annotation_rows(pvar, src_pvar):
    """Row matching on CHROM:POS:REF:ALT (bcftools annotate -a keying).

    Returns (matched (V,) bool, src_row (V,) i64 — the FIRST source row
    holding each target key, valid only where matched)."""
    from pgen_tpu.pipeline.isec import _variant_keys

    tkeys = _variant_keys(pvar, "full")
    skeys = _variant_keys(src_pvar, "full")
    if len(skeys) == 0 or len(tkeys) == 0:
        return np.zeros(len(tkeys), dtype=bool), np.zeros(len(tkeys), np.int64)
    order = np.argsort(skeys, kind="stable")
    skeys_sorted = skeys[order]
    uniq_mask = np.ones(len(skeys_sorted), dtype=bool)
    uniq_mask[1:] = skeys_sorted[1:] != skeys_sorted[:-1]
    s_uniq = skeys_sorted[uniq_mask]
    s_first = order[uniq_mask]  # stable argsort -> first occurrence
    pos = np.searchsorted(s_uniq, tkeys)
    pos_c = np.minimum(pos, len(s_uniq) - 1)
    matched = s_uniq[pos_c] == tkeys
    return matched, s_first[pos_c]


def _extract_info_field(info: bytes, tag: str):
    """The full 'TAG=val' (or flag 'TAG') field from one INFO, or None."""
    for f in info.split(b";"):
        if f.partition(b"=")[0].decode("latin-1") == tag:
            return f
    return None


def _transfer_one(pvar, src_pvar, spec: str, comments: str):
    """One --columns entry -> (column_name, new values, comments).

    ID / INFO replace the whole column on matched rows; INFO/TAG splices
    the source's TAG field into the target INFO (replacing any existing
    instance), leaving other fields intact. Unmatched rows, and matched
    rows whose source lacks the tag, keep their current value. Matching
    ##INFO declarations are copied from the source header when absent."""
    matched, src_row = _match_annotation_rows(pvar, src_pvar)
    if spec == "ID":
        old = pvar.get_column_bytes("ID")
        src = src_pvar.get_column_bytes("ID")
        width = max(old.dtype.itemsize, src.dtype.itemsize)
        new = old.astype(f"S{width}")
        new[matched] = src[src_row[matched]]
        return "ID", new, comments
    if spec == "INFO":
        old = pvar.get_column_bytes("INFO")
        src = src_pvar.get_column_bytes("INFO")
        width = max(old.dtype.itemsize, src.dtype.itemsize)
        new = old.astype(f"S{width}")
        new[matched] = src[src_row[matched]]
        for line in src_pvar.comments.splitlines(keepends=True):
            if line.startswith("##INFO=<ID=") and line not in comments:
                comments += line
        return "INFO", new, comments
    if spec.startswith("INFO/"):
        tag = spec[5:]
        if not tag:
            raise ValueError("--columns: empty INFO/ tag")
        old = pvar.get_column_bytes("INFO").astype(object)
        src = src_pvar.get_column_bytes("INFO")
        tagset = {tag}
        changed = np.zeros(len(old), dtype=bool)
        for i in np.flatnonzero(matched):
            field = _extract_info_field(src[src_row[i]], tag)
            if field is None:
                continue
            base = _strip_tags_py(old[i], tagset)
            if base in (b"", b"."):
                old[i] = field
            else:
                old[i] = base + b";" + field
            changed[i] = True
        width = max(max((len(v) for v in old), default=1), 1)
        new = np.array(list(old), dtype=f"S{width}")
        decl_prefix = f"##INFO=<ID={tag},"
        if decl_prefix not in comments:
            for line in src_pvar.comments.splitlines(keepends=True):
                if line.startswith(decl_prefix):
                    comments += line
                    break
        return "INFO", new, comments
    raise ValueError(
        f"--columns: unknown entry {spec!r} (supported: ID, INFO, INFO/TAG)"
    )


def _drop_info_headers(comments: str, tags=None) -> str:
    """Remove ##INFO declarations (all when tags is None, else the named
    set) from the pvar comment block."""
    out = []
    for line in comments.splitlines(keepends=True):
        if line.startswith("##INFO=<ID="):
            tid = line[len("##INFO=<ID="):].split(",", 1)[0].split(">", 1)[0]
            if tags is None or tid in tags:
                continue
        out.append(line)
    return "".join(out)


def _remove_one(pvar, spec: str, comments: str):
    """One -x entry -> (column_name, new values, comments).

    ID / QUAL / FILTER / INFO blank the whole column to '.'; INFO/TAG
    strips that tag per row (boundary-exact, rows left empty become
    '.'). Matching ##INFO declarations drop from the header."""
    n = pvar.num_rows
    if spec in ("ID", "QUAL", "FILTER"):
        return spec, np.full(n, b".", dtype="S1"), comments
    if spec == "INFO":
        return "INFO", np.full(n, b".", dtype="S1"), _drop_info_headers(comments)
    if spec.startswith("INFO/"):
        tag = spec[5:]
        if not tag:
            raise ValueError("-x: empty INFO/ tag")
        infos = pvar.get_column_bytes("INFO")
        new = np.array(
            [_strip_tags_py(x, {tag}) or b"." for x in infos.tolist()]
        )
        return "INFO", new, _drop_info_headers(comments, {tag})
    raise ValueError(
        f"-x: unknown entry {spec!r} (supported: ID, QUAL, FILTER, INFO, "
        "INFO/TAG)"
    )


def annotate_pgen(
    pfile_prefix: str,
    out_prefix: str | None = None,
    set_id: str | None = None,
    rename_chrs: str | None = None,
    rename_samples: str | None = None,
    fill_info: str | None = None,
    sam_query: str | None = None,
    provider: str = "native",
    annotations: str | None = None,
    columns: str = "ID",
    remove: str | None = None,
) -> AnnotateResult:
    if (
        set_id is None
        and rename_chrs is None
        and rename_samples is None
        and fill_info is None
        and annotations is None
        and remove is None
    ):
        raise ValueError(
            "annotate: pass at least one of --set-id / --rename-chrs / "
            "--rename-samples / --fill-info / --annotations / -x"
        )
    if sam_query is not None and fill_info is None:
        raise ValueError(
            "annotate: sample selections only apply to --fill-info counts"
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
    if (set_id or rename_chrs or fill_info) and pvar.num_rows != header.num_variants:
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
            if set_id is not None or fill_info is not None or annotations is not None:
                # later steps see the REMAPPED contig names (bcftools order:
                # rename first, then expressions) — reparse the spliced rows
                pvar = _table_from_rows(pvar, comments, rows)
                rows = None
        if annotations is not None:
            # bcftools annotate -a analog: copy ID/INFO (or single INFO
            # tags) from another fileset, matched on CHROM:POS:REF:ALT
            src_pvar = read_metadata(f"{annotations}.pvar")
            specs = [c.strip() for c in str(columns).split(",") if c.strip()]
            if not specs:
                raise ValueError("--columns: no entries")
            for j, spec in enumerate(specs):
                col, new_vals, comments = _transfer_one(
                    pvar, src_pvar, spec, comments
                )
                rows = replace_column_bytes(pvar, col, new_vals)
                if (
                    j < len(specs) - 1
                    or set_id is not None
                    or fill_info is not None
                ):
                    pvar = _table_from_rows(pvar, comments, rows)
                    rows = None
        if fill_info is not None:
            tags = _parse_fill_tags(fill_info)
            rec = header.record_size
            mm = np.memmap(f"{pfile_prefix}.pgen", dtype=np.uint8, mode="r")
            records = mm[12 : 12 + header.num_variants * rec].reshape(
                header.num_variants, rec
            )
            new_info, comments = fill_info_column(
                pvar, psam, records, header, tags, sam_query, provider
            )
            rows = replace_column_bytes(pvar, "INFO", new_info)
            if set_id is not None:
                # --set-id may reference INFO_* virtual variables: it sees
                # the FILLED tags
                pvar = _table_from_rows(pvar, comments, rows)
                rows = None
        if set_id is not None:
            rows = replace_column_bytes(pvar, "ID", _fstring_column(set_id, pvar))
            if remove is not None:
                pvar = _table_from_rows(pvar, comments, rows)
                rows = None
        if remove is not None:
            # bcftools annotate -x analog: drop annotations LAST (after
            # any --set-id expression saw them)
            specs = [s.strip() for s in str(remove).split(",") if s.strip()]
            if not specs:
                raise ValueError("-x: no entries")
            for j, spec in enumerate(specs):
                col, new_vals, comments = _remove_one(pvar, spec, comments)
                rows = replace_column_bytes(pvar, col, new_vals)
                if j < len(specs) - 1:
                    pvar = _table_from_rows(pvar, comments, rows)
                    rows = None
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
