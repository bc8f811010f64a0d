"""The metadata-only query path.

Reference parity (/root/reference/src/pfile.rs:78-102, main.rs:95-113):
``query`` touches ONLY the .pvar (default) or .psam (-s) metadata file —
never the .pgen records — which is the reference's stated scaling advantage
over bcftools (README.md:158-160). The pgen header is still opened first
(Pfile::from_prefix runs before the reader is chosen, main.rs:101), so a
missing/invalid .pgen errors here too.

Instead of the reference's per-row context rebuild + evalexpr walk, the
include predicate and fstring compile once to whole-column vector ops; rows
stream to the writer in one pass.
"""

from __future__ import annotations

import sys

import numpy as np

from pgen_tpu.formats.header import read_pgen_header
from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.query.compile import (
    compile_fstring,
    compile_fstring_bytes,
    compile_predicate,
)


def _reject_gt_variables(expr) -> None:
    """query never opens genotype records (its core scaling property), so
    GT_* statistics are filter-only; say so instead of 'not bound'."""
    if expr is None:
        return
    from pgen_tpu.ops.gt_stats import GT_VARIABLE_NAMES
    from pgen_tpu.query.ast import ExprError, variables
    from pgen_tpu.query.parser import parse

    node = parse(expr) if isinstance(expr, str) else expr
    used = variables(node) & set(GT_VARIABLE_NAMES)
    if used:
        raise ExprError(
            f"{sorted(used)[0]}: GT_* genotype statistics are available in "
            f"`filter` expressions only — `query` reads only metadata"
        )


def query_metadata(
    pfile_prefix: str,
    query_fstring: str,
    query: str | None = None,
    query_samples: bool = False,
    out=None,
) -> int:
    """Print one fstring result per kept metadata row (to stdout by default).

    Returns the number of rows printed.
    """
    read_pgen_header(f"{pfile_prefix}.pgen")  # from_prefix validation parity
    meta_path = f"{pfile_prefix}.psam" if query_samples else f"{pfile_prefix}.pvar"
    table = read_metadata(meta_path)
    _reject_gt_variables(query)
    _reject_gt_variables(query_fstring)
    mask = compile_predicate(query, table)
    rows = np.flatnonzero(mask)
    out = sys.stdout if out is None else out
    # fast path: vectorized straight-to-bytes assembly, one write call
    # (the reference println!s per row; output bytes are identical)
    data = compile_fstring_bytes(query_fstring, table, rows)
    if data is not None:
        payload = data.tobytes()
        sink = getattr(out, "buffer", None)
        if sink is not None:
            sink.write(payload)
        else:
            out.write(payload.decode("utf-8"))
        return len(rows)
    results = compile_fstring(query_fstring, table, rows)
    if results:
        out.write("\n".join(results))
        out.write("\n")
    return len(results)
