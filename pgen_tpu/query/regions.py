"""bcftools-style region specs desugared into include-expressions.

`--regions "19:200000-300000,20,X:1000-"` restricts `filter`/`query`/
`stats` to the named spans. Rather than adding a second mask plumbing
path, a spec compiles to an expression in the engine's own language and
is AND-ed with any `--include-var` — so regions work identically across
every pipeline (single-process, --workers, --shards, the device mesh)
and stay byte-exact by construction.

Grammar per comma-separated token (1-based, inclusive, as bcftools -r):

  CHROM            the whole contig
  CHROM:POS        exactly that position
  CHROM:BEG-END    the closed span
  CHROM:BEG-       from BEG to the end of the contig

The reference has no region support (its queries are full metadata scans,
/root/reference/src/pfile.rs:78-102); this rides the vectorized `num()`
comparison path.
"""

from __future__ import annotations


class RegionSpecError(ValueError):
    """A --regions spec could not be parsed."""


def _chrom_literal(chrom: str, spec: str) -> str:
    if not chrom or any(c in chrom for c in '",\\'):
        raise RegionSpecError(f"bad region {spec!r}: invalid contig name {chrom!r}")
    return f'CHROM == "{chrom}"'


def _pos_int(tok: str, spec: str) -> int:
    # NB: no thousands-separator support — a comma inside a position can
    # never reach here (the spec splits on ',' first), so accepting one
    # would only mask misparsed specs
    if not tok.isdigit():
        raise RegionSpecError(f"bad region {spec!r}: position {tok!r} is not a number")
    return int(tok)


def regions_to_expr(spec: str) -> str:
    """Compile a region spec to an include-expression string."""
    terms = []
    for raw in spec.split(","):
        tok = raw.strip()
        if not tok:
            continue
        if ":" not in tok:
            terms.append(_chrom_literal(tok, tok))
            continue
        chrom, _, span = tok.rpartition(":")
        c = _chrom_literal(chrom, tok)
        # contig names may themselves contain ':' (GRCh38 HLA alts like
        # "HLA-DRB1*15:01:01"); bcftools resolves the ambiguity against the
        # header's contig list, which a context-free desugar cannot see —
        # so ALSO match the whole token as an exact contig name (one extra
        # vectorized equality; never matches unless such a contig exists)
        whole = _chrom_literal(tok, tok)
        if "-" in span:
            beg_s, _, end_s = span.partition("-")
            beg = _pos_int(beg_s, tok)
            if end_s:
                end = _pos_int(end_s, tok)
                if end < beg:
                    raise RegionSpecError(f"bad region {tok!r}: end < start")
                terms.append(
                    f"({whole} || ({c} && num(POS) >= {beg} && num(POS) <= {end}))"
                )
            else:
                terms.append(f"({whole} || ({c} && num(POS) >= {beg}))")
        else:
            pos = _pos_int(span, tok)
            terms.append(f"({whole} || ({c} && num(POS) == {pos}))")
    if not terms:
        raise RegionSpecError(f"empty region spec {spec!r}")
    return " || ".join(terms)


def apply_regions(var_query: str | None, regions: str | None) -> str | None:
    """AND a --regions spec into an (optional) --include-var expression."""
    if not regions:
        return var_query
    expr = regions_to_expr(regions)
    if var_query is None:
        return expr
    return f"({expr}) && ({var_query})"
