"""End-to-end randomized differential test: random filesets x random
predicates on both axes, full VCF byte-compared against the independent
scalar oracle (the strongest whole-pipeline invariant)."""

import numpy as np
import pytest

from conftest import build_fileset
from oracle import scalar_filter_vcf
from pgen_tpu.pipeline.filter import filter_to_vcf

BASES = ["A", "C", "G", "T"]


def _random_fileset(tmp_path, rng, trial):
    nvar = int(rng.integers(1, 60))
    nsamp = int(rng.integers(1, 50))
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    chroms = rng.choice(["1", "2", "X"], nvar)
    alts = rng.choice(BASES, nvar)
    refs = rng.choice(BASES, nvar)
    pos = np.cumsum(rng.integers(1, 100, nvar)) + 1
    pvar_rows = [
        f"{chroms[i]}\t{pos[i]}\tv{i}\t{refs[i]}\t{alts[i]}\t.\tPASS\tAF=0.{i%10}"
        for i in range(nvar)
    ]
    sexes = rng.choice(["M", "F", "NA"], nsamp)
    psam_rows = [f"id{i}\t{sexes[i]}" for i in range(nsamp)]
    prefix = build_fileset(tmp_path, f"fz{trial}", codes, pvar_rows, psam_rows)
    meta = {
        "alts": alts,
        "chroms": chroms,
        "pos": pos,
        "sexes": sexes,
        "nvar": nvar,
        "nsamp": nsamp,
    }
    return prefix, meta


def _random_var_query(rng, meta):
    choice = rng.integers(0, 6)
    if choice == 0:
        return None, None
    if choice == 1:
        alt = rng.choice(BASES)
        return f'ALT == "{alt}"', lambda v: v["ALT"] == alt
    if choice == 2:
        c = rng.choice(["1", "2", "X"])
        alt = rng.choice(BASES)
        return (
            f'CHROM == "{c}" && ALT != "{alt}"',
            lambda v: v["CHROM"] == c and v["ALT"] != alt,
        )
    if choice == 3:
        p = str(meta["pos"][rng.integers(0, meta["nvar"])])
        return f'POS == "{p}" || ID == "v0"', (
            lambda v: v["POS"] == p or v["ID"] == "v0"
        )
    if choice == 4:
        cut = str(meta["pos"][meta["nvar"] // 2])
        return f'POS < "{cut}"', lambda v: v["POS"] < cut  # lexicographic
    return '!(REF == ALT)', lambda v: v["REF"] != v["ALT"]


def _random_sam_query(rng, meta):
    choice = rng.integers(0, 4)
    if choice == 0:
        return None, None
    if choice == 1:
        s = rng.choice(["M", "F", "NA"])
        return f'SEX == "{s}"', lambda r: r["SEX"] == s
    if choice == 2:
        i = int(rng.integers(0, meta["nsamp"]))
        return f'IID == "id{i}"', lambda r: r["IID"] == f"id{i}"
    s = rng.choice(["M", "F"])
    return (
        f'SEX != "{s}" && IID != "id0"',
        lambda r: r["SEX"] != s and r["IID"] != "id0",
    )


@pytest.mark.parametrize("trial", range(20))
def test_random_filter_matches_oracle(tmp_path, trial):
    rng = np.random.default_rng(7000 + trial)
    prefix, meta = _random_fileset(tmp_path, rng, trial)
    var_q, var_pred = _random_var_query(rng, meta)
    sam_q, sam_pred = _random_sam_query(rng, meta)
    provider = ["native", "numpy", "device"][trial % 3]
    out = tmp_path / "out.vcf"
    filter_to_vcf(
        prefix, var_query=var_q, sam_query=sam_q, out_file=out, provider=provider
    )
    expected = scalar_filter_vcf(prefix, var_pred, sam_pred)
    assert out.read_bytes() == expected, (trial, var_q, sam_q, provider)


@pytest.mark.parametrize("trial", range(8))
def test_random_filter_mesh_matches_oracle(tmp_path, trial):
    """The device-mesh pipeline (8 virtual devices) against the oracle:
    rotates host-known-mask (pre-gathered, precompacted planes) and
    device-lowered predicates across random filesets."""
    from pgen_tpu.pipeline.mesh_filter import filter_to_vcf_mesh

    rng = np.random.default_rng(8100 + trial)
    prefix, meta = _random_fileset(tmp_path, rng, trial)
    var_q, var_pred = _random_var_query(rng, meta)
    sam_q, sam_pred = _random_sam_query(rng, meta)
    out = tmp_path / "out.vcf"
    filter_to_vcf_mesh(
        prefix, var_query=var_q, sam_query=sam_q, out_file=out, block_variants=16
    )
    expected = scalar_filter_vcf(prefix, var_pred, sam_pred)
    assert out.read_bytes() == expected, (trial, var_q, sam_q)


@pytest.mark.parametrize("trial", range(6))
def test_random_gz_index_roundtrip(tmp_path, trial):
    """Sharded/unsharded .vcf.gz + index fuzz: the decompressed stream
    must match the oracle and indexed region fetches must match a brute
    scan."""
    import gzip

    from pgen_tpu.formats.tabix import fetch_region
    from pgen_tpu.parallel.shard import filter_to_vcf_parallel, filter_to_vcf_sharded

    rng = np.random.default_rng(8200 + trial)
    nvar = int(rng.integers(4, 80))
    nsamp = int(rng.integers(1, 30))
    codes = rng.integers(0, 4, size=(nvar, nsamp), dtype=np.uint8)
    pos = np.sort(rng.integers(1, 1_000_000, nvar))
    pvar_rows = [
        f"9\t{pos[i]}\tv{i}\t{'ACGT'[i % 4]}\tT\t.\t.\t." for i in range(nvar)
    ]
    prefix = build_fileset(
        tmp_path, f"gz{trial}", codes, pvar_rows,
        [f"s{i}\tM" for i in range(nsamp)],
    )
    out = tmp_path / "o.vcf.gz"
    fmt = ["auto", "tbi", "csi"][trial % 3]
    if trial % 2 == 0:
        filter_to_vcf_parallel(
            prefix, out_file=str(out), num_workers=2, index=True, index_format=fmt
        )
    else:
        filter_to_vcf_sharded(
            prefix, out_file=str(out), num_shards=2, index=True, index_format=fmt
        )
    expected = scalar_filter_vcf(prefix, None, None)
    assert gzip.decompress(out.read_bytes()) == expected
    suffix = ".csi" if fmt == "csi" else ".tbi"
    idx = str(out) + suffix
    for _ in range(4):
        beg = int(rng.integers(0, 1_000_000))
        end = beg + int(rng.integers(1, 400_000))
        got = fetch_region(str(out), idx, "9", beg, end)
        want = [
            ln
            for ln in expected.split(b"\n")
            if ln and not ln.startswith(b"#")
            and beg < int(ln.split(b"\t", 2)[1]) <= end  # REF len 1: p0 in [beg,end)
        ]
        assert got == want, (trial, fmt, beg, end)


@pytest.mark.parametrize("trial", range(10))
def test_random_exclude_and_regions_file_match_oracle(tmp_path, trial):
    """The round-2 sugar surface (-R regions files, --exclude-var) against
    the oracle: desugared expressions must keep exactly the rows a direct
    Python predicate keeps, byte-for-byte through the whole pipeline."""
    from cli_helpers import run_cli

    rng = np.random.default_rng(8300 + trial)
    prefix, meta = _random_fileset(tmp_path, rng, 100 + trial)
    k = int(rng.integers(1, 8))
    picks = rng.integers(0, meta["nvar"], k)
    lines, site_set, spans = [], set(), []
    for i in picks:
        c = str(meta["chroms"][i])
        p = int(meta["pos"][i])
        if rng.integers(0, 2):
            lines.append(f"{c}\t{p}")
            site_set.add((c, p))
        else:
            b = max(1, p - int(rng.integers(0, 5)))
            e = p + int(rng.integers(0, 60))
            lines.append(f"{c}\t{b}\t{e}")
            spans.append((c, b, e))
    rfile = tmp_path / "sites.txt"
    rfile.write_text("".join(ln + "\n" for ln in lines))
    ex_q, ex_pred = _random_var_query(rng, meta)
    out = tmp_path / "sug.vcf"
    argv = ["filter", str(prefix), "-R", str(rfile), "-o", str(out)]
    if ex_q is not None:
        argv += ["--exclude-var", ex_q]
    assert run_cli(argv) == 0

    def var_pred(v):
        c, p = v["CHROM"], int(v["POS"])
        in_region = (c, p) in site_set or any(
            c == sc and b <= p <= e for sc, b, e in spans
        )
        if not in_region:
            return False
        return ex_pred is None or not ex_pred(v)

    expected = scalar_filter_vcf(prefix, var_pred, None)
    assert out.read_bytes() == expected, (trial, lines, ex_q)
