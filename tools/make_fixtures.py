"""Fixture synthesis (SURVEY.md C13).

The reference ships plink2-generated filesets whose .pgen binaries (and two
.pvar files) are stripped from the read-only mount
(/root/reference/.MISSING_LARGE_BLOBS). The mode-0x02 geometry is fully
pinned (SURVEY.md C3/C9/C10), so this tool regenerates byte-valid fixtures:

  basic1   2504 samples x 17784 variants — real .pvar/.psam from the
           reference mount, synthesized genotypes (seeded)
  basic2 / random1
           300 samples x 200000 variants — real .psam, synthesized .pvar
           (snp0.. naming per the reference's ad-hoc drivers, main.rs:65-76)
           and genotypes
  chr22-like
           configurable-scale fileset mimicking 1000 Genomes chr22 for the
           benchmark configs (BASELINE.json): 2504 samples, ~1.1M variants

Genotypes are drawn with realistic hard-call frequencies (mostly hom-ref,
some het/hom-alt, rare missing). All generation is deterministic per seed.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pgen_tpu.formats.writer import write_pgen_packed, pack_codes

REFERENCE_DATA = Path(os.environ.get("PGEN_REFERENCE_DATA", "/root/reference/data"))
DEFAULT_OUT = Path(__file__).resolve().parent.parent / "data"

_GT_PROBS = (0.55, 0.25, 0.17, 0.03)  # hom-ref, het, hom-alt, missing


def _random_packed(rng, num_variants: int, num_samples: int) -> np.ndarray:
    """Packed records sampled directly at byte level for speed."""
    rec = (2 * num_samples + 7) // 8
    # sample codes in chunks to bound memory
    packed = np.empty((num_variants, rec), dtype=np.uint8)
    chunk = max(1, (1 << 27) // max(num_samples, 1))
    for lo in range(0, num_variants, chunk):
        hi = min(lo + chunk, num_variants)
        codes = rng.choice(4, size=(hi - lo, num_samples), p=_GT_PROBS).astype(np.uint8)
        packed[lo:hi] = pack_codes(codes)
    return packed


def _random_packed_bytes(rng, num_variants: int, num_samples: int) -> np.ndarray:
    """Realistic-frequency packed records sampled at BYTE level.

    The distribution of a packed byte is the product of 4 iid 2-bit code
    draws, so sampling bytes from the 256-entry CDF is ~10x faster than
    sampling codes and packing. Used for the chr22-scale realistic
    fixture; basic1 keeps the original code-level sampler so its committed
    golden hashes stay stable. Tail-byte padding bits carry random codes
    (beyond num_samples, never read)."""
    rec = (2 * num_samples + 7) // 8
    p_code = np.asarray(_GT_PROBS)
    idx = np.arange(256)
    p_byte = np.ones(256)
    for k in range(4):
        p_byte *= p_code[(idx >> (2 * k)) & 3]
    cdf = np.cumsum(p_byte)
    cdf[-1] = 1.0
    packed = np.empty((num_variants, rec), dtype=np.uint8)
    chunk = max(1, (1 << 26) // max(rec, 1))
    for lo in range(0, num_variants, chunk):
        hi = min(lo + chunk, num_variants)
        u = rng.random((hi - lo) * rec)
        packed[lo:hi] = (
            np.searchsorted(cdf, u, side="right")
            .astype(np.uint8)
            .reshape(hi - lo, rec)
        )
    return packed


def _write_pvar(path: Path, num_variants: int, chrom: str, seed: int, info: bool = True):
    rng = np.random.default_rng(seed)
    pos = np.cumsum(rng.integers(10, 500, size=num_variants)) + 10_000
    bases = np.array(list("ACGT"))
    ref = bases[rng.integers(0, 4, num_variants)]
    alt_off = rng.integers(1, 4, num_variants)
    alt = bases[(np.char.find("ACGT", ref.astype("U1")) + alt_off) % 4]
    af = rng.random(num_variants)
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"##contig=<ID={chrom}>\n")
        f.write('##INFO=<ID=AF,Number=A,Type=Float,Description="Allele Frequency">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        rows = []
        for i in range(num_variants):
            info_col = f"AF={af[i]:.6f}" if info else "."
            rows.append(
                f"{chrom}\t{pos[i]}\tsnp{i}\t{ref[i]}\t{alt[i]}\t100\tPASS\t{info_col}\n"
            )
            if len(rows) >= 100_000:
                f.write("".join(rows))
                rows = []
        f.write("".join(rows))


def _write_psam(path: Path, num_samples: int):
    with open(path, "w") as f:
        f.write("#IID\tSEX\n")
        f.write("".join(f"per{i}\tNA\n" for i in range(num_samples)))


def ensure_basic1(out_dir: Path = DEFAULT_OUT, seed: int = 1) -> Path:
    d = out_dir / "basic1"
    d.mkdir(parents=True, exist_ok=True)
    for ext in ("pvar", "psam"):
        src = REFERENCE_DATA / "basic1" / f"basic1.{ext}"
        dst = d / f"basic1.{ext}"
        if not dst.exists():
            shutil.copyfile(src, dst)
    pgen = d / "basic1.pgen"
    if not pgen.exists():
        rng = np.random.default_rng(seed)
        packed = _random_packed(rng, 17784, 2504)
        write_pgen_packed(pgen, packed, 2504)
    return d / "basic1"


def _ensure_synth(
    name: str, out_dir: Path, num_variants: int, num_samples: int, chrom: str, seed: int
) -> Path:
    d = out_dir / name
    d.mkdir(parents=True, exist_ok=True)
    psam_src = REFERENCE_DATA / name / f"{name}.psam"
    psam = d / f"{name}.psam"
    if not psam.exists():
        if psam_src.exists():
            shutil.copyfile(psam_src, psam)
        else:
            _write_psam(psam, num_samples)
    pvar = d / f"{name}.pvar"
    if not pvar.exists():
        _write_pvar(pvar, num_variants, chrom, seed)
    pgen = d / f"{name}.pgen"
    if not pgen.exists():
        rng = np.random.default_rng(seed + 1)
        write_pgen_packed(pgen, _random_packed(rng, num_variants, num_samples), num_samples)
    return d / name


def ensure_basic2(out_dir: Path = DEFAULT_OUT) -> Path:
    return _ensure_synth("basic2", out_dir, 200_000, 300, "1", seed=2)


def ensure_random1(out_dir: Path = DEFAULT_OUT) -> Path:
    return _ensure_synth("random1", out_dir, 200_000, 300, "1", seed=3)


def ensure_chr22(
    out_dir: Path = DEFAULT_OUT,
    num_variants: int = 1_103_547,
    num_samples: int = 2504,
    seed: int = 22,
    uniform_bytes: bool = False,
) -> Path:
    """chr22-scale fixture for the benchmark configs (BASELINE.md §6).

    uniform_bytes=True draws packed record bytes uniformly (fast generation;
    throughput-equivalent workload) instead of realistic genotype
    frequencies.
    """
    d = out_dir / "chr22"
    d.mkdir(parents=True, exist_ok=True)
    prefix = d / "chr22"
    pvar, psam, pgen = (Path(f"{prefix}.{e}") for e in ("pvar", "psam", "pgen"))
    # invalidate a cached fixture generated with different parameters
    meta = d / "meta.json"
    import json

    params = {
        "num_variants": num_variants,
        "num_samples": num_samples,
        "seed": seed,
        "uniform_bytes": uniform_bytes,
    }
    if meta.exists():
        try:
            if json.loads(meta.read_text()) != params:
                for p in (pvar, psam, pgen):
                    p.unlink(missing_ok=True)
        except ValueError:
            pass
    meta.write_text(json.dumps(params))
    if not psam.exists():
        ref_psam = REFERENCE_DATA / "basic1" / "basic1.psam"
        if ref_psam.exists() and num_samples == 2504:
            shutil.copyfile(ref_psam, psam)
        else:
            _write_psam(psam, num_samples)
    if not pvar.exists():
        _write_pvar(pvar, num_variants, "22", seed)
    if not pgen.exists():
        rng = np.random.default_rng(seed)
        if uniform_bytes:
            rec = (2 * num_samples + 7) // 8
            packed = rng.integers(0, 256, size=(num_variants, rec), dtype=np.uint8)
        else:
            packed = _random_packed_bytes(rng, num_variants, num_samples)
        write_pgen_packed(pgen, packed, num_samples)
    return prefix


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "fixtures",
        nargs="*",
        default=["basic1", "basic2", "random1"],
        choices=["basic1", "basic2", "random1", "chr22"],
        help="which fixtures to generate",
    )
    ap.add_argument("--out", type=Path, default=DEFAULT_OUT)
    ap.add_argument("--chr22-variants", type=int, default=1_103_547)
    args = ap.parse_args()
    for name in args.fixtures:
        if name == "basic1":
            p = ensure_basic1(args.out)
        elif name == "basic2":
            p = ensure_basic2(args.out)
        elif name == "random1":
            p = ensure_random1(args.out)
        else:
            p = ensure_chr22(args.out, num_variants=args.chr22_variants)
        print(f"{name}: {p}")


if __name__ == "__main__":
    main()
