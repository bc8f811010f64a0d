#!/usr/bin/env python
"""Benchmark harness: chr22-scale filter wall-clock vs the reference.

Prints ONE JSON line:
  {"metric": "chr22_keep_all_filter_wall_s", "value": <median s>,
   "unit": "s", "vs_baseline": <ref_s / ours_s>, ...detail fields}

Baselines (BASELINE.md, /root/reference/README.md:162-189, unstated AVX2
Intel dev box):
  keep-all chr22 filter -> VCF : 30.747 s   (the flagship, output-bound)
  keep-2   chr22 filter -> VCF :  2.773 s   (metadata-scan bound)

Dataset: synthesized chr22-scale fileset (1,103,547 variants x 2504 samples
— the 1000G phase3 chr22 shape; ~690 MB .pgen, ~11 GB VCF out). Generation
is cached under data/chr22/ and untimed. Each config runs once untimed
(page-cache warmup) then BENCH_RUNS timed runs; the median is reported.

Env knobs: PGEN_BENCH_VARIANTS (default 1103547), BENCH_RUNS (default 5),
PGEN_BENCH_PROVIDER (default native).
"""

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

BASELINE_KEEP_ALL_S = 30.747
BASELINE_KEEP_TWO_S = 2.773


def _timed_runs(fn, runs):
    fn()  # warmup: page cache, imports, JIT
    os.sync()  # drain writeback so earlier configs' dirty pages don't
    # steal memory bandwidth from the timed runs
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    os.sync()
    return times


def main():
    num_variants = int(os.environ.get("PGEN_BENCH_VARIANTS", 1_103_547))
    runs = int(os.environ.get("BENCH_RUNS", 5))
    provider = os.environ.get("PGEN_BENCH_PROVIDER", "native")

    from make_fixtures import ensure_chr22

    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.pipeline.filter import filter_to_vcf

    t0 = time.perf_counter()
    prefix = str(
        ensure_chr22(REPO / "data", num_variants=num_variants, uniform_bytes=True)
    )
    gen_s = time.perf_counter() - t0

    out = f"{prefix}.bench.vcf"

    # keep-all: the output-bound flagship config
    def run_keep_all():
        return filter_to_vcf(prefix, out_file=out, provider=provider)

    keep_all_times = _timed_runs(run_keep_all, runs)
    keep_all = statistics.median(keep_all_times)
    res = run_keep_all()
    out_gb = res.bytes_written / 1e9

    # keep-2: metadata-scan bound (two real POS values from the fixture)
    pvar = read_metadata(f"{prefix}.pvar")
    pos = pvar.get_column_strs("POS")
    p1, p2 = pos[len(pos) // 3], pos[2 * len(pos) // 3]
    q = f'POS=="{p1}" || POS=="{p2}"'
    out2 = f"{prefix}.bench2.vcf"

    def run_keep_two():
        return filter_to_vcf(prefix, var_query=q, out_file=out2, provider=provider)

    keep_two_times = _timed_runs(run_keep_two, runs)
    keep_two = statistics.median(keep_two_times)

    # half-samples (masked-LUT subset path): opt-in — it writes another
    # multi-GB output whose page-allocation/writeback would otherwise
    # perturb the headline configs on fresh machines.
    half = None
    if os.environ.get("PGEN_BENCH_HALF", "0") == "1":
        out3 = f"{prefix}.bench3.vcf"

        def run_half():
            return filter_to_vcf(
                prefix, sam_query='IID < "NA"', out_file=out3, provider=provider
            )

        half = statistics.median(_timed_runs(run_half, max(1, runs - 1)))

    detail = {
        "keep_all_runs_s": [round(t, 3) for t in keep_all_times],
        "keep_two_wall_s": round(keep_two, 3),
        "keep_two_vs_baseline": round(BASELINE_KEEP_TWO_S / keep_two, 2),
        **({"half_samples_wall_s": round(half, 3)} if half is not None else {}),
        "output_gb": round(out_gb, 2),
        "emit_gbps": round(out_gb / keep_all, 2),
        "variants": num_variants,
        "samples": 2504,
        "variants_per_s": int(num_variants / keep_all),
        "provider": provider,
        "fixture_gen_s": round(gen_s, 1),
        "baseline_keep_all_s": BASELINE_KEEP_ALL_S,
        "baseline_keep_two_s": BASELINE_KEEP_TWO_S,
    }

    # device decode kernel throughput (best-effort; absent off-TPU; run in a
    # subprocess with a hard timeout — remote-compile tunnels can hang)
    if os.environ.get("PGEN_BENCH_KERNEL", "1") == "1":
        detail.update(_bench_unpack_kernel_subprocess())

    print(
        json.dumps(
            {
                "metric": "chr22_keep_all_filter_wall_s",
                "value": round(keep_all, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_KEEP_ALL_S / keep_all, 2),
                **detail,
            }
        )
    )


def _bench_unpack_kernel_subprocess() -> dict:
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, __file__, "--kernel-bench"],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=str(REPO),
        )
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if r.returncode == 0 and line:
            return {"unpack_kernel_gbps": round(float(line), 1)}
        return {"unpack_kernel_error": (r.stderr or "no output")[-160:]}
    except subprocess.TimeoutExpired:
        return {"unpack_kernel_error": "timeout"}


def _bench_unpack_kernel() -> float:
    """Chained-dependency unpack-words benchmark on the JAX default backend.

    Returns achieved GB/s counting 1 byte read + 4 written per record byte.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "cpu":
        raise RuntimeError("no accelerator backend")

    from pgen_tpu.ops.unpack import unpack_words

    V, R = 65536, 626
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(V, R), dtype=np.uint8)
    )

    @jax.jit
    def chain(x, n):
        def body(i, acc):
            w = unpack_words(acc)
            return jax.lax.bitcast_convert_type(w, jnp.uint8)[:, :, 0]

        r = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(r[:, :8].astype(jnp.int32))

    int(chain(x, 1))  # compile
    t0 = time.perf_counter()
    int(chain(x, 12))
    t12 = time.perf_counter() - t0
    t0 = time.perf_counter()
    int(chain(x, 2))
    t2 = time.perf_counter() - t0
    dt = max((t12 - t2) / 10, 1e-9)
    return 5 * V * R / dt / 1e9


if __name__ == "__main__":
    if "--kernel-bench" in sys.argv:
        print(_bench_unpack_kernel())
    else:
        main()
