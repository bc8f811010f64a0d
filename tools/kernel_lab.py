#!/usr/bin/env python
"""Kernel stage timing lab for the device pipeline (run on the TPU chip).

Times each stage of the mesh step with chained-dependency fori_loops
(plain block_until_ready timing lies through the axon tunnel: the chain
forces serialization on device, and the scalar sum forces materialized
results). Reports per-stage wall time, implied HBM traffic, and achieved
GB/s vs the v5e ~819 GB/s roofline.

Usage: timeout 900 python tools/kernel_lab.py [stage ...]
Stages default to all. V/R via env PGEN_LAB_V / PGEN_LAB_R.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

V = int(os.environ.get("PGEN_LAB_V", 65536))
R = int(os.environ.get("PGEN_LAB_R", 626))
PEAK_GBPS = float(os.environ.get("PGEN_LAB_PEAK", 819))


def _chain_time(make_body, x0, n_long=48, n_short=2, reps=5):
    """Two-point chained timing: (t_long - t_short)/(n_long - n_short).

    The differencing cancels the tunnel RTT, but each (t_long, t_short)
    pair is one-shot and RTT jitter (tens of ms through the axon tunnel)
    can swamp a few-ms signal — so repeat and take the MIN slope, with a
    long chain so the signal dominates."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x, n):
        def body(i, acc):
            return make_body(acc)

        r = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(r.reshape(-1)[:16].astype(jnp.int32))

    int(chain(x0, 1))  # compile
    t_long = min(_once(chain, x0, n_long) for _ in range(reps))
    t_short = min(_once(chain, x0, n_short) for _ in range(reps))
    return max((t_long - t_short) / (n_long - n_short), 1e-9)


def _once(chain, x0, n):
    t0 = time.perf_counter()
    int(chain(x0, n))
    return time.perf_counter() - t0


def main(stages):
    import jax
    import jax.numpy as jnp

    from pgen_tpu.ops.gt_text import _text_word
    from pgen_tpu.ops.unpack import _unpack_words, unpack_words, words_to_bytes

    backend = jax.default_backend()
    print(f"# backend={backend} V={V} R={R}", file=sys.stderr)

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 256, size=(V, R), dtype=np.uint8))
    mask_np = rng.random(V) < 0.5
    mask = jnp.asarray(mask_np)
    order_np = np.argsort(~mask_np, kind="stable").astype(np.int32)
    codes_np = rng.integers(0, 4, size=(V, 4 * R), dtype=np.uint8)
    codes = jnp.asarray(codes_np)


    def _fold(w):
        """Consume all 4 bytes of each u32 -> 1 byte (prevents XLA from
        dead-code-eliminating any part of the producer, unlike a byte-plane
        slice); ~4 extra lane-ops per word."""
        y = w ^ (w >> 16)
        y = (y ^ (y >> 8)) & 0xFF
        return y.astype(jnp.uint8)

    def _fold4(tw):
        """(V, 4R) u32 text words -> (V, R) u8, consuming every byte, with
        no strided gathers (the [::4] slice feedback was itself a gather
        that dominated earlier full-chain measurements)."""
        y = _fold(tw).astype(jnp.uint32)
        v, n = y.shape
        return (y.reshape(v, n // 4, 4).sum(-1) & 0xFF).astype(jnp.uint8)

    results = {}

    def report(name, dt, traffic_bytes):
        gbps = traffic_bytes / dt / 1e9
        results[name] = (dt, gbps)
        print(
            f"{name:28s} {dt * 1e3:8.2f} ms  {gbps:7.1f} GB/s "
            f"({100 * gbps / PEAK_GBPS:5.1f}% peak)",
            flush=True,
        )

    if "argsort" in stages:
        # (V,) bool -> argsort -> feed back bool via parity; traffic ~ V*(1+4+4)
        def body(m):
            o = jnp.argsort(jnp.logical_not(m), stable=True)
            return (o & 1).astype(bool)

        dt = _chain_time(body, mask)
        report("argsort(mask)", dt, V * 9)

    if "take" in stages:
        order = jnp.asarray(order_np)

        def body(p):
            return jnp.take(p, order, axis=0)

        dt = _chain_time(body, packed)
        report("take(packed, order)", dt, 2 * V * R)

    if "take_words" in stages:
        # same gather but on a u32 view (R/4 words): fewer, wider lanes
        packed_w = jnp.asarray(
            np.ascontiguousarray(
                rng.integers(0, 2**32, size=(V, R // 4), dtype=np.uint32)
            )
        )
        order = jnp.asarray(order_np)

        def body(p):
            return jnp.take(p, order, axis=0)

        dt = _chain_time(body, packed_w)
        report("take(u32 words)", dt, 2 * V * (R // 4) * 4)

    if "unpack_pallas" in stages:
        def body(p):
            return _fold(unpack_words(p))

        dt = _chain_time(body, packed)
        report("unpack (pallas)", dt, 5 * V * R)

    if "unpack_xla" in stages:
        # XLA fuses the unpack INTO the fold consumer: the u32 words are
        # never materialized, so true traffic is 1 B read + 1 B written
        # per record byte (this is also what production gets — the text
        # stage consumes the words in-register). Measures ~= HBM peak.
        def body(p):
            return _fold(_unpack_words(p))

        dt = _chain_time(body, packed)
        report("unpack+fold (xla fused)", dt, 2 * V * R)

    if "text_xla" in stages:
        def body(c):
            return _fold(_text_word(c.astype(jnp.uint32)))

        dt = _chain_time(body, codes)
        report("text words (xla jnp)", dt, (1 + 4) * V * 4 * R)

    if "fused_xla" in stages:
        # packed -> codes -> text words, all jnp elementwise in one jit:
        # XLA fuses; traffic should be 1 read + 16 written per record byte
        def body(p):
            w = _unpack_words(p)
            cb = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(V, 4 * R)
            tw = _text_word(cb.astype(jnp.uint32))
            return _fold4(tw)

        dt = _chain_time(body, packed)
        report("packed->text (xla fused)", dt, 17 * V * R)

    if "full" in stages:
        # the mesh _local_pipeline minus collectives
        from pgen_tpu.parallel.mesh import _local_pipeline

        def body(p):
            tw, cnt = _local_pipeline(p, mask, None)
            return _fold4(tw)

        dt = _chain_time(body, packed)
        vps = V / dt
        print(f"{'full local step':28s} {dt * 1e3:8.2f} ms  {vps / 1e6:7.2f} M var/s (tare incl.)", flush=True)
        # step: gather 2 + unpack 1r+4w + text 4r+16w = 27 B per record
        # byte; the _fold4 measurement tare adds 16r+1w = 17 -> 44 total
        report("full step traffic", dt, 44 * V * R)

    def _spread(xi):
        e = xi & 0x33
        o = xi & 0xCC
        return ((e * 0x1001) & 0x00030003) | ((o * 0x40040) & 0x03000300)

    def _text_lut(c):
        c2 = c << 1
        d0 = (jnp.uint32(0x3A) >> c2) & 3
        d1 = (jnp.uint32(0x3E) >> c2) & 3
        return jnp.uint32(0x2E2F2E09) + (d0 << 8) + (d1 << 24)

    if "unpack_mul" in stages:
        # multiply-spread: 2 and + 2 mul + 2 and + 1 or vs ~11 shift/and/or
        def body(p):
            return _fold(_spread(p.astype(jnp.uint32)))

        dt = _chain_time(body, packed)
        report("unpack (mul-spread)", dt, 5 * V * R)

    if "text_lut" in stages:
        def body(c):
            return _fold(_text_lut(c.astype(jnp.uint32)))

        dt = _chain_time(body, codes)
        report("text words (2-bit LUT)", dt, (1 + 4) * V * 4 * R)

    if "fused_mul" in stages:
        def body(p):
            w = _spread(p.astype(jnp.uint32))
            cb = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(V, 4 * R)
            tw = _text_lut(cb.astype(jnp.uint32))
            return _fold4(tw)

        dt = _chain_time(body, packed)
        report("packed->text (mul+lut)", dt, 17 * V * R)

    if "full_v2" in stages:
        # materialization barrier between unpack and text: stops XLA from
        # fusing the chain into one slow loop (fused measures ~11 ms vs
        # ~3.2 ms for separately-materialized stages)
        def body(p):
            order = jnp.argsort(jnp.logical_not(mask), stable=True)
            g = jnp.take(p, order, axis=0)
            w = _unpack_words(g)
            cb = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(V, 4 * R)
            cb = jax.lax.optimization_barrier(cb)
            tw = _text_word(cb.astype(jnp.uint32))
            return _fold4(tw)

        dt = _chain_time(body, packed)
        print(f"{'full v2 (barrier)':28s} {dt * 1e3:8.2f} ms  {V / dt / 1e6:7.2f} M var/s", flush=True)

    if "full_v3" in stages:
        # barrier + mul-spread unpack + 2-bit-LUT text
        def body(p):
            order = jnp.argsort(jnp.logical_not(mask), stable=True)
            g = jnp.take(p, order, axis=0)
            w = _spread(g.astype(jnp.uint32))
            cb = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(V, 4 * R)
            cb = jax.lax.optimization_barrier(cb)
            tw = _text_lut(cb.astype(jnp.uint32))
            return _fold4(tw)

        dt = _chain_time(body, packed)
        print(f"{'full v3 (mul+lut+barrier)':28s} {dt * 1e3:8.2f} ms  {V / dt / 1e6:7.2f} M var/s", flush=True)

    if "full_v2m" in stages:
        # barrier + mul-spread unpack + select-based text (the best mix)
        def body(p):
            order = jnp.argsort(jnp.logical_not(mask), stable=True)
            g = jnp.take(p, order, axis=0)
            w = _spread(g.astype(jnp.uint32))
            cb = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(V, 4 * R)
            cb = jax.lax.optimization_barrier(cb)
            tw = _text_word(cb.astype(jnp.uint32))
            return _fold4(tw)

        dt = _chain_time(body, packed)
        print(f"{'full v2m (mul+sel+barrier)':28s} {dt * 1e3:8.2f} ms  {V / dt / 1e6:7.2f} M var/s", flush=True)

    if "full_pallas2" in stages:
        # two explicit pallas kernels as the materialization points
        from pgen_tpu.ops.gt_text import _text_words_from_codes
        from pgen_tpu.ops.unpack import unpack_words

        def body(p):
            order = jnp.argsort(jnp.logical_not(mask), stable=True)
            g = jnp.take(p, order, axis=0)
            w = unpack_words(g)
            cb = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(V, 4 * R)
            tw = _text_words_from_codes(cb, False)
            return _fold4(tw)

        dt = _chain_time(body, packed)
        print(f"{'full pallas x2':28s} {dt * 1e3:8.2f} ms  {V / dt / 1e6:7.2f} M var/s", flush=True)

    if "planes_prod" in stages:
        # THE production form: plane outputs materialized as jit outputs,
        # chained across two jits by a real data dependency (see
        # docs/BENCHMARKS.md round-2: in-chain fusion hides the
        # materialization cost; barriers over-count it)
        from pgen_tpu.parallel.mesh import _local_pipeline_planes

        for name, compact in (("compact", True), ("precompacted", False)):
            @jax.jit
            def step_prod(x0, compact=compact):
                planes, cnt = _local_pipeline_planes(x0, mask, compact=compact)
                return planes

            @jax.jit
            def fold_jit(planes):
                t0, t1, t2, t3 = planes
                y = t0 ^ t1 ^ (t2 >> 8) ^ (t3 >> 16)
                return ((y ^ (y >> 8)) & 0xFF).astype(jnp.uint8)

            def run(n):
                acc = packed
                for _ in range(n):
                    acc = fold_jit(step_prod(acc))
                return int(jnp.sum(acc[:, :8].astype(jnp.int32)))

            run(1)

            def once(n):
                t0 = time.perf_counter()
                run(n)
                return time.perf_counter() - t0

            t24 = min(once(24) for _ in range(5))
            t2 = min(once(2) for _ in range(5))
            pair = max((t24 - t2) / 22, 1e-9)
            fold_floor = 17 * V * R / (PEAK_GBPS * 1e9)
            bare = max(pair - fold_floor, 1e-9)
            print(
                f"{'planes prod (' + name + ')':28s} {bare * 1e3:8.2f} ms  "
                f"{V / bare / 1e6:7.2f} M var/s (pair {pair * 1e3:.2f} ms)",
                flush=True,
            )

    if "full_nocompact" in stages:
        def body(p):
            w = _unpack_words(p)
            cb = jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(V, 4 * R)
            tw = _text_word(cb.astype(jnp.uint32))
            return _fold4(tw)

        dt = _chain_time(body, packed)
        print(f"{'no-compact step':28s} {dt * 1e3:8.2f} ms  {V / dt / 1e6:7.2f} M var/s", flush=True)

    return results


def _dispatch_time(fn, args, n=16, reps=4):
    """Time n async dispatches of a jitted fn, blocking once at the end.

    Valid when per-call work >> tunnel RTT; repeats and takes the min
    (single-shot batches vary several-fold with tunnel congestion).
    """
    import jax

    jax.block_until_ready(fn(*args))  # compile
    jax.block_until_ready(fn(*args))  # steady state
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def prod_stages(stages):
    """Timings of the REAL production step (full HBM outputs, no feedback
    slicing) via pipelined async dispatch."""
    import jax
    import jax.numpy as jnp

    from pgen_tpu.ops.unpack import _unpack_words

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 256, size=(V, R), dtype=np.uint8))
    mask = jnp.asarray(rng.random(V) < 0.5)
    print(f"# dispatch-timing backend={jax.default_backend()} V={V} R={R}", file=sys.stderr)

    if "prod_unpack" in stages:
        f = jax.jit(lambda p: _unpack_words(p))
        dt = _dispatch_time(f, (packed,))
        print(f"{'prod unpack (full write)':28s} {dt * 1e3:8.2f} ms  {5 * V * R / dt / 1e9:7.1f} GB/s", flush=True)

    if "prod_step" in stages:
        from jax.sharding import Mesh

        from pgen_tpu.parallel.mesh import build_mesh_pipeline_step

        mesh = Mesh(np.asarray(jax.devices()[:1]), ("v",))
        step = build_mesh_pipeline_step(mesh, None)
        valid = jnp.ones(V, dtype=bool)
        dt = _dispatch_time(step, (packed, mask, valid))
        print(f"{'prod mesh step (1 dev)':28s} {dt * 1e3:8.2f} ms  {V / dt / 1e6:7.2f} M var/s", flush=True)


ALL = [
    "argsort",
    "take",
    "take_words",
    "unpack_pallas",
    "unpack_xla",
    "unpack_mul",
    "text_xla",
    "text_lut",
    "fused_xla",
    "fused_mul",
    "full",
]

if __name__ == "__main__":
    stages = sys.argv[1:] or ALL
    prod = [s for s in stages if s.startswith("prod_")]
    rest = [s for s in stages if not s.startswith("prod_")]
    if rest:
        main(rest)
    if prod:
        prod_stages(prod)
