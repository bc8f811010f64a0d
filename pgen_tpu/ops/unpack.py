"""2-bit genotype unpack: the performance-critical decode kernel.

Reference semantics (/root/reference/src/pfile.rs:171-175): each record byte
holds 4 hard calls, LSB-first — sample ``s`` reads byte ``s // 4`` and
extracts ``(byte >> ((s % 4) * 2)) & 0b11``. The reference does this one
sample at a time in scalar Rust; here one Pallas program unpacks a whole
(variants x record_bytes) tile at once.

TPU-native trick: a lane-interleaving expansion (byte j -> output lanes
4j..4j+3) is a relayout Mosaic can't fuse, so the kernel never interleaves.
Instead each input byte produces ONE uint32 word whose 4 little-endian bytes
are the 4 codes:

    word_j = sum_k ((x_j >> 2k) & 3) << 8k        (pure VPU elementwise)

and the (V, R) u32 output is bitcast to (V, 4R) u8 at the XLA level, which
is a free row-major relabeling. The op is HBM-bandwidth bound (1 byte read,
4 written); compute is a handful of VPU byte ops.

Code values: 0=hom-ref(0/0) 1=het(0/1) 2=hom-alt(1/1) 3=missing(./.)
(pfile.rs:177-183).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# host implementations live in the jax-free unpack_host module (so host
# pipelines can import them without paying the jax/pallas import);
# re-exported here for compatibility
from pgen_tpu.ops.unpack_host import (  # noqa: F401
    unpack_codes_numpy,
    unpack_codes_reference,
)


def _unpack_words(x: jnp.ndarray) -> jnp.ndarray:
    """(TV, R) u8 -> (TV, R) u32; word j's bytes (LE) = codes of samples 4j..4j+3.

    Multiply-spread: the even bit-pairs (p0 at bits 0-1, p2 at 4-5) land on
    bytes 0 and 2 via one multiply by (1 | 1<<12) — the shifted copies hit
    disjoint bit ranges, so no carries — and the odd pairs on bytes 1 and 3
    via (1<<6 | 1<<18). 7 VPU lane-ops per byte instead of ~11 for the
    shift/and/or ladder: measured 630 GB/s vs 314 GB/s on v5e (the op is
    VPU-bound, so ops/byte is the currency — see docs/BENCHMARKS.md).
    Verified equal to the reference extraction (pfile.rs:171-175) for all
    256 byte values in tests/test_ops.py.
    """
    xi = x.astype(jnp.uint32)
    even = xi & 0x33
    odd = xi & 0xCC
    return ((even * 0x1001) & 0x00030003) | ((odd * 0x40040) & 0x03000300)


def _unpack_kernel(in_ref, out_ref):
    out_ref[:] = _unpack_words(in_ref[:])


def words_to_bytes(words: jnp.ndarray) -> jnp.ndarray:
    """(V, R) u32 -> (V, 4R) u8, little-endian within each word (XLA-level)."""
    v, r = words.shape
    b = jax.lax.bitcast_convert_type(words, jnp.uint8)  # (V, R, 4)
    return b.reshape(v, 4 * r)


def bytes_to_words(b: jnp.ndarray) -> jnp.ndarray:
    """(V, 4R) u8 -> (V, R) u32, inverse of words_to_bytes (XLA-level)."""
    v, n = b.shape
    return jax.lax.bitcast_convert_type(b.reshape(v, n // 4, 4), jnp.uint32)


def _block_rows(lane_bytes: int, budget: int = 4 * 1024 * 1024) -> int:
    """Tile height fitting a VMEM budget given bytes per row in flight.

    ``lane_bytes`` should count input + output + compiler temporaries per
    row; Mosaic double-buffers grid blocks and allocates scoped scratch for
    elementwise intermediates, so stay well under the 16 MB VMEM limit.
    """
    rows = max(8, min(2048, budget // max(lane_bytes, 1)))
    return 1 << (rows.bit_length() - 1)


def unpack_words(packed: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(V, R) u8 packed records -> (V, R) u32 code words (Pallas)."""
    nvar, rec = packed.shape
    tv = _block_rows(rec * (1 + 4 + 4 * 4))
    grid = (pl.cdiv(nvar, tv),)
    return pl.pallas_call(
        _unpack_kernel,
        out_shape=jax.ShapeDtypeStruct((nvar, rec), jnp.uint32),
        grid=grid,
        in_specs=[pl.BlockSpec((tv, rec), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tv, rec), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed)


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def unpack_codes(packed: jnp.ndarray, num_samples: int, interpret: bool = False):
    """Unpack (V, rec_size) u8 records to (V, num_samples) u8 codes on device."""
    if packed.shape[0] == 0 or packed.shape[1] == 0:
        return jnp.zeros((packed.shape[0], num_samples), dtype=jnp.uint8)
    return words_to_bytes(unpack_words(packed, interpret))[:, :num_samples]


@functools.partial(jax.jit, static_argnames=("num_samples",))
def unpack_codes_xla(packed: jnp.ndarray, num_samples: int):
    """Pure-XLA unpack (no Pallas): baseline for kernel benchmarking."""
    return words_to_bytes(_unpack_words(packed))[:, :num_samples]
