"""EXPERIMENTAL: single-pass fused packed->text kernel (transposed layout).

Round-1 finding (docs/BENCHMARKS.md): Mosaic's `pltpu.bitcast` u32->u8
expands the SUBLANE dimension with exactly the interleave a 1->4 byte
expansion needs (output row 4i+k = byte k of word row i). In a transposed
layout — record bytes on sublanes, variants on lanes — the whole
packed -> codes -> text chain therefore fuses into ONE Pallas kernel with
zero intermediate HBM traffic:

    x  (R, V) u8   packed bytes (transposed)
    w  (R, V) u32  4 codes per word           (elementwise)
    c  (4R, V) u8  sample-major codes         (in-kernel bitcast)
    tw (4R, V) u32 text word per code         (elementwise)
    out (16R, V) u8 GT text, column-major     (in-kernel bitcast)

Measured on one v5e: ~4.7M variants/s — correct but currently VPU-bound
(the u32-widened byte ops dominate), on par with the XLA-fused row-major
composition (~6M var/s) rather than ahead of it, and the row-major VCF
consumer would pay boundary transposes. Kept as the building block for
device-resident consumers (on-device repack/stats pipelines) and future
Mosaic codegen improvements; the production paths use ops/unpack +
ops/gt_text.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAB, _SLASH, _ZERO, _ONE, _DOT = 9, 47, 48, 49, 46


def _fused_kernel(in_ref, out_ref):
    x = in_ref[:].astype(jnp.uint32)
    w = (x & 3) | (((x >> 2) & 3) << 8) | (((x >> 4) & 3) << 16) | (
        ((x >> 6) & 3) << 24
    )
    c = pltpu.bitcast(w, jnp.uint8).astype(jnp.uint32)
    b0 = jnp.where(c < 2, _ZERO, jnp.where(c == 2, _ONE, _DOT)).astype(jnp.uint32)
    b1 = jnp.where(c == 0, _ZERO, jnp.where(c == 3, _DOT, _ONE)).astype(jnp.uint32)
    out_ref[:] = pltpu.bitcast(
        _TAB | (b0 << 8) | (_SLASH << 16) | (b1 << 24), jnp.uint8
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def genotype_text_transposed(packed_t: jnp.ndarray, interpret: bool = False):
    """(rec_size, V) u8 packed (transposed) -> (16*rec_size, V) u8 text.

    Output row 4s+m is text byte m ('\\t', b0, '/', b1) of sample s, per
    variant column. interpret=True runs on CPU backends (tests).
    """
    rec, v = packed_t.shape
    rt, vt = min(rec, 64), 1024
    return pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((16 * rec, v), jnp.uint8),
        grid=(pl.cdiv(rec, rt), pl.cdiv(v, vt)),
        in_specs=[
            pl.BlockSpec((rt, vt), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (16 * rt, vt), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(packed_t)
