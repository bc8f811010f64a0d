"""Device (JAX) lowering of include-predicates over padded column tensors.

The on-device half of the predicate compiler (SURVEY.md C7): metadata
columns ship to the device as zero-padded (rows, width) uint8 matrices
(MetadataTable.get_column_padded) and the expression lowers to jnp boolean
ops, so variant/sample filtering becomes an on-device mask + compacting
gather inside the jitted pipeline (BASELINE.json north star). Used by
parallel/mesh.py where the column tensors are sharded over the variant axis.

Anything outside the subset raises DeviceFallback; callers then evaluate on
host (query/compile.py) and feed the mask in as a device array. Semantics
match interp.py exactly for the supported subset (zero-padding is safe:
NUL sorts below every text byte, so padded memcmp == lexicographic compare).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pgen_tpu.query.ast import Binary, ExprError, Lit, Unary, Var
from pgen_tpu.query.parser import parse


class DeviceFallback(Exception):
    """Expression leaves the device-loweable subset."""


_MASK = "mask"
_COL = "col"  # (mat (N, W) u8, lens (N,) i32)
_SCALAR = "scalar"


def _pad_lit(s: str, width: int) -> np.ndarray:
    b = s.encode("utf-8")
    out = np.zeros(width, dtype=np.uint8)
    out[: len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out


def _common_width(a, b):
    wa, wb = a.shape[1], b.shape[1]
    w = max(wa, wb)
    if wa < w:
        a = jnp.pad(a, ((0, 0), (0, w - wa)))
    if wb < w:
        b = jnp.pad(b, ((0, 0), (0, w - wb)))
    return a, b


def _col_eq_lit(mat, lit: str):
    b = lit.encode("utf-8")
    if len(b) > mat.shape[1]:
        return jnp.zeros(mat.shape[0], dtype=bool)
    litp = jnp.asarray(_pad_lit(lit, mat.shape[1]))
    return jnp.all(mat == litp[None, :], axis=1)


def _col_cmp(a, b, op: str):
    """Lexicographic ordering of two (N, W) zero-padded byte matrices."""
    a, b = _common_width(a, b)
    diff = a != b
    any_diff = jnp.any(diff, axis=1)
    first = jnp.argmax(diff, axis=1)
    av = jnp.take_along_axis(a, first[:, None], axis=1)[:, 0]
    bv = jnp.take_along_axis(b, first[:, None], axis=1)[:, 0]
    lt = jnp.where(any_diff, av < bv, False)
    if op == "<":
        return lt
    if op == "<=":
        return lt | ~any_diff
    if op == ">":
        return jnp.where(any_diff, av > bv, False)
    return jnp.where(any_diff, av > bv, False) | ~any_diff


def lower_device(node, cols: dict):
    """Lower an AST to a (rows,) bool jnp mask over the given column tensors.

    ``cols`` maps column name -> (mat, lens) jnp arrays. Raises
    DeviceFallback for unsupported constructs, ExprError for type errors.
    """
    kind, v = _lower(node, cols)
    if kind == _SCALAR:
        if not isinstance(v, bool):
            raise ExprError("expected Boolean result")
        some = next(iter(cols.values()))[0]
        return jnp.full(some.shape[0], v, dtype=bool)
    if kind != _MASK:
        raise ExprError("expected Boolean result, got String")
    return v


def compile_predicate_device(expr, table):
    """Host-convenience wrapper: evaluate expr on device over a MetadataTable."""
    node = parse(expr) if isinstance(expr, str) else expr
    from pgen_tpu.query.ast import variables

    cols = {}
    for name in variables(node):
        if name in table.columns:
            mat, lens = table.get_column_padded(name)
            cols[name] = (jnp.asarray(mat), jnp.asarray(lens))
    if not cols:
        raise DeviceFallback("no column variables in expression")
    return lower_device(node, cols)


def _lower(node, cols):
    if isinstance(node, Lit):
        return (_SCALAR, node.value)
    if isinstance(node, Var):
        if node.name not in cols:
            raise ExprError(f"variable identifier is not bound: {node.name}")
        return (_COL, cols[node.name])
    if isinstance(node, Unary):
        kind, v = _lower(node.operand, cols)
        if node.op == "!" and kind == _MASK:
            return (_MASK, ~v)
        if node.op == "!" and kind == _SCALAR and isinstance(v, bool):
            return (_SCALAR, not v)
        raise DeviceFallback(f"unary {node.op}")
    if isinstance(node, Binary):
        lk, lv = _lower(node.left, cols)
        rk, rv = _lower(node.right, cols)
        op = node.op
        if op in ("==", "!="):
            m = _eq(lk, lv, rk, rv)
            return (_MASK, ~m if op == "!=" else m)
        if op in ("<", "<=", ">", ">="):
            return (_MASK, _ord(op, lk, lv, rk, rv))
        if op in ("&&", "||"):
            lm = _as_mask(lk, lv)
            rm = _as_mask(rk, rv)
            return (_MASK, lm & rm if op == "&&" else lm | rm)
        raise DeviceFallback(f"operator {op}")
    raise DeviceFallback(type(node).__name__)


def _eq(lk, lv, rk, rv):
    if lk == _COL and rk == _SCALAR:
        if isinstance(rv, str):
            return _col_eq_lit(lv[0], rv)
        return jnp.zeros(lv[0].shape[0], dtype=bool)
    if lk == _SCALAR and rk == _COL:
        return _eq(rk, rv, lk, lv)
    if lk == _COL and rk == _COL:
        a, b = _common_width(lv[0], rv[0])
        return jnp.all(a == b, axis=1)
    raise DeviceFallback("equality shape")


def _ord(op, lk, lv, rk, rv):
    if lk == _COL and rk == _SCALAR:
        if not isinstance(rv, str):
            raise ExprError(f"{op}: cannot order String against non-String")
        w = max(lv[0].shape[1], len(rv.encode()))
        litm = jnp.broadcast_to(jnp.asarray(_pad_lit(rv, w)), (lv[0].shape[0], w))
        return _col_cmp(lv[0], litm, op)
    if lk == _SCALAR and rk == _COL:
        flipped = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}[op]
        return _ord(flipped, rk, rv, lk, lv)
    if lk == _COL and rk == _COL:
        return _col_cmp(lv[0], rv[0], op)
    raise DeviceFallback("ordering shape")


def _as_mask(kind, v):
    if kind == _MASK:
        return v
    if kind == _SCALAR and isinstance(v, bool):
        return v
    # The host compiler implements evalexpr's short-circuited RHS type check
    # ('false && <string>' is all-false, not an error); defer to it rather
    # than duplicating that logic on device.
    raise DeviceFallback("&&/||: non-Boolean operand")
