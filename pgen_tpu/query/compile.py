"""Vectorized predicate/fstring compiler over columnar metadata.

The reference evaluates include-expressions by rebuilding a HashMapContext and
re-parsing values for EVERY row (/root/reference/src/pfile.rs:319-329) — the
O(rows) hot spot of metadata filtering (SURVEY.md §3.1). Here the expression
is parsed ONCE and lowered to whole-column numpy (or JAX, see
compile_device.py) operations:

    ID == "rs8100066" || ALT == "G"
      -> (id_col == b"rs8100066") | (alt_col == b"G")   # two memcmp sweeps

Any construct outside the vectorizable subset (function calls, numeric
column math) falls back to the exact row interpreter, so evalexpr parity
never depends on compiler coverage. The compiled mask must agree with
interp.eval_boolean on every row; tests/test_expr.py enforces this on random
expressions.
"""

from __future__ import annotations

import numpy as np

from pgen_tpu.query.ast import Binary, Call, ExprError, Lit, Unary, Var
from pgen_tpu.query.interp import (
    _apply_binary,
    _is_num,
    _type_name,
    eval_boolean,
    eval_string,
    eval_value,
)
from pgen_tpu.query.parser import parse

# Compiled value kinds
_MASK = "mask"  # np.bool_ (rows,)
_STRCOL = "strcol"  # np.bytes_ 'S' (rows,)
_SCALAR = "scalar"  # python constant
_COLREF = "colref"  # lazy column handle: materialized only when needed


class _Fallback(Exception):
    """Internal: expression leaves the vectorizable subset."""


class _ColRef:
    """Lazy handle to a metadata column.

    Equality against a string literal runs straight off the field-offset
    index (MetadataTable.column_equals) — no padded matrix, no big
    temporaries; any other use materializes the 'S' array once.
    """

    __slots__ = ("table", "name")

    def __init__(self, table, name):
        self.table = table
        self.name = name

    def materialize(self):
        return self.table.get_column_bytes(self.name)


def _strcol(kind, v):
    """Materialize a column operand to its 'S' array."""
    return v.materialize() if kind == _COLREF else v


def _lower(node, table):
    if isinstance(node, Lit):
        return (_SCALAR, node.value)
    if isinstance(node, Var):
        if node.name not in table.columns:
            raise ExprError(f"variable identifier is not bound: {node.name}")
        return (_COLREF, _ColRef(table, node.name))
    if isinstance(node, Unary):
        kind, v = _lower(node.operand, table)
        if node.op == "!":
            if kind == _MASK:
                return (_MASK, ~v)
            if kind == _SCALAR:
                if not isinstance(v, bool):
                    raise ExprError(f"!: expected Boolean, got {_type_name(v)}")
                return (_SCALAR, not v)
            raise ExprError("!: expected Boolean, got String")
        if node.op == "neg":
            if kind == _SCALAR:
                if not _is_num(v):
                    raise ExprError(f"unary -: expected a number, got {_type_name(v)}")
                return (_SCALAR, -v)
            raise ExprError("unary -: expected a number, got String")
        raise _Fallback
    if isinstance(node, Binary):
        lk, lv = _lower(node.left, table)
        rk, rv = _lower(node.right, table)
        return _lower_binary(node.op, lk, lv, rk, rv)
    if isinstance(node, Call):
        raise _Fallback
    raise _Fallback


def _as_bytes(s: str) -> bytes:
    return s.encode("utf-8")


def _lower_binary(op, lk, lv, rk, rv):
    if lk == _SCALAR and rk == _SCALAR:
        return (_SCALAR, _apply_binary(op, lv, rv))

    # fast path: column == / != string literal straight off the offsets
    if op in ("==", "!="):
        if lk == _COLREF and rk == _SCALAR and isinstance(rv, str):
            m = lv.table.column_equals(lv.name, rv.encode("utf-8"))
            return (_MASK, ~m if op == "!=" else m)
        if rk == _COLREF and lk == _SCALAR and isinstance(lv, str):
            m = rv.table.column_equals(rv.name, lv.encode("utf-8"))
            return (_MASK, ~m if op == "!=" else m)
    if lk == _COLREF:
        lk, lv = _STRCOL, lv.materialize()
    if rk == _COLREF:
        rk, rv = _STRCOL, rv.materialize()

    if op in ("==", "!="):
        neg = op == "!="
        res = _equality(lk, lv, rk, rv)
        return (_MASK, ~res if neg else res)

    if op in ("<", "<=", ">", ">="):
        return (_MASK, _ordering(op, lk, lv, rk, rv))

    if op in ("&&", "||"):
        lm = _to_mask(lk, lv, op)
        rm = _to_mask(rk, rv, op)
        return (_MASK, lm & rm if op == "&&" else lm | rm)

    if op == "+":
        if lk == _STRCOL and rk == _STRCOL:
            return (_STRCOL, np.char.add(lv, rv))
        if lk == _STRCOL and rk == _SCALAR:
            if not isinstance(rv, str):
                raise ExprError(f"+: cannot concatenate String and {_type_name(rv)}")
            return (_STRCOL, np.char.add(lv, _as_bytes(rv)))
        if lk == _SCALAR and rk == _STRCOL:
            if not isinstance(lv, str):
                raise ExprError(f"+: cannot concatenate {_type_name(lv)} and String")
            return (_STRCOL, np.char.add(_as_bytes(lv), rv))
        raise ExprError("+: expected two numbers or two strings")

    if op in ("-", "*", "/", "%", "^"):
        # All metadata columns are strings; column arithmetic is a type error
        # on every row, exactly as the interpreter reports it.
        raise ExprError(f"{op}: expected two numbers, got String operand")

    raise _Fallback


def _equality(lk, lv, rk, rv):
    if lk == _STRCOL and rk == _STRCOL:
        return lv == rv
    if lk == _STRCOL or rk == _STRCOL:
        col, scalar = (lv, rv) if lk == _STRCOL else (rv, lv)
        if isinstance(scalar, str):
            return col == _as_bytes(scalar)
        # Cross-type equality is variant-tagged: always unequal (interp.py).
        return np.zeros(len(col), dtype=bool)
    if lk == _MASK and rk == _MASK:
        return lv == rv
    if lk == _MASK or rk == _MASK:
        mask, scalar = (lv, rv) if lk == _MASK else (rv, lv)
        if isinstance(scalar, bool):
            return mask == scalar
        return np.zeros(len(mask), dtype=bool)
    raise _Fallback


def _ordering(op, lk, lv, rk, rv):
    ops = {
        "<": np.less,
        "<=": np.less_equal,
        ">": np.greater,
        ">=": np.greater_equal,
    }
    if lk == _STRCOL and rk == _STRCOL:
        return ops[op](lv, rv)
    if lk == _STRCOL and rk == _SCALAR:
        if not isinstance(rv, str):
            raise ExprError(f"{op}: cannot order String against {_type_name(rv)}")
        return ops[op](lv, _as_bytes(rv))
    if lk == _SCALAR and rk == _STRCOL:
        if not isinstance(lv, str):
            raise ExprError(f"{op}: cannot order {_type_name(lv)} against String")
        return ops[op](_as_bytes(lv), rv)
    if lk == _MASK or rk == _MASK:
        raise ExprError(f"{op}: cannot order Booleans")
    raise _Fallback


def _to_mask(kind, v, op):
    if kind == _MASK:
        return v
    if kind == _SCALAR:
        if not isinstance(v, bool):
            raise ExprError(f"{op}: expected Boolean, got {_type_name(v)}")
        return v  # numpy broadcasts python bool
    raise ExprError(f"{op}: expected Boolean, got String")


def _row_context(table, i):
    return {name: table.get_column_strs(name)[i] for name in table.columns}


def _fallback_mask(node, table) -> np.ndarray:
    mask = np.empty(table.num_rows, dtype=bool)
    for i in range(table.num_rows):
        mask[i] = eval_boolean(node, _row_context(table, i))
    return mask


def compile_predicate(expr, table) -> np.ndarray:
    """Evaluate a boolean include-expression over every metadata row.

    Returns a (num_rows,) bool mask. ``expr`` may be a source string or a
    parsed AST; ``None`` keeps every row (pfile.rs:93,321 map_or(true, ..)).
    """
    if expr is None:
        return np.ones(table.num_rows, dtype=bool)
    node = parse(expr) if isinstance(expr, str) else expr
    if table.num_rows == 0:
        # The reference never evaluates the expression when there are no
        # rows, so even an ill-typed expression succeeds vacuously.
        return np.zeros(0, dtype=bool)
    try:
        kind, v = _lower(node, table)
    except _Fallback:
        return _fallback_mask(node, table)
    if kind == _SCALAR:
        if not isinstance(v, bool):
            raise ExprError(f"expected Boolean result, got {_type_name(v)}")
        return np.full(table.num_rows, v, dtype=bool)
    if kind != _MASK:
        raise ExprError("expected Boolean result, got String")
    return np.broadcast_to(v, (table.num_rows,)) if np.ndim(v) == 0 else v


def compile_fstring_bytes(expr, table, rows) -> np.ndarray | None:
    """Vectorized fstring evaluation straight to output bytes.

    Returns a uint8 buffer of newline-terminated result lines for the given
    rows, or None when the expression needs the row-interpreter fallback.
    Avoids materializing per-row Python strings on the query hot path.
    """
    node = parse(expr) if isinstance(expr, str) else expr
    rows = np.asarray(rows)
    if len(rows) == 0 and table.num_rows == 0:
        return np.zeros(0, dtype=np.uint8)
    try:
        kind, v = _lower(node, table)
    except _Fallback:
        return None
    if kind == _COLREF:
        kind, v = _STRCOL, v.materialize()
    if kind == _SCALAR:
        if not isinstance(v, str):
            raise ExprError(f"expected String result, got {_type_name(v)}")
        line = v.encode("utf-8") + b"\n"
        return np.frombuffer(line * len(rows), dtype=np.uint8)
    if kind != _STRCOL:
        raise ExprError("expected String result, got Boolean")
    if len(rows) == 0:
        return np.zeros(0, dtype=np.uint8)
    sel = np.ascontiguousarray(v[rows])
    width = sel.dtype.itemsize
    mat = sel.view(np.uint8).reshape(len(sel), width)
    lens = np.char.str_len(sel).astype(np.int32)
    try:
        from pgen_tpu.native import HAVE_NATIVE, native
    except ImportError:
        HAVE_NATIVE = False
    if HAVE_NATIVE:
        return native.join_lines(mat, lens)
    out = b"\n".join(bytes(x) for x in sel) + b"\n"
    return np.frombuffer(out, dtype=np.uint8)


def compile_fstring(expr, table, rows=None) -> list:
    """Evaluate a -f/--fstring expression for the given rows (default: all).

    Returns a list of result strings (one per selected row), matching
    eval_string_with_context per row (pfile.rs:97).
    """
    node = parse(expr) if isinstance(expr, str) else expr
    if rows is None:
        rows = np.arange(table.num_rows)
    rows = np.asarray(rows)
    if len(rows) == 0:
        return []
    try:
        kind, v = _lower(node, table)
    except _Fallback:
        return [eval_string(node, _row_context(table, int(i))) for i in rows]
    if kind == _SCALAR:
        if not isinstance(v, str):
            raise ExprError(f"expected String result, got {_type_name(v)}")
        return [v] * len(rows)
    if kind == _COLREF:
        kind, v = _STRCOL, v.materialize()
    if kind != _STRCOL:
        raise ExprError("expected String result, got Boolean")
    sel = v[rows]
    return [b.decode("utf-8") for b in sel]
