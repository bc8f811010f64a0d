"""Row-wise expression interpreter (exact-parity fallback path).

Implements the evalexpr v11.3.0 value/type semantics the reference relies on
(/root/reference/src/pfile.rs:93-97; README.md:268-280):

* ``==``/``!=`` compare values of ANY types; mismatched types are simply
  unequal (never an error) — so ``POS == 16647494`` is false while
  ``POS == "16647494"`` matches, because context variables are all strings.
* ``< <= > >=`` order two numbers (int/float mix promotes to float) or two
  strings (byte-wise lexicographic); anything else errors.
* ``+`` concatenates two strings or adds two numbers (int+int stays int);
  string+number errors.
* ``- * / % ^`` are numeric; int/int division and modulo stay integral
  (truncating, like Rust); ``^`` always yields a float.
* ``&&``/``||``/``!`` demand booleans; both operands evaluate eagerly.

The vectorized compiler (compile.py) must agree with this interpreter on
every expression it accepts; property tests enforce that.
"""

from __future__ import annotations

import math

from pgen_tpu.query.ast import Binary, Call, ExprError, Lit, Unary, Var
from pgen_tpu.query.parser import parse


def _type_name(v) -> str:
    if isinstance(v, bool):
        return "Boolean"
    if isinstance(v, int):
        return "Int"
    if isinstance(v, float):
        return "Float"
    if isinstance(v, str):
        return "String"
    return type(v).__name__


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _both_int(a, b) -> bool:
    return (
        isinstance(a, int)
        and isinstance(b, int)
        and not isinstance(a, bool)
        and not isinstance(b, bool)
    )


def _values_equal(a, b) -> bool:
    # evalexpr Value equality: variant-tagged, so Int(1) != Float(1.0) and no
    # cross-type coercion; Python needs explicit tag checks (bool vs int!).
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if _is_num(a) and _is_num(b):
        return type(a) is type(b) and a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return False


def _expect_bool(v, op):
    if not isinstance(v, bool):
        raise ExprError(f"{op}: expected Boolean, got {_type_name(v)}")
    return v


def _numeric_pair(a, b, op):
    if not (_is_num(a) and _is_num(b)):
        raise ExprError(f"{op}: expected two numbers, got {_type_name(a)} and {_type_name(b)}")
    return a, b


def eval_value(node, context: dict):
    """Evaluate the AST against a {variable: value} context."""
    if isinstance(node, Lit):
        return node.value
    if isinstance(node, Var):
        try:
            return context[node.name]
        except KeyError:
            raise ExprError(f"variable identifier is not bound: {node.name}") from None
    if isinstance(node, Unary):
        v = eval_value(node.operand, context)
        if node.op == "!":
            return not _expect_bool(v, "!")
        if node.op == "neg":
            if not _is_num(v):
                raise ExprError(f"unary -: expected a number, got {_type_name(v)}")
            return -v
        raise ExprError(f"unknown unary operator {node.op}")
    if isinstance(node, Binary):
        a = eval_value(node.left, context)
        b = eval_value(node.right, context)
        return _apply_binary(node.op, a, b)
    if isinstance(node, Call):
        args = [eval_value(arg, context) for arg in node.args]
        return _call_builtin(node.name, args)
    raise ExprError(f"unknown AST node {node!r}")


def _apply_binary(op, a, b):
    if op == "==":
        return _values_equal(a, b)
    if op == "!=":
        return not _values_equal(a, b)
    if op in ("<", "<=", ">", ">="):
        if isinstance(a, str) and isinstance(b, str):
            pass  # lexicographic
        else:
            _numeric_pair(a, b, op)
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        return a >= b
    if op == "&&":
        return _expect_bool(a, "&&") and _expect_bool(b, "&&")
    if op == "||":
        return _expect_bool(a, "||") or _expect_bool(b, "||")
    if op == "+":
        if isinstance(a, str) and isinstance(b, str):
            return a + b
        _numeric_pair(a, b, "+")
        return a + b
    if op == "-":
        _numeric_pair(a, b, "-")
        return a - b
    if op == "*":
        _numeric_pair(a, b, "*")
        return a * b
    if op == "/":
        _numeric_pair(a, b, "/")
        if _both_int(a, b):
            if b == 0:
                raise ExprError("division by zero")
            return int(a / b)  # truncate toward zero (Rust i64 division)
        if b == 0:
            return math.inf if a > 0 else (-math.inf if a < 0 else math.nan)
        return a / b
    if op == "%":
        _numeric_pair(a, b, "%")
        if _both_int(a, b):
            if b == 0:
                raise ExprError("modulo by zero")
            return int(math.fmod(a, b))  # Rust % truncates toward zero
        return math.fmod(a, b)
    if op == "^":
        _numeric_pair(a, b, "^")
        return float(a) ** float(b)
    raise ExprError(f"unknown operator {op}")


_STR_FUNCS = {
    "str::to_lowercase": lambda s: s.lower(),
    "str::to_uppercase": lambda s: s.upper(),
    "str::trim": lambda s: s.strip(),
}

# evalexpr's regex builtins are backed by the Rust `regex` crate; Python
# `re` covers the same common syntax (character classes, anchors,
# alternation, repetition). Differences only appear in exotic constructs
# (look-around is absent from BOTH engines).
def _regex_matches(s: str, pattern: str) -> bool:
    import re as _re

    try:
        return _re.search(pattern, s) is not None
    except _re.error as e:
        raise ExprError(f"str::regex_matches: invalid regex {pattern!r}: {e}")


def _regex_replace(s: str, pattern: str, repl: str) -> str:
    import re as _re

    try:
        return _re.sub(pattern, repl, s)
    except _re.error as e:
        raise ExprError(f"str::regex_replace: invalid regex {pattern!r}: {e}")


def _call_builtin(name, args):
    if name == "len":
        (v,) = _arity(name, args, 1)
        if isinstance(v, str):
            return len(v)
        raise ExprError(f"len: expected String, got {_type_name(v)}")
    if name in _STR_FUNCS:
        (v,) = _arity(name, args, 1)
        if not isinstance(v, str):
            raise ExprError(f"{name}: expected String, got {_type_name(v)}")
        return _STR_FUNCS[name](v)
    if name in ("min", "max"):
        if not args:
            raise ExprError(f"{name}: expected at least one argument")
        for v in args:
            if not _is_num(v):
                raise ExprError(f"{name}: expected numbers, got {_type_name(v)}")
        return min(args) if name == "min" else max(args)
    if name == "str::from":
        (v,) = _arity(name, args, 1)
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    if name == "contains":
        a, b = _arity(name, args, 2)
        if isinstance(a, str) and isinstance(b, str):
            return b in a
        raise ExprError("contains: expected two Strings")
    if name == "str::regex_matches":
        a, b = _arity(name, args, 2)
        if isinstance(a, str) and isinstance(b, str):
            return _regex_matches(a, b)
        raise ExprError("str::regex_matches: expected two Strings")
    if name == "str::regex_replace":
        a, b, c = _arity(name, args, 3)
        if all(isinstance(x, str) for x in (a, b, c)):
            return _regex_replace(a, b, c)
        raise ExprError("str::regex_replace: expected three Strings")
    if name == "str::substring":
        a, b, c = _arity(name, args, 3)
        if isinstance(a, str) and _is_num(b) and _is_num(c):
            return a[int(b) : int(c)]
        raise ExprError("str::substring: expected (String, Int, Int)")
    if name in ("math::abs", "abs"):
        (v,) = _arity(name, args, 1)
        if _is_num(v):
            return abs(v)
        raise ExprError(f"{name}: expected a number")
    if name == "floor":
        (v,) = _arity(name, args, 1)
        if _is_num(v):
            return float(math.floor(v))
        raise ExprError("floor: expected a number")
    if name == "ceil":
        (v,) = _arity(name, args, 1)
        if _is_num(v):
            return float(math.ceil(v))
        raise ExprError("ceil: expected a number")
    if name == "num":
        # extension: parse a string to Int (preferred) or Float; the
        # reference has no numeric typing at all (README.md:279-280)
        (v,) = _arity(name, args, 1)
        if _is_num(v):
            return v
        if isinstance(v, str):
            try:
                return int(v)
            except ValueError:
                pass
            try:
                return float(v)
            except ValueError:
                raise ExprError(f"num: cannot parse {v!r} as a number") from None
        raise ExprError(f"num: expected String or number, got {_type_name(v)}")
    if name == "if":
        c, t, f = _arity(name, args, 3)
        if not isinstance(c, bool):
            raise ExprError("if: expected Boolean condition")
        return t if c else f
    if name == "in_list":
        # extension: set membership against a comma-separated list literal,
        # vectorized to one np.isin pass by the compiler (query/compile.py)
        # — the backbone of --regions-file over large position lists. A
        # String needle matches list items verbatim; a numeric needle
        # parses each item with num() rules and equality stays
        # variant-tagged like == (Int never equals Float).
        v, lst = _arity(name, args, 2)
        if not isinstance(lst, str):
            raise ExprError(f"in_list: expected a String list, got {_type_name(lst)}")
        items = lst.split(",")
        if isinstance(v, str):
            return v in items
        if _is_num(v) and not isinstance(v, bool):
            for item in items:
                try:
                    parsed = _call_builtin("num", [item])
                except ExprError:
                    continue
                if isinstance(parsed, type(v)) and parsed == v:
                    return True
            return False
        raise ExprError(f"in_list: expected String or number, got {_type_name(v)}")
    raise ExprError(f"function identifier is not bound: {name}")


def _arity(name, args, n):
    if len(args) != n:
        raise ExprError(f"{name}: expected {n} argument(s), got {len(args)}")
    return args


def eval_boolean(expr, context: dict) -> bool:
    """Evaluate ``expr`` (string or AST) to a boolean, erroring on any other
    result type (evalexpr eval_boolean_with_context parity, pfile.rs:328)."""
    node = parse(expr) if isinstance(expr, str) else expr
    v = eval_value(node, context)
    if not isinstance(v, bool):
        raise ExprError(f"expected Boolean result, got {_type_name(v)}")
    return v


def eval_string(expr, context: dict) -> str:
    """Evaluate ``expr`` to a string, erroring on any other result type
    (evalexpr eval_string_with_context parity, pfile.rs:97)."""
    node = parse(expr) if isinstance(expr, str) else expr
    v = eval_value(node, context)
    if not isinstance(v, str):
        raise ExprError(f"expected String result, got {_type_name(v)}")
    return v
