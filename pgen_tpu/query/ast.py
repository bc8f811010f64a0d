"""AST and error types for the pgen_tpu expression language.

The language replicates the subset of the ``evalexpr`` crate (v11.3.0) the
reference exposes for ``-i/--include``, ``--include-var``, ``--include-sam``
and ``-f/--fstring`` (/root/reference/src/pfile.rs:93-97,321-329;
README.md:268-280). Value model: String / Int / Float / Boolean; every
metadata variable is a String (pfile.rs:88-92 sets all columns as
Value::String).
"""

from __future__ import annotations

from dataclasses import dataclass


class ExprError(ValueError):
    """Runtime expression evaluation error (evalexpr EvalexprError parity)."""


class ParseError(ExprError):
    """Expression syntax error."""


@dataclass(frozen=True)
class Lit:
    """Literal: str, int, float, or bool (Python-typed)."""

    value: object


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Unary:
    op: str  # '!' or 'neg'
    operand: object


@dataclass(frozen=True)
class Binary:
    op: str  # one of || && == != < <= > >= + - * / % ^
    left: object
    right: object


@dataclass(frozen=True)
class Call:
    name: str  # e.g. 'min', 'len', 'str::to_lowercase'
    args: tuple


def walk(node):
    """Yield every node in the expression tree."""
    yield node
    if isinstance(node, Unary):
        yield from walk(node.operand)
    elif isinstance(node, Binary):
        yield from walk(node.left)
        yield from walk(node.right)
    elif isinstance(node, Call):
        for a in node.args:
            yield from walk(a)


def variables(node) -> set:
    """Set of variable names referenced by the expression."""
    return {n.name for n in walk(node) if isinstance(n, Var)}
