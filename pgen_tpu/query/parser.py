"""Tokenizer + Pratt parser for the evalexpr-compatible expression subset.

Grammar (operators and precedences mirror evalexpr v11.3.0, the engine the
reference embeds — /root/reference/Cargo.toml:13-15, README.md:268-280):

    ||            70   left
    &&            75   left
    == != < <= > >= 80 left
    + -           95   left
    * / %        100   left
    prefix ! -   110
    ^            120   right

Literals: double-quoted strings (``\\`` and ``\"`` escapes), integers,
floats, ``true``/``false``. Identifiers are variables; ``name(...)`` and
namespaced ``str::name(...)`` are function calls.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pgen_tpu.query.ast import Binary, Call, Lit, ParseError, Unary, Var

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:::[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op>\|\||&&|==|!=|<=|>=|[<>+\-*/%^!()])
  | (?P<comma>,)
  | (?P<quote>")
    """,
    re.VERBOSE,
)

_BIN_PRECEDENCE = {
    "||": 70,
    "&&": 75,
    "==": 80,
    "!=": 80,
    "<": 80,
    "<=": 80,
    ">": 80,
    ">=": 80,
    "+": 95,
    "-": 95,
    "*": 100,
    "/": 100,
    "%": 100,
    "^": 120,
}
_PREFIX_PRECEDENCE = 110


@dataclass
class _Tok:
    kind: str  # 'lit' | 'ident' | 'op' | ',' | '(' | ')'
    value: object
    pos: int


def _lex_string(src: str, start: int):
    """Lex a double-quoted string starting at the opening quote."""
    out = []
    i = start + 1
    n = len(src)
    while i < n:
        c = src[i]
        if c == '"':
            return "".join(out), i + 1
        if c == "\\":
            if i + 1 >= n:
                raise ParseError(f"unterminated escape at {i}")
            esc = src[i + 1]
            mapped = {"\\": "\\", '"': '"', "n": "\n", "t": "\t", "r": "\r", "'": "'"}.get(esc)
            if mapped is None:
                raise ParseError(
                    f"unsupported escape '\\{esc}' at {i} (write '\\\\{esc}' "
                    f"for a literal backslash, e.g. in regex patterns)"
                )
            out.append(mapped)
            i += 2
        else:
            out.append(c)
            i += 1
    raise ParseError(f"unterminated string literal starting at {start}")


def tokenize(src: str) -> list:
    toks = []
    i = 0
    n = len(src)
    while i < n:
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ParseError(f"unexpected character {src[i]!r} at {i} in {src!r}")
        if m.lastgroup == "ws":
            i = m.end()
            continue
        if m.lastgroup == "quote":
            text, end = _lex_string(src, i)
            toks.append(_Tok("lit", text, i))
            i = end
            continue
        text = m.group()
        if m.lastgroup == "float":
            toks.append(_Tok("lit", float(text), i))
        elif m.lastgroup == "int":
            toks.append(_Tok("lit", int(text), i))
        elif m.lastgroup == "ident":
            if text == "true":
                toks.append(_Tok("lit", True, i))
            elif text == "false":
                toks.append(_Tok("lit", False, i))
            else:
                toks.append(_Tok("ident", text, i))
        elif m.lastgroup == "comma":
            toks.append(_Tok(",", text, i))
        else:  # op
            kind = text if text in "()" else "op"
            toks.append(_Tok(kind, text, i))
        i = m.end()
    return toks


class _Parser:
    def __init__(self, toks, src):
        self.toks = toks
        self.src = src
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        tok = self.peek()
        if tok is None:
            raise ParseError(f"unexpected end of expression: {self.src!r}")
        self.i += 1
        return tok

    def expect(self, kind):
        tok = self.next()
        if tok.kind != kind:
            raise ParseError(f"expected {kind!r}, got {tok.value!r} at {tok.pos}")
        return tok

    def parse_expr(self, min_bp=0):
        left = self.parse_prefix()
        while True:
            tok = self.peek()
            if tok is None or tok.kind not in ("op",) or tok.value not in _BIN_PRECEDENCE:
                break
            bp = _BIN_PRECEDENCE[tok.value]
            if bp < min_bp:
                break
            self.next()
            # '^' is right-associative; everything else is left-associative.
            next_bp = bp if tok.value == "^" else bp + 1
            right = self.parse_expr(next_bp)
            left = Binary(tok.value, left, right)
        return left

    def parse_prefix(self):
        tok = self.next()
        if tok.kind == "lit":
            return Lit(tok.value)
        if tok.kind == "ident":
            nxt = self.peek()
            if nxt is not None and nxt.kind == "(":
                self.next()
                args = []
                if self.peek() is not None and self.peek().kind != ")":
                    args.append(self.parse_expr(0))
                    while self.peek() is not None and self.peek().kind == ",":
                        self.next()
                        args.append(self.parse_expr(0))
                self.expect(")")
                return Call(tok.value, tuple(args))
            return Var(tok.value)
        if tok.kind == "(":
            inner = self.parse_expr(0)
            self.expect(")")
            return inner
        if tok.kind == "op" and tok.value == "!":
            return Unary("!", self.parse_expr(_PREFIX_PRECEDENCE))
        if tok.kind == "op" and tok.value == "-":
            return Unary("neg", self.parse_expr(_PREFIX_PRECEDENCE))
        raise ParseError(f"unexpected token {tok.value!r} at {tok.pos}")


def parse(src: str):
    """Parse an expression string into an AST."""
    parser = _Parser(tokenize(src), src)
    node = parser.parse_expr(0)
    trailing = parser.peek()
    if trailing is not None:
        raise ParseError(
            f"unexpected trailing token {trailing.value!r} at {trailing.pos} in {src!r}"
        )
    return node
