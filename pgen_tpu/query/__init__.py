from pgen_tpu.query.ast import Binary, Call, ExprError, Lit, ParseError, Unary, Var
from pgen_tpu.query.parser import parse
from pgen_tpu.query.interp import eval_boolean, eval_string, eval_value
from pgen_tpu.query.compile import compile_predicate, compile_fstring

__all__ = [
    "parse",
    "eval_boolean",
    "eval_string",
    "eval_value",
    "compile_predicate",
    "compile_fstring",
    "ExprError",
    "ParseError",
    "Lit",
    "Var",
    "Unary",
    "Binary",
    "Call",
]
