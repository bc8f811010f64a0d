"""Expression engine: parser, interpreter semantics, and the vectorized
compiler's exact agreement with the row interpreter (SURVEY.md C7)."""

import numpy as np
import pytest

from pgen_tpu.formats.metadata import read_metadata
from pgen_tpu.query.ast import ExprError, ParseError
from pgen_tpu.query.compile import compile_fstring, compile_predicate
from pgen_tpu.query.interp import eval_boolean, eval_string, eval_value
from pgen_tpu.query.parser import parse

CTX = {"CHROM": "19", "POS": "260912", "ID": "rs81", "ALT": "G", "EMPTY": ""}


# -- parser ----------------------------------------------------------------


def test_precedence_or_and():
    # && binds tighter than ||
    assert eval_boolean('ALT == "G" || ALT == "T" && CHROM == "nope"', CTX)


def test_parens():
    assert not eval_boolean('(ALT == "G" || ALT == "T") && CHROM == "nope"', CTX)


def test_string_escapes():
    assert eval_string('"a\\"b" + "\\\\"', {}) == 'a"b\\'


def test_parse_errors():
    for bad in ["ID ==", '"unterminated', "(ID", "a b", "~x", "1;;2"]:
        with pytest.raises(ParseError):
            parse(bad)
    # assignments PARSE (evalexpr grammar) but always error at eval time:
    # the reference evaluates against an immutable context (pfile.rs:93-97)
    for src in ["ID = 1", 'ID += "x"', "x = 1; x == 1"]:
        node = parse(src)
        with pytest.raises(ExprError, match="immutable"):
            eval_value(node, {"ID": "rs1"})


def test_numeric_literals():
    assert eval_value(parse("1 + 2 * 3"), {}) == 7
    assert eval_value(parse("2 ^ 3"), {}) == 8.0
    assert eval_value(parse("7 / 2"), {}) == 3  # int division truncates
    assert eval_value(parse("-7 / 2"), {}) == -3  # toward zero (Rust)
    assert eval_value(parse("-7 % 2"), {}) == -1
    assert eval_value(parse("1.5 + 1"), {}) == 2.5


# -- interpreter semantics (evalexpr parity) -------------------------------


def test_string_equality():
    assert eval_boolean('POS == "260912"', CTX)
    assert not eval_boolean('POS == "9"', CTX)


def test_cross_type_equality_is_false_not_error():
    # README.md:279-280 — all variables are strings; numeric compare is
    # string compare, and Int vs String is simply unequal
    assert not eval_boolean("POS == 260912", CTX)
    assert eval_boolean("POS != 260912", CTX)
    assert not eval_boolean("true == 1", {})


def test_string_ordering_lexicographic():
    assert eval_boolean('"10" < "9"', {})
    assert eval_boolean('POS >= "260912"', CTX)
    assert eval_boolean('"abc" < "abd"', {})
    assert eval_boolean('"ab" < "abc"', {})


def test_ordering_type_error():
    with pytest.raises(ExprError):
        eval_boolean('POS < 5', CTX)


def test_boolean_ops_require_booleans():
    with pytest.raises(ExprError):
        eval_boolean('ALT && true', CTX)
    with pytest.raises(ExprError):
        eval_boolean('!ALT', CTX)


def test_concat():
    assert eval_string('CHROM + " " + POS', CTX) == "19 260912"
    with pytest.raises(ExprError):
        eval_value(parse('CHROM + 1'), CTX)


def test_result_type_enforced():
    with pytest.raises(ExprError):
        eval_boolean('CHROM', CTX)  # String where Boolean needed
    with pytest.raises(ExprError):
        eval_string('CHROM == "19"', CTX)  # Boolean where String needed


def test_unbound_variable():
    with pytest.raises(ExprError, match="not bound"):
        eval_boolean('NOPE == "1"', CTX)


def test_builtins():
    assert eval_value(parse('len("abcd")'), {}) == 4
    assert eval_value(parse('str::to_lowercase("AbC")'), {}) == "abc"
    assert eval_value(parse("min(3, 1, 2)"), {}) == 1
    assert eval_value(parse('contains("hello", "ell")'), {})
    with pytest.raises(ExprError, match="not bound"):
        eval_value(parse("nosuch(1)"), {})


# -- vectorized compiler agreement -----------------------------------------


@pytest.fixture()
def table(tmp_path):
    rng = np.random.default_rng(5)
    alts = rng.choice(["A", "C", "G", "T"], 200)
    pos = rng.integers(1, 120, 200)
    rows = "".join(
        f"1\t{pos[i]}\trs{i % 17}\tA\t{alts[i]}\n" for i in range(200)
    )
    p = tmp_path / "t.pvar"
    p.write_text("#CHROM\tPOS\tID\tREF\tALT\n" + rows)
    return read_metadata(p)


EXPRS = [
    'ALT == "G"',
    'ALT != "G"',
    'ALT == "G" || ALT == "T"',
    'ALT == "G" && POS == "7"',
    '!(ALT == "G")',
    'POS < "50"',  # lexicographic!
    'POS >= "50"',
    'ID <= "rs3"',
    'ALT == REF',
    'ALT != REF',
    'CHROM + POS == "17"',
    'POS == 7',  # cross-type: all-false
    'true || ALT == "zzz"',
    'false && ALT == "G"',
    'ALT > "C"',
    '(ALT + ID) == ("G" + "rs3")',
    'in_list(ALT, "G,T")',
    '!in_list(ID, "rs3,rs4")',
    'in_list(num(POS), "7,50,119")',
    'in_list(num(POS), "7.0,50")',  # float items never equal an Int column
    'in_list(ALT, "")',  # list of one empty string
    'in_list("G", "G,T") && ALT == "G"',
    'in_list(POS, "7,50")',  # string membership on a string column
]


@pytest.mark.parametrize("expr", EXPRS)
def test_compile_matches_interp(table, expr):
    mask = compile_predicate(expr, table)
    node = parse(expr)
    for i in range(table.num_rows):
        ctx = {c: table.get_column_strs(c)[i] for c in table.columns}
        assert mask[i] == eval_boolean(node, ctx), f"row {i}: {ctx}"


@pytest.mark.parametrize(
    "fstring",
    ['CHROM + " " + POS', 'ID', 'ALT + "/" + REF', '"const"'],
)
def test_fstring_matches_interp(table, fstring):
    rows = np.arange(0, table.num_rows, 3)
    got = compile_fstring(fstring, table, rows)
    node = parse(fstring)
    for out, i in zip(got, rows):
        ctx = {c: table.get_column_strs(c)[i] for c in table.columns}
        assert out == eval_string(node, ctx)


def test_compile_none_keeps_all(table):
    assert compile_predicate(None, table).all()


def test_compile_type_error_matches(table):
    with pytest.raises(ExprError):
        compile_predicate('ALT && true', table)
    with pytest.raises(ExprError):
        compile_predicate('ALT', table)


@pytest.mark.parametrize(
    "expr",
    [
        'false && POS',  # RHS type check short-circuited: all-false
        'true || POS',  # all-true
        '(ALT == "zzz") && POS',  # mask LHS, no true rows: all-false
        '(ALT == ALT) || POS',  # mask LHS, all true rows: all-true
    ],
)
def test_bool_and_string_short_circuit(table, expr):
    # evalexpr skips the RHS bool coercion when the LHS decides the result;
    # the compiled mask must agree with the row interpreter here.
    mask = compile_predicate(expr, table)
    node = parse(expr)
    for i in range(table.num_rows):
        ctx = {c: table.get_column_strs(c)[i] for c in table.columns}
        assert mask[i] == eval_boolean(node, ctx)


@pytest.mark.parametrize(
    "expr",
    [
        'true && POS',  # RHS consulted on every row: type error
        'false || POS',
        '(ALT == "G") && POS',  # some rows consult the RHS: type error
        '(ALT == "G") || POS',
    ],
)
def test_bool_and_string_type_error(table, expr):
    with pytest.raises(ExprError):
        compile_predicate(expr, table)
    node = parse(expr)
    # the interpreter raises on at least one row too
    with pytest.raises(ExprError):
        for i in range(table.num_rows):
            ctx = {c: table.get_column_strs(c)[i] for c in table.columns}
            eval_boolean(node, ctx)


def test_compile_fallback_function_call(table):
    # len() is outside the vectorized subset -> row-interpreter fallback
    mask = compile_predicate('len(ID) == 3', table)
    for i in range(table.num_rows):
        assert mask[i] == (len(table.get_column_strs("ID")[i]) == 3)


def test_empty_table_never_evaluates(tmp_path):
    p = tmp_path / "e.pvar"
    p.write_text("#A\tB\n")
    t = read_metadata(p)
    # ill-typed expression succeeds vacuously on zero rows (reference never
    # evaluates the expression when there are no records)
    assert compile_predicate('A && true', t).shape == (0,)


# -- device lowering agreement ---------------------------------------------

DEVICE_EXPRS = [
    'ALT == "G"',
    'ALT != "G"',
    'ALT == "G" || POS == "7"',
    '!(ALT == "G") && ID == "rs3"',
    'POS < "50"',
    'POS >= "50"',
    'ID <= "rs3"',
    'ALT == REF',
    'ALT > "C"',
    'POS == 7',
]


@pytest.mark.parametrize("expr", DEVICE_EXPRS)
def test_device_lowering_matches_host(table, expr):
    from pgen_tpu.query.compile_device import compile_predicate_device

    host = compile_predicate(expr, table)
    dev = np.asarray(compile_predicate_device(expr, table))
    assert (host == dev).all()


def test_regex_and_extra_builtins():
    assert eval_value(parse('str::regex_matches("rs12345", "^rs[0-9]+$")'), {})
    assert not eval_value(parse('str::regex_matches("abc", "^rs")'), {})
    assert eval_value(parse('str::regex_replace("a-b-c", "-", "_")'), {}) == "a_b_c"
    assert eval_value(parse('str::substring("abcdef", 1, 4)'), {}) == "bcd"
    assert eval_value(parse("math::abs(-3)"), {}) == 3
    assert eval_value(parse("floor(2.7)"), {}) == 2.0
    assert eval_value(parse("ceil(2.1)"), {}) == 3.0
    assert eval_value(parse('if(1 < 2, "yes", "no")'), {}) == "yes"
    with pytest.raises(ExprError):
        eval_value(parse('str::regex_matches("x", "(")'), {})


def test_regex_predicate_via_fallback(table):
    # function calls take the row-interpreter fallback path in the compiler
    mask = compile_predicate('str::regex_matches(ID, "^rs1?7$")', table)
    ids = table.get_column_strs("ID")
    import re
    for i in range(table.num_rows):
        assert mask[i] == bool(re.search(r"^rs1?7$", ids[i]))


def test_num_builtin_interp():
    assert eval_value(parse('num("42")'), {}) == 42
    assert isinstance(eval_value(parse('num("42")'), {}), int)
    assert eval_value(parse('num("0.5")'), {}) == 0.5
    assert eval_value(parse('num("42") + 1'), {}) == 43
    assert eval_value(parse('num(3)'), {}) == 3
    with pytest.raises(ExprError, match="cannot parse"):
        eval_value(parse('num("abc")'), {})


def test_num_vectorized_matches_interp(table):
    # POS column is all-int: num(POS) ordering/arithmetic works vectorized
    for expr in [
        'num(POS) < 50',
        'num(POS) >= 50',
        'num(POS) == 7',
        'num(POS) % 2 == 1',
        'num(POS) * 2 > 100',
        'num(POS) == 7.0',  # Int col vs Float literal: variant-tagged false
    ]:
        mask = compile_predicate(expr, table)
        node = parse(expr)
        for i in range(table.num_rows):
            ctx = {c: table.get_column_strs(c)[i] for c in table.columns}
            assert mask[i] == eval_boolean(node, ctx), (expr, i, ctx)


def test_num_float_column(tmp_path):
    p = tmp_path / "f.pvar"
    p.write_text("#ID\tAF\nr0\t0.5\nr1\t0.25\nr2\t0.75\n")
    t = read_metadata(p)
    mask = compile_predicate('num(AF) > 0.3', t)
    assert mask.tolist() == [True, False, True]
    mask2 = compile_predicate('num(AF) == 0.25', t)
    assert mask2.tolist() == [False, True, False]


def test_num_mixed_column_falls_back(tmp_path):
    # mixed Int/Float rows need per-row tags: fallback must stay exact
    p = tmp_path / "m.pvar"
    p.write_text("#ID\tX\nr0\t5\nr1\t0.5\nr2\t7\n")
    t = read_metadata(p)
    mask = compile_predicate('num(X) == 5', t)
    assert mask.tolist() == [True, False, False]
    mask2 = compile_predicate('num(X) == 0.5', t)
    assert mask2.tolist() == [False, True, False]


def test_num_unparseable_errors(tmp_path):
    p = tmp_path / "u.pvar"
    p.write_text("#ID\tX\nr0\tabc\n")
    t = read_metadata(p)
    with pytest.raises(ExprError, match="cannot parse"):
        compile_predicate('num(X) > 1', t)


def test_num_on_info_subfield(tmp_path):
    p = tmp_path / "i.pvar"
    p.write_text(
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "1\t1\tr0\tA\tC\t.\t.\tAF=0.9\n"
        "1\t2\tr1\tA\tC\t.\t.\tAF=0.1\n"
    )
    t = read_metadata(p)
    mask = compile_predicate('num(INFO_AF) > 0.5', t)
    assert mask.tolist() == [True, False]


def test_fallback_sibling_expr_error_routes_to_interpreter(tmp_path):
    """One operand outside the vectorizable subset + a sibling whose
    LOWERING raises a type error: the whole expression hands over to the
    row interpreter, which reports the same eager-operand-evaluation
    error evalexpr would (operands of ``||`` evaluate eagerly — pinned
    in interp.py — so this errs either way; the handover keeps the
    error MESSAGE on the interpreter's evalexpr-parity wording and
    keeps dup-free mixed expressions on one code path)."""
    import numpy as np
    import pytest as _pytest

    from tests.conftest import build_fileset

    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.query.ast import ExprError
    from pgen_tpu.query.compile import compile_predicate

    codes = np.zeros((3, 2), dtype=np.uint8)
    pvar_rows = [f"1\t{100+i}\trs{i}\tA\tG\t.\tPASS\t." for i in range(3)]
    prefix = build_fileset(tmp_path, "fb", codes, pvar_rows, ["s0\tM", "s1\tM"])
    pvar = read_metadata(f"{prefix}.pvar")
    with _pytest.raises(ExprError, match="expected two numbers, got"):
        compile_predicate('str::regex_matches(ID, ".") || ID - 1 > 0', pvar)
