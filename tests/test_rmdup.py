"""DUP_* duplicate-group query variables and the `filter --rm-dup`
sugar (plink2 --rm-dup analog; query/dup.py)."""

import numpy as np
import pytest

from tests.cli_helpers import run_cli
from tests.conftest import build_fileset


def _fileset(tmp_path, ids, poss=None, alts=None):
    nv = len(ids)
    ns = 3
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 3, size=(nv, ns), dtype=np.uint8)
    poss = poss or [100 + i for i in range(nv)]
    alts = alts or ["G"] * nv
    pvar_rows = [
        f"1\t{poss[i]}\t{ids[i]}\tA\t{alts[i]}\t.\tPASS\t."
        for i in range(nv)
    ]
    psam_rows = [f"s{i}\tM" for i in range(ns)]
    return build_fileset(tmp_path, "rd", codes, pvar_rows, psam_rows)


IDS = ["rs1", "rs2", "rs1", "rs3", "rs2", "rs1"]  # rs1 x3, rs2 x2, rs3 x1


def _body_ids(path):
    return [
        l.split("\t")[2]
        for l in open(path).read().splitlines()
        if not l.startswith("#")
    ]


def test_dup_first_variable(tmp_path):
    prefix = _fileset(tmp_path, IDS)
    out = tmp_path / "o.vcf"
    assert run_cli(["filter", prefix, "--include-var", "DUP_FIRST",
                    "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs1", "rs2", "rs3"]


def test_dup_unique_variable_and_negation(tmp_path):
    prefix = _fileset(tmp_path, IDS)
    out = tmp_path / "o.vcf"
    assert run_cli(["filter", prefix, "--include-var", "DUP_UNIQUE",
                    "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs3"]
    # composes with other predicates and negation
    assert run_cli(["filter", prefix, "--include-var",
                    '!DUP_UNIQUE && ID=="rs2"', "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs2", "rs2"]


def test_dupkey_variables_use_full_key(tmp_path):
    # same ID everywhere ('.') but distinct CHROM:POS:REF:ALT keys except
    # two rows that fully collide
    prefix = _fileset(
        tmp_path, ["."] * 4, poss=[100, 200, 100, 300],
        alts=["G", "G", "G", "G"],
    )
    out = tmp_path / "o.vcf"
    assert run_cli(["filter", prefix, "--include-var", "DUPKEY_FIRST",
                    "-o", str(out)]) == 0
    rows = [
        l.split("\t")[1]
        for l in open(out).read().splitlines()
        if not l.startswith("#")
    ]
    assert rows == ["100", "200", "300"]
    # with ID as the key, '.' makes ONE group: DUP_FIRST keeps only row 0
    assert run_cli(["filter", prefix, "--include-var", "DUP_FIRST",
                    "-o", str(out)]) == 0
    assert len(_body_ids(out)) == 1


def test_rm_dup_force_first_and_exclude_all(tmp_path):
    prefix = _fileset(tmp_path, IDS)
    out = tmp_path / "o.vcf"
    assert run_cli(["filter", prefix, "--rm-dup", "force-first",
                    "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs1", "rs2", "rs3"]
    assert run_cli(["filter", prefix, "--rm-dup", "exclude-all",
                    "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs3"]
    # composes with an existing include-var
    assert run_cli(["filter", prefix, "--rm-dup", "force-first",
                    "--include-var", 'ID!="rs2"', "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs1", "rs3"]


def test_rm_dup_is_post_filter(tmp_path):
    """plink2 filter-order parity: dedup applies to the variants KEPT by
    the other predicates — excluding the file-order first instance must
    promote the next one, not drop the whole ID (r4 review finding)."""
    # rs1 at POS 100 (row 0) and POS 103 (row 3)
    prefix = _fileset(tmp_path, ["rs1", "rs2", "rs3", "rs1"])
    out = tmp_path / "o.vcf"
    # a filter that removes row 0: the surviving rs1 (row 3) must stay
    assert run_cli(["filter", prefix, "--rm-dup", "force-first",
                    "--include-var", 'POS!="100"', "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs2", "rs3", "rs1"]
    # exclude-all: among kept rows, rs1 appears once -> it is unique
    assert run_cli(["filter", prefix, "--rm-dup", "exclude-all",
                    "--include-var", 'POS!="100"', "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs2", "rs3", "rs1"]
    # error/list modes also see the post-filter set
    assert run_cli(["filter", prefix, "--rm-dup", "error",
                    "--include-var", 'POS!="100"', "-o", str(out)]) == 0
    assert run_cli(["filter", prefix, "--rm-dup", "list",
                    "--include-var", 'POS!="100"', "-o", str(out)]) == 0
    assert (tmp_path / "o.vcf.rmdup.list").read_text() == ""


def test_rm_dup_composes_with_hwe(tmp_path):
    """--hwe belongs to the post-filter set --rm-dup dedups over (r4
    advisor finding): an HWE-failing file-order-first copy must not
    consume the DUP-first slot and then get dropped by the HWE clause."""
    ns = 20
    hwe_bad = np.full(ns, 1, dtype=np.uint8)  # all-het: HWE p ~ 0
    hwe_ok = np.array([0] * 5 + [1] * 10 + [2] * 5, dtype=np.uint8)
    codes = np.stack([hwe_bad, hwe_ok, hwe_ok])
    pvar_rows = [
        f"1\t{100 + i}\t{vid}\tA\tG\t.\tPASS\t."
        for i, vid in enumerate(["rs1", "rs2", "rs1"])
    ]
    psam_rows = [f"s{i}\tM" for i in range(ns)]
    prefix = build_fileset(tmp_path, "rdh", codes, pvar_rows, psam_rows)
    out = tmp_path / "o.vcf"
    # row 0 (rs1 first copy) fails HWE; force-first must promote row 2
    assert run_cli(["filter", prefix, "--rm-dup", "force-first",
                    "--hwe", "0.05", "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs2", "rs1"]
    # exclude-all: post-HWE rs1 appears once -> unique, kept
    assert run_cli(["filter", prefix, "--rm-dup", "exclude-all",
                    "--hwe", "0.05", "-o", str(out)]) == 0
    assert _body_ids(out) == ["rs2", "rs1"]
    # error/list modes see the post-HWE set: no duplicates remain
    assert run_cli(["filter", prefix, "--rm-dup", "error",
                    "--hwe", "0.05", "-o", str(out)]) == 0
    assert run_cli(["filter", prefix, "--rm-dup", "list",
                    "--hwe", "0.05", "-o", str(out)]) == 0
    assert (tmp_path / "o.vcf.rmdup.list").read_text() == ""


def test_rm_dup_error_and_list(tmp_path, capsys):
    prefix = _fileset(tmp_path, IDS)
    out = tmp_path / "o.vcf"
    assert run_cli(["filter", prefix, "--rm-dup", "error",
                    "-o", str(out)]) == 2
    assert "duplicated variant ID" in capsys.readouterr().err
    # list mode: writes the list, filters nothing
    assert run_cli(["filter", prefix, "--rm-dup", "list",
                    "-o", str(out)]) == 0
    lst = (tmp_path / "o.vcf.rmdup.list").read_text().splitlines()
    assert sorted(lst) == ["rs1", "rs2"]
    assert len(_body_ids(out)) == len(IDS)
    # no duplicates: error mode passes
    clean = _fileset(tmp_path, ["a", "b", "c"])
    assert run_cli(["filter", clean, "--rm-dup", "error",
                    "-o", str(out)]) == 0


def test_dup_variables_in_query_and_sharded_parity(tmp_path):
    prefix = _fileset(tmp_path, IDS)
    out1 = tmp_path / "a.vcf"
    out2 = tmp_path / "b.vcf"
    assert run_cli(["filter", prefix, "--include-var", "DUP_FIRST",
                    "-o", str(out1)]) == 0
    assert run_cli(["filter", prefix, "--include-var", "DUP_FIRST",
                    "-o", str(out2), "--shards", "2"]) == 0
    assert out1.read_bytes() == out2.read_bytes()


def test_dup_query_subcommand(tmp_path, capsys):
    prefix = _fileset(tmp_path, IDS)
    assert run_cli(["query", prefix, "-i", "!DUP_UNIQUE", "-f", "ID"]) == 0
    assert capsys.readouterr().out.splitlines() == [
        "rs1", "rs2", "rs1", "rs2", "rs1"
    ]


def test_rm_dup_with_row_interpreter_condition(tmp_path):
    """An inner condition outside the vectorizable subset (regex) must
    still work: the builtin evaluates it row-exactly itself."""
    prefix = _fileset(tmp_path, ["rs1", "rs2", "rs1", "xq9"])
    out = tmp_path / "o.vcf"
    assert run_cli([
        "filter", prefix, "--rm-dup", "force-first",
        "--include-var", 'str::regex_matches(ID, "^rs")',
        "-o", str(out),
    ]) == 0
    assert _body_ids(out) == ["rs1", "rs2"]


def test_dup_builtin_with_fallback_sibling(tmp_path):
    """A non-vectorizable sibling at the same boolean level (regex) must
    not fail the whole expression over to the row interpreter, which has
    no dup_* bindings (r4 advisor finding): the dup side's compiled mask
    is substituted into the row-exact evaluation."""
    prefix = _fileset(tmp_path, ["rs1", "rs2", "rs1", "xq9"])
    out = tmp_path / "o.vcf"
    # dup on the left, fallback sibling on the right
    assert run_cli([
        "filter", prefix, "--include-var",
        'dup_first_within(true) && str::regex_matches(ID, "^rs")',
        "-o", str(out),
    ]) == 0
    assert _body_ids(out) == ["rs1", "rs2"]
    # fallback on the left, dup on the right; || composition
    assert run_cli([
        "filter", prefix, "--include-var",
        'str::regex_matches(ID, "^xq") || dup_unique_within(true)',
        "-o", str(out),
    ]) == 0
    assert _body_ids(out) == ["rs2", "xq9"]
    # composes with a narrowed dup inner condition too
    assert run_cli([
        "filter", prefix, "--include-var",
        'dup_unique_within(ID=="xq9") && str::regex_matches(ID, "^x")',
        "-o", str(out),
    ]) == 0
    assert _body_ids(out) == ["xq9"]
    # dup nested where the compiler cannot lift it still errors, now with
    # a pointed message instead of "function identifier is not bound"
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.query.ast import ExprError
    from pgen_tpu.query.compile import compile_predicate

    pvar = read_metadata(f"{prefix}.pvar")
    with pytest.raises(ExprError, match="whole-column builtin"):
        compile_predicate(
            'str::to_lowercase(str::from(dup_first_within(true))) == "true"',
            pvar,
        )


def test_dup_within_property_vs_bruteforce(tmp_path):
    """dup_*_within vs a brute-force reference over random ID/condition
    combinations (including empty selections)."""
    from pgen_tpu.formats.metadata import read_metadata
    from pgen_tpu.query.compile import compile_predicate

    rng = np.random.default_rng(77)
    for trial in range(8):
        nv = int(rng.integers(1, 40))
        ids = [f"r{rng.integers(0, max(1, nv // 2))}" for _ in range(nv)]
        alts = [rng.choice(["G", "T"]) for _ in range(nv)]
        prefix = _fileset(tmp_path, ids, alts=list(alts))
        pvar = read_metadata(f"{prefix}.pvar")
        cond = [a == "G" for a in alts]
        for fn, mode in (("dup_first_within", "first"),
                         ("dup_unique_within", "unique")):
            got = compile_predicate(f'{fn}((ALT == "G"))', pvar)
            seen = {}
            for i, (iid, c) in enumerate(zip(ids, cond)):
                if c:
                    seen.setdefault(iid, []).append(i)
            exp = np.zeros(nv, dtype=bool)
            for iid, rows in seen.items():
                if mode == "first":
                    exp[rows[0]] = True
                elif len(rows) == 1:
                    exp[rows[0]] = True
            np.testing.assert_array_equal(got, exp, err_msg=f"{fn} t{trial}")
