"""CLI flag-surface parity (SURVEY.md C1/C2; cli.rs:5-62, main.rs:92-127)."""

import subprocess
import sys

import pytest

from cli_helpers import run_cli


def test_query_cli(tiny_fileset, capsys):
    prefix, _ = tiny_fileset
    rc = run_cli(["query", prefix, "-f", "ID", "-i", 'REF == "A"'])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines() == [f"rs{i}" for i in range(5)]


def test_query_long_flags(tiny_fileset, capsys):
    prefix, _ = tiny_fileset
    rc = run_cli(["query", prefix, "--fstring", "IID", "--samples", "--include", 'SEX == "F"'])
    assert rc == 0
    assert all(l.startswith("s") for l in capsys.readouterr().out.splitlines())


def test_query_requires_fstring(tiny_fileset):
    with pytest.raises(SystemExit):
        run_cli(["query", tiny_fileset[0]])


def test_filter_cli_default_out(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    rc = run_cli(["filter", prefix, "--include-var", 'ID == "rs1"'])
    assert rc == 0
    data = open(f"{prefix}.pgen-rs.vcf", "rb").read()
    assert b"rs1\t" in data


def test_filter_cli_out_flag(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    out = tmp_path / "x.vcf"
    rc = run_cli(["filter", prefix, "-o", str(out), "--include-sam", 'IID == "s1"'])
    assert rc == 0
    assert out.exists()


def test_error_exit_nonzero(tmp_path, capsys):
    rc = run_cli(["filter", str(tmp_path / "nope")])
    assert rc == 1
    assert "error" in capsys.readouterr().err


def test_bad_expression_exit(tiny_fileset, capsys):
    rc = run_cli(["filter", tiny_fileset[0], "--include-var", 'ID =='])
    assert rc == 1


def test_describe_mode2(tiny_fileset, capsys):
    rc = run_cli(["describe", f"{tiny_fileset[0]}.pgen"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "variants: 5" in out
    assert "samples: 6" in out


def test_cli_subprocess_stdout_clean(tiny_fileset):
    """stdout carries ONLY query rows (stderr gets diagnostics)."""
    prefix, _ = tiny_fileset
    r = subprocess.run(
        [sys.executable, "-m", "pgen_tpu.cli", "query", prefix, "-f", "ID"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert r.returncode == 0
    assert r.stdout.splitlines() == [f"rs{i}" for i in range(5)]
