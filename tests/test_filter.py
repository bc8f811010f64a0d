"""Filter pipeline golden tests: byte-exact VCF across all execution
providers, against an independent scalar oracle (SURVEY.md §4/§7)."""

import numpy as np
import pytest

from pgen_tpu.pipeline.filter import filter_to_vcf

from oracle import scalar_filter_vcf

PROVIDERS = ["native", "numpy", "device"]


def _read(path):
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("provider", PROVIDERS)
def test_keep_all(tiny_fileset, tmp_path, provider):
    prefix, _ = tiny_fileset
    out = tmp_path / "out.vcf"
    res = filter_to_vcf(prefix, out_file=out, provider=provider)
    expected = scalar_filter_vcf(prefix, None, None)
    assert _read(out) == expected
    assert res.num_variants_kept == 5
    assert res.num_samples_kept == 6


@pytest.mark.parametrize("provider", PROVIDERS)
def test_var_and_sam_filter(tiny_fileset, tmp_path, provider):
    prefix, _ = tiny_fileset
    out = tmp_path / "out.vcf"
    filter_to_vcf(
        prefix,
        var_query='POS == "101" || POS == "103"',
        sam_query='IID == "s0" || IID == "s3" || IID == "s5"',
        out_file=out,
        provider=provider,
    )
    expected = scalar_filter_vcf(
        prefix,
        lambda v: v["POS"] in ("101", "103"),
        lambda s: s["IID"] in ("s0", "s3", "s5"),
    )
    assert _read(out) == expected


@pytest.mark.parametrize("provider", PROVIDERS)
def test_keep_no_variants(tiny_fileset, tmp_path, provider):
    prefix, _ = tiny_fileset
    out = tmp_path / "out.vcf"
    filter_to_vcf(prefix, var_query='ID == "none"', out_file=out, provider=provider)
    expected = scalar_filter_vcf(prefix, lambda v: False, None)
    assert _read(out) == expected
    assert expected.endswith(b"FORMAT\ts0\ts1\ts2\ts3\ts4\ts5\n")


@pytest.mark.parametrize("provider", PROVIDERS)
def test_keep_no_samples(tiny_fileset, tmp_path, provider):
    prefix, _ = tiny_fileset
    out = tmp_path / "out.vcf"
    filter_to_vcf(prefix, sam_query='IID == "none"', out_file=out, provider=provider)
    expected = scalar_filter_vcf(prefix, None, lambda s: False)
    assert _read(out) == expected
    # rows end with GT and nothing else (pfile.rs writes no samples)
    body = [l for l in _read(out).split(b"\n") if l and not l.startswith(b"#")]
    assert all(l.endswith(b"\tGT") for l in body)


def test_default_out_name(tiny_fileset):
    # main.rs:121-122: default {prefix}.pgen-rs.vcf
    prefix, _ = tiny_fileset
    res = filter_to_vcf(prefix, var_query='ID == "rs0"')
    assert res.out_path == f"{prefix}.pgen-rs.vcf"
    assert _read(res.out_path) == scalar_filter_vcf(
        prefix, lambda v: v["ID"] == "rs0", None
    )


def test_missing_iid_errors(tmp_path, tiny_fileset):
    import shutil

    prefix, _ = tiny_fileset
    bad = tmp_path / "bad"
    for ext in ("pgen", "pvar"):
        shutil.copyfile(f"{prefix}.{ext}", f"{bad}.{ext}")
    with open(f"{bad}.psam", "w") as f:
        f.write("#ID\tSEX\ns0\tM\n")  # no IID column
    with pytest.raises(Exception, match="IID not among the headers"):
        filter_to_vcf(str(bad), out_file=tmp_path / "o.vcf")


def test_missing_iid_checked_before_queries(tmp_path, tiny_fileset):
    # IID lookup precedes predicate evaluation (pfile.rs:111-126)
    import shutil

    prefix, _ = tiny_fileset
    bad = tmp_path / "bad2"
    for ext in ("pgen", "pvar"):
        shutil.copyfile(f"{prefix}.{ext}", f"{bad}.{ext}")
    with open(f"{bad}.psam", "w") as f:
        f.write("#ID\tSEX\ns0\tM\n")
    with pytest.raises(Exception, match="IID not among the headers"):
        filter_to_vcf(str(bad), sam_query='ID == "s0"', out_file=tmp_path / "o.vcf")


def test_tail_samples_partial_byte(tmp_path):
    # sample counts not divisible by 4 exercise the record tail byte
    from conftest import build_fileset

    rng = np.random.default_rng(11)
    for nsamp in (1, 2, 3, 5, 7):
        codes = rng.integers(0, 4, size=(4, nsamp), dtype=np.uint8)
        prefix = build_fileset(
            tmp_path,
            f"t{nsamp}",
            codes,
            [f"1\t{i}\tr{i}\tA\tC\t.\t.\t." for i in range(4)],
            [f"s{i}\tM" for i in range(nsamp)],
        )
        for provider in PROVIDERS:
            out = tmp_path / f"o{nsamp}-{provider}.vcf"
            filter_to_vcf(prefix, out_file=out, provider=provider)
            assert _read(out) == scalar_filter_vcf(prefix, None, None), (
                nsamp,
                provider,
            )


def test_block_streaming_matches_single_block(tiny_fileset, tmp_path):
    prefix, _ = tiny_fileset
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    filter_to_vcf(prefix, out_file=a, provider="native", block_variants=2)
    filter_to_vcf(prefix, out_file=b, provider="native", block_variants=100)
    assert _read(a) == _read(b)


def test_fd_streaming_path(tiny_fileset, tmp_path):
    # non-regular output (fifo) exercises the fd streaming branch
    import os
    import threading

    prefix, _ = tiny_fileset
    fifo = tmp_path / "out.fifo"
    os.mkfifo(fifo)
    chunks = []

    def reader():
        with open(fifo, "rb") as f:
            chunks.append(f.read())

    t = threading.Thread(target=reader)
    t.start()
    filter_to_vcf(prefix, out_file=fifo, provider="native")
    t.join()
    assert chunks[0] == scalar_filter_vcf(prefix, None, None)


def test_basic1_baseline_config(basic1_prefix, tmp_path):
    """BASELINE.json PR1 config: --include-sam IID=="NA20900" --include-var ALT=="G"."""
    out = tmp_path / "b1.vcf"
    res = filter_to_vcf(
        basic1_prefix,
        var_query='ALT == "G"',
        sam_query='IID == "NA20900"',
        out_file=out,
        provider="native",
    )
    expected = scalar_filter_vcf(
        basic1_prefix,
        lambda v: v["ALT"] == "G",
        lambda s: s["IID"] == "NA20900",
    )
    got = _read(out)
    assert got == expected
    assert res.num_variants_kept == 4130
    assert res.num_samples_kept == 1


@pytest.mark.parametrize("provider", ["numpy", "device"])
def test_basic1_providers_agree(basic1_prefix, tmp_path, provider):
    a = tmp_path / "nat.vcf"
    b = tmp_path / f"{provider}.vcf"
    filter_to_vcf(
        basic1_prefix,
        var_query='POS < "300000"',
        sam_query='IID < "HG00110"',
        out_file=a,
        provider="native",
    )
    filter_to_vcf(
        basic1_prefix,
        var_query='POS < "300000"',
        sam_query='IID < "HG00110"',
        out_file=b,
        provider=provider,
    )
    assert _read(a) == _read(b)


def test_stdout_output_alias(tiny_fileset, tmp_path):
    """-o '-' streams the byte-exact VCF to stdout (pipe sink path)."""
    import subprocess
    import sys

    prefix, _ = tiny_fileset
    ref = tmp_path / "ref.vcf"
    filter_to_vcf(prefix, out_file=str(ref))
    r = subprocess.run(
        [sys.executable, "-m", "pgen_tpu.cli", "filter", prefix, "-o", "-"],
        capture_output=True,
    )
    assert r.returncode == 0
    assert r.stdout == ref.read_bytes()


def test_stdout_alias_rejected_outside_single_process_vcf(tiny_fileset, capsys):
    """-o '-' only makes sense on the single-process pipe sink; every other
    path pwrites at offsets or writes filesets and must refuse loudly."""
    from tests.cli_helpers import run_cli

    prefix, _ = tiny_fileset
    for argv in (
        ["filter", prefix, "-o", "-", "--workers", "2"],
        ["filter", prefix, "-o", "-", "--shards", "2"],
        ["filter", prefix, "-o", "-", "--out-format", "pgen"],
        ["filter", prefix, "-o", "-", "--out-format", "bed"],
        ["filter", prefix, "-o", "-", "--provider", "device"],
    ):
        assert run_cli(argv) == 1
        assert "stdout" in capsys.readouterr().err
    import os

    assert not os.path.exists("-") and not os.path.exists("-.pgen")
