from pgen_tpu.cli import main


def run_cli(argv):
    return main(argv)
