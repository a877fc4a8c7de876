"""CLI surface smoke tests: every entry point must import and print --help
(guards against bit-rot of the argparse surfaces, which are the reference-
parity API)."""

import subprocess
import sys

import pytest

CLIS = [
    "tpumil.cli.train_mil",
    "tpumil.cli.train_wsi",
    "tpumil.cli.compute_feats",
    "tpumil.cli.tiler",
    "tpumil.cli.simclr_train",
    "tpumil.cli.attention_map",
    "tpumil.cli.testing_tcga",
    "tpumil.cli.testing_c16",
    "tpumil.cli.crop_single",
    "tpumil.cli.download",
    "tpumil.cli.pipeline",
    "tpumil.cli.slide_feats",
    "tpumil.cli.serve",
]


@pytest.mark.parametrize("module", CLIS)
def test_cli_help(module):
    out = subprocess.run(
        [sys.executable, "-m", module, "--help"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": ".", "HOME": "/tmp"})
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()


def test_cli_listing():
    """`python -m tpumil.cli` prints the entry-point listing."""
    out = subprocess.run(
        [sys.executable, "-m", "tpumil.cli"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": ".", "HOME": "/tmp"})
    assert out.returncode == 0, out.stderr[-500:]
    for mod in CLIS:
        assert mod.rsplit(".", 1)[1] in out.stdout


def test_cli_bad_args():
    out = subprocess.run(
        [sys.executable, "-m", "tpumil.cli.train_wsi", "--eval_scheme", "bogus",
         "--device", "cpu"],
        capture_output=True, text=True, timeout=180,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": ".", "HOME": "/tmp"})
    assert out.returncode != 0
