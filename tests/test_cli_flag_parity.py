"""Flag-level CLI-surface parity with the reference (docs/MIGRATION.md as a
living contract).

For every reference entry script, every ``--long_flag`` it defines must exist
in the corresponding tpumil CLI module — so a dsmil-wsi user can port a
command by swapping the script name and keeping their flags (README.md
"Component map", docs/MIGRATION.md). Extraction is textual on both sides
(the parsers live inside ``main()``), scoped to ``add_argument`` lines so
flag mentions in help strings don't count as definitions.

Reference flag surfaces covered: train_tcga.py:200-215, train_mil.py:113-119,
compute_feats.py:129-141, deepzoom_tiler.py:244-256, attention_map.py:123-137,
testing_tcga.py:112-119, testing_c16.py:105-110, download.py:29-30,
test_crop_single.py:56-72 (including the two flags the reference defines only
AFTER its first parse_args() call — unusable there, real flags here),
simclr/run.py:23-26.
"""

import os
import re

import pytest

from conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference mount not available")

TPUMIL_CLI = os.path.join(os.path.dirname(__file__), os.pardir, "tpumil", "cli")

# reference script -> tpumil CLI module replacing it
PAIRS = [
    ("train_tcga.py", "train_wsi.py"),
    ("train_mil.py", "train_mil.py"),
    ("compute_feats.py", "compute_feats.py"),
    ("deepzoom_tiler.py", "tiler.py"),
    ("attention_map.py", "attention_map.py"),
    ("testing_tcga.py", "testing_tcga.py"),
    ("testing_c16.py", "testing_c16.py"),
    ("download.py", "download.py"),
    ("test_crop_single.py", "crop_single.py"),
    (os.path.join("simclr", "run.py"), "simclr_train.py"),
]

_FLAG = re.compile(r"""add_argument\s*\(\s*(?:['"]-\w['"]\s*,\s*)?['"](--[\w-]+)['"]""")


def long_flags(path: str):
    with open(path) as f:
        src = f.read()
    # add_argument calls can span lines; collapse whitespace first
    return set(_FLAG.findall(re.sub(r"\s+", " ", src)))


@pytest.mark.parametrize("ref_script,tpumil_cli", PAIRS,
                         ids=[r for r, _ in PAIRS])
def test_every_reference_flag_exists(ref_script, tpumil_cli):
    ref = long_flags(os.path.join(REFERENCE_DIR, ref_script))
    assert ref, f"flag extraction found nothing in {ref_script}"
    ours = long_flags(os.path.join(TPUMIL_CLI, tpumil_cli))
    # testing_c16/testing_tcga share attention_map's --data_parallel help
    # constant; their own files still define every flag, so no indirection
    # is needed — a plain subset check is the contract.
    missing = ref - ours
    assert not missing, (
        f"{tpumil_cli} is missing reference flags from {ref_script}: "
        f"{sorted(missing)} — update the CLI and docs/MIGRATION.md")


def test_extraction_sees_multiline_definitions():
    """Guard the regex itself: tpumil parsers declare flags across lines."""
    ours = long_flags(os.path.join(TPUMIL_CLI, "train_wsi.py"))
    assert {"--num_classes", "--eval_scheme", "--inst_shard"} <= ours
