"""MIL benchmark parser + classic-CV scheme tests (SURVEY.md section 4 tier 3:
Musk-style CV as the fast integration test, on synthetic separable data)."""

import numpy as np
import pytest

from tpumil.data.mil_bench import (
    compute_pos_weight,
    cross_validation_split,
    parse_mil_file,
    shuffle_with_class_coverage,
)
from tpumil.train.schemes import MILBenchConfig, run_mil_cv

from synth import make_separable_bags, write_svm_file


def test_parse_roundtrip(tmp_path, rng):
    bags = make_separable_bags(rng, num_bags=6, feats=8, mean_instances=6)
    path = str(tmp_path / "synth.svm")
    write_svm_file(path, bags)
    parsed = parse_mil_file(path, num_feats=8)
    assert len(parsed) == len(bags)
    for orig, got in zip(bags, parsed):
        np.testing.assert_allclose(got.feats, orig.feats, atol=1e-5)
        assert got.label[0] == orig.label[0]


def test_cross_validation_split_chunking():
    items = list(range(23))
    train, test = cross_validation_split(items, fold=10, index=0)
    assert test == [0, 1]  # chunk size 23//10 = 2
    assert len(train) + len(test) == 23
    train, test = cross_validation_split(items, fold=10, index=9)
    assert test == [18, 19]


def test_pos_weight(rng):
    bags = make_separable_bags(rng, num_bags=10, feats=4, pos_frac=0.3)
    pw = compute_pos_weight(bags)
    assert pw == pytest.approx(7 / 3)


def test_class_coverage_shuffle(rng):
    bags = make_separable_bags(rng, num_bags=20, feats=4, pos_frac=0.25)
    shuffled = shuffle_with_class_coverage(bags, cv_fold=5, rng=rng)
    for k in range(5):
        _, test = cross_validation_split(shuffled, 5, k)
        assert sum(b.label[0] for b in test) > 0


def test_mil_cv_end_to_end(rng, tmp_path):
    """Fast integration: 3-fold CV on separable synthetic data must reach
    high accuracy within a few epochs."""
    bags = make_separable_bags(rng, num_bags=40, feats=16, signal=5.0,
                               pos_inst_frac=0.4, mean_instances=25)
    path = str(tmp_path / "synth.svm")
    write_svm_file(path, bags)
    parsed = parse_mil_file(path, num_feats=16)
    cfg = MILBenchConfig(num_feats=16, num_epochs=15, cv_fold=4, lr=1e-3,
                         verbose=False, seed=1)
    mean, std, accs = run_mil_cv(parsed, cfg, log=lambda s: None)
    assert len(accs) == 4
    assert mean > 0.85, f"synthetic separable CV accuracy too low: {mean}"


def test_mil_cv_inst_sharded_parity(rng):
    """run_mil_cv with cfg.inst_shard=8 (cli/train_mil --inst_shard) matches
    the single-device CV fold accuracies (trajectories agree to float
    tolerance; accs are rank-discrete on this separable fixture)."""
    bags = make_separable_bags(rng, num_bags=20, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    kw = dict(num_feats=16, lr=1e-3, num_epochs=3, cv_fold=5, seed=0,
              verbose=False)
    _, _, want = run_mil_cv(bags, MILBenchConfig(**kw), log=lambda s: None)
    _, _, got = run_mil_cv(bags, MILBenchConfig(**kw, inst_shard=8),
                           log=lambda s: None)
    assert got == want
