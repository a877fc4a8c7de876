"""Synthetic data generators shared by tests (SURVEY.md section 4 tiers 3-4)."""

from __future__ import annotations

import numpy as np

from tpumil.data.bags import Bag


def make_separable_bags(rng, num_bags=40, feats=32, mean_instances=20,
                        pos_frac=0.5, signal=3.0, pos_inst_frac=0.1):
    """MIL bags where positive bags contain some instances shifted along a
    signal direction — separable, for trainer convergence tests. Higher
    ``pos_inst_frac``/``signal`` makes the task easier (DSMIL with default
    hyperparameters needs a fairly strong witness rate to converge within a
    few epochs — the torch reference behaves identically)."""
    direction = rng.standard_normal(feats).astype(np.float32)
    direction /= np.linalg.norm(direction)
    bags = []
    for i in range(num_bags):
        n = int(rng.integers(mean_instances // 2, mean_instances * 2))
        x = rng.standard_normal((n, feats)).astype(np.float32)
        pos = i < int(num_bags * pos_frac)
        if pos:
            k = max(1, int(n * pos_inst_frac))
            x[:k] += signal * direction
        bags.append(Bag(feats=x, label=np.asarray([float(pos)], np.float32), name=f"bag{i}"))
    order = rng.permutation(len(bags))
    return [bags[j] for j in order]


def make_multiclass_bags(rng, num_bags=60, feats=32, num_classes=2,
                         mean_instances=20, signal=3.0):
    """One-hot labelled bags, one signal direction per class."""
    dirs = rng.standard_normal((num_classes, feats)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bags = []
    for i in range(num_bags):
        n = int(rng.integers(mean_instances // 2, mean_instances * 2))
        x = rng.standard_normal((n, feats)).astype(np.float32)
        c = i % num_classes
        k = max(1, n // 10)
        x[:k] += signal * dirs[c]
        label = np.zeros(num_classes, np.float32)
        label[c] = 1.0
        bags.append(Bag(feats=x, label=label, name=f"bag{i}"))
    order = rng.permutation(len(bags))
    return [bags[j] for j in order]


def write_svm_file(path, bags):
    """Write bags in the reference's svmlight-like MIL format
    (train_mil.py:17-35), including the header line its pd.read_csv eats."""
    lines = ["header"]
    for b_id, bag in enumerate(bags):
        for i_id, row in enumerate(bag.feats):
            pairs = " ".join(f"{j + 1}:{v:.6f}" for j, v in enumerate(row))
            lines.append(f"{i_id}:{b_id}:{int(bag.label[0])} {pairs}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
