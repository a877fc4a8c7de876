"""Shared-cohort utilities for reference-in-the-loop end-to-end parity.

Builds a synthetic WSI-feature cohort in the reference's exact filesystem
format (per-bag CSVs + master CSV, compute_feats.py:80-82 / :249-260), runs
the mounted reference's train_tcga.py on it via tests/reference_cpu_runner.py,
parses its printed scheme results, and loads the identical bags for tpumil
in the reference's own fold order.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import numpy as np

REFERENCE = os.environ.get("TPUMIL_REFERENCE", "/root/reference")
RUNNER = os.path.join(os.path.dirname(__file__), "reference_cpu_runner.py")


def reference_available() -> bool:
    return os.path.exists(os.path.join(REFERENCE, "train_tcga.py"))


def make_cohort(root: str, dataset: str, n_bags: int = 100,
                feats_size: int = 64, num_classes: int = 1, seed: int = 0,
                min_inst: int = 24, max_inst: int = 96,
                pos_inst_frac: float = 0.15, signal: float = 2.0) -> str:
    """Write a synthetic cohort with a real MIL signal in the reference's
    dataset layout; returns the master CSV path (absolute bag paths, so the
    reference can run from any cwd).

    num_classes==1: half the bags positive (a fraction of instances shifted
    along a unit direction) — the C16 shape. num_classes==2: every bag gets
    a class and a shift along its class direction — the TCGA-lung shape."""
    rng = np.random.default_rng(seed)
    from tpumil.data.feature_store import write_bag_csv

    ds_dir = os.path.join(root, "datasets", dataset)
    os.makedirs(ds_dir, exist_ok=True)
    dirs = rng.standard_normal((max(num_classes, 2), feats_size))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    entries = []
    for i in range(n_bags):
        n = int(rng.integers(min_inst, max_inst + 1))
        x = rng.standard_normal((n, feats_size)).astype(np.float32)
        if num_classes == 1:
            label = int(i % 2)
            if label:
                k = max(1, int(n * pos_inst_frac))
                x[:k] += signal * dirs[0]
        else:
            label = int(i % num_classes)
            k = max(1, int(n * pos_inst_frac))
            x[:k] += signal * dirs[label]
        path = os.path.join(ds_dir, f"bag_{i:04d}.csv")
        write_bag_csv(x, path)
        entries.append((path, label))
    order = rng.permutation(n_bags)
    master = os.path.join(ds_dir, dataset + ".csv")
    with open(master, "w") as f:
        f.write("0,label\n")
        for j in order:
            f.write(f"{entries[j][0]},{entries[j][1]}\n")
    return master


def run_reference(workdir: str, dataset: str, *, num_classes: int,
                  feats_size: int, num_epochs: int, stop_epochs: int,
                  eval_scheme: str, seed: int = 0, lr: float = 1e-4,
                  timeout_s: float = 3600.0) -> dict:
    """Run train_tcga.py end-to-end (CPU) in ``workdir``; the cohort must
    already exist under ``workdir/datasets/<dataset>/``. Returns the parsed
    scheme results + the reference's bag order."""
    env = dict(os.environ)
    env["REF_SEED"] = str(seed)
    env["TPUMIL_REFERENCE"] = REFERENCE
    env["CUDA_VISIBLE_DEVICES"] = ""
    argv = [sys.executable, RUNNER,
            "--dataset", dataset,
            "--num_classes", str(num_classes),
            "--feats_size", str(feats_size),
            "--num_epochs", str(num_epochs),
            "--stop_epochs", str(stop_epochs),
            "--lr", repr(lr),
            "--eval_scheme", eval_scheme]
    r = subprocess.run(argv, cwd=workdir, env=env, capture_output=True,
                       text=True, timeout=timeout_s)
    if r.returncode != 0:
        raise RuntimeError(
            f"reference run failed rc={r.returncode}\n--- stdout tail ---\n"
            f"{r.stdout[-2000:]}\n--- stderr tail ---\n{r.stderr[-2000:]}")
    return parse_reference_output(r.stdout)


def parse_reference_output(out: str) -> dict:
    """Parse the reference's printed results (train_tcga.py:292-294,
    406-417) + the REF_GLOB_ORDER line from reference_cpu_runner.py."""
    res: dict = {}
    m = re.search(r"Final results: Mean Accuracy: ([0-9.eE+-]+)", out)
    if m:
        res["mean_accuracy"] = float(m.group(1))
    res["mean_auc"] = [float(a) for _, a in sorted(
        (int(c), a) for c, a in
        re.findall(r"Class (\d+): Mean AUC = ([0-9.eE+-]+)", out))]
    for key, pat in (("accuracy", r"(?m)^Accuracy: ([0-9.eE+-]+)"),
                     ("balanced_accuracy", r"Balanced Accuracy: ([0-9.eE+-]+)"),
                     ("hamming_loss", r"Hamming Loss: ([0-9.eE+-]+)"),
                     ("subset_accuracy",
                      r"Subset Accuracy \(Exact Match Ratio\): ([0-9.eE+-]+)")):
        m = re.search(pat, out)
        if m:
            res[key] = float(m.group(1))
    m = re.search(r"REF_GLOB_ORDER:(\[.*\])", out)
    if m:
        res["bag_order"] = [
            os.path.splitext(os.path.basename(p))[0]
            for p in json.loads(m.group(1))]
    m = re.search(r"REF_SHUFFLE_ORDER:(\[.*\])", out)
    if m:
        # the standalone-test holdout shuffle (train_tcga.py:352), as stems
        res["shuffle_order"] = [
            os.path.splitext(os.path.basename(p))[0]
            for p in json.loads(m.group(1))]
    res["stdout"] = out
    return res


def run_reference_mil(workdir: str, src_svm: str, *, num_epoch: int,
                      cv_fold: int = 10, seed: int = 0,
                      timeout_s: float = 3600.0) -> dict:
    """Run train_mil.py end-to-end (CPU) via tests/reference_mil_runner.py on
    the given musk1-format file. Returns per-fold best accuracies, the CV
    mean/std, and the recorded fold order as content signatures."""
    env = dict(os.environ)
    env["REF_SEED"] = str(seed)
    env["TPUMIL_REFERENCE"] = REFERENCE
    env["CUDA_VISIBLE_DEVICES"] = ""
    runner = os.path.join(os.path.dirname(__file__), "reference_mil_runner.py")
    argv = [sys.executable, runner, "--src", src_svm,
            "--num_epoch", str(num_epoch), "--cv_fold", str(cv_fold)]
    r = subprocess.run(argv, cwd=workdir, env=env, capture_output=True,
                       text=True, timeout=timeout_s)
    if r.returncode != 0:
        raise RuntimeError(
            f"reference train_mil failed rc={r.returncode}\n--- stdout tail "
            f"---\n{r.stdout[-2000:]}\n--- stderr tail ---\n{r.stderr[-2000:]}")
    res = {
        "fold_accs": [float(a) for a in
                      re.findall(r"Optimal accuracy: ([0-9.]+)", r.stdout)],
        "stdout": r.stdout,
    }
    m = re.search(r"Cross validation accuracy mean: ([0-9.]+), std ([0-9.]+)",
                  r.stdout)
    res["mean"], res["std"] = float(m.group(1)), float(m.group(2))
    m = re.search(r"REF_MIL_ORDER:(\[.*\])", r.stdout)
    res["order_sigs"] = json.loads(m.group(1)) if m else None
    return res


def mil_order_to_permutation(bags, order_sigs):
    """Map the reference runner's content signatures (raw label ±1,
    n_instances, first feature rounded to 6 decimals) back to indices into
    ``bags`` (tpumil's parse of the same file, clipped 0/1 labels)."""
    perm = []
    used = set()
    for raw_label, n_inst, feat0 in order_sigs:
        want_label = 1.0 if raw_label > 0 else 0.0
        cands = [
            (abs(float(b.feats[0, 0]) - feat0), i)
            for i, b in enumerate(bags)
            if i not in used and float(b.label[0]) == want_label
            and b.feats.shape[0] == n_inst]
        d, i = min(cands)
        assert d < 1e-5, f"ambiguous signature match (d={d})"
        used.add(i)
        perm.append(i)
    return perm


def load_bags_in_order(master_csv: str, bag_order, num_classes: int):
    """Load the cohort's bags as tpumil Bag objects in the REFERENCE's
    temp_train glob order, so KFold(5, shuffle, 42) produces bit-identical
    fold membership on both sides (train_tcga.py:253-255 glob ->
    schemes._kfold_indices)."""
    from tpumil.data.bags import Bag
    from tpumil.data.feature_store import (encode_label, read_bag_csv,
                                           read_master_csv)

    entries = {os.path.splitext(os.path.basename(p))[0]: (p, lab)
               for p, lab in read_master_csv(master_csv)}
    bags = []
    for stem in bag_order:
        path, lab = entries[stem]
        bags.append(Bag(feats=read_bag_csv(path),
                        label=encode_label(lab, num_classes), name=stem))
    return bags
