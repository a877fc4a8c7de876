"""Reference-in-the-loop END-TO-END parity (VERDICT r3 item 1).

The mounted torch reference's own train_tcga.py main() / attention_map.py
test() run unmodified (CPU shims only, tests/reference_cpu_runner.py and
tests/reference_attention_runner.py) on a shared synthetic cohort, head to
head against tpumil's schemes/CLI on the IDENTICAL features, splits, and
weights:

  * 5-fold-cv (C16 shape, num_classes=1): the reference's temp_train glob
    order is replayed so KFold(5, shuffle, 42) fold membership is
    bit-identical (train_tcga.py:253-255); fold-mean accuracy/AUC must agree
    within the reference's own repro tolerance (README.md:76, +-2%).
  * 5-fold-cv-standalone-test (TCGA shape, num_classes=2): the reference's
    holdout shuffle (train_tcga.py:352) is recorded and injected, so holdout
    AND fold membership match; the 5-model majority-vote metrics must agree.
  * attention_map heatmaps: identical patches + identical weights through
    the reference's torch pipeline vs cli/attention_map's JAX pipeline;
    PNGs compared pixel-level, score CSVs numerically.

These are the strongest parity claims obtainable in this container without
the real datasets (which stay mount-gated in test_parity_real.py): the
reference itself is the oracle, end to end. Select with -k reference_e2e.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ref_e2e_util as R  # noqa: E402

pytestmark = pytest.mark.skipif(
    not R.reference_available(),
    reason="torch reference not mounted at /root/reference")

# The reference's own reproducibility tolerance (README.md:76: "a target
# accuracy/AUC within 2% difference"). Folds are bit-identical; the residual
# is init + shuffle RNG, which these cohort settings keep well inside 2%
# (measured deltas recorded in docs/PERF.md "Reference-in-the-loop e2e").
TOL = 0.02


def _tpumil_cfg(num_classes, feats_size, num_epochs, lr):
    from tpumil.train.schemes import WSITrainConfig

    # every field the reference's argparse sets (train_tcga.py:200-216), at
    # the values run_reference passes to it
    return WSITrainConfig(
        feats_size=feats_size, num_classes=num_classes, lr=lr,
        num_epochs=num_epochs, stop_epochs=10, weight_decay=1e-3,
        split=0.2, nonlinear=True, average=False, verbose=False, seed=7)


def test_reference_e2e_5fold_cv_c16_shape(tmp_path):
    from tpumil.train.schemes import run_5fold_cv

    master = R.make_cohort(str(tmp_path), "synth-c16", n_bags=100,
                           feats_size=64, num_classes=1, seed=0,
                           pos_inst_frac=0.4, signal=5.0)
    ref = R.run_reference(str(tmp_path), "synth-c16", num_classes=1,
                          feats_size=64, num_epochs=20, stop_epochs=10,
                          eval_scheme="5-fold-cv", seed=0, lr=3e-4)
    assert "mean_accuracy" in ref and len(ref["mean_auc"]) == 1, \
        ref["stdout"][-1500:]

    bags = R.load_bags_in_order(master, ref["bag_order"], num_classes=1)
    got = run_5fold_cv(bags, _tpumil_cfg(1, 64, 20, 3e-4),
                       log=lambda s: None)

    # both sides actually learned the planted signal (non-vacuous parity)
    assert ref["mean_accuracy"] >= 0.95 and got["mean_accuracy"] >= 0.95
    assert ref["mean_auc"][0] >= 0.95 and got["mean_auc"][0] >= 0.95
    assert abs(got["mean_accuracy"] - ref["mean_accuracy"]) <= TOL
    assert abs(got["mean_auc"][0] - ref["mean_auc"][0]) <= TOL


def test_reference_e2e_standalone_test_tcga_shape(tmp_path):
    from tpumil.train.schemes import run_5fold_cv_standalone_test

    master = R.make_cohort(str(tmp_path), "synth-tcga", n_bags=100,
                           feats_size=64, num_classes=2, seed=1,
                           pos_inst_frac=0.4, signal=5.0)
    ref = R.run_reference(str(tmp_path), "synth-tcga", num_classes=2,
                          feats_size=64, num_epochs=20, stop_epochs=10,
                          eval_scheme="5-fold-cv-standalone-test", seed=0,
                          lr=3e-4)
    assert "shuffle_order" in ref, ref["stdout"][-1500:]

    # the recorder really captured the holdout split: its head must equal
    # the reference's own saved test/test_list.json (train_tcga.py:421)
    with open(os.path.join(str(tmp_path), "test", "test_list.json")) as f:
        saved_holdout = [os.path.splitext(os.path.basename(p))[0]
                         for p in json.load(f)]
    n_hold = len(saved_holdout)
    assert ref["shuffle_order"][:n_hold] == saved_holdout

    bags = R.load_bags_in_order(master, ref["bag_order"], num_classes=2)
    name_to_idx = {b.name: i for i, b in enumerate(bags)}
    perm = [name_to_idx[stem] for stem in ref["shuffle_order"]]
    got = run_5fold_cv_standalone_test(
        bags, _tpumil_cfg(2, 64, 20, 3e-4), log=lambda s: None,
        permutation=perm)

    # identical holdout membership
    # (got has no explicit list; recompute from perm as the scheme does)
    assert [bags[i].name for i in perm[:n_hold]] == saved_holdout

    final = got["final"]
    assert ref["subset_accuracy"] >= 0.9
    assert final["subset_accuracy"] >= 0.9
    # the majority-vote metrics quantize at 1/n_hold (20 holdout bags ->
    # 0.05 steps), coarser than TOL: allow ONE bag of disagreement
    bag_quantum = 1.0 / n_hold + 1e-9
    assert abs(final["subset_accuracy"] - ref["subset_accuracy"]) <= \
        max(TOL, bag_quantum)
    assert abs(final["hamming_loss"] - ref["hamming_loss"]) <= \
        max(TOL, bag_quantum)


# ---------------------------------------------------------------------------
# attention_map head-to-head (attention_map.py:59-118 vs cli/attention_map)
# ---------------------------------------------------------------------------

def _write_patch_bag(root, rng, rows=5, cols=4, size=64):
    """A bag of JPEG patches named <row>_<col>.jpg (deepzoom_tiler.py:108)."""
    from PIL import Image

    bag = os.path.join(root, "patches", "bag_a")
    os.makedirs(bag, exist_ok=True)
    for r in range(rows):
        for c in range(cols):
            arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr.astype(np.uint8)).save(
                os.path.join(bag, f"{r}_{c}.jpg"), quality=90)
    return os.path.join(root, "patches")


def _write_weights(root):
    """Shared embedder (SimCLR schema) + aggregator (reference schema)."""
    import torch

    from torch_resnet_oracle import TorchResNet
    import collections

    import jax

    from tpumil.io import torch_ckpt
    from tpumil.models import dsmil as jdsmil

    torch.manual_seed(3)
    net = TorchResNet(18, torch.nn.InstanceNorm2d).eval()
    sd = collections.OrderedDict(
        (k, v) for k, v in net.state_dict().items() if not k.startswith("fc"))
    sd["l1.weight"] = torch.zeros(512, 512)
    sd["l1.bias"] = torch.zeros(512)
    sd["l2.weight"] = torch.zeros(256, 512)
    sd["l2.bias"] = torch.zeros(256)
    emb_path = os.path.join(root, "embedder.pth")
    torch.save(sd, emb_path)

    cfg = jdsmil.DSMILConfig(feats_size=512, num_classes=2, nonlinear=True)
    params = jdsmil.init_params(jax.random.PRNGKey(11), cfg)
    agg_path = os.path.join(root, "aggregator.pth")
    torch_ckpt.save_mil_pth(jax.tree.map(np.asarray, params), agg_path)
    return emb_path, agg_path


def test_reference_e2e_attention_heatmap(tmp_path):
    """Identical patches + identical weights: the reference's torch heatmap
    pipeline and tpumil's must produce the same PNG (pixel-level; the shared
    final quantize stage is documented in reference_attention_runner.py) and
    the same per-patch attention CSV."""
    from tpumil.cli.attention_map import load_milnet
    from tpumil.infer.heatmap import BagInference, run_attention_maps

    rng = np.random.default_rng(5)
    bag_root = _write_patch_bag(str(tmp_path), rng)
    emb_path, agg_path = _write_weights(str(tmp_path))
    thres = [0.0, 0.0]  # detect both classes: accumulate + divide path

    ref_map = os.path.join(str(tmp_path), "ref_maps")
    ref_scores = os.path.join(str(tmp_path), "ref_scores")
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "reference_attention_runner.py"),
         "--num_classes", "2", "--thres", "0.0", "0.0",
         "--embedder_weights", emb_path, "--aggregator_weights", agg_path,
         "--bag_path", bag_root, "--map_path", ref_map,
         "--export_scores", "1", "--score_path", ref_scores, "--seed", "9"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "CUDA_VISIBLE_DEVICES": ""})
    assert r.returncode == 0, r.stderr[-3000:]
    colors = [np.asarray(c) for c in json.loads(
        r.stdout.split("REF_COLORS:")[1].strip().splitlines()[0])]

    emb_params, emb_cfg, agg_params, model_name = load_milnet(
        emb_path, agg_path, 2, precision="f32")
    infer = BagInference(emb_params, emb_cfg, agg_params, batch_size=64,
                         patch_size=None, num_workers=2, model=model_name)
    got_map = os.path.join(str(tmp_path), "tpu_maps")
    got_scores = os.path.join(str(tmp_path), "tpu_scores")
    results = run_attention_maps(
        infer, [os.path.join(bag_root, "bag_a")], thres,
        ["class 0", "class 1"], got_map, colors=colors,
        score_path=got_scores, log=lambda s: None)
    assert results[0].detected == [0, 1]

    from PIL import Image

    ref_png = np.asarray(Image.open(os.path.join(ref_map, "bag_a.png")))
    got_png = np.asarray(Image.open(os.path.join(got_map, "bag_a.png")))
    assert ref_png.shape == got_png.shape == (5 * 32, 4 * 32, 3)
    diff = np.abs(ref_png.astype(np.int32) - got_png.astype(np.int32))
    # identical up to the ubyte quantization of O(1e-3)-relative f32
    # conv differences (XLA vs torch; tests/test_features.py pins 8e-3)
    assert diff.max() <= 2, f"max pixel delta {diff.max()}"
    assert (diff <= 1).mean() >= 0.99

    import pandas as pd

    ref_csv = pd.read_csv(os.path.join(ref_scores, "bag_a.csv"))
    got_csv = pd.read_csv(os.path.join(got_scores, "bag_a.csv"))
    ref_by_pos = {row["pos"]: (row["0"], row["1"])
                  for _, row in ref_csv.iterrows()}
    got_by_pos = {row["pos"]: (row["0"], row["1"])
                  for _, row in got_csv.iterrows()}
    assert set(ref_by_pos) == set(got_by_pos) and len(ref_by_pos) == 20
    ref_arr = np.asarray([ref_by_pos[k] for k in sorted(ref_by_pos)])
    got_arr = np.asarray([got_by_pos[k] for k in sorted(got_by_pos)])
    np.testing.assert_allclose(got_arr, ref_arr, atol=2e-3)


# ---------------------------------------------------------------------------
# train_mil.py head-to-head (classic MIL benchmark, vendored fixture)
# ---------------------------------------------------------------------------

def test_reference_e2e_mil_bench(tmp_path):
    """The reference's train_mil.py main() end-to-end on the vendored
    musk1-format fixture vs run_mil_cv on IDENTICAL fold membership (the
    reference's recorded bag shuffle replayed via `permutation`, torch
    default init on both sides). Per-fold best accuracies quantize at 1/3
    (3-bag test folds); the CV mean must agree to one bag-vote overall."""
    from tpumil.data.mil_bench import parse_mil_file
    from tpumil.train.schemes import MILBenchConfig, run_mil_cv

    src = os.path.join(os.path.dirname(__file__), "data", "musk1_mini.svm")
    ref = R.run_reference_mil(str(tmp_path), src, num_epoch=40, cv_fold=10,
                              seed=0)
    assert len(ref["fold_accs"]) == 10 and ref["order_sigs"] is not None

    bags = parse_mil_file(src, num_feats=166)
    perm = R.mil_order_to_permutation(bags, ref["order_sigs"])
    cfg = MILBenchConfig(num_feats=166, num_epochs=40, cv_fold=10, seed=0,
                         verbose=False, init="torch_default")
    mean, std, accs = run_mil_cv(bags, cfg, log=lambda s: None,
                                 permutation=perm)

    # both sides learned (the fixture plants a real musk1-like signal) and
    # agree within one 3-bag fold vote on the 30-bag mean
    assert ref["mean"] >= 0.75 and mean >= 0.75
    assert abs(mean - ref["mean"]) <= 1.0 / 30 * 2 + 1e-9, \
        (mean, ref["mean"], accs, ref["fold_accs"])


# ---------------------------------------------------------------------------
# compute_feats head-to-head (compute_feats.py:128-263 vs cli/compute_feats)
# ---------------------------------------------------------------------------

def test_reference_e2e_compute_feats(tmp_path, monkeypatch):
    """Identical patch tree + identical SimCLR checkpoint: the reference's
    torch feature-extraction main() and tpumil's cli/compute_feats must
    produce equivalent per-bag feature CSVs (matched per patch-row; the
    reference's loader order is glob-arbitrary) and the same master-CSV
    label assignment."""
    # the CLI exports the surgered embedder to the reference-contract
    # cwd-relative embedder/<ds>/ path — keep that out of the repo tree
    monkeypatch.chdir(tmp_path)
    import glob as globmod

    from tpumil.cli import compute_feats as cf_cli

    rng = np.random.default_rng(8)
    wsi = os.path.join(str(tmp_path), "WSI", "synfeats", "single")
    for cls in ("aa", "bb"):
        bag = os.path.join(wsi, cls, f"bag_{cls}")
        os.makedirs(bag)
        from PIL import Image

        for r in range(3):
            for c in range(2):
                arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(bag, f"{r}_{c}.jpg"),
                                          quality=92)

    # shared SimCLR-format checkpoint in the reference's expected location
    import collections

    import torch

    from torch_resnet_oracle import TorchResNet

    torch.manual_seed(4)
    net = TorchResNet(18, torch.nn.InstanceNorm2d).eval()
    sd = collections.OrderedDict(
        (k, v) for k, v in net.state_dict().items() if not k.startswith("fc"))
    sd["l1.weight"] = torch.zeros(512, 512)
    sd["l1.bias"] = torch.zeros(512)
    sd["l2.weight"] = torch.zeros(256, 512)
    sd["l2.bias"] = torch.zeros(256)
    ckpt = os.path.join(str(tmp_path), "simclr", "runs", "w0", "checkpoints")
    os.makedirs(ckpt)
    torch.save(sd, os.path.join(ckpt, "model.pth"))

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "reference_feats_runner.py"),
         "--dataset", "synfeats", "--weights", "w0", "--num_classes", "2",
         "--batch_size", "64", "--num_workers", "0"],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=600,
        env={**os.environ, "CUDA_VISIBLE_DEVICES": "", "REF_SEED": "0"})
    assert r.returncode == 0, r.stderr[-3000:]

    out = os.path.join(str(tmp_path), "tpu_datasets")
    rc = cf_cli.main([
        "--dataset", "synfeats", "--num_classes", "2", "--batch_size", "64",
        "--num_workers", "2", "--patch_size", "64", "--device", "cpu",
        "--weights", os.path.join(ckpt, "model.pth"),
        "--wsi_root", os.path.join(str(tmp_path), "WSI"),
        "--out_root", out])
    assert not rc

    for cls in ("aa", "bb"):
        ref_csv = os.path.join(str(tmp_path), "datasets", "synfeats", cls,
                               f"bag_{cls}.csv")
        got_csv = os.path.join(out, "synfeats", cls, f"bag_{cls}.csv")
        want = np.loadtxt(ref_csv, delimiter=",", skiprows=1, ndmin=2)
        got = np.loadtxt(got_csv, delimiter=",", skiprows=1, ndmin=2)
        assert want.shape == got.shape == (6, 512)
        # the reference's row order is glob-arbitrary: match rows by
        # nearest neighbor, require a perfect matching within tolerance
        used = set()
        for g in got:
            d = np.abs(want - g).max(axis=1)
            if used:
                d[list(used)] = np.inf
            j = int(np.argmin(d))
            assert d[j] <= 2e-2, (float(d[j]), j)
            used.add(j)
        np.testing.assert_allclose(np.sort(got, axis=0),
                                   np.sort(want, axis=0),
                                   rtol=1e-2, atol=2e-2)

    # master CSV: same bag -> label assignment (sorted class dirs)
    def label_map(master):
        import csv

        m = {}
        with open(master) as f:
            rows = list(csv.reader(f))
        for path, label in rows[1:]:
            m[os.path.splitext(os.path.basename(path))[0]] = int(label)
        return m

    ref_master = os.path.join(str(tmp_path), "datasets", "synfeats",
                              "synfeats.csv")
    got_master = os.path.join(out, "synfeats", "synfeats.csv")
    assert label_map(ref_master) == label_map(got_master) == \
        {"bag_aa": 0, "bag_bb": 1}


# ---------------------------------------------------------------------------
# SimCLR loop head-to-head (simclr/run.py -> SimCLR.train() vs SimCLRTrainer)
# ---------------------------------------------------------------------------

def _simclr_patch_tree(root, size=64, seed=3):
    """Two latent patch classes (red horizontal vs blue vertical stripes) in
    the reference WSI layout. 64px minimum: the reference's InstanceNorm2d
    rejects layer4's 1x1 spatial maps in train mode below that."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    paths = []
    for cls in range(2):
        for b in range(2):
            d = os.path.join(root, "WSI", "simclr-demo", "single",
                             f"c{cls}", f"bag{b}")
            os.makedirs(d)
            for i in range(16):
                img = rng.integers(0, 60, (size, size, 3)).astype(np.uint8)
                if cls == 0:
                    img[::4, :, 0] = 200 + rng.integers(0, 40)
                else:
                    img[:, ::4, 2] = 200 + rng.integers(0, 40)
                p = os.path.join(d, f"{i}_0.jpeg")
                Image.fromarray(img).save(p)
                paths.append(p)
    return paths


def test_reference_e2e_simclr_loop(tmp_path):
    """The reference's OWN simclr/run.py -> SimCLR.train() (manifest glob,
    two-view augmentation per dataset_wrapper.py:48-60, ResNetSimCLR,
    NT-Xent, Adam(1e-5, 10e-6), best-validation model.pth) runs end-to-end
    on CPU (tests/reference_simclr_runner.py, env shims only) on a shared
    patch tree, head-to-head against tpumil's SimCLRTrainer (what
    cli/simclr_train drives) at the identical configuration.

    Statistical parity (augmentation RNG streams differ by construction):
      * per-epoch validation NT-Xent losses within 0.05 (observed ~0.004;
        a wrong temperature/batch/normalization shifts this by >=0.1),
      * feature-distribution moments of the two trained checkpoints match
        (pairwise-cosine mean within 0.02, stds within 2x),
      * the reference's GENUINE training artifact (runs/.../model.pth from
        a real SimCLR.train() run, not a synthesized state_dict) loads
        through tpumil's checkpoint surgery with numeric parity vs torch.
    """
    from PIL import Image

    import jax.numpy as jnp

    from tpumil.models import embedder as emb_mod
    from tpumil.models.embedder import EmbedderConfig
    from tpumil.models.simclr import SimCLRConfig
    from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

    paths = _simclr_patch_tree(str(tmp_path))
    work = tmp_path / "work"
    work.mkdir()
    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "reference_simclr_runner.py"),
         "--dataset", "simclr-demo", "--epochs", "3", "--batch_size", "8",
         "--input_size", "64", "--valid_size", "0.25"],
        cwd=str(work), capture_output=True, text=True, timeout=900,
        env={**os.environ, "CUDA_VISIBLE_DEVICES": "", "REF_SEED": "0",
             "TPUMIL_REFERENCE": R.REFERENCE})
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    line = [l for l in r.stdout.splitlines()
            if l.startswith("REF_SIMCLR_RESULT ")]
    assert line, r.stdout[-1500:]
    ref = json.loads(line[0].split(" ", 1)[1])
    assert len(ref["validation_loss"]) == 3 and ref["ckpt"]

    cfg = SimCLRTrainConfig(batch_size=8, epochs=3, lr=1e-5,
                            weight_decay=1e-5, temperature=0.5,
                            valid_size=0.25, input_size=64, num_workers=2,
                            seed=0)
    tr = SimCLRTrainer(SimCLRConfig(base_model="resnet18", out_dim=256,
                                    compute_dtype=jnp.float32), cfg)
    out = tr.fit(paths, str(tmp_path / "tpu_run"))
    got_valid = out["history"]["valid_loss"]
    assert len(got_valid) == 3

    # (a) loss-trajectory agreement, epoch by epoch
    for rv, gv in zip(ref["validation_loss"], got_valid):
        assert abs(rv - gv) <= 0.05, (ref["validation_loss"], got_valid)

    # (b) + (c): embed the shared patches with BOTH trained checkpoints
    # through the SAME tpumil surgery
    ecfg = EmbedderConfig(backbone="resnet18", norm="instance",
                          num_classes=1, compute_dtype=jnp.float32)
    imgs = np.stack([np.asarray(Image.open(p), np.uint8) for p in paths])

    def feats_of(ckpt):
        params = emb_mod.load_simclr_checkpoint(ckpt, ecfg)
        f, _ = emb_mod.forward(params, jnp.asarray(imgs), ecfg)
        return np.array(f)

    def sim_stats(f):
        f = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-9)
        s = (f @ f.T)[~np.eye(len(f), dtype=bool)]
        return float(s.mean()), float(s.std())

    ref_feats = feats_of(ref["ckpt"])
    tpu_feats = feats_of(out["checkpoint"])
    m_ref, s_ref = sim_stats(ref_feats)
    m_tpu, s_tpu = sim_stats(tpu_feats)
    assert abs(m_ref - m_tpu) <= 0.02, (m_ref, m_tpu)
    assert 0.5 <= (s_ref + 1e-9) / (s_tpu + 1e-9) <= 2.0, (s_ref, s_tpu)

    # (c) the genuine reference artifact round-trips with numeric parity:
    # torch-side h-features (ResNetSimCLR drops the fc head,
    # resnet_simclr.py:16) vs tpumil's surgered embedder
    import torch

    from torch_resnet_oracle import TorchResNet

    sd = torch.load(ref["ckpt"], map_location="cpu", weights_only=True)
    oracle = TorchResNet(18, torch.nn.InstanceNorm2d).eval()
    osd = oracle.state_dict()
    vals = list(sd.values())
    assert len(vals) == len(osd) + 4  # backbone + l1/l2 projection
    oracle.load_state_dict(
        {k: v for k, v in zip(osd, vals)}, strict=True)
    probe = imgs[:4].astype(np.float32) / 255.0
    with torch.no_grad():
        want = oracle(torch.from_numpy(
            np.transpose(probe, (0, 3, 1, 2)).copy())).numpy()
    np.testing.assert_allclose(ref_feats[:4], want, rtol=8e-3, atol=8e-4)
