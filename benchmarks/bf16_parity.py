"""Quantify what extraction precision costs downstream (AUC/thresholds).

bf16 instance-norm ResNet features correlate ~0.995 with true f32 — but
the BASELINE target is "AUC within 0.5%", so the question is what that
feature noise does to the trained aggregator. This runs the synthetic
end-to-end pipeline once per precision tier (identical patches, identical
embedder weights, identical CV seeds; only the matmul precision tier /
compute dtype changes), and reports per-tier AUC deltas vs the true-f32
run plus the per-fold optimal-threshold shift. All tiers' features go
through the SAME affine standardization (statistics from the true-f32
run). Result documented in docs/PERF.md; it sets the compute_feats
--precision default.

Design notes (found the hard way):
  * the embedder is a random-init instance-norm ResNet18; its raw features
    are nearly constant (mean 0.83, std 0.06), which stalls the aggregator.
    Both precisions' features go through the SAME affine standardization
    (statistics from the f32 run), standing in for what SimCLR pretraining
    gives real pipelines.
  * the texture amplitude is tuned so 5-fold AUC sits in the ~0.7-0.8 band:
    unsaturated, so a precision-induced shift is visible (AUC pinned at 1.0
    would measure nothing).
  * three CV seeds per precision; the deltas' spread is reported so the
    bf16 shift can be compared against seed noise.

    python benchmarks/bf16_parity.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_patches(rng, n_slides=60, patches_per_slide=24, size=224,
                 tumor_frac=0.15, amplitude=0.05):
    """Weak-signal synthetic WSI patches: every patch is smooth
    low-frequency texture; tumor slides hide fine 2x2 speckle in a fraction
    of their patches (instance norm preserves spatial-frequency content, so
    the embedder can see it — unlike brightness/contrast shifts)."""
    slides = []
    labels = []
    for s in range(n_slides):
        tumor = s % 2 == 0
        n_tumor = max(1, int(rng.binomial(patches_per_slide, tumor_frac))) \
            if tumor else 0
        pats = []
        for p in range(patches_per_slide):
            base = rng.normal(0.5, 0.08, (size // 8, size // 8, 3))
            img = np.repeat(np.repeat(base, 8, 0), 8, 1)
            img += rng.normal(0.0, 0.02, img.shape)  # sensor noise
            if p < n_tumor:
                speck = rng.normal(0, 1, (size // 2, size // 2, 3))
                img += amplitude * np.repeat(np.repeat(speck, 2, 0), 2, 1)
            pats.append(np.clip(img, 0, 1))
        slides.append(np.stack(pats).astype(np.float32))
        labels.append(1.0 if tumor else 0.0)
    return slides, np.asarray(labels, np.float32)


def extract(slides, mode):
    """mode: 'bf16' | 'f32' (DEFAULT matmul precision: bf16 conv inputs with
    f32 accumulation on TPU) | 'f32h' (HIGH: bf16_3x, ~7e-5 of true f32) |
    'f32x' (HIGHEST: true f32, bit-parity with the CPU/torch oracle to
    ~1e-5). Drives the same EmbedderConfig.precision plumbing the CLIs
    ship, not a global flag."""
    import jax

    from tpumil.infer.features import FeatureExtractor
    from tpumil.models import embedder
    from tpumil.models.embedder import EmbedderConfig

    dtype, tier = embedder.precision_from_flag(mode)
    cfg = EmbedderConfig(num_classes=1, compute_dtype=dtype, precision=tier)
    params = embedder.init_params(jax.random.PRNGKey(0), cfg)
    ex = FeatureExtractor(params, cfg, batch_size=128,
                          patch_size=slides[0].shape[1])
    return [ex.embed_arrays(s) for s in slides]


def run_cv(featsets, labels, seed):
    from tpumil.data.bags import Bag
    from tpumil.train.schemes import WSITrainConfig, run_5fold_cv

    bags = [Bag(f, np.asarray([y], np.float32))
            for f, y in zip(featsets, labels)]
    cfg = WSITrainConfig(num_classes=1, num_epochs=40, stop_epochs=40,
                         lr=2e-4, seed=seed, verbose=False, eval_interval=10)
    return run_5fold_cv(bags, cfg, log=lambda s: None)


MODES = ("f32x", "f32h", "f32", "bf16")


def main():
    rng = np.random.default_rng(42)
    slides, labels = make_patches(rng)
    raw = {m: extract(slides, m) for m in MODES}
    x32 = np.concatenate(raw["f32x"])
    mu, sd = x32.mean(0), x32.std(0) + 1e-6
    feats = {m: [((f - mu) / sd).astype(np.float32) for f in raw[m]]
             for m in raw}
    ref = np.concatenate([f.ravel() for f in feats["f32x"]])
    corr = {m: float(np.corrcoef(
        ref, np.concatenate([f.ravel() for f in feats[m]]))[0, 1])
        for m in MODES}

    seeds = (0, 1, 2)
    out = {m: {"auc": [], "acc": [], "thresholds": []} for m in feats}
    for seed in seeds:
        for m in MODES:
            res = run_cv(feats[m], labels, seed)
            out[m]["auc"].append(res["mean_auc"][0])
            out[m]["acc"].append(res["mean_accuracy"])
            out[m]["thresholds"].append(
                [f["thresholds"][0] for f in res["folds"]])
        print(json.dumps({"seed": seed, **{
            m + "_auc": round(out[m]["auc"][-1], 4) for m in MODES}}),
            flush=True)

    def deltas(m):
        return [b - a for a, b in zip(out["f32x"]["auc"], out[m]["auc"])]

    def max_threshold_shift(m):
        """Largest |optimal threshold(mode) - optimal threshold(f32x)| over
        every (seed, fold) pair — how far the decision boundary moves."""
        shift = 0.0
        for ta, tb in zip(out["f32x"]["thresholds"], out[m]["thresholds"]):
            for a, b in zip(ta, tb):
                shift = max(shift, abs(b - a))
        return shift

    summary = {
        "metric": "feature_precision_auc_shift",
        "value": round(float(np.mean(deltas("bf16"))), 5),
        "unit": "AUC(mode) - AUC(true f32), synthetic 5-fold CV, 3 seeds",
        "bf16_delta_per_seed": [round(d, 5) for d in deltas("bf16")],
        "f32h_delta_per_seed": [round(d, 5) for d in deltas("f32h")],
        "f32_default_delta_per_seed": [round(d, 5) for d in deltas("f32")],
        "auc_mean": {m: round(float(np.mean(out[m]["auc"])), 5) for m in MODES},
        "feature_corr_vs_true_f32": {m: round(corr[m], 6) for m in MODES},
        "max_threshold_shift": {m: round(max_threshold_shift(m), 5)
                                for m in MODES if m != "f32x"},
    }
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
