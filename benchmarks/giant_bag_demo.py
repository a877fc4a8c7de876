"""VERDICT r2 #3 done-bar: a DEFAULT-config BagTrainer trains a synthetic
262,144-instance bucket on the chip without OOM and without any user flag.

The bucket (2 bags x 262144 x 512 f32 = 1 GiB) is generated ON DEVICE (the
tunnel would take minutes to ship it) and wrapped in a DeviceBagStore
skeleton, then driven through the PUBLIC train_epoch/predict entry points so
the auto dispatch (`fused_threshold="auto"`) makes the routing decision.

    python benchmarks/giant_bag_demo.py        # train: giant-bag bucket
    python benchmarks/giant_bag_demo.py eval   # eval: wide mid-size chunk

Eval mode drives the OTHER memory regime (docs/PERF.md "Eval is a
different memory regime"): a 64 x 32,768 bucket (2M padded instances,
4 GiB resident f32) whose per-bag train estimate is tiny but whose
whole-chunk eval forward estimates over budget — the auto policy must
split the bag axis (keeping the fast XLA forward) rather than dropping to
the fused kernels, and the split sub-chunks must run OOM-free on chip."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from tpumil.data.device_store import DeviceBagStore
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer

    b, n, k = 2, 262144, 512
    cfg = DSMILConfig(feats_size=k, num_classes=1)
    tr = BagTrainer(cfg)  # default config: fused_threshold="auto"

    feats = jax.jit(
        lambda key: jax.random.normal(key, (b, n, k), jnp.float32))(
            jax.random.PRNGKey(0))
    store = object.__new__(DeviceBagStore)
    store.num_bags = b
    store.num_classes = 1
    store.labels = np.asarray([[1.0], [0.0]], np.float32)
    store.names = [f"giant{i}" for i in range(b)]
    store.buckets = {n: (feats, jnp.ones((b, n), bool),
                         jnp.asarray(store.labels))}
    store.index = {n: np.arange(b)}
    store.counts = {n: b}

    params, opt_state = tr.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    routed_fused = tr._use_fused(n, int(feats.nbytes))
    t0 = time.perf_counter()
    params, opt_state, loss = tr.train_epoch(params, opt_state, store,
                                             lr=1e-4, rng=rng)
    train_s = time.perf_counter() - t0
    scores, losses = tr.predict(params, store)
    assert np.all(np.isfinite(scores)) and np.isfinite(loss)
    print(json.dumps({
        "bucket": [b, n, k],
        "auto_routed_to": "fused" if routed_fused else "xla",
        "fused_dispatches": tr.fused_dispatches,
        "epoch_seconds": round(train_s, 2),
        "mean_loss": round(float(loss), 4),
        "scores": [round(float(s), 4) for s in scores[:, 0]],
        "oom": False,
    }))


def main_eval():
    import jax
    import jax.numpy as jnp

    from tpumil.data.device_store import DeviceBagStore
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer

    b, n, k = 64, 32768, 512
    cfg = DSMILConfig(feats_size=k, num_classes=1)
    tr = BagTrainer(cfg)  # default config: fused_threshold="auto"

    feats = jax.jit(
        lambda key: jax.random.normal(key, (b, n, k), jnp.float32))(
            jax.random.PRNGKey(0))
    labels = np.asarray((np.arange(b) % 2)[:, None], np.float32)
    store = object.__new__(DeviceBagStore)
    store.num_bags = b
    store.num_classes = 1
    store.labels = labels
    store.names = [f"wide{i}" for i in range(b)]
    store.buckets = {n: (feats, jnp.ones((b, n), bool),
                         jnp.asarray(labels))}
    store.index = {n: np.arange(b)}
    store.counts = {n: b}

    params, _ = tr.init(jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    scores, losses = tr.predict(params, store)
    eval_s = time.perf_counter() - t0
    assert np.all(np.isfinite(scores)) and np.all(np.isfinite(losses))
    print(json.dumps({
        "bucket": [b, n, k],
        "resident_gib": round(feats.nbytes / 2 ** 30, 2),
        "eval_splits": tr.eval_splits,
        "fused_dispatches": tr.fused_dispatches,
        "eval_seconds": round(eval_s, 2),
        "mean_loss": round(float(losses.mean()), 4),
        "oom": False,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "eval":
        main_eval()
    else:
        main()
