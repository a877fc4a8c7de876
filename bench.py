"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: DSMIL aggregator per-bag training throughput (bags/sec) on one
chip, Camelyon16-like shapes (1024 instances x 512 features, one Adam step
per bag as the reference does, train_tcga.py:60-73).

vs_baseline compares against the reference PyTorch per-bag loop at ~100
bags/sec on an A100-class GPU — an optimistic estimate for its
torch.load-per-step loop (train_tcga.py:62, one host->device copy + eager
forward/backward per bag; the 2024 ".pt cache" update is README.md:5's own
10x-speedup baseline).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_BAGS_PER_SEC = 100.0  # estimated A100 PyTorch per-bag-step loop


def bench_aggregator_train(n_bags: int = 256, n_inst: int = 1024,
                           feats: int = 512, classes: int = 1,
                           repeats: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    from tpumil.data.bags import Bag
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer

    from tpumil.data.device_store import DeviceBagStore

    rng = np.random.default_rng(0)
    bags = [Bag(rng.standard_normal((n_inst, feats)).astype(np.float32),
                np.asarray([float(i % 2)], np.float32), f"b{i}")
            for i in range(n_bags)]
    cfg = DSMILConfig(feats_size=feats, num_classes=classes)
    trainer = BagTrainer(cfg)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    store = DeviceBagStore(bags)  # dataset -> HBM, once

    # warmup (compile)
    params, opt_state, _ = trainer.train_epoch(params, opt_state, store, 1e-4, rng)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        params, opt_state, _ = trainer.train_epoch(params, opt_state, store, 1e-4, rng)
        jax.block_until_ready(jax.tree.leaves(params)[0])
        dt = time.perf_counter() - t0
        best = max(best, n_bags / dt)
    return {
        "metric": "aggregator_train_throughput",
        "value": round(best, 2),
        "unit": "bags/sec (1024x512 bags, per-bag Adam steps)",
        "vs_baseline": round(best / REFERENCE_BAGS_PER_SEC, 2),
    }


def main():
    result = bench_aggregator_train()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
