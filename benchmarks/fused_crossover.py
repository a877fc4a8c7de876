"""Measure the XLA-vs-fused-Pallas crossover for per-bag training steps.

Times the trainer's two dispatchable bucket paths — the XLA scan step
(materializes Q [N, D] / A in HBM, autodiff backward) and the fused bucket
(streaming Pallas kernels with the custom-VJP backward) — over an 8-bag
bucket in ONE dispatch per repetition, so per-bag kernel cost is measured
without host-dispatch effects. With every dot pinned to true f32 for torch
parity, the XLA path wins at every measured N, which is why
BagTrainer.fused_threshold defaults to None (see docs/PERF.md
"Fused-kernel dispatch").

    python benchmarks/fused_crossover.py
"""

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

    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer

    rng = np.random.default_rng(0)
    cfg = DSMILConfig(feats_size=512, num_classes=1)
    results = []
    for n in (4096, 8192, 16384, 32768, 65536):
        b = 8
        feats = jnp.asarray(rng.standard_normal((b, n, 512)), jnp.float32)
        mask = jnp.ones((b, n), bool)
        labels = jnp.asarray(rng.integers(0, 2, (b, 1)), jnp.float32)
        perm = jnp.arange(b)
        real = jnp.ones((b,), bool)
        lr = jnp.asarray(1e-4)
        row = {"n": n}
        for name in ("xla", "fused"):
            tr = BagTrainer(cfg, fused_threshold=(1 if name == "fused" else None))
            params, opt_state = tr.init(jax.random.PRNGKey(0))
            pw = tr._pw()
            if name == "fused":
                bucket, _, _ = tr._fused_fns(n)
                run = lambda p, s: bucket(p, s, feats, mask, labels, perm,
                                          lr, real, pw)
            else:
                keys = jax.random.split(jax.random.PRNGKey(1), b)
                run = lambda p, s: tr._train_bucket(p, s, feats, mask, labels,
                                                    perm, lr, keys, real, pw)
            params, opt_state, loss = run(params, opt_state)
            _ = float(loss)  # force through the tunnel
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                params, opt_state, loss = run(params, opt_state)
            _ = float(loss)
            row[name + "_ms_per_bag"] = round(
                (time.perf_counter() - t0) / reps / b * 1e3, 3)
        row["fused_speedup"] = round(
            row["xla_ms_per_bag"] / row["fused_ms_per_bag"], 3)
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
