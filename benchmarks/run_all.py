"""Reproduce every number in docs/PERF.md on the attached TPU.

    python benchmarks/run_all.py            # all suites
    python benchmarks/run_all.py feats agg  # a subset

Prints one JSON line per benchmark.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_feats():
    sys.path.insert(0, ".")
    from bench import bench_feature_extraction

    return bench_feature_extraction()


def bench_agg():
    sys.path.insert(0, ".")
    from bench import bench_aggregator_train

    return bench_aggregator_train()


def bench_pallas():
    import jax
    import jax.numpy as jnp

    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.ops.dsmil_pallas import fused_bag_forward

    cfg = DSMILConfig(feats_size=512, num_classes=1)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    n, reps = 65536, 32
    feats = jnp.asarray(rng.standard_normal((n, 512)), jnp.float32)
    mask = jnp.ones((n,), bool)

    def many(fn):
        # Vary the (tiny) params per iteration: an unchanged body is hoisted
        # out of lax.scan by CSE even across optimization_barrier, which
        # silently turns the scan into ONE execution (docs/PERF.md
        # methodology). Scaling every weight by 1 + i*1e-9 defeats that at
        # negligible cost and without extra feats traffic.
        @jax.jit
        def run(p, f):
            def body(carry, s):
                p2 = jax.tree.map(lambda w: w * s, p)
                return carry, jnp.sum(fn(p2, f))
            _, outs = jax.lax.scan(
                body, 0.0, 1.0 + jnp.arange(reps, dtype=jnp.float32) * 1e-9)
            return jnp.sum(outs)
        return run

    xla = many(lambda p, f: dsmil.forward(p, f, mask)[1])
    pal = many(lambda p, f: fused_bag_forward(p, f, n, tile_n=1024)[0])
    out = {}
    for name, fn in (("xla", xla), ("pallas", pal)):
        _ = float(fn(params, feats))
        t0 = time.perf_counter()
        _ = float(fn(params, feats))
        out[name + "_ms"] = round((time.perf_counter() - t0) / reps * 1000, 3)
    return {"metric": "fused_pool_forward_65k", "value": out["pallas_ms"],
            "unit": "ms/bag (N=65536)", "vs_baseline": round(
                out["xla_ms"] / out["pallas_ms"], 2)}


def bench_pallas_train():
    import jax
    import jax.numpy as jnp

    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.ops.dsmil_pallas import make_fused_bag_train_step
    from tpumil.train.optim import adam_torch

    cfg = DSMILConfig(feats_size=512, num_classes=1)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    opt = adam_torch(betas=(0.5, 0.9), weight_decay=1e-3)
    opt_state = opt.init(params)
    # tile 512: the streaming backward's scoped-VMEM stack at true-f32
    # (HIGHEST) dot precision overflows 16 MB at tile 1024 (trainer.py
    # fused_tile has the measurement)
    step = make_fused_bag_train_step(cfg, opt, tile_n=512)
    rng = np.random.default_rng(0)
    n = 65536
    feats = jnp.asarray(rng.standard_normal((n, 512)), jnp.float32)
    nv = jnp.asarray([n], jnp.int32)
    label = jnp.asarray([1.0])
    lr = jnp.asarray(1e-4)
    params, opt_state, loss = step(params, opt_state, feats, nv, label, lr)
    _ = float(loss)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        params, opt_state, loss = step(params, opt_state, feats, nv, label, lr)
    _ = float(loss)
    ms = (time.perf_counter() - t0) / reps * 1000
    return {"metric": "fused_bag_train_step_65k", "value": round(ms, 2),
            "unit": "ms (fwd + streaming bwd + Adam)", "vs_baseline": None}


def bench_simclr():
    import jax
    import jax.numpy as jnp

    from tpumil.models.simclr import SimCLRConfig
    from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

    tr = SimCLRTrainer(SimCLRConfig(),
                       SimCLRTrainConfig(batch_size=256, input_size=224))
    p, s = tr.init(jax.random.PRNGKey(0))
    imgs = jax.jit(lambda k: jax.random.uniform(
        k, (256, 224, 224, 3), jnp.float32))(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    lr = jnp.asarray(1e-5)
    p, s, loss = tr._train_step(p, s, key, imgs, lr)
    _ = float(loss)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        key, sub = jax.random.split(key)
        p, s, loss = tr._train_step(p, s, sub, imgs, lr)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": "simclr_step_throughput", "value": round(256 / dt, 1),
            "unit": "patches/sec (B=256@224, two on-device views, fwd+bwd)",
            "vs_baseline": round(256 / dt / 1250.0, 2)}


def bench_crossover():
    from fused_crossover import main as cross_main

    rows = cross_main()
    at16k = next(r for r in rows if r["n"] == 16384)
    return {"metric": "fused_dispatch_speedup_16k", "value": at16k["fused_speedup"],
            "unit": "x vs XLA scan step (see rows above)", "vs_baseline": None}


def bench_bf16():
    from bf16_parity import main as bf16_main

    return bf16_main()


def bench_stream():
    sys.path.insert(0, ".")
    from bench import bench_stream as bs

    return bs()


def bench_serve_host():
    """Host-only (no TPU): the serving wire ceiling (docs/PERF.md
    'Zero-copy wire'). Reports the zero-copy loopback rate."""
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "serve_profile.py")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    if r.returncode != 0:
        return {"metric": "serve_host_ceiling", "error": r.stderr[-500:]}
    line = [l for l in r.stdout.splitlines() if "zero-copy wire" in l][-1]
    pps = float(line.split("(")[1].split("patches/s")[0].replace(",", ""))
    return {"metric": "serve_host_ceiling", "value": pps,
            "unit": "patches/s host-side (stub service, loopback HTTP, "
                    "zero-copy wire)", "vs_baseline": None,
            "raw": line.strip()}


SUITES = {"feats": bench_feats, "agg": bench_agg, "pallas": bench_pallas,
          "pallas_train": bench_pallas_train, "simclr": bench_simclr,
          "stream": bench_stream, "crossover": bench_crossover,
          "bf16": bench_bf16, "serve_host": bench_serve_host}


def main():
    wanted = sys.argv[1:] or list(SUITES)
    for name in wanted:
        print(json.dumps(SUITES[name]()), flush=True)


if __name__ == "__main__":
    main()
