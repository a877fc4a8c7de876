"""Measure the XLA per-bag train step's peak working set per bucket shape.

No live ``memory_stats`` is available through the tunnel, and a failed
allocation leaves the remote runtime poisoned (every later dispatch in the
same process fails INVALID_ARGUMENT) — so each trial runs in a FRESH
subprocess: allocate a ballast array of S bytes, run one XLA ``train_bucket``
dispatch at (b, nmax), exit 0/1. The largest surviving S bounds the step's
peak footprint (bucket feats + autodiff residuals + staged f32 operand
copies), giving the coefficients for
:func:`tpumil.train.trainer.xla_train_workingset_bytes`.

    python benchmarks/xla_workingset_probe.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

GIB = 2 ** 30

TRIAL = r"""
import sys
import numpy as np
import jax, jax.numpy as jnp
from tpumil.models.dsmil import DSMILConfig
from tpumil.train.trainer import BagTrainer

b, nmax, ballast_bytes = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
cfg = DSMILConfig(feats_size=512, num_classes=1)
tr = BagTrainer(cfg)
params, opt_state = tr.init(jax.random.PRNGKey(0))
ballast = jnp.zeros((max(ballast_bytes // 4, 1),), jnp.float32)
ballast.block_until_ready()
feats = jax.jit(
    lambda k: jax.random.normal(k, (b, nmax, 512), jnp.float32))(
        jax.random.PRNGKey(0))
mask = jnp.ones((b, nmax), bool)
labels = jnp.ones((b, 1), jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(1), b)
mode = sys.argv[4] if len(sys.argv) > 4 else "train"
if mode == "train":
    p, s, loss = tr._train_bucket(
        params, opt_state, feats, mask, labels, jnp.arange(b),
        jnp.asarray(1e-4), keys, jnp.ones((b,), bool), tr._pw())
    assert np.isfinite(float(loss))
    print("OK", float(loss))
else:  # eval: the forward-only full-batch vmap of _eval_chunk
    losses, scores, avg = tr._eval_chunk(params, feats, mask, labels, keys,
                                         tr._pw())
    assert np.all(np.isfinite(np.asarray(losses)))
    print("OK", float(np.sum(np.asarray(losses))))
"""


def trial(b: int, nmax: int, ballast_bytes: int, mode: str = "train") -> bool:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    try:
        r = subprocess.run(
            [sys.executable, "-c", TRIAL, str(b), str(nmax),
             str(ballast_bytes), mode],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        ok = r.returncode == 0 and "OK" in r.stdout
        tail = (r.stdout + r.stderr).strip().splitlines()
        msg = "ok" if ok else "FAIL: " + (tail[-1][:100] if tail else "?")
    except subprocess.TimeoutExpired:
        ok, msg = False, "TIMEOUT (thrashing counts as not fitting)"
    print(f"  {mode} b={b} n={nmax} ballast={ballast_bytes / GIB:.2f} GiB "
          f"-> {msg}", flush=True)
    return ok


def main():
    # lean mode: zero-ballast fits at the giant shapes (the dispatch
    # decision itself), plus coarse ballast brackets at two mid shapes to
    # fit the per-instance working-set coefficient — full bisection costs
    # ~10 min/trial at near-OOM ballasts (the runtime thrashes before it
    # faults), so resolution is deliberately 1-2 GiB.
    results = []
    for b, nmax in ((2, 131072), (2, 262144), (4, 262144)):
        results.append({"b": b, "nmax": nmax, "fits": trial(b, nmax, 0)})
        print(json.dumps(results[-1]), flush=True)
    for b, nmax, points in ((2, 65536, (4, 6, 8, 10)),
                            (2, 16384, (8, 10, 12))):
        best = 0
        for g in points:
            if trial(b, nmax, g * GIB):
                best = g
            else:
                break
        results.append({"b": b, "nmax": nmax, "fits": True,
                        "max_ballast_gib_coarse": best})
        print(json.dumps(results[-1]), flush=True)
    # eval mode (forward-only full-batch vmap, no autodiff residuals):
    # calibrates XLA_EVAL_BYTES_PER_INSTANCE — transients scale with the
    # whole [b, nmax] chunk, not per-bag, so probe with b in the product
    for b, nmax, points in ((2, 65536, (8, 10, 12)),
                            (8, 65536, (8, 10, 12)),
                            (2, 262144, (4, 8, 10, 12))):
        best = 0
        for g in points:
            if trial(b, nmax, g * GIB, "eval"):
                best = g
            else:
                break
        results.append({"mode": "eval", "b": b, "nmax": nmax,
                        "max_ballast_gib_coarse": best})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
