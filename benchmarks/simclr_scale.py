"""Demonstrate the reference's SimCLR scale: batch 4096 on one chip.

The reference trains SimCLR at batch_size 4096 (simclr/config.yaml:1, fp16
via apex). Monolithic steps OOM above batch 1024 on the 16 GB chip even
with ``remat=True`` (multiple 784 MB bf16 backward temps alive at once —
docs/PERF.md), so batch 4096 runs through the gradient-cache two-pass step
(``grad_cache_microbatch``): exact NT-Xent gradients at O(microbatch)
activation memory. Because a failed allocation poisons the tunnel runtime
for the rest of the process, each point runs in a FRESH subprocess and
reports fit + patches/s.

    python benchmarks/simclr_scale.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

TRIAL = r"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from tpumil.models.simclr import SimCLRConfig
from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

batch, remat, dtype, mb = (int(sys.argv[1]), sys.argv[2] == "1",
                           sys.argv[3], int(sys.argv[4]))
model_cfg = SimCLRConfig(
    compute_dtype=jnp.bfloat16 if dtype == "bf16" else jnp.float32)
tr = SimCLRTrainer(model_cfg,
                   SimCLRTrainConfig(batch_size=batch, input_size=224,
                                     remat=remat,
                                     grad_cache_microbatch=mb or None))
p, s = tr.init(jax.random.PRNGKey(0))
imgs = jax.jit(lambda k: jax.random.uniform(
    k, (batch, 224, 224, 3), jnp.float32))(jax.random.PRNGKey(1))
key = jax.random.PRNGKey(2)
lr = jnp.asarray(1e-5)
p, s, loss = tr._train_step(p, s, key, imgs, lr)
assert np.isfinite(float(loss))
reps = 6 if batch >= 2048 else 10
t0 = time.perf_counter()
for _ in range(reps):
    key, sub = jax.random.split(key)
    p, s, loss = tr._train_step(p, s, sub, imgs, lr)
_ = float(loss)
dt = (time.perf_counter() - t0) / reps
print("OK", json.dumps({"step_ms": round(dt * 1e3, 1),
                        "patches_per_s": round(batch / dt, 1)}))
""".replace("json.dumps", "__import__('json').dumps")


def trial(batch: int, remat: bool, dtype: str, mb: int = 0):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    out = {"batch": batch, "remat": remat, "dtype": dtype, "grad_cache": mb}
    try:
        r = subprocess.run(
            [sys.executable, "-c", TRIAL, str(batch), "1" if remat else "0",
             dtype, str(mb)],
            capture_output=True, text=True, timeout=1800, env=env,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
    except subprocess.TimeoutExpired:
        out["fits"] = False
        out["error"] = "timeout (1800s; compile or thrashing)"
        return out
    for line in r.stdout.splitlines():
        if line.startswith("OK "):
            out.update(json.loads(line[3:]))
            out["fits"] = True
            return out
    tail = (r.stdout + r.stderr).strip().splitlines()
    out["fits"] = False
    out["error"] = tail[-1][:140] if tail else "?"
    return out


def main():
    points = (
        # reference scale via gradient cache (exact grads, O(mb) memory)
        (4096, False, "bf16", 512),
        (4096, False, "bf16", 256),
        (4096, False, "bf16", 128),
        (4096, False, "bf16", 64),
        (4096, False, "bf16", 32),
        (4096, True, "bf16", 512),
        (2048, False, "bf16", 512),
        # monolithic ceiling for the record
        (4096, True, "bf16", 0),
        (2048, True, "bf16", 0),
        (1024, True, "bf16", 0),
        (512, True, "bf16", 0),
    )
    results = []
    for batch, remat, dtype, mb in points:
        row = trial(batch, remat, dtype, mb)
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
