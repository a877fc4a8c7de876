"""Two-point fit: per-call fixed overhead F vs real per-iteration cost c.

T(R) = F + R*c for a scan of R iterations inside one jit call. Solving with
R=4 and R=32 gives the true device-side cost c of each workload, untangled
from the tunnel's per-dispatch overhead.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tpumil.models import resnet
from tpumil.models.resnet import ResNetConfig, _conv, _maxpool_3x3_s2, _norm

R_LO, R_HI = 4, 32


def fit(make_run, make_X, flops=None, gbytes=None, label=""):
    ts = {}
    for R in (R_LO, R_HI):
        X = jax.block_until_ready(make_X(R))
        run = make_run()
        _ = float(jnp.sum(run(X)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run(X)))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    c = (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO)
    F = ts[R_LO] - R_LO * c
    msg = f"{label:22s} c={c * 1e3:7.3f} ms/iter  F={F * 1e3:7.1f} ms/call"
    if flops:
        msg += f"  {flops / c / 1e12:6.1f} TF/s"
    if gbytes:
        msg += f"  {gbytes / c:6.0f} GB/s"
    print(msg)
    return c


def scanned(fn):
    @jax.jit
    def run(X):
        def body(c, x):
            return c, jnp.sum(fn(x).astype(jnp.float32))
        _, outs = jax.lax.scan(body, 0.0, X)
        return outs
    return run


def main():
    key = jax.random.PRNGKey(0)
    cfg = ResNetConfig(depth=18, norm="instance", compute_dtype=jnp.bfloat16)
    params = resnet.init_params(jax.random.PRNGKey(0), cfg)
    w7 = params["conv1.weight"]
    bf = jnp.bfloat16
    B = 256

    # elementwise x2 on [256,112,112,64] bf16: 0.411 GB read + write
    fit(lambda: scanned(lambda y: y * 2.0),
        lambda R: jax.random.uniform(key, (R, B, 112, 112, 64), bf),
        gbytes=2 * B * 112 * 112 * 64 * 2 / 1e9, label="elementwise x2")

    # maxpool
    fit(lambda: scanned(_maxpool_3x3_s2),
        lambda R: jax.random.uniform(key, (R, B, 112, 112, 64), bf),
        gbytes=(B * 112 * 112 * 64 * 2 + B * 56 * 56 * 64 * 2) / 1e9,
        label="maxpool3x3s2")

    # matmul 4096^3
    Bm = jax.random.uniform(jax.random.PRNGKey(1), (4096, 4096), bf)
    fit(lambda: scanned(lambda a: jnp.dot(a, Bm, preferred_element_type=bf)),
        lambda R: jax.random.uniform(key, (R, 4096, 4096), bf),
        flops=2 * 4096**3, label="mm 4096^3 bf16")

    # stem conv
    fit(lambda: scanned(lambda x: _conv(x, w7, 2, bf)),
        lambda R: jax.random.uniform(key, (R, B, 224, 224, 3), bf),
        flops=2 * B * 112 * 112 * 64 * 147, label="stem conv7x7")

    # full stem
    fit(lambda: scanned(lambda x: _maxpool_3x3_s2(
            jax.nn.relu(_norm({}, _conv(x, w7, 2, bf), "conv1.weight", cfg)))),
        lambda R: jax.random.uniform(key, (R, B, 224, 224, 3), bf),
        flops=2 * B * 112 * 112 * 64 * 147, label="full stem")

    # full net
    fit(lambda: scanned(lambda x: resnet.forward(params, x, cfg)),
        lambda R: jax.random.uniform(key, (R, B, 224, 224, 3), bf),
        flops=2 * B * 1.82e9, label="full resnet18")

    # conv3x3 56^2 64ch (layer1 shape)
    W = jax.random.uniform(jax.random.PRNGKey(2), (3, 3, 64, 64), bf)
    fit(lambda: scanned(lambda x: jax.lax.conv_general_dilated(
            x, W, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=bf)),
        lambda R: jax.random.uniform(key, (R, B, 56, 56, 64), bf),
        flops=2 * B * 56 * 56 * 64 * 9 * 64, label="conv3x3 56^2 64ch")


if __name__ == "__main__":
    main()
