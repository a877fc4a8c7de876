"""Is int8 worth a quantized inference tier on this chip? (round-4 probe)

v5e datasheet peak is 394 int8 TOPS vs 197 bf16 TF/s, but the feature
extractor is conv-OCCUPANCY bound (docs/PERF.md "Where the remaining
headroom is"), so datasheet ratios may not survive contact with ResNet18's
shape mix. Probe three levels before building anything:

  1. big square matmul: s8xs8->s32 vs bf16xbf16->f32 (the MXU ceiling ratio)
  2. the dominant ResNet18 conv shapes, same dtype pair
  3. a full conv ladder at bench shapes (batch 128)

Uses the two-point scan fit from hw_probe3 so tunnel dispatch overhead does
not pollute the per-iteration cost.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

R_LO, R_HI = 4, 32


def fit_rate(make_run, make_x, flops, label):
    ts = {}
    for R in (R_LO, R_HI):
        X = jax.block_until_ready(make_x(R))
        run = jax.jit(lambda X: make_run(X))
        _ = float(jnp.sum(run(X).astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run(X).astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    c = (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO)
    print(f"{label:38s} {c * 1e3:8.3f} ms/iter  {flops / c / 1e12:7.1f} T/s",
          flush=True)
    return flops / c


def _rand(key, shape, dtype):
    """Per-iteration DISTINCT operands: a broadcast_to of one constant lets
    XLA hoist the whole body out of the scan (measured: negative fitted
    per-iteration costs), so every R slice must differ."""
    if dtype == jnp.int8:
        return jax.random.randint(key, shape, -127, 127, jnp.int8)
    return jax.random.normal(key, shape, dtype)


def matmul_point(n, dtype, acc):
    def run(X):
        def body(_, ab):
            x, y = ab
            return None, jnp.sum(
                jax.lax.dot(x, y, preferred_element_type=acc))
        _, s = jax.lax.scan(body, None, X)
        return s

    def make_x(R):
        k1, k2 = jax.random.split(jax.random.PRNGKey(R))
        return (jax.jit(_rand, static_argnums=(1, 2))(k1, (R, n, n), dtype),
                jax.jit(_rand, static_argnums=(1, 2))(k2, (R, n, n), dtype))

    return fit_rate(run, make_x, 2 * n ** 3,
                    f"matmul {n}^2 {jnp.dtype(dtype).name}->{jnp.dtype(acc).name}")


def conv_point(batch, hw, cin, cout, k, stride, dtype, acc, label):
    w = _rand(jax.random.PRNGKey(7), (k, k, cin, cout), dtype)
    dn = jax.lax.conv_dimension_numbers((batch, hw, hw, cin), w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def run(X):
        def body(_, xr):
            o = jax.lax.conv_general_dilated(
                xr, w, (stride, stride), "SAME", dimension_numbers=dn,
                preferred_element_type=acc)
            return None, jnp.sum(o)
        _, s = jax.lax.scan(body, None, X)
        return s

    def make_x(R):
        return jax.jit(_rand, static_argnums=(1, 2))(
            jax.random.PRNGKey(R), (R, batch, hw, hw, cin), dtype)

    out_hw = hw // stride
    flops = 2 * batch * out_hw * out_hw * cout * cin * k * k
    return fit_rate(run, make_x, flops,
                    f"conv {label} {jnp.dtype(dtype).name}")


def main():
    print(f"backend: {jax.default_backend()} x{jax.device_count()}",
          flush=True)
    print("-- MXU ceiling --")
    bf = matmul_point(4096, jnp.bfloat16, jnp.float32)
    s8 = matmul_point(4096, jnp.int8, jnp.int32)
    print(f"int8/bf16 matmul ratio: {s8 / bf:.2f}x")

    print("-- ResNet18 dominant conv shapes (batch 128, bench config) --")
    # (hw, cin, cout, k, stride): layer1..layer4 3x3 body convs + s2d stem
    shapes = [
        (112, 12, 64, 3, 1, "stem-s2d 112^2 12->64"),
        (56, 64, 64, 3, 1, "layer1 56^2 64->64"),
        (28, 128, 128, 3, 1, "layer2 28^2 128->128"),
        (14, 256, 256, 3, 1, "layer3 14^2 256->256"),
        (7, 512, 512, 3, 1, "layer4 7^2 512->512"),
    ]
    for hw, cin, cout, k, stride, label in shapes:
        r_bf = conv_point(128, hw, cin, cout, k, stride,
                          jnp.bfloat16, jnp.float32, label)
        try:
            r_s8 = conv_point(128, hw, cin, cout, k, stride,
                              jnp.int8, jnp.int32, label)
            print(f"  -> int8/bf16: {r_s8 / r_bf:.2f}x")
        except Exception as e:  # pragma: no cover - probe robustness
            print(f"  -> int8 conv unsupported here: {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
