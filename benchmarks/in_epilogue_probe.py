"""Is a single-pass Pallas InstanceNorm worth shipping? (round-5 probe)

docs/PERF.md "Where the remaining headroom is" measured InstanceNorm at
4.65 us/img over the folded-norm conv path and sized a conv+IN epilogue at
<=7% of the headline. A Pallas conv is a measured dead end here (the stem
post-mortem), but the IN itself CAN drop to the 2-touch floor (read + write
in one kernel, ops/in_pallas.py) vs XLA's reduce + normalize kernel pair.
This probe measures, on chip:

  1. per-layer IN(+ReLU) at every ResNet18 activation shape (batch 128,
     bf16): XLA _norm chain vs fused_instance_norm — two-point scan fit so
     tunnel dispatch overhead cancels (hw_probe3 methodology);
  2. the full embedder forward at the bench configuration with
     ResNetConfig.fused_in off/on (the shipping decision);
  3. numeric parity of the fused path on the REAL device (not interpret).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/in_epilogue_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

R_LO, R_HI = 2, 8  # activation stacks are large (205 MB/iter at the stem)


def fit_time(make_run, make_x, label, n_img):
    ts = {}
    for R in (R_LO, R_HI):
        X = jax.block_until_ready(make_x(R))
        run = jax.jit(lambda X: make_run(X))
        _ = float(run(X))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(run(X))
            best = min(best, time.perf_counter() - t0)
        ts[R] = best
    c = (ts[R_HI] - ts[R_LO]) / (R_HI - R_LO)
    print(f"{label:44s} {c * 1e3:8.3f} ms/iter  {c / n_img * 1e6:7.3f} us/img",
          flush=True)
    return c


def norm_point(shape, relu, fused):
    from tpumil.models import resnet
    from tpumil.ops.in_pallas import fused_instance_norm

    cfg = resnet.ResNetConfig(depth=18, norm="instance",
                              compute_dtype=jnp.bfloat16)

    def run(X):
        def body(_, xr):
            if fused:
                o = fused_instance_norm(xr, relu=relu)
            else:
                o = resnet._norm({}, xr, "conv1.weight", cfg)
                if relu:
                    o = jax.nn.relu(o)
            return None, jnp.sum(o.astype(jnp.float32))
        _, s = jax.lax.scan(body, None, X)
        return jnp.sum(s)

    def make_x(R):
        return jax.jit(
            lambda k: jax.random.normal(k, (R,) + shape, jnp.bfloat16)
        )(jax.random.PRNGKey(R))

    tag = "pallas" if fused else "xla"
    return fit_time(run, make_x,
                    f"IN{'+relu' if relu else ''} {shape} {tag}", shape[0])


def main():
    print(f"backend: {jax.default_backend()} x{jax.device_count()}", flush=True)

    # -- 3. on-device parity first (fail fast if the kernel is wrong) -------
    from tpumil.models import resnet
    from tpumil.ops.in_pallas import fused_instance_norm

    rng = np.random.default_rng(0)
    cfg32 = resnet.ResNetConfig(depth=18, norm="instance")
    for shape in [(4, 10, 10, 64), (4, 6, 6, 128), (4, 4, 4, 256),
                  (8, 2, 2, 512)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 2 + 1)
        want = np.asarray(resnet._norm({}, x, "conv1.weight", cfg32))
        got = np.asarray(fused_instance_norm(x, relu=False))
        print(f"parity {shape}: maxerr {np.max(np.abs(got - want)):.2e}",
              flush=True)

    # -- 1. per-layer isolation (batch 128, bf16, bench config) -------------
    print("-- per-layer IN cost (two-point scan fit) --", flush=True)
    shapes = [(128, 112, 112, 64), (128, 56, 56, 64), (128, 28, 28, 128),
              (128, 14, 14, 256), (128, 7, 7, 512)]
    totals = {"xla": 0.0, "pallas": 0.0}
    # ResNet18 call multiplicity per shape: stem IN once; layer1 has 4 INs
    # at 56^2x64; layers 2-4: 4 body INs + 1 downsample IN at each size
    mult = [1, 4, 5, 5, 5]
    for shape, m in zip(shapes, mult):
        for fused in (False, True):
            c = norm_point(shape, relu=True, fused=fused)
            totals["pallas" if fused else "xla"] += m * c
    for k, v in totals.items():
        print(f"total network IN chain ({k}): {v / 128 * 1e6:.2f} us/img",
              flush=True)

    # -- 2. full embedder A/B at the bench config ---------------------------
    print("-- full embedder forward (bench harness, bf16 + s2d) --",
          flush=True)
    import bench

    from tpumil.models.embedder import EmbedderConfig

    for fused in (False, True):
        ecfg = EmbedderConfig(backbone="resnet18", norm="instance",
                              num_classes=1, space_to_depth=True,
                              compute_dtype=jnp.bfloat16, precision="default")
        rate = bench._measure_embed_rate(
            _FusedEmbCfg(ecfg, fused), batch=128, scan_len=64, repeats=3)
        print(f"embedder fused_in={fused}: {rate:,.1f} patches/s", flush=True)


class _FusedEmbCfg:
    """EmbedderConfig proxy that flips ResNetConfig.fused_in (EmbedderConfig
    is frozen and has no field for it; the probe only needs .resnet_cfg,
    .num_feats and attribute passthrough for embedder.forward)."""

    def __init__(self, base, fused):
        self._base = base
        self._fused = fused

    def __getattr__(self, name):
        return getattr(self._base, name)

    @property
    def resnet_cfg(self):
        import dataclasses

        return dataclasses.replace(self._base.resnet_cfg, fused_in=self._fused)


if __name__ == "__main__":
    main()
