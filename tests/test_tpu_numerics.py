"""TPU-only numerics pins (skip cleanly on CPU).

The CPU suite cannot see TPU precision semantics: on CPU every matmul
precision tier is bitwise-identical true f32, and Pallas kernels run in
interpret mode. These tests pin the TPU-side claims of docs/PERF.md
"Precision tiers" and the fused-kernel/XLA path agreement — run them with

    TPUMIL_TEST_PLATFORM=axon python -m pytest tests/test_tpu_numerics.py -q

against real hardware. They would have caught the round-2 bug where the
fused Pallas path ran its dots at Mosaic DEFAULT (single-bf16-pass)
precision while the XLA aggregator was pinned to true f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")

pytestmark = pytest.mark.skipif(
    not _on_tpu(), reason="TPU-only numerics (CPU is true f32 at every tier)")


def test_mosaic_default_dot_is_bf16_one_pass():
    """The premise of the precision pinning: inside a Pallas TPU kernel a
    DEFAULT-precision f32 dot feeds the MXU bf16 inputs (O(1e-1) error on a
    256^2 standard-normal matmul), while HIGHEST is true f32. If Mosaic ever
    changes its default, this documents/flags it."""
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    a = rng.standard_normal((256, 256)).astype(np.float32)
    b = rng.standard_normal((256, 256)).astype(np.float32)
    oracle = a.astype(np.float64) @ b.astype(np.float64)

    def run(prec):
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                               preferred_element_type=jnp.float32,
                               precision=prec)
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(a, b)
        return np.abs(np.asarray(out, np.float64) - oracle).max()

    assert run(jax.lax.Precision.HIGHEST) < 1e-3
    assert run(None) > 1e-2  # bf16 single pass


def test_fused_pool_matches_pinned_xla_forward(rng):
    """fused_bag_forward (f32 stream) vs the pinned-HIGHEST XLA
    dsmil.forward on the same giant bag: the two dispatch paths of
    BagTrainer must agree on TPU, not just in CPU interpret mode."""
    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.ops.dsmil_pallas import fused_bag_forward

    cfg = DSMILConfig(feats_size=512, num_classes=2)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    n, n_valid = 4096, 3777
    feats = jnp.asarray(rng.standard_normal((n, 512)).astype(np.float32))
    feats = feats.at[n_valid:].set(0.0)
    mask = jnp.arange(n) < n_valid

    inst_x, bag_x, _, _ = dsmil.forward(params, feats, mask)
    crit_max_x = np.asarray(dsmil.max_instance_logits(inst_x, mask))
    bag_f, max_f = fused_bag_forward(params, feats, n_valid, tile_n=1024)
    np.testing.assert_allclose(np.asarray(bag_f), np.asarray(bag_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(max_f), crit_max_x,
                               rtol=2e-4, atol=2e-4)


def test_extraction_precision_ladder(rng):
    """f32h features sit within 1e-3 of f32x on TPU; DEFAULT-precision f32
    visibly does not (that gap is why the tiers exist)."""
    from tpumil.models import embedder
    from tpumil.models.embedder import EmbedderConfig

    x = (rng.random((8, 96, 96, 3)) * 255).astype(np.uint8)

    def feats(tier):
        cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32,
                             precision=tier)
        params = embedder.init_params(jax.random.PRNGKey(0), cfg)
        return np.asarray(embedder.forward(params, jnp.asarray(x), cfg)[0])

    hi = feats("highest")
    assert np.abs(feats("high") - hi).max() < 1e-3
    assert np.abs(feats("default") - hi).max() > 1e-3


def test_operand_bf16_matches_f32_default(rng):
    """The f32m bandwidth experiment's premise: explicitly casting conv
    operands to bf16 (operand_dtype=bf16, f32 accumulation/activations) is
    numerically the same transform DEFAULT precision applies inside the MXU
    — features must agree with the plain f32-default tier to well under the
    tier's own 1.4e-2 distance from true f32."""
    from tpumil.models import resnet
    from tpumil.models.resnet import ResNetConfig

    base = ResNetConfig(depth=18, norm="instance", compute_dtype=jnp.float32)
    mixed = ResNetConfig(depth=18, norm="instance",
                         compute_dtype=jnp.float32,
                         operand_dtype=jnp.bfloat16)
    params = resnet.init_params(jax.random.PRNGKey(0), base)
    x = jnp.asarray(rng.random((4, 224, 224, 3)).astype(np.float32))
    a = np.asarray(jax.jit(lambda p, x: resnet.forward(p, x, base))(params, x))
    b = np.asarray(jax.jit(lambda p, x: resnet.forward(p, x, mixed))(params, x))
    assert np.max(np.abs(a - b)) < 2e-3, np.max(np.abs(a - b))


def test_high_precision_on_bf16_operands_degrades(rng):
    """The f32h_m trap (docs/PERF.md "why 19-20k IS the f32-parity floor"):
    Precision.HIGH's bf16_3x decomposition has nothing to split once conv
    operands are pre-cast to bf16, so HIGH + operand_dtype=bf16 silently
    degrades to single-pass DEFAULT math. Pin that it lands with DEFAULT
    (tight) and far from true HIGH — anyone "optimizing" the parity tier
    this way must see this test."""
    from tpumil.models import resnet
    from tpumil.models.resnet import ResNetConfig

    kw = dict(depth=18, norm="instance", compute_dtype=jnp.float32)
    cfg_default = ResNetConfig(**kw)
    cfg_high = ResNetConfig(precision="high", **kw)
    cfg_trap = ResNetConfig(precision="high", operand_dtype=jnp.bfloat16,
                            **kw)
    params = resnet.init_params(jax.random.PRNGKey(0), cfg_default)
    x = jnp.asarray(rng.random((4, 224, 224, 3)).astype(np.float32))

    def feats(cfg):
        return np.asarray(
            jax.jit(lambda p, x: resnet.forward(p, x, cfg))(params, x))

    trap, high, default = feats(cfg_trap), feats(cfg_high), feats(cfg_default)
    d_default = np.max(np.abs(trap - default))
    d_high = np.max(np.abs(trap - high))
    assert d_default < 2e-3, d_default   # ≡ DEFAULT-tier math
    assert d_high > 1e-3, d_high         # NOT parity-grade
