"""Parity tests for the experimental fused Pallas ResNet stem
(tpumil/ops/stem_pallas.py) against the XLA stem it mirrors
(tpumil/models/resnet.py forward stem; reference semantics
compute_feats.py:146-170 — torchvision conv1 + InstanceNorm2d + ReLU +
maxpool). Runs in Pallas interpret mode on the CPU test platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpumil.ops.stem_pallas import fused_stem, xla_stem


@pytest.mark.parametrize("batch", [1, 3])
def test_fused_stem_matches_xla_f32(batch, rng):
    x = jnp.asarray(rng.standard_normal((batch, 224, 224, 3)), jnp.float32)
    w7 = jnp.asarray(0.1 * rng.standard_normal((7, 7, 3, 64)), jnp.float32)
    got = np.asarray(fused_stem(x, w7, compute_dtype=jnp.float32,
                                interpret=True), np.float32)
    want = np.asarray(xla_stem(x, w7, compute_dtype=jnp.float32), np.float32)
    assert got.shape == want.shape == (batch, 56, 56, 64)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_stem_torchvision_weights(rng):
    """Real-ish weight scale (kaiming) + image-range inputs."""
    fan_out = 7 * 7 * 64
    w7 = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * np.sqrt(2.0 / fan_out),
                     jnp.float32)
    x = jnp.asarray(rng.random((2, 224, 224, 3)), jnp.float32)  # [0,1) images
    got = np.asarray(fused_stem(x, w7, compute_dtype=jnp.float32,
                                interpret=True), np.float32)
    want = np.asarray(xla_stem(x, w7, compute_dtype=jnp.float32), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_stem_rejects_wrong_shape(rng):
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    w7 = jnp.zeros((7, 7, 3, 64), jnp.float32)
    with pytest.raises(ValueError):
        fused_stem(x, w7, interpret=True)
