"""Fused attention-pooling kernel parity (interpret mode on CPU; the same
kernel compiles on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.ops.dsmil_pallas import fused_attention_pool, fused_bag_forward


@pytest.mark.parametrize("nonlinear", [True, False])
@pytest.mark.parametrize("n,n_valid", [(256, 256), (512, 300)])
def test_fused_pool_matches_xla(rng, nonlinear, n, n_valid):
    cfg = DSMILConfig(feats_size=128, num_classes=2, nonlinear=nonlinear)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    feats = np.zeros((n, cfg.feats_size), np.float32)
    feats[:n_valid] = rng.standard_normal((n_valid, cfg.feats_size))
    mask = np.arange(n) < n_valid

    # XLA reference path
    c, bag_ref, attn, bemb_ref = dsmil.forward(
        params, jnp.asarray(feats), jnp.asarray(mask))

    crit = np.argmax(np.where(mask[:, None], np.asarray(c), -1e30), axis=0)
    q_max = dsmil.apply_q(params, jnp.asarray(feats[crit]))
    bemb = fused_attention_pool(jnp.asarray(feats), params["q"], q_max,
                                n_valid, tile_n=128, nonlinear=nonlinear,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(bemb), np.asarray(bemb_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_bag_forward_matches_xla(rng):
    cfg = DSMILConfig(feats_size=128, num_classes=1)
    params = dsmil.init_params(jax.random.PRNGKey(1), cfg)
    n, n_valid = 512, 450
    feats = np.zeros((n, cfg.feats_size), np.float32)
    feats[:n_valid] = rng.standard_normal((n_valid, cfg.feats_size))
    mask = np.arange(n) < n_valid

    c, bag_ref, _, _ = dsmil.forward(params, jnp.asarray(feats), jnp.asarray(mask))
    max_ref = dsmil.max_instance_logits(c, jnp.asarray(mask))

    bag_got, max_got = fused_bag_forward(params, jnp.asarray(feats), n_valid,
                                         tile_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(bag_got), np.asarray(bag_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(max_got), np.asarray(max_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_bag_forward_rejects_passing_v(rng):
    """The kernel pools RAW feats as the value stream; a passing_v
    checkpoint (params['v'] non-empty) must be refused, not silently given
    wrong logits."""
    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig

    cfg = DSMILConfig(feats_size=64, num_classes=2, passing_v=True)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    feats = rng.standard_normal((1024, 64)).astype(np.float32)
    with pytest.raises(ValueError, match="passing_v"):
        fused_bag_forward(params, jnp.asarray(feats), 1000, interpret=True)
