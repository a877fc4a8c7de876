"""Gradient parity of the streaming Pallas backward vs XLA autodiff of the
equivalent unfused math (interpret mode on CPU; same kernels compile on
TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.models.dsmil import ATTN_DIM
from tpumil.ops.dsmil_pallas import make_trainable_pool


def xla_pool(feats, w0, b0, w2, b2, q_max, n_valid, nonlinear=True):
    """Unfused oracle of the same math."""
    n = feats.shape[0]
    mask = jnp.arange(n) < n_valid
    z1 = feats @ w0.T + b0
    if nonlinear:
        q = jnp.tanh(jnp.maximum(z1, 0.0) @ w2.T + b2)
    else:
        q = z1
    l = (q @ q_max.T) / jnp.sqrt(jnp.float32(ATTN_DIM))
    l = jnp.where(mask[:, None], l, -1e30)
    a = jax.nn.softmax(l, axis=0)
    a = jnp.where(mask[:, None], a, 0.0)
    return a.T @ feats


@pytest.mark.parametrize("nonlinear", [True, False])
@pytest.mark.parametrize("n,n_valid", [(256, 256), (384, 300)])
def test_streaming_backward_matches_autodiff(rng, nonlinear, n, n_valid):
    k, c, d = 96, 2, ATTN_DIM
    feats = np.zeros((n, k), np.float32)
    feats[:n_valid] = rng.standard_normal((n_valid, k)) * 0.5
    w0 = (rng.standard_normal((d, k)) * 0.1).astype(np.float32)
    b0 = (rng.standard_normal((d,)) * 0.1).astype(np.float32)
    w2 = (rng.standard_normal((d, d)) * 0.1).astype(np.float32)
    b2 = (rng.standard_normal((d,)) * 0.1).astype(np.float32)
    q_max = (rng.standard_normal((c, d)) * 0.5).astype(np.float32)
    cot = rng.standard_normal((c, k)).astype(np.float32)  # random cotangent

    pool = make_trainable_pool(tile_n=128, nonlinear=nonlinear, interpret=True)

    def loss_pallas(feats, w0, b0, w2, b2, q_max):
        out = pool(jnp.asarray(feats), w0, b0, w2, b2, q_max,
                   jnp.asarray([n_valid], jnp.int32))
        return jnp.sum(out * cot)

    def loss_xla(feats, w0, b0, w2, b2, q_max):
        out = xla_pool(feats, w0, b0, w2, b2, q_max, n_valid, nonlinear)
        return jnp.sum(out * cot)

    args = tuple(map(jnp.asarray, (feats, w0, b0, w2, b2, q_max)))
    v_p = float(loss_pallas(*args))
    v_x = float(loss_xla(*args))
    np.testing.assert_allclose(v_p, v_x, rtol=1e-4)

    grads_p = jax.grad(loss_pallas, argnums=tuple(range(6)))(*args)
    grads_x = jax.grad(loss_xla, argnums=tuple(range(6)))(*args)
    names = ["feats", "w0", "b0", "w2", "b2", "q_max"]
    for name, gp, gx in zip(names, grads_p, grads_x):
        if not nonlinear and name in ("w2", "b2"):
            continue  # unused in the linear-q variant
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=5e-3, atol=1e-5,
            err_msg=f"grad mismatch for {name}")


def test_streaming_backward_trains(rng):
    """A few gradient steps through the fused pool reduce a toy loss."""
    k, c, n = 64, 1, 256
    feats = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    target = jnp.asarray(rng.standard_normal((c, k)).astype(np.float32))
    pool = make_trainable_pool(tile_n=128, interpret=True)
    w0 = jnp.asarray(rng.standard_normal((ATTN_DIM, k)).astype(np.float32) * 0.1)
    b0 = jnp.zeros((ATTN_DIM,))
    w2 = jnp.asarray(rng.standard_normal((ATTN_DIM, ATTN_DIM)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((ATTN_DIM,))
    qm = jnp.asarray(rng.standard_normal((c, ATTN_DIM)).astype(np.float32) * 0.1)

    def loss(w0, b0, w2, b2, qm):
        out = pool(feats, w0, b0, w2, b2, qm, jnp.asarray([n], jnp.int32))
        return jnp.mean((out - target) ** 2)

    params = [w0, b0, w2, b2, qm]
    l0 = float(loss(*params))
    for _ in range(20):
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*params)
        params = [p - 0.5 * g for p, g in zip(params, grads)]
    l1 = float(loss(*params))
    assert l1 < l0


def test_fused_bag_train_step(rng):
    """The full dual-objective training step through the fused kernels
    matches the standard BagTrainer step's loss and reduces it."""
    from tpumil.models import dsmil as dsmil_mod
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.ops.dsmil_pallas import make_fused_bag_train_step
    from tpumil.ops.losses import dual_stream_loss
    from tpumil.train.optim import adam_torch

    cfg = DSMILConfig(feats_size=64, num_classes=1)
    params = dsmil_mod.init_params(jax.random.PRNGKey(0), cfg)
    opt = adam_torch(betas=(0.5, 0.9), weight_decay=1e-3)
    opt_state = opt.init(params)
    step = make_fused_bag_train_step(cfg, opt, tile_n=128, interpret=True)

    n, n_valid = 256, 200
    feats = np.zeros((n, 64), np.float32)
    feats[:n_valid] = rng.standard_normal((n_valid, 64))
    feats[:20] += 2.0  # witness signal
    label = jnp.asarray([1.0])
    nv = jnp.asarray([n_valid], jnp.int32)

    # loss of the first step must equal the XLA path's loss on the same bag
    mask = jnp.arange(n) < n_valid
    c, bag_logits, _, _ = dsmil_mod.forward(params, jnp.asarray(feats),
                                            mask)
    want = float(dual_stream_loss(
        bag_logits, dsmil_mod.max_instance_logits(c, mask), label))

    p, s, loss0 = step(params, opt_state, jnp.asarray(feats), nv, label,
                       jnp.asarray(1e-3))
    np.testing.assert_allclose(float(loss0), want, rtol=1e-4)
    for _ in range(15):
        p, s, loss = step(p, s, jnp.asarray(feats), nv, label,
                          jnp.asarray(1e-3))
    assert float(loss) < float(loss0)


def test_trainable_pool_vmaps(rng):
    """Pallas auto-batching: vmap over bags matches per-bag calls for both
    the forward and the streaming backward."""
    from tpumil.ops.dsmil_pallas import make_trainable_pool

    b, n, k, c, d = 3, 256, 64, 1, ATTN_DIM
    pool = make_trainable_pool(tile_n=128, interpret=True)
    feats = jnp.asarray(rng.standard_normal((b, n, k)).astype(np.float32))
    w0 = jnp.asarray(rng.standard_normal((d, k)).astype(np.float32) * 0.1)
    b0 = jnp.zeros((d,))
    w2 = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((d,))
    qm = jnp.asarray(rng.standard_normal((b, c, d)).astype(np.float32))
    nv = jnp.asarray([[200], [256], [100]], jnp.int32)

    vm = jax.vmap(pool, in_axes=(0, None, None, None, None, 0, 0))
    out_v = vm(feats, w0, b0, w2, b2, qm, nv)
    for i in range(b):
        out_i = pool(feats[i], w0, b0, w2, b2, qm[i], nv[i])
        np.testing.assert_allclose(np.asarray(out_v[i]), np.asarray(out_i),
                                   rtol=1e-5, atol=1e-6)

    def loss_v(f):
        return jnp.sum(vm(f, w0, b0, w2, b2, qm, nv) ** 2)

    def loss_1(f):
        return sum(jnp.sum(pool(f[i], w0, b0, w2, b2, qm[i], nv[i]) ** 2)
                   for i in range(b))

    gv = jax.grad(loss_v)(feats)
    g1 = jax.grad(loss_1)(feats)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(g1), rtol=1e-4,
                               atol=1e-6)
