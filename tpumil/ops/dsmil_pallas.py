"""Fused DSMIL attention pooling as a Pallas TPU kernel.

The aggregator's bag-embedding chain for one bag (dsmil.py:49-57) is

    Q = q(feats)                       # N x D   (2 matmuls + relu + tanh)
    A = softmax_N(Q @ q_max^T / sqrt(D))
    B = A^T V                          # V = feats when passing_v=False

For a Camelyon16-scale bag (N ~ 10^4-10^5, K = 512) this chain is HBM
bandwidth bound: XLA executes it as separate matmuls, reading ``feats`` from
HBM twice (Q stream and V stream) and materializing Q [N, D] and A [N, C] in
HBM. This kernel streams ``feats`` tile by tile ONCE, computing the q-MLP,
the attention logits, a numerically-stable ONLINE softmax (running max +
rescaled accumulators, flash-attention style), and the weighted feature
accumulation entirely in VMEM. A [N, C] is never materialized.

The critical-instance selection (argmax of the instance logits) happens
before this kernel on the XLA side — it is one cheap ``feats @ Wi^T`` pass
producing an [N, C] array — so the full bag forward costs two reads of
``feats`` instead of XLA's three-plus.

Padded rows are masked via the ``n_valid`` scalar (prefetched to SMEM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpumil.models.dsmil import ATTN_DIM


def _kernel(n_valid_ref, feats_ref, w0_ref, b0_ref, w2_ref, b2_ref,
            qmax_ref, out_ref, m_out_ref, s_out_ref, m_ref, s_ref, acc_ref,
            *, tile_n: int, nonlinear: bool, prec):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = feats_ref[:]                                        # [T, K]
    # q-MLP on the tile (dsmil.py:31-33)
    h = jnp.dot(f, w0_ref[:].T, preferred_element_type=jnp.float32, precision=prec) + b0_ref[:]
    if nonlinear:
        h = jnp.maximum(h, 0.0)
        h = jnp.tanh(jnp.dot(h, w2_ref[:].T, preferred_element_type=jnp.float32, precision=prec)
                     + b2_ref[:])
    q = h                                                   # [T, D]
    scale = 1.0 / jnp.sqrt(jnp.float32(ATTN_DIM))
    a = jnp.dot(q, qmax_ref[:].T, preferred_element_type=jnp.float32, precision=prec) * scale
    # mask padded rows
    row = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    a = jnp.where(row < n_valid_ref[0], a, -1e30)           # [T, C]

    # online softmax accumulation
    m_old = m_ref[:]                                        # [1, C]
    m_new = jnp.maximum(m_old, jnp.max(a, axis=0, keepdims=True))
    corr = jnp.exp(m_old - m_new)                           # [1, C]
    p = jnp.exp(a - m_new)                                  # [T, C]
    m_ref[:] = m_new
    s_ref[:] = s_ref[:] * corr + jnp.sum(p, axis=0, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr.T + jnp.dot(
        p.astype(f.dtype).T, f, preferred_element_type=jnp.float32, precision=prec)  # [C, K]

    @pl.when(i == n_prog - 1)
    def _finalize():
        out_ref[:] = acc_ref[:] / jnp.maximum(s_ref[:].T, 1e-30)
        # softmax statistics: residuals for the streaming backward
        m_out_ref[:] = m_ref[:]
        s_out_ref[:] = s_ref[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "nonlinear", "interpret",
                                              "feats_dtype", "return_stats"))
def fused_attention_pool(feats, q_params, q_max, n_valid, *, tile_n: int = 1024,
                         nonlinear: bool = True, interpret: bool = False,
                         feats_dtype=jnp.float32, return_stats: bool = False):
    """Bag embedding ``B = softmax_N(q(feats) @ q_max^T / sqrt(D))^T feats``.

    Args:
      feats: [N, K] padded bag features (N must be a multiple of tile_n;
        pad with zeros).
      q_params: the DSMIL "q" dict ({w0,b0,w2,b2} or {w,b}).
      q_max: [C, D] critical-instance queries.
      n_valid: scalar int — number of real rows.

    Returns B [C, K] float32.
    """
    n, k = feats.shape
    c = q_max.shape[0]
    assert n % tile_n == 0, f"N={n} must be a multiple of tile_n={tile_n}"
    if nonlinear:
        w0, b0 = q_params["w0"], q_params["b0"]
        w2, b2 = q_params["w2"], q_params["b2"]
    else:
        w0, b0 = q_params["w"], q_params["b"]
        w2 = jnp.zeros((ATTN_DIM, ATTN_DIM), jnp.float32)
        b2 = jnp.zeros((ATTN_DIM,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTN_DIM, k), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTN_DIM,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTN_DIM, ATTN_DIM), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ATTN_DIM,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ATTN_DIM), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((c, k), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),    # running max
            pltpu.VMEM((1, c), jnp.float32),    # running denom
            pltpu.VMEM((c, k), jnp.float32),    # weighted-feature accumulator
        ],
    )
    # Match the XLA aggregator's pinned true-f32 matmuls (dsmil._PREC):
    # Mosaic's DEFAULT dot feeds the MXU bf16 inputs (measured 1.7e-1 maxabs
    # on a 256^2 f32 matmul vs 1.3e-5 pinned), so f32 streams pin HIGHEST.
    # The bf16 stream is the explicit throughput mode: single-pass exact
    # for bf16 operands, precision attr left DEFAULT.
    prec = jax.lax.Precision.HIGHEST if feats_dtype == jnp.float32 else None
    kernel = functools.partial(_kernel, tile_n=tile_n, nonlinear=nonlinear,
                               prec=prec)
    # bf16 feats halve the HBM traffic of the streaming read; all dots
    # accumulate in f32 (preferred_element_type) so the softmax stays stable.
    out, m_stat, s_stat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((c, k), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), feats.astype(feats_dtype),
      w0.astype(feats_dtype), b0.astype(jnp.float32),
      w2.astype(feats_dtype), b2.astype(jnp.float32),
      q_max.astype(feats_dtype))
    if return_stats:
        return out, m_stat, s_stat
    return out


# ---------------------------------------------------------------------------
# Streaming backward (flash-attention style): two recompute passes over the
# feature tiles. Pass 1 reduces s_red[c] = sum_n A[n,c] * dA[n,c]; pass 2
# recomputes activations per tile and emits dF tile-wise plus accumulated
# weight gradients. Residuals are only the softmax stats (m, s) — Q, A, and
# the MLP activations are never materialized in HBM, so training memory is
# O(tile) instead of O(N).
# ---------------------------------------------------------------------------

def _recompute_tile(i, n_valid_ref, f, w0_ref, b0_ref, w2_ref, b2_ref,
                    qmax_ref, m_stat_ref, s_stat_ref, tile_n, nonlinear,
                    prec):
    """Shared recompute: returns (z1, hgate, q, A) for one tile."""
    z1 = jnp.dot(f, w0_ref[:].T, preferred_element_type=jnp.float32, precision=prec) + b0_ref[:]
    if nonlinear:
        hgate = jnp.maximum(z1, 0.0)
        z2 = jnp.dot(hgate, w2_ref[:].T,
                     preferred_element_type=jnp.float32, precision=prec) + b2_ref[:]
        q = jnp.tanh(z2)
    else:
        hgate = z1
        q = z1
    scale = 1.0 / jnp.sqrt(jnp.float32(ATTN_DIM))
    l = jnp.dot(q, qmax_ref[:].T, preferred_element_type=jnp.float32, precision=prec) * scale
    row = i * tile_n + jax.lax.broadcasted_iota(jnp.int32, l.shape, 0)
    l = jnp.where(row < n_valid_ref[0], l, -1e30)
    a = jnp.exp(l - m_stat_ref[:]) / jnp.maximum(s_stat_ref[:], 1e-30)
    a = jnp.where(row < n_valid_ref[0], a, 0.0)
    return z1, hgate, q, a


def _bwd1_kernel(n_valid_ref, feats_ref, w0_ref, b0_ref, w2_ref, b2_ref,
                 qmax_ref, m_stat_ref, s_stat_ref, db_ref, s_red_ref,
                 acc_ref, *, tile_n: int, nonlinear: bool, prec):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = feats_ref[:]
    _, _, _, a = _recompute_tile(i, n_valid_ref, f, w0_ref, b0_ref, w2_ref,
                                 b2_ref, qmax_ref, m_stat_ref, s_stat_ref,
                                 tile_n, nonlinear, prec)
    da = jnp.dot(f, db_ref[:].T, preferred_element_type=jnp.float32, precision=prec)  # [T, C]
    acc_ref[:] = acc_ref[:] + jnp.sum(a * da, axis=0, keepdims=True)

    @pl.when(i == pl.num_programs(0) - 1)
    def _finalize():
        s_red_ref[:] = acc_ref[:]


def _bwd2_kernel(n_valid_ref, feats_ref, w0_ref, b0_ref, w2_ref, b2_ref,
                 qmax_ref, m_stat_ref, s_stat_ref, db_ref, s_red_ref,
                 df_ref, dw0_ref, db0_ref, dw2_ref, db2_ref, dqm_ref,
                 dw0_acc, db0_acc, dw2_acc, db2_acc, dqm_acc,
                 *, tile_n: int, nonlinear: bool, prec):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw0_acc[:] = jnp.zeros_like(dw0_acc)
        db0_acc[:] = jnp.zeros_like(db0_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        db2_acc[:] = jnp.zeros_like(db2_acc)
        dqm_acc[:] = jnp.zeros_like(dqm_acc)

    f = feats_ref[:]
    z1, hgate, q, a = _recompute_tile(i, n_valid_ref, f, w0_ref, b0_ref,
                                      w2_ref, b2_ref, qmax_ref, m_stat_ref,
                                      s_stat_ref, tile_n, nonlinear, prec)
    scale = 1.0 / jnp.sqrt(jnp.float32(ATTN_DIM))
    da = jnp.dot(f, db_ref[:].T, preferred_element_type=jnp.float32, precision=prec)
    dl = a * (da - s_red_ref[:])                              # [T, C]
    dq = jnp.dot(dl, qmax_ref[:], preferred_element_type=jnp.float32, precision=prec) * scale
    dqm_acc[:] = dqm_acc[:] + jnp.dot(
        dl.T, q, preferred_element_type=jnp.float32, precision=prec) * scale  # [C, D]
    if nonlinear:
        dz2 = dq * (1.0 - q * q)
        dw2_acc[:] = dw2_acc[:] + jnp.dot(
            dz2.T, hgate, preferred_element_type=jnp.float32, precision=prec)
        db2_acc[:] = db2_acc[:] + jnp.sum(dz2, axis=0, keepdims=True)
        dh = jnp.dot(dz2, w2_ref[:], preferred_element_type=jnp.float32, precision=prec)
        dz1 = dh * (z1 > 0.0).astype(jnp.float32)
    else:
        dz1 = dq
    dw0_acc[:] = dw0_acc[:] + jnp.dot(
        dz1.T, f, preferred_element_type=jnp.float32, precision=prec)
    db0_acc[:] = db0_acc[:] + jnp.sum(dz1, axis=0, keepdims=True)
    df_ref[:] = (jnp.dot(a, db_ref[:], preferred_element_type=jnp.float32, precision=prec)
                 + jnp.dot(dz1, w0_ref[:], preferred_element_type=jnp.float32, precision=prec))

    @pl.when(i == pl.num_programs(0) - 1)
    def _finalize():
        dw0_ref[:] = dw0_acc[:]
        db0_ref[:] = db0_acc[:]
        dw2_ref[:] = dw2_acc[:]
        db2_ref[:] = db2_acc[:]
        dqm_ref[:] = dqm_acc[:]


def make_trainable_pool(tile_n: int = 512, nonlinear: bool = True,
                        interpret: bool = False):
    """Differentiable fused pooling: returns
    ``pool(feats, w0, b0, w2, b2, q_max, n_valid_arr) -> B [C, K]`` with a
    custom VJP whose backward streams the tiles twice (recompute) instead of
    materializing Q/A — O(tile) training memory for arbitrarily long bags.

    In the linear-q case pass ``w2 = I-like zeros`` and its grads come back
    zero.
    """
    d = ATTN_DIM

    def _run_fwd(feats, w0, b0, w2, b2, q_max, n_valid_arr):
        q_params = {"w0": w0, "b0": b0, "w2": w2, "b2": b2} if nonlinear \
            else {"w": w0, "b": b0}
        return fused_attention_pool(
            feats, q_params, q_max, n_valid_arr[0], tile_n=tile_n,
            nonlinear=nonlinear, interpret=interpret, return_stats=True)

    def _common_in_specs(k, c):
        return [
            pl.BlockSpec((tile_n, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i, *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i, *_: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, k), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ]

    def _run_bwd(feats, w0, b0, w2, b2, q_max, n_valid_arr, m_stat, s_stat, db):
        n, k = feats.shape
        c = q_max.shape[0]
        common_args = (n_valid_arr.astype(jnp.int32), feats.astype(jnp.float32),
                       w0.astype(jnp.float32), b0.astype(jnp.float32),
                       w2.astype(jnp.float32), b2.astype(jnp.float32),
                       q_max.astype(jnp.float32), m_stat, s_stat,
                       db.astype(jnp.float32))
        grid = (n // tile_n,)
        s_red = pl.pallas_call(
            functools.partial(_bwd1_kernel, tile_n=tile_n, nonlinear=nonlinear,
                              prec=jax.lax.Precision.HIGHEST),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=_common_in_specs(k, c),
                out_specs=pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
            ),
            out_shape=jax.ShapeDtypeStruct((1, c), jnp.float32),
            interpret=interpret,
        )(*common_args)

        outs = pl.pallas_call(
            functools.partial(_bwd2_kernel, tile_n=tile_n, nonlinear=nonlinear,
                              prec=jax.lax.Precision.HIGHEST),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=_common_in_specs(k, c) + [
                    pl.BlockSpec((1, c), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=(
                    pl.BlockSpec((tile_n, k), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, k), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, d), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c, d), lambda i, *_: (0, 0),
                                 memory_space=pltpu.VMEM),
                ),
                scratch_shapes=[
                    pltpu.VMEM((d, k), jnp.float32),
                    pltpu.VMEM((1, d), jnp.float32),
                    pltpu.VMEM((d, d), jnp.float32),
                    pltpu.VMEM((1, d), jnp.float32),
                    pltpu.VMEM((c, d), jnp.float32),
                ],
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n, k), jnp.float32),
                jax.ShapeDtypeStruct((d, k), jnp.float32),
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((d, d), jnp.float32),
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((c, d), jnp.float32),
            ),
            interpret=interpret,
        )(*common_args, s_red)
        df, dw0, db0, dw2, db2, dqm = outs
        return df, dw0, db0[0], dw2, db2[0], dqm

    @jax.custom_vjp
    def pool(feats, w0, b0, w2, b2, q_max, n_valid_arr):
        out, _, _ = _run_fwd(feats, w0, b0, w2, b2, q_max, n_valid_arr)
        return out

    def pool_fwd(feats, w0, b0, w2, b2, q_max, n_valid_arr):
        out, m_stat, s_stat = _run_fwd(feats, w0, b0, w2, b2, q_max, n_valid_arr)
        return out, (feats, w0, b0, w2, b2, q_max, n_valid_arr, m_stat, s_stat)

    def pool_bwd(res, db):
        feats, w0, b0, w2, b2, q_max, n_valid_arr, m_stat, s_stat = res
        df, dw0, db0, dw2, db2, dqm = _run_bwd(
            feats, w0, b0, w2, b2, q_max, n_valid_arr, m_stat, s_stat, db)
        dn = np.zeros(n_valid_arr.shape, dtype=jax.dtypes.float0)
        return df, dw0, db0, dw2, db2, dqm, dn

    pool.defvjp(pool_fwd, pool_bwd)
    return pool


def make_fused_bag_train_step(cfg, optimizer, *, tile_n: int = 1024,
                              pos_weight=None, interpret: bool = False):
    """Giant-bag training: one Adam step per bag with the attention pooling
    (forward AND backward) running fused — O(tile) activation memory, so a
    single chip trains on bags far beyond what materializing Q/A allows.

    Returns ``step(params, opt_state, feats [N, K] (N % tile_n == 0),
    n_valid, label, lr) -> (params, opt_state, loss)`` computing the
    reference dual objective (train_tcga.py:68-71). Requires nonlinear q and
    passing_v=False (the reference defaults).
    """
    assert cfg.nonlinear and not cfg.passing_v
    pool = make_trainable_pool(tile_n=tile_n, nonlinear=True,
                               interpret=interpret)
    loss_fn = make_fused_bag_loss(pool)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, feats, n_valid_arr, label, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, n_valid_arr,
                                                  label, pos_weight)
        params, opt_state = optimizer.step(params, opt_state, grads, lr)
        return params, opt_state, loss

    return step


def make_fused_bag_loss(pool):
    """The dual-stream DSMIL loss through a fused trainable pool — the ONE
    definition shared by the production trainer (train/trainer.py
    _fused_fns) and the standalone step above, so a masking/precision fix
    cannot silently diverge the two. ``pool`` comes from
    :func:`make_trainable_pool` (nonlinear q, passing_v=False)."""
    from tpumil.models.dsmil import apply_q, instance_logits
    from tpumil.ops.losses import dual_stream_loss
    from tpumil.ops.masked import masked_argmax, masked_max

    def loss_fn(params, feats, n_valid_arr, label, pos_weight=None):
        n = feats.shape[0]
        mask = jnp.arange(n) < n_valid_arr[0]
        c_logits = instance_logits(params, feats)
        crit = masked_argmax(c_logits, mask, axis=0)
        q_max = apply_q(params, feats[crit])
        q = params["q"]
        bemb = pool(feats, q["w0"], q["b0"], q["w2"], q["b2"], q_max,
                    n_valid_arr)
        bag_logits = jnp.einsum("ck,dck->d", bemb, params["fcc"]["w"],
                                precision=jax.lax.Precision.HIGHEST) \
            + params["fcc"]["b"]
        max_logits = masked_max(c_logits, mask, axis=0)
        return dual_stream_loss(bag_logits, max_logits, label, pos_weight)

    return loss_fn


def fused_bag_forward(params, feats, n_valid, *, tile_n: int = 1024,
                      interpret: bool = False,
                      feats_dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full single-bag DSMIL forward for huge bags using the fused kernel.

    Returns (bag_logits [C], max_instance_logits [C]). The instance-logit
    pass, critical gather, and bag head run in XLA (they are one cheap
    matmul / tiny ops); the bandwidth-heavy attention pooling runs fused.
    Requires passing_v=False (the reference default).
    """
    from tpumil.models.dsmil import apply_q, instance_logits
    from tpumil.ops.masked import masked_argmax, masked_max

    if params.get("v"):
        # the kernel pools raw feats as the value stream; silently ignoring
        # a passing_v checkpoint's v-projection would return wrong logits
        raise ValueError("fused_bag_forward requires passing_v=False "
                         "(params contain a 'v' projection)")
    n = feats.shape[0]
    mask = jnp.arange(n) < n_valid
    c_logits = instance_logits(params, feats)                 # [N, C]
    crit = masked_argmax(c_logits, mask, axis=0)              # [C]
    m_feats = feats[crit]                                     # [C, K]
    q_max = apply_q(params, m_feats)                          # [C, D]
    nonlinear = "w0" in params["q"]
    bemb = fused_attention_pool(feats, params["q"], q_max, n_valid,
                                tile_n=tile_n, nonlinear=nonlinear,
                                interpret=interpret,
                                feats_dtype=feats_dtype)      # [C, K]
    wf = params["fcc"]["w"]
    bag_logits = jnp.einsum("ck,dck->d", bemb, wf,
                            precision=jax.lax.Precision.HIGHEST) + params["fcc"]["b"]
    return bag_logits, masked_max(c_logits, mask, axis=0)
