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
            qmax_ref, out_ref, m_ref, s_ref, acc_ref, *, tile_n: int,
            nonlinear: bool):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    f = feats_ref[:]                                        # [T, K]
    # q-MLP on the tile (dsmil.py:31-33)
    h = jnp.dot(f, w0_ref[:].T, preferred_element_type=jnp.float32) + b0_ref[:]
    if nonlinear:
        h = jnp.maximum(h, 0.0)
        h = jnp.tanh(jnp.dot(h, w2_ref[:].T, preferred_element_type=jnp.float32)
                     + b2_ref[:])
    q = h                                                   # [T, D]
    scale = 1.0 / jnp.sqrt(jnp.float32(ATTN_DIM))
    a = jnp.dot(q, qmax_ref[:].T, preferred_element_type=jnp.float32) * scale
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
        p.astype(f.dtype).T, f, preferred_element_type=jnp.float32)  # [C, K]

    @pl.when(i == n_prog - 1)
    def _finalize():
        out_ref[:] = acc_ref[:] / jnp.maximum(s_ref[:].T, 1e-30)


@functools.partial(jax.jit, static_argnames=("tile_n", "nonlinear", "interpret",
                                              "feats_dtype"))
def fused_attention_pool(feats, q_params, q_max, n_valid, *, tile_n: int = 2048,
                         nonlinear: bool = True, interpret: bool = False,
                         feats_dtype=jnp.float32):
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
        out_specs=pl.BlockSpec((c, k), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),    # running max
            pltpu.VMEM((1, c), jnp.float32),    # running denom
            pltpu.VMEM((c, k), jnp.float32),    # weighted-feature accumulator
        ],
    )
    kernel = functools.partial(_kernel, tile_n=tile_n, nonlinear=nonlinear)
    # bf16 feats halve the HBM traffic of the streaming read; all dots
    # accumulate in f32 (preferred_element_type) so the softmax stays stable.
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, k), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32), feats.astype(feats_dtype),
      w0.astype(feats_dtype), b0.astype(jnp.float32),
      w2.astype(feats_dtype), b2.astype(jnp.float32),
      q_max.astype(feats_dtype))


def fused_bag_forward(params, feats, n_valid, *, tile_n: int = 2048,
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
    bag_logits = jnp.einsum("ck,dck->d", bemb, wf) + params["fcc"]["b"]
    return bag_logits, masked_max(c_logits, mask, axis=0)
