"""Max-/mean-pooling MIL baselines.

The DSMIL paper's benchmark tables compare against traditional max-pooling
and mean-pooling MIL, but the reference repo ships no code for them (its
only aggregators are dsmil.py and the absent abmil.py, train_tcga.py:224-227).
These are the standard formulations, exposed through the registry contract
(``init_params`` / ``forward`` / ``max_instance_logits``) so every tpumil
surface — BagTrainer, the eval schemes, heatmaps, serving — works unchanged
via ``--model meanpool|maxpool``:

  per bag (feats [N, K]):
    instance logits  c = feats @ Wi^T + bi          [N, C]
    bag logits       mean_N(c)   (meanpool)         [C]
                     max_N(c)    (maxpool)
    attention A      the implied pooling weights — uniform over real
                     instances (meanpool) or one-hot at the per-class
                     argmax (maxpool) — so heatmap code is model-agnostic
    bag embedding    B = A^T feats                  [C, K]

Both reductions ignore padded rows through ops/masked.py, per the repo's
static-shape discipline. The trainers apply the reference's dual-stream
objective (0.5*BCE(bag) + 0.5*BCE(max-instance)) to every registry model;
for maxpool the two terms coincide, making its loss exactly classic
max-pooling MIL.
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp

from tpumil.models.dsmil import DSMILConfig, _linear
from tpumil.ops.init import orthogonal_torch
from tpumil.ops.masked import masked_argmax, masked_max, masked_mean


def init_params(key, cfg: DSMILConfig):
    k, c = cfg.feats_size, cfg.num_classes
    return {"i_fc": {"w": orthogonal_torch(key, (c, k)), "b": jnp.zeros((c,))}}


def _forward(pool: str, params, feats, mask=None, *, ins_logits=None,
             dropout_rng=None, dropout_v: float = 0.0,
             compute_dtype=jnp.float32):
    """Batched pooling forward with the (ins_logits, bag_logits, A, B)
    return contract of dsmil.forward. ``dropout_rng``/``dropout_v`` are
    accepted for trainer compatibility and ignored (no v-stream here)."""
    squeeze = feats.ndim == 2
    if squeeze:
        feats = feats[None]
        if mask is not None:
            mask = mask[None]
        if ins_logits is not None:
            ins_logits = ins_logits[None]
    f = feats.astype(compute_dtype)
    c = (ins_logits.astype(compute_dtype) if ins_logits is not None
         else _linear(f, params["i_fc"]["w"].astype(compute_dtype),
                      params["i_fc"]["b"].astype(compute_dtype)))  # [B, N, C]
    n = c.shape[1]
    if pool == "mean":
        bag_logits = masked_mean(c, mask, axis=1)                  # [B, C]
        if mask is None:
            attn = jnp.full(c.shape, 1.0 / n, c.dtype)
        else:
            m = mask.astype(c.dtype)[..., None]                    # [B, N, 1]
            attn = jnp.broadcast_to(
                m / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0),
                c.shape)
    else:
        bag_logits = masked_max(c, mask, axis=1)
        idx = masked_argmax(c, mask, axis=1)                       # [B, C]
        attn = jnp.swapaxes(jax.nn.one_hot(idx, n, dtype=c.dtype), 1, 2)
    bemb = jnp.einsum("bnc,bnk->bck", attn, f,
                      precision=jax.lax.Precision.HIGHEST)         # [B, C, K]
    if squeeze:
        return c[0], bag_logits[0], attn[0], bemb[0]
    return c, bag_logits, attn, bemb


def max_instance_logits(ins_logits, mask=None):
    return masked_max(ins_logits, mask, axis=-2)


def _variant(pool: str) -> types.SimpleNamespace:
    return types.SimpleNamespace(
        __name__=f"tpumil.models.poolmil.{pool}pool",
        init_params=init_params,
        forward=functools.partial(_forward, pool),
        max_instance_logits=max_instance_logits,
    )


meanpool = _variant("mean")
maxpool = _variant("max")
