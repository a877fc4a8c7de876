"""Gated attention-based MIL (ABMIL) — the reference's optional drop-in
alternative aggregator.

The reference selects it via ``--model abmil`` (train_tcga.py:226-227,
train_mil.py:124-125) but ships no abmil.py (it is gitignored). This is the
standard gated-attention formulation of Ilse et al. 2018, exposed with the
same functional interface as tpumil.models.dsmil so the trainers are
model-agnostic:

  per bag (feats [N, K]):
    instance logits  c = feats @ Wi^T + bi                       [N, C]
    gate             A_n = w^T (tanh(Wv f_n) * sigmoid(Wu f_n))  [N, 1]
    attention        A = softmax_N(A_n)  (broadcast to [N, C])
    bag embedding    B = A^T feats                               [1, K] -> [C, K]
    bag logits       out = B @ Wb^T + bb                         [C]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpumil.models.dsmil import DSMILConfig, _linear
from tpumil.ops.init import orthogonal_torch
from tpumil.ops.masked import masked_max, masked_softmax

# ABMIL's OWN gated-attention hidden width (Ilse et al. 2018 use L=128 for
# the small datasets) — deliberately independent of dsmil.ATTN_DIM (the
# DSMIL query dim), which just happens to share the value; changing one
# must not change the other's checkpoints.
ATTN_DIM = 128


def init_params(key, cfg: DSMILConfig):
    keys = jax.random.split(key, 4)
    k, c = cfg.feats_size, cfg.num_classes
    return {
        "i_fc": {"w": orthogonal_torch(keys[0], (c, k)), "b": jnp.zeros((c,))},
        "att_v": {"w": orthogonal_torch(keys[1], (ATTN_DIM, k)), "b": jnp.zeros((ATTN_DIM,))},
        "att_u": {"w": orthogonal_torch(keys[2], (ATTN_DIM, k)), "b": jnp.zeros((ATTN_DIM,))},
        "att_w": {"w": orthogonal_torch(keys[3], (1, ATTN_DIM)), "b": jnp.zeros((1,))},
        "bag_fc": {"w": orthogonal_torch(jax.random.fold_in(key, 9), (c, k)),
                   "b": jnp.zeros((c,))},
    }


def forward(params, feats, mask=None, *, ins_logits=None, dropout_rng=None,
            dropout_v: float = 0.0, compute_dtype=jnp.float32):
    """Batched gated-attention forward with the (ins_logits, bag_logits, A, B)
    return contract of dsmil.forward. A is [B, N, C] (the single attention
    head broadcast per class, so heatmap code is model-agnostic)."""
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
                      params["i_fc"]["b"].astype(compute_dtype)))
    h_v = jnp.tanh(_linear(f, params["att_v"]["w"].astype(compute_dtype),
                           params["att_v"]["b"].astype(compute_dtype)))
    h_u = jax.nn.sigmoid(_linear(f, params["att_u"]["w"].astype(compute_dtype),
                                 params["att_u"]["b"].astype(compute_dtype)))
    gate = _linear(h_v * h_u, params["att_w"]["w"].astype(compute_dtype),
                   params["att_w"]["b"].astype(compute_dtype))          # [B, N, 1]
    attn1 = masked_softmax(gate, mask, axis=1)                          # [B, N, 1]
    bemb1 = jnp.einsum("bno,bnk->bok", attn1, f,
                       precision=jax.lax.Precision.HIGHEST)             # [B, 1, K]
    bag_logits = (_linear(bemb1[:, 0, :], params["bag_fc"]["w"].astype(compute_dtype),
                          params["bag_fc"]["b"].astype(compute_dtype)))  # [B, C]
    num_classes = c.shape[-1]
    attn = jnp.broadcast_to(attn1, attn1.shape[:2] + (num_classes,))
    bemb = jnp.broadcast_to(bemb1, (bemb1.shape[0], num_classes, bemb1.shape[2]))
    if squeeze:
        return c[0], bag_logits[0], attn[0], bemb[0]
    return c, bag_logits, attn, bemb


def max_instance_logits(ins_logits, mask=None):
    return masked_max(ins_logits, mask, axis=-2)
