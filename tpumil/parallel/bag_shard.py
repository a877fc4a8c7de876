"""Instance-sharded (sequence-parallel) DSMIL forward via shard_map.

The reference's implicit "long-context" axis is the bag's instance dimension:
a Camelyon16 bag holds O(10^4-10^5) patch features processed as one unpadded
matmul on one GPU (dsmil.py:52-57; SURVEY.md section 5). To scale beyond one
chip's HBM, the instance axis is sharded over the mesh's ``inst`` axis and
the three cross-instance reductions become explicit ICI collectives:

  1. critical-instance selection: local masked max per class, then an
     all-gather of per-shard (best value, best feature row) candidates and a
     replicated argmax — O(P * C * K) bytes, tiny;
  2. the softmax over N: a two-pass reduction (pmax of logits, psum of
     exponentials) — the one-query-per-class structure makes this far
     simpler than ring attention: there is no KV rotation, only scalars per
     class move across chips;
  3. the bag embedding A^T V: a psum of local [C, K] partial sums.

Everything else (q-MLP, the bag head) is compute-local and replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpumil.models.dsmil import ATTN_DIM, apply_q, apply_v, instance_logits
from tpumil.ops.masked import NEG_INF, _fill, masked_argmax, masked_max


def _local_forward(params, feats, mask, axis: str, compute_dtype):
    """Runs on each shard with feats [n_local, K], mask [n_local]."""
    f = feats.astype(compute_dtype)
    c = instance_logits(params, f, compute_dtype)               # [n_loc, C]

    # -- critical instance: local masked argmax (ops/masked.py — the single
    # source of the padded-row discipline) -> global candidate reduction
    local_best_val = masked_max(c, mask[:, None], axis=0)       # [C]
    local_best_idx = masked_argmax(c, mask[:, None], axis=0)    # [C]
    local_best_feat = f[local_best_idx]                         # [C, K]
    all_vals = jax.lax.all_gather(local_best_val, axis)         # [P, C]
    all_feats = jax.lax.all_gather(local_best_feat, axis)       # [P, C, K]
    winner = jnp.argmax(all_vals, axis=0)                       # [C]
    m_feats = jnp.take_along_axis(
        all_feats, winner[None, :, None], axis=0)[0]            # [C, K]

    q_max = apply_q(params, m_feats, compute_dtype)             # [C, D]
    q = apply_q(params, f, compute_dtype)                       # [n_loc, D]
    v = apply_v(params, f, compute_dtype=compute_dtype)         # [n_loc, K]

    scale = 1.0 / jnp.sqrt(jnp.asarray(ATTN_DIM, compute_dtype))
    # pinned true f32 like the unsharded aggregator (dsmil._PREC) — TPU
    # DEFAULT would feed the MXU bf16 inputs
    a = jnp.matmul(q, q_max.T,
                   precision=jax.lax.Precision.HIGHEST) * scale  # [n_loc, C]
    a = _fill(a, mask[:, None], NEG_INF)

    # -- softmax over the global N: pmax then psum of exponentials
    local_max = jnp.max(a, axis=0)                              # [C]
    global_max = jax.lax.pmax(local_max, axis)
    p = jnp.exp(a - global_max[None, :])
    p = jnp.where(mask[:, None], p, 0.0)
    denom = jax.lax.psum(jnp.sum(p, axis=0), axis)              # [C]

    # -- bag embedding: psum of local partial A^T V
    partial_bemb = jnp.matmul(p.T, v,
                              precision=jax.lax.Precision.HIGHEST)  # [C, K]
    bemb = jax.lax.psum(partial_bemb, axis) \
        / jnp.maximum(denom, jnp.finfo(p.dtype).tiny)[:, None]

    wf = params["fcc"]["w"].astype(compute_dtype)
    bag_logits = jnp.einsum("ck,dck->d", bemb, wf,
                            precision=jax.lax.Precision.HIGHEST) \
        + params["fcc"]["b"].astype(compute_dtype)
    max_ins = jax.lax.pmax(local_best_val, axis)                # [C]
    return bag_logits, max_ins, bemb


def make_instance_sharded_forward(mesh: Mesh, axis: str = "inst",
                                  compute_dtype=jnp.float32):
    """Returns jitted ``fn(params, feats [N, K], mask [N]) ->
    (bag_logits [C], max_instance_logits [C], bag_embedding [C, K])`` with
    the instance axis sharded over ``mesh[axis]`` and everything else
    replicated. N must divide evenly by the axis size."""
    body = partial(_local_forward, axis=axis, compute_dtype=compute_dtype)
    in_specs = (P(), P(axis, None), P(axis))
    out_specs = (P(), P(), P())
    try:  # jax >= 0.9 stable API (check_vma instead of check_rep)
        fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm

        fn = _sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                 check_rep=False)
    return jax.jit(fn)


def shard_bag(mesh: Mesh, feats, mask, axis: str = "inst"):
    """Place one padded bag onto the mesh with the instance axis sharded."""
    return (jax.device_put(feats, NamedSharding(mesh, P(axis, None))),
            jax.device_put(mask, NamedSharding(mesh, P(axis))))
