"""Sharded (multi-chip) batched training step for the DSMIL aggregator.

This is the true-minibatch mode: loss averaged over a batch of bags, one
optimizer step per batch, sharded over a (data, inst) mesh. Params and
optimizer state are replicated; the bag batch is sharded over both mesh axes
(tpumil.parallel.mesh.bag_batch_sharding). XLA/GSPMD inserts the cross-chip
collectives for the instance-axis reductions (masked argmax, softmax over N,
A^T V) and the data-axis gradient sum — the "pick a mesh, annotate shardings,
let XLA insert collectives" recipe.

(The per-bag reference-faithful mode lives in tpumil.train.trainer; this
module is the throughput path and the multi-chip scale-out.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpumil.models.registry import get_model
from tpumil.models.dsmil import DSMILConfig
from tpumil.ops.losses import bce_with_logits
from tpumil.parallel.mesh import bag_batch_sharding, replicated
from tpumil.train.optim import Optimizer, adam_torch


def make_sharded_train_step(cfg: DSMILConfig, mesh: Mesh,
                            optimizer: Optional[Optimizer] = None,
                            model: str = "dsmil"):
    """Returns (jitted_step, optimizer) where
    ``jitted_step(params, opt_state, feats, mask, labels, lr)`` performs one
    minibatch Adam update and returns (params, opt_state, mean_loss)."""
    mil = get_model(model)
    optimizer = optimizer or adam_torch(betas=(0.5, 0.9), weight_decay=1e-3)
    feats_s, mask_s, labels_s = bag_batch_sharding(mesh)
    rep = replicated(mesh)

    def loss_fn(params, feats, mask, labels):
        c, bag_logits, _, _ = mil.forward(
            params, feats, mask, compute_dtype=cfg.compute_dtype)
        max_logits = mil.max_instance_logits(c, mask)
        bag_l = jax.vmap(bce_with_logits)(bag_logits, labels)
        max_l = jax.vmap(bce_with_logits)(max_logits, labels)
        return jnp.mean(0.5 * bag_l + 0.5 * max_l)

    def step(params, opt_state, feats, mask, labels, lr):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, mask, labels)
        params, opt_state = optimizer.step(params, opt_state, grads, lr)
        return params, opt_state, loss

    jitted = jax.jit(
        step,
        in_shardings=(rep, rep, feats_s, mask_s, labels_s, None),
        out_shardings=(rep, rep, None),
        donate_argnums=(0, 1),
    )
    return jitted, optimizer


def device_put_batch(mesh: Mesh, feats, mask, labels):
    """Place a host batch onto the mesh with the canonical shardings."""
    feats_s, mask_s, labels_s = bag_batch_sharding(mesh)
    return (jax.device_put(feats, feats_s), jax.device_put(mask, mask_s),
            jax.device_put(labels, labels_s))
