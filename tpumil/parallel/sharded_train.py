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

from jax.sharding import NamedSharding, PartitionSpec as P

from tpumil.models.registry import get_model
from tpumil.models.dsmil import DSMILConfig
from tpumil.ops.losses import dual_stream_loss
from tpumil.parallel.mesh import bag_batch_sharding, replicated
from tpumil.train.optim import Optimizer, adam_torch


def make_sharded_train_step(cfg: DSMILConfig, mesh: Mesh,
                            optimizer: Optional[Optimizer] = None,
                            model: str = "dsmil"):
    """Returns (step, optimizer) where ``step(params, opt_state, feats,
    mask, labels, lr, real=None, pos_weight=None)`` performs one minibatch
    Adam update and returns (params, opt_state, mean_loss).

    ``real`` [B] bool gates count-padding dummy bags out of the objective
    (the CLAUDE.md invariant — a fully-masked dummy bag would otherwise
    contribute BCE(fcc bias, duplicated label) gradients and dilute the
    mean by the pad count); None = every bag is real. ``pos_weight`` [C]
    weights positive targets like BCEWithLogitsLoss(pos_weight); None =
    unweighted. Dropout (passing_v) is not supported on this throughput
    path — use BagTrainer for reference-exact per-bag semantics."""
    if cfg.passing_v and cfg.dropout_v > 0.0:
        raise NotImplementedError(
            "the sharded minibatch step has no dropout rng plumbing; "
            "train passing_v+dropout_v models through BagTrainer")
    mil = get_model(model)
    optimizer = optimizer or adam_torch(betas=(0.5, 0.9), weight_decay=1e-3)
    feats_s, mask_s, labels_s = bag_batch_sharding(mesh)
    real_s = NamedSharding(mesh, P("data"))
    rep = replicated(mesh)

    def loss_fn(params, feats, mask, labels, real, pw):
        c, bag_logits, _, _ = mil.forward(
            params, feats, mask, compute_dtype=cfg.compute_dtype)
        max_logits = mil.max_instance_logits(c, mask)
        losses = jax.vmap(dual_stream_loss, in_axes=(0, 0, 0, None))(
            bag_logits, max_logits, labels, pw)          # [B]
        n_real = jnp.maximum(jnp.sum(real), 1)
        return jnp.sum(jnp.where(real, losses, 0.0)) / n_real

    def step(params, opt_state, feats, mask, labels, lr, real, pw):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, mask,
                                                  labels, real, pw)
        params, opt_state = optimizer.step(params, opt_state, grads, lr)
        return params, opt_state, loss

    jitted = jax.jit(
        step,
        in_shardings=(rep, rep, feats_s, mask_s, labels_s, None, real_s, rep),
        out_shardings=(rep, rep, None),
        donate_argnums=(0, 1),
    )

    def call(params, opt_state, feats, mask, labels, lr, real=None,
             pos_weight=None):
        if real is None:
            real = jax.device_put(jnp.ones((feats.shape[0],), bool), real_s)
        if pos_weight is None:
            pos_weight = jnp.ones((cfg.num_classes,), jnp.float32)
        return jitted(params, opt_state, feats, mask, labels,
                      jnp.asarray(lr, jnp.float32), real, pos_weight)

    return call, optimizer


def device_put_batch(mesh: Mesh, feats, mask, labels):
    """Place a host batch onto the mesh with the canonical shardings."""
    feats_s, mask_s, labels_s = bag_batch_sharding(mesh)
    return (jax.device_put(feats, feats_s), jax.device_put(mask, mask_s),
            jax.device_put(labels, labels_s))
