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


# ---------------------------------------------------------------------------
# Scheme-pluggable trainer: minibatch dp+sp execution (documented deviation)
# ---------------------------------------------------------------------------

import dataclasses as _dataclasses

import numpy as _np

from tpumil.train.trainer import BagTrainer as _BagTrainer


@_dataclasses.dataclass
class DataParallelBagTrainer(_BagTrainer):
    """BagTrainer drop-in that trains each bucket chunk as ONE minibatch
    Adam step sharded over a (data, inst) mesh — bags over the data axis,
    instances over the inst axis, gradients summed by XLA collectives.

    DOCUMENTED DEVIATION from the reference's optimization: the reference
    (and the default BagTrainer / InstanceShardedBagTrainer) takes one Adam
    step PER BAG (train_tcga.py:55-76); this mode averages the dual-stream
    loss over up to ``chunk_size`` bags and steps once — fewer, smoother
    steps (the standard large-batch trade), chosen for throughput when
    scaling out. Select per run via ``WSITrainConfig.data_parallel`` /
    ``cli/train_wsi --data_parallel N``; the experiment fingerprint
    includes it, so --resume never mixes the two dynamics.

    Everything else is inherited: epoch shuffle and RNG consumption,
    bucketing, count-padding (dummy bags are gated out of the loss mean by
    the step's ``real`` row flags), batched eval, pos_weight.
    """

    mesh: object = None

    def __post_init__(self):
        if self.mesh is None:
            raise ValueError(
                "DataParallelBagTrainer requires a (data, inst) mesh "
                "(tpumil.parallel.mesh.make_mesh)")
        if self.dropout_patch > 0.0:
            raise NotImplementedError(
                "the sharded minibatch step has no dropout rng plumbing; "
                "train dropout_patch>0 models on the single-device "
                "BagTrainer")
        super().__post_init__()
        self.fused_threshold = None
        self._fused_eligible = False
        dp, sp = (int(self.mesh.shape["data"]), int(self.mesh.shape["inst"]))
        if sp & (sp - 1) or dp & (dp - 1):
            raise ValueError(f"mesh axes must be powers of two (got "
                             f"data={dp}, inst={sp})")
        self._dp, self._sp = dp, sp
        self.min_bucket = max(self.min_bucket, sp)
        self._dp_step, _ = make_sharded_train_step(
            self.cfg, self.mesh, optimizer=self.optimizer, model=self.model)

    def _train_bucket_any(self, params, opt_state, feats, mask, labels, perm,
                          lr, keys, real, nmax, resident_bytes=None):
        """One minibatch step over the whole bucket chunk. ``perm``/``keys``
        are consumed by the caller to keep the host RNG stream identical to
        the other trainers; the step itself is order-invariant (one mean).
        Returns the SUM of per-real-bag losses (mean * n_real) to keep the
        callers' per-bag averaging contract."""
        real_np = _np.asarray(real)
        b = int(real_np.shape[0])
        pad = (-b) % self._dp
        if pad:  # bag axis must divide the data axis; add gated dummies
            feats = jnp.concatenate(
                [jnp.asarray(feats),
                 jnp.zeros((pad,) + tuple(feats.shape[1:]), feats.dtype)])
            mask = jnp.concatenate(
                [jnp.asarray(mask), jnp.zeros((pad,) + tuple(mask.shape[1:]),
                                              bool)])
            labels = jnp.concatenate(
                [jnp.asarray(labels),
                 jnp.zeros((pad,) + tuple(labels.shape[1:]), labels.dtype)])
            real_np = _np.concatenate([real_np, _np.zeros((pad,), bool)])
        feats, mask, labels = device_put_batch(mesh=self.mesh, feats=feats,
                                               mask=mask, labels=labels)
        real_d = jax.device_put(
            jnp.asarray(real_np),
            NamedSharding(self.mesh, P("data")))
        params, opt_state, loss = self._dp_step(
            params, opt_state, feats, mask, labels, lr, real=real_d,
            pos_weight=self._pw())
        n_real = int(real_np.sum())
        return params, opt_state, loss * n_real

    def train_epochs(self, params, opt_state, store, lrs,
                     rng: "_np.random.Generator"):
        """Sequential epochs (one minibatch dispatch per bucket chunk)."""
        from tpumil.train.trainer import sequential_epochs

        return sequential_epochs(self, params, opt_state, store, lrs, rng)
