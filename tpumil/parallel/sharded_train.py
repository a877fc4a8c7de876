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
    """BagTrainer drop-in that trains chunks of up to ``chunk_size`` bags
    as ONE minibatch Adam step each, sharded over a (data, inst) mesh —
    bags over the data axis, instances over the inst axis, gradients
    summed by XLA collectives.

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
        """Minibatch steps of up to ``chunk_size`` real bags each, in
        ``perm`` order. ``keys`` are consumed by the caller to keep the
        host RNG stream identical to the other trainers; within one chunk
        the step is order-invariant (one mean). Returns the SUM of
        per-real-bag losses (each chunk's mean * its bag count) to keep the
        callers' per-bag averaging contract.

        Chunking matters: the DeviceBagStore path hands this method the
        WHOLE bucket, and a single step averaging hundreds of bags would be
        ~1 optimizer step per epoch — far from the documented "up to
        chunk_size bags per step" minibatch mode (and from the list path,
        which bucketed_chunks already caps at chunk_size)."""
        perm_np = _np.asarray(perm)
        real_np = _np.asarray(real)
        # real flags are positional (step k trains bag perm[k]); keep only
        # real steps — count-padding dummies contribute nothing here
        idx_real = perm_np[real_np]
        feats = jnp.asarray(feats)
        mask = jnp.asarray(mask)
        labels = jnp.asarray(labels)
        lr = jnp.asarray(lr, jnp.float32)
        pw = self._pw()
        real_sh = NamedSharding(self.mesh, P("data"))
        total = jnp.zeros((), jnp.float32)
        for start in range(0, len(idx_real), self.chunk_size):
            idx = idx_real[start:start + self.chunk_size]
            nb = len(idx)
            pad = (-nb) % self._dp  # bag axis must divide the data axis
            gather = jnp.asarray(
                _np.concatenate([idx, _np.repeat(idx[:1], pad)])
                if pad else idx)
            f, m, l = device_put_batch(
                mesh=self.mesh, feats=feats[gather], mask=mask[gather],
                labels=labels[gather])
            r = jax.device_put(jnp.asarray(_np.arange(nb + pad) < nb),
                               real_sh)
            params, opt_state, loss = self._dp_step(
                params, opt_state, f, m, l, lr, real=r, pos_weight=pw)
            total = total + loss * nb
        return params, opt_state, total

    def train_epochs(self, params, opt_state, store, lrs,
                     rng: "_np.random.Generator"):
        """Sequential epochs (one minibatch dispatch per bucket chunk)."""
        from tpumil.train.trainer import sequential_epochs

        return sequential_epochs(self, params, opt_state, store, lrs, rng)
