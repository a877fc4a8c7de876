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
    """Runs on each shard with feats [n_local, K], mask [n_local].

    Differentiable w.r.t. ``params``: every cross-shard reduction is either
    a linear collective with a defined transpose (all_gather, psum) or a
    gradient-neutral stabilizer (the softmax max shift, under
    stop_gradient), so ``jax.grad`` through this body reproduces the
    single-device gradients — pinned by
    tests/test_parallel.py::test_instance_sharded_train_step_parity."""
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

    # -- softmax over the global N: max-shift (gradient-neutral, so
    # stop_gradient keeps the backward off pmax's nondifferentiable path)
    # then psum of exponentials
    local_max = jnp.max(a, axis=0)                              # [C]
    # stop_gradient on the INPUT: pmax has no differentiation rule at all,
    # so its operand must carry a symbolic-zero tangent
    global_max = jax.lax.pmax(jax.lax.stop_gradient(local_max), axis)
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
    # max instance logit via the already-gathered candidates: jnp.max routes
    # the loss gradient to the winning shard's row (pmax has no VJP)
    max_ins = jnp.max(all_vals, axis=0)                         # [C]
    return bag_logits, max_ins, bemb


def make_instance_sharded_forward(mesh: Mesh, axis: str = "inst",
                                  compute_dtype=jnp.float32):
    """Returns jitted ``fn(params, feats [N, K], mask [N]) ->
    (bag_logits [C], max_instance_logits [C], bag_embedding [C, K])`` with
    the instance axis sharded over ``mesh[axis]`` and everything else
    replicated. N must divide evenly by the axis size."""
    body = partial(_local_forward, axis=axis, compute_dtype=compute_dtype)
    fn = _shard_map(body, mesh, in_specs=(P(), P(axis, None), P(axis)),
                    out_specs=(P(), P(), P()))
    return jax.jit(fn)


def shard_bag(mesh: Mesh, feats, mask, axis: str = "inst"):
    """Place one padded bag onto the mesh with the instance axis sharded."""
    return (jax.device_put(feats, NamedSharding(mesh, P(axis, None))),
            jax.device_put(mask, NamedSharding(mesh, P(axis))))


def _shard_map(body, mesh, in_specs, out_specs):
    try:  # jax >= 0.9 stable API (check_vma instead of check_rep)
        return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def make_instance_sharded_train_step(mesh: Mesh, optimizer=None,
                                     axis: str = "inst",
                                     compute_dtype=jnp.float32,
                                     weight_decay: float = 1e-3):
    """Reference-faithful per-bag training for a bag LARGER than one chip.

    The reference trains one Adam step per bag, with the whole bag resident
    on one GPU (train_tcga.py:55-76, dsmil.py:52-57). This step keeps those
    optimization semantics exactly while sharding the bag's instance axis
    over ``mesh[axis]``: the forward is the explicit-collective
    :func:`_local_forward` and the backward differentiates straight through
    its all_gather/psum collectives (their transposes are XLA collectives
    too, riding the same ICI links), so gradients — and therefore the Adam
    trajectory — match the single-device step (pinned on the 8-device CPU
    mesh in tests/test_parallel.py).

    Returns ``(step, optimizer)`` where
    ``step(params, opt_state, feats [N, K], mask [N], label [C], lr, pw)
    -> (params, opt_state, loss)``; feats/mask sharded via
    :func:`shard_bag`, params and opt_state replicated. N must divide
    evenly by the axis size (pad + mask, ops/masked.py discipline).

    ``weight_decay`` is used only when ``optimizer`` is None; the default
    1e-3 matches the reference WSI configuration (train_tcga.py:207, same
    L2-in-grad semantics as torch Adam's weight_decay). Pass an explicit
    ``optimizer`` (e.g. from schemes.py configs) to override everything.
    """
    from tpumil.ops.losses import dual_stream_loss
    from tpumil.train.optim import adam_torch

    optimizer = optimizer or adam_torch(betas=(0.5, 0.9),
                                        weight_decay=weight_decay)
    fwd = _shard_map(
        partial(_local_forward, axis=axis, compute_dtype=compute_dtype),
        mesh, in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P(), P()))

    def loss_fn(params, feats, mask, label, pw):
        bag_logits, max_ins, _ = fwd(params, feats, mask)
        return dual_stream_loss(bag_logits, max_ins, label, pw)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, feats, mask, label, lr, pw):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, mask,
                                                  label, pw)
        params, opt_state = optimizer.step(params, opt_state, grads, lr)
        return params, opt_state, loss

    return step, optimizer


def train_bags_sharded(step, mesh: Mesh, params, opt_state, bags, lr, rng,
                       axis: str = "inst", min_bucket: int = 16,
                       pos_weight=None):
    """One epoch of reference-faithful per-bag Adam steps over bags whose
    instance axis shards over ``mesh[axis]`` — the epoch loop around
    :func:`make_instance_sharded_train_step` for datasets of bags larger
    than one chip's HBM.

    Reference semantics preserved (train_tcga.py:55-76): every bag gets its
    own optimizer step, in a freshly shuffled order. Each bag pads to the
    BagTrainer shape family (power-of-two ``>= min_bucket``, always
    divisible by the axis size) so the mesh recompiles once per bucket
    length, not per bag; parameters and Adam state stay replicated while
    only the padded bag itself is ever sharded.

    Args: ``step`` from :func:`make_instance_sharded_train_step` (its mesh
    must be ``mesh``), ``bags`` a sequence of :class:`tpumil.data.bags.Bag`,
    ``rng`` a ``numpy.random.Generator`` for the epoch shuffle.
    Returns ``(params, opt_state, losses [n_bags])`` in step order.
    """
    import numpy as np

    from tpumil.data.bags import bucket_length, pad_bags

    n_shards = mesh.shape[axis]
    min_bucket = max(min_bucket, n_shards)
    c = np.atleast_1d(bags[0].label).shape[0]
    pw = (jnp.ones((c,), jnp.float32) if pos_weight is None
          else jnp.asarray(pos_weight, jnp.float32))
    lr = jnp.asarray(lr, jnp.float32)
    losses = []
    for i in rng.permutation(len(bags)):
        bag = bags[i]
        nmax = bucket_length(bag.num_instances, min_bucket)
        feats, mask, labels = pad_bags([bag], nmax)
        f, m = shard_bag(mesh, feats[0], mask[0], axis)
        params, opt_state, loss = step(params, opt_state, f, m,
                                       jnp.asarray(labels[0]), lr, pw)
        losses.append(loss)
    return params, opt_state, np.asarray([float(l) for l in losses])


# ---------------------------------------------------------------------------
# Scheme-pluggable trainer: BagTrainer semantics, inst-sharded execution
# ---------------------------------------------------------------------------

import dataclasses as _dataclasses

import numpy as _np

from tpumil.train.trainer import BagTrainer as _BagTrainer


@_dataclasses.dataclass
class InstanceShardedBagTrainer(_BagTrainer):
    """Drop-in :class:`~tpumil.train.trainer.BagTrainer` whose per-bag Adam
    steps run with the bag's INSTANCE axis sharded over ``mesh[inst_axis]``
    — the multi-chip WSI-training product path (the reference's loop is
    single-GPU only and simply OOMs past one card, train_tcga.py:55-76).

    Everything the eval schemes (train/schemes.py) touch is inherited
    unchanged: init, the epoch shuffle and bucket visitation order, the host
    RNG consumption, count-padding semantics, batched eval, pos_weight. Only
    the bucket EXECUTOR is overridden: instead of one fused lax.scan of
    gated steps, each real bag is stepped individually through the
    explicit-collective shard_map step (make_instance_sharded_train_step),
    whose gradients match the single-device step to float tolerance
    (tests/test_parallel.py::test_instance_sharded_train_step_parity).
    Scheme-level metric parity vs the single-device BagTrainer is pinned in
    tests/test_wsi_schemes.py::test_run_5fold_cv_inst_sharded_parity.

    Cost model: one dispatch per bag instead of per bucket — the point is
    bags LARGER THAN ONE CHIP (O(10^5)-instance Camelyon16-40x bags), where
    per-bag dispatch latency is noise against the sharded matmuls and the
    alternative is an OOM or the slower fused-Pallas memory path.
    """

    mesh: object = None
    inst_axis: str = "inst"

    def __post_init__(self):
        if self.mesh is None:
            raise ValueError("InstanceShardedBagTrainer requires a mesh "
                             "(e.g. Mesh(jax.devices()[:n], ('inst',)))")
        n = int(self.mesh.shape[self.inst_axis])
        if n & (n - 1):
            raise ValueError(
                f"inst axis size {n} must be a power of two so every "
                f"power-of-two bag bucket divides evenly across it")
        if self.dropout_patch > 0.0:
            raise NotImplementedError(
                "the inst-sharded step has no dropout rng plumbing; train "
                "dropout_patch>0 models on the single-device BagTrainer")
        if self.cfg.passing_v:
            raise NotImplementedError(
                "passing_v is not supported by the inst-sharded forward")
        if self.model != "dsmil":
            raise NotImplementedError(
                f"only model='dsmil' has an inst-sharded forward "
                f"(got {self.model!r})")
        super().__post_init__()
        # never route to the fused-Pallas memory path: sharding IS the
        # memory escape hatch here, and the fused kernels are single-device
        self.fused_threshold = None
        self._fused_eligible = False
        # buckets must divide across the axis (power-of-two family covers
        # any power-of-two axis <= min_bucket automatically)
        self.min_bucket = max(self.min_bucket, n)
        # cfg.compute_dtype must flow through or a bf16 config would
        # silently train f32 here while BagTrainer trains bf16
        self._inst_step, _ = make_instance_sharded_train_step(
            self.mesh, optimizer=self.optimizer, axis=self.inst_axis,
            compute_dtype=self.cfg.compute_dtype)

    def _train_bucket_any(self, params, opt_state, feats, mask, labels, perm,
                          lr, keys, real, nmax, resident_bytes=None):
        """One bucket of per-bag steps, each inst-sharded. Positional
        contract mirrors the scan paths: step k trains bag ``perm[k]`` and
        is gated by ``real[k]`` (count-padding dummies are simply skipped —
        the host-side equivalent of the gated optimizer step, bit-exact for
        Adam). ``keys`` were drawn by the caller to keep the host RNG stream
        identical to the single-device trainer; unused (no dropout here)."""
        if nmax % int(self.mesh.shape[self.inst_axis]):
            raise ValueError(
                f"bucket length {nmax} does not divide across the "
                f"{self.inst_axis} axis ({self.mesh.shape[self.inst_axis]})")
        perm_np = _np.asarray(perm)
        real_np = _np.asarray(real)
        lr = jnp.asarray(lr, jnp.float32)
        pw = self._pw()
        total = jnp.zeros((), jnp.float32)
        for k in range(len(perm_np)):
            if not real_np[k]:
                continue
            i = int(perm_np[k])
            f, m = shard_bag(self.mesh, feats[i], mask[i], self.inst_axis)
            params, opt_state, loss = self._inst_step(
                params, opt_state, f, m, labels[i], lr, pw)
            total = total + loss
        return params, opt_state, total

    def train_epochs(self, params, opt_state, store, lrs,
                     rng: "_np.random.Generator"):
        """Sequential epochs (one dispatch per BAG — nothing to fuse on this
        path); visitation and losses match train_epoch's semantics."""
        from tpumil.train.trainer import sequential_epochs

        return sequential_epochs(self, params, opt_state, store, lrs, rng)
