"""Compiled per-bag trainer for the DSMIL aggregator.

The reference trains with one optimizer step per bag in an eager Python loop,
``torch.load``-ing each bag straight to the GPU per step (train_tcga.py:55-76)
— a host-bound pattern that starves any accelerator. The TPU-native redesign
keeps the *optimization semantics* (one Adam step per bag, shuffled order,
identical loss) but compiles the whole inner loop:

  * bags are padded into bucketed chunks (tpumil.data.bags) so only O(log N)
    program shapes exist;
  * a chunk of bags becomes ONE ``lax.scan`` over per-bag grad+Adam updates —
    zero host round-trips inside the chunk;
  * evaluation runs fully batched (``[B, N, K]`` forward) on device.

A ``batched`` step mode is also provided (true minibatch, averaged loss) for
users who prefer throughput over reference-exact optimization dynamics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.data.bags import Bag, bucketed_chunks, pad_bags
from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.ops.losses import bce_with_logits, dual_stream_loss
from tpumil.train.optim import Optimizer, adam_torch


def patch_dropout_mask(rng, mask, keep_frac: float):
    """Randomly keep ``int(n_valid * keep_frac)`` instances of a bag by
    masking the rest — the static-shape equivalent of the reference's random
    row subsetting (train_tcga.py:78-83; note the reference README calls this
    "duplication" but the code subsamples — we follow the code)."""
    n = mask.shape[-1]
    u = jax.random.uniform(rng, (n,))
    u = jnp.where(mask, u, jnp.inf)
    order = jnp.argsort(u)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    # The kept count must be the reference's exact int(num_rows * p) in
    # float64 (train_tcga.py:79): computing it as floor(f32(n) * f32(p))
    # in-trace differs by one on thousands of (n, p) pairs (f32(2150) *
    # f32(0.94) rounds to 2021.0; float64 gives 2020.99..., int -> 2020).
    # n_valid is traced but bounded by the static bucket length, so the
    # float64 arithmetic happens at trace time as a lookup table.
    k_table = jnp.asarray((np.arange(n + 1, dtype=np.float64)
                           * float(keep_frac)).astype(np.int32))
    k = jnp.take(k_table, jnp.sum(mask).astype(jnp.int32))
    return mask & (rank < k)



def _gated_optimizer_step(optimizer, p, s, loss, grads, lr, real):
    """Apply one optimizer step, gated by ``real`` — THE load-bearing
    count-padding invariant (CLAUDE.md "Adam semantics stay exact"): for a
    dummy bag (real=False) params AND every array leaf of opt_state must
    come out bit-identical, because a plain zero-grad step would still
    apply weight decay and advance Adam's moments/count. Shared by the XLA
    and fused-Pallas per-bag steps so the two paths cannot drift."""
    p2, s2 = optimizer.step(p, s, grads, lr)
    p = jax.tree.map(lambda a, b: jnp.where(real, a, b), p2, p)
    s = jax.tree.map(
        lambda a, b: jnp.where(real, a, b) if hasattr(a, "dtype") else a,
        s2, s)
    return p, s, jnp.where(real, loss, 0.0)



# -- giant-bag memory model (measured by benchmarks/xla_workingset_probe.py
# on the v5e: ballast bisection in fresh subprocesses; docs/PERF.md "Giant
# -bag memory dispatch") ------------------------------------------------------

# Conservative usable-HBM budget on a 16 GiB chip: a training step ran
# alongside >=13 GiB of ballast, so the runtime's usable pool is at least
# ~13 GiB + the step's own working set; budgeting 13 GiB keeps a wide
# safety margin for the params/opt-state and allocator fragmentation.
HBM_BUDGET_BYTES = 13 * 2 ** 30
_HBM_BUDGET_CACHE: list = []  # lazily resolved once per process


def hbm_budget_bytes() -> int:
    """Usable-HBM budget for the "auto" memory dispatch.

    Scales the measured 13/16 usable fraction to the attached device's real
    allocator limit (``memory_stats()['bytes_limit']``) so a smaller-HBM
    chip does not get routed an OOMing XLA step and a larger chip is not
    pushed onto the ~30-40% slower fused path early. Falls back to the
    measured 13 GiB v5e constant when memory_stats is unavailable (CPU,
    older runtimes). Lazy: never triggers backend init by itself — until
    the first dispatch decision JAX is already initialized anyway."""
    if not _HBM_BUDGET_CACHE:
        limit = 0
        try:
            import jax as _jax

            dev = _jax.local_devices()[0]
            if dev.platform == "tpu":  # CPU/virtual devices report the whole
                stats = dev.memory_stats() or {}  # host RAM or nothing
                limit = int(stats.get("bytes_limit", 0))
        except Exception:
            pass
        _HBM_BUDGET_CACHE.append(limit)
    limit = _HBM_BUDGET_CACHE[0]
    # fall through to the module constant at CALL time (not cached) so CPU
    # test runs see monkeypatched values of HBM_BUDGET_BYTES
    return int(limit * (13 / 16)) if limit > 0 else HBM_BUDGET_BYTES
# Upper bound on the XLA per-bag train step's transient working set per
# bucket instance (autodiff residuals + staged true-f32 operand copies),
# measured at K=512 and scaled linearly in K. The probe bounds the true
# slope from above; over-estimating only moves the fused switch earlier
# (a ~30-40% speed cost on the rare giant bucket), never towards an OOM.
XLA_STEP_BYTES_PER_INSTANCE = 40 * 1024  # at feats_size 512


def xla_train_workingset_bytes(nmax: int, feats_size: int = 512) -> int:
    """Estimated peak transient bytes of ONE per-bag XLA train step over a
    bucket padded to ``nmax`` instances."""
    return int(XLA_STEP_BYTES_PER_INSTANCE * (feats_size / 512.0) * nmax)


# Upper bound on the forward-only eval chunk's transient working set per
# CHUNK instance. Unlike the train step (a scan of per-bag grad steps, so
# transients scale with ONE bag's nmax), eval forwards the whole [b, nmax]
# chunk at once — transients scale with b*nmax. Ballast-bisection measured
# (benchmarks/xla_workingset_probe.py eval mode): 524k-instance chunks ran
# alongside 12 GiB ballast, bounding the true slope at <= ~4 KiB/instance;
# shipping a 2x over-bound only splits the bag axis earlier (see
# _eval_chunk_any), never towards an OOM.
XLA_EVAL_BYTES_PER_INSTANCE = 8 * 1024  # at feats_size 512


def xla_eval_workingset_bytes(total_instances: int,
                              feats_size: int = 512) -> int:
    """Estimated peak transient bytes of ONE batched XLA eval forward over
    a chunk of ``total_instances`` = b * nmax padded instances."""
    return int(XLA_EVAL_BYTES_PER_INSTANCE * (feats_size / 512.0)
               * total_instances)


def sequential_epochs(trainer, params, opt_state, store, lrs, rng):
    """len(lrs) epochs for the sharded trainers (per-bag or per-chunk
    dispatches; nothing to fuse). Returns
    (params, opt_state, mean_loss_per_epoch [E]).

    Consumes the host RNG EXACTLY like BagTrainer.train_epochs: for a
    single-bucket store that path bulk-draws [E permutations, then ONE
    integers draw for all epochs' keys], whereas naive per-epoch
    train_epoch calls interleave [perm, integers] and diverge from epoch 2
    — which would break the trajectory compatibility that lets a run
    resume on a different inst_shard count (the WSITrainConfig fingerprint
    deliberately omits inst_shard)."""
    from tpumil.data.device_store import DeviceBagStore

    e = len(lrs)
    if isinstance(store, DeviceBagStore) and len(store.bucket_sizes) == 1:
        nmax = store.bucket_sizes[0]
        feats, mask, labels = store.buckets[nmax]
        b = feats.shape[0]
        pr = [trainer._bucket_perm(store, nmax, rng) for _ in range(e)]
        keys = jax.random.split(
            jax.random.PRNGKey(int(rng.integers(1 << 62))), e * b
        ).reshape(e, b, 2)
        losses = []
        for i, lr in enumerate(lrs):
            perm, real = pr[i]
            params, opt_state, loss = trainer._train_bucket_any(
                params, opt_state, feats, mask, labels, jnp.asarray(perm),
                jnp.asarray(lr, jnp.float32), keys[i], jnp.asarray(real),
                nmax, resident_bytes=store.nbytes())
            losses.append(float(loss))
        return params, opt_state, (np.asarray(losses, np.float64)
                                   / max(store.num_bags, 1))
    losses = []
    for lr in lrs:
        params, opt_state, loss = trainer.train_epoch(
            params, opt_state, store, lr, rng)
        losses.append(loss)
    return params, opt_state, np.asarray(losses, np.float64)


@dataclasses.dataclass
class BagTrainer:
    """Per-bag DSMIL trainer with reference-equivalent optimization.

    Usage:
        trainer = BagTrainer(cfg)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        for epoch in range(E):
            params, opt_state, loss = trainer.train_epoch(
                params, opt_state, bags, lr=schedule(epoch), rng=np_rng)
            scores, losses = trainer.predict(params, bags)
    """

    cfg: DSMILConfig
    optimizer: Optimizer = None
    pos_weight: Optional[np.ndarray] = None
    dropout_patch: float = 0.0
    chunk_size: int = 64
    min_bucket: int = 16
    eval_batch: int = 64
    model: str = "dsmil"  # reference --model dsmil|abmil (train_tcga.py:224-227)
    # Fused-Pallas dispatch for giant buckets. With every dot pinned to
    # true f32 for torch parity, the XLA path's multi-pass matmuls beat the
    # fused kernels on SPEED at every measured N (docs/PERF.md
    # "Fused-kernel dispatch") — the fused path is the MEMORY escape hatch:
    # its footprint is O(tile) versus the XLA step's O(N) residuals.
    #   "auto" (default): per bucket, estimate the XLA step's peak
    #     (resident bucket + xla_train_workingset_bytes) against
    #     HBM_BUDGET_BYTES and route to the fused kernels only when the XLA
    #     path would not fit — a default-config user trains a 262k-instance
    #     Camelyon16-40x bucket without knowing the flag exists.
    #   int N: buckets padded to >= N instances always go fused (override).
    #   None: always XLA.
    # Only the reference configuration is eligible (dsmil, nonlinear q,
    # passing_v=False, no patch dropout, f32 compute).
    fused_threshold: object = "auto"
    # Other HBM residents the caller keeps alive alongside this trainer's
    # dispatches (e.g. a global DeviceBagStore whose fold subsets are being
    # trained) — added to the "auto" estimate so a large co-resident dataset
    # can't push an XLA-routed step into an OOM. The scheme runners set it
    # to the global store's nbytes(); store-based calls already account the
    # store they train on.
    extra_resident_bytes: int = 0
    # 512 rows/tile: the streaming backward's scoped-VMEM stack at true-f32
    # (HIGHEST) dot precision overflows the 16 MB budget at tile 1024
    # (17.7 MB measured) — the multi-pass f32 matmuls stage decomposed
    # operand copies that DEFAULT-precision dots don't need.
    fused_tile: int = 512

    def __post_init__(self):
        from tpumil.models.registry import get_model

        mil = get_model(self.model)
        self._mil = mil
        if self.optimizer is None:
            self.optimizer = adam_torch(betas=(0.5, 0.9), weight_decay=0.0)

        # the v-stream Dropout only exists with passing_v (dsmil.py:34-39);
        # note the reference's --dropout_node flag is itself a no-op upstream
        # because train_tcga.py:237 never sets passing_v
        v_dropout = self.cfg.dropout_v if self.cfg.passing_v else 0.0

        # pos_weight rides in as runtime data (ones == unweighted BCE), so
        # one compiled program serves every CV fold's class balance
        def bag_loss(params, feats, mask, label, key, pw):
            c, bag_logits, _, _ = mil.forward(
                params, feats, mask, compute_dtype=self.cfg.compute_dtype,
                dropout_rng=key if v_dropout > 0.0 else None,
                dropout_v=v_dropout)
            max_logits = mil.max_instance_logits(c, mask)
            return dual_stream_loss(bag_logits, max_logits, label, pw)

        keep_frac = 1.0 - self.dropout_patch

        def _gated_step(p, s, i, key, real, feats, mask, labels, lr, pw):
            """One per-bag step; dummy rows (count-padding, real=False) leave
            params/opt_state untouched — a plain zero-grad step would still
            apply weight decay and advance Adam moments."""
            f = jnp.take(feats, i, axis=0)
            m = jnp.take(mask, i, axis=0)
            y = jnp.take(labels, i, axis=0)
            k_patch, k_v = jax.random.split(key)
            if self.dropout_patch > 0.0:
                m = patch_dropout_mask(k_patch, m, keep_frac)
            loss, grads = jax.value_and_grad(bag_loss)(p, f, m, y, k_v, pw)
            return _gated_optimizer_step(self.optimizer, p, s, loss, grads,
                                         lr, real)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_bucket(params, opt_state, feats, mask, labels, perm, lr,
                         rngs, real, pw):
            """Scan per-bag steps over a device-resident bucket: features
            never leave HBM; only ``perm`` (the epoch shuffle) and ``lr``
            cross the host boundary."""
            def step(carry, xs):
                p, s = carry
                i, key, r = xs
                p, s, loss = _gated_step(p, s, i, key, r, feats, mask, labels,
                                         lr, pw)
                return (p, s), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (perm, rngs, real))
            return params, opt_state, jnp.sum(losses)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_bucket_epochs(params, opt_state, feats, mask, labels, perms,
                                lrs, rngs, real, pw):
            """Multiple epochs over one bucket in a single dispatch: scan over
            epochs of scans over bags. perms [E, B], lrs [E], rngs [E, B, 2],
            real [E, B]. Collapses E x B host dispatches into one — important
            when dispatch latency is high (remote TPU) and for long
            trainings."""
            def epoch(carry, xs):
                p, s = carry
                perm, lr, keys, r_flags = xs

                def step(carry2, xs2):
                    p2, s2 = carry2
                    i, key, r = xs2
                    p2, s2, loss = _gated_step(p2, s2, i, key, r, feats, mask,
                                               labels, lr, pw)
                    return (p2, s2), loss

                (p, s), losses = jax.lax.scan(step, (p, s), (perm, keys, r_flags))
                return (p, s), jnp.sum(losses)

            (params, opt_state), epoch_losses = jax.lax.scan(
                epoch, (params, opt_state), (perms, lrs, rngs, real))
            return params, opt_state, epoch_losses

        @jax.jit
        def eval_chunk(params, feats, mask, labels, rngs, pw):
            if self.dropout_patch > 0.0:
                # the reference applies patch dropout at test time too
                # (train_tcga.py:96) — reproduced, off by default.
                mask = jax.vmap(patch_dropout_mask, in_axes=(0, 0, None))(
                    rngs, mask, keep_frac)
            c, bag_logits, _, _ = mil.forward(
                params, feats, mask, compute_dtype=self.cfg.compute_dtype)
            max_logits = mil.max_instance_logits(c, mask)
            bag_l = jax.vmap(lambda x, y: bce_with_logits(x, y, pw))(bag_logits, labels)
            max_l = jax.vmap(lambda x, y: bce_with_logits(x, y, pw))(max_logits, labels)

            losses = 0.5 * bag_l + 0.5 * max_l
            scores = jax.nn.sigmoid(bag_logits)
            avg_scores = scores + jax.nn.sigmoid(max_logits)
            return losses, scores, avg_scores

        self._train_bucket = train_bucket
        self._train_bucket_epochs = train_bucket_epochs
        self._eval_chunk = eval_chunk

        # fused-kernel dispatch state (see _use_fused)
        self._fused_eligible = (
            self.model == "dsmil" and self.cfg.nonlinear
            and not self.cfg.passing_v and self.dropout_patch == 0.0
            and self.cfg.compute_dtype == jnp.float32
            and self.fused_threshold is not None)
        self._fused_fns_cache: dict = {}
        self.fused_dispatches = 0  # observability + tests
        self.eval_splits = 0  # bag-axis splits taken by the eval auto path

    # -- fused Pallas path for giant bags ------------------------------------

    def _use_fused(self, nmax: int, bucket_bytes: int = 0) -> bool:
        """Dispatch decision per bucket: fused Pallas kernels (O(tile)
        activation memory) vs the XLA chain (faster at true-f32 parity, but
        O(N) residuals). With the default ``fused_threshold="auto"`` the
        XLA path is used whenever its estimated peak fits the HBM budget —
        see the field docstring."""
        if not self._fused_eligible:
            return False
        if nmax % min(self.fused_tile, nmax) != 0:
            return False
        if self.fused_threshold == "auto":
            est = (self.extra_resident_bytes + bucket_bytes
                   + xla_train_workingset_bytes(nmax, self.cfg.feats_size))
            return est > hbm_budget_bytes()
        return nmax >= self.fused_threshold

    def _fused_fns(self, nmax: int):
        """Build (train_bucket, train_bucket_epochs, eval_bucket) over the
        fused attention pooling for one tile size; cached per tile."""
        tile = min(self.fused_tile, nmax)
        if tile in self._fused_fns_cache:
            return self._fused_fns_cache[tile]

        from tpumil.ops.dsmil_pallas import (fused_bag_forward,
                                             make_fused_bag_loss,
                                             make_trainable_pool)

        interpret = jax.default_backend() != "tpu"  # Mosaic needs a TPU
        pool = make_trainable_pool(tile_n=tile, nonlinear=True,
                                   interpret=interpret)
        # bag loss through the fused pool (same math as mil.forward for the
        # eligible configuration; gradient parity pinned in
        # tests/test_pallas_backward.py) — the ONE shared definition
        fused_loss = make_fused_bag_loss(pool)

        def _gated(p, s, i, real, feats, n_valid, labels, lr, pw):
            f = jnp.take(feats, i, axis=0)
            nv = jnp.take(n_valid, i)[None]
            y = jnp.take(labels, i, axis=0)
            loss, grads = jax.value_and_grad(fused_loss)(p, f, nv, y, pw)
            return _gated_optimizer_step(self.optimizer, p, s, loss, grads,
                                         lr, real)

        @partial(jax.jit, donate_argnums=(0, 1))
        def fused_bucket(params, opt_state, feats, mask, labels, perm, lr,
                         real, pw):
            n_valid = jnp.sum(mask, axis=1).astype(jnp.int32)

            def step(carry, xs):
                p, s = carry
                i, r = xs
                p, s, loss = _gated(p, s, i, r, feats, n_valid, labels, lr, pw)
                return (p, s), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (perm, real))
            return params, opt_state, jnp.sum(losses)

        @partial(jax.jit, donate_argnums=(0, 1))
        def fused_bucket_epochs(params, opt_state, feats, mask, labels, perms,
                                lrs, real, pw):
            n_valid = jnp.sum(mask, axis=1).astype(jnp.int32)

            def epoch(carry, xs):
                p, s = carry
                perm, lr, r_flags = xs

                def step(carry2, xs2):
                    p2, s2 = carry2
                    i, r = xs2
                    p2, s2, loss = _gated(p2, s2, i, r, feats, n_valid,
                                          labels, lr, pw)
                    return (p2, s2), loss

                (p, s), losses = jax.lax.scan(step, (p, s), (perm, r_flags))
                return (p, s), jnp.sum(losses)

            (params, opt_state), epoch_losses = jax.lax.scan(
                epoch, (params, opt_state), (perms, lrs, real))
            return params, opt_state, epoch_losses

        @jax.jit
        def fused_eval(params, feats, mask, labels, pw):
            n_valid = jnp.sum(mask, axis=1).astype(jnp.int32)

            def one(args):
                f, nv, y = args
                bag_logits, max_logits = fused_bag_forward(
                    params, f, nv, tile_n=tile, interpret=interpret)
                bag_l = bce_with_logits(bag_logits, y, pw)
                max_l = bce_with_logits(max_logits, y, pw)
                scores = jax.nn.sigmoid(bag_logits)
                return (0.5 * bag_l + 0.5 * max_l, scores,
                        scores + jax.nn.sigmoid(max_logits))

            return jax.lax.map(one, (feats, n_valid, labels))

        self._fused_fns_cache[tile] = (fused_bucket, fused_bucket_epochs,
                                       fused_eval)
        return self._fused_fns_cache[tile]

    def _train_bucket_any(self, params, opt_state, feats, mask, labels, perm,
                          lr, keys, real, nmax, resident_bytes=None):
        """One bucket of per-bag steps through whichever path _use_fused
        picks. Callers always draw ``keys`` so the host PRNG stream does not
        depend on the dispatch decision (the fused path needs none: it is
        only eligible with every dropout off). ``resident_bytes``: total
        device-resident data bytes for the dispatch decision (store paths
        pass the WHOLE store's nbytes — every bucket stays in HBM, not just
        the one being trained); None = just this bucket."""
        if self._use_fused(nmax, feats.nbytes if resident_bytes is None
                           else resident_bytes):
            fused_bucket, _, _ = self._fused_fns(nmax)
            self.fused_dispatches += 1
            return fused_bucket(params, opt_state, feats, mask, labels, perm,
                                lr, real, self._pw())
        return self._train_bucket(params, opt_state, feats, mask, labels,
                                  perm, lr, keys, real, self._pw())

    def _fused_eval_ok(self, nmax: int) -> bool:
        return self._fused_eligible and nmax % min(self.fused_tile, nmax) == 0

    def _eval_chunk_any(self, params, feats, mask, labels, keys, nmax,
                        resident_bytes=None):
        """Batched eval through whichever path fits.

        Eval transients scale with the WHOLE [b, nmax] chunk (one batched
        forward), not per bag like the train scan — so under the "auto"
        memory policy an oversized chunk first SHRINKS its bag axis
        (power-of-two sub-chunks; bags are independent in eval, so this is
        free in math and keeps the faster XLA path) and only falls back to
        the fused O(tile) kernels when even a single bag's forward does not
        fit. Explicit integer/None thresholds keep the plain dispatch."""
        resident = (feats.nbytes if resident_bytes is None
                    else resident_bytes)
        if self.fused_threshold == "auto":
            b = feats.shape[0]
            fs = self.cfg.feats_size

            def fits(sub_b):
                # sub-chunk slices materialize a copy alongside the residents.
                # NOTE: the XLA_*_BYTES_PER_INSTANCE probe constants were
                # calibrated with f32 features; a bf16 store halves the slice
                # bytes here but keeps the (over-bounding) f32 working-set
                # coefficients — conservative in the safe direction.
                itemsize = getattr(feats.dtype, "itemsize", 4)
                slice_bytes = 0 if sub_b == b else sub_b * nmax * fs * itemsize
                est = (self.extra_resident_bytes + resident + slice_bytes
                       + xla_eval_workingset_bytes(sub_b * nmax, fs))
                return est <= hbm_budget_bytes()

            sub = b
            # halve only while divisible: b is a power of two by the
            # _pad_chunk/store padding invariant, but if a caller ever hands
            # a ragged chunk this must not compile a fresh program per
            # distinct tail shape — stop at the last even divisor instead
            while sub > 1 and sub % 2 == 0 and not fits(sub):
                sub //= 2
            if not fits(sub) and self._fused_eval_ok(nmax):
                _, _, fused_eval = self._fused_fns(nmax)
                self.fused_dispatches += 1
                return fused_eval(params, feats, mask, labels, self._pw())
            if sub < b:
                # best effort even when sub=1 does not formally fit but the
                # fused path is ineligible: smallest XLA footprint possible
                self.eval_splits += 1
                outs = [self._eval_chunk(params, feats[i:i + sub],
                                         mask[i:i + sub], labels[i:i + sub],
                                         keys[i:i + sub], self._pw())
                        for i in range(0, b, sub)]
                return tuple(jnp.concatenate(parts)
                             for parts in zip(*outs))
            return self._eval_chunk(params, feats, mask, labels, keys,
                                    self._pw())
        if self._use_fused(nmax, resident):
            _, _, fused_eval = self._fused_fns(nmax)
            self.fused_dispatches += 1
            return fused_eval(params, feats, mask, labels, self._pw())
        return self._eval_chunk(params, feats, mask, labels, keys, self._pw())

    # -- public API ---------------------------------------------------------

    def _pw(self):
        """pos_weight as runtime data; ones == plain BCE."""
        if self.pos_weight is None:
            return jnp.ones((self.cfg.num_classes,), jnp.float32)
        return jnp.asarray(self.pos_weight, jnp.float32)

    def init(self, key):
        params = self._mil.init_params(key, self.cfg)
        return params, self.optimizer.init(params)

    @staticmethod
    def _pad_chunk(feats, mask, labels, b_real):
        """Pad the BAG axis of a list-path chunk to the next power of two —
        the CLAUDE.md static-shape invariant ('per-bucket bag counts pad to
        powers of two'): without it every odd leftover chunk size compiles a
        fresh (b, nmax) program. Dummy rows are all-masked and flagged not
        real (train updates are gated; eval rows past b_real are unread)."""
        b_pad = 1
        while b_pad < b_real:
            b_pad *= 2
        if b_pad == b_real:
            return feats, mask, labels, np.arange(b_real) < b_real
        pad = b_pad - b_real
        feats = np.concatenate(
            [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)])
        mask = np.concatenate([mask, np.zeros((pad,) + mask.shape[1:], bool)])
        labels = np.concatenate(
            [labels, np.zeros((pad,) + labels.shape[1:], labels.dtype)])
        return feats, mask, labels, np.arange(b_pad) < b_real

    def train_epoch(self, params, opt_state, bags, lr: float,
                    rng: np.random.Generator, *, shuffle: bool = True,
                    ) -> Tuple[dict, object, float]:
        """One epoch of per-bag steps. ``shuffle=True`` visits bags in a
        fresh random order (train_tcga.py:57 shuffles every epoch);
        ``shuffle=False`` keeps the given order (train_mil.py:44 iterates
        its one fixed post-split order — the classic-MIL bench semantics).
        Either way the order is grouped into same-padded-length buckets
        (data/bags.bucketed_chunks), a documented static-shape deviation.
        ``bags`` may be a Sequence[Bag] (features shipped per chunk) or a
        DeviceBagStore (features resident in HBM — the fast path).
        Returns (params, opt_state, mean_loss)."""
        from tpumil.data.device_store import DeviceBagStore

        if isinstance(bags, DeviceBagStore):
            return self._train_epoch_store(params, opt_state, bags, lr, rng,
                                           shuffle=shuffle)
        order = rng.permutation(len(bags)) if shuffle \
            else np.arange(len(bags))
        total = 0.0
        lr = jnp.asarray(lr, jnp.float32)
        for idxs, nmax in bucketed_chunks(bags, order, self.chunk_size, self.min_bucket):
            feats, mask, labels = pad_bags([bags[i] for i in idxs], nmax)
            feats, mask, labels, real = self._pad_chunk(feats, mask, labels,
                                                        len(idxs))
            b = feats.shape[0]
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(1 << 62))), b)
            params, opt_state, loss = self._train_bucket_any(
                params, opt_state, jnp.asarray(feats), jnp.asarray(mask),
                jnp.asarray(labels), jnp.arange(b), lr, keys,
                jnp.asarray(real), nmax)
            total += float(loss)
        return params, opt_state, total / max(len(bags), 1)

    @staticmethod
    def _bucket_perm(store, nmax, rng, shuffle: bool = True):
        """(Optionally shuffled) real rows followed by the count-padding
        dummies, with a matching real-flag vector."""
        b_pad = store.buckets[nmax][0].shape[0]
        n_real = store.counts.get(nmax, b_pad)
        perm = np.concatenate([rng.permutation(n_real) if shuffle
                               else np.arange(n_real),
                               np.arange(n_real, b_pad)])
        real = np.arange(b_pad) < n_real
        return perm, real

    def train_epochs(self, params, opt_state, store, lrs,
                     rng: np.random.Generator):
        """Run ``len(lrs)`` epochs over a DeviceBagStore, fusing dispatches
        where that does not change training semantics. Returns
        (params, opt_state, mean_loss_per_epoch [E]).

        With ONE bucket the full E-epoch loop runs in a single dispatch.
        With multiple buckets, fusing E epochs per bucket would train
        bucket-by-bucket (bag size correlates with slide content — a biased
        curriculum), so the loop stays epoch-major: per epoch, one dispatch
        per bucket, matching train_epoch's visitation semantics EXACTLY —
        but all E*num_buckets dispatches are enqueued without a host sync
        (losses stay on device until the end), so on a remote chip the
        per-dispatch tunnel latency overlaps device compute instead of
        serializing with it (docs/PERF.md "Multi-bucket epoch pipelining")."""
        e = len(lrs)
        lrs_j = jnp.asarray(lrs, jnp.float32)
        if len(store.bucket_sizes) == 1:
            nmax = store.bucket_sizes[0]
            feats, mask, labels = store.buckets[nmax]
            b = feats.shape[0]
            pr = [self._bucket_perm(store, nmax, rng) for _ in range(e)]
            perms = jnp.asarray(np.stack([p for p, _ in pr]))
            real = jnp.asarray(np.stack([r for _, r in pr]))
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(1 << 62))), e * b
            ).reshape(e, b, 2)
            if self._use_fused(nmax, store.nbytes()):
                _, fused_epochs, _ = self._fused_fns(nmax)
                self.fused_dispatches += 1
                params, opt_state, losses = fused_epochs(
                    params, opt_state, feats, mask, labels, perms, lrs_j,
                    real, self._pw())
            else:
                params, opt_state, losses = self._train_bucket_epochs(
                    params, opt_state, feats, mask, labels, perms, lrs_j, keys,
                    real, self._pw())
            return params, opt_state, (np.asarray(losses, np.float64)
                                       / max(store.num_bags, 1))
        per_epoch = []
        for lr in lrs:
            params, opt_state, losses = self._train_epoch_store(
                params, opt_state, store, lr, rng, defer_losses=True)
            per_epoch.append(losses)
        # ONE host sync for the whole training run: device scalars fetched
        # together after every dispatch is enqueued
        fetched = jax.device_get(per_epoch)
        totals = np.asarray([float(np.sum(ep)) for ep in fetched],
                            np.float64) / max(store.num_bags, 1)
        return params, opt_state, totals

    def _train_epoch_store(self, params, opt_state, store, lr,
                           rng: np.random.Generator, *,
                           defer_losses: bool = False, shuffle: bool = True):
        """One epoch over a DeviceBagStore. With ``defer_losses`` the
        per-bucket loss sums come back as DEVICE scalars (no host sync —
        dispatches pipeline); otherwise returns the mean loss as a float."""
        lr = jnp.asarray(lr, jnp.float32)
        losses = []
        sizes = list(store.bucket_sizes)
        if shuffle:
            rng.shuffle(sizes)
        for nmax in sizes:
            feats, mask, labels = store.buckets[nmax]
            b = feats.shape[0]
            perm, real = self._bucket_perm(store, nmax, rng, shuffle)
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(1 << 62))), b)
            params, opt_state, loss = self._train_bucket_any(
                params, opt_state, feats, mask, labels, jnp.asarray(perm),
                lr, keys, jnp.asarray(real), nmax,
                resident_bytes=store.nbytes())
            losses.append(loss)
        if defer_losses:
            return params, opt_state, losses
        total = float(np.sum(jax.device_get(losses))) if losses else 0.0
        return params, opt_state, total / max(store.num_bags, 1)

    def predict(self, params, bags, *, average: bool = False,
                rng: Optional[np.random.Generator] = None,
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched inference over bags (order preserved).

        Returns (scores [num_bags, C], losses [num_bags]). With ``average``,
        scores are ``sigmoid(bag) + sigmoid(max_instance)`` exactly as the
        reference's ``--average`` path (train_tcga.py:106-108)."""
        from tpumil.data.device_store import DeviceBagStore

        rng = rng or np.random.default_rng(0)
        if isinstance(bags, DeviceBagStore):
            return self._predict_store(params, bags, average=average, rng=rng)
        scores_out = np.zeros((len(bags), self.cfg.num_classes), np.float32)
        losses_out = np.zeros((len(bags),), np.float32)
        order = list(range(len(bags)))
        for idxs, nmax in bucketed_chunks(bags, order, self.eval_batch, self.min_bucket):
            feats, mask, labels = pad_bags([bags[i] for i in idxs], nmax)
            feats, mask, labels, _ = self._pad_chunk(feats, mask, labels,
                                                     len(idxs))
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(1 << 62))), feats.shape[0])
            losses, scores, avg_scores = self._eval_chunk_any(
                params, jnp.asarray(feats), jnp.asarray(mask),
                jnp.asarray(labels), keys, nmax)
            # ONE device->host transfer per chunk (per-element indexing would
            # issue 2 tiny dispatches per bag through the tunnel)
            chosen = np.asarray(avg_scores if average else scores)
            losses_np = np.asarray(losses)
            scores_out[np.asarray(idxs)] = chosen[:len(idxs)]
            losses_out[np.asarray(idxs)] = losses_np[:len(idxs)]
        return scores_out, losses_out

    def _predict_store(self, params, store, *, average: bool,
                       rng: np.random.Generator):
        scores_out = np.zeros((store.num_bags, self.cfg.num_classes), np.float32)
        losses_out = np.zeros((store.num_bags,), np.float32)
        for nmax in store.bucket_sizes:
            feats, mask, labels = store.buckets[nmax]
            b = feats.shape[0]
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(1 << 62))), b)
            losses, scores, avg_scores = self._eval_chunk_any(
                params, feats, mask, labels, keys, nmax,
                resident_bytes=store.nbytes())
            chosen = np.asarray(avg_scores if average else scores)
            idx = store.index[nmax]
            scores_out[idx] = chosen[:len(idx)]  # dummies sit past the reals
            losses_out[idx] = np.asarray(losses)[:len(idx)]
        return scores_out, losses_out
