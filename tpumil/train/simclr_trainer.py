"""SimCLR pretraining of the patch embedder.

Re-design of simclr/simclr.py:31-160 for TPU:
  * both augmented views are generated ON DEVICE (tpumil.ops.augment) from a
    single host decode — the reference decodes and augments twice per patch
    on host workers;
  * one jitted step = augment two views -> backbone+projection (bf16) ->
    normalize -> NT-Xent -> Adam update;
  * optional data-parallel mesh: the batch shards over the data axis and the
    (2N)^2 similarity matrix is produced by XLA with ICI collectives.

Training recipe kept from the reference: Adam(lr=1e-5, wd=1e-5)
(simclr.py:72 + config.yaml weight_decay '10e-6'), cosine LR with a 10-epoch
constant warmup (simclr.py:77,129-130), 90/10 split (config.yaml
valid_size), best-validation checkpointing in the SimCLR ``.pth`` layout so
compute_feats' surgery consumes the result directly.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.data.patches import PatchBatchLoader
from tpumil.models import simclr
from tpumil.models.simclr import SimCLRConfig
from tpumil.ops.nt_xent import nt_xent_loss
from tpumil.train.optim import adam_torch


@dataclasses.dataclass
class SimCLRTrainConfig:
    batch_size: int = 512            # config.yaml uses 4096; scale per chip
    epochs: int = 100                # config.yaml
    eval_every_n_epochs: int = 1
    lr: float = 1e-5                 # simclr.py:72
    weight_decay: float = 1e-5       # config.yaml '10e-6'
    temperature: float = 0.5         # config.yaml loss.temperature
    use_cosine_similarity: bool = True
    valid_size: float = 0.1
    s: float = 1.0                   # color-jitter strength (config.yaml dataset.s)
    warmup_epochs: int = 10          # scheduler stepped only after epoch 10
    input_size: int = 224
    seed: int = 0
    log_every_n_steps: int = 25
    num_workers: int = 8
    # rematerialize the backbone in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for less activation memory (measured max
    # batch on the 16 GB chip: 1024 at 224^2 bf16 vs 512 without).
    remat: bool = False
    # gradient-cache two-pass step (exact NT-Xent gradients at O(microbatch)
    # activation memory): scan the encoder over microbatches collecting only
    # the projections z, differentiate the loss on the small [2B, out_dim]
    # matrix, then re-forward each microbatch under vjp with its dL/dz
    # cotangent and accumulate parameter grads. InstanceNorm has no
    # cross-sample coupling, so the microbatched gradients are bitwise the
    # monolithic step's (tests/test_simclr.py pins it) — this is what runs
    # the reference's batch_size 4096 (simclr/config.yaml:1) on one chip.
    grad_cache_microbatch: Optional[int] = None
    # ALSO save crash-resume state every N train steps (epoch-end saves
    # always happen). Mid-epoch saves record the in-epoch step and RNG key,
    # so --resume continues the exact uninterrupted trajectory from the last
    # step boundary — optimizer moments, data order, and augmentation keys
    # included (tests/test_simclr.py pins bitwise continuation). None =
    # epoch-granularity only. Not part of the resume fingerprint: the
    # cadence may change between runs of the same experiment.
    save_every_n_steps: Optional[int] = None


class SimCLRTrainer:
    def __init__(self, model_cfg: SimCLRConfig, cfg: SimCLRTrainConfig,
                 mesh=None):
        self.model_cfg = model_cfg
        self.cfg = cfg
        self._mesh_n = int(np.prod(mesh.devices.shape)) if mesh is not None \
            else 1
        if cfg.batch_size % self._mesh_n:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by the "
                f"data-parallel mesh size {self._mesh_n} (sharded batches "
                f"split evenly over devices)")
        self.optimizer = adam_torch(betas=(0.9, 0.999),
                                    weight_decay=cfg.weight_decay)
        self.mesh = mesh

        fwd = simclr.forward
        if cfg.remat:
            fwd = jax.checkpoint(simclr.forward, static_argnums=(2,))

        from tpumil.ops.augment import augment_pair_batch_keyed
        from tpumil.ops.nt_xent import l2_normalize

        # augment in the backbone's compute dtype: the pipeline is pure
        # bandwidth, so bf16 views halve its HBM traffic and the backbone
        # consumes bf16 anyway (f32 when the model runs f32 — parity mode)
        aug_dtype = model_cfg.compute_dtype

        def encode(params, keys1, keys2, images):
            """Per-image-keyed augment -> backbone+projection -> normalize.

            Keyed per image so a microbatch slice of (keys, images) yields
            bitwise the views of the full-batch call (F.normalize parity
            with a 0-safe gradient, simclr.py:53-54)."""
            v1, v2 = augment_pair_batch_keyed(keys1, keys2, images,
                                              cfg.input_size, aug_dtype,
                                              cfg.s)
            _, z1 = fwd(params, v1, model_cfg)
            _, z2 = fwd(params, v2, model_cfg)
            return l2_normalize(z1), l2_normalize(z2)

        def loss_from_z(z1, z2):
            return nt_xent_loss(z1, z2, cfg.temperature,
                                cfg.use_cosine_similarity)

        # the canonical derivation from ops/augment.py: the monolithic and
        # grad-cache steps see exactly augment_pair_batch(key, ...)'s views
        from tpumil.ops.augment import pair_keys as image_keys

        mb = cfg.grad_cache_microbatch
        if mb is not None:
            if cfg.batch_size % mb:
                raise ValueError(
                    f"grad_cache_microbatch {mb} must divide batch_size "
                    f"{cfg.batch_size}")
            if mb % self._mesh_n:
                raise ValueError(
                    f"grad_cache_microbatch {mb} must be divisible by the "
                    f"mesh size {self._mesh_n}")

        def _scan_z(params, keys1, keys2, images, m):
            """Pass 1: encoder over m microbatches, projections only."""
            r = lambda a: a.reshape((m, a.shape[0] // m) + a.shape[1:])
            ks1, ks2, xs = r(keys1), r(keys2), r(images)

            def enc(_, inp):
                return None, encode(params, *inp)

            _, (z1, z2) = jax.lax.scan(enc, None, (ks1, ks2, xs))
            return (z1.reshape(images.shape[0], -1),
                    z2.reshape(images.shape[0], -1), (ks1, ks2, xs))

        def train_step(params, opt_state, key, images, lr):
            keys1, keys2 = image_keys(key, images.shape[0])

            def loss_fn(p):
                return loss_from_z(*encode(p, keys1, keys2, images))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state = self.optimizer.step(params, opt_state,
                                                    grads, lr)
            return params, opt_state, loss

        def gc_train_step(params, opt_state, key, images, lr):
            m = images.shape[0] // mb
            keys1, keys2 = image_keys(key, images.shape[0])
            z1, z2, (ks1, ks2, xs) = _scan_z(params, keys1, keys2, images, m)
            loss, (dz1, dz2) = jax.value_and_grad(
                loss_from_z, argnums=(0, 1))(z1, z2)
            r = lambda a: a.reshape((m, mb) + a.shape[1:])

            def bwd(acc, inp):
                ks1_i, ks2_i, x_i, d1, d2 = inp
                _, vjp = jax.vjp(
                    lambda p: encode(p, ks1_i, ks2_i, x_i), params)
                (g_i,) = vjp((d1, d2))
                return jax.tree.map(jnp.add, acc, g_i), None

            grads, _ = jax.lax.scan(
                bwd, jax.tree.map(jnp.zeros_like, params),
                (ks1, ks2, xs, r(dz1), r(dz2)))
            params, opt_state = self.optimizer.step(params, opt_state,
                                                    grads, lr)
            return params, opt_state, loss

        def eval_step(params, key, images):
            keys1, keys2 = image_keys(key, images.shape[0])
            if mb is not None and images.shape[0] % mb == 0:
                z1, z2, _ = _scan_z(params, keys1, keys2, images,
                                    images.shape[0] // mb)
            else:
                z1, z2 = encode(params, keys1, keys2, images)
            return loss_from_z(z1, z2)

        if mb is not None:
            train_step = gc_train_step

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            img_s = NamedSharding(mesh, P("data", None, None, None))
            rep = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rep, rep, rep, img_s, None),
                out_shardings=(rep, rep, None),
                donate_argnums=(0, 1))
            self._eval_step = jax.jit(eval_step,
                                      in_shardings=(rep, rep, img_s))
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._eval_step = jax.jit(eval_step)

    def _valid_batch_size(self, n_valid: int) -> int:
        """Validation batch size: the largest multiple of the batch unit
        that fits ``n_valid``, capped at batch_size. The unit is the
        grad-cache microbatch when set (so eval_step always takes the
        O(microbatch) scan path — a non-multiple would fall back to a
        monolithic full-batch encode and OOM at exactly the scales
        grad-cache enables), else the mesh size (sharded batches must split
        evenly over devices). 0 = skip validation this epoch."""
        unit = self.cfg.grad_cache_microbatch or self._mesh_n
        return min(self.cfg.batch_size, (n_valid // unit) * unit)

    def lr_at(self, epoch: int) -> float:
        """Constant through the warmup epochs, cosine afterwards
        (simclr.py:77,129-130: scheduler stepped at end of epochs >= 10)."""
        from tpumil.train.optim import cosine_annealing_lr

        c = self.cfg
        if epoch <= c.warmup_epochs:
            return c.lr
        return cosine_annealing_lr(c.lr, c.epochs, 0.0)(epoch - c.warmup_epochs)

    def init(self, key):
        params = simclr.init_params(key, self.model_cfg)
        return params, self.optimizer.init(params)

    def _fingerprint(self) -> str:
        """Experiment identity for --resume (same idea as the WSI fold
        markers): every field that shapes the training trajectory."""
        m, c = self.model_cfg, self.cfg
        return (f"{m.base_model}|{m.out_dim}|{m.compute_dtype}|{m.precision}|"
                f"{c.batch_size}|{c.lr}|{c.weight_decay}|{c.temperature}|"
                f"{c.use_cosine_similarity}|{c.valid_size}|{c.warmup_epochs}|"
                f"{c.input_size}|{c.seed}|{c.s}|{c.epochs}")

    def fit(self, patch_paths: Sequence[str], run_dir: str,
            log: Callable[[str], None] = print,
            fine_tune_from: Optional[str] = None,
            resume: bool = False) -> dict:
        """``resume=True`` continues an interrupted pretraining from the
        orbax train state saved under ``run_dir/state`` every epoch (the
        reference has no resume at all, SURVEY.md section 5): params, Adam
        moments, epoch counter and best-valid restore, and the per-epoch
        RNG streams are derived from (seed, epoch) so the resumed
        trajectory is the uninterrupted one."""
        from tpumil.io import native_ckpt

        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        paths = list(patch_paths)
        indices = rng.permutation(len(paths))
        split = int(np.floor(cfg.valid_size * len(paths)))
        valid_paths = [paths[i] for i in indices[:split]]
        train_paths = [paths[i] for i in indices[split:]]

        params, opt_state = self.init(jax.random.PRNGKey(cfg.seed))
        if fine_tune_from:
            # reference semantics (simclr.py:133-142): the YAML value is a
            # RUN NAME resolved to ./runs/<name>/checkpoints/model.pth; a
            # direct .pth path also works; failure warns, never silently
            # trains from scratch
            cands = [fine_tune_from,
                     os.path.join("runs", fine_tune_from, "checkpoints",
                                  "model.pth")]
            found = next((c for c in cands if os.path.isfile(c)), None)
            if found:
                from tpumil.io import torch_ckpt

                params = simclr.load_state_dict(
                    torch_ckpt.load_state_dict(found), self.model_cfg)
                opt_state = self.optimizer.init(params)
                log("Loaded pre-trained model with success.")
            else:
                log("Pre-trained weights not found. Training from scratch.")

        ckpt_dir = os.path.join(run_dir, "checkpoints")
        state_dir = os.path.join(run_dir, "state")
        os.makedirs(ckpt_dir, exist_ok=True)
        from tpumil.utils.prof import ScalarLogger, ThroughputMeter

        scalars = ScalarLogger(run_dir)  # SummaryWriter role (simclr.py:36)
        meter = ThroughputMeter("patches")
        best_valid = float("inf")
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        start_epoch = 0
        start_batch = 0
        resume_key = None
        history = {"train_loss": [], "valid_loss": []}
        if resume and (os.path.isdir(state_dir)
                       or os.path.isdir(state_dir + ".prev")):
            # sharded-aware restore (io/native_ckpt.py): the state may have
            # been written from a dp mesh of any size; arrays come back
            # replicated over THIS trainer's mesh (or single-device)
            sh = None
            if self.mesh is not None:
                from tpumil.parallel.mesh import replicated

                sh = replicated(self.mesh)
            try:
                st, meta = native_ckpt.load_sharded_train_state(
                    state_dir,
                    {"params": params, "opt_state": opt_state,
                     "key": base_key}, sh)
            except Exception as e:  # unreadable/foreign state: fresh start
                st, meta = None, {"fingerprint": f"<unreadable: {e}>"}
            if st is None:
                # legacy layout (pre-sharded-API releases saved
                # {params, opt_state, epoch, extra} via PyTreeCheckpointer):
                # adopt it rather than silently restarting hours of
                # pretraining; the next epoch-end save rewrites the state in
                # the current format
                try:
                    raw = native_ckpt.load_pytree(
                        state_dir,
                        target={"params": params, "opt_state": opt_state,
                                "epoch": 0,
                                "extra": {"fingerprint": "",
                                          "best_valid": 0.0}})
                    st = {"params": jax.tree.map(jnp.asarray, raw["params"]),
                          "opt_state": jax.tree.map(
                              lambda x: jnp.asarray(x)
                              if hasattr(x, "dtype") else x,
                              raw["opt_state"]),
                          "key": base_key}
                    meta = {"fingerprint": raw["extra"]["fingerprint"],
                            "epoch": int(raw["epoch"]), "step_in_epoch": 0,
                            "best_valid": float(raw["extra"]["best_valid"])}
                    log("Adopting legacy-format train state.")
                except Exception:
                    pass
            if st is not None and \
                    meta.get("fingerprint") == self._fingerprint():
                params, opt_state = st["params"], st["opt_state"]
                start_epoch = int(meta["epoch"])
                start_batch = int(meta.get("step_in_epoch", 0))
                if start_batch:
                    resume_key = st["key"]
                best_valid = float(meta["best_valid"])
                log(f"Resuming SimCLR pretraining at epoch {start_epoch}"
                    + (f" step {start_batch}" if start_batch else "")
                    + f" (best valid {best_valid:.4f}).")
            else:
                log("Existing train state was produced by a different "
                    "config; training from scratch.")
        n_batches_per_epoch = len(train_paths) // cfg.batch_size
        n_iter = start_epoch * n_batches_per_epoch + start_batch

        def save_state(epoch, step_in_epoch, key):
            # crash-resume state via the sharded checkpoint API: restores
            # onto any topology (8-device dp state onto 4 devices or one
            # chip, tests/test_parallel.py)
            native_ckpt.save_sharded_train_state(
                state_dir,
                {"params": params, "opt_state": opt_state, "key": key},
                meta={"fingerprint": self._fingerprint(),
                      "best_valid": float(best_valid),
                      "epoch": int(epoch),
                      "step_in_epoch": int(step_in_epoch),
                      "n_iter": int(n_iter)})

        for epoch in range(start_epoch, cfg.epochs):
            lr = self.lr_at(epoch)
            # per-epoch streams derived from (seed, epoch): a resumed run's
            # epoch E sees exactly the uninterrupted run's shuffle and keys
            key = jax.random.fold_in(base_key, epoch)
            order = np.random.default_rng(
                [cfg.seed, epoch]).permutation(len(train_paths))
            epoch_paths = [train_paths[i] for i in order]
            # drop_last=True like the reference loader (dataset_wrapper.py:73)
            n_batches = len(epoch_paths) // cfg.batch_size
            # mid-epoch resume: skip the already-trained leading batches and
            # take over the key exactly where the saved step left it
            skip = start_batch if epoch == start_epoch else 0
            if resume_key is not None and skip:
                key = jnp.asarray(resume_key)
            step_in_epoch = skip
            loader = PatchBatchLoader(
                epoch_paths[skip * cfg.batch_size:n_batches * cfg.batch_size],
                cfg.batch_size, cfg.input_size, cfg.num_workers)
            t0 = time.perf_counter()
            for images, n_valid, _ in loader:
                key, sub = jax.random.split(key)
                params, opt_state, loss = self._train_step(
                    params, opt_state, sub, jnp.asarray(images),
                    jnp.asarray(lr, jnp.float32))
                meter.add(images.shape[0])
                if n_iter % cfg.log_every_n_steps == 0:
                    log(f"epoch {epoch} iter {n_iter} loss {float(loss):.4f} "
                        f"lr {lr:.2e} {meter}")
                    history["train_loss"].append(float(loss))
                    scalars.log("train_loss", float(loss), n_iter)
                n_iter += 1
                step_in_epoch += 1
                if (cfg.save_every_n_steps
                        and step_in_epoch < n_batches
                        and step_in_epoch % cfg.save_every_n_steps == 0):
                    save_state(epoch, step_in_epoch, key)
            dt = time.perf_counter() - t0
            if n_batches - skip:
                log(f"epoch {epoch}: "
                    f"{(n_batches - skip) * cfg.batch_size / dt:.0f} "
                    f"patches/sec (2 views each)")

            if epoch % cfg.eval_every_n_epochs == 0 and valid_paths:
                # full batches only: zero-padded fake images would dominate
                # NT-Xent and corrupt best-checkpoint selection; see
                # _valid_batch_size for the mesh/microbatch unit discipline
                v_bs = self._valid_batch_size(len(valid_paths))
                if v_bs == 0:
                    # skip ONLY the validation body — the epoch-end scalar
                    # log and crash-resume save below must still run, or
                    # --resume silently restarts from scratch
                    log(f"epoch {epoch}: validation skipped "
                        f"({len(valid_paths)} paths < the validation "
                        f"batch unit)")
                else:
                    v_batches = len(valid_paths) // v_bs
                    v_loader = PatchBatchLoader(
                        valid_paths[:v_batches * v_bs], v_bs,
                        cfg.input_size, cfg.num_workers)
                    losses = []
                    for images, n_valid, _ in v_loader:
                        key, sub = jax.random.split(key)
                        losses.append(float(self._eval_step(
                            params, sub, jnp.asarray(images))))
                    valid_loss = (float(np.mean(losses)) if losses
                                  else float("inf"))
                    history["valid_loss"].append(valid_loss)
                    scalars.log("validation_loss", valid_loss, epoch)
                    if valid_loss < best_valid:
                        best_valid = valid_loss
                        self.save(params, os.path.join(ckpt_dir, "model.pth"))
                        log("saved")
            scalars.log("cosine_lr_decay", lr, n_iter)
            # crash-resume state: params + Adam moments + counters, every
            # epoch (~1-2s of orbax I/O vs minutes-to-hours of pretraining)
            save_state(epoch + 1, 0, key)
        scalars.close()
        ckpt_path = os.path.join(ckpt_dir, "model.pth")
        if not os.path.exists(ckpt_path):
            # no validation split ever ran (tiny datasets): persist the final
            # params so downstream stages always have a checkpoint
            self.save(params, ckpt_path)
            log("saved final params (no validation split)")
        return {"best_valid_loss": best_valid, "history": history,
                "checkpoint": ckpt_path, "params": params}

    def save(self, params, path: str) -> None:
        from tpumil.io import torch_ckpt

        torch_ckpt.save_state_dict(
            simclr.export_state_dict(params, self.model_cfg), path)
