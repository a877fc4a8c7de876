"""Evaluation schemes.

Classic-MIL k-fold CV (reference train_mil.py:112-187) and the three WSI
schemes of train_tcga.py (5-fold-cv :252, 5-time-train+valid+test :297,
5-fold-cv-standalone-test :350) over precomputed feature bags.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import numpy as np

from tpumil.data.bags import Bag
from tpumil.data.mil_bench import (
    compute_pos_weight,
    cross_validation_split,
    shuffle_with_class_coverage,
)
from tpumil.models.dsmil import DSMILConfig
from tpumil.train import metrics
from tpumil.train.optim import adam_torch, cosine_annealing_lr
from tpumil.train.trainer import BagTrainer


# ---------------------------------------------------------------------------
# Classic MIL benchmarks (train_mil.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MILBenchConfig:
    num_feats: int
    lr: float = 2e-4                  # train_mil.py:115
    num_epochs: int = 40              # train_mil.py:116
    cv_fold: int = 10                 # train_mil.py:117
    weight_decay: float = 5e-3        # train_mil.py:118
    seed: int = 0
    verbose: bool = True
    model: str = "dsmil"              # train_mil.py:119
    use_device_store: bool = True
    # "orthogonal" (train_tcga.py:229-233 — the framework's single init
    # path) or "torch_default" (what train_mil.py actually trains with:
    # torch Linear/Conv1d defaults). The deviation is bounded on the
    # vendored musk1-format fixture in tests/test_mil_bench.py.
    init: str = "orthogonal"
    # Shard every bag's instance axis over the first N devices (same
    # machinery as WSITrainConfig.inst_shard; single-device trajectory to
    # float tolerance). 0 = single-device.
    inst_shard: int = 0


def run_mil_cv(bags: List[Bag], cfg: MILBenchConfig,
               log: Callable[[str], None] = print,
               model: Optional[str] = None,
               permutation: Optional[Sequence[int]] = None,
               ) -> Tuple[float, float, List[float]]:
    """k-fold CV on a classic MIL dataset. Per fold: fresh model, Adam with
    pos_weight'd BCE, cosine LR to 0, track the best epoch accuracy
    (train_mil.py:164-187). Returns (mean_acc, std_acc, per_fold_accs).

    Note: the reference re-shuffles each bag's instance rows every epoch
    (train_mil.py:46); DSMIL is permutation-invariant over instances so this
    is a mathematical no-op and is omitted here.

    ``permutation`` replaces the internal class-coverage shuffle with an
    explicit bag order (train_mil.py:150-163 semantics: the chunked folds
    are slices of this order). Passing the reference's recorded shuffle —
    which already satisfied its class-coverage retry loop — makes fold
    membership bit-identical to a reference run on the same file
    (tests/test_reference_e2e.py)."""
    if cfg.init not in ("orthogonal", "torch_default"):
        # a typo ("torch-default", "default") must not silently measure
        # orthogonal init under the wrong name
        raise ValueError(f"init must be 'orthogonal' or 'torch_default', "
                         f"got {cfg.init!r}")
    rng = np.random.default_rng(cfg.seed)
    if permutation is not None:
        if sorted(permutation) != list(range(len(bags))):
            raise ValueError("permutation must be a permutation of range(n_bags)")
        bags = [bags[i] for i in permutation]
    else:
        bags = shuffle_with_class_coverage(list(bags), cfg.cv_fold, rng)
    lr_of = cosine_annealing_lr(cfg.lr, cfg.num_epochs, 0.0)
    accs = []
    indices = list(range(len(bags)))
    # one trainer (and one set of compiled programs) for all folds; the
    # fold's pos_weight is runtime data, not a compile-time constant
    model_cfg = DSMILConfig(feats_size=cfg.num_feats, num_classes=1)
    optimizer = adam_torch(betas=(0.5, 0.9), weight_decay=cfg.weight_decay)
    if cfg.inst_shard:
        from jax.sharding import Mesh

        from tpumil.parallel.bag_shard import InstanceShardedBagTrainer
        from tpumil.parallel.mesh import take_devices

        trainer = InstanceShardedBagTrainer(
            model_cfg, optimizer=optimizer, model=model or cfg.model,
            mesh=Mesh(np.asarray(take_devices(cfg.inst_shard)), ("inst",)))
    else:
        trainer = BagTrainer(
            model_cfg,
            optimizer=optimizer,
            model=model or cfg.model,
        )
    # ship the dataset to device once; folds are device-side gathers
    global_store = _global_store(bags, cfg, trainer)
    for k in range(cfg.cv_fold):
        train_bags, test_bags = cross_validation_split(bags, cfg.cv_fold, k)
        trainer.pos_weight = np.asarray([compute_pos_weight(train_bags)],
                                        np.float32)
        # the reference does NOT orthogonal-init in train_mil (default torch
        # init); cfg.init="torch_default" reproduces that path so the
        # deviation of the default single-init policy is measurable. Only
        # dsmil has a torch-default initializer — fail loudly rather than
        # silently fall back to orthogonal and invalidate the measurement.
        if cfg.init == "torch_default" and (model or cfg.model) != "dsmil":
            raise ValueError(
                f"init='torch_default' is only implemented for model='dsmil' "
                f"(got {model or cfg.model!r}); use init='orthogonal'")
        if cfg.init == "torch_default" and (model or cfg.model) == "dsmil":
            from tpumil.models import dsmil as _dsmil

            params = _dsmil.torch_default_init_params(
                jax.random.PRNGKey(cfg.seed + 1000 * k), model_cfg)
            opt_state = trainer.optimizer.init(params)
        else:
            params, opt_state = trainer.init(
                jax.random.PRNGKey(cfg.seed + 1000 * k))
        best_acc = 0.0
        labels = np.asarray([float(b.label[0]) for b in test_bags])
        if global_store is not None:
            tr_idx, te_idx = cross_validation_split(indices, cfg.cv_fold, k)
            train_bags = global_store.subset(tr_idx)
            test_bags = global_store.subset(te_idx)
        for epoch in range(cfg.num_epochs):
            # the reference's epoch_train iterates the ONE fixed post-split
            # bag order every epoch (train_mil.py:44) — unlike train_tcga,
            # which reshuffles per epoch — so the bench trains unshuffled
            # (bucket grouping still interleaves by first appearance, the
            # documented static-shape deviation)
            params, opt_state, train_loss = trainer.train_epoch(
                params, opt_state, train_bags, lr_of(epoch), rng,
                shuffle=False)
            scores, losses = trainer.predict(params, test_bags)
            acc, auc, prec, rec, f1 = metrics.five_scores(labels, scores[:, 0])
            best_acc = max(best_acc, acc)
            if cfg.verbose:
                log(f" fold {k} epoch {epoch + 1}/{cfg.num_epochs} "
                    f"train_loss {train_loss:.4f} test_loss {float(np.mean(losses)):.4f} "
                    f"acc {acc:.4f} auc {auc:.4f} p {prec:.4f} r {rec:.4f} f1 {f1:.4f}")
        log(f" fold {k} optimal accuracy: {best_acc:.4f}")
        accs.append(best_acc)
    mean, std = float(np.mean(accs)), float(np.std(accs))
    log(f"Cross validation accuracy mean: {mean:.4f}, std {std:.4f}")
    return mean, std, accs


# ---------------------------------------------------------------------------
# WSI schemes (train_tcga.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class WSITrainConfig:
    feats_size: int = 512             # train_tcga.py:202
    num_classes: int = 2              # train_tcga.py:201
    lr: float = 1e-4                  # train_tcga.py:203
    num_epochs: int = 50              # train_tcga.py:204
    stop_epochs: int = 10             # train_tcga.py:205
    weight_decay: float = 1e-3        # train_tcga.py:207
    split: float = 0.2                # train_tcga.py:209
    dropout_patch: float = 0.0        # train_tcga.py:211
    dropout_node: float = 0.0         # train_tcga.py:212
    nonlinear: bool = True            # train_tcga.py:213
    average: bool = False             # train_tcga.py:214
    eta_min: float = 5e-6             # train_tcga.py:242
    seed: int = 0
    verbose: bool = True
    model: str = "dsmil"              # train_tcga.py:210
    # Ship each fold's bags to HBM once and train with zero per-step
    # host->device feature traffic (vs the reference's torch.load per step,
    # train_tcga.py:62).
    use_device_store: bool = True
    # Evaluate (and early-stop-check) every N epochs. 1 = reference-exact
    # cadence (train_tcga.py:274-287). Larger values fuse N epochs into one
    # device dispatch per bucket — much faster when dispatch latency is high.
    eval_interval: int = 1
    # Skip folds whose completion marker exists in save_dir (crash recovery;
    # the reference has no resume at all, SURVEY.md section 5).
    resume: bool = False
    # ALSO checkpoint the full in-fold train state (params, Adam moments,
    # best-so-far, host RNG) every N eval boundaries via the sharded
    # checkpoint API (io/native_ckpt.py), so a crash MID-fold resumes at the
    # last boundary instead of retraining the fold — exact continuation,
    # pinned bitwise in tests/test_wsi_schemes.py. None = fold-granularity
    # resume only (markers). Saving needs a save_dir (schemes route the
    # state next to the fold weights); restoring additionally needs
    # resume=True.
    fold_state_every: Optional[int] = None
    # Shard every bag's INSTANCE axis over the first N devices (sequence
    # parallelism, parallel/bag_shard.py) — the multi-chip product path for
    # bags larger than one chip's HBM. 0 = single-device. Deliberately NOT
    # part of the experiment fingerprint: the sharded trainer reproduces the
    # single-device trajectory to float tolerance
    # (tests/test_wsi_schemes.py::test_run_5fold_cv_inst_sharded_parity), so
    # a run may resume on a different shard count.
    inst_shard: int = 0
    # Train each bucket chunk as ONE minibatch Adam step sharded over a
    # (data, inst) mesh of the first N devices — a DOCUMENTED DEVIATION
    # from the reference's per-bag stepping (fewer, smoother steps; the
    # throughput mode; parallel/sharded_train.py). Unlike inst_shard this
    # changes the optimization dynamics, so it IS part of the experiment
    # fingerprint. 0 = off. Mutually exclusive with inst_shard.
    data_parallel: int = 0


def _make_trainer(cfg: WSITrainConfig) -> BagTrainer:
    model_cfg = DSMILConfig(
        feats_size=cfg.feats_size, num_classes=cfg.num_classes,
        nonlinear=cfg.nonlinear, dropout_v=cfg.dropout_node)
    optimizer = adam_torch(betas=(0.5, 0.9), weight_decay=cfg.weight_decay)
    if cfg.inst_shard and cfg.data_parallel:
        raise ValueError("inst_shard and data_parallel are mutually "
                         "exclusive (per-bag vs minibatch optimization)")
    if cfg.inst_shard:
        from jax.sharding import Mesh

        from tpumil.parallel.bag_shard import InstanceShardedBagTrainer
        from tpumil.parallel.mesh import take_devices

        mesh = Mesh(np.asarray(take_devices(cfg.inst_shard)), ("inst",))
        return InstanceShardedBagTrainer(
            model_cfg, optimizer=optimizer, dropout_patch=cfg.dropout_patch,
            model=cfg.model, mesh=mesh)
    if cfg.data_parallel:
        from tpumil.parallel.mesh import make_mesh
        from tpumil.parallel.sharded_train import DataParallelBagTrainer

        return DataParallelBagTrainer(
            model_cfg, optimizer=optimizer, dropout_patch=cfg.dropout_patch,
            model=cfg.model, mesh=make_mesh(cfg.data_parallel))
    return BagTrainer(
        model_cfg,
        optimizer=optimizer,
        dropout_patch=cfg.dropout_patch,
        model=cfg.model,
    )


def evaluate_bags(trainer: BagTrainer, params, bags,
                  cfg: WSITrainConfig, thresholds: Optional[List[float]] = None,
                  rng: Optional[np.random.Generator] = None):
    """The reference's ``test()`` (train_tcga.py:85-132): scores, AUCs,
    optimal (or provided) thresholds, binarised predictions, exact-match
    accuracy. ``bags`` may be a Sequence[Bag] or DeviceBagStore."""
    from tpumil.data.device_store import DeviceBagStore

    if isinstance(bags, DeviceBagStore):
        labels = bags.labels
    else:
        labels = np.stack([np.atleast_1d(b.label) for b in bags])
    scores, losses = trainer.predict(params, bags, average=cfg.average, rng=rng)
    aucs, _, thresholds_optimal = metrics.multi_label_roc(
        labels, scores, cfg.num_classes)
    if thresholds is not None:
        thresholds_optimal = list(thresholds)
    preds = metrics.binarize(
        scores if cfg.num_classes > 1 else scores[:, 0], thresholds_optimal)
    avg_score = metrics.exact_match_score(
        labels if cfg.num_classes > 1 else labels[:, 0], preds)
    return {
        "loss": float(np.mean(losses)),
        "avg_score": avg_score,
        "aucs": aucs,
        "thresholds_optimal": [float(t) for t in thresholds_optimal],
        "predictions": preds,
        "labels": labels if cfg.num_classes > 1 else labels[:, 0],
        "scores": scores,
    }


def _kfold_indices(n: int, n_splits: int, seed: int = 42):
    """KFold(shuffle=True, random_state=42) splits (train_tcga.py:255)."""
    from sklearn.model_selection import KFold

    kf = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    return list(kf.split(np.arange(n)))


def train_fold(trainer: BagTrainer, train_bags: Sequence[Bag],
               test_bags: Sequence[Bag], cfg: WSITrainConfig,
               rng: np.random.Generator, init_key,
               log: Callable[[str], None] = print,
               save_cb: Optional[Callable] = None,
               state_dir: Optional[str] = None,
               state_fp: Optional[str] = None):
    """One fold: train with early stopping on the reference's selection
    criterion ``(sum(aucs) + acc) / 2`` (train_tcga.py:272-287). Returns
    (best_params, best_thresholds, best_acc, best_aucs).

    ``state_dir`` (with ``cfg.fold_state_every``) enables MID-fold crash
    resume: the full train state — params, Adam moments, best-so-far, the
    host RNG bit-generator state — is checkpointed every N eval boundaries
    (sharded API, io/native_ckpt.py) and restored at fold start when
    ``cfg.resume``; the continuation is the exact uninterrupted trajectory.
    ``state_fp`` guards against adopting a different experiment's state."""
    from tpumil.data.device_store import DeviceBagStore

    if cfg.use_device_store:
        if not isinstance(train_bags, DeviceBagStore):
            train_bags = DeviceBagStore(
                train_bags, min_bucket=_required_min_bucket(cfg))
        if not isinstance(test_bags, DeviceBagStore):
            test_bags = DeviceBagStore(
                test_bags, min_bucket=_required_min_bucket(cfg))
    params, opt_state = trainer.init(init_key)
    lr_of = cosine_annealing_lr(cfg.lr, cfg.num_epochs, cfg.eta_min)
    # Seed with valid defaults so a fold that never clears score 0 (possible
    # on tiny/degenerate splits) still exports usable weights/thresholds; the
    # reference would carry best_auc=0 scalars in the same situation
    # (train_tcga.py:269).
    best = {"score": 0.0, "params": jax.tree.map(np.asarray, params),
            "thresholds": [0.5] * cfg.num_classes, "acc": 0.0,
            "aucs": [0.0] * cfg.num_classes}
    counter = 0
    epoch = 1
    boundaries = 0
    if state_dir and cfg.resume and (os.path.isdir(state_dir)
                                     or os.path.isdir(state_dir + ".prev")):
        from tpumil.io import native_ckpt

        try:
            st, meta = native_ckpt.load_sharded_train_state(
                state_dir, {"params": params, "opt_state": opt_state,
                            "best_params": params})
        except Exception as e:  # unreadable/foreign state: fresh fold
            st, meta = None, {"fingerprint": f"<unreadable: {e}>"}
        if st is not None and meta.get("fingerprint") == state_fp:
            params, opt_state = st["params"], st["opt_state"]
            best = {"score": float(meta["best_score"]),
                    "params": jax.tree.map(np.asarray, st["best_params"]),
                    "thresholds": list(meta["best_thresholds"]),
                    "acc": float(meta["best_acc"]),
                    "aucs": list(meta["best_aucs"])}
            counter = int(meta["counter"])
            epoch = int(meta["epoch"])
            boundaries = int(meta["boundaries"])
            rng.bit_generator.state = meta["rng_state"]
            log(f"Resuming fold mid-run at epoch {epoch} "
                f"(best score {best['score']:.4f}).")
        else:
            log("Existing fold state was produced by a different config; "
                "training the fold from scratch.")
    fused = cfg.eval_interval > 1 and isinstance(train_bags, DeviceBagStore)
    while epoch <= cfg.num_epochs:
        k = min(cfg.eval_interval, cfg.num_epochs - epoch + 1) if fused else 1
        counter += k
        if fused:
            lrs = [lr_of(e - 1) for e in range(epoch, epoch + k)]
            params, opt_state, losses = trainer.train_epochs(
                params, opt_state, train_bags, lrs, rng)
            train_loss = float(losses[-1])
        else:
            params, opt_state, train_loss = trainer.train_epoch(
                params, opt_state, train_bags, lr_of(epoch - 1), rng)
        epoch += k
        res = evaluate_bags(trainer, params, test_bags, cfg, rng=rng)
        if cfg.verbose:
            auc_str = "|".join(f"class-{i}>>{a:.4f}" for i, a in enumerate(res["aucs"]))
            log(f" epoch {epoch - 1}/{cfg.num_epochs} train loss: {train_loss:.4f} "
                f"test loss: {res['loss']:.4f} avg score: {res['avg_score']:.4f} "
                f"AUC: {auc_str}")
        score = metrics.current_score(res["avg_score"], res["aucs"])
        if score > best["score"]:
            counter = 0
            best = {"score": score, "params": jax.tree.map(np.asarray, params),
                    "thresholds": res["thresholds_optimal"],
                    "acc": res["avg_score"], "aucs": res["aucs"]}
            if save_cb is not None:
                save_cb(best["params"], best["thresholds"])
        boundaries += 1
        if (state_dir and cfg.fold_state_every
                and boundaries % cfg.fold_state_every == 0
                and epoch <= cfg.num_epochs and counter <= cfg.stop_epochs):
            from tpumil.io import native_ckpt

            native_ckpt.save_sharded_train_state(
                state_dir,
                {"params": params, "opt_state": opt_state,
                 "best_params": best["params"]},
                meta={"fingerprint": state_fp,
                      "best_score": float(best["score"]),
                      "best_thresholds": [float(t) for t in best["thresholds"]],
                      "best_acc": float(best["acc"]),
                      "best_aucs": [float(a) for a in best["aucs"]],
                      "counter": int(counter), "epoch": int(epoch),
                      "boundaries": int(boundaries),
                      "rng_state": rng.bit_generator.state})
        if counter > cfg.stop_epochs:
            break
    # the mid-fold state is NOT deleted here: the caller's completion marker
    # must hit disk first (_mark_fold_done/_mark_iteration_done clean up via
    # _clear_fold_state) — deleting before the marker exists would open a
    # crash window where neither survives and the whole fold retrains
    return best


def _required_min_bucket(cfg) -> int:
    """Smallest bucket the store may create for this config: the sharded
    trainers raise their min_bucket so every power-of-two bucket divides
    across the inst axis — a store built with the default would hand them
    an indivisible bucket and crash mid-run (e.g. --inst_shard 32 with any
    <=16-instance bag)."""
    n = 16  # DeviceBagStore default
    if getattr(cfg, "inst_shard", 0):
        n = max(n, int(cfg.inst_shard))
    if getattr(cfg, "data_parallel", 0):
        from tpumil.parallel.mesh import make_mesh

        n = max(n, int(make_mesh(cfg.data_parallel).shape["inst"]))
    return n


def _global_store(bags, cfg, trainer=None):
    """One HBM-resident store for the whole dataset; folds become
    device-side gathers (DeviceBagStore.subset). When ``trainer`` is given
    its ``extra_resident_bytes`` is set in the same breath: the store stays
    HBM-resident while fold SUBSETS train, so the auto giant-bag dispatch
    must count it (train/trainer.py) — keeping the accounting here means no
    scheme can forget it."""
    if not cfg.use_device_store:
        return None
    from tpumil.data.device_store import DeviceBagStore

    store = DeviceBagStore(bags, min_bucket=_required_min_bucket(cfg))
    if trainer is not None:
        trainer.extra_resident_bytes = store.nbytes()
    return store


def _fold_views(store, bags, tr_idx, te_idx):
    if store is not None:
        return store.subset(tr_idx), store.subset(te_idx)
    return [bags[i] for i in tr_idx], [bags[i] for i in te_idx]


def run_5fold_cv(bags: List[Bag], cfg: WSITrainConfig,
                 log: Callable[[str], None] = print,
                 save_dir: Optional[str] = None) -> dict:
    """train_tcga.py:252-294."""
    trainer = _make_trainer(cfg)
    store = _global_store(bags, cfg, trainer)
    fold_results = []
    for fold, (tr_idx, te_idx) in enumerate(_kfold_indices(len(bags), 5)):
        resumed = _try_resume_fold(cfg, save_dir, fold, log, "5-fold-cv")
        if resumed is not None:
            fold_results.append(resumed)
            continue
        log(f"Starting CV fold {fold}.")
        save_cb = _fold_saver(save_dir, fold, cfg.model) if save_dir else None
        tr, te = _fold_views(store, bags, tr_idx, te_idx)
        # per-fold host rng: a resumed run's later folds see the same
        # shuffle/dropout streams as an uninterrupted run (a single shared
        # stream would desynchronize after any skipped fold)
        best = train_fold(trainer, tr, te, cfg,
                          np.random.default_rng([cfg.seed, fold]),
                          jax.random.PRNGKey(cfg.seed + fold), log, save_cb,
                          state_dir=_fold_state_dir(save_dir, fold),
                          state_fp=_cfg_fingerprint(cfg, "5-fold-cv"))
        _mark_fold_done(save_dir, fold, best, "5-fold-cv", cfg)
        fold_results.append(best)
    mean_ac = float(np.mean([b["acc"] for b in fold_results]))
    mean_auc = np.mean(np.array([b["aucs"] for b in fold_results]), axis=0)
    log(f"Final results: Mean Accuracy: {mean_ac}")
    for i, a in enumerate(mean_auc):
        log(f"Class {i}: Mean AUC = {a:.4f}")
    return {"mean_accuracy": mean_ac, "mean_auc": [float(a) for a in mean_auc],
            "folds": [{"acc": b["acc"], "aucs": b["aucs"],
                       "thresholds": b["thresholds"]} for b in fold_results]}


def run_5time_tvt(bags: List[Bag], cfg: WSITrainConfig,
                  log: Callable[[str], None] = print,
                  save_dir: Optional[str] = None) -> dict:
    """train_tcga.py:297-348: 5 random train/valid/test splits, model selected
    on valid. (The reference's final test call crashes on an argument-order
    bug at train_tcga.py:341; here the held-out test evaluation is performed
    correctly with the fold's saved thresholds.)

    Resumable like the other two schemes: per-iteration RNG streams derived
    from (seed, it) — so a resumed run's later iterations see the same
    split/shuffle/dropout draws as an uninterrupted one — completed
    iterations skip via ``iter_{k}.done.json`` markers, and a crashed
    iteration continues mid-run when ``cfg.fold_state_every`` is set.

    NOTE (round 4): the per-iteration streams replaced a single shared
    sequential RNG, so a given ``cfg.seed`` produces different (equally
    valid) random splits than earlier tpumil releases did. The scheme's
    split SEMANTICS are unchanged and still mirror the reference
    (train_tcga.py:302-306, which draws from an unseeded global RNG — no
    reference run is reproducible at all)."""
    scheme = "5-time-train+valid+test"
    trainer = _make_trainer(cfg)
    store = _global_store(bags, cfg, trainer)
    results = []
    for it in range(5):
        resumed = _try_resume_iteration(cfg, save_dir, it, log, scheme)
        if resumed is not None:
            results.append(resumed)
            continue
        log(f"Starting iteration {it + 1}.")
        rng = np.random.default_rng([cfg.seed, it])
        order = rng.permutation(len(bags))
        n = len(bags)
        train_end = int(n * (1 - cfg.split - 0.1))
        val_end = train_end + int(n * 0.1)
        train_bags, val_bags = _fold_views(store, bags, order[:train_end],
                                           order[train_end:val_end])
        if store is not None:
            test_bags = store.subset(order[val_end:])
        else:
            test_bags = [bags[i] for i in order[val_end:]]
        save_cb = _fold_saver(save_dir, it, cfg.model) if save_dir else None
        best = train_fold(trainer, train_bags, val_bags, cfg, rng,
                          jax.random.PRNGKey(cfg.seed + it), log, save_cb,
                          state_dir=_fold_state_dir(save_dir, it),
                          state_fp=_cfg_fingerprint(cfg, scheme))
        test_res = evaluate_bags(trainer, best["params"], test_bags, cfg,
                                 thresholds=best["thresholds"], rng=rng)
        res = {"val_acc": best["acc"], "val_aucs": best["aucs"],
               "test_acc": test_res["avg_score"],
               "test_aucs": test_res["aucs"]}
        _mark_iteration_done(save_dir, it, res, scheme, cfg)
        results.append(res)
    mean_ac = float(np.mean([r["val_acc"] for r in results]))
    mean_auc = np.mean(np.array([r["val_aucs"] for r in results]), axis=0)
    log(f"Final results: Mean Accuracy: {mean_ac}")
    for i, a in enumerate(mean_auc):
        log(f"Class {i}: Mean AUC = {a:.4f}")
    return {"mean_accuracy": mean_ac, "mean_auc": [float(a) for a in mean_auc],
            "iterations": results}


def run_5fold_cv_standalone_test(bags: List[Bag], cfg: WSITrainConfig,
                                 log: Callable[[str], None] = print,
                                 save_dir: Optional[str] = None,
                                 permutation: Optional[Sequence[int]] = None,
                                 ) -> dict:
    """train_tcga.py:350-429: reserve a ``split`` fraction for standalone
    testing, 5-fold CV on the rest, then a 5-model majority vote (per-fold
    optimal thresholds) on the holdout.

    ``permutation`` overrides the holdout/rest shuffle (train_tcga.py:352's
    ``shuffle(bags_path)``): holdout = first ``split`` fraction of the
    permuted order, rest = the remainder in permuted order. Passing the
    reference's recorded shuffle makes holdout AND fold membership
    bit-identical to a reference run on the same cohort
    (tests/test_reference_e2e.py)."""
    from scipy.stats import mode

    trainer = _make_trainer(cfg)
    rng = np.random.default_rng(cfg.seed)
    store = _global_store(bags, cfg, trainer)
    if permutation is not None:
        order = np.asarray(permutation, dtype=np.int64)
        if sorted(order.tolist()) != list(range(len(bags))):
            raise ValueError("permutation must be a permutation of range(n_bags)")
    else:
        order = rng.permutation(len(bags))
    n_hold = int(cfg.split * len(bags))
    holdout = [bags[i] for i in order[:n_hold]]
    rest_idx = order[n_hold:]
    rest = [bags[i] for i in rest_idx]

    fold_models = []
    fold_results = []
    scheme = "5-fold-cv-standalone-test"
    for fold, (tr_idx, te_idx) in enumerate(_kfold_indices(len(rest), 5)):
        resumed = _try_resume_fold(cfg, save_dir, fold, log, scheme)
        if resumed is None:
            log(f"Starting CV fold {fold}.")
            save_cb = _fold_saver(save_dir, fold, cfg.model) if save_dir else None
            tr, te = _fold_views(store, bags, rest_idx[tr_idx], rest_idx[te_idx])
            best = train_fold(trainer, tr, te, cfg,
                              np.random.default_rng([cfg.seed, fold]),
                              jax.random.PRNGKey(cfg.seed + fold), log, save_cb,
                              state_dir=_fold_state_dir(save_dir, fold),
                              state_fp=_cfg_fingerprint(cfg, scheme))
            _mark_fold_done(save_dir, fold, best, scheme, cfg)
        else:
            best = resumed
        fold_models.append((best["params"], best["thresholds"]))
        fold_results.append(best)

    holdout_eval = holdout
    if store is not None:
        holdout_eval = store.subset(order[:n_hold])
    fold_predictions = []
    labels = None
    eval_rng = np.random.default_rng([cfg.seed, 5])  # resume-independent
    for params, thresholds in fold_models:
        res = evaluate_bags(trainer, params, holdout_eval, cfg,
                            thresholds=thresholds, rng=eval_rng)
        fold_predictions.append(res["predictions"])
        labels = res["labels"]
    stack = np.stack(fold_predictions, axis=0)
    combined = np.atleast_1d(np.squeeze(mode(stack, axis=0, keepdims=True).mode[0]))
    final = metrics.standalone_test_metrics(labels, combined, cfg.num_classes)
    for k, v in final.items():
        log(f"{k}: {v}")

    out = {
        "final": final,
        "folds": [{"acc": b["acc"], "aucs": b["aucs"],
                   "thresholds": b["thresholds"]} for b in fold_results],
    }
    if save_dir:
        from tpumil.io import torch_ckpt

        os.makedirs(os.path.join(save_dir, "test"), exist_ok=True)
        with open(os.path.join(save_dir, "test", "test_list.json"), "w") as f:
            json.dump([b.name for b in holdout], f)
        for i, (params, thresholds) in enumerate(fold_models):
            torch_ckpt.save_mil_pth(
                params, os.path.join(save_dir, "test", f"mil_weights_fold_{i}.pth"),
                cfg.model)
            with open(os.path.join(save_dir, "test", f"mil_threshold_fold_{i}.json"), "w") as f:
                json.dump([float(t) for t in thresholds], f)
    return out


def _fold_marker(save_dir: str, fold: int) -> str:
    return os.path.join(save_dir, f"fold_{fold}.done.json")


def _fold_state_dir(save_dir: Optional[str], fold: int) -> Optional[str]:
    """Mid-fold train-state checkpoint location (see WSITrainConfig.
    fold_state_every)."""
    return os.path.join(save_dir, f"fold_{fold}_state") if save_dir else None


def _clear_fold_state(save_dir: Optional[str], fold: int) -> None:
    """Remove a completed fold's mid-fold state (all generations, including
    the ``.prev``/``.inflight`` siblings of a save that crashed mid-swap) —
    a stale state must not shadow a rerun of a different experiment. Called
    only AFTER the completion marker is on disk."""
    state_dir = _fold_state_dir(save_dir, fold)
    if not state_dir:
        return
    import shutil

    for d in (state_dir, state_dir + ".prev", state_dir + ".inflight"):
        shutil.rmtree(d, ignore_errors=True)


def _try_resume_iteration(cfg: WSITrainConfig, save_dir: Optional[str],
                          it: int, log, scheme: str) -> Optional[dict]:
    """5-time-tvt counterpart of _try_resume_fold: adopt a completed
    iteration's val+test metrics if its marker matches this experiment."""
    if not (cfg.resume and save_dir):
        return None
    marker = os.path.join(save_dir, f"iter_{it}.done.json")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        meta = json.load(f)
    if meta.pop("fingerprint", None) != _cfg_fingerprint(cfg, scheme):
        log(f"iteration {it}: existing marker was produced by a different "
            "config; retraining.")
        return None
    log(f"Resuming iteration {it} from its marker "
        f"(test acc {meta['test_acc']:.4f}).")
    return meta


def _mark_iteration_done(save_dir: Optional[str], it: int, res: dict,
                         scheme: str, cfg: WSITrainConfig) -> None:
    if not save_dir:
        return
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, f"iter_{it}.done.json"), "w") as f:
        json.dump({**{k: (list(map(float, v)) if isinstance(v, (list, tuple))
                          else float(v)) for k, v in res.items()},
                   "fingerprint": _cfg_fingerprint(cfg, scheme)}, f)
    _clear_fold_state(save_dir, it)


def _cfg_fingerprint(cfg: WSITrainConfig, scheme: str) -> str:
    """Identifies an experiment so --resume never adopts a different run's
    results. The SCHEME is part of the identity: all three eval schemes
    share the fold_{k}.pth / fold_{k}.done.json namespace in save_dir, and
    a standalone-test run adopting plain-CV folds would score its holdout
    with models trained on it (leakage). Every config field that shapes a
    fold's result is included."""
    return (f"{scheme}|{cfg.model}|{cfg.seed}|{cfg.lr}|{cfg.num_epochs}|"
            f"{cfg.stop_epochs}|{cfg.weight_decay}|{cfg.num_classes}|"
            f"{cfg.feats_size}|{cfg.nonlinear}|{cfg.dropout_patch}|"
            f"{cfg.dropout_node}|{cfg.split}|{cfg.average}|{cfg.eta_min}|"
            f"{cfg.eval_interval}"
            # minibatch mode changes the optimization dynamics — distinct
            # experiment. inst_shard deliberately excluded (same trajectory
            # to float tolerance); the suffix form keeps every pre-dp
            # fingerprint string (and its saved markers) valid.
            + (f"|dp{cfg.data_parallel}" if cfg.data_parallel else "")
            # the store and list training paths consume the host RNG
            # differently (per-bucket vs per-chunk draws) — different
            # trajectories, so a resume must not mix them. Suffix only for
            # the non-default so existing default-config markers stay valid.
            + ("" if cfg.use_device_store else "|nostore"))


def _try_resume_fold(cfg: WSITrainConfig, save_dir: Optional[str], fold: int,
                     log, scheme: str) -> Optional[dict]:
    """Load a completed fold's best model + metrics if its marker exists AND
    was produced by the same experiment config."""
    if not (cfg.resume and save_dir):
        return None
    marker = _fold_marker(save_dir, fold)
    pth = os.path.join(save_dir, f"fold_{fold}.pth")
    if not (os.path.exists(marker) and os.path.exists(pth)):
        return None
    from tpumil.io import torch_ckpt

    with open(marker) as f:
        meta = json.load(f)
    if meta.get("fingerprint") != _cfg_fingerprint(cfg, scheme):
        log(f"fold {fold}: existing marker was produced by a different "
            "config; retraining (weights will be overwritten).")
        return None
    params, _, _ = torch_ckpt.load_mil_pth(pth)
    log(f"Resuming fold {fold} from {pth} (acc {meta['acc']:.4f}).")
    return {"score": metrics.current_score(meta["acc"], meta["aucs"]),
            "params": params, "thresholds": meta["thresholds"],
            "acc": meta["acc"], "aucs": meta["aucs"]}


def _mark_fold_done(save_dir: Optional[str], fold: int, best: dict, scheme: str,
                    cfg: Optional[WSITrainConfig] = None) -> None:
    if not save_dir:
        return
    os.makedirs(save_dir, exist_ok=True)
    with open(_fold_marker(save_dir, fold), "w") as f:
        json.dump({"acc": best["acc"], "aucs": list(map(float, best["aucs"])),
                   "thresholds": list(map(float, best["thresholds"])),
                   "fingerprint": _cfg_fingerprint(cfg, scheme) if cfg else None}, f)
    _clear_fold_state(save_dir, fold)


def _fold_saver(save_dir: str, fold: int, model: str = "dsmil"):
    """Best-model persistence matching save_model (train_tcga.py:183-190)."""
    from tpumil.io import torch_ckpt

    os.makedirs(save_dir, exist_ok=True)

    def save_cb(params, thresholds):
        path = os.path.join(save_dir, f"fold_{fold}.pth")
        torch_ckpt.save_mil_pth(params, path, model)
        with open(os.path.join(save_dir, f"fold_{fold}.json"), "w") as f:
            json.dump([float(t) for t in thresholds], f)

    return save_cb
