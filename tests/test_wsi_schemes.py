"""WSI trainer schemes + feature store end-to-end on synthetic feature bags
(SURVEY.md section 4 tier 3): CSV contract -> cache -> train -> thresholds ->
weights export -> reload parity."""

import glob
import json
import os

import numpy as np
import pytest

from tpumil.data.feature_store import (
    BagCache,
    build_dataset_csvs,
    encode_label,
    read_master_csv,
    write_bag_csv,
)
from tpumil.train.schemes import (
    WSITrainConfig,
    run_5fold_cv,
    run_5fold_cv_standalone_test,
)

from synth import make_multiclass_bags, make_separable_bags


def _write_feature_dataset(tmp_path, bags, class_of):
    """Lay out per-class bag CSVs + master CSV exactly like compute_feats."""
    root = str(tmp_path / "datasets" / "synth")
    for i, bag in enumerate(bags):
        write_bag_csv(bag.feats, os.path.join(root, class_of(bag), f"bag{i}.csv"))
    rng = np.random.default_rng(0)
    return build_dataset_csvs(root, "synth", rng=rng)


def test_encode_label():
    np.testing.assert_array_equal(encode_label(1, 1), [1.0])
    np.testing.assert_array_equal(encode_label(0, 2), [1.0, 0.0])
    np.testing.assert_array_equal(encode_label(1, 2), [0.0, 1.0])
    np.testing.assert_array_equal(encode_label(5, 2), [0.0, 0.0])  # out of range


def test_feature_store_roundtrip(tmp_path, rng):
    bags = make_separable_bags(rng, num_bags=8, feats=16)
    master = _write_feature_dataset(tmp_path, bags,
                                    lambda b: "pos" if b.label[0] else "neg")
    entries = read_master_csv(master)
    assert len(entries) == 8
    cache = BagCache(str(tmp_path / "cache"))
    paths = cache.build(entries, num_classes=1, seed=0)
    loaded = cache.load_all(paths)
    # class dirs sort as neg=0, pos=1 so label is 1 for pos bags
    by_name = {os.path.splitext(os.path.basename(e[0]))[0]: e for e in entries}
    for bag in loaded:
        entry_path, label = by_name[bag.name]
        assert bag.label[0] == float(label)
        orig = np.loadtxt(entry_path, delimiter=",", skiprows=1, dtype=np.float32)
        # rows were shuffled at cache time; compare as sorted sets
        np.testing.assert_allclose(np.sort(bag.feats, axis=0), np.sort(orig, axis=0),
                                   atol=1e-4)


def test_5fold_cv_binary(tmp_path, rng):
    bags = make_separable_bags(rng, num_bags=40, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=14, lr=1e-3,
                         stop_epochs=6, verbose=False, seed=0)
    save_dir = str(tmp_path / "weights")
    out = run_5fold_cv(bags, cfg, log=lambda s: None, save_dir=save_dir)
    assert len(out["folds"]) == 5
    assert out["mean_accuracy"] > 0.5
    # best model + thresholds persisted per fold
    assert len(glob.glob(os.path.join(save_dir, "fold_*.pth"))) == 5
    with open(os.path.join(save_dir, "fold_0.json")) as f:
        th = json.load(f)
    assert len(th) == 1 and 0.0 <= th[0] <= 1.0


def test_standalone_test_multiclass(tmp_path, rng):
    bags = make_multiclass_bags(rng, num_bags=40, feats=16, num_classes=2, signal=5.0)
    cfg = WSITrainConfig(feats_size=16, num_classes=2, num_epochs=4, lr=1e-3,
                         stop_epochs=2, verbose=False, seed=0)
    save_dir = str(tmp_path / "weights")
    out = run_5fold_cv_standalone_test(bags, cfg, log=lambda s: None, save_dir=save_dir)
    assert "hamming_loss" in out["final"] and "subset_accuracy" in out["final"]
    # exports: 5 fold weights + thresholds + the holdout list
    test_dir = os.path.join(save_dir, "test")
    assert len(glob.glob(os.path.join(test_dir, "mil_weights_fold_*.pth"))) == 5
    assert len(glob.glob(os.path.join(test_dir, "mil_threshold_fold_*.json"))) == 5
    with open(os.path.join(test_dir, "test_list.json")) as f:
        holdout = json.load(f)
    assert len(holdout) == int(0.2 * len(bags))

    # exported weights must load back through the .pth reader
    from tpumil.io import torch_ckpt
    params, cfg2 = torch_ckpt.load_aggregator_pth(
        os.path.join(test_dir, "mil_weights_fold_0.pth"))
    assert cfg2.num_classes == 2 and cfg2.feats_size == 16


def test_abmil_model_trains(rng):
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer
    bags = make_separable_bags(rng, num_bags=12, feats=16, signal=5.0,
                               pos_inst_frac=0.4)
    trainer = BagTrainer(DSMILConfig(feats_size=16, num_classes=1), model="abmil",
                         chunk_size=4)
    import jax
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    params, opt_state, loss0 = trainer.train_epoch(params, opt_state, bags, 1e-3, rng)
    for _ in range(4):
        params, opt_state, loss = trainer.train_epoch(params, opt_state, bags, 1e-3, rng)
    assert loss < loss0
    scores, _ = trainer.predict(params, bags)
    assert scores.shape == (12, 1)


def test_resume_skips_completed_folds(tmp_path, rng):
    """Crash recovery: a second run with resume=True must skip completed
    folds and produce the same fold metrics."""
    bags = make_separable_bags(rng, num_bags=20, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    save_dir = str(tmp_path / "w")
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=4, lr=1e-3,
                         stop_epochs=2, verbose=False, seed=0, resume=True)
    out1 = run_5fold_cv(bags, cfg, log=lambda s: None, save_dir=save_dir)
    logs = []
    out2 = run_5fold_cv(bags, cfg, log=logs.append, save_dir=save_dir)
    assert sum("Resuming fold" in l for l in logs) == 5
    assert not any("Starting CV fold" in l for l in logs)
    assert out2["mean_accuracy"] == pytest.approx(out1["mean_accuracy"])
    for f1, f2 in zip(out1["folds"], out2["folds"]):
        assert f1["thresholds"] == pytest.approx(f2["thresholds"])


def test_abmil_scheme_saves_and_resumes(tmp_path, rng):
    """--model abmil with a save dir must export, reload, and resume (was a
    KeyError crash via the DSMIL-only checkpoint schema)."""
    bags = make_separable_bags(rng, num_bags=15, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    save_dir = str(tmp_path / "w")
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
                         stop_epochs=2, verbose=False, seed=0, model="abmil",
                         resume=True)
    out1 = run_5fold_cv(bags, cfg, log=lambda s: None, save_dir=save_dir)
    assert len(glob.glob(os.path.join(save_dir, "fold_*.pth"))) == 5
    from tpumil.io import torch_ckpt
    params, cfg2, model = torch_ckpt.load_mil_pth(
        os.path.join(save_dir, "fold_0.pth"))
    assert model == "abmil" and cfg2.feats_size == 16
    logs = []
    out2 = run_5fold_cv(bags, cfg, log=logs.append, save_dir=save_dir)
    assert sum("Resuming fold" in l for l in logs) == 5


def test_resume_rejects_different_config(tmp_path, rng):
    """A marker written by a different experiment config must NOT be adopted."""
    bags = make_separable_bags(rng, num_bags=15, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    save_dir = str(tmp_path / "w")
    cfg1 = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
                          stop_epochs=2, verbose=False, seed=0, resume=True)
    run_5fold_cv(bags, cfg1, log=lambda s: None, save_dir=save_dir)
    cfg2 = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=5e-4,
                          stop_epochs=2, verbose=False, seed=1, resume=True)
    logs = []
    run_5fold_cv(bags, cfg2, log=logs.append, save_dir=save_dir)
    assert not any("Resuming fold" in l for l in logs)
    assert any("different" in l for l in logs)


def test_resume_rejects_cross_scheme_folds(tmp_path, rng):
    """Folds trained by 5-fold-cv must NOT be adopted by a standalone-test
    resume with the same config: the schemes share the fold_{k}.pth
    namespace, and a standalone run scoring its holdout with plain-CV fold
    models would have trained on the holdout (leakage)."""
    from tpumil.train.schemes import run_5fold_cv_standalone_test

    bags = make_separable_bags(rng, num_bags=15, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    save_dir = str(tmp_path / "w")
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
                         stop_epochs=2, verbose=False, seed=0, resume=True)
    run_5fold_cv(bags, cfg, log=lambda s: None, save_dir=save_dir)
    logs = []
    run_5fold_cv_standalone_test(bags, cfg, log=logs.append, save_dir=save_dir)
    assert not any("Resuming fold" in l for l in logs)
    assert any("different" in l for l in logs)
    # and a same-scheme rerun DOES adopt its own folds
    logs2 = []
    run_5fold_cv_standalone_test(bags, cfg, log=logs2.append, save_dir=save_dir)
    assert any("Resuming fold" in l for l in logs2)


def test_resumed_fold_matches_uninterrupted_run(tmp_path, rng):
    """Per-fold host RNG: a run that resumes folds 0-1 must produce the SAME
    later folds as the uninterrupted run (a single shared stream would
    desynchronize after any skipped fold)."""
    bags = make_separable_bags(rng, num_bags=15, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
                         stop_epochs=2, verbose=False, seed=0, resume=True,
                         dropout_patch=0.3)  # exercises the rng-driven path
    full = run_5fold_cv(bags, cfg, log=lambda s: None,
                        save_dir=str(tmp_path / "a"))
    # same experiment in a second save dir, then delete folds 2-4 so the
    # resumed run adopts 0-1 and retrains exactly 2-4
    save_b = str(tmp_path / "b")
    run_5fold_cv(bags, cfg, log=lambda s: None, save_dir=save_b)
    for k in (2, 3, 4):
        os.remove(os.path.join(save_b, f"fold_{k}.done.json"))
        os.remove(os.path.join(save_b, f"fold_{k}.pth"))
    logs = []
    resumed = run_5fold_cv(bags, cfg, log=logs.append, save_dir=save_b)
    assert sum("Resuming fold" in l for l in logs) == 2
    for k in (2, 3, 4):
        np.testing.assert_allclose(resumed["folds"][k]["aucs"],
                                   full["folds"][k]["aucs"], atol=1e-6)
        np.testing.assert_allclose(resumed["folds"][k]["thresholds"],
                                   full["folds"][k]["thresholds"], atol=1e-6)


def test_mid_fold_state_resume_exact(tmp_path, rng):
    """Mid-fold crash resume (WSITrainConfig.fold_state_every): crash
    between epochs INSIDE a fold; the resumed run must continue the exact
    uninterrupted trajectory — params, Adam moments, best-so-far, and the
    per-fold host RNG (dropout/shuffle streams) all restored from the
    sharded state checkpoint."""
    import jax

    import tpumil.io.native_ckpt as nc
    from tpumil.train.schemes import train_fold, _cfg_fingerprint

    bags = make_separable_bags(rng, num_bags=12, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=6, lr=1e-3,
                         stop_epochs=6, verbose=False, seed=0, resume=True,
                         dropout_patch=0.3,  # rng-driven path must restore too
                         fold_state_every=1)
    from tpumil.train.schemes import _make_trainer

    trainer = _make_trainer(cfg)
    tr, te = bags[:9], bags[9:]
    fp = _cfg_fingerprint(cfg, "5-fold-cv")
    key = jax.random.PRNGKey(1)

    straight = train_fold(trainer, tr, te, cfg, np.random.default_rng(3),
                          key, log=lambda s: None,
                          state_dir=str(tmp_path / "s1"), state_fp=fp)

    # crash after the 3rd epoch-boundary state save
    calls = {"n": 0}
    orig = nc.save_sharded_train_state

    def bomb(path, arrays, *, meta=None):
        orig(path, arrays, meta=meta)
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt

    nc.save_sharded_train_state = bomb
    try:
        with pytest.raises(KeyboardInterrupt):
            train_fold(trainer, tr, te, cfg, np.random.default_rng(3), key,
                       log=lambda s: None, state_dir=str(tmp_path / "s2"),
                       state_fp=fp)
    finally:
        nc.save_sharded_train_state = orig

    logs = []
    resumed = train_fold(trainer, tr, te, cfg, np.random.default_rng(3), key,
                         log=logs.append, state_dir=str(tmp_path / "s2"),
                         state_fp=fp)
    assert any("Resuming fold mid-run at epoch 4" in l for l in logs)
    assert resumed["acc"] == straight["acc"]
    assert resumed["thresholds"] == straight["thresholds"]
    for k, want in jax.tree.leaves_with_path(straight["params"]):
        got = {tuple(str(x) for x in kk): v
               for kk, v in jax.tree.leaves_with_path(resumed["params"])}[
                   tuple(str(x) for x in k)]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"param {k} not bitwise")
    # train_fold itself leaves the state dir: the completion marker must
    # hit disk BEFORE the state is deleted (a crash between the two would
    # otherwise lose the fold). The marker writer owns the cleanup.
    from tpumil.train.schemes import _mark_fold_done

    assert os.path.isdir(str(tmp_path / "s2"))
    marked_dir = str(tmp_path)
    os.rename(str(tmp_path / "s2"), os.path.join(marked_dir, "fold_0_state"))
    _mark_fold_done(marked_dir, 0, resumed, "5-fold-cv", cfg)
    assert not os.path.isdir(os.path.join(marked_dir, "fold_0_state"))
    assert os.path.exists(os.path.join(marked_dir, "fold_0.done.json"))

    # a foreign fingerprint must NOT be adopted
    orig(str(tmp_path / "s3"), {"params": {}, "opt_state": {},
                                "best_params": {}},
         meta={"fingerprint": "other"})
    logs2 = []
    train_fold(trainer, tr, te, cfg, np.random.default_rng(3), key,
               log=logs2.append, state_dir=str(tmp_path / "s3"), state_fp=fp)
    assert any("different config" in l for l in logs2)


def test_5time_tvt_resume_matches_uninterrupted(tmp_path, rng):
    """run_5time_tvt iteration resume: per-iteration (seed, it) RNG streams
    mean a run that adopts iterations 0-2 from markers retrains 3-4 to the
    SAME results as the uninterrupted run."""
    from tpumil.train.schemes import run_5time_tvt

    bags = make_separable_bags(rng, num_bags=20, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
                         stop_epochs=2, verbose=False, seed=0, resume=True,
                         dropout_patch=0.3)  # rng-driven path
    full = run_5time_tvt(bags, cfg, log=lambda s: None,
                         save_dir=str(tmp_path / "a"))
    save_b = str(tmp_path / "b")
    run_5time_tvt(bags, cfg, log=lambda s: None, save_dir=save_b)
    for k in (3, 4):
        os.remove(os.path.join(save_b, f"iter_{k}.done.json"))
    logs = []
    resumed = run_5time_tvt(bags, cfg, log=logs.append, save_dir=save_b)
    assert sum("Resuming iteration" in l for l in logs) == 3
    for k in range(5):
        np.testing.assert_allclose(resumed["iterations"][k]["test_aucs"],
                                   full["iterations"][k]["test_aucs"],
                                   atol=1e-6)
        assert resumed["iterations"][k]["test_acc"] == \
            pytest.approx(full["iterations"][k]["test_acc"], abs=1e-6)


# ---------------------------------------------------------------------------
# Multi-chip (instance-sharded) scheme runs — the product path
# ---------------------------------------------------------------------------

def test_run_5fold_cv_inst_sharded_parity(rng):
    """run_5fold_cv with cfg.inst_shard=8 (every bag's instance axis sharded
    over the virtual 8-device mesh) must reproduce the single-device scheme:
    identical fold membership and visitation (the sharded trainer inherits
    BagTrainer's RNG consumption), metrics equal to float tolerance (the
    shard_map collectives reorder reductions, so trajectories agree to
    ~1e-5 per step, not bitwise)."""
    bags = make_separable_bags(rng, num_bags=20, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    kw = dict(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
              stop_epochs=3, verbose=False, seed=0)
    want = run_5fold_cv(bags, WSITrainConfig(**kw), log=lambda s: None)
    got = run_5fold_cv(bags, WSITrainConfig(**kw, inst_shard=8),
                       log=lambda s: None)
    assert [f["acc"] for f in got["folds"]] == [f["acc"] for f in want["folds"]]
    np.testing.assert_allclose(
        [f["aucs"] for f in got["folds"]],
        [f["aucs"] for f in want["folds"]], atol=1e-3)
    np.testing.assert_allclose(
        [f["thresholds"] for f in got["folds"]],
        [f["thresholds"] for f in want["folds"]], atol=1e-3)
    assert got["mean_accuracy"] == want["mean_accuracy"]


def test_standalone_test_inst_sharded_resume(tmp_path, rng):
    """The standalone-test scheme end-to-end SHARDED: thresholds export,
    majority vote, and fold resume all flow through the inst-sharded
    trainer; a resumed rerun adopts the completed folds' markers."""
    bags = make_separable_bags(rng, num_bags=20, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
                         stop_epochs=3, verbose=False, seed=0, inst_shard=8)
    save_dir = str(tmp_path / "weights")
    out = run_5fold_cv_standalone_test(bags, cfg, log=lambda s: None,
                                       save_dir=save_dir)
    assert len(out["folds"]) == 5
    assert len(glob.glob(os.path.join(save_dir, "test",
                                      "mil_weights_fold_*.pth"))) == 5
    logs = []
    cfg2 = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3, lr=1e-3,
                          stop_epochs=3, verbose=False, seed=0, inst_shard=8,
                          resume=True)
    out2 = run_5fold_cv_standalone_test(bags, cfg2, log=logs.append,
                                        save_dir=save_dir)
    assert sum("Resuming fold" in l for l in logs) == 5
    np.testing.assert_allclose(
        [f["thresholds"] for f in out2["folds"]],
        [f["thresholds"] for f in out["folds"]], atol=1e-6)
    assert out2["final"] == out["final"]


def test_inst_sharded_trainer_validation():
    """Constructor guards: non-power-of-two axis, dropout_patch, non-dsmil
    models, and a missing mesh all fail loudly instead of degrading."""
    import jax
    from jax.sharding import Mesh

    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.bag_shard import InstanceShardedBagTrainer

    cfg = DSMILConfig(feats_size=16, num_classes=1)
    with pytest.raises(ValueError, match="mesh"):
        InstanceShardedBagTrainer(cfg)
    mesh3 = Mesh(np.asarray(jax.devices()[:3]), ("inst",))
    with pytest.raises(ValueError, match="power of two"):
        InstanceShardedBagTrainer(cfg, mesh=mesh3)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("inst",))
    with pytest.raises(NotImplementedError, match="dropout"):
        InstanceShardedBagTrainer(cfg, mesh=mesh, dropout_patch=0.5)
    with pytest.raises(NotImplementedError, match="dsmil"):
        InstanceShardedBagTrainer(cfg, mesh=mesh, model="abmil")


def test_run_5fold_cv_data_parallel(tmp_path, rng):
    """run_5fold_cv with cfg.data_parallel=8: ONE minibatch Adam step per
    bucket chunk sharded over the (data, inst) mesh — a documented
    deviation from per-bag stepping, so no trajectory parity is claimed;
    the scheme must learn the planted signal end-to-end, export weights,
    and refuse to adopt a single-device run's markers (the fingerprint
    includes the mode)."""
    bags = make_separable_bags(rng, num_bags=20, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    kw = dict(feats_size=16, num_classes=1, num_epochs=8, lr=2e-3,
              stop_epochs=8, verbose=False, seed=0)
    save_dir = str(tmp_path / "w")
    out = run_5fold_cv(bags, WSITrainConfig(**kw, data_parallel=8),
                       log=lambda s: None, save_dir=save_dir)
    assert len(out["folds"]) == 5
    assert out["mean_accuracy"] > 0.6
    assert len(glob.glob(os.path.join(save_dir, "fold_*.pth"))) == 5

    # a dp run's markers must NOT satisfy a single-device --resume
    logs = []
    run_5fold_cv(bags,
                 WSITrainConfig(**{**kw, "num_epochs": 1, "stop_epochs": 1},
                                resume=True),
                 log=logs.append, save_dir=save_dir)
    assert any("different config" in l for l in logs)

    with pytest.raises(ValueError, match="mutually exclusive"):
        run_5fold_cv(bags, WSITrainConfig(**kw, data_parallel=8,
                                          inst_shard=8), log=lambda s: None)


def test_store_min_bucket_follows_inst_shard(rng):
    """A store built for an inst_shard run must never create a bucket the
    inst axis cannot divide: --inst_shard 32 with any <=16-instance bag
    would otherwise crash mid-run on the default min_bucket=16."""
    from tpumil.train.schemes import _global_store, _required_min_bucket

    assert _required_min_bucket(WSITrainConfig(feats_size=16,
                                               num_classes=1)) == 16
    assert _required_min_bucket(
        WSITrainConfig(feats_size=16, num_classes=1, inst_shard=32)) == 32
    # dp mode's constraint is its mesh's inst axis (make_mesh(8) -> inst=2)
    assert _required_min_bucket(
        WSITrainConfig(feats_size=16, num_classes=1, data_parallel=8)) == 16

    bags = make_separable_bags(rng, num_bags=6, feats=16, mean_instances=6)
    store = _global_store(
        bags, WSITrainConfig(feats_size=16, num_classes=1, inst_shard=32))
    assert all(s % 32 == 0 for s in store.bucket_sizes)


def test_feature_store_same_basename_across_classes(tmp_path):
    """class0/1.csv and class1/1.csv must BOTH survive the cache build.
    The reference keys cache files by basename alone (train_tcga.py:50),
    silently overwriting one bag with the other — a documented deviation:
    colliding names are disambiguated by their class dir."""
    from tpumil.data.feature_store import write_bag_csv

    rng = np.random.default_rng(0)
    entries = []
    for cls, label in (("class0", 0), ("class1", 1)):
        path = str(tmp_path / cls / "1.csv")
        write_bag_csv(rng.standard_normal((4, 8)).astype(np.float32), path)
        entries.append((path, label))
    cache = BagCache(str(tmp_path / "cache"))
    paths = cache.build(entries, num_classes=2, seed=0)
    assert len(paths) == len(set(paths)) == 2
    loaded = cache.load_all(paths)
    labels = sorted(int(np.argmax(b.label)) for b in loaded)
    assert labels == [0, 1]
