"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md section 4
tier 5): mesh construction, data-parallel training step, instance-sharded
attention parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.parallel.bag_shard import make_instance_sharded_forward, shard_bag
from tpumil.parallel.mesh import make_mesh
from tpumil.parallel.sharded_train import device_put_batch, make_sharded_train_step


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    mesh2 = make_mesh(8, inst_parallel=4)
    assert mesh2.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        make_mesh(6, inst_parallel=4)


def test_sharded_train_step_runs_and_matches_single(rng):
    cfg = DSMILConfig(feats_size=64, num_classes=2)
    mesh = make_mesh(8)
    step, optimizer = make_sharded_train_step(cfg, mesh)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)

    b, n = 8, 64
    feats = rng.standard_normal((b, n, cfg.feats_size)).astype(np.float32)
    mask = rng.random((b, n)) < 0.9
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=b)]
    f, m, l = device_put_batch(mesh, feats, mask, labels)
    params2, opt_state2, loss_sharded = step(params, opt_state, f, m,
                                             jnp.asarray(l), 1e-4)
    # single-device oracle of the same minibatch loss
    from tpumil.ops.losses import bce_with_logits

    c, bag_logits, _, _ = dsmil.forward(
        dsmil.init_params(jax.random.PRNGKey(0), cfg),
        jnp.asarray(feats), jnp.asarray(mask))
    maxl = dsmil.max_instance_logits(c, jnp.asarray(mask))
    bag_l = jax.vmap(bce_with_logits)(bag_logits, jnp.asarray(labels))
    max_l = jax.vmap(bce_with_logits)(maxl, jnp.asarray(labels))
    want = float(jnp.mean(0.5 * bag_l + 0.5 * max_l))
    np.testing.assert_allclose(float(loss_sharded), want, rtol=1e-5)


@pytest.mark.parametrize("inst_parallel", [2, 4, 8])
def test_instance_sharded_forward_parity(rng, inst_parallel):
    """Sequence-parallel attention over the instance axis must reproduce the
    single-device forward exactly."""
    cfg = DSMILConfig(feats_size=64, num_classes=2)
    params = dsmil.init_params(jax.random.PRNGKey(3), cfg)
    devs = np.asarray(jax.devices()[:inst_parallel])
    mesh = Mesh(devs, ("inst",))

    n, n_valid = 128, 100
    feats = np.zeros((n, cfg.feats_size), np.float32)
    feats[:n_valid] = rng.standard_normal((n_valid, cfg.feats_size))
    mask = np.arange(n) < n_valid

    fwd = make_instance_sharded_forward(mesh)
    f, m = shard_bag(mesh, jnp.asarray(feats), jnp.asarray(mask))
    bag_got, max_got, bemb_got = fwd(params, f, m)

    c, bag_want, _, bemb_want = dsmil.forward(params, jnp.asarray(feats),
                                              jnp.asarray(mask))
    max_want = dsmil.max_instance_logits(c, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(bag_got), np.asarray(bag_want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(max_got), np.asarray(max_want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bemb_got), np.asarray(bemb_want),
                               rtol=1e-4, atol=1e-5)


def test_graft_entry_dryrun():
    """The driver's multichip dry run must pass on the CPU mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    mod.dryrun_multichip(8)


def test_sharded_step_gates_dummy_bags(rng):
    """Count-padding dummy bags (real=False, fully masked, duplicated
    labels) must not perturb the sharded objective: the gated 8-bag batch
    with 3 dummies produces the same loss and updated params as the pure
    5-bag... padded-to-8-all-real-oracle computed over only the real rows."""
    cfg = DSMILConfig(feats_size=32, num_classes=1)
    mesh = make_mesh(8)
    step, optimizer = make_sharded_train_step(cfg, mesh)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)

    b, n, b_real = 8, 32, 5
    feats = rng.standard_normal((b, n, cfg.feats_size)).astype(np.float32)
    mask = np.ones((b, n), bool)
    labels = rng.integers(0, 2, (b, 1)).astype(np.float32)
    # dummy rows: zero feats, all-masked, label copied from bag 0
    feats[b_real:] = 0.0
    mask[b_real:] = False
    labels[b_real:] = labels[0]
    real = np.arange(b) < b_real

    clone = lambda t: jax.tree.map(jnp.copy, t)
    f, m, l = device_put_batch(mesh, feats, mask, labels)
    # oracle BEFORE stepping (the jitted step donates params/opt_state)
    from tpumil.ops.losses import dual_stream_loss

    c, bag_logits, _, _ = dsmil.forward(params, jnp.asarray(feats[:b_real]),
                                        jnp.asarray(mask[:b_real]))
    maxl = dsmil.max_instance_logits(c, jnp.asarray(mask[:b_real]))
    want = float(np.mean([float(dual_stream_loss(bag_logits[i], maxl[i],
                                                 jnp.asarray(labels[i])))
                          for i in range(b_real)]))
    p1, s1, loss_gated = step(clone(params), optimizer.init(clone(params)),
                              f, m, jnp.asarray(l), 1e-4, jnp.asarray(real))
    np.testing.assert_allclose(float(loss_gated), want, rtol=1e-5)
    # ungated would differ (the dummies add BCE(fcc bias, label) terms)
    _, _, loss_ungated = step(clone(params), optimizer.init(clone(params)),
                              f, m, jnp.asarray(l), 1e-4)
    assert abs(float(loss_ungated) - want) > 1e-4


@pytest.mark.parametrize("inst_parallel", [4, 8])
def test_instance_sharded_train_step_parity(rng, inst_parallel):
    """VERDICT r2 #4: reference-faithful per-bag TRAINING for a bag sharded
    over the instance axis. Three consecutive Adam steps through the
    shard_map collectives must reproduce the single-device trajectory."""
    from tpumil.ops.losses import dual_stream_loss
    from tpumil.parallel.bag_shard import make_instance_sharded_train_step
    from tpumil.train.optim import adam_torch

    cfg = DSMILConfig(feats_size=64, num_classes=2)
    devs = np.asarray(jax.devices()[:inst_parallel])
    mesh = Mesh(devs, ("inst",))
    step, optimizer = make_instance_sharded_train_step(mesh)

    n, n_valid = 256, 229
    feats = np.zeros((n, cfg.feats_size), np.float32)
    feats[:n_valid] = rng.standard_normal((n_valid, cfg.feats_size))
    mask = np.arange(n) < n_valid
    label = np.asarray([1.0, 0.0], np.float32)
    pw = jnp.ones((cfg.num_classes,), jnp.float32)
    lr = jnp.asarray(2e-3, jnp.float32)

    params0 = dsmil.init_params(jax.random.PRNGKey(3), cfg)

    # single-device oracle trajectory
    def bag_loss(p, f, m, y):
        c, bag_logits, _, _ = dsmil.forward(p, f, m)
        return dual_stream_loss(bag_logits, dsmil.max_instance_logits(c, m),
                                y, pw)

    p_ref = jax.tree.map(jnp.copy, params0)
    s_ref = optimizer.init(p_ref)
    ref_losses = []
    for _ in range(3):
        loss, grads = jax.value_and_grad(bag_loss)(
            p_ref, jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(label))
        p_ref, s_ref = optimizer.step(p_ref, s_ref, grads, lr)
        ref_losses.append(float(loss))

    f, m = shard_bag(mesh, jnp.asarray(feats), jnp.asarray(mask))
    p = jax.tree.map(jnp.copy, params0)
    s = optimizer.init(p)
    for i in range(3):
        p, s, loss = step(p, s, f, m, jnp.asarray(label), lr, pw)
        np.testing.assert_allclose(float(loss), ref_losses[i], rtol=1e-5,
                                   err_msg=f"loss diverged at step {i}")
    for k, want in jax.tree.leaves_with_path(p_ref):
        got = {tuple(str(x) for x in kk): v
               for kk, v in jax.tree.leaves_with_path(p)}[
                   tuple(str(x) for x in k)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"param {k} diverged")


def test_train_bags_sharded_epoch_parity(rng):
    """Epoch loop around the instance-sharded step: per-bag Adam steps over
    a dataset of variable-size bags, each sharded over the inst axis, must
    reproduce a single-device per-bag loop on the UNPADDED bags in the same
    shuffle order (pinning both the collectives and the pad+mask
    discipline)."""
    from tpumil.ops.losses import dual_stream_loss
    from tpumil.parallel.bag_shard import (make_instance_sharded_train_step,
                                           train_bags_sharded)
    from tpumil.data.bags import Bag

    cfg = DSMILConfig(feats_size=32, num_classes=2)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("inst",))
    step, optimizer = make_instance_sharded_train_step(mesh)

    sizes = [10, 33, 64, 100, 17, 50]
    bags = [Bag(rng.standard_normal((n, cfg.feats_size)).astype(np.float32),
                np.asarray([float(i % 2), float((i + 1) % 2)], np.float32),
                f"b{i}")
            for i, n in enumerate(sizes)]
    params0 = dsmil.init_params(jax.random.PRNGKey(5), cfg)
    lr = jnp.asarray(2e-3, jnp.float32)
    pw = jnp.ones((cfg.num_classes,), jnp.float32)

    # single-device oracle: same permutation, unpadded bags
    def bag_loss(p, f, m, y):
        c, bag_logits, _, _ = dsmil.forward(p, f, m)
        return dual_stream_loss(bag_logits, dsmil.max_instance_logits(c, m),
                                y, pw)

    order = np.random.default_rng(9).permutation(len(bags))
    p_ref = jax.tree.map(jnp.copy, params0)
    s_ref = optimizer.init(p_ref)
    ref_losses = []
    for i in order:
        f = jnp.asarray(bags[i].feats)
        m = jnp.ones((f.shape[0],), bool)
        loss, grads = jax.value_and_grad(bag_loss)(
            p_ref, f, m, jnp.asarray(bags[i].label))
        p_ref, s_ref = optimizer.step(p_ref, s_ref, grads, lr)
        ref_losses.append(float(loss))

    p = jax.tree.map(jnp.copy, params0)
    s = optimizer.init(p)
    p, s, losses = train_bags_sharded(step, mesh, p, s, bags, 2e-3,
                                      np.random.default_rng(9))
    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5)
    # atol 1e-5: psum reorders float additions, and Adam(0.5, 0.9)'s
    # g/(sqrt(v)+eps) amplifies ulp-level grad noise on near-zero elements
    # over the 6 steps (measured drift: maxabs 6e-6 on one q.w2 element)
    for k, want in jax.tree.leaves_with_path(p_ref):
        got = {tuple(str(x) for x in kk): v
               for kk, v in jax.tree.leaves_with_path(p)}[
                   tuple(str(x) for x in k)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"param {k} diverged")


def test_sharded_train_state_resume_and_retopology(rng, tmp_path):
    """Sharded train-state checkpointing (VERDICT r3 item 3): (a) a mid-run
    save of the instance-sharded trainer restores BITWISE on the same mesh
    and continues the exact trajectory; (b) the same checkpoint restores
    onto a SMALLER mesh (8 -> 4 devices) with explicit shardings — no
    'Sharding info not provided' unsafe-topology warning — and training
    continues there."""
    import warnings

    from tpumil.data.bags import Bag
    from tpumil.io.native_ckpt import (load_sharded_train_state,
                                       save_sharded_train_state)
    from tpumil.parallel.bag_shard import (make_instance_sharded_train_step,
                                           train_bags_sharded)
    from tpumil.parallel.mesh import replicated

    cfg = DSMILConfig(feats_size=32, num_classes=2)
    mesh8 = Mesh(np.asarray(jax.devices()), ("inst",))
    step8, optimizer = make_instance_sharded_train_step(mesh8)

    sizes = [24, 50, 64, 17]
    bags = [Bag(rng.standard_normal((n, cfg.feats_size)).astype(np.float32),
                np.asarray([float(i % 2), float((i + 1) % 2)], np.float32),
                f"b{i}")
            for i, n in enumerate(sizes)]
    params0 = dsmil.init_params(jax.random.PRNGKey(2), cfg)

    def run_epochs(step, mesh, params, opt_state, epochs):
        for e in epochs:
            params, opt_state, _ = train_bags_sharded(
                step, mesh, params, opt_state, bags, 2e-3,
                np.random.default_rng([11, e]))
        return params, opt_state

    # uninterrupted: 3 epochs straight
    p_all, s_all = run_epochs(step8, mesh8,
                              jax.tree.map(jnp.copy, params0),
                              optimizer.init(params0), range(3))

    # interrupted at epoch 2: save, restore onto the SAME mesh, continue
    ckpt = str(tmp_path / "state")
    p2, s2 = run_epochs(step8, mesh8, jax.tree.map(jnp.copy, params0),
                        optimizer.init(params0), range(2))
    save_sharded_train_state(ckpt, {"params": p2, "opt_state": s2},
                             meta={"epoch": 2})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st, meta = load_sharded_train_state(
            ckpt, {"params": p2, "opt_state": s2},
            sharding=replicated(mesh8))
    assert not [x for x in w if "Sharding info not provided" in str(x.message)]
    assert meta["epoch"] == 2
    p_res, s_res = run_epochs(step8, mesh8, st["params"], st["opt_state"],
                              range(2, 3))
    for k, want in jax.tree.leaves_with_path(p_all):
        got = {tuple(str(x) for x in kk): v
               for kk, v in jax.tree.leaves_with_path(p_res)}[
                   tuple(str(x) for x in k)]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"param {k} not bitwise")

    # cross-topology: the 8-device checkpoint restores onto 4 devices and
    # trains on; param values identical at restore, trajectory within the
    # collective-reorder tolerance of the epoch-parity test above
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), ("inst",))
    step4, _ = make_instance_sharded_train_step(mesh4)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st4, meta4 = load_sharded_train_state(
            ckpt, {"params": p2, "opt_state": s2},
            sharding=replicated(mesh4))
    assert not [x for x in w if "Sharding info not provided" in str(x.message)]
    for k, want in jax.tree.leaves_with_path(p2):
        got = {tuple(str(x) for x in kk): v
               for kk, v in jax.tree.leaves_with_path(st4["params"])}[
                   tuple(str(x) for x in k)]
        assert sorted(d.id for d in got.devices()) == \
            sorted(d.id for d in jax.devices()[:4])
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    p4, s4 = run_epochs(step4, mesh4, st4["params"], st4["opt_state"],
                        range(2, 3))
    for k, want in jax.tree.leaves_with_path(p_all):
        got = {tuple(str(x) for x in kk): v
               for kk, v in jax.tree.leaves_with_path(p4)}[
                   tuple(str(x) for x in k)]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"param {k} diverged on 4-dev")


def test_data_parallel_bag_trainer_mesh_invariance(rng):
    """DataParallelBagTrainer's minibatch semantics are mesh-shape
    INVARIANT: the same epoch on a 1-device mesh and on the full 8-device
    (data=4, inst=2) mesh produces the same losses to float tolerance
    (XLA partitions the reductions differently — not bitwise), including a
    ragged final chunk that needs bag-axis padding."""
    import jax

    from tpumil.data.bags import Bag
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.mesh import make_mesh
    from tpumil.parallel.sharded_train import DataParallelBagTrainer

    cfg = DSMILConfig(feats_size=16, num_classes=1)
    bags = [Bag(rng.standard_normal((sz, 16)).astype(np.float32),
                np.asarray([float(i % 2)], np.float32), f"b{i}")
            for i, sz in enumerate([20, 33, 41, 28, 37])]  # 5 bags: ragged

    def run(n_dev):
        tr = DataParallelBagTrainer(cfg, mesh=make_mesh(n_dev))
        params, opt = tr.init(jax.random.PRNGKey(0))
        losses = []
        erng = np.random.default_rng(3)
        for _ in range(2):
            params, opt, loss = tr.train_epoch(params, opt, bags, 1e-3, erng)
            losses.append(loss)
        scores, _ = tr.predict(params, bags)
        return np.asarray(losses), scores

    l1, s1 = run(1)
    l8, s8 = run(8)
    np.testing.assert_allclose(l8, l1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s8, s1, rtol=1e-4, atol=1e-5)


def test_data_parallel_bag_trainer_validation(rng):
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.mesh import make_mesh
    from tpumil.parallel.sharded_train import DataParallelBagTrainer

    cfg = DSMILConfig(feats_size=16, num_classes=1)
    with pytest.raises(ValueError, match="mesh"):
        DataParallelBagTrainer(cfg)
    with pytest.raises(NotImplementedError, match="dropout"):
        DataParallelBagTrainer(cfg, mesh=make_mesh(8), dropout_patch=0.5)


def test_take_devices_raises_when_insufficient():
    """jax.devices()[:n] silently truncates; take_devices must not — a
    --inst_shard 16 run on this 8-device host has to fail loudly instead of
    quietly training 8-way."""
    from tpumil.parallel.mesh import take_devices

    assert len(take_devices(8)) == 8
    with pytest.raises(ValueError, match="only 8"):
        take_devices(16)
    with pytest.raises(ValueError):
        make_mesh(16)
    with pytest.raises(ValueError, match="non-negative"):
        # devices[:-1] would silently build a 7-device mesh
        take_devices(-1)


def test_data_parallel_mesh_helper():
    """The one --data_parallel handler shared by every feats/inference
    CLIs: 0/None -> single-device (no mesh), N -> N-device 1-wide-inst mesh,
    negative -> loud error (NOT a devices[:-1] slice)."""
    from tpumil.parallel.mesh import data_parallel_mesh

    assert data_parallel_mesh(0) is None
    assert data_parallel_mesh(None) is None
    mesh = data_parallel_mesh(4)
    assert mesh.devices.shape == (4, 1)
    assert mesh.axis_names == ("data", "inst")
    with pytest.raises(ValueError, match=">= 0"):
        data_parallel_mesh(-1)


def _uniform_store(rng, num_bags=10, n_inst=16, feats=16):
    """Bags of IDENTICAL instance count -> a SINGLE-bucket DeviceBagStore
    (the case where BagTrainer.train_epochs bulk-draws its RNG)."""
    from tpumil.data.bags import Bag
    from tpumil.data.device_store import DeviceBagStore

    bags = [Bag(rng.standard_normal((n_inst, feats)).astype(np.float32),
                np.asarray([float(i % 2)], np.float32), f"b{i}")
            for i in range(num_bags)]
    return DeviceBagStore(bags), bags


def test_sequential_epochs_rng_matches_fused_single_bucket(rng):
    """InstanceShardedBagTrainer.train_epochs must consume the host RNG
    exactly like BagTrainer.train_epochs for a single-bucket store with
    E > 1 (the fused path draws [E perms, then ONE integers]); otherwise
    the visitation orders diverge from epoch 2 and the trajectory parity
    that justifies omitting inst_shard from the experiment fingerprint is
    broken."""
    from tpumil.parallel.bag_shard import InstanceShardedBagTrainer
    from tpumil.train.trainer import BagTrainer

    cfg = DSMILConfig(feats_size=16, num_classes=1)
    store, _ = _uniform_store(rng)
    lrs = [1e-3, 1e-3, 1e-3]

    base = BagTrainer(cfg)
    p0, o0 = base.init(jax.random.PRNGKey(0))
    p_ref, _, l_ref = base.train_epochs(p0, o0, store, lrs,
                                        np.random.default_rng(7))

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("inst",))
    sharded = InstanceShardedBagTrainer(cfg, mesh=mesh)
    p0, o0 = sharded.init(jax.random.PRNGKey(0))
    p_got, _, l_got = sharded.train_epochs(p0, o0, store, lrs,
                                           np.random.default_rng(7))

    np.testing.assert_allclose(l_got, l_ref, rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_got), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_data_parallel_trainer_chunks_store_buckets(rng):
    """The DeviceBagStore path hands _train_bucket_any the WHOLE bucket;
    the dp trainer must still step in minibatches of <= chunk_size bags
    (10 bags / chunk_size 4 -> 3 steps per epoch), not one step per
    bucket."""
    from tpumil.parallel.sharded_train import DataParallelBagTrainer

    cfg = DSMILConfig(feats_size=16, num_classes=1)
    store, _ = _uniform_store(rng)
    tr = DataParallelBagTrainer(cfg, mesh=make_mesh(8), chunk_size=4)
    calls = []
    inner = tr._dp_step

    def counting(*a, **kw):
        calls.append(kw.get("real", a[6] if len(a) > 6 else None))
        return inner(*a, **kw)

    tr._dp_step = counting
    params, opt = tr.init(jax.random.PRNGKey(0))
    params, opt, loss = tr.train_epoch(params, opt, store, 1e-3,
                                       np.random.default_rng(0))
    assert len(calls) == 3  # ceil(10 / 4)
    assert np.isfinite(loss)


def test_inst_sharded_step_respects_compute_dtype(rng):
    """cfg.compute_dtype must reach the sharded step: a bf16 config has to
    produce a (slightly) different loss than the f32 config — before the
    fix both ran f32 and were bitwise identical."""
    from tpumil.parallel.bag_shard import InstanceShardedBagTrainer

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("inst",))
    store, _ = _uniform_store(rng)

    def one_epoch(dtype):
        cfg = DSMILConfig(feats_size=16, num_classes=1, compute_dtype=dtype)
        tr = InstanceShardedBagTrainer(cfg, mesh=mesh)
        params, opt = tr.init(jax.random.PRNGKey(0))
        _, _, loss = tr.train_epoch(params, opt, store, 1e-3,
                                    np.random.default_rng(0))
        return float(loss)

    l32 = one_epoch(jnp.float32)
    lbf = one_epoch(jnp.bfloat16)
    assert l32 != lbf                      # dtype actually flowed through
    np.testing.assert_allclose(lbf, l32, rtol=2e-2)  # but it's the same math
