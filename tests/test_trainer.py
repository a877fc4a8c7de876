"""Trainer tests: optimizer parity with torch Adam, convergence on synthetic
separable MIL data, patch dropout semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.data.bags import Bag, bucket_length, bucketed_chunks, pad_bags
from tpumil.models.dsmil import DSMILConfig
from tpumil.train.optim import adam_torch, cosine_annealing_lr
from tpumil.train.trainer import BagTrainer, patch_dropout_mask
from tpumil.train import metrics

from synth import make_separable_bags


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]
    lr, wd = 1e-2, 1e-3

    # torch
    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([p_t], lr=lr, betas=(0.5, 0.9), weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()

    # tpumil
    opt_j = adam_torch(betas=(0.5, 0.9), weight_decay=wd)
    params = {"w": jnp.asarray(w0)}
    state = opt_j.init(params)
    for g in grads:
        params, state = opt_j.step(params, state, {"w": jnp.asarray(g)}, lr)

    np.testing.assert_allclose(np.asarray(params["w"]), p_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_cosine_annealing_matches_torch():
    torch = pytest.importorskip("torch")
    lr0, T, eta = 2e-4, 40, 5e-6
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T, eta)
    lr_of = cosine_annealing_lr(lr0, T, eta)
    for epoch in range(T):
        np.testing.assert_allclose(opt.param_groups[0]["lr"], lr_of(epoch), rtol=1e-6)
        sched.step()


def test_bucketing():
    assert bucket_length(1) == 16
    assert bucket_length(16) == 16
    assert bucket_length(17) == 32
    rng = np.random.default_rng(0)
    bags = [Bag(np.zeros((n, 4), np.float32), np.zeros(1, np.float32), str(i))
            for i, n in enumerate([3, 20, 18, 5, 100])]
    chunks = list(bucketed_chunks(bags, [0, 1, 2, 3, 4], chunk_size=2))
    seen = sorted(i for idxs, _ in chunks for i in idxs)
    assert seen == [0, 1, 2, 3, 4]
    for idxs, nmax in chunks:
        for i in idxs:
            assert bags[i].num_instances <= nmax


def test_patch_dropout_mask():
    mask = jnp.asarray(np.arange(32) < 20)
    out = patch_dropout_mask(jax.random.PRNGKey(0), mask, 0.5)
    assert int(out.sum()) == 10  # floor(20 * 0.5)
    assert bool(jnp.all(~out[20:]))  # never resurrects padding
    out_full = patch_dropout_mask(jax.random.PRNGKey(0), mask, 1.0)
    assert int(out_full.sum()) == 20


def test_patch_dropout_count_matches_reference_float64():
    """The kept count is the reference's exact int(num_rows * p) in float64
    (train_tcga.py:79). floor(f32(n) * f32(p)) differs by one on thousands
    of (n, p) pairs — e.g. f32(2150)*f32(0.94) rounds UP across the 2021
    boundary while float64 2150*0.94 = 2020.99... stays below it."""
    for n, p in ((2150, 0.94), (4096, 0.7), (20000, 0.33), (7, 0.99)):
        mask = jnp.asarray(np.arange(1 << (n - 1).bit_length()) < n)
        out = patch_dropout_mask(jax.random.PRNGKey(1), mask, p)
        assert int(out.sum()) == int(n * p), (n, p)


def test_trainer_converges_on_separable_bags():
    rng = np.random.default_rng(7)
    bags = make_separable_bags(rng, num_bags=30, feats=24)
    cfg = DSMILConfig(feats_size=24, num_classes=1)
    trainer = BagTrainer(cfg, optimizer=adam_torch(betas=(0.5, 0.9), weight_decay=1e-3),
                         chunk_size=8)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    labels = np.asarray([float(b.label[0]) for b in bags])
    first_loss = None
    for epoch in range(12):
        params, opt_state, loss = trainer.train_epoch(params, opt_state, bags, 2e-4, rng)
        if first_loss is None:
            first_loss = loss
    scores, _ = trainer.predict(params, bags)
    acc, auc, *_ = metrics.five_scores(labels, scores[:, 0])
    assert loss < first_loss
    assert auc > 0.95, f"expected near-perfect train AUC on separable data, got {auc}"


def test_predict_order_and_average():
    rng = np.random.default_rng(1)
    bags = make_separable_bags(rng, num_bags=10, feats=16)
    cfg = DSMILConfig(feats_size=16, num_classes=1)
    trainer = BagTrainer(cfg, eval_batch=3)
    params, _ = trainer.init(jax.random.PRNGKey(0))
    scores, losses = trainer.predict(params, bags)
    # one-by-one must agree with batched-bucketed
    for i, b in enumerate(bags):
        s_i, _ = trainer.predict(params, [b])
        np.testing.assert_allclose(scores[i], s_i[0], rtol=1e-4, atol=1e-5)
    avg, _ = trainer.predict(params, bags, average=True)
    assert np.all(avg >= scores - 1e-6)  # sum of two sigmoids >= one sigmoid


# ---------------------------------------------------------------------------
# fused Pallas dispatch for giant bags (opt-in since the precision-parity fix:
# with every dot pinned to true f32, XLA's multi-pass matmuls beat the fused
# kernels on speed at every N — docs/PERF.md "Fused-kernel dispatch" — so the
# fused path is the opt-in O(tile)-memory scaling path, not the default)
# ---------------------------------------------------------------------------

def _clone(tree):
    return jax.tree.map(jnp.copy, tree)


def test_fused_dispatch_giant_bag(rng):
    """A 65,536-instance bag trains AND evaluates through the fused Pallas
    path when fused_threshold is set, with loss/param/score parity vs the
    XLA scan path. A small bag in the same epoch stays on the XLA path, and
    the default trainer never dispatches fused."""
    cfg = DSMILConfig(feats_size=64, num_classes=2)
    labels = np.eye(2, dtype=np.float32)
    bags = [
        Bag(rng.standard_normal((65536 - 7, 64)).astype(np.float32), labels[0]),
        Bag(rng.standard_normal((300, 64)).astype(np.float32), labels[1]),
    ]
    fused = BagTrainer(cfg, fused_threshold=16384)
    plain = BagTrainer(cfg)           # default: fused path off
    assert fused._use_fused(65536) and not fused._use_fused(8192)
    assert not plain._use_fused(65536)

    params, opt_state = fused.init(jax.random.PRNGKey(0))
    p1, o1, l1 = fused.train_epoch(_clone(params), _clone(opt_state), bags,
                                   lr=1e-4, rng=np.random.default_rng(3))
    assert fused.fused_dispatches == 1  # the giant bucket only
    p2, o2, l2 = plain.train_epoch(_clone(params), _clone(opt_state), bags,
                                   lr=1e-4, rng=np.random.default_rng(3))
    assert plain.fused_dispatches == 0
    np.testing.assert_allclose(l1, l2, rtol=2e-4)
    for k in ("i_fc", "fcc", "q"):
        a = jax.tree.flatten(p1[k])[0]
        b = jax.tree.flatten(p2[k])[0]
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=2e-5)

    s1, ls1 = fused.predict(p2, bags)
    assert fused.fused_dispatches == 2
    s2, ls2 = plain.predict(p2, bags)
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ls1, ls2, rtol=2e-4, atol=1e-5)


def test_fused_dispatch_device_store_epochs(rng):
    """The single-bucket fused-epochs path (DeviceBagStore) matches the XLA
    multi-epoch trajectory when the bucket crosses the threshold."""
    from tpumil.data.device_store import DeviceBagStore

    cfg = DSMILConfig(feats_size=32, num_classes=1)
    bags = [Bag(rng.standard_normal((16000 + 100 * i, 32)).astype(np.float32),
                np.asarray([i % 2], np.float32)) for i in range(3)]
    store = DeviceBagStore(bags)
    assert store.bucket_sizes == [16384]
    fused = BagTrainer(cfg, fused_threshold=16384)
    plain = BagTrainer(cfg)
    params, opt_state = fused.init(jax.random.PRNGKey(1))
    lrs = [1e-4, 5e-5]
    p1, o1, losses1 = fused.train_epochs(_clone(params), _clone(opt_state),
                                         store, lrs, np.random.default_rng(5))
    assert fused.fused_dispatches == 1
    p2, o2, losses2 = plain.train_epochs(_clone(params), _clone(opt_state),
                                         store, lrs, np.random.default_rng(5))
    np.testing.assert_allclose(losses1, losses2, rtol=2e-4)
    s1, _ = fused._predict_store(p1, store, average=False,
                                 rng=np.random.default_rng(0))
    s2, _ = plain._predict_store(p2, store, average=False,
                                 rng=np.random.default_rng(0))
    np.testing.assert_allclose(s1, s2, rtol=1e-3, atol=1e-4)


def test_train_epochs_multibucket_matches_sequential(rng):
    """Multi-bucket train_epochs (deferred per-bucket losses, dispatches
    pipelined with ONE host sync) must reproduce E sequential train_epoch
    calls EXACTLY — epoch-major visitation with identical rng consumption,
    so the pipelining is pure latency hiding, never a semantics change."""
    from tpumil.data.device_store import DeviceBagStore

    cfg = DSMILConfig(feats_size=32, num_classes=1)
    bags = [Bag(rng.standard_normal((n, 32)).astype(np.float32),
                np.asarray([i % 2], np.float32), f"b{i}")
            for i, n in enumerate((20, 25, 40, 60, 90, 130, 70, 35))]
    store = DeviceBagStore(bags)
    assert len(store.bucket_sizes) >= 3, store.bucket_sizes
    tr = BagTrainer(cfg)
    params, opt_state = tr.init(jax.random.PRNGKey(2))
    lrs = [1e-4, 8e-5, 5e-5]

    p1, o1, losses1 = tr.train_epochs(_clone(params), _clone(opt_state),
                                      store, lrs, np.random.default_rng(7))
    rng2 = np.random.default_rng(7)
    p2, o2 = _clone(params), _clone(opt_state)
    losses2 = []
    for lr in lrs:
        p2, o2, mean_loss = tr._train_epoch_store(p2, o2, store, lr, rng2)
        losses2.append(mean_loss)
    np.testing.assert_allclose(losses1, losses2, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_dispatch_ineligible_configs():
    """Patch dropout, abmil, passing_v, and bf16 compute stay on the XLA
    path even with a fused_threshold set; None disables entirely."""
    cfg = DSMILConfig(feats_size=16, num_classes=1)
    t = 16384
    assert not BagTrainer(cfg, dropout_patch=0.5, fused_threshold=t)._use_fused(65536)
    assert not BagTrainer(cfg, model="abmil", fused_threshold=t)._use_fused(65536)
    assert not BagTrainer(cfg, fused_threshold=None)._use_fused(65536)
    cfg_pv = DSMILConfig(feats_size=16, num_classes=1, passing_v=True)
    assert not BagTrainer(cfg_pv, fused_threshold=t)._use_fused(65536)
    cfg_bf = DSMILConfig(feats_size=16, num_classes=1,
                         compute_dtype=jnp.bfloat16)
    assert not BagTrainer(cfg_bf, fused_threshold=t)._use_fused(65536)


def test_fused_dispatch_auto_memory_routing():
    """VERDICT r2 #3: the default "auto" threshold routes per bucket on the
    MEASURED memory model — XLA whenever its estimated peak (resident
    bucket + working set) fits HBM_BUDGET_BYTES, fused beyond. Pins the
    probe-calibrated boundary so a coefficient regression is visible."""
    from tpumil.train.trainer import (HBM_BUDGET_BYTES,
                                      xla_train_workingset_bytes)

    cfg = DSMILConfig(feats_size=512, num_classes=1)
    tr = BagTrainer(cfg)  # default fused_threshold="auto"
    assert tr.fused_threshold == "auto"

    def bucket_bytes(b, n):
        return b * n * 512 * 4

    # Camelyon16-40x scale: a 2-bag 262k bucket stays on the (faster) XLA
    # path — the probe showed it fits (docs/PERF.md)
    assert not tr._use_fused(262144, bucket_bytes(2, 262144))
    # but 8 such bags resident, or a 2-bag 1M bucket, must go fused
    assert tr._use_fused(262144, bucket_bytes(8, 262144))
    assert tr._use_fused(1 << 20, bucket_bytes(2, 1 << 20))
    # ordinary buckets never dispatch fused
    assert not tr._use_fused(4096, bucket_bytes(64, 4096))
    # the estimate itself is linear in nmax and feats_size
    assert xla_train_workingset_bytes(2 * 4096) == \
        2 * xla_train_workingset_bytes(4096)
    assert xla_train_workingset_bytes(4096, 1024) == \
        2 * xla_train_workingset_bytes(4096, 512)
    # boundary consistency: auto switches exactly when the estimate
    # crosses the budget
    n = 262144
    for b in (2, 4, 8):
        est = bucket_bytes(b, n) + xla_train_workingset_bytes(n)
        assert tr._use_fused(n, bucket_bytes(b, n)) == (est > HBM_BUDGET_BYTES)
    # integer override still forces the fused path below the memory limit
    tr2 = BagTrainer(cfg, fused_threshold=16384)
    assert tr2._use_fused(16384, bucket_bytes(2, 16384))


def test_auto_dispatch_counts_extra_residents():
    """extra_resident_bytes (a co-resident global store during fold
    training) must push the auto estimate over the budget: a bucket that
    would take the XLA path alone must go fused when 10 GiB of other
    residents share the HBM."""
    from tpumil.train.trainer import HBM_BUDGET_BYTES

    cfg = DSMILConfig(feats_size=512, num_classes=1)
    tr = BagTrainer(cfg)
    nmax = 131072
    bucket = 2 * nmax * 512 * 4
    assert not tr._use_fused(nmax, bucket)
    tr.extra_resident_bytes = 10 * 2 ** 30
    assert tr._use_fused(nmax, bucket)


def test_mil_cv_rejects_torch_default_for_non_dsmil():
    """init='torch_default' only exists for dsmil; a silent orthogonal
    fallback would invalidate the init-deviation measurement the field is
    for — it must raise instead."""
    from tpumil.data.bags import Bag
    from tpumil.train.schemes import MILBenchConfig, run_mil_cv

    rng = np.random.default_rng(0)
    bags = [Bag(rng.standard_normal((8, 16)).astype(np.float32),
                np.asarray([float(i % 2)], np.float32), f"b{i}")
            for i in range(10)]
    cfg = MILBenchConfig(num_feats=16, num_epochs=1, cv_fold=2,
                         verbose=False, model="abmil", init="torch_default")
    with pytest.raises(ValueError, match="torch_default"):
        run_mil_cv(bags, cfg)


def _eval_chunk_inputs(rng, b=8, nmax=256, feats_size=64):
    feats = jnp.asarray(rng.standard_normal((b, nmax, feats_size))
                        .astype(np.float32))
    mask = jnp.ones((b, nmax), bool)
    labels = jnp.asarray((rng.random((b, 1)) > 0.5).astype(np.float32))
    keys = jax.random.split(jax.random.PRNGKey(7), b)
    return feats, mask, labels, keys


def test_eval_auto_splits_bag_axis(monkeypatch):
    """When the whole [b, nmax] eval chunk's estimated transients overflow
    the budget, the auto path halves the bag axis (free in math — bags are
    independent in eval) instead of dropping to the slower fused kernels;
    results must match the unsplit forward."""
    from tpumil.train import trainer as trainer_mod

    rng = np.random.default_rng(5)
    cfg = DSMILConfig(feats_size=64, num_classes=1)
    tr = BagTrainer(cfg)
    params, _ = tr.init(jax.random.PRNGKey(0))
    feats, mask, labels, keys = _eval_chunk_inputs(rng)

    ref = tr._eval_chunk(params, feats, mask, labels, keys, tr._pw())

    # effective 8 MiB/instance after the feats_size/512=0.125 scale:
    # fits(8*256) fails (16 GiB), fits(4*256) passes (8 GiB)
    monkeypatch.setattr(trainer_mod, "XLA_EVAL_BYTES_PER_INSTANCE",
                        64 * 2 ** 20)
    out = tr._eval_chunk_any(params, feats, mask, labels, keys, 256)
    assert tr.eval_splits == 1 and tr.fused_dispatches == 0
    for a, b_ in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-6)


def test_eval_auto_fused_when_one_bag_overflows(monkeypatch):
    """When even a single bag's forward does not fit, the auto eval path
    falls back to the fused O(tile) kernels (interpret mode off-TPU)."""
    from tpumil.train import trainer as trainer_mod

    rng = np.random.default_rng(6)
    cfg = DSMILConfig(feats_size=64, num_classes=1)
    tr = BagTrainer(cfg)
    params, _ = tr.init(jax.random.PRNGKey(0))
    b, nmax = 2, 512  # nmax == fused_tile: fused-eligible shape
    feats, mask, labels, keys = _eval_chunk_inputs(rng, b=b, nmax=nmax)

    ref = tr._eval_chunk(params, feats, mask, labels, keys, tr._pw())

    # effective 64 MiB/instance after the feats_size/512 scale: even 1*512
    # instances estimate to 32 GiB > budget
    monkeypatch.setattr(trainer_mod, "XLA_EVAL_BYTES_PER_INSTANCE",
                        512 * 2 ** 20)
    out = tr._eval_chunk_any(params, feats, mask, labels, keys, nmax)
    assert tr.fused_dispatches == 1 and tr.eval_splits == 0
    for a, b_ in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
