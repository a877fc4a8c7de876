"""Utilities tests: throughput meters, scalar logging, orbax checkpoints,
reference metric quirks."""

import json
import os
import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.train import metrics
from tpumil.utils.prof import ScalarLogger, ThroughputMeter


def test_throughput_meter():
    m = ThroughputMeter("patches")
    m.add(10)
    time.sleep(0.01)
    m.add(10)
    assert m.total == 20
    assert m.rate > 0
    assert "patches/s" in str(m)


def test_scalar_logger(tmp_path):
    logger = ScalarLogger(str(tmp_path), tensorboard=False)
    logger.log("train_loss", 1.5, 0)
    logger.log("train_loss", 1.2, 1)
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert [l["value"] for l in lines] == [1.5, 1.2]


def test_orbax_roundtrip(tmp_path):
    from tpumil.io.native_ckpt import load_train_state, save_train_state
    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.optim import adam_torch

    cfg = DSMILConfig(feats_size=16, num_classes=1)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    opt = adam_torch()
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt")
    save_train_state(path, params, opt_state, epoch=7, extra={"fold": 2})
    state = load_train_state(path)
    assert state["epoch"] == 7 and state["extra"]["fold"] == 2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_sharded_roundtrip_single_device_no_warning(tmp_path):
    """The sharded-state API (io/native_ckpt.py) must restore WITHOUT
    orbax's 'Sharding info not provided ... unsafe on a different topology'
    warning, including in the plain single-device case (multi-device
    coverage: tests/test_parallel.py)."""
    import warnings

    from tpumil.io.native_ckpt import (load_sharded_train_state,
                                       save_sharded_train_state)
    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.optim import adam_torch

    cfg = DSMILConfig(feats_size=16, num_classes=1)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = adam_torch().init(params)
    path = str(tmp_path / "ckpt")
    save_sharded_train_state(path, {"params": params, "opt_state": opt_state},
                             meta={"epoch": 7, "note": "x"})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st, meta = load_sharded_train_state(
            path, {"params": params, "opt_state": opt_state})
    assert not [x for x in w if "Sharding info not provided" in str(x.message)]
    assert meta == {"epoch": 7, "note": "x"}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(st["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multi_label_roc_single_class_auc_is_one():
    """Reference quirk: AUC := 1 when a fold's test split has one class
    (train_tcga.py:150-158)."""
    labels = np.ones((5, 1))
    preds = np.linspace(0, 1, 5)[:, None]
    aucs, _, thresholds = metrics.multi_label_roc(labels, preds, 1)
    assert aucs == [1.0]


def test_optimal_thresh_matches_reference_formula():
    fpr = np.asarray([0.0, 0.2, 0.5, 1.0])
    tpr = np.asarray([0.0, 0.8, 0.9, 1.0])
    th = np.asarray([0.9, 0.6, 0.4, 0.1])
    _, _, t = metrics.optimal_thresh(fpr, tpr, th)
    # argmin of (fpr - tpr): index 1 (0.2 - 0.8 = -0.6)
    assert t == 0.6


def test_current_score():
    assert metrics.current_score(0.8, [0.9, 0.7]) == pytest.approx((1.6 + 0.8) / 2)


def test_decode_patch_high_bitdepth_parity(tmp_path, rng):
    """Non-8-bit sources (16-bit grayscale PNG) decode identically on the
    as_float and uint8 paths — convert('RGB') reduces bit depth before any
    dtype cast, so nothing wraps."""
    from PIL import Image

    from tpumil.data.patches import decode_patch

    arr16 = (rng.random((32, 32)) * 65535).astype(np.uint16)
    path = str(tmp_path / "deep.png")
    Image.fromarray(arr16, mode="I;16").save(path)
    f = decode_patch(path, as_float=True)
    u = decode_patch(path, as_float=False)
    assert u.dtype == np.uint8 and f.dtype == np.float32
    np.testing.assert_allclose(f, u.astype(np.float32) / 255.0)
    assert f.max() <= 1.0 and f.shape == (32, 32, 3)


def test_sharded_save_is_crash_safe(tmp_path):
    """In-place overwrites swap atomically: (a) repeated saves leave only
    the newest state; (b) a crash BETWEEN the two swap renames (old already
    moved to .prev, new not yet in place) still restores via the .prev
    fallback; (c) a crash DURING the inflight write leaves the previous
    checkpoint untouched and loadable."""
    import os as _os
    import shutil

    from tpumil.io.native_ckpt import (load_sharded_train_state,
                                       save_sharded_train_state)

    path = str(tmp_path / "state")
    like = {"w": np.zeros((4,), np.float32)}
    save_sharded_train_state(path, {"w": np.full((4,), 1.0, np.float32)},
                             meta={"gen": 1})
    save_sharded_train_state(path, {"w": np.full((4,), 2.0, np.float32)},
                             meta={"gen": 2})
    st, meta = load_sharded_train_state(path, like)
    assert meta["gen"] == 2 and float(st["w"][0]) == 2.0
    assert not _os.path.exists(path + ".inflight")
    assert not _os.path.exists(path + ".prev")

    # (b) crash between renames: path gone, .prev holds the last good state
    _os.rename(path, path + ".prev")
    st, meta = load_sharded_train_state(path, like)
    assert meta["gen"] == 2 and float(st["w"][0]) == 2.0
    _os.rename(path + ".prev", path)

    # (c) crash mid-inflight-write: garbage .inflight must not break loads,
    # and the next save must clear it
    _os.makedirs(path + ".inflight")
    with open(_os.path.join(path + ".inflight", "junk"), "w") as f:
        f.write("partial")
    st, meta = load_sharded_train_state(path, like)
    assert meta["gen"] == 2
    save_sharded_train_state(path, {"w": np.full((4,), 3.0, np.float32)},
                             meta={"gen": 3})
    st, meta = load_sharded_train_state(path, like)
    assert meta["gen"] == 3 and float(st["w"][0]) == 3.0
    shutil.rmtree(str(tmp_path / "state"), ignore_errors=True)


def test_probe_backend_timeout_escalation(monkeypatch):
    """Cold-tunnel lesson (round 4): per-attempt probe timeouts must escalate
    1.5x so a warming tunnel whose first touch exceeds the base timeout still
    gets a longer later attempt, while total time stays bounded."""
    import subprocess
    from tpumil.utils import platform as plat

    seen = []

    def fake_run(cmd, capture_output, text, timeout):
        seen.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    ok, detail = plat.probe_backend(attempts=3, timeout_s=90.0)
    assert not ok
    assert seen == [90.0, 135.0, pytest.approx(202.5)]
    assert "202" in detail


def test_probe_backend_success_detail(monkeypatch):
    import types
    from tpumil.utils import platform as plat

    def fake_run(cmd, capture_output, text, timeout):
        return types.SimpleNamespace(returncode=0, stdout="cpu 1 512.0\n",
                                     stderr="")

    import subprocess
    monkeypatch.setattr(subprocess, "run", fake_run)
    ok, detail = plat.probe_backend(attempts=3, timeout_s=90.0)
    assert ok and detail == "cpu 1 512.0"


def test_sharded_save_after_crash_resume_never_orphans(tmp_path, monkeypatch):
    """The fatal sequence the swap ordering must survive: save N crashed
    between its two renames (only .prev exists), the run resumed from
    .prev, and save N+1 runs. The old ordering deleted .prev FIRST — a kill
    before the new rename left NO loadable checkpoint. Now .prev must stay
    loadable until the new `path` is in place."""
    import os as _os

    from tpumil.io import native_ckpt
    from tpumil.io.native_ckpt import (load_sharded_train_state,
                                       save_sharded_train_state)

    path = str(tmp_path / "state")
    like = {"w": np.zeros((4,), np.float32)}
    save_sharded_train_state(path, {"w": np.full((4,), 1.0, np.float32)},
                             meta={"gen": 1})
    # simulate the mid-swap crash: path gone, .prev is the only copy
    _os.rename(path, path + ".prev")

    # kill the next save at EVERY possible rename boundary and require a
    # loadable checkpoint at each
    real_rename = _os.rename
    for crash_at in (0, 1, None):  # before 1st rename, before 2nd, no crash
        calls = {"n": 0}

        def rename(src, dst):
            if crash_at is not None and calls["n"] == crash_at:
                raise KeyboardInterrupt("simulated kill")
            calls["n"] += 1
            return real_rename(src, dst)

        monkeypatch.setattr(native_ckpt.os, "rename", rename)
        try:
            save_sharded_train_state(
                path, {"w": np.full((4,), 2.0, np.float32)}, meta={"gen": 2})
        except KeyboardInterrupt:
            pass
        monkeypatch.setattr(native_ckpt.os, "rename", real_rename)
        st, meta = load_sharded_train_state(path, like)
        assert meta["gen"] in (1, 2)  # SOME generation always loads
        if crash_at is None:
            assert meta["gen"] == 2 and not _os.path.exists(path + ".prev")
        else:
            # crashed: re-enter the resumed-from-.prev-only state for the
            # next loop iteration
            if _os.path.exists(path):
                import shutil
                shutil.rmtree(path + ".prev", ignore_errors=True)
                real_rename(path, path + ".prev")
