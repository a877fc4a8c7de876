"""Remaining component coverage: baseline encoder, the 5-time eval scheme,
native TIFF concurrency stress (regression guard for the libtiff race)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from synth import make_separable_bags


def test_baseline_encoder_forward(rng):
    from tpumil.models import baseline_encoder

    params = baseline_encoder.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    h, z = baseline_encoder.forward(params, x)
    assert h.shape == (2, 256) and z.shape == (2, 256)
    assert np.all(np.isfinite(np.asarray(z)))


def test_5time_tvt_scheme(rng):
    from tpumil.train.schemes import WSITrainConfig, run_5time_tvt

    bags = make_separable_bags(rng, num_bags=30, feats=16, signal=6.0,
                               pos_inst_frac=0.5)
    cfg = WSITrainConfig(feats_size=16, num_classes=1, num_epochs=3,
                         stop_epochs=2, lr=1e-3, verbose=False, seed=0)
    out = run_5time_tvt(bags, cfg, log=lambda s: None)
    assert len(out["iterations"]) == 5
    for it in out["iterations"]:
        assert "test_acc" in it and "test_aucs" in it
        assert 0.0 <= it["test_acc"] <= 1.0


def test_native_tiff_concurrent_reads(tmp_path, rng):
    """Hammer one NativeTiff handle from many threads — the libtiff handle
    lock must prevent the heap corruption observed before the fix."""
    from tpumil.utils import native

    if not native.available():
        pytest.skip("native tile service not built")
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    img = (rng.random((512, 512, 3)) * 255).astype(np.uint8)
    pages = [Image.fromarray(img)]
    pages.append(pages[0].resize((256, 256)))
    path = str(tmp_path / "pyr.tif")
    pages[0].save(path, save_all=True, append_images=pages[1:])

    tif = native.NativeTiff(path)

    def read(i):
        lv = i % 2
        x, y = (i * 37) % 400, (i * 53) % 400
        out = tif.read_region(lv, x % 200, y % 200, 64, 64)
        return int(out.sum())

    with ThreadPoolExecutor(8) as pool:
        results = list(pool.map(read, range(200)))
    assert len(results) == 200
    # determinism: same read twice gives identical bytes
    a = tif.read_region(0, 10, 10, 64, 64)
    b = tif.read_region(0, 10, 10, 64, 64)
    np.testing.assert_array_equal(a, b)
    tif.close()


def test_poolmil_forward_semantics(rng):
    """Mean-/max-pooling baselines: bag logits equal the masked mean/max of
    the instance logits, A carries the implied pooling weights, and padded
    rows are invisible."""
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.models.registry import get_model

    cfg = DSMILConfig(feats_size=8, num_classes=3)
    feats = rng.standard_normal((10, 8)).astype(np.float32)
    pad = np.concatenate([feats, rng.standard_normal((6, 8)).astype(np.float32)])
    mask = np.arange(16) < 10

    for name in ("meanpool", "maxpool"):
        mil = get_model(name)
        params = mil.init_params(jax.random.PRNGKey(0), cfg)
        c, bag, attn, bemb = (np.asarray(t) for t in mil.forward(
            params, jnp.asarray(pad), jnp.asarray(mask)))
        c_real = c[:10]
        want = c_real.mean(0) if name == "meanpool" else c_real.max(0)
        np.testing.assert_allclose(bag, want, rtol=1e-6)
        # attention: zero on padding, normalized over real rows
        assert np.all(attn[10:] == 0.0)
        np.testing.assert_allclose(attn.sum(0), np.ones(3), rtol=1e-6)
        if name == "maxpool":
            assert np.array_equal(np.argmax(attn, axis=0), np.argmax(c_real, axis=0))
        np.testing.assert_allclose(bemb, attn.T @ pad, rtol=1e-5, atol=1e-6)
        # padding invariance vs the unpadded bag
        _, bag0, _, bemb0 = (np.asarray(t) for t in mil.forward(
            params, jnp.asarray(feats)))
        np.testing.assert_allclose(bag, bag0, rtol=1e-6)
        np.testing.assert_allclose(bemb, bemb0, rtol=1e-5, atol=1e-6)
        # max_instance_logits contract
        np.testing.assert_allclose(
            np.asarray(mil.max_instance_logits(jnp.asarray(c), jnp.asarray(mask))),
            c_real.max(0), rtol=1e-6)


def test_poolmil_trains_and_ckpt_roundtrips(tmp_path, rng):
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer
    from tpumil.io import torch_ckpt

    bags = make_separable_bags(rng, num_bags=12, feats=16, signal=5.0,
                               pos_inst_frac=0.4)
    for name in ("meanpool", "maxpool"):
        trainer = BagTrainer(DSMILConfig(feats_size=16, num_classes=1),
                             model=name, chunk_size=4)
        params, opt_state = trainer.init(jax.random.PRNGKey(0))
        params, opt_state, loss0 = trainer.train_epoch(params, opt_state, bags,
                                                       1e-3, rng)
        for _ in range(4):
            params, opt_state, loss = trainer.train_epoch(params, opt_state,
                                                          bags, 1e-3, rng)
        assert loss < loss0
        scores, _ = trainer.predict(params, bags)
        assert scores.shape == (12, 1)

        path = str(tmp_path / f"{name}.pth")
        torch_ckpt.save_mil_pth(jax.tree.map(np.asarray, params), path, name)
        params2, cfg2, model2 = torch_ckpt.load_mil_pth(path)
        assert model2 == name and cfg2.feats_size == 16 and cfg2.num_classes == 1
        np.testing.assert_array_equal(np.asarray(params["i_fc"]["w"]),
                                      np.asarray(params2["i_fc"]["w"]))
