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
