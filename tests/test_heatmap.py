"""Heatmap rendering + end-to-end inference tests (SURVEY.md section 4):
image ops semantics, grid render math, full patch->PNG pipeline."""

import glob
import os

import numpy as np
import pytest
import jax

from tpumil.ops.image import (
    img_as_ubyte,
    mean_saturation_ubyte,
    rescale_intensity,
    upscale_nearest,
)
from tpumil.infer.heatmap import (
    BagInference,
    render_color_map,
    render_single_class_map,
    run_attention_maps,
)
from tpumil.models import dsmil, embedder
from tpumil.models.dsmil import DSMILConfig
from tpumil.models.embedder import EmbedderConfig

import jax.numpy as jnp


def test_rescale_intensity():
    x = np.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(rescale_intensity(x), [0.0, 0.5, 1.0])
    # constant image: skimage returns the constant clipped into out_range
    np.testing.assert_allclose(rescale_intensity(np.full(3, 7.0)), [1.0, 1.0, 1.0])
    np.testing.assert_allclose(rescale_intensity(np.full(3, 0.5)), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(rescale_intensity(np.full(3, -3.0)), [0.0, 0.0, 0.0])
    np.testing.assert_allclose(rescale_intensity(x, (0, 255)), [0.0, 127.5, 255.0])


def test_upscale_nearest():
    x = np.asarray([[1.0, 2.0], [3.0, 4.0]])[..., None]
    up = upscale_nearest(x, 2)
    assert up.shape == (4, 4, 1)
    np.testing.assert_array_equal(up[:2, :2, 0], [[1, 1], [1, 1]])


def test_img_as_ubyte():
    np.testing.assert_array_equal(img_as_ubyte(np.asarray([0.0, 0.5, 1.0, 1.5])),
                                  [0, 128, 255, 255])


def test_saturation():
    # pure red is fully saturated; gray has zero saturation
    red = np.zeros((2, 2, 3)); red[..., 0] = 1.0
    gray = np.full((2, 2, 3), 0.5)
    assert mean_saturation_ubyte(red) == 255.0
    assert mean_saturation_ubyte(gray) == 0.0


def test_render_color_map_math(rng):
    n, c = 6, 2
    attn = rng.random((n, c))
    positions = np.asarray([[i // 3, i % 3] for i in range(n)])
    colors = [np.asarray([255, 0, 0]), np.asarray([0, 255, 0])]
    out = render_color_map(attn, positions, [0, 1], colors, upscale=4)
    assert out.shape == (2 * 4, 3 * 4, 3)
    # oracle: sum of per-class colored attention / num classes, rescaled
    colored = (attn[:, 0:1] * colors[0][None] + attn[:, 1:2] * colors[1][None]) / 2
    want = rescale_intensity(colored, (0, 1))
    np.testing.assert_allclose(out[0, 0], want[0], atol=1e-12)   # pos (0,0)
    np.testing.assert_allclose(out[4, 8], want[5], atol=1e-12)   # pos (1,2)
    # benign: all-zero, no NaN (reference's 0/0 quirk fixed deliberately)
    benign = render_color_map(attn, positions, [], colors, upscale=4)
    assert np.all(benign == 0.0) and not np.any(np.isnan(benign))


def _make_patch_bags(tmp_path, rng, n_bags=2, rows=2, cols=3, size=32):
    from PIL import Image

    root = str(tmp_path / "patches")
    for b in range(n_bags):
        d = os.path.join(root, f"slide{b}")
        os.makedirs(d, exist_ok=True)
        for r in range(rows):
            for c in range(cols):
                arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{r}_{c}.jpg"))
    return root


def test_end_to_end_heatmaps(tmp_path, rng):
    root = _make_patch_bags(tmp_path, rng)
    emb_cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    emb_params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    agg_params = dsmil.init_params(jax.random.PRNGKey(1),
                                   DSMILConfig(feats_size=512, num_classes=1))
    infer = BagInference(emb_params, emb_cfg, agg_params, batch_size=4,
                         patch_size=32, num_workers=2)
    map_path = str(tmp_path / "maps")
    score_path = str(tmp_path / "scores")
    results = run_attention_maps(
        infer, sorted(glob.glob(os.path.join(root, "*"))),
        thresholds=[0.0],  # force detection so maps are non-trivial
        class_names=["tumor"], map_path=map_path, score_path=score_path,
        seed=0, log=lambda s: None)
    assert len(results) == 2
    pngs = sorted(glob.glob(os.path.join(map_path, "*.png")))
    assert len(pngs) == 2
    from PIL import Image

    im = np.asarray(Image.open(pngs[0]))
    assert im.shape == (2 * 32, 3 * 32, 3)  # grid x32 upscale
    assert im.max() > 0  # detected -> non-black map
    # score CSV contract: C columns + 'pos'
    import pandas as pd

    df = pd.read_csv(sorted(glob.glob(os.path.join(score_path, "*.csv")))[0])
    assert list(df.columns) == ["0", "pos"]
    assert len(df) == 6
    # attention sums to 1 over instances (softmax over N)
    np.testing.assert_allclose(results[0].attention.sum(axis=0), [1.0], atol=1e-4)


def test_mesh_sharded_bag_inference(tmp_path, rng):
    """BagInference(mesh=...) shards patch batches over every mesh axis
    (the attention_map --data_parallel path): bag scores / attention /
    instance logits must match the unsharded run to float tolerance
    (sharded XLA reductions partition differently), and a batch_size not
    divisible by the device count raises the helper's ValueError."""
    from tpumil.parallel.mesh import make_mesh

    root = _make_patch_bags(tmp_path, rng, n_bags=1)
    bag_dir = sorted(glob.glob(os.path.join(root, "*")))[0]
    emb_cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    emb_params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    agg_params = dsmil.init_params(jax.random.PRNGKey(1),
                                   DSMILConfig(feats_size=512, num_classes=1))

    plain = BagInference(emb_params, emb_cfg, agg_params, batch_size=8,
                         patch_size=32, num_workers=2)
    scores, attn, logits, pos = plain.run_bag(bag_dir)

    mesh = make_mesh(8)  # default (data=4, inst=2): both axes must shard
    sharded = BagInference(emb_params, emb_cfg, agg_params, batch_size=8,
                           patch_size=32, num_workers=2, mesh=mesh)
    s_scores, s_attn, s_logits, s_pos = sharded.run_bag(bag_dir)
    np.testing.assert_array_equal(s_pos, pos)
    np.testing.assert_allclose(s_scores, scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s_logits, logits, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(s_attn, attn, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="divide"):
        BagInference(emb_params, emb_cfg, agg_params, batch_size=12,
                     patch_size=32, mesh=mesh)


def test_testing_cli_data_parallel_parity(tmp_path, rng):
    """`testing_tcga --data_parallel 8` (the mesh BagInference path) writes
    the same verdict map as the single-device run — PNGs byte-close (the
    render quantizes to ubyte, so sharded-reduction float noise vanishes)."""
    from PIL import Image

    from tpumil.cli import testing_tcga
    from tpumil.io import torch_ckpt

    root = _make_patch_bags(tmp_path, rng, n_bags=1)
    emb_cfg = EmbedderConfig(num_classes=2, compute_dtype=jnp.float32)
    emb_params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    emb_path = str(tmp_path / "embedder.pth")
    torch_ckpt.save_state_dict(
        embedder.export_embedder_state_dict(emb_params, emb_cfg), emb_path)
    agg_params = dsmil.init_params(jax.random.PRNGKey(1),
                                   DSMILConfig(feats_size=512, num_classes=2))
    agg_path = str(tmp_path / "aggregator.pth")
    torch_ckpt.save_mil_pth(jax.tree.map(np.asarray, agg_params), agg_path)

    base = ["--bag_path", root, "--embedder_weights", emb_path,
            "--aggregator_weights", agg_path, "--batch_size", "8",
            "--thres_luad", "0.0", "--thres_lusc", "1.1",  # force LUAD
            "--device", "cpu"]
    assert testing_tcga.main(
        base + ["--output", str(tmp_path / "plain")]) == 0
    assert testing_tcga.main(
        base + ["--output", str(tmp_path / "dp"), "--data_parallel", "8"]) == 0
    a = np.asarray(Image.open(tmp_path / "plain" / "slide0.png"), np.int32)
    b = np.asarray(Image.open(tmp_path / "dp" / "slide0.png"), np.int32)
    assert a.shape == b.shape and np.abs(a - b).max() <= 2


def test_benign_map_is_black(tmp_path, rng):
    root = _make_patch_bags(tmp_path, rng, n_bags=1)
    emb_cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    emb_params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    agg_params = dsmil.init_params(jax.random.PRNGKey(1),
                                   DSMILConfig(feats_size=512, num_classes=1))
    infer = BagInference(emb_params, emb_cfg, agg_params, batch_size=4,
                         patch_size=32, num_workers=2)
    results = run_attention_maps(
        infer, sorted(glob.glob(os.path.join(root, "*"))),
        thresholds=[1.1],  # impossible -> benign
        class_names=["tumor"], map_path=str(tmp_path / "maps"),
        seed=0, keep_maps=True, log=lambda s: None)
    assert results[0].detected == []
    assert np.all(results[0].color_map == 0.0)


def test_render_single_class_map_matches_testing_script_math(rng):
    """The testing scripts rescale the RAW attention (min-subtraction
    included) and then scale a unit color — different from attention_map's
    color-then-rescale order. Oracle transcribed from testing_tcga.py:
    102-108."""
    n = 7
    attn = rng.random((n, 2)) * 0.3 + 0.1  # strictly positive mins
    positions = np.stack([np.arange(n) // 3, np.arange(n) % 3], 1)
    color = np.asarray([0.0, 1.0, 0.0])
    got = render_single_class_map(attn[:, 0], positions, color, upscale=2)

    a = attn[:, 0]
    scaled = (a - a.min()) / (a.max() - a.min())
    grid = np.zeros((positions[:, 0].max() + 1, positions[:, 1].max() + 1, 3))
    for k, p in enumerate(positions):
        grid[p[0], p[1]] = color * scaled[k]
    want = np.repeat(np.repeat(grid, 2, 0), 2, 1)
    np.testing.assert_allclose(got, want, atol=1e-12)
    # the least-attended tile is black (min-subtraction preserved) — the
    # property render_color_map's order loses
    k_min = int(np.argmin(a))
    assert np.all(got[positions[k_min, 0] * 2, positions[k_min, 1] * 2] == 0.0)
