"""Streaming tile->embed path: feature parity with the two-stage (JPEG
folder) pipeline up to JPEG loss, and the dataset-level driver."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.data.tiler import TilerConfig, tile_slide
from tpumil.infer.features import FeatureExtractor, compute_feats
from tpumil.infer.stream_embed import embed_dataset_streaming, embed_slide_streaming
from tpumil.models import embedder
from tpumil.models.embedder import EmbedderConfig


def _make_slide(tmp_path, rng, name="s1", cls="tumor"):
    from PIL import Image

    img = np.full((512, 512, 3), 255, np.uint8)
    img[:256, :256] = (rng.random((256, 256, 3)) * 200 + 20).astype(np.uint8)
    pages = [Image.fromarray(img)]
    pages.append(pages[0].resize((256, 256)))
    d = tmp_path / "WSI" / "demo" / cls
    d.mkdir(parents=True, exist_ok=True)
    path = str(d / f"{name}.tif")
    pages[0].save(path, save_all=True, append_images=pages[1:])
    return path


def test_streaming_matches_folder_pipeline(tmp_path, rng):
    slide = _make_slide(tmp_path, rng)
    cfg = TilerConfig(tile_size=128, workers=2, base_mag=20, objective=20)
    emb_cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    ex = FeatureExtractor(params, emb_cfg, batch_size=4, patch_size=128,
                          num_workers=2)

    feats_stream, positions, stats = embed_slide_streaming(
        slide, ex, (0,), cfg, batch_size=4)
    assert stats.tiles_kept == feats_stream.shape[0] > 0

    # exact parity vs direct embedding of the same tiles (no JPEG step)
    from tpumil.data.slide import DeepZoom, magnification_plan, open_slide

    sl = open_slide(slide)
    dz = DeepZoom(sl, cfg.tile_size)
    (dz_level, _), = magnification_plan(dz, (0,), cfg.base_mag, cfg.objective)
    for pos, s_row in zip(positions[:4], feats_stream[:4]):
        tile = dz.get_tile(dz_level, tuple(pos)).astype(np.float32) / 255.0
        direct = ex.embed_arrays(np.stack([tile] * 4))[0]  # batch shape 4
        np.testing.assert_allclose(s_row, direct, rtol=1e-4, atol=1e-4)
    sl.close()

    # the folder pipeline keeps the same tile set (JPEG re-encode makes the
    # feature values themselves incomparable for noise textures)
    out = str(tmp_path / "patches")
    tile_slide(slide, out, (0,), cfg, img_class="c")
    bag_dir = os.path.join(out, "c", "s1")
    from tpumil.data.patches import list_patches, parse_position

    folder_pos = sorted(parse_position(p) for p in list_patches(bag_dir))
    assert folder_pos == sorted(map(tuple, positions.tolist()))


def test_embed_dataset_streaming(tmp_path, rng):
    _make_slide(tmp_path, rng, "a", "tumor")
    _make_slide(tmp_path, rng, "b", "normal")
    cfg = TilerConfig(tile_size=128, workers=2, base_mag=20, objective=20)
    emb_cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    ex = FeatureExtractor(params, emb_cfg, batch_size=4, patch_size=128,
                          num_workers=2)
    master = embed_dataset_streaming(
        str(tmp_path / "WSI"), "demo", ex, str(tmp_path / "datasets"), cfg,
        "tif", (0,), batch_size=4, log=lambda s: None)
    assert os.path.exists(master)
    import pandas as pd

    df = pd.read_csv(master)
    assert len(df) == 2 and set(df["label"]) == {0, 1}
    # position sidecars exist per bag, match the bag's row count, and are
    # NOT listed as bags in the master CSV
    for bag_path in df[df.columns[0]]:
        pos = bag_path[:-4] + ".pos.csv"
        assert os.path.exists(pos), pos
        n_feats = len(pd.read_csv(bag_path))
        pos_df = pd.read_csv(pos)
        assert list(pos_df.columns) == ["col", "row"]
        assert len(pos_df) == n_feats
        assert not bag_path.endswith(".pos.csv")


def test_embed_slides_streaming_pipelined(tmp_path, rng):
    """Multi-slide pipelining: per-slide results arrive in input order and
    match the single-slide path exactly; abandoning the generator early
    stops the producer cleanly."""
    from tpumil.infer.stream_embed import embed_slides_streaming

    paths = [_make_slide(tmp_path, rng, f"s{i}", "tumor") for i in range(3)]
    cfg = TilerConfig(tile_size=128, workers=2, base_mag=20, objective=20)
    emb_cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    params = embedder.init_params(jax.random.PRNGKey(0), emb_cfg)
    ex = FeatureExtractor(params, emb_cfg, batch_size=4, patch_size=128,
                          num_workers=2)

    singles = [embed_slide_streaming(p, ex, (0,), cfg, batch_size=4)
               for p in paths]
    outs = list(embed_slides_streaming(paths, ex, (0,), cfg, batch_size=4))
    assert len(outs) == 3
    for (f1, p1, s1), (f2, p2, _) in zip(outs, singles):
        assert s1.tiles_kept == f1.shape[0] > 0
        np.testing.assert_array_equal(p1, p2)
        np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-6)

    # early abandonment: take one slide, drop the generator; no hang
    gen = embed_slides_streaming(paths, ex, (0,), cfg, batch_size=4)
    first = next(gen)
    assert first[0].shape[0] > 0
    gen.close()
