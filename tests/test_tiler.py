"""Tiling tests on synthetic pyramidal TIFFs (SURVEY.md section 4 tier 4):
deep-zoom geometry, magnification->level math, background filtering, and the
single/pyramid folder layouts."""

import glob
import os

import numpy as np
import pytest

from tpumil.data.slide import DeepZoom, ImageBackend, TiffBackend, magnification_plan, open_slide
from tpumil.data.tiler import TilerConfig, TileStats, edge_energy, tile_slide


def _make_synthetic_slide(rng, w=1024, h=768, tissue_frac=0.4):
    """Full-res slide: white background with a textured 'tissue' region."""
    img = np.full((h, w, 3), 255, np.uint8)
    tw, th = int(w * tissue_frac), int(h * tissue_frac)
    tissue = (rng.random((th, tw, 3)) * 200 + 20).astype(np.uint8)
    img[:th, :tw] = tissue
    return img


def _save_pyramidal_tiff(img, path, levels=3):
    from PIL import Image

    pages = [Image.fromarray(img)]
    for _ in range(levels - 1):
        prev = pages[-1]
        pages.append(prev.resize((max(1, prev.width // 2), max(1, prev.height // 2))))
    pages[0].save(path, save_all=True, append_images=pages[1:],
                  description="Aperio Fake |AppMag = 20|")
    return path


def test_tiff_backend(tmp_path, rng):
    img = _make_synthetic_slide(rng)
    path = _save_pyramidal_tiff(img, str(tmp_path / "slide.tif"))
    slide = TiffBackend(path)
    assert slide.level_count == 3
    assert slide.level_dimensions[0] == (1024, 768)
    assert slide.level_dimensions[1] == (512, 384)
    assert slide.objective_power(40) == 20.0  # parsed from AppMag
    region = slide.read_region((0, 0), 0, (64, 64))
    np.testing.assert_array_equal(region, img[:64, :64])
    # level-1 read with level-0 coordinates
    region1 = slide.read_region((128, 128), 1, (32, 32))
    assert region1.shape == (32, 32, 3)


def test_deepzoom_geometry(tmp_path, rng):
    img = _make_synthetic_slide(rng)
    slide = ImageBackend(img)
    dz = DeepZoom(slide, tile_size=224, overlap=0)
    # 1024 wide -> levels: 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1 = 11
    assert dz.level_count == 11
    assert dz.level_dimensions_dz[-1] == (1024, 768)
    assert dz.level_tiles(dz.level_count - 1) == (5, 4)  # ceil(1024/224), ceil(768/224)
    tile = dz.get_tile(dz.level_count - 1, (0, 0))
    np.testing.assert_array_equal(tile, img[:224, :224])
    # edge tile is cropped
    edge_tile = dz.get_tile(dz.level_count - 1, (4, 3))
    assert edge_tile.shape == (768 - 3 * 224, 1024 - 4 * 224, 3)


def test_magnification_plan(tmp_path, rng):
    img = _make_synthetic_slide(rng)
    slide = ImageBackend(img)
    slide.properties = {"openslide.objective-power": "40"}
    dz = DeepZoom(slide, 224)
    # base 20x from a 40x scan: first_level = 1 -> top-1
    plan = magnification_plan(dz, (0,), base_mag=20, objective=20)
    assert plan == [(dz.level_count - 2, 20)]
    # two mags (0, 2): 20x and 5x
    plan2 = magnification_plan(dz, (0, 2), base_mag=20, objective=20)
    assert plan2 == [(dz.level_count - 2, 20), (dz.level_count - 4, 5)]


def test_edge_energy_filters_background(rng):
    white = np.full((224, 224, 3), 255, np.uint8)
    textured = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
    # PIL FIND_EDGES has border artifacts, so plain white lands ~4.5 — still
    # below the reference's default threshold 15 (deepzoom_tiler.py:255)
    assert edge_energy(white, 224) < 15.0
    assert edge_energy(textured, 224) > 15.0


def test_tile_slide_single(tmp_path, rng):
    img = _make_synthetic_slide(rng, w=512, h=512, tissue_frac=0.5)
    path = _save_pyramidal_tiff(img, str(tmp_path / "s1.tif"), levels=2)
    out = str(tmp_path / "out")
    cfg = TilerConfig(tile_size=128, workers=2, base_mag=20, objective=20)
    stats = tile_slide(path, out, (0,), cfg, img_class="tumor")
    tiles = sorted(glob.glob(os.path.join(out, "tumor", "s1", "*.jpeg")))
    # tissue occupies the top-left quadrant (256x256 = 2x2 tiles of 128)
    assert stats.written == len(tiles)
    assert stats.written >= 3  # at least the tissue tiles + boundary
    assert stats.filtered > 0  # white background rejected
    names = {os.path.basename(t) for t in tiles}
    assert "0_0.jpeg" in names
    assert "3_3.jpeg" not in names  # pure white corner
    from PIL import Image

    with Image.open(tiles[0]) as im:
        assert im.size == (128, 128)


def test_tile_slide_pyramid(tmp_path, rng):
    img = _make_synthetic_slide(rng, w=1024, h=1024, tissue_frac=0.5)
    path = _save_pyramidal_tiff(img, str(tmp_path / "s2.tif"), levels=3)
    out = str(tmp_path / "out")
    cfg = TilerConfig(tile_size=128, workers=2, base_mag=20, objective=20)
    stats = tile_slide(path, out, (0, 1), cfg, img_class="c")
    bag = os.path.join(out, "c", "s2")
    low = sorted(glob.glob(os.path.join(bag, "*.jpeg")))
    assert low, "no low-mag patches kept"
    for lp in low:
        stem = os.path.splitext(os.path.basename(lp))[0]
        children = glob.glob(os.path.join(bag, stem, "*.jpeg"))
        assert children, f"low patch {stem} has no high-mag children"
        lx, ly = map(int, stem.split("_"))
        for ch in children:
            hx, hy = map(int, os.path.splitext(os.path.basename(ch))[0].split("_"))
            assert lx * 2 <= hx < (lx + 1) * 2
            assert ly * 2 <= hy < (ly + 1) * 2


def test_open_slide_fallbacks(tmp_path, rng):
    from PIL import Image

    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    png = str(tmp_path / "x.png")
    Image.fromarray(img).save(png)
    slide = open_slide(png)
    assert slide.level_count == 1
    np.testing.assert_array_equal(slide.read_region((0, 0), 0, (8, 8)), img[:8, :8])


def test_deepzoom_overlap_geometry(rng):
    """Tiles with overlap: interior tiles grow by overlap on shared edges
    (OpenSlide DeepZoom semantics)."""
    img = _make_synthetic_slide(rng, w=512, h=512)
    slide = ImageBackend(img)
    dz = DeepZoom(slide, tile_size=128, overlap=8)
    top = dz.level_count - 1
    assert dz.level_tiles(top) == (4, 4)
    # corner tile: overlap only on the two interior sides
    t00 = dz.get_tile(top, (0, 0))
    assert t00.shape == (128 + 8, 128 + 8, 3)
    # center tile: overlap on all four sides
    t11 = dz.get_tile(top, (1, 1))
    assert t11.shape == (128 + 16, 128 + 16, 3)
    np.testing.assert_array_equal(
        t11, img[128 - 8:256 + 8, 128 - 8:256 + 8])


def test_milnet_facade(tmp_path, rng):
    from tpumil.models.milnet import MILNet

    net = MILNet.create(feats_size=32, num_classes=2, seed=1)
    feats = rng.standard_normal((17, 32)).astype(np.float32)
    c, bag, A, B = net(feats)
    assert bag.shape == (2,)
    s = net.score(feats)
    assert s.shape == (2,) and np.all((0 <= s) & (s <= 1))
    path = str(tmp_path / "agg.pth")
    net.save_pth(path)
    net2 = MILNet.from_pth(path)
    np.testing.assert_allclose(net2.score(feats), s, atol=1e-6)


def test_milnet_average_matches_trainer(rng):
    """MILNet.score(average=True) must be on the trainer's threshold scale
    (undivided sigmoid sum, train_tcga.py:107)."""
    from tpumil.models.milnet import MILNet
    from tpumil.data.bags import Bag
    from tpumil.train.trainer import BagTrainer

    net = MILNet.create(feats_size=16, num_classes=1, seed=0)
    feats = rng.standard_normal((9, 16)).astype(np.float32)
    trainer = BagTrainer(net.cfg)
    s_tr, _ = trainer.predict(net.params, [Bag(feats, np.ones(1, np.float32))],
                              average=True)
    s_net = net.score(feats, average=True)
    np.testing.assert_allclose(s_net, s_tr[0], rtol=1e-5, atol=1e-6)
