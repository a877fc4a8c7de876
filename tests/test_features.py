"""Feature-extraction pipeline tests: patch IO, SimCLR surgery end-to-end
parity vs the torch oracle, CSV contract, tree fusion."""

import collections
import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.data.patches import (
    PatchBatchLoader,
    decode_patch,
    list_bag_dirs,
    list_patches,
    parse_position,
)
from tpumil.infer.features import FeatureExtractor, compute_feats, compute_tree_feats
from tpumil.models import embedder
from tpumil.models.embedder import EmbedderConfig

torch = pytest.importorskip("torch")
from torch_resnet_oracle import TorchResNet  # noqa: E402


def _write_patch(path, rng, size=32):
    from PIL import Image

    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)
    return arr


def _make_wsi_tree(tmp_path, rng, n_bags=2, n_patches=5, size=32, layout="single"):
    root = str(tmp_path / "WSI")
    for b in range(n_bags):
        for p in range(n_patches):
            _write_patch(os.path.join(root, "ds", layout, f"class{b}", f"bag{b}",
                                      f"{p}_{p + 1}.jpeg"), rng, size)
    return root


def test_patch_io(tmp_path, rng):
    root = _make_wsi_tree(tmp_path, rng)
    dirs = list_bag_dirs(root, "ds", "single")
    assert len(dirs) == 2
    paths = list_patches(dirs[0])
    assert len(paths) == 5
    assert parse_position(paths[0]) == (0, 1)
    arr = decode_patch(paths[0])
    assert arr.shape == (32, 32, 3) and arr.dtype == np.float32
    assert 0.0 <= arr.min() and arr.max() <= 1.0


def test_batch_loader_padding(tmp_path, rng):
    root = _make_wsi_tree(tmp_path, rng, n_bags=1, n_patches=7)
    paths = list_patches(list_bag_dirs(root, "ds", "single")[0])
    batches = list(PatchBatchLoader(paths, batch_size=4, num_workers=2))
    assert [n for _, n, _ in batches] == [4, 3]
    assert batches[0][0].shape == (4, 32, 32, 3)
    # padded tail rows are zero
    assert np.all(batches[1][0][3:] == 0)


def _simclr_style_checkpoint(depth=18):
    """Build a SimCLR-layout state_dict (backbone convs in order + l1/l2
    projection entries) from the torch oracle."""
    net = TorchResNet(depth, torch.nn.InstanceNorm2d).eval()
    sd = collections.OrderedDict(
        (k, v) for k, v in net.state_dict().items() if not k.startswith("fc"))
    sd["l1.weight"] = torch.zeros(512, 512)
    sd["l1.bias"] = torch.zeros(512)
    sd["l2.weight"] = torch.zeros(256, 512)
    sd["l2.bias"] = torch.zeros(256)
    return net, sd


def test_simclr_surgery_parity(tmp_path, rng):
    """Load a SimCLR checkpoint through the popitem/positional surgery and
    verify embedder features match the torch oracle."""
    net, sd = _simclr_style_checkpoint()
    ckpt = str(tmp_path / "model.pth")
    torch.save(sd, ckpt)
    cfg = EmbedderConfig(num_classes=2, compute_dtype=jnp.float32)
    params = embedder.load_simclr_checkpoint(ckpt, cfg)
    x = rng.random((3, 64, 64, 3)).astype(np.float32)
    feats, logits = embedder.forward(params, jnp.asarray(x), cfg)
    with torch.no_grad():
        want = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())).numpy()
    np.testing.assert_allclose(np.asarray(feats), want, rtol=8e-3, atol=8e-4)
    assert np.all(np.asarray(logits) == 0.0)  # zeroed head


def test_embedder_export_roundtrip(tmp_path):
    """export_embedder_state_dict -> load back positionally == identity."""
    from tpumil.io import torch_ckpt

    cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    params = embedder.init_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "embedder.pth")
    torch_ckpt.save_state_dict(embedder.export_embedder_state_dict(params, cfg), path)
    # re-exported embedder.pth has no projection head to strip
    params2 = embedder.load_simclr_checkpoint(path, cfg, strip_head=False)
    for k in params["backbone"]:
        np.testing.assert_allclose(np.asarray(params["backbone"][k]),
                                   np.asarray(params2["backbone"][k]), atol=1e-6)


def test_compute_feats_csv_contract(tmp_path, rng):
    root = _make_wsi_tree(tmp_path, rng, n_bags=2, n_patches=6)
    cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    params = embedder.init_params(jax.random.PRNGKey(0), cfg)
    ex = FeatureExtractor(params, cfg, batch_size=4, patch_size=32, num_workers=2)
    out = str(tmp_path / "datasets" / "ds")
    dirs = list_bag_dirs(root, "ds", "single")
    compute_feats(dirs, ex, out)
    csvs = sorted(glob.glob(os.path.join(out, "*", "*.csv")))
    assert len(csvs) == 2
    import pandas as pd

    df = pd.read_csv(csvs[0])
    assert df.shape == (6, cfg.num_feats)
    # '%.4f' parity: at most 4 decimal places survive a text round-trip
    with open(csvs[0]) as f:
        f.readline()
        first_val = f.readline().split(",")[0]
    assert len(first_val.split(".")[-1].rstrip("\n")) <= 4
    assert ex.stats.patches == 12 and ex.stats.patches_per_sec > 0


def test_tree_feats_fusion(tmp_path, rng):
    # pyramid layout: low patches + per-low-folder high patches
    root = str(tmp_path / "WSI")
    for li in range(2):
        _write_patch(os.path.join(root, "ds", "pyramid", "c0", "bag0",
                                  f"{li}_0.jpeg"), rng)
        for hi in range(3):
            _write_patch(os.path.join(root, "ds", "pyramid", "c0", "bag0",
                                      f"{li}_0", f"{2 * li + hi}_{hi}.jpeg"), rng)
    cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    params = embedder.init_params(jax.random.PRNGKey(0), cfg)
    ex = FeatureExtractor(params, cfg, batch_size=4, patch_size=32, num_workers=2)
    dirs = list_bag_dirs(root, "ds", "tree")
    out_cat = str(tmp_path / "out_cat")
    compute_tree_feats(dirs, ex, ex, out_cat, fusion="cat")
    import pandas as pd

    df = pd.read_csv(glob.glob(os.path.join(out_cat, "*", "*.csv"))[0])
    assert df.shape == (6, 2 * cfg.num_feats)  # 1024-d cat features

    out_fus = str(tmp_path / "out_fus")
    compute_tree_feats(dirs, ex, ex, out_fus, fusion="fusion")
    df2 = pd.read_csv(glob.glob(os.path.join(out_fus, "*", "*.csv"))[0])
    assert df2.shape == (6, cfg.num_feats)

    with pytest.raises(NotImplementedError):
        compute_tree_feats(dirs, ex, ex, str(tmp_path / "x"), fusion="bogus")


def test_embedder_layout_autodetect(tmp_path):
    """load_simclr_checkpoint(strip_head=None) must accept BOTH a raw SimCLR
    checkpoint (projection head present) and a surgered embedder export
    (backbone only) — the attention_map CLI crashed on the latter before."""
    from tpumil.io import torch_ckpt

    cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    net, sd = _simclr_style_checkpoint()
    raw = str(tmp_path / "raw.pth")
    torch.save(sd, raw)
    p_raw = embedder.load_simclr_checkpoint(raw, cfg)  # auto: strips 4

    surgered = str(tmp_path / "embedder.pth")
    torch_ckpt.save_state_dict(embedder.export_embedder_state_dict(p_raw, cfg),
                               surgered)
    p_surg = embedder.load_simclr_checkpoint(surgered, cfg)  # auto: no strip
    for k in p_raw["backbone"]:
        np.testing.assert_allclose(np.asarray(p_raw["backbone"][k]),
                                   np.asarray(p_surg["backbone"][k]), atol=1e-6)


def test_mesh_sharded_feature_extractor(tmp_path, rng):
    """FeatureExtractor(mesh=...) shards the patch batch over EVERY mesh
    axis: features must match the unsharded extractor to float tolerance
    (XLA partitions reductions differently — exact equality across
    deployment shapes is NOT guaranteed), including the padded final
    partial batch of embed_paths AND a non-divisible embed_arrays batch
    (padded internally). Also pins the divisibility ValueError."""
    from tpumil.parallel.mesh import make_mesh

    root = _make_wsi_tree(tmp_path, rng, n_bags=1, n_patches=11)
    paths = list_patches(list_bag_dirs(root, "ds", "single")[0])
    cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    params = embedder.init_params(jax.random.PRNGKey(0), cfg)

    plain = FeatureExtractor(params, cfg, batch_size=8, patch_size=32,
                             num_workers=2)
    want = plain.embed_paths(paths)  # 11 patches -> 8 + padded 3

    mesh = make_mesh(8)  # default (data=4, inst=2): both axes must shard
    sharded = FeatureExtractor(params, cfg, batch_size=8, patch_size=32,
                               num_workers=2, mesh=mesh)
    got = sharded.embed_paths(paths)
    assert got.shape == want.shape == (11, cfg.num_feats)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # embed_arrays with a batch not divisible by the device count: padded
    # to the next multiple internally, result sliced back
    imgs = (rng.random((5, 32, 32, 3)) * 255).astype(np.uint8)
    got_arr = sharded.embed_arrays(imgs)
    want_arr = plain.embed_arrays(imgs)
    assert got_arr.shape == (5, cfg.num_feats)
    np.testing.assert_allclose(got_arr, want_arr, rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="divide"):
        FeatureExtractor(params, cfg, batch_size=12, patch_size=32, mesh=mesh)


def test_compute_feats_data_parallel_cli(tmp_path, rng, monkeypatch):
    """cli/compute_feats --data_parallel 8 on the virtual mesh writes the
    same per-bag CSVs as the single-device run (%.4f text rounding can
    differ by one ulp where XLA's sharded reductions land on a rounding
    boundary — compare numerically)."""
    from PIL import Image

    from tpumil.cli import compute_feats as cf_cli

    monkeypatch.chdir(tmp_path)
    d = tmp_path / "WSI" / "demo" / "single" / "tumor" / "bag0"
    d.mkdir(parents=True)
    for i in range(9):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                        ).save(str(d / f"{i}_0.jpeg"))
    args = ["--dataset", "demo", "--magnification", "single",
            "--weights", "ImageNet", "--norm_layer", "batch",
            "--num_classes", "1", "--patch_size", "32", "--device", "cpu",
            "--batch_size", "8"]
    assert cf_cli.main(args + ["--out_root", "plain"]) == 0
    assert cf_cli.main(args + ["--out_root", "dp", "--data_parallel", "8"]) == 0
    import pandas as pd

    a = pd.read_csv("plain/demo/tumor/bag0.csv").to_numpy()
    b = pd.read_csv("dp/demo/tumor/bag0.csv").to_numpy()
    assert a.shape == b.shape == (9, 512)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_compute_feats_sharded_cli(tmp_path, rng, monkeypatch):
    """--shard i/n splits the bag list disjointly; --assemble_only builds
    the master CSV over the union — the multi-host scale-out contract."""
    from PIL import Image

    from tpumil.cli import compute_feats as cf_cli

    monkeypatch.chdir(tmp_path)
    for b in range(3):
        d = tmp_path / "WSI" / "demo" / "single" / "tumor" / f"bag{b}"
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)
                            ).save(str(d / f"{i}_0.jpeg"))
    args = ["--dataset", "demo", "--magnification", "single",
            "--weights", "ImageNet", "--norm_layer", "batch",
            "--num_classes", "1", "--patch_size", "32", "--device", "cpu",
            "--out_root", "datasets"]
    assert cf_cli.main(args + ["--shard", "0/2"]) == 0
    done_first = sorted(glob.glob("datasets/demo/tumor/*.csv"))
    assert len(done_first) == 2  # bags 0 and 2
    assert not os.path.exists("datasets/demo/demo.csv")  # no master yet
    assert cf_cli.main(args + ["--shard", "1/2"]) == 0
    assert cf_cli.main(["--dataset", "demo", "--out_root", "datasets",
                        "--assemble_only", "--device", "cpu"]) == 0
    import pandas as pd

    master = pd.read_csv("datasets/demo/demo.csv")
    assert len(master) == 3
    with pytest.raises(ValueError, match="i/n"):
        cf_cli.main(args + ["--shard", "bogus"])
