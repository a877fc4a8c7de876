"""Full five-stage pipeline integration test (the automated version of the
manual synthetic-demo verification): generate slides -> tile -> SimCLR ->
features -> aggregator CV -> heatmaps, all through the single-config driver.
"""

import glob
import os

import numpy as np
import pytest


@pytest.fixture
def pipeline_workdir(tmp_path, rng, monkeypatch):
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    for cls in ("tumor", "normal"):
        for i in range(3):
            img = np.full((256, 256, 3), 255, np.uint8)
            if cls == "tumor":
                img[:160, :160] = (rng.random((160, 160, 3)) * 180 + 20
                                   ).astype(np.uint8)
            else:
                tex = (rng.random((160, 160, 3)) * 60 + 120)
                tex[..., 1] += 40
                img[:160, :160] = np.clip(tex, 0, 255).astype(np.uint8)
            d = tmp_path / "WSI" / "demo" / cls
            d.mkdir(parents=True, exist_ok=True)
            pages = [Image.fromarray(img)]
            pages.append(pages[0].resize((128, 128)))
            pages[0].save(str(d / f"{cls}{i}.tif"), save_all=True,
                          append_images=pages[1:], description="|AppMag = 20|")
    (tmp_path / "exp.yaml").write_text(
        "dataset: demo\n"
        "magnifications: [0]\n"
        "tiler:\n  tile_size: 64\n"
        "simclr:\n  batch_size: 8\n  epochs: 1\n  input_size: 64\n"
        "  num_workers: 2\n"
        # data_parallel: the feats stage shards patch batches over the
        # virtual 8-device mesh AND the maps stage embeds through the
        # mesh-sharded BagInference — the whole pipeline multi-chip
        "embedder:\n  num_classes: 1\n  batch_size: 8\n  patch_size: 64\n"
        "  precision: f32\n  data_parallel: 8\n"
        "train:\n  num_classes: 1\n  feats_size: 512\n  num_epochs: 3\n"
        "  stop_epochs: 2\n  lr: 0.002\n  verbose: false\n"
        "inference:\n  thresholds: [0.0]\n")
    return tmp_path


def test_pipeline_all_stages(pipeline_workdir):
    from tpumil.cli.pipeline import main

    rc = main(["--config", "exp.yaml",
               "--stages", "tile,simclr,feats,train,maps", "--device", "cpu"])
    assert rc == 0
    # every stage's artifacts exist
    assert glob.glob("WSI/demo/single/*/*/*.jpeg")
    assert os.path.exists("runs/demo/simclr/checkpoints/model.pth")
    assert os.path.exists("datasets/demo/demo.csv")
    assert glob.glob("runs/demo/weights/fold_*.pth")
    assert glob.glob("runs/demo/weights/test/mil_weights_fold_*.pth")
    maps = glob.glob("runs/demo/maps/*.png")
    assert len(maps) == 6
    assert os.path.exists("runs/demo/resolved_config.yaml")


def test_pipeline_validates_sharding_up_front(tmp_path, monkeypatch, capsys):
    """A data_parallel that doesn't divide a LATER stage's batch size must
    fail at parse time, not after hours of tiling/SimCLR/training (the maps
    stage runs last; its BagInference constructor is the late crash site)."""
    import pytest

    from tpumil.cli.pipeline import main

    monkeypatch.chdir(tmp_path)
    (tmp_path / "exp.yaml").write_text(
        "dataset: demo\n"
        "magnifications: [0]\n"
        "embedder:\n  num_classes: 1\n  batch_size: 8\n  data_parallel: 8\n"
        "train:\n  num_classes: 1\n"
        "inference:\n  batch_size: 12\n")  # 12 % 8 != 0
    with pytest.raises(SystemExit) as exc:
        main(["--config", "exp.yaml",
              "--stages", "tile,simclr,feats,train,maps", "--device", "cpu"])
    assert exc.value.code == 2
    assert "inference.batch_size 12" in capsys.readouterr().err
    # nothing ran: no run dir, no resolved config
    assert not os.path.exists("runs")

    (tmp_path / "neg.yaml").write_text(
        "dataset: demo\n"
        "magnifications: [0]\n"
        "embedder:\n  num_classes: 1\n  data_parallel: -2\n"
        "train:\n  num_classes: 1\n")
    with pytest.raises(SystemExit):
        main(["--config", "neg.yaml", "--stages", "feats", "--device", "cpu"])
    assert ">= 0" in capsys.readouterr().err


def test_pipeline_validates_devices_and_train_sharding_up_front(
        tmp_path, monkeypatch, capsys):
    """Device availability and the train stage's sharding fields are also
    checked at parse time: asking for more devices than the host has (or
    inst_shard + data_parallel together) must not survive until the stage
    that finally builds the mesh."""
    import pytest

    from tpumil.cli.pipeline import main

    monkeypatch.chdir(tmp_path)
    (tmp_path / "toomany.yaml").write_text(
        "dataset: demo\n"
        "magnifications: [0]\n"
        "embedder:\n  num_classes: 1\n  batch_size: 32\n  data_parallel: 16\n"
        "train:\n  num_classes: 1\n")  # 16 > the suite's 8 virtual devices
    with pytest.raises(SystemExit):
        main(["--config", "toomany.yaml", "--stages", "tile,simclr,feats",
              "--device", "cpu"])
    err = capsys.readouterr().err
    assert "embedder.data_parallel" in err and "16" in err
    assert not os.path.exists("runs")

    (tmp_path / "trainshard.yaml").write_text(
        "dataset: demo\n"
        "magnifications: [0]\n"
        "embedder:\n  num_classes: 1\n"
        "train:\n  num_classes: 1\n  inst_shard: 16\n")
    with pytest.raises(SystemExit):
        main(["--config", "trainshard.yaml", "--stages", "train",
              "--device", "cpu"])
    assert "train.inst_shard" in capsys.readouterr().err

    (tmp_path / "both.yaml").write_text(
        "dataset: demo\n"
        "magnifications: [0]\n"
        "embedder:\n  num_classes: 1\n"
        "train:\n  num_classes: 1\n  inst_shard: 2\n  data_parallel: 2\n")
    with pytest.raises(SystemExit):
        main(["--config", "both.yaml", "--stages", "train", "--device", "cpu"])
    assert "mutually exclusive" in capsys.readouterr().err
