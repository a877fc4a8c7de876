"""Unified config system tests."""

import pytest

from tpumil.io.config import PipelineConfig


def test_defaults_roundtrip(tmp_path):
    cfg = PipelineConfig(dataset="demo")
    path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(path)
    cfg2 = PipelineConfig.from_yaml(path)
    assert cfg2.dataset == "demo"
    assert cfg2.train.num_epochs == cfg.train.num_epochs
    assert cfg2.tiler.tile_size == 224
    assert tuple(cfg2.magnifications) == (0,)


def test_partial_yaml(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(
        "dataset: c16\n"
        "magnifications: [0, 2]\n"
        "train:\n  num_classes: 1\n  lr: 0.0002\n"
        "tiler:\n  tile_size: 256\n")
    cfg = PipelineConfig.from_yaml(str(path))
    assert cfg.dataset == "c16"
    assert cfg.magnifications == (0, 2)
    assert cfg.train.num_classes == 1 and cfg.train.lr == 2e-4
    assert cfg.train.num_epochs == 50  # default preserved
    assert cfg.tiler.tile_size == 256


def test_unknown_keys_rejected(tmp_path):
    path = tmp_path / "bad.yaml"
    path.write_text("train:\n  learning_rate: 0.1\n")  # typo for lr
    with pytest.raises(ValueError, match="unknown config keys"):
        PipelineConfig.from_yaml(str(path))
    path2 = tmp_path / "bad2.yaml"
    path2.write_text("datast: x\n")
    with pytest.raises(ValueError, match="unknown top-level"):
        PipelineConfig.from_yaml(str(path2))
