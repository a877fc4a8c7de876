"""Unified typed configuration for all five pipeline stages.

The reference scatters configuration across per-script argparse plus one YAML
whose fields pass through ``eval()`` (SURVEY.md section 5 — a hazard, not a
feature). tpumil keeps the reference CLI flags on each entry point AND
provides one typed, YAML-serialisable config covering the whole pipeline, so
a single file can drive tile -> pretrain -> embed -> train -> visualize:

    pipeline = PipelineConfig.from_yaml("experiment.yaml")
    pipeline.to_yaml("resolved.yaml")   # fully-resolved round-trip

Unknown keys raise immediately (typo safety); every field is a plain
dataclass field with a sensible default matching the reference's.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Type, TypeVar

from tpumil.data.tiler import TilerConfig
from tpumil.train.schemes import MILBenchConfig, WSITrainConfig
from tpumil.train.simclr_trainer import SimCLRTrainConfig

T = TypeVar("T")


def _from_dict(cls: Type[T], data: Dict[str, Any], path: str) -> T:
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(fields)
    if unknown:
        raise ValueError(f"unknown config keys at {path}: {sorted(unknown)}; "
                         f"valid: {sorted(fields)}")
    return cls(**data)


@dataclasses.dataclass
class EmbedderStageConfig:
    backbone: str = "resnet18"
    norm_layer: str = "instance"
    num_classes: int = 2
    batch_size: int = 128
    num_workers: int = 8
    magnification: str = "single"
    weights: Optional[str] = None
    weights_high: Optional[str] = None
    weights_low: Optional[str] = None
    tree_fusion: str = "cat"
    patch_size: int = 224
    # bf16 | f32 | f32h | f32x. f32 = the default (f32 activations/
    # accumulation, fast MXU conv inputs); bf16 = throughput mode (measurably
    # shifts downstream AUC on weak-signal tasks); f32h = near torch parity
    # (bf16_3x, maxabs 7e-5) at ~1.7x the f32x rate; f32x = true-f32 torch
    # parity. See benchmarks/bf16_parity.py + docs/PERF.md "Precision tiers".
    precision: str = "f32"
    # the benchmarked stem rewrite (identical features to 1e-4); mirror of
    # cli/compute_feats --space_to_depth
    space_to_depth: bool = True
    # shard each patch batch over the first N devices (0 = single-chip);
    # mirror of cli/compute_feats --data_parallel
    data_parallel: int = 0


@dataclasses.dataclass
class InferenceStageConfig:
    thresholds: Optional[list] = None
    class_names: Optional[list] = None
    batch_size: int = 64
    num_workers: int = 8
    # None = follow the tiler's output format in the pipeline driver
    # (standalone attention_map defaults to 'jpg' like the reference)
    patch_ext: Optional[str] = None
    export_scores: bool = False
    average: bool = False


@dataclasses.dataclass
class PipelineConfig:
    """End-to-end experiment description."""

    dataset: str = "TCGA-lung"
    wsi_root: str = "WSI"
    datasets_root: str = "datasets"
    magnifications: tuple = (0,)
    tiler: TilerConfig = dataclasses.field(default_factory=TilerConfig)
    simclr: SimCLRTrainConfig = dataclasses.field(default_factory=SimCLRTrainConfig)
    embedder: EmbedderStageConfig = dataclasses.field(default_factory=EmbedderStageConfig)
    train: WSITrainConfig = dataclasses.field(default_factory=WSITrainConfig)
    mil_bench: Optional[MILBenchConfig] = None
    inference: InferenceStageConfig = dataclasses.field(default_factory=InferenceStageConfig)

    _SECTIONS = {
        "tiler": TilerConfig,
        "simclr": SimCLRTrainConfig,
        "embedder": EmbedderStageConfig,
        "train": WSITrainConfig,
        "mil_bench": MILBenchConfig,
        "inference": InferenceStageConfig,
    }

    @classmethod
    def from_dict(cls, data: Dict[str, Any]) -> "PipelineConfig":
        data = dict(data)
        kwargs: Dict[str, Any] = {}
        for name, sub_cls in cls._SECTIONS.items():
            if name in data:
                sub = data.pop(name)
                if sub is None:
                    kwargs[name] = None
                else:
                    kwargs[name] = _from_dict(sub_cls, sub, name)
        scalar_fields = {f.name for f in dataclasses.fields(cls)
                         if f.name not in cls._SECTIONS}
        unknown = set(data) - scalar_fields
        if unknown:
            raise ValueError(f"unknown top-level config keys: {sorted(unknown)}")
        if "magnifications" in data:
            data["magnifications"] = tuple(data["magnifications"])
        kwargs.update(data)
        return cls(**kwargs)

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})

    def to_dict(self) -> Dict[str, Any]:
        def clean(obj):
            if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
                return {k: clean(v) for k, v in dataclasses.asdict(obj).items()
                        if not _is_dtype(v)}
            if isinstance(obj, tuple):
                return list(obj)
            return obj

        out = {}
        for f in dataclasses.fields(self):
            if f.name.startswith("_"):
                continue
            out[f.name] = clean(getattr(self, f.name))
        return out

    def to_yaml(self, path: str) -> None:
        import yaml

        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)


def _is_dtype(v) -> bool:
    return v.__class__.__name__ in ("type", "dtype") or str(v).startswith("<class")
