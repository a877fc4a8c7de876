"""SimCLR model: ResNet backbone (InstanceNorm) + 2-layer projection MLP.

Mirrors ResNetSimCLR (simclr/models/resnet_simclr.py:6-37): forward returns
``(h, z)`` — pooled backbone features and the projection. Checkpoint export
produces a state_dict whose entries are the backbone tensors in torchvision
order followed by l1/l2, so the reference's (and tpumil's) popitem-x4 +
positional-zip embedder surgery consumes it directly
(compute_feats.py:182-207).
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.models import resnet
from tpumil.models.resnet import ResNetConfig


@dataclasses.dataclass(frozen=True)
class SimCLRConfig:
    base_model: str = "resnet18"     # config.yaml model.base_model
    out_dim: int = 256               # config.yaml model.out_dim
    compute_dtype: object = jnp.bfloat16
    # MXU precision tier for the backbone convs AND the projection MLP
    # (see ResNetConfig.precision): bf16 pretraining leaves "default"; f32
    # parity checks pin "highest" — without it f32 matmuls feed the MXU
    # bf16 inputs on TPU
    precision: str = "default"

    @property
    def resnet_cfg(self) -> ResNetConfig:
        depths = {"resnet18": 18, "resnet50": 50}  # resnet_simclr.py:10-11
        if self.base_model not in depths:
            raise ValueError(f"base_model must be one of {sorted(depths)} "
                             f"(the reference's SimCLR supports these), "
                             f"got {self.base_model!r}")
        return ResNetConfig(depth=depths[self.base_model], norm="instance",
                            compute_dtype=self.compute_dtype,
                            precision=self.precision)

    @property
    def num_ftrs(self) -> int:
        return self.resnet_cfg.num_feats


def init_params(key, cfg: SimCLRConfig) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    n = cfg.num_ftrs
    # torch Linear default init: weight AND bias ~ U(-1/sqrt(in), 1/sqrt(in))
    lim = 1.0 / np.sqrt(n)
    k2b, k3b = jax.random.split(jax.random.fold_in(key, 7))
    return {
        "backbone": resnet.init_params(k1, cfg.resnet_cfg),
        "l1": {"w": jax.random.uniform(k2, (n, n), minval=-lim, maxval=lim),
               "b": jax.random.uniform(k2b, (n,), minval=-lim, maxval=lim)},
        "l2": {"w": jax.random.uniform(k3, (cfg.out_dim, n), minval=-lim, maxval=lim),
               "b": jax.random.uniform(k3b, (cfg.out_dim,), minval=-lim, maxval=lim)},
    }


def forward(params: Dict, x, cfg: SimCLRConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [B, H, W, 3] -> (h [B, num_ftrs], z [B, out_dim])."""
    h = resnet.forward(params["backbone"], x, cfg.resnet_cfg)
    prec = cfg.resnet_cfg.conv_precision
    z = jax.nn.relu(jnp.matmul(h, params["l1"]["w"].T, precision=prec)
                    + params["l1"]["b"])
    z = jnp.matmul(z, params["l2"]["w"].T, precision=prec) + params["l2"]["b"]
    return h, z


def export_state_dict(params: Dict, cfg: SimCLRConfig) -> "collections.OrderedDict":
    """Backbone convs (OIHW) in torchvision order + l1/l2 — the exact layout
    the embedder surgery expects (strip last 4, zip positionally)."""
    sd = resnet.export_state_dict(params["backbone"], cfg.resnet_cfg,
                                  prefix="features.")
    sd["l1.weight"] = np.asarray(params["l1"]["w"], np.float32)
    sd["l1.bias"] = np.asarray(params["l1"]["b"], np.float32)
    sd["l2.weight"] = np.asarray(params["l2"]["w"], np.float32)
    sd["l2.bias"] = np.asarray(params["l2"]["b"], np.float32)
    return sd


def load_state_dict(sd: Dict[str, np.ndarray], cfg: SimCLRConfig) -> Dict:
    """Restore from an exported checkpoint (fine_tune_from,
    simclr/simclr.py:133-142). Positional for the backbone, name-suffix for
    l1/l2."""
    values = [np.asarray(v) for k, v in sd.items()
              if not (k.startswith("l1") or k.startswith("l2"))]
    backbone = resnet.load_positional(values, cfg.resnet_cfg)
    def g(name):
        for k, v in sd.items():
            if k.endswith(name):
                return jnp.asarray(np.asarray(v, np.float32))
        raise KeyError(name)
    return {
        "backbone": backbone,
        "l1": {"w": g("l1.weight"), "b": g("l1.bias")},
        "l2": {"w": g("l2.weight"), "b": g("l2.bias")},
    }
