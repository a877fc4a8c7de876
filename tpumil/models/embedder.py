"""Patch embedder: ResNet backbone + per-instance linear head.

The reference's ``IClassifier(resnet, feats_size, num_classes)``
(dsmil.py:14-25) wraps the frozen CNN and a Linear head, returning
``(feats, instance_logits)``. For feature extraction the head is unused
(compute_feats.py writes features only); for end-to-end inference the head's
weights come from the aggregator checkpoint (attention_map.py:162-165).

Checkpoint surgery reproduced from compute_feats.py:182-234 /
attention_map.py:151-160: a SimCLR checkpoint's last four entries (projection
MLP) are dropped and the remaining conv tensors are assigned positionally
onto the backbone's parameter order.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.models import resnet
from tpumil.models.resnet import ResNetConfig

BACKBONE_DEPTH = {"resnet18": 18, "resnet34": 34, "resnet50": 50, "resnet101": 101}

# User-facing --precision flag -> (compute dtype, MXU precision tier).
# Measured ladder in docs/PERF.md "Precision tiers".
PRECISION_FLAGS = {
    "bf16": (jnp.bfloat16, "default"),
    "f32": (jnp.float32, "default"),
    "f32h": (jnp.float32, "high"),
    "f32x": (jnp.float32, "highest"),
}


def precision_from_flag(flag: str) -> Tuple[object, str]:
    """Map a CLI ``--precision`` flag (bf16|f32|f32h|f32x) to
    ``(compute_dtype, precision_tier)`` for EmbedderConfig."""
    try:
        return PRECISION_FLAGS[flag]
    except KeyError:
        raise ValueError(f"unknown precision flag {flag!r}; "
                         f"expected one of {sorted(PRECISION_FLAGS)}") from None


@dataclasses.dataclass(frozen=True)
class EmbedderConfig:
    backbone: str = "resnet18"      # compute_feats.py:134
    norm: str = "instance"          # compute_feats.py:135
    num_classes: int = 2
    compute_dtype: object = jnp.bfloat16  # bf16 inference on the MXU
    space_to_depth: bool = False
    # MXU precision tier: "default" feeds f32 convs bf16 MXU inputs (fast);
    # "high" (bf16_3x) is near torch parity at ~1.7x the "highest" rate;
    # "highest" (bf16_6x) is true f32 — see ResNetConfig.precision.
    precision: str = "default"
    # explicit conv-operand dtype (see ResNetConfig.operand_dtype)
    operand_dtype: object = None

    @property
    def resnet_cfg(self) -> ResNetConfig:
        return ResNetConfig(depth=BACKBONE_DEPTH[self.backbone], norm=self.norm,
                            compute_dtype=self.compute_dtype,
                            space_to_depth=self.space_to_depth,
                            precision=self.precision,
                            operand_dtype=self.operand_dtype)

    @property
    def num_feats(self) -> int:
        return self.resnet_cfg.num_feats


def init_params(key, cfg: EmbedderConfig) -> Dict:
    # the split is load-bearing for reproducibility: every documented
    # benchmark/fixture initialized the backbone from split(key)[0] (the
    # head is zeros — untrained in the reference too, compute_feats.py:191)
    k1, _ = jax.random.split(key)
    return {
        "backbone": resnet.init_params(k1, cfg.resnet_cfg),
        "fc": {"w": jnp.zeros((cfg.num_classes, cfg.num_feats)),
               "b": jnp.zeros((cfg.num_classes,))},
    }


def forward(params: Dict, x, cfg: EmbedderConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: [N, H, W, 3] in [0, 1], or uint8 in [0, 255] (normalized on-device:
    the same f32 /255 the host would do — bit-identical, 4x less host work
    and host->device transfer). Returns (feats [N, K] f32, logits [N, C])."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    feats = resnet.forward(params["backbone"], x, cfg.resnet_cfg)
    logits = jnp.matmul(feats, params["fc"]["w"].T,
                        precision=cfg.resnet_cfg.conv_precision) \
        + params["fc"]["b"]
    return feats, logits


def load_simclr_checkpoint(path: str, cfg: EmbedderConfig,
                           strip_head: Optional[bool] = None) -> Dict:
    """Load a SimCLR ``model.pth`` (or a re-exported ``embedder*.pth``) into
    embedder params via the positional surgery. The linear head is zeroed
    (it is untrained in the reference too — load_state_dict strict=False
    leaves it at random init, compute_feats.py:191).

    ``strip_head=None`` auto-detects the layout: a raw SimCLR checkpoint has
    exactly 4 extra projection-MLP entries beyond the backbone's parameter
    count and gets them stripped; an already-surgered embedder export
    (exactly the backbone tensors) is used as-is; any other count is an
    error (a blind strip would discard backbone tensors). Torchvision-style
    batch-norm checkpoints (which interleave num_batches_tracked entries
    the positional order cannot express) route to the name-based loader.
    """
    from tpumil.io import torch_ckpt

    sd = torch_ckpt.load_state_dict(path)
    rcfg = cfg.resnet_cfg
    if any(k.endswith("num_batches_tracked") for k in sd):
        backbone = resnet.load_torch_state_dict(sd, rcfg)
        return {
            "backbone": backbone,
            "fc": {"w": jnp.zeros((cfg.num_classes, cfg.num_feats)),
                   "b": jnp.zeros((cfg.num_classes,))},
        }
    n_params = len(resnet.param_names(rcfg))
    if strip_head is None:
        surplus = len(sd) - n_params
        if surplus not in (0, 4):
            raise ValueError(
                f"checkpoint {path} has {len(sd)} tensors; expected exactly "
                f"the {n_params} backbone tensors (surgered export) or "
                f"{n_params + 4} (raw SimCLR with projection MLP)")
        strip_head = surplus == 4
    if strip_head:
        sd = torch_ckpt.strip_projection_head(sd)
    values = list(sd.values())
    backbone = resnet.load_positional(values[:n_params], rcfg)
    return {
        "backbone": backbone,
        "fc": {"w": jnp.zeros((cfg.num_classes, cfg.num_feats)),
               "b": jnp.zeros((cfg.num_classes,))},
    }


def set_head(params: Dict, w: np.ndarray, b: np.ndarray) -> Dict:
    """Install the instance-head weights from an aggregator checkpoint
    (attention_map.py:162-165, testing_tcga.py:139-141)."""
    out = dict(params)
    out["fc"] = {"w": jnp.asarray(np.asarray(w, np.float32)),
                 "b": jnp.asarray(np.asarray(b, np.float32))}
    return out


def export_embedder_state_dict(params: Dict, cfg: EmbedderConfig) -> "collections.OrderedDict":
    """Re-export in the reference's embedder.pth layout: the surgered
    IClassifier keys ``feature_extractor.<torchvision name>`` in order
    (compute_feats.py:190-193)."""
    return resnet.export_state_dict(params["backbone"], cfg.resnet_cfg,
                                    prefix="feature_extractor.")
