"""Functional ResNet embedders (18/34/50/101) with instance- or batch-norm.

The reference embeds patches with torchvision ResNets whose norm layer is
swapped for ``nn.InstanceNorm2d`` (compute_feats.py:146-167,
simclr/models/resnet_simclr.py:10-11). Torch's InstanceNorm2d default is
affine=False with no running stats, so the instance-norm variants carry ONLY
conv weights — which is what makes the reference's positional checkpoint
surgery work (SURVEY.md section 5).

TPU-native design decisions:
  * NHWC activations / HWIO weights (XLA's preferred conv layout on TPU);
    ``load_torch_state_dict`` transposes torch's OIHW at import.
  * Params are a flat ``{torchvision_state_dict_name: array}`` dict in
    torchvision's exact insertion order, so the reference's *positional*
    embedder surgery (compute_feats.py:187-190) is a straight zip.
  * bf16 compute policy for inference throughput (params stay f32; matmuls
    and convs run in bf16 on the MXU via ``compute_dtype=jnp.bfloat16``).
  * Everything is jit-compatible: instance norm is an inline reduction, batch
    norm (inference) folds running stats.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ARCHS = {
    # depth -> (block kind, blocks per stage, feature dim of the pooled output)
    18: ("basic", (2, 2, 2, 2), 512),
    34: ("basic", (3, 4, 6, 3), 512),
    50: ("bottleneck", (3, 4, 6, 3), 2048),
    101: ("bottleneck", (3, 4, 23, 3), 2048),
}
STAGE_WIDTHS = (64, 128, 256, 512)
EPS = 1e-5  # torch norm eps default


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 18
    norm: str = "instance"  # "instance" | "batch"
    compute_dtype: object = jnp.float32
    # Rewrite the 7x7/s2 stem conv as a 2x2 space-to-depth + 4x4/s1 conv
    # (MLPerf TPU ResNet trick): mathematically identical, but the MXU sees
    # 12 input channels instead of 3 and a quarter of the spatial positions.
    space_to_depth: bool = False
    # MXU precision tier for every conv + the fc head. On TPU, f32 convs at
    # the DEFAULT precision feed the MXU bf16 inputs (f32 accumulation) —
    # features only reach maxabs ~1e-2 of true f32. Measured ladder vs the
    # CPU true-f32 oracle (docs/PERF.md "Precision tiers"):
    #   "default"  maxabs 1.4e-2  19.0k patches/s (1 bf16 MXU pass)
    #   "high"     maxabs 7e-5    11.2k patches/s (bf16_3x: 3 passes)
    #   "highest"  maxabs 3e-6     6.6k patches/s (bf16_6x: torch parity)
    precision: str = "default"  # "default" | "high" | "highest"
    # Optional EXPLICIT conv-operand dtype (activations/accumulation stay in
    # compute_dtype). With compute_dtype=f32 + operand_dtype=bf16 the math
    # is what DEFAULT precision already does inside the MXU (operands
    # rounded to bf16, f32 accumulation), but the cast is visible to XLA so
    # producer fusions can emit a bf16 copy for the conv read while the f32
    # residual/norm stream stays exact — a bandwidth experiment for the
    # parity tier (docs/PERF.md "Precision tiers").
    operand_dtype: Optional[object] = None
    # Route InstanceNorm(+trailing ReLU) through the single-pass Pallas
    # kernel (ops/in_pallas.py): one HBM read+write per activation instead
    # of XLA's reduce+normalize kernel pair. Inference-path only (the
    # kernel has no custom VJP); falls back to the XLA norm per call site
    # when the shape is unsupported (C not 64/k*128, odd H*W at C=64).
    # Measured on chip in benchmarks/in_epilogue_probe.py (docs/PERF.md
    # "conv+IN epilogue").
    fused_in: bool = False

    @property
    def conv_precision(self):
        if self.precision == "default":
            return None
        try:
            return {"high": jax.lax.Precision.HIGH,
                    "highest": jax.lax.Precision.HIGHEST}[self.precision]
        except KeyError:
            raise ValueError(
                f"unknown precision tier {self.precision!r}; expected "
                "'default', 'high', or 'highest'") from None

    @property
    def block(self) -> str:
        return ARCHS[self.depth][0]

    @property
    def stage_blocks(self) -> Tuple[int, ...]:
        return ARCHS[self.depth][1]

    @property
    def num_feats(self) -> int:
        return ARCHS[self.depth][2]

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1


# ---------------------------------------------------------------------------
# Parameter specs (torchvision state_dict name order)
# ---------------------------------------------------------------------------

def _block_convs(cfg: ResNetConfig, in_ch: int, width: int, stride: int,
                 prefix: str) -> List[Tuple[str, Tuple[int, ...], int]]:
    """(name, kernel shape HWIO, stride) conv specs of one residual block, in
    torchvision module order (downsample after the main-path convs)."""
    out_ch = width * (4 if cfg.block == "bottleneck" else 1)
    specs: List[Tuple[str, Tuple[int, ...], int]] = []
    if cfg.block == "basic":
        specs.append((f"{prefix}.conv1.weight", (3, 3, in_ch, width), stride))
        specs.append((f"{prefix}.conv2.weight", (3, 3, width, width), 1))
    else:
        specs.append((f"{prefix}.conv1.weight", (1, 1, in_ch, width), 1))
        specs.append((f"{prefix}.conv2.weight", (3, 3, width, width), stride))
        specs.append((f"{prefix}.conv3.weight", (1, 1, width, out_ch), 1))
    if stride != 1 or in_ch != out_ch:
        specs.append((f"{prefix}.downsample.0.weight", (1, 1, in_ch, out_ch), stride))
    return specs


def conv_specs(cfg: ResNetConfig) -> List[Tuple[str, Tuple[int, ...], int]]:
    """All conv weights in torchvision state_dict order."""
    specs = [("conv1.weight", (7, 7, 3, 64), 2)]
    in_ch = 64
    for stage_idx, (n_blocks, width) in enumerate(zip(cfg.stage_blocks, STAGE_WIDTHS)):
        for block_idx in range(n_blocks):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            prefix = f"layer{stage_idx + 1}.{block_idx}"
            specs.extend(_block_convs(cfg, in_ch, width, stride, prefix))
            in_ch = width * cfg.expansion
    return specs


def param_names(cfg: ResNetConfig, include_fc: bool = False) -> List[str]:
    """State_dict key order (learnable params only). For instance norm this
    is conv weights only; for batch norm each conv's norm params follow it
    (weight, bias, running_mean, running_var — torch's num_batches_tracked is
    dropped, it carries no math)."""
    names: List[str] = []
    for conv_name, _, _ in conv_specs(cfg):
        names.append(conv_name)
        if cfg.norm == "batch":
            bn = _norm_name_for(conv_name)
            names.extend(f"{bn}.{p}" for p in
                         ("weight", "bias", "running_mean", "running_var"))
    if include_fc:
        names.extend(["fc.weight", "fc.bias"])
    return names


def _norm_name_for(conv_name: str) -> str:
    """torchvision pairing: conv1->bn1, layerX.Y.convZ->layerX.Y.bnZ,
    layerX.Y.downsample.0->layerX.Y.downsample.1."""
    if conv_name == "conv1.weight":
        return "bn1"
    base = conv_name[: -len(".weight")]
    if base.endswith("downsample.0"):
        return base[:-1] + "1"
    return base.replace(".conv", ".bn")


def init_params(key, cfg: ResNetConfig) -> Dict[str, jnp.ndarray]:
    """Kaiming-normal conv init (torchvision's), bn weight=1/bias=0,
    running stats (0, 1)."""
    params: Dict[str, jnp.ndarray] = {}
    for conv_name, shape, _ in conv_specs(cfg):
        key, sub = jax.random.split(key)
        fan_out = shape[0] * shape[1] * shape[3]
        std = float(np.sqrt(2.0 / fan_out))
        params[conv_name] = std * jax.random.normal(sub, shape, jnp.float32)
        if cfg.norm == "batch":
            bn = _norm_name_for(conv_name)
            out_ch = shape[3]
            params[f"{bn}.weight"] = jnp.ones((out_ch,))
            params[f"{bn}.bias"] = jnp.zeros((out_ch,))
            params[f"{bn}.running_mean"] = jnp.zeros((out_ch,))
            params[f"{bn}.running_var"] = jnp.ones((out_ch,))
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(x, w, stride: int, dtype, precision=None, operand_dtype=None):
    # Activations stay in the compute dtype between layers: with bf16 this
    # halves inter-layer HBM traffic (+45% throughput measured on v5e). The
    # MXU still accumulates in f32 internally; norm statistics are taken in
    # f32 (_norm below).
    od = operand_dtype or dtype
    pad = (w.shape[0] - 1) // 2
    return jax.lax.conv_general_dilated(
        x.astype(od), w.astype(od),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
        precision=precision,
    )


def _norm(params, x, conv_name: str, cfg: ResNetConfig):
    dtype = x.dtype
    if cfg.norm == "instance":
        # InstanceNorm2d(affine=False): per-sample per-channel over H,W with
        # biased variance, eps=1e-5 (torch default). Stats in f32 for
        # stability; XLA fuses the casts into the reduction.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + EPS)).astype(dtype)
    bn = _norm_name_for(conv_name)
    scale = params[f"{bn}.weight"] * jax.lax.rsqrt(params[f"{bn}.running_var"] + EPS)
    bias = params[f"{bn}.bias"] - params[f"{bn}.running_mean"] * scale
    return (x.astype(jnp.float32) * scale + bias).astype(dtype)


def _norm_relu(params, x, conv_name: str, cfg: ResNetConfig, relu: bool):
    """_norm (+ trailing ReLU), routed through the fused single-pass Pallas
    InstanceNorm when cfg.fused_in and the shape qualifies (C == 64 with an
    even plane, or any multiple of 128 — every torchvision-ResNet IN shape).
    The round-5 C<=128 cap is gone: the C>=256 rc=1 "rejections" were
    scoped-vmem stack OOMs from oversized blocks, fixed by the element
    budget in ops/in_pallas.py::_pick_bn (docs/PERF.md "conv+IN
    epilogue")."""
    if cfg.fused_in and cfg.norm == "instance":
        c, s = x.shape[-1], x.shape[1] * x.shape[2]
        if (c == 64 and s % 2 == 0) or c % 128 == 0:
            from tpumil.ops.in_pallas import fused_instance_norm

            interpret = jax.default_backend() != "tpu"
            return fused_instance_norm(x, relu=relu, interpret=interpret)
    out = _norm(params, x, conv_name, cfg)
    return jax.nn.relu(out) if relu else out


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1), window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def _stem_space_to_depth(x, w7, dtype, precision=None, operand_dtype=None):
    """conv1 7x7/s2/p3 expressed on a 2x2 space-to-depth input: channel
    packing (py, px, c); kernel padded to 8x8 and regrouped to 4x4x12;
    asymmetric padding (2, 1) reproduces the original receptive field
    exactly (verified to f32 noise)."""
    od = operand_dtype or dtype
    b, h, w, _ = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(b, h // 2, w // 2, 12)
    wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    ws = wp.reshape(4, 2, 4, 2, 3, -1).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(4, 4, 12, -1)
    return jax.lax.conv_general_dilated(
        xs.astype(od), ws.astype(od), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype, precision=precision)


def forward(params: Dict[str, jnp.ndarray], x, cfg: ResNetConfig):
    """x: [N, H, W, 3] float (0-1 range as produced by to_tensor). Returns
    pooled features [N, num_feats] in float32."""
    dtype = cfg.compute_dtype
    prec = cfg.conv_precision
    od = cfg.operand_dtype
    if cfg.space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        x = _stem_space_to_depth(x, params["conv1.weight"], dtype, prec, od)
    else:
        x = _conv(x, params["conv1.weight"], 2, dtype, prec, od)
    x = _norm_relu(params, x, "conv1.weight", cfg, relu=True)
    x = _maxpool_3x3_s2(x)

    in_ch = 64
    for stage_idx, (n_blocks, width) in enumerate(zip(cfg.stage_blocks, STAGE_WIDTHS)):
        for block_idx in range(n_blocks):
            stride = 2 if (stage_idx > 0 and block_idx == 0) else 1
            prefix = f"layer{stage_idx + 1}.{block_idx}"
            out_ch = width * cfg.expansion
            identity = x
            if cfg.block == "basic":
                h = _conv(x, params[f"{prefix}.conv1.weight"], stride, dtype, prec, od)
                h = _norm_relu(params, h, f"{prefix}.conv1.weight", cfg, relu=True)
                h = _conv(h, params[f"{prefix}.conv2.weight"], 1, dtype, prec, od)
                h = _norm_relu(params, h, f"{prefix}.conv2.weight", cfg, relu=False)
            else:
                h = _conv(x, params[f"{prefix}.conv1.weight"], 1, dtype, prec, od)
                h = _norm_relu(params, h, f"{prefix}.conv1.weight", cfg, relu=True)
                h = _conv(h, params[f"{prefix}.conv2.weight"], stride, dtype, prec, od)
                h = _norm_relu(params, h, f"{prefix}.conv2.weight", cfg, relu=True)
                h = _conv(h, params[f"{prefix}.conv3.weight"], 1, dtype, prec, od)
                h = _norm_relu(params, h, f"{prefix}.conv3.weight", cfg, relu=False)
            if stride != 1 or in_ch != out_ch:
                identity = _conv(x, params[f"{prefix}.downsample.0.weight"], stride, dtype, prec, od)
                identity = _norm_relu(params, identity, f"{prefix}.downsample.0.weight", cfg, relu=False)
            x = jax.nn.relu(h + identity)
            in_ch = out_ch
    # adaptive average pool to 1x1
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Torch import
# ---------------------------------------------------------------------------

def _to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def load_torch_state_dict(sd: Dict[str, np.ndarray], cfg: ResNetConfig,
                          strict: bool = True) -> Dict[str, jnp.ndarray]:
    """Name-based import of a torchvision-style state_dict (conv OIHW ->
    HWIO; num_batches_tracked ignored)."""
    conv_names = {name for name, _, _ in conv_specs(cfg)}
    params: Dict[str, jnp.ndarray] = {}
    for name in param_names(cfg):
        if name not in sd:
            if strict:
                raise KeyError(f"missing {name} in checkpoint")
            continue
        v = np.asarray(sd[name], dtype=np.float32)
        params[name] = jnp.asarray(_to_hwio(v) if name in conv_names else v)
    return params


def load_positional(values: List[np.ndarray], cfg: ResNetConfig) -> Dict[str, jnp.ndarray]:
    """Positional import: assign a checkpoint's values (in their saved order,
    projection head already stripped) onto this architecture's param names —
    the reference's zip-rename surgery (compute_feats.py:187-190). Shape
    agreement is asserted to catch mis-ordered checkpoints early."""
    names = param_names(cfg)
    if len(values) != len(names):
        raise ValueError(f"checkpoint has {len(values)} tensors but arch has "
                         f"{len(names)} params (a short checkpoint would "
                         "silently load a truncated backbone)")
    params: Dict[str, jnp.ndarray] = {}
    spec_shapes = {name: shape for name, shape, _ in conv_specs(cfg)}
    for name, v in zip(names, values):
        v = np.asarray(v, dtype=np.float32)
        if name in spec_shapes:  # a conv weight: OIHW -> HWIO
            v = _to_hwio(v)
            if tuple(v.shape) != tuple(spec_shapes[name]):
                raise ValueError(f"{name}: checkpoint shape {v.shape} != "
                                 f"expected {spec_shapes[name]}")
        params[name] = jnp.asarray(v)
    return params


def to_oihw(v: np.ndarray) -> np.ndarray:
    """Inverse of _to_hwio: export a conv kernel back to torch's OIHW."""
    return np.transpose(v, (3, 2, 0, 1))


def export_state_dict(backbone_params: Dict, cfg: ResNetConfig,
                      prefix: str = "") -> OrderedDict:
    """Backbone tensors in torchvision name order (convs as OIHW), each key
    prefixed — the single source of the export layout every surgered
    checkpoint format builds on (embedder.pth, SimCLR model.pth)."""
    sd = OrderedDict()
    conv_names = {name for name, _, _ in conv_specs(cfg)}
    for name in param_names(cfg):
        v = np.asarray(backbone_params[name], np.float32)
        sd[prefix + name] = to_oihw(v) if name in conv_names else v
    return sd
