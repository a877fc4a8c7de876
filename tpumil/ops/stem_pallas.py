"""Fused Pallas ResNet stem: 7x7/s2 conv + InstanceNorm + ReLU in one VMEM
pass per image (maxpool riding the XLA epilogue).

Why: the reference embeds patches with torchvision ResNets
(compute_feats.py:146-170); on TPU the stem is the worst stage of the
network — the 7x7 conv's 3 input channels starve the MXU (measured 45
TFLOP/s vs 157 for the 3x3 stages) and the instance-norm chain round-trips
the 112x112x64 activation through HBM twice more. This kernel:

  * rewrites the conv as a 2x2 space-to-depth im2col matmul
    [12880, 256] @ [256, 64]. The input is packed channel-major into a flat
    "q-space" [16, 115*115(+pad)] so that every one of the 16 kernel taps is
    a single CONTIGUOUS lane-offset slice (tap (di,dj) starts at
    q = di*115 + dj) — no lane-crossing reshapes, which Mosaic cannot do.
    The 16 tap slices stack along sublanes into the [256, 12880] im2col
    matrix, contracted on dim 0 (MXU transposed-LHS matmul). K=256 fills
    two MXU tiles, so the conv runs at matmul rates;
  * the price of the flat layout is 3 junk columns per row (j in 112..114,
    the right spatial padding) and 3 junk tail rows: they are masked out of
    the InstanceNorm statistics in-kernel and zeroed in the output;
  * computes the InstanceNorm statistics, normalization and ReLU while the
    conv output is still in VMEM, writing one [12880, 64] array per image.

The caller reshapes [B, 12880, 64] -> [B, 112, 115, 64], drops the junk
columns, and runs the 3x3/s2 maxpool in XLA (fused with the slice).

Numerics: the matmul accumulates in f32 and is rounded to the compute
dtype before the statistics, mirroring the unfused XLA path (conv output
materialized in bf16, stats taken in f32 of those values —
tpumil/models/resnet.py::_norm). The only remaining deviation from the
XLA path is reduction order. Parity is pinned by tests/test_stem_pallas.py
(f32 interpret mode: ~1e-5; bf16 on TPU: small multiple of the bf16 ulp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5  # torch InstanceNorm2d default

H_IN = 224
H_S2D = H_IN // 2          # 112: s2d rows = conv output rows (stride folds away)
H_PAD = H_S2D + 3          # asymmetric (2, 1) padding of the 4x4 s2d kernel
C_S2D = 16                 # 2*2*3 = 12 real channels, padded to 16
K_COL = 4 * 4 * C_S2D      # 256
C_OUT = 64
H_OUT = H_S2D // 2         # 56 after the 3x3/s2 maxpool
Q = H_S2D * H_PAD          # 12880 rows of flat q-space the kernel emits
Q_VALID = (H_S2D - 1) * H_PAD + H_S2D  # 12877: q of the last real pixel + 1
Q_FLAT = H_PAD * H_PAD     # 13225 flat pixels per channel plane
Q_FLAT_PAD = 13232         # + right pad so every tap slice stays in bounds
N_PIX = H_S2D * H_S2D      # 12544 real pixels for the statistics


def _pack_weights(w7: jnp.ndarray, dtype) -> jnp.ndarray:
    """torchvision conv1.weight in HWIO [7,7,3,64] -> s2d im2col weights
    [256, 64]. Same regrouping as resnet._stem_space_to_depth: pad the 7x7
    kernel to 8x8 (one leading zero row/col), split each axis into
    (tap, parity), giving a 4x4 kernel over 2x2x3 packed channels."""
    wp = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))       # [8,8,3,64]
    ws = wp.reshape(4, 2, 4, 2, 3, C_OUT).transpose(0, 2, 1, 3, 4, 5)
    ws = ws.reshape(4, 4, 12, C_OUT)                          # [di,dj,c,o]
    ws = jnp.pad(ws, ((0, 0), (0, 0), (0, C_S2D - 12), (0, 0)))
    return ws.reshape(K_COL, C_OUT).astype(dtype)


def _pack_input(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """[B,224,224,3] -> [B, 16, 13232]: 2x2 space-to-depth, channel pad
    12->16, asymmetric (2,1) spatial pad, channel-major flat q-space."""
    b, h, w, _ = x.shape
    xs = x.reshape(b, h // 2, 2, w // 2, 2, 3).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(b, h // 2, w // 2, 12)
    xs = jnp.pad(xs, ((0, 0), (2, 1), (2, 1), (0, C_S2D - 12)))
    xc = xs.transpose(0, 3, 1, 2).reshape(b, C_S2D, Q_FLAT)
    return jnp.pad(xc, ((0, 0), (0, 0), (0, Q_FLAT_PAD - Q_FLAT))).astype(dtype)


def _stem_kernel(xp_ref, w_ref, out_ref, colt_ref, *, acc_dtype):
    cdtype = out_ref.dtype
    xc = xp_ref[0]                                  # [16, 13232]

    # im2col, transposed: tap (di, dj) is rows [t*16, t*16+16) — one
    # contiguous lane-offset slice of the flat q-space per tap. The slices
    # carry different lane offsets, so they are assembled through a VMEM
    # scratch ref (stores re-align the layout; Mosaic cannot concatenate
    # vectors with mismatched lane offsets directly).
    for t, (di, dj) in enumerate((di, dj) for di in range(4) for dj in range(4)):
        off = di * H_PAD + dj
        colt_ref[t * C_S2D:(t + 1) * C_S2D, :] = xc[:, off: off + Q]

    # conv as one transposed-LHS MXU matmul, f32 accumulation, rounded to
    # the compute dtype exactly like the unfused path materializes conv out.
    # precision must follow the stream dtype: at DEFAULT the MXU feeds
    # bf16-rounded operands even for f32 inputs (the dsmil_pallas.py f32
    # path measured 1.7e-1 maxabs from exactly this), which would break the
    # f32 stem's parity claim; bf16 streams keep DEFAULT (operands already
    # bf16).
    prec = (jax.lax.Precision.HIGHEST if colt_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jax.lax.dot_general(
        colt_ref[:], w_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec).astype(cdtype)    # [12880, 64]

    # InstanceNorm2d(affine=False) stats over the 12544 REAL pixels: mask
    # the 3 junk columns per row (right spatial pad) and the 3 tail rows.
    q = jax.lax.broadcasted_iota(jnp.int32, (Q, 1), 0)
    valid = (q % H_PAD < H_S2D) & (q < Q_VALID)
    of = jnp.where(valid, out.astype(acc_dtype), 0.0)
    mean = jnp.sum(of, axis=0, keepdims=True) / N_PIX
    var = jnp.sum(
        jnp.where(valid, jnp.square(of - mean), 0.0), axis=0, keepdims=True
    ) / N_PIX
    n = (out.astype(acc_dtype) - mean) * jax.lax.rsqrt(var + EPS)
    out_ref[0] = jnp.where(valid, jnp.maximum(n, 0.0), 0.0).astype(cdtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype", "interpret"))
def fused_stem(x: jnp.ndarray, w7: jnp.ndarray, compute_dtype=jnp.bfloat16,
               interpret: bool = False) -> jnp.ndarray:
    """x: [B, 224, 224, 3] (any float dtype), w7: conv1.weight HWIO
    [7, 7, 3, 64]. Returns the post-stem activation [B, 56, 56, 64] in
    ``compute_dtype`` — conv7x7/s2 + InstanceNorm + ReLU + maxpool3x3/s2,
    numerically the resnet.forward stem (reference semantics of
    compute_feats.py:146-170's torchvision stem with InstanceNorm2d)."""
    if x.shape[1:] != (H_IN, H_IN, 3):
        raise ValueError(f"fused_stem expects [B,224,224,3], got {x.shape}")
    b = x.shape[0]
    xp = _pack_input(x, compute_dtype)
    w = _pack_weights(w7, compute_dtype)

    kernel = functools.partial(_stem_kernel, acc_dtype=jnp.float32)
    flat = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, C_S2D, Q_FLAT_PAD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_COL, C_OUT), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q, C_OUT), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, Q, C_OUT), compute_dtype),
        scratch_shapes=[pltpu.VMEM((K_COL, Q), compute_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * Q * K_COL * C_OUT,
            bytes_accessed=b * (C_S2D * Q_FLAT_PAD + Q * C_OUT) * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, w)

    # drop the junk columns and maxpool 3x3/s2 pad 1 (XLA fuses the slice)
    n = flat.reshape(b, H_S2D, H_PAD, C_OUT)[:, :, :H_S2D, :]
    return jax.lax.reduce_window(
        n, -jnp.inf if n.dtype == jnp.float32 else jnp.asarray(-np.inf, n.dtype),
        jax.lax.max, window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1), padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def xla_stem(x: jnp.ndarray, w7: jnp.ndarray, compute_dtype=jnp.bfloat16):
    """Unfused reference stem (identical math via XLA ops) for parity tests."""
    from tpumil.models.resnet import ResNetConfig, _conv, _maxpool_3x3_s2, _norm

    cfg = ResNetConfig(depth=18, norm="instance", compute_dtype=compute_dtype)
    h = _conv(x, w7, 2, compute_dtype)
    h = jax.nn.relu(_norm({}, h, "conv1.weight", cfg))
    return _maxpool_3x3_s2(h)
