"""Single-pass Pallas InstanceNorm(+ReLU) for NHWC conv activations.

Why: the embedder's InstanceNorm costs a measured 4.65 us/img on top of the
folded-norm conv path (docs/PERF.md "Where the remaining headroom is").
XLA lowers IN as a reduce kernel (read) plus an elementwise normalize
kernel (read + write) over the activation; a stats barrier is fundamental
(normalization needs the full spatial extent), but both passes can share
ONE VMEM residency: this kernel reads each (sample, channel-block) plane
once, computes the per-(sample, channel) statistics in VMEM, normalizes
(optionally ReLUs) in place, and writes once — the minimum possible HBM
traffic for any IN implementation (read + write).

torch semantics: InstanceNorm2d(affine=False, eps=1e-5) — torchvision
resnets built with ``norm_layer=nn.InstanceNorm2d`` carry no gamma/beta
(the same semantics tpumil/models/resnet.py::_norm implements in XLA).

Layout: x [N, H, W, C] is viewed as [N, S=H*W, C]. Blocks keep the lane
dim at 128:
  * C >= 128: grid (N/bn, C/128), block [bn, S, 128] — a contiguous
    channel-block slice per sample;
  * C == 64: the [N, S, 64] view is reinterpreted (contiguously) as
    [N, S/2, 128], so each lane carries channel (lane % 64) of one of two
    interleaved spatial positions. The per-channel partial sums of the two
    lane groups are combined — and broadcast back to all 128 lanes — by one
    tiny [bn,128]@[128,128] fold matmul (lane-crossing reshapes are not
    expressible in Mosaic; a matmul is).
``bn`` samples share a block (targeting ~2 MB) so deep layers' small
planes (7x7x512) still ride full-size DMAs.

Statistics match the XLA path's dtype discipline: sums in f32 of the
stored compute-dtype values, biased variance (torch InstanceNorm2d),
eps inside the rsqrt. Parity: tests/test_in_pallas.py (interpret mode on
CPU vs resnet._norm; TPU numerics in the on-chip probe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5  # torch InstanceNorm2d default


def _kernel(*refs, bn, s, count, folded, relu):
    """refs: (x_ref[, fold_ref], out_ref); x/out are [bn * s, 128] blocks
    (bn samples, s rows each). ``count``: real elements per
    (sample, channel) = H*W. ``fold_ref`` (present when ``folded``): a
    [128, 128] 0/1 matrix summing lane groups of the same channel and
    broadcasting the result back."""
    x_ref, out_ref = refs[0], refs[-1]
    x = x_ref[:].astype(jnp.float32).reshape(bn, s, 128)
    ssum = jnp.sum(x, axis=1)                    # [bn, 128]
    ssq = jnp.sum(x * x, axis=1)                 # [bn, 128]
    if folded:
        # HIGHEST precision is load-bearing: at DEFAULT the MXU rounds the
        # f32 partial sums to bf16 inputs (measured 7.8e-3 parity error on
        # chip; exact with HIGHEST — the fold matrix itself is 0/1)
        fold = refs[1][:]
        ssum = jax.lax.dot_general(ssum, fold, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
        ssq = jax.lax.dot_general(ssq, fold, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
    mean = ssum / count
    # biased, like torch IN. The one-pass form can round NEGATIVE on
    # near-constant planes (f32 error in ssq/count - mean^2 scales with
    # mean^2), where rsqrt(var + EPS) would NaN — clamp to the two-pass
    # formula's non-negative domain (resnet._norm can never go negative).
    var = jnp.maximum(ssq / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + EPS)
    y = (x - mean[:, None, :]) * inv[:, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(bn * s, 128).astype(out_ref.dtype)


MAX_BLOCK_ELEMS_BF16 = 200_000  # see _pick_bn; calibrated at itemsize 2


def _pick_bn(n: int, s: int, itemsize: int) -> int:
    """Largest divisor of n keeping the [bn, s, 128] block under the
    element budget (MAX_BLOCK_ELEMS_BF16 at itemsize 2, scaled down for
    wider input dtypes — the double-buffered in/out blocks grow with
    itemsize while the f32 temporaries do not).

    The binding constraint is the Mosaic scoped-vmem STACK (16 MB), not the
    stored block bytes: the kernel holds double-buffered in/out blocks plus
    f32 temporaries (x, x*x, y), and the measured on-chip footprint is
    23-48 B per block element for bf16 inputs depending on shape (a
    2 MB-stored-block target OOM'd at [32*196,128] with 18.36 MB requested;
    [64*49,128] requested 19.24 MB — docs/PERF.md "conv+IN epilogue").
    200k bf16 elements bounds the worst observed rate at ~9.6 MB. The bn=1
    floor can exceed the budget for stem-sized planes ([6272,128] = 803k
    elements); that configuration is measured to fit on chip (Mosaic's
    footprint per element shrinks for single-sample blocks)."""
    budget = (2 * MAX_BLOCK_ELEMS_BF16) // max(2, itemsize)
    cap = max(1, budget // max(1, s * 128))
    bn = 1
    for d in range(1, n + 1):
        if n % d == 0 and d <= cap:
            bn = d
    return bn


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def fused_instance_norm(x: jnp.ndarray, relu: bool = False,
                        interpret: bool = False) -> jnp.ndarray:
    """InstanceNorm2d(affine=False)(x) (+ ReLU) in one HBM pass.

    x: [N, H, W, C] with C == 64 or a multiple of 128. Returns the same
    shape/dtype. Inference-path kernel (no custom VJP): the embedder CLIs
    and serving use it; SimCLR training keeps the XLA norm.
    """
    n, h, w, c = x.shape
    s = h * w
    fold = None
    if c == 64:
        if s % 2:
            raise ValueError(f"C=64 folding needs an even H*W (got {s})")
        xv = x.reshape(n, s // 2, 128)
        s_eff, c_blocks = s // 2, 1
        # fold[k*64 + c, l] = 1 where l % 64 == c: sums the two lane
        # groups of each channel and broadcasts back to both
        eye = np.eye(64, dtype=np.float32)
        fold = jnp.asarray(np.tile(np.tile(eye, (2, 1)), (1, 2)))
    elif c % 128 == 0:
        xv = x.reshape(n, s, c)
        s_eff, c_blocks = s, c // 128
    else:
        raise ValueError(f"unsupported channel count {c} (need 64 or k*128)")

    bn = _pick_bn(n, s_eff, x.dtype.itemsize)
    kern = functools.partial(_kernel, bn=bn, s=s_eff, count=float(s),
                             folded=fold is not None, relu=relu)
    # 2D blocks [bn * s_eff, 128] over a [N * s_eff, C'] view: sample-major
    # rows, so block row i covers samples [i*bn, (i+1)*bn)
    xf = xv.reshape(n * s_eff, c_blocks * 128)
    in_specs = [pl.BlockSpec((bn * s_eff, 128), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)]
    args = [xf]
    if fold is not None:
        in_specs.append(pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(fold)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(n // bn, c_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn * s_eff, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out.reshape(n, h, w, c)
