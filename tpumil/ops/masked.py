"""Masked reductions over padded instance dimensions.

The reference processes each bag as an unpadded ``N x K`` tensor in eager
PyTorch (reference dsmil.py:46-62), so it never needs masking. Under XLA all
shapes are static: bags are padded to a bucket length and every reduction over
the instance axis must ignore padded rows. These helpers are the single source
of truth for that masking discipline.

Conventions:
  * ``x`` has the instance axis at ``axis`` (default 0 for a single bag
    ``[N, C]``; batched call sites pass ``axis=1`` for ``[B, N, C]``).
  * ``mask`` is boolean with ``True`` = real instance. Its shape must be
    broadcastable to ``x`` after expanding trailing dims (callers pass
    ``mask[..., None]`` style shapes or a mask matching ``x`` minus trailing
    feature dims).
"""

from __future__ import annotations

import jax.numpy as jnp

# Large-but-finite sentinel. Using -inf directly would poison softmax rows that
# are entirely padding (0/0 -> NaN); a finite sentinel keeps padded-only rows
# at exactly uniform-softmax garbage that callers then zero out via the mask.
NEG_INF = -1e30


def _fill(x, mask, fill_value):
    if mask is None:
        return x
    mask = jnp.broadcast_to(jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask, x.shape)
    return jnp.where(mask, x, fill_value)


def masked_max(x, mask, axis):
    """Max over ``axis`` ignoring padded entries (reference train_tcga.py:68)."""
    return jnp.max(_fill(x, mask, NEG_INF), axis=axis)


def masked_argmax(x, mask, axis):
    """Index of the max over ``axis`` ignoring padded entries.

    Reproduces the critical-instance selection of the reference
    (dsmil.py:52-53): ``torch.sort(c, 0, descending=True)`` then row 0, i.e.
    the per-class argmax over instances; ties resolve to the lowest index in
    both implementations.
    """
    return jnp.argmax(_fill(x, mask, NEG_INF), axis=axis)


def masked_mean(x, mask, axis):
    """Mean over ``axis`` counting only real instances (used by the
    mean-pooling MIL baseline). Padded-only slices return 0."""
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = jnp.broadcast_to(
        jnp.expand_dims(mask, -1) if mask.ndim == x.ndim - 1 else mask,
        x.shape).astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def masked_softmax(x, mask, axis):
    """Softmax over ``axis`` with padded entries receiving exactly 0 weight.

    Matches ``F.softmax(A / sqrt(d), 0)`` of the reference (dsmil.py:56) on
    the real rows. Numerically stabilised by subtracting the (masked) max.
    """
    x = _fill(x, mask, NEG_INF)
    x = x - jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x)
    if mask is not None:
        e = _fill(e, mask, 0.0)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, jnp.finfo(e.dtype).tiny)
