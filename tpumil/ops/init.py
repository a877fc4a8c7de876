"""Parameter initializers.

``orthogonal_torch`` reproduces ``torch.nn.init.orthogonal_`` semantics used
by the reference for every Linear/Conv weight (train_tcga.py:229-233): the
weight is viewed as ``(shape[0], prod(shape[1:]))`` — rows are flattened output
units — QR-orthogonalised with sign correction, then reshaped back. Note this
differs from ``jax.nn.initializers.orthogonal`` which flattens leading dims
against the last dim; accuracy parity with the reference requires the torch
orientation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def orthogonal_torch(key, shape, dtype=jnp.float32, gain: float = 1.0):
    rows = shape[0]
    cols = int(np.prod(shape[1:])) if len(shape) > 1 else 1
    flat_shape = (rows, cols)
    # Sample a tall matrix so QR gives orthonormal columns, like torch does.
    transpose = rows < cols
    sample_shape = (cols, rows) if transpose else flat_shape
    a = jax.random.normal(key, sample_shape, dtype=jnp.float32)
    q, r = jnp.linalg.qr(a)
    # Sign correction so the decomposition is unique (matches torch).
    d = jnp.sign(jnp.diagonal(r))
    q = q * d[None, :]
    if transpose:
        q = q.T
    return (gain * q).reshape(shape).astype(dtype)
