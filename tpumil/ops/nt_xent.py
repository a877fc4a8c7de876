"""NT-Xent (normalized-temperature cross-entropy) contrastive loss.

Semantics of the reference (simclr/loss/nt_xent.py:47-65): representations
``cat([zjs, zis])`` give a (2N)x(2N) similarity matrix; for each anchor the
positive is its other view (offset +-N) and the denominator is every other
sample except the anchor itself (the masked "negatives" plus the re-appended
positive); loss = sum of CE / (2N). Algebraically:

  loss_i = -sim(i, pair(i))/t + logsumexp_{j != i} sim(i, j)/t

which is the form implemented here — one fused matmul + masked logsumexp, no
(2N)x(2N-2) gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn as jnn


def l2_normalize(x, eps: float = 1e-12):
    """Row normalization with a finite gradient at x = 0 (``x / max(|x|, e)``
    NaNs there via 0/0 in the norm's own gradient; the rsqrt form does not —
    degenerate all-zero features arise e.g. from instance norm over a 1x1
    map on tiny inputs)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def nt_xent_loss(zis, zjs, temperature: float = 0.5,
                 use_cosine_similarity: bool = True):
    """zis/zjs: [N, D] projections of the two views."""
    z = jnp.concatenate([zjs, zis], axis=0)
    if use_cosine_similarity:
        z = l2_normalize(z)
    sim = (z @ z.T) / temperature                    # [2N, 2N]
    n = zis.shape[0]
    two_n = 2 * n
    idx = jnp.arange(two_n)
    pair = (idx + n) % two_n
    pos = sim[idx, pair]                             # positive logits
    self_mask = jnp.eye(two_n, dtype=bool)
    denom = jnp.where(self_mask, -jnp.inf, sim)
    lse = jnn.logsumexp(denom, axis=-1)
    return jnp.mean(lse - pos)
