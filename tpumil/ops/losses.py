"""Loss functions.

``bce_with_logits`` matches ``torch.nn.BCEWithLogitsLoss`` semantics
(mean reduction, optional ``pos_weight``) used by the reference trainers
(train_tcga.py:240, train_mil.py:172-173).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn


def bce_with_logits(logits, labels, pos_weight=None, reduction: str = "mean"):
    """Numerically stable binary cross-entropy on logits.

    Per element: ``l = (1 - y) * x + (1 + (p - 1) * y) * softplus(-x)`` which
    equals ``-[p * y * log(sigmoid(x)) + (1 - y) * log(1 - sigmoid(x))]``.
    ``pos_weight`` broadcasts over the class axis like torch's.
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    softplus_neg = jnn.softplus(-logits)
    if pos_weight is None:
        loss = (1.0 - labels) * logits + softplus_neg
    else:
        pw = jnp.asarray(pos_weight, dtype=jnp.float32)
        loss = (1.0 - labels) * logits + (1.0 + (pw - 1.0) * labels) * softplus_neg
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction != "none":
        # a typo ("Mean", "avg") must not silently return the unreduced
        # array where the caller expected a scalar
        raise ValueError(f"reduction must be 'mean', 'sum' or 'none', "
                         f"got {reduction!r}")
    return loss


def dual_stream_loss(bag_logits, max_ins_logits, labels, pos_weight=None):
    """The DSMIL training objective (train_tcga.py:68-71, train_mil.py:52-54):

    ``0.5 * BCE(bag_logits, y) + 0.5 * BCE(max_instance_logits, y)``.
    """
    bag = bce_with_logits(bag_logits, labels, pos_weight)
    ins = bce_with_logits(max_ins_logits, labels, pos_weight)
    return 0.5 * bag + 0.5 * ins
