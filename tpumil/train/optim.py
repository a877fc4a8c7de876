"""Optimizer matching the reference's training recipe.

The reference uses ``torch.optim.Adam(lr, betas=(0.5, 0.9), weight_decay=wd)``
with ``CosineAnnealingLR(T_max=num_epochs, eta_min)`` stepped once per epoch
(train_tcga.py:241-242, train_mil.py:174-175). Torch's Adam applies weight
decay as an L2 term added to the gradient *before* the moment updates, and
adds eps outside the sqrt — both reproduced here via the optax chain
``add_decayed_weights -> scale_by_adam``.

The learning rate is deliberately *not* baked into the transform: the per-bag
``lax.scan`` trainer passes it in as a traced scalar so one compiled step
serves every epoch of the cosine schedule.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import optax


class Optimizer(NamedTuple):
    tx: optax.GradientTransformation

    def init(self, params):
        return self.tx.init(params)

    def step(self, params, opt_state, grads, lr):
        """One update with learning rate ``lr`` (a traced scalar is fine)."""
        updates, opt_state = self.tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state


def adam_torch(betas=(0.5, 0.9), weight_decay: float = 0.0, eps: float = 1e-8) -> Optimizer:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    return Optimizer(optax.chain(*parts))


def cosine_annealing_lr(base_lr: float, t_max: int, eta_min: float = 0.0):
    """Per-epoch LR of ``torch.optim.lr_scheduler.CosineAnnealingLR``:
    epoch ``e`` (0-based, scheduler stepped after each epoch) runs at
    ``eta_min + (base_lr - eta_min) * (1 + cos(pi * e / T_max)) / 2``."""

    def lr(epoch: int) -> float:
        return eta_min + (base_lr - eta_min) * (1.0 + math.cos(math.pi * epoch / t_max)) / 2.0

    return lr
