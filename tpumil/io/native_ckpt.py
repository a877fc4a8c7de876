"""Native (orbax) checkpointing for params + optimizer state.

The reference only ever torch.saves model weights (SURVEY.md section 5 —
no resume of interrupted training). tpumil adds framework-grade
checkpoint/resume: full training state (params, optimizer moments, epoch
counter, RNG state) via orbax, alongside the ``.pth`` exports kept for
reference-ecosystem parity.
"""

from __future__ import annotations

import os
from typing import Any, Optional


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_pytree(tree: Any, path: str) -> None:
    """Save any pytree (params/opt_state/aux) to ``path`` (a directory)."""
    import jax

    path = os.path.abspath(path)
    tree = jax.tree.map(lambda x: x, tree)  # shallow copy
    _checkpointer().save(path, tree, force=True)


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree saved by ``save_pytree``. ``target`` (an example
    pytree) restores exact array types/shardings when given."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if target is not None:
        return _checkpointer().restore(path, item=target)
    return _checkpointer().restore(path)


def save_train_state(path: str, params: Any, opt_state: Any, *, epoch: int,
                     extra: Optional[dict] = None) -> None:
    save_pytree({"params": params, "opt_state": opt_state,
                 "epoch": epoch, "extra": extra or {}}, path)


def load_train_state(path: str) -> dict:
    return load_pytree(path)
