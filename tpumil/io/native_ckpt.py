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


# ---------------------------------------------------------------------------
# Sharded (multi-chip) train state
# ---------------------------------------------------------------------------
# The plain PyTreeCheckpointer path above restores without sharding info —
# fine single-chip, but on a mesh it warns "unsafe when restoring on a
# different topology" and pins arrays to the saving topology. The API below
# records each array's global shape at save and REBUILDS the arrays under an
# explicit sharding at restore, so a checkpoint written on an 8-device mesh
# restores onto 4 devices (or one chip) and vice versa. The reference has no
# training resume at all (SURVEY.md section 5); this is tpumil's multi-chip
# crash-recovery story, exercised in tests/test_parallel.py and
# __graft_entry__.dryrun_multichip.


def save_sharded_train_state(path: str, arrays: Any, *,
                             meta: Optional[dict] = None) -> None:
    """Save a pytree of (possibly mesh-sharded) jax.Arrays / numpy arrays
    plus a small JSON-able ``meta`` dict (epoch counters, RNG descriptions —
    StandardCheckpointer itself rejects strings).

    Crash-safe in-place overwrite: the new state is written to a sibling
    ``.inflight`` dir first, then swapped in with atomic renames (the
    previous state survives as ``.prev`` until the swap completes, and
    :func:`load_sharded_train_state` falls back to it). A kill at ANY point
    leaves a loadable checkpoint on disk — this is the store behind every
    crash-resume feature (mid-fold, mid-epoch SimCLR), so a save must never
    be able to destroy the only copy.

    Multi-process note: only process 0 performs the swap (orbax has already
    barriered all processes at the end of its write)."""
    import shutil

    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    inflight = path + ".inflight"
    prev = path + ".prev"
    if jax.process_index() == 0:
        shutil.rmtree(inflight, ignore_errors=True)
    _sync_processes("tpumil_ckpt_pre")
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ck:
        ck.save(inflight, args=ocp.args.Composite(
            state=ocp.args.StandardSave(arrays),
            meta=ocp.args.JsonSave(meta or {})), force=True)
    if jax.process_index() == 0:
        # Ordering is load-bearing: `prev` may be the ONLY loadable copy
        # (the previous save crashed between its two renames, so `path` is
        # missing and the loader fell back to `.prev`). Deleting it is only
        # safe while `path` holds a complete generation — so the demotion
        # happens strictly under `if path exists`, and an orphaned `prev`
        # survives until the new `path` has been renamed into place.
        if os.path.exists(path):
            shutil.rmtree(prev, ignore_errors=True)
            os.rename(path, prev)
        os.rename(inflight, path)
        shutil.rmtree(prev, ignore_errors=True)
    _sync_processes("tpumil_ckpt_post")


def _sync_processes(tag: str) -> None:
    """Barrier across jax processes (no-op single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def load_sharded_train_state(path: str, like: Any, sharding=None):
    """Restore ``(arrays, meta)`` saved by :func:`save_sharded_train_state`.

    ``like`` is a pytree matching the saved structure whose leaves give
    shape/dtype (concrete arrays or ``jax.ShapeDtypeStruct``). Every jax
    leaf is restored under ``sharding`` when given (e.g. replicated over the
    CURRENT mesh — which may have a different device count than the saving
    mesh); numpy leaves restore as numpy. ``sharding`` may also be a
    callable ``leaf -> Sharding`` for mixed layouts.

    If ``path`` is missing (a save crashed between its two swap renames)
    the ``.prev`` generation is restored instead — see
    :func:`save_sharded_train_state`."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".prev"):
        path = path + ".prev"

    default = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def abstr(x):
        if isinstance(x, np.ndarray):
            return x  # numpy leaves stay host-side
        s = (sharding(x) if callable(sharding) else sharding) or default
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)

    abstract = jax.tree.map(abstr, like)
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ck:
        r = ck.restore(path, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract),
            meta=ocp.args.JsonRestore()))
    return r["state"], dict(r["meta"] or {})
