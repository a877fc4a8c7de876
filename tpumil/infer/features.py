"""Batched bf16 feature extraction over tiled WSI patches.

Replaces compute_feats.py:58-126. Differences by design:
  * one fixed-shape jitted bf16 ResNet program instead of eager fp32 torch;
  * host JPEG decode runs in a prefetching thread pool overlapping device
    compute (the reference decodes synchronously inside DataLoader workers
    then blocks on ``.cuda()`` per batch, compute_feats.py:72);
  * tree (multi-magnification) mode batches ALL high patches instead of the
    reference's one-image-at-a-time loop (compute_feats.py:106-109 runs
    batch_size=1 per high patch — pathologically serial);
  * CSV output keeps '%.4f' parity (compute_feats.py:80-82).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.data import patches as patch_data
from tpumil.data.feature_store import build_dataset_csvs, write_bag_csv
from tpumil.models import embedder
from tpumil.models.embedder import EmbedderConfig


@dataclasses.dataclass
class ExtractorStats:
    patches: int = 0
    seconds: float = 0.0

    @property
    def patches_per_sec(self) -> float:
        return self.patches / self.seconds if self.seconds else 0.0


class FeatureExtractor:
    """Jitted embedder with fixed batch shape + prefetching host pipeline.

    ``mesh``: optional ``jax.sharding.Mesh`` — the patch batch shards over
    EVERY mesh axis (params replicated), so one extraction process drives
    all chips of a pod slice (the reference's only scale-out is
    ``CUDA_VISIBLE_DEVICES`` process placement, compute_feats.py:143-144).
    ``batch_size`` must divide by the mesh's total device count. Per-patch
    features are independent (InstanceNorm has no cross-sample coupling),
    but sharded vs unsharded replicas agree to float tolerance only
    (~1e-6 — XLA partitions reductions differently; pinned in
    tests/test_features.py::test_mesh_sharded_feature_extractor), same
    caveat as the serving path.
    """

    def __init__(self, params: Dict, cfg: EmbedderConfig, batch_size: int = 128,
                 patch_size: int = 224, num_workers: int = 8, mesh=None):
        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.num_workers = num_workers

        # embedder.forward normalizes uint8 batches on device itself
        if mesh is not None:
            from tpumil.parallel.mesh import make_batch_sharded_jit

            self._fwd, put_params, self._n_shard = make_batch_sharded_jit(
                mesh, batch_size, lambda p, x: embedder.forward(p, x, cfg))
            self.params = put_params(params)
        else:
            self._fwd = jax.jit(lambda p, x: embedder.forward(p, x, cfg))
            self._n_shard = 1
        self.stats = ExtractorStats()

    def embed_paths(self, paths: Sequence[str]) -> np.ndarray:
        """Features [N, K] for a list of patch files (order preserved)."""
        if not paths:
            return np.zeros((0, self.cfg.num_feats), np.float32)
        loader = patch_data.PatchBatchLoader(
            paths, self.batch_size, self.patch_size, self.num_workers,
            out_dtype=np.uint8)
        outs: List[np.ndarray] = []
        pending = []  # (device_feats, n_valid) — keep a small pipeline
        t0 = time.perf_counter()
        for batch, n_valid, _ in loader:
            feats, _ = self._fwd(self.params, jnp.asarray(batch))
            pending.append((feats, n_valid))
            if len(pending) > 2:
                f, n = pending.pop(0)
                outs.append(np.asarray(f)[:n])
        for f, n in pending:
            outs.append(np.asarray(f)[:n])
        self.stats.seconds += time.perf_counter() - t0
        self.stats.patches += len(paths)
        return np.concatenate(outs, axis=0)

    def embed_arrays(self, batch: np.ndarray) -> np.ndarray:
        """Features for an arbitrary-length uint8/float batch. In mesh mode
        a batch whose length does not divide by the device count is padded
        with zero rows to the next multiple (and the result sliced back) —
        callers like stream_embed pass variable-size final batches."""
        n = batch.shape[0]
        pad = (-n) % self._n_shard
        if pad:
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
        feats, _ = self._fwd(self.params, jnp.asarray(batch))
        return np.asarray(feats)[:n]


def compute_feats(bag_dirs: Sequence[str], extractor: FeatureExtractor,
                  save_path: str, magnification: str = "single",
                  log: Callable[[str], None] = lambda s: None) -> None:
    """Single-magnification extraction: per bag, embed all patches and write
    ``<save_path>/<class>/<bag>.csv`` (compute_feats.py:58-82)."""
    for i, bag_dir in enumerate(bag_dirs):
        paths = patch_data.list_patches(bag_dir, magnification)
        feats = extractor.embed_paths(paths)
        if feats.shape[0] == 0:
            log(f"No valid patch extracted from: {bag_dir}\n")
            continue
        cls = bag_dir.split(os.path.sep)[-2]
        bag = bag_dir.split(os.path.sep)[-1]
        write_bag_csv(feats, os.path.join(save_path, cls, bag + ".csv"))
        log(f"\r Computed: {i + 1}/{len(bag_dirs)}")
    log("\n")


def compute_tree_feats(bag_dirs: Sequence[str], extractor_low: FeatureExtractor,
                       extractor_high: FeatureExtractor, save_path: str,
                       fusion: str = "cat",
                       log: Callable[[str], None] = lambda s: None) -> None:
    """Multi-magnification extraction (compute_feats.py:84-126): embed the
    low-mag patches, embed every high-mag patch, and combine each high
    feature with its parent low feature:
      * 'cat'    -> concat(high, low)  (1024-d for resnet18)
      * 'fusion' -> high + 0.25 * low
    High patches are batched across the whole bag (the reference embeds them
    one at a time)."""
    if fusion not in ("cat", "fusion"):
        raise NotImplementedError(
            f"{fusion} is not an accepted option for fusion. "
            "This argument accepts 2 options: 'fusion' and 'cat'.")
    for i, bag_dir in enumerate(bag_dirs):
        low_paths = patch_data.list_patches(bag_dir, "low")
        low_feats = extractor_low.embed_paths(low_paths)
        # enumerate high patches grouped by their parent low patch
        high_paths: List[str] = []
        parent_idx: List[int] = []
        for li, low_path in enumerate(low_paths):
            folder = os.path.join(os.path.dirname(low_path),
                                  os.path.splitext(os.path.basename(low_path))[0])
            for ext in ("jpg", "jpeg"):
                import glob as _glob

                for hp in sorted(_glob.glob(os.path.join(folder, f"*.{ext}"))):
                    high_paths.append(hp)
                    parent_idx.append(li)
        if not high_paths:
            log(f"No valid patch extracted from: {bag_dir}\n")
            continue
        high_feats = extractor_high.embed_paths(high_paths)
        low_of_high = low_feats[np.asarray(parent_idx)]
        if fusion == "cat":
            tree_feats = np.concatenate([high_feats, low_of_high], axis=-1)
        else:
            tree_feats = high_feats + 0.25 * low_of_high
        cls = bag_dir.split(os.path.sep)[-2]
        bag = bag_dir.split(os.path.sep)[-1]
        write_bag_csv(tree_feats, os.path.join(save_path, cls, bag + ".csv"))
        log(f"\r Computed: {i + 1}/{len(bag_dirs)}")
    log("\n")
