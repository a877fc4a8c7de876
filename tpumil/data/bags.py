"""Padded/bucketed bag batching.

The reference feeds each bag as one unpadded tensor per optimizer step
(train_tcga.py:60-73). Under XLA all shapes must be static, so bags are
padded to bucket lengths (powers of two by default) and grouped so each
compiled program shape is reused across thousands of steps. The instance
dimension is additionally rounded to a multiple of 8 to keep VPU/MXU tiles
aligned (pallas_guide: float32 min tile is (8, 128)).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Bag:
    """One bag: instance features [N, K] and a multi-hot label [C]."""
    feats: np.ndarray
    label: np.ndarray
    name: str = ""

    @property
    def num_instances(self) -> int:
        return int(self.feats.shape[0])


def bucket_length(n: int, min_bucket: int = 16) -> int:
    """Smallest power-of-two >= n (>= min_bucket)."""
    b = min_bucket
    while b < n:
        b *= 2
    return b


def pad_bags(bags: Sequence[Bag], nmax: Optional[int] = None,
             dtype=np.float32) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stack bags into (feats [B, Nmax, K], mask [B, Nmax], labels [B, C])."""
    if nmax is None:
        nmax = bucket_length(max(b.num_instances for b in bags))
    k = bags[0].feats.shape[1]
    c = np.atleast_1d(bags[0].label).shape[0]
    feats = np.zeros((len(bags), nmax, k), dtype=dtype)
    mask = np.zeros((len(bags), nmax), dtype=bool)
    labels = np.zeros((len(bags), c), dtype=np.float32)
    for i, b in enumerate(bags):
        n = b.num_instances
        if n > nmax:
            raise ValueError(f"bag {b.name!r} has {n} instances > nmax={nmax}")
        feats[i, :n] = b.feats
        mask[i, :n] = True
        labels[i] = np.atleast_1d(b.label)
    return feats, mask, labels


def bucketed_chunks(bags: Sequence[Bag], order: Sequence[int],
                    chunk_size: int = 32, min_bucket: int = 16,
                    ) -> Iterator[Tuple[List[int], int]]:
    """Group a (shuffled) visitation ``order`` into chunks whose members share
    one padded length, preserving order within a bucket.

    Yields ``(indices, nmax)`` pairs; each pair becomes one compiled
    ``lax.scan`` invocation in the per-bag trainer. Interleaving across
    buckets follows the order of first appearance, so the visitation sequence
    stays close to the fully shuffled per-bag order of the reference
    (train_tcga.py:57) while keeping compiled shapes to O(log N) variants.
    """
    pending: dict[int, List[int]] = {}
    emitted: List[Tuple[List[int], int]] = []
    for idx in order:
        b = bucket_length(bags[idx].num_instances, min_bucket)
        pending.setdefault(b, []).append(idx)
        if len(pending[b]) == chunk_size:
            emitted.append((pending.pop(b), b))
    for b, idxs in pending.items():
        emitted.append((idxs, b))
    yield from emitted


def shuffle_rows(feats: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random row shuffle of a bag's instances, as the reference applies when
    caching bags (train_tcga.py:25)."""
    perm = rng.permutation(feats.shape[0])
    return feats[perm]
