"""Device-resident bag store.

The reference reloads every bag from disk to the GPU on every optimizer step
(``torch.load(..., map_location='cuda:0')`` per bag, train_tcga.py:62). On
TPU the dataset (e.g. Camelyon16: ~400 bags x O(10^3-10^4) x 512 f32) fits in
HBM, so the store pads bags into one stacked array per bucket, ships each
bucket to device ONCE, and epochs run with zero host->device feature traffic
— per-epoch shuffling is a device-side gather driven by a tiny permutation
array.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.data.bags import Bag, bucket_length, pad_bags


class DeviceBagStore:
    """Bags grouped by padded bucket length, resident on device.

    buckets: dict nmax -> (feats [B,N,K], mask [B,N], labels [B,C]) device
    arrays; ``index[nmax]`` maps bucket rows back to original bag positions.
    """

    def __init__(self, bags: Sequence[Bag], min_bucket: int = 16,
                 device=None, dtype=np.float32, pad_counts: bool = True):
        groups: Dict[int, List[int]] = {}
        for i, bag in enumerate(bags):
            groups.setdefault(bucket_length(bag.num_instances, min_bucket), []).append(i)
        self.num_bags = len(bags)
        self.num_classes = int(np.atleast_1d(bags[0].label).shape[0])
        self.labels = np.stack([np.atleast_1d(b.label) for b in bags]).astype(np.float32)
        self.names = [b.name for b in bags]
        self.buckets: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = {}
        self.index: Dict[int, np.ndarray] = {}
        # real bag count per bucket; rows beyond it are all-masked dummies
        # added so the (bag-count, instance-count) shape pair comes from a
        # small power-of-two family — without this every train/test split
        # compiles fresh XLA programs (bag counts differ per fold).
        self.counts: Dict[int, int] = {}
        for nmax, idxs in sorted(groups.items()):
            feats, mask, labels = pad_bags([bags[i] for i in idxs], nmax, dtype=dtype)
            b = len(idxs)
            if pad_counts:
                b_pad = bucket_length(b, 8)
                if b_pad > b:
                    feats = np.concatenate(
                        [feats, np.zeros((b_pad - b,) + feats.shape[1:], feats.dtype)])
                    mask = np.concatenate(
                        [mask, np.zeros((b_pad - b,) + mask.shape[1:], bool)])
                    labels = np.concatenate(
                        [labels, np.zeros((b_pad - b,) + labels.shape[1:], labels.dtype)])
            put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
            self.buckets[nmax] = (put(feats), put(mask), put(labels))
            self.index[nmax] = np.asarray(idxs)
            self.counts[nmax] = b

    @property
    def bucket_sizes(self) -> List[int]:
        return sorted(self.buckets)

    def subset(self, indices: Sequence[int]) -> "DeviceBagStore":
        """A new store over ``indices`` (original-store bag positions) built
        by DEVICE-SIDE gathers — no host->device feature traffic. This is how
        k-fold schemes carve train/test splits out of one resident dataset:
        the full dataset ships to HBM once, each fold is a gather.

        Bag order in the subset follows ``indices``."""
        indices = list(int(i) for i in indices)
        order_map = {g: i for i, g in enumerate(indices)}
        new = object.__new__(DeviceBagStore)
        new.num_bags = len(indices)
        new.num_classes = self.num_classes
        new.labels = self.labels[np.asarray(indices, int)] if indices else \
            self.labels[:0]
        new.names = [self.names[i] for i in indices]
        new.buckets = {}
        new.index = {}
        new.counts = {}
        for nmax, gidx in self.index.items():
            sel = [row for row, g in enumerate(gidx) if g in order_map]
            if not sel:
                continue
            b_pad = bucket_length(len(sel), 8)
            rows = jnp.asarray(sel + [int(sel[0])] * (b_pad - len(sel)))
            f, m, l = self.buckets[nmax]
            feats = jnp.take(f, rows, axis=0)
            mask = jnp.take(m, rows, axis=0)
            if b_pad > len(sel):  # dummy rows: fully masked
                mask = mask.at[len(sel):].set(False)
            labels = jnp.take(l, rows, axis=0)
            new.buckets[nmax] = (feats, mask, labels)
            new.index[nmax] = np.asarray([order_map[int(gidx[r])] for r in sel])
            new.counts[nmax] = len(sel)
        return new

    def nbytes(self) -> int:
        return sum(int(f.nbytes + m.nbytes + l.nbytes)
                   for f, m, l in self.buckets.values())
