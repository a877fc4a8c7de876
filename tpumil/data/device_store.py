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
                 device=None, dtype=np.float32):
        groups: Dict[int, List[int]] = {}
        for i, bag in enumerate(bags):
            groups.setdefault(bucket_length(bag.num_instances, min_bucket), []).append(i)
        self.num_bags = len(bags)
        self.num_classes = int(np.atleast_1d(bags[0].label).shape[0])
        self.labels = np.stack([np.atleast_1d(b.label) for b in bags]).astype(np.float32)
        self.names = [b.name for b in bags]
        self.buckets: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = {}
        self.index: Dict[int, np.ndarray] = {}
        for nmax, idxs in sorted(groups.items()):
            feats, mask, labels = pad_bags([bags[i] for i in idxs], nmax, dtype=dtype)
            put = (lambda x: jax.device_put(x, device)) if device is not None else jax.device_put
            self.buckets[nmax] = (put(feats), put(mask), put(labels))
            self.index[nmax] = np.asarray(idxs)

    @property
    def bucket_sizes(self) -> List[int]:
        return sorted(self.buckets)

    def nbytes(self) -> int:
        return sum(int(f.nbytes + m.nbytes + l.nbytes)
                   for f, m, l in self.buckets.values())
