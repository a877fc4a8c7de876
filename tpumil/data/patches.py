"""Patch-folder datasets and a prefetching host loader.

Filesystem contract (README.md:264-285, deepzoom_tiler.py:102-112):
  WSI/<dataset>/single/<class>/<bag>/<col>_<row>.jpeg
  WSI/<dataset>/pyramid/<class>/<bag>/{<col>_<row>.jpeg, <col>_<row>/<...>.jpeg}

The loader decodes JPEGs on a host thread pool into fixed-shape NHWC float32
batches in [0, 1] (torchvision ``to_tensor`` semantics, compute_feats.py:38),
padding the final batch — static shapes keep one compiled embedder program.
The decode pool runs ahead of the accelerator (bounded prefetch) so host
decode overlaps device compute.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def list_bag_dirs(root: str, dataset: str, magnification: str) -> List[str]:
    """Bag directories under the WSI tree (compute_feats.py:236-243)."""
    layout = "pyramid" if magnification in ("tree", "low", "high") else "single"
    return sorted(glob.glob(os.path.join(root, dataset, layout, "*", "*")))


def list_patches(bag_dir: str, magnification: str = "single",
                 exts: Sequence[str] = ("jpg", "jpeg")) -> List[str]:
    """Patch files of one bag (compute_feats.py:64-68): top-level files for
    single/low, one-level-down files for high."""
    pats = []
    for ext in exts:
        if magnification == "high":
            pats.append(os.path.join(bag_dir, "*", f"*.{ext}"))
        else:
            pats.append(os.path.join(bag_dir, f"*.{ext}"))
    out: List[str] = []
    for p in pats:
        out.extend(glob.glob(p))
    return sorted(out)


def parse_position(path: str) -> Tuple[int, int]:
    """``<a>_<b>.<ext>`` -> (a, b), the grid position encoded by the tiler
    (deepzoom_tiler.py:108-109; consumed at attention_map.py:28)."""
    stem = os.path.basename(path).split(".")[0]
    a, b = stem.split("_")[:2]
    return int(a), int(b)


def decode_patch(path: str, patch_size: Optional[int] = None,
                 as_float: bool = True) -> np.ndarray:
    """JPEG/PNG -> float32 HWC in [0, 1] (to_tensor semantics), optionally
    resized (PIL bilinear) to patch_size. ``as_float=False`` keeps uint8 so
    the /255 normalization can run on-device instead (bit-identical: the
    same f32 divide, just on the VPU — and 4x less host work + transfer)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if patch_size is not None and im.size != (patch_size, patch_size):
            # bilinear, matching the native decode path (tileservice.cc) so
            # features are identical with or without the .so built
            im = im.resize((patch_size, patch_size), Image.BILINEAR)
        arr = np.asarray(im, dtype=np.uint8)
    return arr.astype(np.float32) / 255.0 if as_float else arr


def queue_put_or_stop(q: "queue.Queue", stop: "threading.Event", item) -> bool:
    """Enqueue without deadlocking if the consumer already left (a plain
    q.put on a full queue would pin the producer thread and its ~100MB
    batches forever). Shared by every producer/consumer pipeline
    (PatchBatchLoader here, infer/stream_embed)."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            continue
    return False



class PatchBatchLoader:
    """Decode a list of patch files into fixed-shape batches with bounded
    prefetch.

    Yields (batch [B, S, S, 3], n_valid, paths) — the last batch is padded to
    B with zeros; ``n_valid`` marks the real rows.
    """

    def __init__(self, paths: Sequence[str], batch_size: int = 128,
                 patch_size: Optional[int] = None, num_workers: int = 8,
                 prefetch: int = 4, use_native: Optional[bool] = None,
                 out_dtype=np.float32):
        self.paths = list(paths)
        self.batch_size = batch_size
        self.patch_size = patch_size
        # uint8 batches defer the /255 to the device (bit-identical f32
        # divide) — 4x less host conversion work and host->device transfer
        self.out_dtype = np.dtype(out_dtype)
        assert self.out_dtype in (np.float32, np.uint8)
        # Honor the configured fan: this pool blocks on file reads (and PIL
        # releases the GIL for much of the decode), so oversubscribing cores
        # WINS — measured 14.8 vs 11.7 slides/min at 4 vs 1 threads on the
        # 1-core dev host (docs/PERF.md thread policy; same class of pool as
        # tiler.py / stream_embed.py). Only PURE-CPU native fans clamp to
        # cpu_count, and utils/native.decode_batch self-clamps already.
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        if use_native is None:
            # native decode needs a fixed output size and JPEG inputs
            from tpumil.utils import native

            use_native = (native.available() and patch_size is not None
                          and all(p.lower().endswith((".jpg", ".jpeg"))
                                  for p in self.paths))
        self.use_native = bool(use_native)

    def __len__(self) -> int:
        return (len(self.paths) + self.batch_size - 1) // self.batch_size

    def _decode_batch(self, chunk: List[str], pool) -> np.ndarray:
        as_float = self.out_dtype == np.float32
        first = decode_patch(chunk[0], self.patch_size, as_float)
        batch = np.zeros((self.batch_size,) + first.shape, self.out_dtype)
        batch[0] = first
        for i, arr in enumerate(pool.map(
                lambda p: decode_patch(p, self.patch_size, as_float), chunk[1:])):
            batch[i + 1] = arr
        return batch

    def __iter__(self) -> Iterator[Tuple[np.ndarray, int, List[str]]]:
        if not self.paths:
            return
        from concurrent.futures import ThreadPoolExecutor

        chunks = [self.paths[i:i + self.batch_size]
                  for i in range(0, len(self.paths), self.batch_size)]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            return queue_put_or_stop(q, stop, item)

        def producer_native():
            from tpumil.utils import native

            for chunk in chunks:
                if stop.is_set():
                    break
                try:
                    as_float = self.out_dtype == np.float32
                    arr, err = native.decode_batch(chunk, self.patch_size,
                                                   self.num_workers,
                                                   as_float=as_float)
                    # err -4: size mismatch — redecode via PIL so resampling
                    # is identical to the pure-PIL path
                    for j in np.nonzero(err == -4)[0]:
                        arr[j] = decode_patch(chunk[int(j)], self.patch_size,
                                              as_float)
                        err[j] = 0
                    if np.any(err != 0):
                        bad = [p for p, e in zip(chunk, err) if e != 0]
                        raise IOError(f"native decode failed for {bad[:3]}")
                    if arr.shape[0] < self.batch_size:
                        pad = np.zeros((self.batch_size - arr.shape[0],)
                                       + arr.shape[1:], arr.dtype)
                        arr = np.concatenate([arr, pad], axis=0)
                    if not put_or_stop((arr, len(chunk), chunk)):
                        return
                except Exception as e:
                    put_or_stop(e)
                    return
            put_or_stop(None)

        def producer():
            if self.use_native:
                return producer_native()
            with ThreadPoolExecutor(self.num_workers) as pool:
                for chunk in chunks:
                    if stop.is_set():
                        break
                    try:
                        item = (self._decode_batch(chunk, pool), len(chunk), chunk)
                        if not put_or_stop(item):
                            return
                    except Exception as e:  # surface decode errors to consumer
                        put_or_stop(e)
                        return
                put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
