"""Streaming slide -> features: tile and embed in one pass, no JPEG round
trip.

The reference pipeline materializes every patch as a JPEG on disk
(deepzoom_tiler.py) and re-decodes it in the next stage
(compute_feats.py:25-33) — encode+decode+filesystem for every patch. This
module wires the tiler directly into the embedder (SURVEY.md section 7 step
5): tiles are fetched and background-filtered by a host thread pool, batched
into pinned buffers, and fed to the jitted bf16 embedder while the next
batch is being prepared. Optionally the JPEGs are still written for
folder-layout compatibility.

Output contract matches compute_feats: a per-bag CSV of features (and the
``col_row`` position of every kept tile, enabling heatmaps without re-tiling).
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from tpumil.data.patches import queue_put_or_stop
from tpumil.data.slide import DeepZoom, magnification_plan, open_slide
from tpumil.data.tiler import TilerConfig, edge_energy
from tpumil.infer.features import FeatureExtractor


@dataclasses.dataclass
class StreamStats:
    tiles_total: int = 0
    tiles_kept: int = 0
    errors: int = 0   # tiles dropped after exhausting read retries
    seconds: float = 0.0

    @property
    def slides_per_min(self) -> float:
        return 60.0 / self.seconds if self.seconds else 0.0


def _produce_one_slide(slide, dz, dz_level, cfg: TilerConfig,
                       batch_size: int, stats: StreamStats,
                       put_or_stop, stop: threading.Event,
                       write_patch_dir: Optional[str]) -> bool:
    """Fetch, filter and batch one slide's tiles into the consumer queue.

    Returns False if the consumer requested a stop. Emits
    ``(arr [batch, T, T, 3] uint8, pos [len<=batch])`` items only — slide
    boundary markers are the caller's job (multi-slide pipelining keys on
    them)."""
    cols, rows = dz.level_tiles(dz_level)
    addrs = [(c, r) for r in range(rows) for c in range(cols)]
    stats.tiles_total = len(addrs)

    def fetch(addr):
        """Read only — the background filter runs batched in the
        producer (one native call per chunk instead of per tile: the
        per-call ctypes overhead dominated at 1-tile granularity).
        Retries transient read failures like the folder tiler does
        (tiler.py max_retries); a tile that still fails comes back None
        and is counted in stats.errors."""
        for attempt in range(cfg.max_retries + 1):
            try:
                return addr, dz.get_tile(dz_level, addr)
            except Exception:
                if attempt == cfg.max_retries:
                    return addr, None
        return addr, None

    def filter_chunk(items):
        """[(addr, tile)] -> kept [(addr, tile_resized)]."""
        square = [(a, t) for a, t in items
                  if t is not None and t.shape[:2] == (cfg.tile_size,
                                                       cfg.tile_size)]
        ragged = [(a, t) for a, t in items
                  if t is not None and t.shape[:2] != (cfg.tile_size,
                                                       cfg.tile_size)]
        kept = []
        if square:
            from tpumil.utils import native

            if native.available():
                energies = native.edge_energy_batch(
                    np.stack([t for _, t in square]),
                    num_threads=max(1, min(cfg.workers,
                                           os.cpu_count() or 1)))
            else:
                energies = [edge_energy(t, cfg.tile_size) for _, t in square]
            kept = [(a, t) for (a, t), e in zip(square, energies)
                    if e > cfg.background_threshold]
        for a, t in ragged:  # edge-of-slide tiles: filter then resize
            if edge_energy(t, cfg.tile_size) > cfg.background_threshold:
                from PIL import Image

                kept.append((a, np.asarray(Image.fromarray(t).resize(
                    (cfg.tile_size, cfg.tile_size)))))
        return kept

    batch: List[np.ndarray] = []
    pos: List[Tuple[int, int]] = []

    def emit(kept) -> bool:
        nonlocal batch, pos
        for addr, tile in kept:
            if write_patch_dir is not None:
                from PIL import Image

                os.makedirs(write_patch_dir, exist_ok=True)
                Image.fromarray(tile).save(
                    os.path.join(write_patch_dir,
                                 f"{addr[0]}_{addr[1]}.{cfg.format}"),
                    quality=cfg.quality)
            # ship uint8; the extractor normalizes on-device
            # (bit-identical f32 /255, 4x less host work/transfer)
            batch.append(tile)
            pos.append(addr)
            if len(batch) == batch_size:
                if not put_or_stop((np.stack(batch), pos)):
                    return False
                batch, pos = [], []
        return True

    # double-buffered chunk submission: Executor.map would
    # queue the WHOLE slide upfront, so completed tiles pile up
    # unboundedly whenever embedding is the bottleneck, and an
    # early exit would still read every tile. One chunk stays
    # in flight while the previous one filters/emits, keeping
    # fetch and filter overlapped with bounded (2-chunk) memory.
    # Deliberately NOT clamped to cpu_count: fetch threads block
    # on file I/O and lock waits, so oversubscription wins even
    # on the 1-core container (measured 14.8 vs 11.7 slides/min
    # at 4 vs 1 threads); only pure-CPU native thread fans (the
    # edge filter above) are clamped.
    n_workers = max(1, cfg.workers)
    with ThreadPoolExecutor(n_workers) as pool:
        chunks = [addrs[lo:lo + batch_size]
                  for lo in range(0, len(addrs), batch_size)]
        futs = [pool.submit(fetch, a) for a in chunks[0]] if chunks else []
        for ci in range(len(chunks)):
            nxt = [pool.submit(fetch, a) for a in chunks[ci + 1]] \
                if ci + 1 < len(chunks) and not stop.is_set() else []
            pending = [f.result() for f in futs]
            futs = nxt
            if stop.is_set():
                for f in futs:
                    f.cancel()
                return False
            stats.errors += sum(1 for _, t in pending if t is None)
            if not emit(filter_chunk(pending)):
                for f in futs:
                    f.cancel()
                return False
    if batch:
        pad = np.zeros((batch_size - len(batch),) + batch[0].shape, np.uint8)
        return put_or_stop((np.concatenate([np.stack(batch), pad]), pos))
    return True


def embed_slides_streaming(slide_paths: Sequence[str],
                           extractor: FeatureExtractor,
                           mag_levels: Sequence[int] = (0,),
                           cfg: Optional[TilerConfig] = None,
                           batch_size: int = 64,
                           write_patch_dirs: Optional[Sequence[Optional[str]]] = None):
    """Stream MANY slides through one producer/consumer pipeline; yields
    ``(feats [N, K], positions [N, 2] (col, row), stats)`` per slide, in
    input order.

    Multi-slide pipelining: the producer thread moves on to slide i+1 the
    moment slide i's last batch is enqueued, so the next slide's host
    tiling overlaps the current slide's embedding tail — the chip (>99%
    idle on a 1-core host) never waits for a cold start between slides.
    Single-magnification only (the hot path); for the pyramid layout use
    the folder pipeline.

    Per-slide ``stats.seconds`` spans that slide's production start to its
    embedding finish; under pipelining the spans overlap, so aggregate
    throughput must be computed from wall time, not their sum.
    """
    cfg = cfg or TilerConfig()
    assert len(tuple(mag_levels)) == 1, "streaming path is single-magnification"
    slide_paths = list(slide_paths)
    if write_patch_dirs is None:
        write_patch_dirs = [None] * len(slide_paths)

    q: "queue.Queue" = queue.Queue(maxsize=4)
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        return queue_put_or_stop(q, stop, item)

    all_stats = [StreamStats() for _ in slide_paths]
    start_times = [0.0] * len(slide_paths)

    def producer():
        try:
            for si, slide_path in enumerate(slide_paths):
                start_times[si] = time.perf_counter()
                slide = open_slide(slide_path)
                try:
                    dz = DeepZoom(slide, cfg.tile_size, cfg.overlap)
                    (dz_level, _), = magnification_plan(
                        dz, tuple(mag_levels), cfg.base_mag, cfg.objective)
                    # the fetch pool drains inside _produce_one_slide, so
                    # closing the slide here cannot race read_region
                    if not _produce_one_slide(
                            slide, dz, dz_level, cfg, batch_size,
                            all_stats[si], put_or_stop, stop,
                            write_patch_dirs[si]):
                        return
                finally:
                    slide.close()
                if not put_or_stop(("__end__", si)):
                    return
        except Exception as e:  # surface errors; never strand the consumer
            put_or_stop(e)
        finally:
            put_or_stop(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        si = 0
        feats_parts, positions = [], []
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            if isinstance(item, tuple) and isinstance(item[0], str) \
                    and item[0] == "__end__":
                _, end_si = item
                assert end_si == si, "slide markers out of order"
                stats = all_stats[si]
                stats.tiles_kept = len(positions)
                stats.seconds = time.perf_counter() - start_times[si]
                if positions:
                    out = (np.concatenate(feats_parts),
                           np.asarray(positions, int), stats)
                else:
                    k = extractor.cfg.num_feats
                    out = (np.zeros((0, k), np.float32),
                           np.zeros((0, 2), int), stats)
                feats_parts, positions = [], []
                si += 1
                yield out
                continue
            arr, pos = item
            feats = extractor.embed_arrays(arr)
            feats_parts.append(feats[:len(pos)])
            positions.extend(pos)
    finally:
        stop.set()
        # the producer owns per-slide fetch pools and slide handles; it must
        # drain before we return (use-after-close is segfault territory
        # under openslide)
        t.join(timeout=60.0)


def embed_slide_streaming(slide_path: str, extractor: FeatureExtractor,
                          mag_levels: Sequence[int] = (0,),
                          cfg: Optional[TilerConfig] = None,
                          batch_size: int = 64,
                          write_patch_dir: Optional[str] = None,
                          ) -> Tuple[np.ndarray, np.ndarray, StreamStats]:
    """Tile one slide at the requested magnification and embed the kept
    tiles. Returns (feats [N, K], positions [N, 2] as (col, row), stats).

    One-slide wrapper over :func:`embed_slides_streaming`."""
    (out,) = embed_slides_streaming([slide_path], extractor, mag_levels, cfg,
                                    batch_size, [write_patch_dir])
    return out


def embed_dataset_streaming(wsi_root: str, dataset: str,
                            extractor: FeatureExtractor, out_root: str,
                            cfg: Optional[TilerConfig] = None,
                            slide_format: str = "svs",
                            mag_levels: Sequence[int] = (0,),
                            batch_size: int = 64,
                            shard: Optional[Tuple[int, int]] = None,
                            log: Callable[[str], None] = print) -> Optional[str]:
    """Stream every slide of ``WSI/<dataset>/<class>/*.<fmt>`` into per-bag
    feature CSVs + the master dataset CSV. Returns the master CSV path.

    Each bag also gets a ``<name>.pos.csv`` sidecar with the (col, row)
    grid position of every kept tile — the information the folder pipeline
    encodes in patch filenames — so attention heatmaps can be rendered
    without re-tiling the slide. (The feature CSV itself stays in the
    reference's exact format.)"""
    import glob as _glob

    from tpumil.data.feature_store import build_dataset_csvs, write_bag_csv

    cfg = cfg or TilerConfig()
    path_base = os.path.join(wsi_root, dataset)
    slides = (_glob.glob(os.path.join(path_base, "*", f"*.{slide_format}"))
              + _glob.glob(os.path.join(path_base, "*", "*", f"*.{slide_format}")))
    if not slides:
        raise FileNotFoundError(
            f"no *.{slide_format} slides under {path_base}/<class>/ — check "
            "--wsi_root/--dataset, and --slide_format (default 'svs')")
    slides = sorted(slides)  # deterministic order: shards must agree on it
    if shard is not None:
        i, n = shard
        slides = slides[i::n]
        log(f"shard {i}/{n}: {len(slides)} slides")
    feats_path = os.path.join(out_root, dataset)
    t_start = time.perf_counter()
    # one pipelined pass: slide i+1's host tiling overlaps slide i's
    # embedding tail (embed_slides_streaming), so aggregate throughput is
    # wall-time based — per-slide seconds overlap by design
    stream = embed_slides_streaming(slides, extractor, mag_levels, cfg,
                                    batch_size=batch_size)
    for i, (slide_path, (feats, positions, stats)) in \
            enumerate(zip(slides, stream)):
        rel = os.path.relpath(slide_path, path_base)
        cls = rel.split(os.sep)[0]
        name = os.path.splitext(os.path.basename(slide_path))[0]
        if stats.errors:
            log(f"WARNING {name}: {stats.errors} tiles failed to read "
                f"after {cfg.max_retries} retries and were dropped")
        if feats.shape[0] == 0:
            log(f"No valid patch extracted from: {slide_path}")
            continue
        write_bag_csv(feats, os.path.join(feats_path, cls, name + ".csv"))
        np.savetxt(os.path.join(feats_path, cls, name + ".pos.csv"),
                   positions, fmt="%d", delimiter=",", header="col,row",
                   comments="")
        wall = time.perf_counter() - t_start
        log(f"[{i + 1}/{len(slides)}] {name}: {stats.tiles_kept}/"
            f"{stats.tiles_total} tiles -> feats in {stats.seconds:.1f}s "
            f"(aggregate {60.0 * (i + 1) / wall:.2f} slides/min)")
    if shard is not None:
        log("shard done; assemble the dataset CSVs once all shards finish "
            "(tpumil.data.feature_store.build_dataset_csvs / compute_feats "
            "--assemble_only)")
        return None
    return build_dataset_csvs(feats_path, dataset)
