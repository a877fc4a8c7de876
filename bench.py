"""Benchmark driver. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline (BASELINE.json north star): ResNet18-InstanceNorm bf16 patch feature
extraction throughput, patches/sec on one chip, 224x224x3 inputs — the
compute path of compute_feats.py:58-82 recast as fused XLA bf16 convolution.
Input batches are generated on device and T batches are scanned inside one
dispatch so tunnel round-trip latency does not pollute the measurement
(steady-state pipelines hide it the same way). The tunnel adds a measured
~24 ms of fixed overhead per dispatch (docs/PERF.md "Tunnel overhead"), so
the scan must be long to read the true device rate: at scan_len=256 the
residual overhead under-reports throughput by <1%. Batch 128 is the measured
per-chip sweet spot (30-31k p/s vs 28k at 256, 19k at 64 — grid/VMEM
pipelining aligns best at 128).

vs_baseline: reference PyTorch fp16 ResNet18 inference on an A100 at ~3500
patches/sec (representative eager-mode number for the reference's
DataLoader + .cuda() + forward loop, compute_feats.py:70-76).

Set BENCH_MODE=aggregator to measure the secondary benchmark (per-bag DSMIL
aggregator training, bags/sec, vs the reference's ~100 bags/sec per-bag
torch loop). Other modes: BENCH_MODE=multibucket (realistic 4-bucket
C16-like training rate), BENCH_MODE=stream (end-to-end slides -> features,
slides/min; needs ~10 min through the tunnel — raise any outer timeout
accordingly), BENCH_MODE=simclr (full compiled SimCLR train step at batch
256: on-device two-view augmentation, fwd+bwd, NT-Xent, Adam).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import NoReturn

import numpy as np

FEAT_BASELINE_PPS = 3500.0     # A100 PyTorch fp16 resnet18 eager inference
AGG_BASELINE_BPS = 100.0       # reference per-bag torch loop (train_tcga.py:60-73)
SIMCLR_BASELINE_PPS = 1250.0   # reference eager A100 SimCLR step (host-side
                               # DataLoader augs + apex fp16, simclr.py:95-109)

# ---------------------------------------------------------------------------
# Failure containment. A perf harness whose failure looks like a hang cannot
# anchor a round record (round-3 lesson: the TPU tunnel went down and the
# driver capture sat >9 min on an unbounded backend init). Three layers:
#   1. _probe_backend(): before touching JAX in-process, probe the backend in
#      a SUBPROCESS with a hard timeout, retrying with backoff — a dead
#      tunnel becomes a fast, explained failure instead of a hang.
#   2. _arm_watchdog(): a daemon timer that, if the whole bench exceeds
#      BENCH_DEADLINE_S, prints one structured JSON error line (naming the
#      stage that was running) and force-exits.
#   3. main() wraps everything: any exception becomes one structured
#      {"error": ...} JSON line with rc != 0.
# So stdout ALWAYS carries exactly one JSON line: a result or an error.
# ---------------------------------------------------------------------------

_STAGE = ["startup"]


def _stage(name: str) -> None:
    _STAGE[0] = name
    print(f"[bench {time.strftime('%H:%M:%S')}] stage: {name}",
          file=sys.stderr, flush=True)


def _emit_error(kind: str, rc: int, **extra) -> NoReturn:
    out = {"error": kind, "stage": _STAGE[0],
           "mode": os.environ.get("BENCH_MODE", "feats")}
    out.update(extra)
    print(json.dumps(out), flush=True)
    # os._exit: the watchdog fires from a non-main thread, and a dead TPU
    # tunnel can leave non-daemon machinery wedged — skip atexit/GC entirely.
    os._exit(rc)


def _arm_watchdog(deadline_s: float) -> None:
    import threading

    def fire() -> None:
        _emit_error("bench_deadline_exceeded", 3, deadline_s=deadline_s)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()


def _probe_backend(attempts: int = 3, timeout_s: float = 90.0) -> None:
    """Bounded, retried JAX-backend liveness probe (shared helper in
    tpumil/utils/platform.py). On final failure emits ONE structured JSON
    error line and exits rc=2."""
    from tpumil.utils.platform import probe_backend

    def log(msg: str) -> None:
        if msg.startswith("probe failed"):
            print(f"[bench] {msg}", file=sys.stderr, flush=True)
        else:
            _stage(f"backend {msg}")

    ok, detail = probe_backend(attempts, timeout_s, with_matmul=True, log=log)
    if ok:
        print(f"[bench] backend alive: {detail}", file=sys.stderr, flush=True)
    else:
        _emit_error("tpu_unavailable", 2, attempts=attempts, detail=detail)


def _measure_embed_rate(cfg, batch: int, scan_len: int, repeats: int) -> float:
    import jax
    import jax.numpy as jnp

    from tpumil.models import embedder

    params = embedder.init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def gen(key):
        # uint8 inputs + on-device /255: the production pipeline ships
        # decoded patches to HBM as uint8 (features.py/stream_embed.py), so
        # the bench measures the same first-HBM-read traffic (1 byte/elt)
        return jax.random.randint(key, (scan_len, batch, 224, 224, 3),
                                  0, 256, jnp.uint8)

    @jax.jit
    def run(p, X):
        def body(_, x):
            x = x.astype(jnp.float32) / 255.0
            return None, jnp.sum(embedder.forward(p, x, cfg)[0])
        _, sums = jax.lax.scan(body, None, X)
        return jnp.sum(sums)

    X = gen(jax.random.PRNGKey(1))
    _ = float(run(params, X))  # compile + execute once
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(run(params, X))
        dt = time.perf_counter() - t0
        best = max(best, scan_len * batch / dt)
    return best


def bench_feature_extraction(batch: int = 128, scan_len: int = 256,
                             repeats: int = 3) -> dict:
    # both rates ride in one JSON line so the headline (bf16 throughput
    # mode) can't be misread as the shipped default (cli/compute_feats
    # defaults to --precision f32, the parity tier).
    # The measured configs are built by cli/compute_feats' OWN parser +
    # config_from_args on CLI defaults (space_to_depth, norm, backbone),
    # so the headline rate is by construction what a CLI user gets.
    from tpumil.cli.compute_feats import build_parser, config_from_args

    rates = {}
    for flag in ("bf16", "f32"):
        args = build_parser().parse_args(
            ["--precision", flag, "--num_classes", "1"])
        assert args.batch_size == batch, \
            f"CLI default batch_size {args.batch_size} != benched {batch}"
        cfg = config_from_args(args)
        assert cfg.space_to_depth, "CLI default lost the benchmarked stem"
        rates[flag] = _measure_embed_rate(cfg, batch, scan_len, repeats)
    return {
        "metric": "feat_extraction_throughput",
        "value": round(rates["bf16"], 1),
        "unit": "patches/sec/chip (resnet18-instancenorm bf16, 224x224)",
        "vs_baseline": round(rates["bf16"] / FEAT_BASELINE_PPS, 2),
        "f32_default_value": round(rates["f32"], 1),
        "f32_default_vs_baseline": round(rates["f32"] / FEAT_BASELINE_PPS, 2),
        # the A100 figure is a representative estimate for the reference's
        # eager loop (compute_feats.py:70-76), never measured on real A100
        "baseline_is_estimate": True,
    }


def bench_aggregator_train(n_bags: int = 256, n_inst: int = 1024,
                           feats: int = 512, classes: int = 1,
                           repeats: int = 5) -> dict:
    import jax

    from tpumil.data.bags import Bag
    from tpumil.data.device_store import DeviceBagStore
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer

    rng = np.random.default_rng(0)
    bags = [Bag(rng.standard_normal((n_inst, feats)).astype(np.float32),
                np.asarray([float(i % 2)], np.float32), f"b{i}")
            for i in range(n_bags)]
    cfg = DSMILConfig(feats_size=feats, num_classes=classes)
    trainer = BagTrainer(cfg)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    store = DeviceBagStore(bags)  # dataset -> HBM, once

    lrs = [1e-4] * 5  # 5 epochs fused into one dispatch per bucket
    params, opt_state, losses = trainer.train_epochs(params, opt_state, store, lrs, rng)
    _ = float(losses[-1])

    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        params, opt_state, losses = trainer.train_epochs(params, opt_state, store,
                                                         lrs, rng)
        _ = float(losses[-1])  # force full execution
        dt = time.perf_counter() - t0
        best = max(best, len(lrs) * n_bags / dt)
    return {
        "metric": "aggregator_train_throughput",
        "value": round(best, 2),
        "unit": "bags/sec (1024x512 bags, per-bag Adam steps)",
        "vs_baseline": round(best / AGG_BASELINE_BPS, 2),
    }


def bench_aggregator_multibucket(bags_per_bucket: int = 64,
                                 sizes: tuple = (512, 1024, 2048, 4096),
                                 feats: int = 512, classes: int = 1,
                                 epochs: int = 5, repeats: int = 5) -> dict:
    """The REALISTIC aggregator number: a C16-like size spread across four
    buckets. train_epochs stays epoch-major across buckets (exact
    train_epoch semantics — no bucket-major curriculum bias) but defers
    every loss fetch, so all epochs*buckets dispatches pipeline through the
    tunnel with ONE host sync at the end. Compare with BENCH_MODE=aggregator
    (single bucket, whole run fused into one dispatch) for the fusion win."""
    import jax

    from tpumil.data.bags import Bag
    from tpumil.data.device_store import DeviceBagStore
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.train.trainer import BagTrainer

    rng = np.random.default_rng(0)
    bags = []
    for n_inst in sizes:
        for i in range(bags_per_bucket):
            bags.append(Bag(
                rng.standard_normal((n_inst, feats)).astype(np.float32),
                np.asarray([float(i % 2)], np.float32), f"b{n_inst}_{i}"))
    n_bags = len(bags)
    cfg = DSMILConfig(feats_size=feats, num_classes=classes)
    trainer = BagTrainer(cfg)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    store = DeviceBagStore(bags)
    assert len(store.bucket_sizes) == len(sizes), store.bucket_sizes

    lrs = [1e-4] * epochs
    params, opt_state, losses = trainer.train_epochs(params, opt_state,
                                                     store, lrs, rng)
    _ = float(losses[-1])  # compile all bucket programs + execute once
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        params, opt_state, losses = trainer.train_epochs(params, opt_state,
                                                         store, lrs, rng)
        _ = float(losses[-1])
        dt = time.perf_counter() - t0
        best = max(best, epochs * n_bags / dt)
    return {
        "metric": "aggregator_multibucket_train_throughput",
        "value": round(best, 2),
        "unit": (f"bags/sec ({len(sizes)} buckets {list(sizes)}x{feats}, "
                 f"epoch-major pipelined dispatches, per-bag Adam steps)"),
        "vs_baseline": round(best / AGG_BASELINE_BPS, 2),
    }


def bench_simclr(batch: int = 256, repeats: int = 10) -> dict:
    """Full compiled SimCLR training step (the reference's hot loop,
    simclr/simclr.py:95-109): on-device two-view augmentation, bf16
    backbone forward+backward, NT-Xent, Adam — patches/s (= 2 views each).
    Steps are chained with ONE host sync at the end so tunnel dispatch
    latency pipelines away (docs/PERF.md methodology)."""
    import jax
    import jax.numpy as jnp

    from tpumil.models.simclr import SimCLRConfig
    from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

    tr = SimCLRTrainer(SimCLRConfig(compute_dtype=jnp.bfloat16),
                       SimCLRTrainConfig(batch_size=batch, input_size=224))
    p, s = tr.init(jax.random.PRNGKey(0))
    imgs = jax.jit(lambda k: jax.random.uniform(
        k, (batch, 224, 224, 3), jnp.float32))(jax.random.PRNGKey(1))
    lr = jnp.asarray(1e-5)
    key = jax.random.PRNGKey(2)
    p, s, loss = tr._train_step(p, s, key, imgs, lr)  # compile + run once
    assert np.isfinite(float(loss))
    t0 = time.perf_counter()
    for _ in range(repeats):
        key, sub = jax.random.split(key)
        p, s, loss = tr._train_step(p, s, sub, imgs, lr)
    _ = float(loss)  # one deferred sync for the whole chain
    dt = (time.perf_counter() - t0) / repeats
    pps = batch / dt
    return {
        "metric": "simclr_train_throughput",
        "value": round(pps, 1),
        "unit": (f"patches/sec/chip (batch {batch} @ 224^2, two bf16 views, "
                 f"full step incl. on-device augmentation, "
                 f"{dt * 1e3:.1f} ms/step)"),
        "vs_baseline": round(pps / SIMCLR_BASELINE_PPS, 2),
        "baseline_is_estimate": True,
    }


def bench_stream(side: int = 8192, tissue_frac: float = 0.6,
                 batch_size: int = 128, n_slides: int = 3,
                 trials: int = 5) -> dict:
    """End-to-end slides -> features: synthetic pyramidal TIFFs, host tiling
    + background filter + device embedding, measured as ONE pipelined pass
    over ``n_slides`` (slide i+1's tiling overlaps slide i's embedding tail)
    repeated ``trials`` times; the JSON carries the median with IQR.

    vs_baseline compares against the reference's two-stage architecture
    (deepzoom_tiler.py: tile to JPEG folder, then compute_feats.py: re-decode
    and embed) executed by this framework's own tiler + extractor on the same
    host and chip — isolating the win of streaming (no JPEG round-trip);
    reported as the median of per-trial ratios. NOTE: this container's host
    has ONE CPU core; both paths are host-bound here, and real TPU-VM hosts
    (many cores) shift both up substantially.
    """
    import shutil
    import tempfile

    import jax

    from tpumil.data.tiler import TilerConfig, tile_slide
    from tpumil.infer.features import FeatureExtractor
    from tpumil.infer.stream_embed import embed_slides_streaming
    from tpumil.models import embedder
    from tpumil.models.embedder import EmbedderConfig
    from tpumil.utils import native

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        # synthetic slides: white background + textured tissue block, written
        # as tiled JPEG pyramidal TIFFs (the layout of real scanner output)
        # via the native writer; PIL stripped fallback if the .so isn't built
        slide_paths = []
        desc = "Aperio Fake |AppMag = 20|"
        for si in range(n_slides):
            img = np.full((side, side, 3), 255, np.uint8)
            t = int(side * tissue_frac)
            img[:t, :t] = (rng.random((t, t, 3)) * 200 + 20).astype(np.uint8)
            slide_path = os.path.join(tmp, "cls", f"slide{si}.tif")
            os.makedirs(os.path.dirname(slide_path), exist_ok=True)
            if native.can_write_pyramid():
                native.write_tiled_pyramid(slide_path, img, tile=256,
                                           levels=3, quality=75,
                                           description=desc)
            else:
                from PIL import Image

                pages = [Image.fromarray(img)]
                for _ in range(2):
                    p = pages[-1]
                    pages.append(p.resize((p.width // 2, p.height // 2)))
                pages[0].save(slide_path, save_all=True,
                              append_images=pages[1:], description=desc)
                del pages
            del img
            slide_paths.append(slide_path)

        cfg = EmbedderConfig(backbone="resnet18", norm="instance",
                             num_classes=1, space_to_depth=True)
        params = embedder.init_params(jax.random.PRNGKey(0), cfg)
        ex = FeatureExtractor(params, cfg, batch_size=batch_size)
        # compile for the uint8 batches both paths ship
        ex.embed_arrays(np.zeros((batch_size, 224, 224, 3), np.uint8))

        tcfg = TilerConfig(tile_size=224, overlap=0, base_mag=20.0)
        import glob as _glob

        stream_spm, ratios, n_feats = [], [], 0
        for _ in range(trials):
            # streaming path (ours): one pipelined pass over all slides
            t0 = time.perf_counter()
            outs = list(embed_slides_streaming(slide_paths, ex, (0,), tcfg,
                                               batch_size=batch_size))
            stream_s = time.perf_counter() - t0
            n_feats = sum(len(f) for f, _, _ in outs)

            # reference architecture: tile to JPEGs, then re-decode + embed
            t0 = time.perf_counter()
            folder = os.path.join(tmp, "patches")
            shutil.rmtree(folder, ignore_errors=True)
            n2 = 0
            for sp in slide_paths:
                tile_slide(sp, folder, (0,), tcfg)
            jpgs = sorted(_glob.glob(os.path.join(folder, "*", "*", "*.jpeg")))
            n2 = len(ex.embed_paths(jpgs))
            two_stage_s = time.perf_counter() - t0

            assert n_feats > 0 and n2 == n_feats, \
                f"path mismatch: stream {n_feats} vs folder {n2}"
            stream_spm.append(60.0 * n_slides / stream_s)
            ratios.append(two_stage_s / stream_s)

        med = float(np.median(stream_spm))
        q1, q3 = np.percentile(stream_spm, [25, 75])
        return {
            "metric": "e2e_slide_throughput",
            "value": round(med, 2),
            "unit": (f"slides/min median of {trials} trials, IQR "
                     f"[{q1:.2f}, {q3:.2f}] ({n_slides} pipelined 8k^2 "
                     f"synthetic WSIs -> {n_feats} patch feats, streaming, "
                     f"incl. host tiling on 1 CPU core)"),
            "vs_baseline": round(float(np.median(ratios)), 2),
            "ratio_iqr": [round(float(np.percentile(ratios, 25)), 2),
                          round(float(np.percentile(ratios, 75)), 2)],
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    mode = os.environ.get("BENCH_MODE", "feats")
    _arm_watchdog(float(os.environ.get("BENCH_DEADLINE_S", "2400")))
    _probe_backend(
        attempts=int(os.environ.get("BENCH_PROBE_ATTEMPTS", "3")),
        timeout_s=float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "90")))
    try:
        if mode == "aggregator":
            _stage("aggregator: build bags + fused train_epochs")
            result = bench_aggregator_train()
        elif mode == "stream":
            _stage("stream: synth slides + pipelined embed trials")
            result = bench_stream()
        elif mode == "multibucket":
            _stage("multibucket: 4-bucket epoch-major train_epochs")
            result = bench_aggregator_multibucket()
        elif mode == "simclr":
            _stage("simclr: compiled b256 train steps")
            result = bench_simclr()
        else:
            _stage("feats: bf16 + f32 embed scans")
            result = bench_feature_extraction()
    except Exception as e:  # noqa: BLE001 — one JSON line, always
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_error("bench_exception", 1,
                    exception=f"{type(e).__name__}: {e}")
    _stage("done")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
