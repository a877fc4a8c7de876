"""Serving-path throughput: what the micro-batched server sustains on chip.

The raw embed scan (bench.py) hides per-dispatch tunnel latency by scanning
256 batches inside one XLA call; a server cannot — each packed batch is its
own dispatch. This harness measures the service-level rate (direct
InferenceService.embed from concurrent client threads) and the full-HTTP
rate, so the pipelining in the batcher is judged against the raw-scan
ceiling rather than assumed.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serve_bench.py
    JAX_PLATFORMS=cpu ... (CPU smoke)
"""

from __future__ import annotations

import io
import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")

import numpy as np

BATCH = 128
PATCH = 224
CLIENT_ROWS = 128        # one client request = one device batch worth
DURATION_S = 12.0
N_CLIENTS = 4


def build_service(precision: str = "bf16"):
    import jax

    from tpumil.infer.service import InferenceService
    from tpumil.models import embedder
    from tpumil.models.embedder import EmbedderConfig

    dtype, tier = embedder.precision_from_flag(precision)
    cfg = EmbedderConfig(backbone="resnet18", norm="instance", num_classes=1,
                         space_to_depth=True, compute_dtype=dtype,
                         precision=tier)
    params = embedder.init_params(jax.random.PRNGKey(0), cfg)
    return InferenceService(params, cfg, batch_size=BATCH, patch_size=PATCH,
                            max_wait_ms=2.0)


def drive(submit, n_clients: int, duration_s: float) -> float:
    """Concurrent closed-loop clients; returns sustained patches/s."""
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (CLIENT_ROWS, PATCH, PATCH, 3), np.uint8)
    stop = time.monotonic() + duration_s
    done = [0] * n_clients

    def client(i):
        while time.monotonic() < stop:
            submit(imgs)
            done[i] += CLIENT_ROWS

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return sum(done) / (time.monotonic() - t0)


def main():
    svc = build_service()
    # warm the device path
    svc.embed(np.zeros((BATCH, PATCH, PATCH, 3), np.uint8))

    service_rate = drive(svc.embed, N_CLIENTS, DURATION_S)
    print(json.dumps({"level": "service", "patches_per_s":
                      round(service_rate, 1),
                      "stats": svc.stats()}), flush=True)

    from tpumil.cli.serve import make_server

    server = make_server(svc, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}/v1/embed"

    def http_submit(imgs):
        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(url, data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=300) as r:
            r.read()

    http_rate = drive(http_submit, N_CLIENTS, DURATION_S)
    print(json.dumps({"level": "http", "patches_per_s": round(http_rate, 1),
                      "stats": svc.stats()}), flush=True)
    server.shutdown()
    server.server_close()
    svc.close()


if __name__ == "__main__":
    main()
