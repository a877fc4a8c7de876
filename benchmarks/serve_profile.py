"""Where does the HTTP serving front's 3.5x cost go, host-side? (round-5)

docs/PERF.md "Serving path" measured direct `.embed` at 191.6 patches/s vs
54.5 through HTTP on the tunnel. The tunnel's wire rate bounds the absolute
numbers, but the HTTP front's HOST cost (serialization copies, http.server
overhead, GIL) survives on real hardware — so measure it in isolation: a
STUB service (embed returns a preallocated result instantly, no device)
behind the real handler stack, driven by closed-loop loopback clients.

Stages measured (batch 128 x 224^2x3 uint8 = 19.3 MB up, 256 KB down):
  1. npy decode (np.load on the body) / encode (np.save) in isolation
  2. zero-copy decode (header parse + np.frombuffer) / encode
     (header + memoryview) in isolation
  3. end-to-end loopback HTTP with each wire implementation

    PYTHONPATH=/root/repo python benchmarks/serve_profile.py
"""

from __future__ import annotations

import io
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np

from tpumil.cli import serve as serve_mod


class StubService:
    """InferenceService stand-in: instant embed, fixed feature width."""

    def __init__(self, num_feats=512):
        self.num_feats = num_feats

    def embed(self, images, timeout=None):
        return np.zeros((images.shape[0], self.num_feats), np.float32)

    def health(self):
        return {"ok": True}

    def stats(self):
        return {}

    def close(self):
        pass


def bench_fn(fn, *args, reps=30):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def run_http(server_port, body, n_req=24, clients=4, path="/v1/embed"):
    import http.client

    done = []
    lock = threading.Lock()

    def worker():
        conn = http.client.HTTPConnection("127.0.0.1", server_port)
        while True:
            with lock:
                if len(done) >= n_req:
                    break
                done.append(None)
            conn.request("POST", path, body=body,
                         headers={"Content-Type": "application/x-npy"})
            r = conn.getresponse()
            r.read()
            assert r.status == 200, r.status
        conn.close()

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(clients)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    dt = time.perf_counter() - t0
    return n_req / dt


def main():
    imgs = np.random.default_rng(0).integers(
        0, 256, (128, 224, 224, 3), dtype=np.uint8)
    feats = np.zeros((128, 512), np.float32)
    body = serve_mod._dump_npy(imgs)
    mb = len(body) / 2**20

    print(f"payload: {mb:.1f} MB up, "
          f"{feats.nbytes / 2**10:.0f} KB down", flush=True)

    t = bench_fn(serve_mod._load_npy, body)
    print(f"npy decode (np.load copy):        {t * 1e3:7.2f} ms "
          f"({mb / t:7.0f} MB/s)", flush=True)
    t = bench_fn(serve_mod._load_npy_zerocopy, body)
    print(f"npy decode (frombuffer, 0-copy):  {t * 1e3:7.2f} ms "
          f"({mb / t:7.0f} MB/s)", flush=True)
    t = bench_fn(serve_mod._dump_npy, feats)
    print(f"npy encode (np.save):             {t * 1e3:7.2f} ms", flush=True)
    t = bench_fn(lambda a: serve_mod._npy_chunks(a), feats)
    print(f"npy encode (header+memoryview):   {t * 1e3:7.2f} ms", flush=True)

    for label, zerocopy in (("np.load/np.save wire", False),
                            ("zero-copy wire", True)):
        serve_mod.ZERO_COPY_WIRE = zerocopy
        server = serve_mod.make_server(StubService(), port=0)
        port = server.server_address[1]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        try:
            run_http(port, body, n_req=8)  # warmup
            rps = run_http(port, body, n_req=24)
            print(f"loopback HTTP e2e ({label}): {rps:6.2f} req/s  "
                  f"({rps * 128:7.0f} patches/s, {rps * mb:6.0f} MB/s)",
                  flush=True)
        finally:
            server.shutdown()
            server.server_close()


if __name__ == "__main__":
    main()
