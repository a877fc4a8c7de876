"""Serving layer: micro-batched embed/predict + the HTTP front.

The load-bearing claim (infer/service.py docstring): a row's features are
BITWISE identical whichever concurrent requests it shares a device batch
with, because every supported embedder is batch-dim independent. These
tests pin that, the batcher's packing/flush behavior, aggregation parity
against the direct model forward, and the stdlib HTTP wire format.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from tpumil.infer.service import InferenceService, MicroBatcher
from tpumil.models import dsmil, embedder
from tpumil.models.dsmil import DSMILConfig
from tpumil.models.embedder import EmbedderConfig

PATCH = 32        # resnet18 accepts any spatial size; 32^2 keeps CPU fast
BATCH = 8
FEATS = 512
CLASSES = 2


@pytest.fixture(scope="module")
def emb_setup():
    cfg = EmbedderConfig(backbone="resnet18", norm="instance",
                         num_classes=CLASSES, compute_dtype=np.float32)
    params = embedder.init_params(jax.random.PRNGKey(0), cfg)
    # non-zero head so ins_logits actually vary
    k = jax.random.PRNGKey(1)
    params = embedder.set_head(
        params,
        np.asarray(jax.random.normal(k, (CLASSES, FEATS))) * 0.05,
        np.zeros((CLASSES,), np.float32))
    return params, cfg


@pytest.fixture(scope="module")
def agg_params():
    return dsmil.init_params(jax.random.PRNGKey(2),
                             DSMILConfig(feats_size=FEATS, num_classes=CLASSES))


# jitted like the service's aggregate programs (eager dsmil.forward differs
# from the jitted one by 1 ulp of f32 — fusion changes the op order)
_agg_jit = jax.jit(lambda p, f, m: dsmil.forward(p, f, m))
_agg_logits_jit = jax.jit(lambda p, f, c, m: dsmil.forward(p, f, m,
                                                           ins_logits=c))


@pytest.fixture(scope="module")
def service(emb_setup, agg_params):
    params, cfg = emb_setup
    svc = InferenceService(params, cfg, agg_params=agg_params,
                           batch_size=BATCH, patch_size=PATCH,
                           max_wait_ms=5.0)
    yield svc
    svc.close()


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, PATCH, PATCH, 3), np.uint8)


@pytest.fixture(scope="module")
def direct_fwd(emb_setup):
    """Oracle: the SAME fixed-[BATCH] jitted program the service runs, fed
    request-by-request (each request padded alone at offset 0). Comparing
    the service against this pins both the scatter plumbing AND the
    packing-independence claim: rows must come out bitwise identical no
    matter which concurrent requests they shared a device batch with."""
    import jax.numpy as jnp

    params, cfg = emb_setup
    fwd = jax.jit(lambda p, x: embedder.forward(p, x, cfg))

    def run(images):
        feats_out, logits_out = [], []
        for s in range(0, images.shape[0], BATCH):
            chunk = images[s:s + BATCH]
            buf = np.zeros((BATCH, PATCH, PATCH, 3), np.uint8)
            buf[:len(chunk)] = chunk
            f, c = fwd(params, jnp.asarray(buf))
            feats_out.append(np.asarray(f)[:len(chunk)])
            logits_out.append(np.asarray(c, np.float32)[:len(chunk)])
        if not feats_out:
            return (np.zeros((0, FEATS), np.float32),
                    np.zeros((0, CLASSES), np.float32))
        return np.concatenate(feats_out), np.concatenate(logits_out)

    return run


def test_embed_matches_direct_bitwise(service, direct_fwd):
    """A padded partial batch (n < batch_size) returns exactly the direct
    forward's rows — pad rows never leak."""
    imgs = _images(3)
    got = service.embed(imgs)
    want, _ = direct_fwd(imgs)
    np.testing.assert_array_equal(got, want)


def test_embed_oversize_request_spans_batches(service, direct_fwd):
    """N > batch_size splits into chunks across device batches, preserving
    row order and exact values."""
    imgs = _images(BATCH * 2 + 3, seed=1)
    got = service.embed(imgs)
    want, _ = direct_fwd(imgs)
    np.testing.assert_array_equal(got, want)


def test_concurrent_requests_pack_and_stay_exact(service, direct_fwd):
    """Concurrent clients share device batches; each gets bitwise the
    features of its own rows regardless of who it was packed with."""
    sizes = [3, 5, 2, BATCH, 13, 1]
    imgs = [_images(n, seed=10 + i) for i, n in enumerate(sizes)]
    results = [None] * len(sizes)
    errors = []

    def worker(i):
        try:
            results[i] = service.embed(imgs[i])
        except BaseException as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(sizes))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    for i in range(len(sizes)):
        want, _ = direct_fwd(imgs[i])
        np.testing.assert_array_equal(results[i], want)


def test_packing_window_merges_small_requests(emb_setup, agg_params):
    """With a generous flush window, several small requests ride ONE device
    dispatch (the serving win: amortized dispatch overhead)."""
    params, cfg = emb_setup
    svc = InferenceService(params, cfg, agg_params=None,
                           batch_size=BATCH, patch_size=PATCH,
                           max_wait_ms=500.0)
    try:
        reqs = [svc._batcher.submit(_images(2, seed=20 + i))
                for i in range(3)]          # 6 rows < BATCH, one window
        for r in reqs:
            r.result(timeout=120)
        assert svc._batcher.stats.batches == 1
        assert svc._batcher.stats.batch_rows == 6
    finally:
        svc.close()


def test_empty_request(service):
    assert service.embed(_images(0)).shape == (0, FEATS)


def test_submit_validation(service):
    with pytest.raises(ValueError):
        service.embed(np.zeros((2, PATCH, PATCH, 3), np.float32))  # dtype
    with pytest.raises(ValueError):
        service.embed(np.zeros((2, 16, 16, 3), np.uint8))          # shape


def test_submit_after_close_raises():
    b = MicroBatcher(lambda batch: np.zeros((batch.shape[0], 4), np.float32),
                     batch_size=4, patch_size=8, out_width=4)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((1, 8, 8, 3), np.uint8))


def test_batcher_error_containment():
    """A failing device call fails ONLY the affected requests; the worker
    keeps serving later ones."""
    calls = []

    def fwd(batch):
        calls.append(len(batch))
        if len(calls) == 1:
            raise RuntimeError("injected device failure")
        return np.ones((batch.shape[0], 4), np.float32)

    b = MicroBatcher(fwd, batch_size=4, patch_size=8, out_width=4,
                     max_wait_ms=2.0)
    try:
        req1 = b.submit(np.zeros((2, 8, 8, 3), np.uint8))
        with pytest.raises(RuntimeError, match="injected"):
            req1.result(timeout=30)
        req2 = b.submit(np.zeros((3, 8, 8, 3), np.uint8))
        out = req2.result(timeout=30)
        np.testing.assert_array_equal(out, np.ones((3, 4), np.float32))
        assert b.stats.errors == 1
    finally:
        b.close()


def test_predict_matches_direct_forward(service, emb_setup, agg_params):
    """predict() on features == the direct padded masked model forward."""
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((11, FEATS)).astype(np.float32)
    result = service.predict(feats)

    from tpumil.data.bags import bucket_length

    nmax = bucket_length(11)
    fp = np.zeros((nmax, FEATS), np.float32)
    fp[:11] = feats
    mask = np.arange(nmax) < 11
    c, bag_logits, attn, _ = _agg_jit(agg_params, fp, mask)
    np.testing.assert_array_equal(
        result["scores"], np.asarray(jax.nn.sigmoid(bag_logits)).reshape(-1))
    np.testing.assert_array_equal(result["attention"], np.asarray(attn)[:11])
    np.testing.assert_array_equal(result["ins_logits"], np.asarray(c)[:11])
    assert result["detected"] == [
        int(i) for i in np.nonzero(
            np.asarray(result["scores"]) >= 0.5)[0]]


def test_predict_patches_uses_embedder_instance_logits(service, direct_fwd,
                                                       agg_params):
    """End-to-end patches->prediction matches the inference-script
    composition: embedder features AND embedder-head instance logits feed
    the aggregator (BagInference.run_bag / attention_map.py:74-85)."""
    imgs = _images(6, seed=4)
    result = service.predict_patches(imgs)

    feats, logits = direct_fwd(imgs)
    from tpumil.data.bags import bucket_length

    nmax = bucket_length(6)
    fp = np.zeros((nmax, FEATS), np.float32)
    lp = np.zeros((nmax, CLASSES), np.float32)
    fp[:6], lp[:6] = feats, logits
    mask = np.arange(nmax) < 6
    _, bag_logits, _, _ = _agg_logits_jit(agg_params, fp, lp, mask)
    np.testing.assert_array_equal(
        result["scores"], np.asarray(jax.nn.sigmoid(bag_logits)).reshape(-1))


def test_predict_average_mode(emb_setup, agg_params, direct_fwd):
    """--average: mean of bag sigmoid and max-instance-logit sigmoid
    (testing flow, attention_map.py:88)."""
    params, cfg = emb_setup
    svc = InferenceService(params, cfg, agg_params=agg_params,
                           batch_size=BATCH, patch_size=PATCH, average=True)
    try:
        imgs = _images(5, seed=5)
        result = svc.predict_patches(imgs)
        feats, logits = direct_fwd(imgs)

        from tpumil.data.bags import bucket_length

        nmax = bucket_length(5)
        fp = np.zeros((nmax, FEATS), np.float32)
        lp = np.zeros((nmax, CLASSES), np.float32)
        fp[:5], lp[:5] = feats, logits
        mask = np.arange(nmax) < 5
        _, bag_logits, _, _ = _agg_logits_jit(agg_params, fp, lp, mask)
        bag_sig = np.asarray(jax.nn.sigmoid(bag_logits)).reshape(-1)
        ins_sig = 1.0 / (1.0 + np.exp(-np.max(logits, axis=0)))
        np.testing.assert_allclose(result["scores"], (bag_sig + ins_sig) / 2,
                                   rtol=0, atol=1e-7)
    finally:
        svc.close()


def test_heatmap_matches_manual_composition(service):
    """service.heatmap == predict_patches + render_color_map with the fixed
    serving palette."""
    from tpumil.infer.heatmap import render_color_map
    from tpumil.infer.service import _DEFAULT_PALETTE

    imgs = _images(6, seed=40)
    positions = np.asarray([[0, 0], [0, 1], [1, 0], [1, 1], [2, 0], [2, 1]])
    image01, result = service.heatmap(imgs, positions)
    want_result = service.predict_patches(imgs)
    np.testing.assert_array_equal(result["scores"], want_result["scores"])
    want_img = render_color_map(
        want_result["attention"], positions, want_result["detected"],
        [_DEFAULT_PALETTE[c] for c in range(CLASSES)])
    np.testing.assert_array_equal(image01, want_img)
    assert image01.shape == (3 * 32, 2 * 32, 3)


def test_heatmap_position_validation(service):
    imgs = _images(3, seed=41)
    with pytest.raises(ValueError, match="positions"):
        service.heatmap(imgs, np.asarray([[0, 0], [0, 1]]))  # wrong N
    with pytest.raises(ValueError):
        service.heatmap(imgs, np.asarray([[0, 0], [0, 1], [-1, 0]]))


def test_mesh_sharded_service(emb_setup, direct_fwd):
    """A service sharding its embed batch over the 8-device mesh: (a) row
    features are BITWISE independent of request packing within the sharded
    program, and (b) they agree with the unsharded program to float
    tolerance (XLA partitions reductions differently — exact equality
    across deployment shapes is NOT guaranteed, see the service docstring)."""
    from tpumil.parallel.mesh import make_mesh

    params, cfg = emb_setup
    mesh = make_mesh(8, inst_parallel=1)  # (data=8, inst=1)
    svc = InferenceService(params, cfg, agg_params=None,
                           batch_size=BATCH, patch_size=PATCH,
                           max_wait_ms=5.0, mesh=mesh)
    try:
        imgs = _images(BATCH + 3, seed=30)
        got = svc.embed(imgs)
        # (a) same rows split across two requests -> packed differently
        r1 = svc._batcher.submit(imgs[:5])
        r2 = svc._batcher.submit(imgs[5:])
        repacked = np.concatenate([r1.result(120)[:, :FEATS],
                                   r2.result(120)[:, :FEATS]])
        np.testing.assert_array_equal(repacked, got)
        # (b) float-level parity vs the unsharded program
        want, _ = direct_fwd(imgs)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        svc.close()


def test_mesh_batch_divisibility_validated(emb_setup):
    from tpumil.parallel.mesh import make_mesh

    params, cfg = emb_setup
    mesh = make_mesh(8, inst_parallel=1)
    with pytest.raises(ValueError, match="divide"):
        InferenceService(params, cfg, batch_size=BATCH + 1,
                         patch_size=PATCH, mesh=mesh)


# ---------------------------------------------------------------------------
# HTTP front
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def http_server(service):
    from tpumil.cli.serve import make_server

    server = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}"
    server.shutdown()
    server.server_close()


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _post(url, body, ctype="application/x-npy"):
    req = urllib.request.Request(url, data=body,
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_http_healthz_and_stats(http_server):
    with urllib.request.urlopen(http_server + "/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["batch_size"] == BATCH
    with urllib.request.urlopen(http_server + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert set(stats) >= {"requests", "patches", "batches", "errors"}


def test_http_embed_roundtrip(http_server, direct_fwd):
    imgs = _images(4, seed=6)
    status, ctype, body = _post(http_server + "/v1/embed", _npy_bytes(imgs))
    assert status == 200 and ctype == "application/x-npy"
    feats = np.load(io.BytesIO(body))
    want, _ = direct_fwd(imgs)
    np.testing.assert_array_equal(feats, want)


def test_http_predict_patches_json(http_server):
    imgs = _images(5, seed=7)
    status, ctype, body = _post(
        http_server + "/v1/predict_patches?attention=1", _npy_bytes(imgs))
    assert status == 200 and ctype == "application/json"
    out = json.loads(body)
    assert len(out["scores"]) == CLASSES
    assert out["num_instances"] == 5
    assert np.asarray(out["attention"]).shape == (5, CLASSES)
    assert all(0.0 <= s <= 1.0 for s in out["scores"])


def test_http_predict_features_json(http_server):
    feats = np.random.default_rng(8).standard_normal((7, FEATS)) \
        .astype(np.float32)
    status, _, body = _post(http_server + "/v1/predict", _npy_bytes(feats))
    assert status == 200
    out = json.loads(body)
    assert len(out["scores"]) == CLASSES and "attention" not in out


def test_http_heatmap_png(http_server):
    imgs = _images(4, seed=42)
    positions = np.asarray([[0, 0], [0, 1], [1, 0], [1, 1]])
    buf = io.BytesIO()
    np.savez(buf, images=imgs, positions=positions)
    req = urllib.request.Request(http_server + "/v1/heatmap",
                                 data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/png"
        scores = json.loads(resp.headers["X-Tpumil-Scores"])
        detected = json.loads(resp.headers["X-Tpumil-Detected"])
        body = resp.read()
    from PIL import Image

    img = Image.open(io.BytesIO(body))
    assert img.size == (2 * 32, 2 * 32)  # PIL size is (W, H)
    assert len(scores) == CLASSES and isinstance(detected, list)
    # npz missing keys -> 400
    buf = io.BytesIO()
    np.savez(buf, images=imgs)
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(http_server + "/v1/heatmap", buf.getvalue())
    assert exc.value.code == 400


def test_serving_client_roundtrips(http_server, direct_fwd):
    """The stdlib ServingClient speaks the server's wire format exactly."""
    from tpumil.infer.client import ServingClient

    c = ServingClient(http_server, timeout=120)
    assert c.health()["status"] == "ok"
    imgs = _images(4, seed=50)
    np.testing.assert_array_equal(c.embed(imgs), direct_fwd(imgs)[0])
    out = c.predict_patches(imgs, attention=True)
    assert len(out["scores"]) == CLASSES
    assert np.asarray(out["attention"]).shape == (4, CLASSES)
    hm = c.heatmap(imgs, np.asarray([[0, 0], [0, 1], [1, 0], [1, 1]]))
    assert hm["png"][:8] == b"\x89PNG\r\n\x1a\n"
    assert len(hm["scores"]) == CLASSES
    assert c.stats()["errors"] == 0


def test_http_errors(http_server):
    # malformed npy -> 400 with a JSON error
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(http_server + "/v1/embed", b"not an npy file")
    assert exc.value.code == 400
    assert "error" in json.loads(exc.value.read())
    # wrong feature width -> 400
    bad = np.zeros((3, FEATS + 1), np.float32)
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(http_server + "/v1/predict", _npy_bytes(bad))
    assert exc.value.code == 400
    # unknown route -> 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(http_server + "/v1/nope", _npy_bytes(bad))
    assert exc.value.code == 404


# ---------------------------------------------------------------------------
# Zero-copy .npy wire functions (cli/serve.py): the default request decode is
# an np.frombuffer VIEW of the body and the response is header+memoryview
# chunks; anything unusual must fall back to np.load with identical results.
# ---------------------------------------------------------------------------


def _npy_v1_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def test_zerocopy_decode_is_a_view():
    from tpumil.cli.serve import _load_npy_zerocopy

    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    body = _npy_v1_bytes(arr)
    out = _load_npy_zerocopy(body)
    np.testing.assert_array_equal(out, arr)
    # genuinely zero-copy: the result views the request body's buffer
    assert out.base is not None and not out.flags.writeable


def test_zerocopy_fortran_falls_back_to_np_load():
    from tpumil.cli.serve import _load_npy_zerocopy

    arr = np.asfortranarray(np.arange(12, dtype=np.float64).reshape(3, 4))
    body = _npy_v1_bytes(arr)
    out = _load_npy_zerocopy(body)
    np.testing.assert_array_equal(out, arr)


def test_zerocopy_npy_v2_header_falls_back():
    from tpumil.cli.serve import _load_npy_zerocopy

    arr = np.arange(6, dtype=np.int32)
    buf = io.BytesIO()
    np.lib.format.write_array(buf, arr, version=(2, 0))
    out = _load_npy_zerocopy(buf.getvalue())
    np.testing.assert_array_equal(out, arr)


def test_zerocopy_corrupt_body_raises_valueerror():
    from tpumil.cli.serve import _load_npy_zerocopy

    with pytest.raises(ValueError):
        _load_npy_zerocopy(b"definitely not an npy body")


def test_npy_chunks_bytes_identical_to_np_save():
    from tpumil.cli.serve import _dump_npy, _npy_chunks

    for arr in (np.arange(10, dtype=np.float32),
                np.ones((4, 5), np.uint8)):
        chunks = _npy_chunks(arr)
        assert b"".join(bytes(c) for c in chunks) == _dump_npy(arr)
    # fortran input: _npy_chunks re-encodes C-order (np.save would keep
    # fortran_order=True) — different bytes, same decoded array
    f = np.asfortranarray(np.arange(12.0).reshape(3, 4))
    wire = b"".join(bytes(c) for c in _npy_chunks(f))
    np.testing.assert_array_equal(np.load(io.BytesIO(wire)), f)


def test_build_service_uses_shared_data_parallel_helper(monkeypatch):
    """serve's --data_parallel flows through parallel.mesh.data_parallel_mesh
    (the one handler shared by every feats/inference CLI): N -> an N-device
    1-wide-inst mesh handed to InferenceService, 0 -> no mesh, negative ->
    the helper's loud ValueError (not a silent devices[:n] slice)."""
    import argparse

    import tpumil.infer.service as service_mod
    from tpumil.cli.serve import build_service

    captured = {}

    class FakeService:
        def __init__(self, *a, **kw):
            captured["mesh"] = kw.get("mesh")

    monkeypatch.setattr(service_mod, "InferenceService", FakeService)
    monkeypatch.setattr(
        "tpumil.models.embedder.load_simclr_checkpoint",
        lambda path, cfg: {"stub": np.zeros(1)})

    def args(dp):
        return argparse.Namespace(
            embedder_weights="unused.pth", aggregator_weights=None,
            num_classes=2, backbone="resnet18", norm="instance",
            precision="f32", space_to_depth=False, batch_size=8,
            patch_size=32, max_wait_ms=1.0, thres=None, average=False,
            data_parallel=dp)

    build_service(args(0))
    assert captured["mesh"] is None
    build_service(args(8))
    assert captured["mesh"].devices.shape == (8, 1)
    assert captured["mesh"].axis_names == ("data", "inst")
    with pytest.raises(ValueError, match=">= 0"):
        build_service(args(-2))


def test_predict_empty_bag_raises_cleanly(service):
    with pytest.raises(ValueError, match="empty bag"):
        service.predict(np.zeros((0, FEATS), np.float32))


def test_heatmap_rejects_empty_and_giant_grids(service):
    with pytest.raises(ValueError, match="empty bag"):
        service.heatmap(np.zeros((0, PATCH, PATCH, 3), np.uint8),
                             np.zeros((0, 2), np.int64))
    # one in-contract patch placed at a far corner implies a grid whose
    # x32 float64 render would be hundreds of GB — must be refused, not
    # attempted (the batch attention_map path is for giant slides)
    imgs = np.zeros((1, PATCH, PATCH, 3), np.uint8)
    with pytest.raises(ValueError, match="grid too large"):
        service.heatmap(imgs, np.asarray([[4096, 4096]]))
    with pytest.raises(ValueError, match="non-negative"):
        service.heatmap(imgs, np.asarray([[-1, 0]]))
