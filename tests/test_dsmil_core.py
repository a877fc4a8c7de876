"""Parity tests for the DSMIL core math.

Tier 1 of the test strategy (SURVEY.md section 4): the JAX implementation is
checked against (a) an independent numpy oracle written from the documented
math (dsmil.py:46-62), and (b) the actual PyTorch reference when it is
mounted at /root/reference.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.ops.losses import bce_with_logits, dual_stream_loss

from conftest import REFERENCE_DIR, reference_available


# ---------------------------------------------------------------------------
# Independent numpy oracle (from the math spec, not translated code)
# ---------------------------------------------------------------------------

def numpy_q(params, x):
    q = params["q"]
    if "w0" in q:
        h = np.maximum(x @ np.asarray(q["w0"]).T + np.asarray(q["b0"]), 0.0)
        return np.tanh(h @ np.asarray(q["w2"]).T + np.asarray(q["b2"]))
    return x @ np.asarray(q["w"]).T + np.asarray(q["b"])


def numpy_forward(params, feats):
    feats = np.asarray(feats, dtype=np.float64)
    c = feats @ np.asarray(params["i_fc"]["w"]).T + np.asarray(params["i_fc"]["b"])
    Q = numpy_q(params, feats)
    if params.get("v"):
        V = np.maximum(feats @ np.asarray(params["v"]["w"]).T + np.asarray(params["v"]["b"]), 0.0)
    else:
        V = feats
    crit = np.argmax(c, axis=0)
    m_feats = feats[crit]
    q_max = numpy_q(params, m_feats)
    logits = Q @ q_max.T / np.sqrt(128.0)
    e = np.exp(logits - logits.max(axis=0, keepdims=True))
    A = e / e.sum(axis=0, keepdims=True)
    B = A.T @ V
    W = np.asarray(params["fcc"]["w"])
    bag = np.einsum("ck,dck->d", B, W) + np.asarray(params["fcc"]["b"])
    return c, bag, A, B


def make_params(rng, k=64, c=3, nonlinear=True, passing_v=False):
    cfg = DSMILConfig(feats_size=k, num_classes=c, nonlinear=nonlinear, passing_v=passing_v)
    params = dsmil.init_params(jax.random.PRNGKey(rng.integers(1 << 30)), cfg)
    return params, cfg


@pytest.mark.parametrize("nonlinear", [True, False])
@pytest.mark.parametrize("passing_v", [True, False])
def test_forward_matches_numpy_oracle(rng, nonlinear, passing_v):
    params, cfg = make_params(rng, nonlinear=nonlinear, passing_v=passing_v)
    feats = rng.standard_normal((37, cfg.feats_size)).astype(np.float32)
    c_np, bag_np, A_np, B_np = numpy_forward(params, feats)
    c, bag, A, B = dsmil.forward(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(c), c_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bag), bag_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A), A_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(B), B_np, rtol=1e-4, atol=1e-5)


def test_padding_invariance(rng):
    """Padding a bag with masked rows must not change any output."""
    params, cfg = make_params(rng)
    n = 21
    feats = rng.standard_normal((n, cfg.feats_size)).astype(np.float32)
    pad = rng.standard_normal((64 - n, cfg.feats_size)).astype(np.float32) * 100.0
    feats_padded = np.concatenate([feats, pad], axis=0)
    mask = np.arange(64) < n

    c0, bag0, A0, _ = dsmil.forward(params, jnp.asarray(feats))
    c1, bag1, A1, _ = dsmil.forward(params, jnp.asarray(feats_padded), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(bag1), np.asarray(bag0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A1)[:n], np.asarray(A0), rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(A1)[n:] == 0.0)
    # max-instance stream must also ignore padding
    m0 = dsmil.max_instance_logits(c0)
    m1 = dsmil.max_instance_logits(c1, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-4, atol=1e-5)


def test_batched_matches_per_bag(rng):
    params, cfg = make_params(rng)
    lens = [5, 17, 32]
    nmax = 32
    feats = np.zeros((3, nmax, cfg.feats_size), dtype=np.float32)
    mask = np.zeros((3, nmax), dtype=bool)
    singles = []
    for i, n in enumerate(lens):
        f = rng.standard_normal((n, cfg.feats_size)).astype(np.float32)
        feats[i, :n] = f
        mask[i, :n] = True
        singles.append(dsmil.forward(params, jnp.asarray(f)))
    c, bag, A, B = dsmil.forward(params, jnp.asarray(feats), jnp.asarray(mask))
    for i, n in enumerate(lens):
        np.testing.assert_allclose(np.asarray(bag)[i], np.asarray(singles[i][1]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(A)[i, :n], np.asarray(singles[i][2]), rtol=1e-4, atol=1e-5)


def test_bce_with_logits_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.standard_normal((4, 3)).astype(np.float32)
    labels = (rng.random((4, 3)) > 0.5).astype(np.float32)
    pw = np.asarray([1.0, 2.5, 0.5], dtype=np.float32)
    got = bce_with_logits(jnp.asarray(logits), jnp.asarray(labels))
    want = torch.nn.BCEWithLogitsLoss()(torch.from_numpy(logits), torch.from_numpy(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    got_pw = bce_with_logits(jnp.asarray(logits), jnp.asarray(labels), pos_weight=jnp.asarray(pw))
    want_pw = torch.nn.BCEWithLogitsLoss(pos_weight=torch.from_numpy(pw))(
        torch.from_numpy(logits), torch.from_numpy(labels))
    np.testing.assert_allclose(float(got_pw), float(want_pw), rtol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
@pytest.mark.parametrize("nonlinear", [True, False])
def test_forward_matches_pytorch_reference(rng, nonlinear):
    """Load the actual reference implementation and compare logits/attention
    on random bags with identical weights."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import dsmil as ref_mil
    finally:
        sys.path.remove(REFERENCE_DIR)

    k, c = 48, 2
    params, cfg = make_params(rng, k=k, c=c, nonlinear=nonlinear)

    i_cls = ref_mil.FCLayer(in_size=k, out_size=c)
    b_cls = ref_mil.BClassifier(input_size=k, output_class=c, nonlinear=nonlinear)
    net = ref_mil.MILNet(i_cls, b_cls)

    sd = {}
    sd["i_classifier.fc.0.weight"] = torch.from_numpy(np.asarray(params["i_fc"]["w"]))
    sd["i_classifier.fc.0.bias"] = torch.from_numpy(np.asarray(params["i_fc"]["b"]))
    if nonlinear:
        sd["b_classifier.q.0.weight"] = torch.from_numpy(np.asarray(params["q"]["w0"]))
        sd["b_classifier.q.0.bias"] = torch.from_numpy(np.asarray(params["q"]["b0"]))
        sd["b_classifier.q.2.weight"] = torch.from_numpy(np.asarray(params["q"]["w2"]))
        sd["b_classifier.q.2.bias"] = torch.from_numpy(np.asarray(params["q"]["b2"]))
    else:
        sd["b_classifier.q.weight"] = torch.from_numpy(np.asarray(params["q"]["w"]))
        sd["b_classifier.q.bias"] = torch.from_numpy(np.asarray(params["q"]["b"]))
    sd["b_classifier.fcc.weight"] = torch.from_numpy(np.asarray(params["fcc"]["w"]))
    sd["b_classifier.fcc.bias"] = torch.from_numpy(np.asarray(params["fcc"]["b"]))
    net.load_state_dict(sd, strict=True)
    net.eval()

    feats = rng.standard_normal((53, k)).astype(np.float32)
    with torch.no_grad():
        ref_c, ref_bag, ref_A, ref_B = net(torch.from_numpy(feats))
    c_j, bag_j, A_j, B_j = dsmil.forward(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(c_j), ref_c.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bag_j)[None], ref_bag.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A_j), ref_A.numpy(), rtol=1e-4, atol=1e-5)

    # loss parity too (train_tcga.py:68-71)
    y = (rng.random((c,)) > 0.5).astype(np.float32)
    crit = torch.nn.BCEWithLogitsLoss()
    ref_max = ref_c.max(dim=0).values
    ref_loss = 0.5 * crit(ref_bag.view(1, -1), torch.from_numpy(y).view(1, -1)) \
        + 0.5 * crit(ref_max.view(1, -1), torch.from_numpy(y).view(1, -1))
    got_loss = dual_stream_loss(bag_j, dsmil.max_instance_logits(c_j), jnp.asarray(y))
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-4, atol=1e-5)
