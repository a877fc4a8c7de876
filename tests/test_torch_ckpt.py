"""Checkpoint I/O tests: .pth round-trip and golden-file loading of the
shipped example aggregator weights (tier 2 of SURVEY.md section 4)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.io import torch_ckpt

from conftest import REFERENCE_DIR, reference_available

C16_WEIGHTS = os.path.join(REFERENCE_DIR, "example_aggregator_weights", "c16_aggregator.pth")
TCGA_WEIGHTS = os.path.join(REFERENCE_DIR, "example_aggregator_weights", "tcga_aggregator.pth")


def test_aggregator_roundtrip(tmp_path, rng):
    cfg = DSMILConfig(feats_size=32, num_classes=2)
    params = dsmil.init_params(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path / "agg.pth")
    torch_ckpt.save_aggregator_pth(params, path)
    loaded, cfg2 = torch_ckpt.load_aggregator_pth(path)
    assert cfg2 == cfg
    for leaf_a, leaf_b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), atol=0)

    feats = rng.standard_normal((11, cfg.feats_size)).astype(np.float32)
    _, bag_a, _, _ = dsmil.forward(params, jnp.asarray(feats))
    _, bag_b, _, _ = dsmil.forward(loaded, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(bag_a), np.asarray(bag_b), atol=0)


@pytest.mark.skipif(not os.path.exists(C16_WEIGHTS), reason="shipped weights unavailable")
def test_load_shipped_c16_weights():
    params, cfg = torch_ckpt.load_aggregator_pth(C16_WEIGHTS)
    assert cfg.num_classes == 1 and cfg.feats_size == 512
    assert cfg.nonlinear and not cfg.passing_v


@pytest.mark.skipif(not os.path.exists(TCGA_WEIGHTS), reason="shipped weights unavailable")
def test_shipped_tcga_weights_logit_parity(rng):
    """Golden test: identical bag logits/attention between the torch reference
    and tpumil when both load the shipped TCGA aggregator weights."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import dsmil as ref_mil
    finally:
        sys.path.remove(REFERENCE_DIR)

    params, cfg = torch_ckpt.load_aggregator_pth(TCGA_WEIGHTS)
    assert cfg.num_classes == 2 and cfg.feats_size == 512

    i_cls = ref_mil.FCLayer(in_size=512, out_size=2)
    b_cls = ref_mil.BClassifier(input_size=512, output_class=2)
    net = ref_mil.MILNet(i_cls, b_cls)
    net.load_state_dict(torch.load(TCGA_WEIGHTS, map_location="cpu", weights_only=True), strict=True)
    net.eval()

    feats = rng.standard_normal((257, 512)).astype(np.float32)
    with torch.no_grad():
        ref_c, ref_bag, ref_A, _ = net(torch.from_numpy(feats))
    c, bag, A, _ = dsmil.forward(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(bag)[None], ref_bag.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A), ref_A.numpy(), rtol=1e-4, atol=1e-5)


def test_positional_zip_surgery():
    """The popitem-x4 + positional-zip idiom (compute_feats.py:182-207)."""
    import collections
    sd = collections.OrderedDict(
        [("features.0.weight", np.ones((2, 2))), ("features.1.weight", np.full((3,), 2.0)),
         ("l1.weight", np.zeros(1)), ("l1.bias", np.zeros(1)),
         ("l2.weight", np.zeros(1)), ("l2.bias", np.zeros(1))]
    )
    stripped = torch_ckpt.strip_projection_head(sd)
    assert list(stripped) == ["features.0.weight", "features.1.weight"]
    out = torch_ckpt.positional_zip(stripped, ["conv1.weight", "conv2.weight", "fc.weight", "fc.bias"])
    assert list(out) == ["conv1.weight", "conv2.weight"]
    np.testing.assert_array_equal(out["conv1.weight"], np.ones((2, 2)))
