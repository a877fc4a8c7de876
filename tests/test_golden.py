"""Self-contained golden regression tests.

tests/data/ carries the shipped reference aggregator weights (CPU-mapped)
plus the exact outputs the PyTorch reference produced for a fixed random bag
(generated once against /root/reference, seed 20260816). These tests run
WITHOUT the reference mounted and pin tpumil's numerics across rounds.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from tpumil.io import torch_ckpt
from tpumil.models import dsmil

DATA = os.path.join(os.path.dirname(__file__), "data")
GOLDEN = os.path.join(DATA, "golden_aggregator.npz")


@pytest.mark.parametrize("name,num_classes", [("c16", 1), ("tcga", 2)])
def test_golden_aggregator_outputs(name, num_classes):
    golden = np.load(GOLDEN)
    params, cfg = torch_ckpt.load_aggregator_pth(
        os.path.join(DATA, f"{name}_aggregator.pth"))
    assert cfg.num_classes == num_classes
    feats = golden[f"{name}_feats"]
    c, bag_logits, attn, _ = dsmil.forward(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(bag_logits)[None],
                               golden[f"{name}_bag_logits"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), golden[f"{name}_attention"],
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), golden[f"{name}_ins_logits"],
                               rtol=1e-4, atol=1e-5)
