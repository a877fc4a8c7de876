"""Ecosystem interoperability: a model TRAINED in tpumil, exported to the
reference .pth schema, must score bags identically when run by the PyTorch
reference code — the guarantee that lets users switch frameworks mid-project
in either direction."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.data.bags import Bag
from tpumil.io import torch_ckpt
from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.train.trainer import BagTrainer
from tpumil.train import metrics

from conftest import REFERENCE_DIR, reference_available
from synth import make_separable_bags

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def test_trained_model_scores_identically_in_torch(tmp_path, rng):
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import dsmil as ref_mil
    finally:
        sys.path.remove(REFERENCE_DIR)

    # train to a non-trivial model in tpumil
    bags = make_separable_bags(rng, num_bags=24, feats=32, signal=5.0,
                               pos_inst_frac=0.4)
    cfg = DSMILConfig(feats_size=32, num_classes=1)
    trainer = BagTrainer(cfg)
    params, opt_state = trainer.init(jax.random.PRNGKey(0))
    for _ in range(6):
        params, opt_state, _ = trainer.train_epoch(params, opt_state, bags,
                                                   1e-3, rng)
    scores_jax, _ = trainer.predict(params, bags)
    labels = np.asarray([float(b.label[0]) for b in bags])
    _, auc_jax, *_ = metrics.five_scores(labels, scores_jax[:, 0])

    # export -> torch reference -> score the same bags
    path = str(tmp_path / "trained.pth")
    torch_ckpt.save_aggregator_pth(params, path)
    net = ref_mil.MILNet(ref_mil.FCLayer(32, 1), ref_mil.BClassifier(32, 1))
    net.load_state_dict(torch.load(path, weights_only=True), strict=True)
    net.eval()
    scores_torch = []
    with torch.no_grad():
        for b in bags:
            _, bag_logits, _, _ = net(torch.from_numpy(b.feats))
            scores_torch.append(float(torch.sigmoid(bag_logits).squeeze()))
    scores_torch = np.asarray(scores_torch)
    np.testing.assert_allclose(scores_jax[:, 0], scores_torch, rtol=1e-4,
                               atol=1e-5)
    _, auc_torch, *_ = metrics.five_scores(labels, scores_torch)
    assert auc_jax == pytest.approx(auc_torch)
    assert auc_jax > 0.9  # the trained model is non-trivial
