"""Exact training-dynamics parity vs the PyTorch reference.

The strongest evidence the optimization stack (model math + dual loss +
Adam(0.5, 0.9) + weight decay + per-bag stepping) matches the reference:
initialize both implementations with identical weights, step through the
same bags in the same order, and compare per-step losses and final
parameters to float tolerance.
"""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.train.optim import adam_torch
from tpumil.train.trainer import BagTrainer
from tpumil.data.bags import Bag

from conftest import REFERENCE_DIR, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


def _load_reference_mil():
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import dsmil as ref_mil
    finally:
        sys.path.remove(REFERENCE_DIR)
    return ref_mil


def test_per_bag_training_trajectory_matches_torch(rng):
    torch = pytest.importorskip("torch")
    ref_mil = _load_reference_mil()

    k, c, lr, wd = 32, 1, 1e-3, 1e-3
    cfg = DSMILConfig(feats_size=k, num_classes=c)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)

    # identical weights into the torch reference
    net = ref_mil.MILNet(ref_mil.FCLayer(k, c), ref_mil.BClassifier(k, c))
    sd = {
        "i_classifier.fc.0.weight": torch.from_numpy(np.asarray(params["i_fc"]["w"])),
        "i_classifier.fc.0.bias": torch.from_numpy(np.asarray(params["i_fc"]["b"])),
        "b_classifier.q.0.weight": torch.from_numpy(np.asarray(params["q"]["w0"])),
        "b_classifier.q.0.bias": torch.from_numpy(np.asarray(params["q"]["b0"])),
        "b_classifier.q.2.weight": torch.from_numpy(np.asarray(params["q"]["w2"])),
        "b_classifier.q.2.bias": torch.from_numpy(np.asarray(params["q"]["b2"])),
        "b_classifier.fcc.weight": torch.from_numpy(np.asarray(params["fcc"]["w"])),
        "b_classifier.fcc.bias": torch.from_numpy(np.asarray(params["fcc"]["b"])),
    }
    net.load_state_dict(sd, strict=True)
    net.train()
    crit = torch.nn.BCEWithLogitsLoss()
    opt = torch.optim.Adam(net.parameters(), lr=lr, betas=(0.5, 0.9),
                           weight_decay=wd)

    # fixed bag sequence (3 epochs x 8 bags, no shuffle)
    bags = []
    for i in range(8):
        n = int(rng.integers(5, 30))
        bags.append((rng.standard_normal((n, k)).astype(np.float32),
                     np.asarray([float(i % 2)], np.float32)))
    sequence = bags * 3

    # --- torch trajectory
    torch_losses = []
    for feats, label in sequence:
        opt.zero_grad()
        ins, bag, _, _ = net(torch.from_numpy(feats))
        mx, _ = torch.max(ins, 0)
        y = torch.from_numpy(label).view(1, -1)
        loss = 0.5 * crit(bag.view(1, -1), y) + 0.5 * crit(mx.view(1, -1), y)
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # --- tpumil trajectory via the compiled scan trainer (one chunk per
    # epoch, order preserved by identity permutation)
    trainer = BagTrainer(cfg, optimizer=adam_torch(betas=(0.5, 0.9),
                                                   weight_decay=wd))
    params_j, opt_state = trainer.init(jax.random.PRNGKey(0))
    params_j = jax.tree.map(lambda x: x, params)  # same init as torch
    opt_state = trainer.optimizer.init(params_j)

    from tpumil.data.bags import pad_bags

    jax_losses = []
    bag_objs = [Bag(f, l, str(i)) for i, (f, l) in enumerate(bags)]
    feats_p, mask_p, labels_p = pad_bags(bag_objs, nmax=32)
    keys = jax.random.split(jax.random.PRNGKey(0), len(bags))
    perm = jnp.arange(len(bags))
    real = jnp.ones((len(bags),), bool)
    for _ in range(3):
        params_j, opt_state, total = trainer._train_bucket(
            params_j, opt_state, jnp.asarray(feats_p), jnp.asarray(mask_p),
            jnp.asarray(labels_p), perm, jnp.asarray(lr, jnp.float32), keys,
            real, trainer._pw())
        jax_losses.append(float(total))

    torch_epoch_losses = [sum(torch_losses[e * 8:(e + 1) * 8]) for e in range(3)]
    np.testing.assert_allclose(jax_losses, torch_epoch_losses, rtol=2e-3)

    # final parameters agree
    final_sd = net.state_dict()
    np.testing.assert_allclose(
        np.asarray(params_j["i_fc"]["w"]),
        final_sd["i_classifier.fc.0.weight"].numpy(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params_j["fcc"]["w"]),
        final_sd["b_classifier.fcc.weight"].numpy(), rtol=1e-3, atol=1e-5)
