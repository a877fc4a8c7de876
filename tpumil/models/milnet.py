"""Object-style facade over the functional DSMIL/ABMIL cores.

Users of the reference compose ``MILNet(IClassifier, BClassifier)``
(dsmil.py:64-74); this facade offers the same mental model on top of
tpumil's functional internals:

    net = MILNet.create(feats_size=512, num_classes=1)        # fresh
    net = MILNet.from_pth("aggregator.pth")                   # reference ckpt
    ins_logits, bag_logits, A, B = net(feats, mask)
    scores = net.score(feats, mask)                           # sigmoid bag
    net.save_pth("out.pth")                                   # reference ckpt
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpumil.models.dsmil import DSMILConfig
from tpumil.models.registry import get_model


@dataclasses.dataclass
class MILNet:
    params: Dict[str, Any]
    cfg: DSMILConfig
    model: str = "dsmil"

    @classmethod
    def create(cls, feats_size: int, num_classes: int, *, nonlinear: bool = True,
               passing_v: bool = False, model: str = "dsmil",
               seed: int = 0) -> "MILNet":
        cfg = DSMILConfig(feats_size=feats_size, num_classes=num_classes,
                          nonlinear=nonlinear, passing_v=passing_v)
        params = get_model(model).init_params(jax.random.PRNGKey(seed), cfg)
        return cls(params, cfg, model)

    @classmethod
    def from_pth(cls, path: str) -> "MILNet":
        from tpumil.io import torch_ckpt

        params, cfg = torch_ckpt.load_aggregator_pth(path)
        return cls(params, cfg, "dsmil")

    def save_pth(self, path: str) -> None:
        from tpumil.io import torch_ckpt

        if self.model != "dsmil":
            raise ValueError("reference .pth schema covers the dsmil model only")
        torch_ckpt.save_aggregator_pth(self.params, path)

    def __call__(self, feats, mask=None):
        return get_model(self.model).forward(
            self.params, jnp.asarray(feats),
            None if mask is None else jnp.asarray(mask),
            compute_dtype=self.cfg.compute_dtype)

    def score(self, feats, mask=None, *, average: bool = False) -> np.ndarray:
        """Sigmoid bag scores. ``average`` adds the sigmoid of the max
        instance logit WITHOUT dividing — matching the trainer's --average
        semantics (train_tcga.py:107) so saved optimal thresholds transfer.
        (testing_tcga.py:87 divides by 2; divide yourself for that scale.)"""
        mil = get_model(self.model)
        c, bag_logits, _, _ = self(feats, mask)
        s = jax.nn.sigmoid(bag_logits)
        if average:
            s = s + jax.nn.sigmoid(mil.max_instance_logits(
                c, None if mask is None else jnp.asarray(mask)))
        return np.asarray(s)
