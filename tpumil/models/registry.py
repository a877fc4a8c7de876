"""Aggregator model registry: every entry exposes
``init_params(key, DSMILConfig)`` and
``forward(params, feats, mask, ...) -> (ins_logits, bag_logits, A, B)``,
mirroring the reference's ``--model dsmil|abmil`` switch
(train_tcga.py:224-227) plus the paper's max-/mean-pooling baselines."""

from __future__ import annotations

from tpumil.models import abmil, dsmil, poolmil

_MODELS = {"dsmil": dsmil, "abmil": abmil,
           "meanpool": poolmil.meanpool, "maxpool": poolmil.maxpool}


def get_model(name: str):
    try:
        return _MODELS[name]
    except KeyError:
        raise ValueError(f"unknown MIL model {name!r}; choose from {sorted(_MODELS)}")
