"""Aggregator model registry: both models expose
``init_params(key, DSMILConfig)`` and
``forward(params, feats, mask, ...) -> (ins_logits, bag_logits, A, B)``,
mirroring the reference's ``--model dsmil|abmil`` switch
(train_tcga.py:224-227)."""

from __future__ import annotations

from tpumil.models import abmil, dsmil

_MODELS = {"dsmil": dsmil, "abmil": abmil}


def get_model(name: str):
    try:
        return _MODELS[name]
    except KeyError:
        raise ValueError(f"unknown MIL model {name!r}; choose from {sorted(_MODELS)}")
