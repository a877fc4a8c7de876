"""Torch ``.pth`` state_dict import/export.

The reference's only checkpoint format is ``torch.save(state_dict)`` with
these schemas (verified against the shipped ``example_aggregator_weights``):

Aggregator (train_tcga.py:183-190):
    i_classifier.fc.0.{weight,bias}   [C, K], [C]      (FCLayer's Linear)
    b_classifier.q.0.{weight,bias}    [128, K]          (nonlinear q, layer 0)
    b_classifier.q.2.{weight,bias}    [128, 128]        (nonlinear q, layer 2)
    b_classifier.q.{weight,bias}      [128, K]          (linear q variant)
    b_classifier.v.1.{weight,bias}    [K, K]            (passing_v variant)
    b_classifier.fcc.{weight,bias}    [C, C, K], [C]

Some loaders see the remapped key ``i_classifier.fc.{weight,bias}``
(attention_map.py:162-165); both spellings are accepted here.

SimCLR embedder (compute_feats.py:182-234, attention_map.py:151-160): a
ResNetSimCLR state_dict whose last 4 entries (projection MLP l1/l2) are
dropped, after which the remaining conv weights are zipped *positionally*
(order-based, not name-based) onto the target ResNet's parameters. We
reproduce that exact surgery in ``embedder.load_simclr_checkpoint`` (the validated path; ``positional_zip`` below documents the raw idiom).

torch (CPU build) is used for (de)serialisation; it is an I/O dependency
only — no tensor math runs through it.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from tpumil.models.dsmil import DSMILConfig


def _torch():
    import torch  # lazy: only needed when touching .pth files

    return torch


def load_state_dict(path: str) -> "collections.OrderedDict":
    """Load a ``.pth`` state_dict as an OrderedDict of numpy arrays
    (preserving insertion order — positional surgery depends on it)."""
    torch = _torch()
    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = collections.OrderedDict()
    for k, v in sd.items():
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def save_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    torch = _torch()
    tensors = collections.OrderedDict(
        # .copy() guarantees a writable buffer (jax arrays export read-only
        # views, which torch warns about)
        (k, torch.from_numpy(np.asarray(v, dtype=np.float32).copy()))
        for k, v in sd.items()
    )
    torch.save(tensors, path)


# ---------------------------------------------------------------------------
# Aggregator (MILNet) checkpoints
# ---------------------------------------------------------------------------

def aggregator_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, Any], DSMILConfig]:
    """Build a tpumil DSMIL params pytree from a reference aggregator
    state_dict. Infers feats_size / num_classes / nonlinear / passing_v from
    the key shapes."""
    import jax.numpy as jnp

    def get(*names):
        for n in names:
            if n in sd:
                return np.asarray(sd[n], dtype=np.float32)
        raise KeyError(f"none of {names} in checkpoint (keys: {list(sd)[:8]}...)")

    i_w = get("i_classifier.fc.0.weight", "i_classifier.fc.weight")
    i_b = get("i_classifier.fc.0.bias", "i_classifier.fc.bias")
    fcc_w = get("b_classifier.fcc.weight")
    fcc_b = get("b_classifier.fcc.bias")
    num_classes, feats_size = i_w.shape

    nonlinear = "b_classifier.q.0.weight" in sd
    passing_v = "b_classifier.v.1.weight" in sd

    params: Dict[str, Any] = {
        "i_fc": {"w": jnp.asarray(i_w), "b": jnp.asarray(i_b)},
        "fcc": {"w": jnp.asarray(fcc_w), "b": jnp.asarray(fcc_b)},
    }
    if nonlinear:
        params["q"] = {
            "w0": jnp.asarray(get("b_classifier.q.0.weight")),
            "b0": jnp.asarray(get("b_classifier.q.0.bias")),
            "w2": jnp.asarray(get("b_classifier.q.2.weight")),
            "b2": jnp.asarray(get("b_classifier.q.2.bias")),
        }
    else:
        params["q"] = {
            "w": jnp.asarray(get("b_classifier.q.weight")),
            "b": jnp.asarray(get("b_classifier.q.bias")),
        }
    if passing_v:
        params["v"] = {
            "w": jnp.asarray(get("b_classifier.v.1.weight")),
            "b": jnp.asarray(get("b_classifier.v.1.bias")),
        }
    else:
        params["v"] = {}
    cfg = DSMILConfig(feats_size=feats_size, num_classes=num_classes,
                      nonlinear=nonlinear, passing_v=passing_v)
    return params, cfg


def aggregator_state_dict_from_params(params: Dict[str, Any]) -> "collections.OrderedDict":
    """Export tpumil DSMIL params as a reference-schema state_dict so the
    weights load back into the PyTorch reference (train_tcga.py:183-190)."""
    sd = collections.OrderedDict()
    sd["i_classifier.fc.0.weight"] = np.asarray(params["i_fc"]["w"])
    sd["i_classifier.fc.0.bias"] = np.asarray(params["i_fc"]["b"])
    q = params["q"]
    if "w0" in q:
        sd["b_classifier.q.0.weight"] = np.asarray(q["w0"])
        sd["b_classifier.q.0.bias"] = np.asarray(q["b0"])
        sd["b_classifier.q.2.weight"] = np.asarray(q["w2"])
        sd["b_classifier.q.2.bias"] = np.asarray(q["b2"])
    else:
        sd["b_classifier.q.weight"] = np.asarray(q["w"])
        sd["b_classifier.q.bias"] = np.asarray(q["b"])
    if params.get("v"):
        sd["b_classifier.v.1.weight"] = np.asarray(params["v"]["w"])
        sd["b_classifier.v.1.bias"] = np.asarray(params["v"]["b"])
    sd["b_classifier.fcc.weight"] = np.asarray(params["fcc"]["w"])
    sd["b_classifier.fcc.bias"] = np.asarray(params["fcc"]["b"])
    return sd


def load_aggregator_pth(path: str) -> Tuple[Dict[str, Any], DSMILConfig]:
    return aggregator_params_from_state_dict(load_state_dict(path))


def save_aggregator_pth(params: Dict[str, Any], path: str) -> None:
    save_state_dict(aggregator_state_dict_from_params(params), path)


# ---------------------------------------------------------------------------
# ABMIL checkpoints (tpumil schema — the reference ships no abmil.py, so no
# upstream schema exists; keys mirror the DSMIL naming style)
# ---------------------------------------------------------------------------

_ABMIL_KEYS = {
    "i_classifier.fc.weight": ("i_fc", "w"), "i_classifier.fc.bias": ("i_fc", "b"),
    "b_classifier.attention_v.weight": ("att_v", "w"),
    "b_classifier.attention_v.bias": ("att_v", "b"),
    "b_classifier.attention_u.weight": ("att_u", "w"),
    "b_classifier.attention_u.bias": ("att_u", "b"),
    "b_classifier.attention_w.weight": ("att_w", "w"),
    "b_classifier.attention_w.bias": ("att_w", "b"),
    "b_classifier.fc.weight": ("bag_fc", "w"), "b_classifier.fc.bias": ("bag_fc", "b"),
}


def abmil_state_dict_from_params(params: Dict[str, Any]) -> "collections.OrderedDict":
    sd = collections.OrderedDict()
    for name, (grp, leaf) in _ABMIL_KEYS.items():
        sd[name] = np.asarray(params[grp][leaf])
    return sd


def abmil_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[Dict[str, Any], DSMILConfig]:
    import jax.numpy as jnp

    params: Dict[str, Any] = {}
    for name, (grp, leaf) in _ABMIL_KEYS.items():
        params.setdefault(grp, {})[leaf] = jnp.asarray(
            np.asarray(sd[name], np.float32))
    c, k = np.asarray(sd["i_classifier.fc.weight"]).shape
    return params, DSMILConfig(feats_size=k, num_classes=c)


def save_mil_pth(params: Dict[str, Any], path: str, model: str = "dsmil") -> None:
    """Model-aware export: the reference schema for dsmil, tpumil schemas
    for the other registry models (abmil / the pooling baselines)."""
    if model in ("meanpool", "maxpool"):
        sd = collections.OrderedDict()
        sd["i_classifier.fc.weight"] = np.asarray(params["i_fc"]["w"])
        sd["i_classifier.fc.bias"] = np.asarray(params["i_fc"]["b"])
        # save_state_dict casts to f32; 0.0/1.0 still round-trips exactly
        sd["pooling.mode"] = np.float32(0.0 if model == "meanpool" else 1.0)
        save_state_dict(sd, path)
    elif model == "abmil" or "att_v" in params:
        save_state_dict(abmil_state_dict_from_params(params), path)
    else:
        save_aggregator_pth(params, path)


def load_mil_pth(path: str) -> Tuple[Dict[str, Any], DSMILConfig, str]:
    """Load any registry schema; returns (params, cfg, model_name)."""
    import jax.numpy as jnp

    sd = load_state_dict(path)
    if "pooling.mode" in sd:
        i_w = np.asarray(sd["i_classifier.fc.weight"], np.float32)
        i_b = np.asarray(sd["i_classifier.fc.bias"], np.float32)
        params = {"i_fc": {"w": jnp.asarray(i_w), "b": jnp.asarray(i_b)}}
        c, k = i_w.shape
        model = "maxpool" if float(sd["pooling.mode"]) > 0.5 else "meanpool"
        return params, DSMILConfig(feats_size=k, num_classes=c), model
    if "b_classifier.attention_v.weight" in sd:
        params, cfg = abmil_params_from_state_dict(sd)
        return params, cfg, "abmil"
    params, cfg = aggregator_params_from_state_dict(sd)
    return params, cfg, "dsmil"


# ---------------------------------------------------------------------------
# Embedder (SimCLR ResNet) checkpoints — positional surgery
# ---------------------------------------------------------------------------

def strip_projection_head(sd: "collections.OrderedDict", n: int = 4) -> "collections.OrderedDict":
    """Drop the last ``n`` entries (the SimCLR projection MLP), reproducing
    the reference's 4x ``popitem()`` (compute_feats.py:184-185)."""
    keys = list(sd.keys())[: len(sd) - n]
    return collections.OrderedDict((k, sd[k]) for k in keys)


def positional_zip(values_sd: "collections.OrderedDict",
                   target_keys: List[str]) -> "collections.OrderedDict":
    """Zip checkpoint values onto target parameter names by *position*,
    stopping at the shorter sequence — the reference's loading idiom
    (compute_feats.py:187-190, attention_map.py:156-160)."""
    out = collections.OrderedDict()
    for (src_key, v), dst_key in zip(values_sd.items(), target_keys):
        out[dst_key] = v
    return out

