"""Baseline 4-conv toy encoder with projection head.

Mirror of the reference's (unused) simclr/models/baseline_encoder.py:7-43 —
a small CNN alternative to the ResNet backbone for SimCLR experiments:
4x (conv3x3 -> relu -> maxpool2) then a 2-layer projection MLP. Returns
(h, z) like ResNetSimCLR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

WIDTHS = (32, 64, 128, 256)


def init_params(key, out_dim: int = 256, feat_dim: int = 256):
    params = {}
    in_ch = 3
    for i, w in enumerate(WIDTHS):
        key, sub = jax.random.split(key)
        std = float(np.sqrt(2.0 / (3 * 3 * w)))
        params[f"conv{i}"] = {
            "w": std * jax.random.normal(sub, (3, 3, in_ch, w)),
            "b": jnp.zeros((w,)),
        }
        in_ch = w
    key, k1, k2 = jax.random.split(key, 3)
    lim = 1.0 / np.sqrt(feat_dim)
    params["l1"] = {"w": jax.random.uniform(k1, (feat_dim, feat_dim), minval=-lim, maxval=lim),
                    "b": jnp.zeros((feat_dim,))}
    params["l2"] = {"w": jax.random.uniform(k2, (out_dim, feat_dim), minval=-lim, maxval=lim),
                    "b": jnp.zeros((out_dim,))}
    return params


def forward(params, x, compute_dtype=jnp.float32):
    """x: [B, H, W, 3] -> (h [B, 256], z [B, out_dim])."""
    h = x.astype(compute_dtype)
    for i in range(4):
        w = params[f"conv{i}"]["w"].astype(compute_dtype)
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=compute_dtype)
        h = jax.nn.relu(h + params[f"conv{i}"]["b"].astype(compute_dtype))
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1),
                                  ((0, 0), (0, 0), (0, 0), (0, 0)))
    h = jnp.mean(h, axis=(1, 2)).astype(jnp.float32)
    z = jax.nn.relu(h @ params["l1"]["w"].T + params["l1"]["b"])
    z = z @ params["l2"]["w"].T + params["l2"]["b"]
    return h, z
