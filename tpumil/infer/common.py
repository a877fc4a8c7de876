"""Shared bag-aggregation plumbing for the inference paths.

BagInference.run_bag (heatmap.py) and InferenceService.predict (service.py)
aggregate the same way: pad the bag to its power-of-two bucket (the repo's
static-shape discipline), run the MIL forward with a validity mask, then
optionally apply the reference testing-flow score average
(attention_map.py:88, testing_tcga.py:150). Keeping the padding and the
averaging formula in ONE place means a semantics fix cannot silently leave
the serving path on old behavior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def pad_bag_to_bucket(feats: np.ndarray,
                      ins_logits: Optional[np.ndarray] = None,
                      ) -> Tuple[np.ndarray, Optional[np.ndarray],
                                 np.ndarray, int]:
    """Zero-pad a bag ``[N, K]`` (and optional instance logits ``[N, C]``)
    to its power-of-two bucket length. Returns
    ``(feats_padded, logits_padded_or_None, mask, n)`` — every instance-axis
    reduction downstream must honor ``mask`` (ops/masked.py discipline)."""
    from tpumil.data.bags import bucket_length

    feats = np.asarray(feats, np.float32)
    n = feats.shape[0]
    if n == 0:
        raise ValueError("empty bag (0 instances) cannot be aggregated")
    nmax = bucket_length(n)
    feats_p = np.zeros((nmax, feats.shape[1]), np.float32)
    feats_p[:n] = feats
    logits_p = None
    if ins_logits is not None:
        ins_logits = np.asarray(ins_logits, np.float32)
        logits_p = np.zeros((nmax, ins_logits.shape[1]), np.float32)
        logits_p[:n] = ins_logits
    mask = np.arange(nmax) < n
    return feats_p, logits_p, mask, n


def testing_flow_average(scores: np.ndarray,
                         ins_logits: np.ndarray) -> np.ndarray:
    """The reference testing-flow score: mean of the bag sigmoid and the
    max-instance sigmoid (attention_map.py:88, testing_tcga.py:150)."""
    max_logits = np.max(ins_logits, axis=0)
    return (scores + 1.0 / (1.0 + np.exp(-max_logits))) / 2.0
