"""Profile the f32-parity extraction tier's throughput gap (VERDICT r2 #5).

The parity default (f32 storage, DEFAULT MXU precision = bf16 operand
passes) runs at 19.0k patches/s vs bf16's 31.4k. Candidate: ``f32m`` —
explicit bf16 conv operands with f32 accumulation/activations, numerically
the same rounding DEFAULT already applies inside the MXU (pinned on-chip by
tests/test_tpu_numerics.py::test_operand_bf16_matches_f32_default) but
visible to XLA so producer fusions can emit bf16 conv reads.

    python benchmarks/f32_gap.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp

    import bench
    from tpumil.models.embedder import EmbedderConfig

    variants = {
        "bf16": dict(compute_dtype=jnp.bfloat16),
        "f32_default": dict(compute_dtype=jnp.float32),
        "f32m": dict(compute_dtype=jnp.float32, operand_dtype=jnp.bfloat16),
        "f32h": dict(compute_dtype=jnp.float32, precision="high"),
        "f32h_m": dict(compute_dtype=jnp.float32, precision="high",
                       operand_dtype=jnp.bfloat16),
    }
    results = {}
    for name, kw in variants.items():
        cfg = EmbedderConfig(backbone="resnet18", norm="instance",
                             num_classes=1, space_to_depth=True, **kw)
        rate = bench._measure_embed_rate(cfg, batch=128, scan_len=256,
                                         repeats=3)
        results[name] = round(rate, 1)
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
