"""tpumil — TPU-native whole-slide-image multiple-instance-learning framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of DSMIL
(binli123/dsmil-wsi, CVPR 2021): whole-slide tiling, SimCLR embedder
pretraining, bf16 batched feature extraction, the dual-stream MIL aggregator
over variable-length bags, k-fold training harnesses, and attention heatmaps.

Everything under `jit` uses static shapes: variable-length bags are handled by
bucketed padding + boolean masks (see `tpumil.ops.masked`), per-bag optimizer
steps are compiled into `lax.scan` loops (see `tpumil.train.trainer`), and
multi-chip scale-out uses `jax.sharding.Mesh` + NamedSharding over a data axis
with an optional instance (sequence) axis for giant bags
(see `tpumil.parallel`).
"""

__version__ = "0.1.0"

from tpumil.models import dsmil  # noqa: F401
