"""Core numerical ops: masked reductions over padded bags, losses, initializers."""

from tpumil.ops.masked import (  # noqa: F401
    NEG_INF,
    masked_argmax,
    masked_max,
    masked_softmax,
)
from tpumil.ops.losses import bce_with_logits  # noqa: F401
from tpumil.ops.init import orthogonal_torch  # noqa: F401
