"""Single-pass Pallas InstanceNorm (ops/in_pallas.py) — parity vs the XLA
norm (interpret mode on CPU) and the fused_in ResNet flag.

On-chip timing lives in benchmarks/in_epilogue_probe.py; the measured
outcome is a NEGATIVE (docs/PERF.md "conv+IN epilogue") — the kernel is
retained tested, like the fused stem, as the starting point if Mosaic's
reduce pipelining improves. fused_in stays default-False.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.models import resnet
from tpumil.ops.in_pallas import fused_instance_norm


@pytest.mark.parametrize("shape", [(4, 8, 8, 64), (4, 4, 4, 128),
                                   (2, 4, 4, 256), (8, 2, 2, 512),
                                   (3, 5, 2, 64)])
def test_fused_in_parity(shape, rng):
    """Matches resnet._norm (torch InstanceNorm2d semantics) across the
    ResNet18 channel family, incl. the C=64 lane-folding path and a batch
    that does not divide the 2MB block target."""
    cfg = resnet.ResNetConfig(depth=18, norm="instance")
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 3 + 1)
    want = np.asarray(resnet._norm({}, x, "conv1.weight", cfg))
    got = np.asarray(fused_instance_norm(x, relu=False, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    got_r = np.asarray(fused_instance_norm(x, relu=True, interpret=True))
    np.testing.assert_allclose(got_r, np.maximum(want, 0.0),
                               rtol=2e-5, atol=2e-5)


def test_fused_in_validation():
    x = jnp.zeros((2, 4, 4, 96))
    with pytest.raises(ValueError, match="channel"):
        fused_instance_norm(x, interpret=True)
    with pytest.raises(ValueError, match="even"):
        fused_instance_norm(jnp.zeros((2, 3, 3, 64)), interpret=True)


def test_resnet_fused_in_forward_parity(rng):
    """ResNetConfig.fused_in routes every qualifying IN(+ReLU) site through
    the kernel; the full forward matches the XLA path (f32, reduction-order
    noise only — same bar as the s2d stem pin)."""
    cfg = resnet.ResNetConfig(depth=18, norm="instance")
    cfg_f = resnet.ResNetConfig(depth=18, norm="instance", fused_in=True)
    params = resnet.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    a = np.asarray(resnet.forward(params, x, cfg))
    b = np.asarray(resnet.forward(params, x, cfg_f))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pick_bn_respects_vmem_budget():
    """Block sizing must stay a divisor of n and keep blocks under the
    element budget: Mosaic's scoped-vmem stack is 16 MB and the measured
    in-kernel footprint is 23-48 B per block element (two on-chip OOMs at
    the old 2 MB stored-block target — docs/PERF.md "conv+IN epilogue")."""
    from tpumil.ops.in_pallas import MAX_BLOCK_ELEMS_BF16, _pick_bn

    # the shapes that OOM'd on chip: 14x14x256 (s=196) picked bn=32 and
    # 7x7x512 (s=49) picked bn=64 at the old target
    for s in (196, 49, 784, 1568):
        bn = _pick_bn(128, s, 2)
        assert 128 % bn == 0
        assert bn == 1 or bn * s * 128 <= MAX_BLOCK_ELEMS_BF16
        # f32 inputs double the stored in/out bytes -> half the budget
        bn32 = _pick_bn(128, s, 4)
        assert 128 % bn32 == 0
        assert bn32 == 1 or bn32 * s * 128 <= MAX_BLOCK_ELEMS_BF16 // 2
    # stem-sized planes always fit at least one sample per block (measured
    # to run on chip despite exceeding the nominal budget)
    assert _pick_bn(128, 6272, 4) == 1


def test_fused_in_constant_plane_no_nan(rng):
    """A constant (sample, channel) plane (blank/background WSI tile) has
    true variance 0; the one-pass E[x^2]-mean^2 form can round NEGATIVE
    (error scales with mean^2), where rsqrt(var+EPS) would NaN. The clamp
    must keep the output finite and matching the two-pass XLA norm."""
    x = np.full((2, 8, 8, 64), 3.7, np.float32)
    x[1] += rng.standard_normal((8, 8, 64)).astype(np.float32) * 1e-4
    got = np.asarray(fused_instance_norm(jnp.asarray(x), interpret=True))
    assert np.isfinite(got).all()
    cfg = resnet.ResNetConfig(depth=18, norm="instance")
    want = np.asarray(resnet._norm({}, jnp.asarray(x), "conv1.weight", cfg))
    assert np.isfinite(want).all()
    np.testing.assert_allclose(got, want, atol=2e-2)
