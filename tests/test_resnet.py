"""ResNet embedder parity vs a torch oracle (instance + batch norm variants)
and checkpoint surgery validation."""

import collections

import numpy as np
import pytest
import jax.numpy as jnp

from tpumil.models import resnet
from tpumil.models.resnet import ResNetConfig

torch = pytest.importorskip("torch")
from torch_resnet_oracle import TorchResNet  # noqa: E402


def _torch_sd_to_numpy(net):
    return collections.OrderedDict(
        (k, v.detach().cpu().numpy()) for k, v in net.state_dict().items())


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


@pytest.mark.parametrize("depth", [18, 50])
def test_instance_norm_parity(depth, rng):
    cfg = ResNetConfig(depth=depth, norm="instance")
    net = TorchResNet(depth, torch.nn.InstanceNorm2d).eval()
    sd = _torch_sd_to_numpy(net)
    params = resnet.load_torch_state_dict(sd, cfg)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(_nchw(x)).numpy()
    got = np.asarray(resnet.forward(params, jnp.asarray(x), cfg))
    # accumulated f32 rounding grows with depth across different conv
    # backends; instance norm amplifies near-zero channels
    np.testing.assert_allclose(got, want, rtol=8e-3, atol=2e-2)


def test_batch_norm_parity(rng):
    cfg = ResNetConfig(depth=18, norm="batch")
    net = TorchResNet(18, torch.nn.BatchNorm2d).eval()
    # randomize running stats so the test exercises them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)
    sd = _torch_sd_to_numpy(net)
    params = resnet.load_torch_state_dict(sd, cfg)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = net(_nchw(x)).numpy()
    got = np.asarray(resnet.forward(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_param_name_order_matches_torch():
    """Positional surgery depends on insertion order parity with torch."""
    for depth in (18, 34, 50):
        net = TorchResNet(depth, torch.nn.InstanceNorm2d)
        torch_names = [k for k in net.state_dict().keys() if not k.startswith("fc")]
        cfg = ResNetConfig(depth=depth, norm="instance")
        assert resnet.param_names(cfg) == torch_names


def test_positional_load_matches_named(rng):
    """The popitem/zip surgery path must produce the identical params as
    name-based loading for an instance-norm checkpoint saved in order."""
    cfg = ResNetConfig(depth=18, norm="instance")
    net = TorchResNet(18, torch.nn.InstanceNorm2d).eval()
    sd = _torch_sd_to_numpy(net)
    named = resnet.load_torch_state_dict(sd, cfg)
    values = [v for k, v in sd.items() if not k.startswith("fc")]
    positional = resnet.load_positional(values, cfg)
    assert set(named) == set(positional)
    for k in named:
        np.testing.assert_array_equal(np.asarray(named[k]), np.asarray(positional[k]))


def test_positional_load_rejects_wrong_shape():
    cfg = ResNetConfig(depth=18, norm="instance")
    bad = [np.zeros((64, 3, 3, 3), np.float32)]  # conv1 must be 7x7
    with pytest.raises(ValueError):
        resnet.load_positional(bad, cfg)


def test_bf16_compute_close_to_f32(rng):
    """bf16-throughout is the throughput mode (+45% on v5e); features must
    stay strongly correlated with f32 (exact parity available via
    compute_dtype=f32)."""
    cfg32 = ResNetConfig(depth=18, norm="instance")
    cfg16 = ResNetConfig(depth=18, norm="instance", compute_dtype=jnp.bfloat16)
    import jax
    params = resnet.init_params(jax.random.PRNGKey(0), cfg32)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    f32 = np.asarray(resnet.forward(params, x, cfg32))
    bf16 = np.asarray(resnet.forward(params, x, cfg16))
    corr = np.corrcoef(f32.ravel(), bf16.ravel())[0, 1]
    assert corr > 0.98, f"bf16/f32 feature correlation too low: {corr}"
    assert np.max(np.abs(f32 - bf16)) / (np.max(np.abs(f32)) + 1e-9) < 0.35


def test_space_to_depth_stem_parity(rng):
    """The s2d stem rewrite must be numerically identical to the 7x7/s2
    conv (f32 noise only)."""
    cfg = ResNetConfig(depth=18, norm="instance")
    cfg_s2d = ResNetConfig(depth=18, norm="instance", space_to_depth=True)
    import jax
    params = resnet.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    a = np.asarray(resnet.forward(params, x, cfg))
    b = np.asarray(resnet.forward(params, x, cfg_s2d))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_precision_tier_plumbing(rng):
    """precision="high"/"highest" threads lax.Precision through every conv.
    On CPU (these tests) DEFAULT is already true f32, so outputs must be
    identical across tiers — this pins the plumbing; the TPU-side ladder
    (maxabs 1.4e-2 / 7e-5 / 3e-6 against the CPU oracle) is measured in
    docs/PERF.md 'Precision tiers'."""
    from tpumil.models.resnet import ResNetConfig
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    base = ResNetConfig(depth=18, norm="instance", compute_dtype=jnp.float32)
    params = resnet.init_params(jax.random.PRNGKey(0), base)
    f1 = resnet.forward(params, x, base)
    assert base.conv_precision is None
    for tier, lax_prec in (("high", jax.lax.Precision.HIGH),
                           ("highest", jax.lax.Precision.HIGHEST)):
        cfg = ResNetConfig(depth=18, norm="instance",
                           compute_dtype=jnp.float32, precision=tier)
        f2 = resnet.forward(params, x, cfg)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)
        assert cfg.conv_precision == lax_prec


def test_operand_dtype_plumbing(rng):
    """operand_dtype=bf16 with f32 accumulation must stay close to f32 on
    CPU (the exact TPU equivalence with DEFAULT-precision MXU rounding is
    pinned in test_tpu_numerics); None must be bit-identical to unset."""
    import jax

    base = ResNetConfig(depth=18, norm="instance")
    mixed = ResNetConfig(depth=18, norm="instance",
                         operand_dtype=jnp.bfloat16)
    params = resnet.init_params(jax.random.PRNGKey(0), base)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    a = np.asarray(resnet.forward(params, x, base))
    b = np.asarray(resnet.forward(params, x, mixed))
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98
    c = np.asarray(resnet.forward(
        params, x, ResNetConfig(depth=18, norm="instance",
                                operand_dtype=None)))
    np.testing.assert_array_equal(a, c)
