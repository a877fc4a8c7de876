"""Checkpoint I/O tests: .pth round-trip and golden-file loading of the
shipped example aggregator weights (tier 2 of SURVEY.md section 4)."""

import collections
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.models import dsmil
from tpumil.models.dsmil import DSMILConfig
from tpumil.io import torch_ckpt

from conftest import REFERENCE_DIR, reference_available

C16_WEIGHTS = os.path.join(REFERENCE_DIR, "example_aggregator_weights", "c16_aggregator.pth")
TCGA_WEIGHTS = os.path.join(REFERENCE_DIR, "example_aggregator_weights", "tcga_aggregator.pth")


def test_aggregator_roundtrip(tmp_path, rng):
    cfg = DSMILConfig(feats_size=32, num_classes=2)
    params = dsmil.init_params(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path / "agg.pth")
    torch_ckpt.save_aggregator_pth(params, path)
    loaded, cfg2 = torch_ckpt.load_aggregator_pth(path)
    assert cfg2 == cfg
    for leaf_a, leaf_b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b), atol=0)

    feats = rng.standard_normal((11, cfg.feats_size)).astype(np.float32)
    _, bag_a, _, _ = dsmil.forward(params, jnp.asarray(feats))
    _, bag_b, _, _ = dsmil.forward(loaded, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(bag_a), np.asarray(bag_b), atol=0)


@pytest.mark.skipif(not os.path.exists(C16_WEIGHTS), reason="shipped weights unavailable")
def test_load_shipped_c16_weights():
    params, cfg = torch_ckpt.load_aggregator_pth(C16_WEIGHTS)
    assert cfg.num_classes == 1 and cfg.feats_size == 512
    assert cfg.nonlinear and not cfg.passing_v


@pytest.mark.skipif(not os.path.exists(TCGA_WEIGHTS), reason="shipped weights unavailable")
def test_shipped_tcga_weights_logit_parity(rng):
    """Golden test: identical bag logits/attention between the torch reference
    and tpumil when both load the shipped TCGA aggregator weights."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import dsmil as ref_mil
    finally:
        sys.path.remove(REFERENCE_DIR)

    params, cfg = torch_ckpt.load_aggregator_pth(TCGA_WEIGHTS)
    assert cfg.num_classes == 2 and cfg.feats_size == 512

    i_cls = ref_mil.FCLayer(in_size=512, out_size=2)
    b_cls = ref_mil.BClassifier(input_size=512, output_class=2)
    net = ref_mil.MILNet(i_cls, b_cls)
    net.load_state_dict(torch.load(TCGA_WEIGHTS, map_location="cpu", weights_only=True), strict=True)
    net.eval()

    feats = rng.standard_normal((257, 512)).astype(np.float32)
    with torch.no_grad():
        ref_c, ref_bag, ref_A, _ = net(torch.from_numpy(feats))
    c, bag, A, _ = dsmil.forward(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(bag)[None], ref_bag.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(A), ref_A.numpy(), rtol=1e-4, atol=1e-5)


def test_positional_zip_surgery():
    """The popitem-x4 + positional-zip idiom (compute_feats.py:182-207)."""
    import collections
    sd = collections.OrderedDict(
        [("features.0.weight", np.ones((2, 2))), ("features.1.weight", np.full((3,), 2.0)),
         ("l1.weight", np.zeros(1)), ("l1.bias", np.zeros(1)),
         ("l2.weight", np.zeros(1)), ("l2.bias", np.zeros(1))]
    )
    stripped = torch_ckpt.strip_projection_head(sd)
    assert list(stripped) == ["features.0.weight", "features.1.weight"]
    out = torch_ckpt.positional_zip(stripped, ["conv1.weight", "conv2.weight", "fc.weight", "fc.bias"])
    assert list(out) == ["conv1.weight", "conv2.weight"]
    np.testing.assert_array_equal(out["conv1.weight"], np.ones((2, 2)))


def test_torchvision_bn_checkpoint_routes_to_name_based_loader(tmp_path, rng):
    """A torchvision-style batch-norm checkpoint interleaves
    num_batches_tracked entries that the positional zip cannot express
    (it would assign a 0-d counter onto a conv kernel and crash); such
    checkpoints must route to the name-based loader — the compute_feats
    '--norm_layer batch --weights <imagenet.pth>' path."""
    import torch

    from tpumil.models import embedder, resnet
    from tpumil.models.embedder import EmbedderConfig

    cfg = EmbedderConfig(backbone="resnet18", norm="batch", num_classes=1,
                         compute_dtype=jnp.float32)
    rcfg = cfg.resnet_cfg
    sd = collections.OrderedDict()
    torch_rng = np.random.default_rng(0)
    conv_names = {n for n, _, _ in resnet.conv_specs(rcfg)}
    shapes = {n: s for n, s, _ in resnet.conv_specs(rcfg)}
    for name in resnet.param_names(rcfg):
        if name in conv_names:
            h, w, i, o = shapes[name]
            sd[name] = torch.tensor(
                torch_rng.standard_normal((o, i, h, w)).astype(np.float32))
        else:
            # bn weight/bias/running_mean/running_var take the conv's out ch
            conv = [c for c in conv_names
                    if resnet._norm_name_for(c) == name.rsplit(".", 1)[0]]
            out_ch = shapes[conv[0]][3]
            base = np.ones if name.endswith(("weight", "running_var")) \
                else np.zeros
            sd[name] = torch.tensor(base((out_ch,), dtype=np.float32))
            if name.endswith("running_var"):
                # after each BN group, torchvision appends the counter the
                # positional order chokes on
                sd[name.replace("running_var", "num_batches_tracked")] = \
                    torch.tensor(7)
    path = str(tmp_path / "imagenet_style.pth")
    torch.save(sd, path)

    params = embedder.load_simclr_checkpoint(path, cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    feats, _ = embedder.forward(params, x, cfg)
    assert np.all(np.isfinite(np.asarray(feats)))
    # parity with the direct name-based loader
    ref = resnet.load_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()
         if not k.endswith("num_batches_tracked")}, rcfg)
    f2 = resnet.forward(ref, x, rcfg)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(f2), atol=1e-6)


def test_load_simclr_checkpoint_rejects_odd_surplus(tmp_path, rng):
    """A checkpoint whose tensor count is neither exactly the backbone nor
    backbone+4 must error at load (a blind 4-strip would silently discard
    backbone convs)."""
    import torch

    from tpumil.models import embedder, resnet
    from tpumil.models.embedder import EmbedderConfig

    cfg = EmbedderConfig(backbone="resnet18", norm="instance", num_classes=1,
                         compute_dtype=jnp.float32)
    shapes = {n: s for n, s, _ in resnet.conv_specs(cfg.resnet_cfg)}
    sd = collections.OrderedDict(
        (n, torch.tensor(np.zeros((s[3], s[2], s[0], s[1]), np.float32)))
        for n, s in shapes.items())
    sd["fc.weight"] = torch.tensor(np.zeros((1, 512), np.float32))
    sd["fc.bias"] = torch.tensor(np.zeros((1,), np.float32))  # surplus 2
    path = str(tmp_path / "iclassifier.pth")
    torch.save(sd, path)
    with pytest.raises(ValueError, match="tensors"):
        embedder.load_simclr_checkpoint(path, cfg)
