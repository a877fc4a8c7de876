"""SimCLR stack tests: NT-Xent parity with a torch re-derivation of the
reference loss, on-device augmentations, short end-to-end pretraining with
checkpoint surgery round-trip."""

import glob
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpumil.ops.nt_xent import nt_xent_loss
from tpumil.ops.augment import augment_pair_batch
from tpumil.models import simclr as simclr_model
from tpumil.models.simclr import SimCLRConfig


def torch_nt_xent(zis, zjs, temperature, cosine=True):
    """Oracle re-derivation of the reference loss semantics
    (nt_xent.py:47-65): logits = [positive | 2N-2 negatives], CE to label 0,
    sum / 2N."""
    torch = pytest.importorskip("torch")
    zis_t = torch.from_numpy(zis)
    zjs_t = torch.from_numpy(zjs)
    n = zis_t.shape[0]
    reps = torch.cat([zjs_t, zis_t], dim=0)
    if cosine:
        reps_n = torch.nn.functional.normalize(reps, dim=1)
        sim = reps_n @ reps_n.T
    else:
        sim = reps @ reps.T
    l_pos = torch.diag(sim, n)
    r_pos = torch.diag(sim, -n)
    positives = torch.cat([l_pos, r_pos]).view(2 * n, 1)
    mask = ~(torch.eye(2 * n, dtype=torch.bool)
             | torch.diag(torch.ones(n, dtype=torch.bool), n)[:2 * n, :2 * n]
             | torch.diag(torch.ones(n, dtype=torch.bool), -n)[:2 * n, :2 * n])
    negatives = sim[mask].view(2 * n, -1)
    logits = torch.cat([positives, negatives], dim=1) / temperature
    labels = torch.zeros(2 * n, dtype=torch.long)
    return float(torch.nn.functional.cross_entropy(logits, labels, reduction="sum")
                 / (2 * n))


@pytest.mark.parametrize("cosine", [True, False])
def test_nt_xent_matches_reference_semantics(rng, cosine):
    n, d = 16, 8
    zis = rng.standard_normal((n, d)).astype(np.float32)
    zjs = rng.standard_normal((n, d)).astype(np.float32)
    got = float(nt_xent_loss(jnp.asarray(zis), jnp.asarray(zjs), 0.5, cosine))
    want = torch_nt_xent(zis, zjs, 0.5, cosine)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nt_xent_perfect_alignment_is_low(rng):
    z = rng.standard_normal((8, 16)).astype(np.float32)
    aligned = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z), 0.1))
    shuffled = float(nt_xent_loss(jnp.asarray(z), jnp.asarray(z[::-1].copy()), 0.1))
    assert aligned < shuffled


def test_augment_pair_batch(rng):
    imgs = jnp.asarray(rng.random((4, 48, 48, 3)).astype(np.float32))
    v1, v2 = augment_pair_batch(jax.random.PRNGKey(0), imgs, 32)
    assert v1.shape == v2.shape == (4, 32, 32, 3)
    assert float(v1.min()) >= 0.0 and float(v1.max()) <= 1.0
    assert not np.allclose(np.asarray(v1), np.asarray(v2))  # independent views
    # deterministic per key
    v1b, _ = augment_pair_batch(jax.random.PRNGKey(0), imgs, 32)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v1b), atol=1e-6)


def test_simclr_forward_and_export_roundtrip(rng):
    cfg = SimCLRConfig(compute_dtype=jnp.float32)
    params = simclr_model.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    h, z = simclr_model.forward(params, x, cfg)
    assert h.shape == (2, 512) and z.shape == (2, 256)
    sd = simclr_model.export_state_dict(params, cfg)
    assert list(sd)[-4:] == ["l1.weight", "l1.bias", "l2.weight", "l2.bias"]
    params2 = simclr_model.load_state_dict(sd, cfg)
    h2, z2 = simclr_model.forward(params2, x, cfg)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)


def test_simclr_training_end_to_end(tmp_path, rng):
    """Short pretraining on tiny synthetic patches; checkpoint must feed the
    embedder surgery."""
    from PIL import Image

    from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

    paths = []
    for i in range(24):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"p{i}.jpeg")
        Image.fromarray(arr).save(p)
        paths.append(p)

    model_cfg = SimCLRConfig(compute_dtype=jnp.float32)
    train_cfg = SimCLRTrainConfig(batch_size=8, epochs=2, input_size=64,
                                  num_workers=2, lr=1e-4, log_every_n_steps=100)
    trainer = SimCLRTrainer(model_cfg, train_cfg)
    out = trainer.fit(paths, str(tmp_path / "run"), log=lambda s: None)
    assert np.isfinite(out["best_valid_loss"])
    ckpt = out["checkpoint"]
    assert os.path.exists(ckpt)

    # the exported .pth must load through the embedder surgery
    from tpumil.models import embedder
    from tpumil.models.embedder import EmbedderConfig

    emb_cfg = EmbedderConfig(num_classes=1, compute_dtype=jnp.float32)
    emb_params = embedder.load_simclr_checkpoint(ckpt, emb_cfg)
    feats, _ = embedder.forward(
        emb_params, jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32)),
        emb_cfg)
    assert feats.shape == (2, 512)
    # surgery and direct restore must agree on the backbone (the checkpoint
    # holds best-validation params, which may differ from the final ones)
    from tpumil.io import torch_ckpt

    restored = simclr_model.load_state_dict(
        torch_ckpt.load_state_dict(ckpt), model_cfg)
    np.testing.assert_allclose(
        np.asarray(emb_params["backbone"]["conv1.weight"]),
        np.asarray(restored["backbone"]["conv1.weight"]), atol=1e-6)


def test_simclr_data_parallel_mesh(rng):
    """Batch sharded over a 4-device CPU mesh: one step runs and matches the
    unsharded loss."""
    from jax.sharding import Mesh

    from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    model_cfg = SimCLRConfig(compute_dtype=jnp.float32)
    train_cfg = SimCLRTrainConfig(batch_size=8, input_size=64)
    tr_sharded = SimCLRTrainer(model_cfg, train_cfg, mesh=mesh)
    tr_single = SimCLRTrainer(model_cfg, train_cfg)
    params, opt_state = tr_single.init(jax.random.PRNGKey(0))
    params_s, opt_state_s = tr_sharded.init(jax.random.PRNGKey(0))
    images = jnp.asarray(rng.random((8, 64, 64, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)
    lr = jnp.asarray(1e-4)
    p1, _, loss1 = tr_single._train_step(params, opt_state, key, images, lr)
    p2, _, loss2 = tr_sharded._train_step(params_s, opt_state_s, key, images, lr)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
