"""Worker for the multi-process distributed tests (tests/test_multiprocess.py).

Each of two processes owns 2 virtual CPU devices; together they form a
4-device global mesh whose data axis spans the process (DCN-like) boundary
— so the collectives really cross processes, which is exactly the
multi-host claim the single-process dryrun cannot test. Three stages cover
the three scale-out pipelines (SURVEY.md L4/L1/L2):

  agg     — sharded DSMIL aggregator training ((data=2, inst=2) mesh,
            gradient psum across processes)
  simclr  — data-parallel SimCLR pretraining step (NT-Xent over the global
            batch: the (2N)^2 similarity needs cross-process all-gather)
  feats   — data-parallel feature extraction (embedder batch sharded over
            the data axis)
"""

import os
import sys


def _stage_agg(jax, rank, nproc):
    import jax.numpy as jnp
    import numpy as np

    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.mesh import bag_batch_sharding, make_mesh, replicated
    from tpumil.parallel.sharded_train import make_sharded_train_step

    cfg = DSMILConfig(feats_size=64, num_classes=2)
    mesh = make_mesh(2 * nproc)  # (data=nproc, inst=2): data crosses hosts
    step, optimizer = make_sharded_train_step(cfg, mesh)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    b, n = 8, 64
    feats = rng.standard_normal((b, n, cfg.feats_size)).astype(np.float32)
    mask = rng.random((b, n)) < 0.9
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=b)]

    fs, ms, ls = bag_batch_sharding(mesh)
    local = slice(rank * b // nproc, (rank + 1) * b // nproc)
    gf = jax.make_array_from_process_local_data(fs, feats[local])
    gm = jax.make_array_from_process_local_data(ms, mask[local])
    gl = jax.make_array_from_process_local_data(ls, labels[local])
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, gf, gm, gl,
                                       jnp.asarray(1e-3))
        losses.append(float(loss))
    return losses


def _stage_simclr(jax, rank, nproc):
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpumil.models.simclr import SimCLRConfig
    from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

    n_dev = 2 * nproc
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    b = 8
    tr = SimCLRTrainer(SimCLRConfig(compute_dtype=jnp.float32),
                       SimCLRTrainConfig(batch_size=b, input_size=32,
                                         lr=1e-3),
                       mesh=mesh)
    params, opt_state = tr.init(jax.random.PRNGKey(0))
    rep = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P("data", None, None, None))
    rng = np.random.default_rng(0)
    images = rng.random((b, 32, 32, 3)).astype(np.float32)
    local = slice(rank * b // nproc, (rank + 1) * b // nproc)
    gi = jax.make_array_from_process_local_data(img_s, images[local])
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(3):
        sub = jax.random.fold_in(key, i)
        params, opt_state, loss = tr._train_step(params, opt_state, sub, gi,
                                                 jnp.asarray(1e-3))
        losses.append(float(loss))
    return losses


def _stage_feats(jax, rank, nproc):
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpumil.models import resnet

    n_dev = 2 * nproc
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("data",))
    rep = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P("data", None, None, None))
    cfg = resnet.ResNetConfig(depth=18, norm="instance")
    params = jax.device_put(
        resnet.init_params(jax.random.PRNGKey(1), cfg), rep)
    rng = np.random.default_rng(0)
    b = 8
    images = rng.random((b, 32, 32, 3)).astype(np.float32)
    local = slice(rank * b // nproc, (rank + 1) * b // nproc)
    gi = jax.make_array_from_process_local_data(img_s, images[local])
    embed = jax.jit(lambda p, x: resnet.forward(p, x, cfg),
                    in_shardings=(rep, img_s),
                    out_shardings=NamedSharding(mesh, P("data", None)))
    feats = embed(params, gi)
    # per-row sums are rank-independent fingerprints of the global result
    row_sums = jax.jit(lambda f: jnp.sum(f, axis=1),
                       out_shardings=rep)(feats)
    return [float(x) for x in np.asarray(row_sums)]


def _stage_ckpt(jax, rank, nproc):
    """Distributed checkpoint: train on the cross-process (data, inst) mesh,
    then SAVE the sharded train state with every process participating
    (orbax multihost write). The test process restores it AFTERWARDS on a
    different, single-process topology and continues training — the
    multi-host crash-recovery story end to end. Returns the losses plus a
    params fingerprint the restore is checked against."""
    import jax.numpy as jnp
    import numpy as np

    from tpumil.io.native_ckpt import save_sharded_train_state
    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.mesh import bag_batch_sharding, make_mesh, replicated
    from tpumil.parallel.sharded_train import make_sharded_train_step

    cfg = DSMILConfig(feats_size=64, num_classes=2)
    mesh = make_mesh(2 * nproc)
    step, optimizer = make_sharded_train_step(cfg, mesh)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    b, n = 8, 64
    feats = rng.standard_normal((b, n, cfg.feats_size)).astype(np.float32)
    mask = rng.random((b, n)) < 0.9
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=b)]

    fs, ms, ls = bag_batch_sharding(mesh)
    local = slice(rank * b // nproc, (rank + 1) * b // nproc)
    gf = jax.make_array_from_process_local_data(fs, feats[local])
    gm = jax.make_array_from_process_local_data(ms, mask[local])
    gl = jax.make_array_from_process_local_data(ls, labels[local])
    params = jax.device_put(params, replicated(mesh))
    opt_state = jax.device_put(opt_state, replicated(mesh))

    losses = []
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, gf, gm, gl,
                                       jnp.asarray(1e-3))
        losses.append(float(loss))
    save_sharded_train_state(
        os.environ["MP_CKPT_DIR"],
        {"params": params, "opt_state": opt_state},
        meta={"step": 2})
    # rank-independent fingerprint of the saved params (replicated arrays
    # are fully addressable on every process)
    fp = float(sum(float(jnp.sum(x)) for x in jax.tree.leaves(params)))
    return losses + [fp]


def main():
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    stage = sys.argv[4] if len(sys.argv) > 4 else "agg"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpumil.parallel.mesh import init_distributed
    from tpumil.utils.platform import enable_compilation_cache

    # Share the suite's persistent XLA cache: the SimCLR stage compiles a
    # full ResNet fwd+bwd per rank, which on this single-core host is the
    # dominant cost — warm runs skip it entirely.
    enable_compilation_cache()

    init_distributed(coordinator_address=coord, num_processes=nproc,
                     process_id=rank)
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

    values = {"agg": _stage_agg, "simclr": _stage_simclr,
              "feats": _stage_feats, "ckpt": _stage_ckpt}[stage](jax, rank,
                                                                 nproc)
    print("LOSSES", rank, " ".join(f"{x:.8f}" for x in values), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
