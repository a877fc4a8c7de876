"""Worker for the multi-process distributed test (tests/test_multiprocess.py).

Each of two processes owns 2 virtual CPU devices; together they form the
4-device (data=2, inst=2) global mesh, with the data axis spanning the
process (DCN-like) boundary — so the gradient psum in the sharded train
step really crosses processes, which is exactly the multi-host claim the
dryrun alone cannot test.
"""

import os
import sys


def main():
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tpumil.parallel.mesh import init_distributed

    init_distributed(coordinator_address=coord, num_processes=nproc,
                     process_id=rank)
    import jax.numpy as jnp
    import numpy as np

    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.mesh import bag_batch_sharding, make_mesh, replicated
    from tpumil.parallel.sharded_train import make_sharded_train_step

    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

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
    print("LOSSES", rank, " ".join(f"{x:.8f}" for x in losses), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
