"""True multi-process distributed training test (SURVEY.md §2.3 DCN story).

Two OS processes, each with 2 virtual CPU devices, coordinate through
``jax.distributed`` into one 4-device (data=2, inst=2) global mesh whose
data axis spans the process boundary. The sharded train step's gradient
psum therefore crosses processes — upgrading the multi-host claim from
"dryrun-compiles" to "collectives verified across process boundaries",
with losses pinned against a single-process 4-device oracle.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(stage: str, env_extra=None):
    """Launch the two ranks and return their LOSSES lines as {rank: values}.

    One retry on worker-process failure only: the coordinator handshake /
    barrier can time out under full-suite load on this single-core host
    (observed once in ~40 suite runs), and the freed port can be re-grabbed
    between _free_port() and the coordinator's bind. Numeric assertions
    happen in the caller and never retry — a deterministic regression still
    fails (twice, with the first failure printed)."""
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(worker)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra or {})
    last = None
    for attempt in range(2):
        coord = f"127.0.0.1:{_free_port()}"
        procs = [subprocess.Popen(
            [sys.executable, worker, str(r), "2", coord, stage],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for r in range(2)]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                outs = None
                partial = []
                for q in procs:
                    if q.returncode is None:  # not yet reaped this attempt
                        q.kill()
                        qo, qe = q.communicate()
                        partial.append(f"rank (killed after timeout)"
                                       f"\nstdout:{qo}\nstderr:{qe}")
                last = "distributed worker timed out\n" + "\n".join(partial)
                break
            outs.append((p.returncode, out, err))
        if outs is None or any(rc != 0 for rc, _, _ in outs):
            if outs is not None:
                last = "\n".join(f"rank rc={rc}\nstdout:{out}\nstderr:{err}"
                                 for rc, out, err in outs)
            if attempt == 0:
                print(f"worker failure on attempt 1, retrying:\n{last}")
            continue
        losses = {}
        for rc, out, err in outs:
            for line in out.splitlines():
                if line.startswith("LOSSES"):
                    _, rank, *vals = line.split()
                    losses[int(rank)] = [float(v) for v in vals]
        assert set(losses) == {0, 1}, outs
        return losses
    pytest.fail(f"distributed workers failed twice; last:\n{last}")


def _single_process_oracle():
    import jax
    import jax.numpy as jnp

    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.mesh import make_mesh
    from tpumil.parallel.sharded_train import device_put_batch, make_sharded_train_step

    cfg = DSMILConfig(feats_size=64, num_classes=2)
    mesh = make_mesh(4)  # same (2, 2) topology, all devices in-process
    step, optimizer = make_sharded_train_step(cfg, mesh)
    params = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    b, n = 8, 64
    feats = rng.standard_normal((b, n, cfg.feats_size)).astype(np.float32)
    mask = rng.random((b, n)) < 0.9
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=b)]
    gf, gm, gl = device_put_batch(mesh, feats, mask, labels)
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, gf, gm,
                                       jnp.asarray(gl), jnp.asarray(1e-3))
        losses.append(float(loss))
    return losses


def _simclr_oracle():
    """Single-process 4-device dp SimCLR trajectory (same code path as
    mp_worker._stage_simclr, all devices in-process)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpumil.models.simclr import SimCLRConfig
    from tpumil.train.simclr_trainer import SimCLRTrainConfig, SimCLRTrainer

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    b = 8
    tr = SimCLRTrainer(SimCLRConfig(compute_dtype=jnp.float32),
                       SimCLRTrainConfig(batch_size=b, input_size=32,
                                         lr=1e-3),
                       mesh=mesh)
    params, opt_state = tr.init(jax.random.PRNGKey(0))
    rep = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P("data", None, None, None))
    rng = np.random.default_rng(0)
    gi = jax.device_put(
        jnp.asarray(rng.random((b, 32, 32, 3)).astype(np.float32)), img_s)
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


def _feats_oracle():
    """Single-process 4-device dp embedder row sums."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpumil.models import resnet

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    rep = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P("data", None, None, None))
    cfg = resnet.ResNetConfig(depth=18, norm="instance")
    params = jax.device_put(
        resnet.init_params(jax.random.PRNGKey(1), cfg), rep)
    rng = np.random.default_rng(0)
    gi = jax.device_put(
        jnp.asarray(rng.random((8, 32, 32, 3)).astype(np.float32)), img_s)
    embed = jax.jit(lambda p, x: resnet.forward(p, x, cfg),
                    in_shardings=(rep, img_s),
                    out_shardings=NamedSharding(mesh, P("data", None)))
    feats = embed(params, gi)
    return [float(x) for x in np.asarray(jnp.sum(feats, axis=1))]


_ORACLES = {"agg": _single_process_oracle, "simclr": _simclr_oracle,
            "feats": _feats_oracle}


@pytest.mark.parametrize("stage", ["agg", "simclr", "feats"])
def test_two_process_distributed(stage):
    """Two OS processes x 2 virtual devices -> one 4-device mesh; per stage,
    the cross-process result must match both ranks and the single-process
    oracle. Covers all three scale-out pipelines (L4 agg / L1 SimCLR /
    L2 feature extraction — VERDICT r2 #9)."""
    losses = _run_workers(stage)
    # both processes observed the same replicated result
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # and it matches the single-process 4-device oracle
    oracle = _ORACLES[stage]()
    np.testing.assert_allclose(losses[0], oracle, rtol=1e-5, atol=1e-6)
    assert all(np.isfinite(oracle))


def test_distributed_checkpoint_restores_on_single_process(tmp_path):
    """Multi-host crash recovery end to end: two processes train on the
    cross-process (data, inst) mesh and SAVE the sharded train state (every
    process participates in the orbax write); THIS process — a different,
    single-process topology — restores it and takes the next step, which
    must continue the single-process oracle's exact trajectory (its step-3
    loss)."""
    import jax
    import jax.numpy as jnp

    from tpumil.io.native_ckpt import load_sharded_train_state
    from tpumil.models import dsmil
    from tpumil.models.dsmil import DSMILConfig
    from tpumil.parallel.mesh import make_mesh, replicated
    from tpumil.parallel.sharded_train import (device_put_batch,
                                               make_sharded_train_step)

    ckpt_dir = str(tmp_path / "dist_ckpt")
    vals = _run_workers("ckpt", env_extra={"MP_CKPT_DIR": ckpt_dir})
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    *worker_losses, worker_fp = vals[0]

    # restore on THIS process's 4-device mesh (different topology: one
    # process instead of two)
    cfg = DSMILConfig(feats_size=64, num_classes=2)
    mesh = make_mesh(4)
    step, optimizer = make_sharded_train_step(cfg, mesh)
    params_t = dsmil.init_params(jax.random.PRNGKey(0), cfg)
    st, meta = load_sharded_train_state(
        ckpt_dir, {"params": params_t, "opt_state": optimizer.init(params_t)},
        sharding=replicated(mesh))
    assert meta["step"] == 2
    fp = float(sum(float(jnp.sum(x)) for x in jax.tree.leaves(st["params"])))
    np.testing.assert_allclose(fp, worker_fp, rtol=1e-6)

    # the restored state's next step continues the single-process oracle's
    # trajectory: its loss must be the oracle's step-3 loss
    oracle = _single_process_oracle()
    np.testing.assert_allclose(worker_losses, oracle[:2], rtol=1e-5)
    rng = np.random.default_rng(0)
    b, n = 8, 64
    feats = rng.standard_normal((b, n, cfg.feats_size)).astype(np.float32)
    mask = rng.random((b, n)) < 0.9
    labels = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=b)]
    gf, gm, gl = device_put_batch(mesh, feats, mask, labels)
    _, _, loss3 = step(st["params"], st["opt_state"], gf, gm,
                       jnp.asarray(gl), jnp.asarray(1e-3))
    np.testing.assert_allclose(float(loss3), oracle[2], rtol=1e-5, atol=1e-6)
