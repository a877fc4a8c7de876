"""Device mesh construction and sharding specs.

The reference has no distributed backend at all (SURVEY.md section 2.3); its
only parallelism is single-process ``nn.DataParallel``. The TPU-native design
scales through a 2-D ``jax.sharding.Mesh``:

  * ``data`` axis — bags (data parallel): each chip owns a slice of the bag
    batch; gradients are summed by XLA.
  * ``inst`` axis — instances within a bag (sequence parallel): a giant
    Camelyon16 bag (O(10^4) patches, SURVEY.md section 5) is sharded along N;
    the masked argmax, the softmax over N, and A^T V become cross-chip
    reductions which XLA/GSPMD lowers onto ICI collectives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
INST_AXIS = "inst"


def take_devices(n: int):
    """The first ``n`` devices, failing LOUDLY when fewer exist — a silent
    ``jax.devices()[:n]`` would run the job on fewer chips than the user
    asked for (e.g. --inst_shard 8 on a 4-chip host quietly becoming a
    4-way run)."""
    if n < 0:
        # devices[:-1] would silently build a mesh over the WRONG count
        raise ValueError(f"device count must be non-negative, got {n}")
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"requested {n} devices but only {len(devices)} are available "
            f"({[str(d) for d in devices]})")
    return devices[:n]


def make_mesh(n_devices: Optional[int] = None,
              inst_parallel: Optional[int] = None) -> Mesh:
    """Build a (data, inst) mesh over the first ``n_devices`` devices.

    ``inst_parallel`` chips cooperate on each bag's instance axis; the rest
    of the devices form the data axis. Default: inst=2 when the device count
    is even and >1, else 1.
    """
    devices = jax.devices() if n_devices is None else take_devices(n_devices)
    n = len(devices)
    if inst_parallel is None:
        inst_parallel = 2 if n % 2 == 0 and n > 1 else 1
    if n % inst_parallel != 0:
        raise ValueError(f"{n} devices not divisible by inst_parallel={inst_parallel}")
    grid = np.asarray(devices).reshape(n // inst_parallel, inst_parallel)
    return Mesh(grid, (DATA_AXIS, INST_AXIS))


def data_parallel_mesh(n: Optional[int], what: str = "extraction") -> Optional[Mesh]:
    """``--data_parallel N`` handling shared by every feats/inference CLI
    (compute_feats, slide_feats, attention_map, testing_*, serve, pipeline):
    a 1-wide-inst mesh over the first N devices, or None when N is 0/None
    (single-device path). Negative N is rejected loudly — ``devices[:n]``
    slicing would otherwise silently run on the wrong device count."""
    if not n:
        return None
    if n < 0:
        raise ValueError(f"--data_parallel must be >= 0, got {n}")
    print(f"data-parallel {what} over {n} devices")
    return make_mesh(n, inst_parallel=1)


def bag_batch_sharding(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding, NamedSharding]:
    """(feats [B,N,K], mask [B,N], labels [B,C]) shardings: bags over the
    data axis, instances over the inst axis, features/classes replicated."""
    return (
        NamedSharding(mesh, P(DATA_AXIS, INST_AXIS, None)),
        NamedSharding(mesh, P(DATA_AXIS, INST_AXIS)),
        NamedSharding(mesh, P(DATA_AXIS, None)),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_batch_sharded_jit(mesh: Mesh, batch_size: int, fwd):
    """jit an embedder-style ``fwd(params, batch)`` with the batch sharded
    over EVERY mesh axis (params replicated) — the TPU-native replacement for
    the reference's process-placement scale-out of feature extraction
    (compute_feats.py:143-144 ``CUDA_VISIBLE_DEVICES``).

    The [B, ...] batch's leading dim shards over all axes flattened, so a
    (data=4, inst=2) mesh puts B/8 rows on each of the 8 chips — no axis
    replicates compute. ``fwd`` must return a tuple of [B, ...] arrays
    (each comes back sharded the same way).

    Returns ``(jitted_fwd, put_params, n_shard)``: call ``put_params`` once
    on the replicated params, and keep batch leading dims divisible by
    ``n_shard`` (= total device count of the mesh).
    """
    axes = tuple(mesh.axis_names)
    n_shard = int(mesh.devices.size)
    if batch_size % n_shard:
        raise ValueError(
            f"batch_size {batch_size} must divide by the mesh's device "
            f"count ({'x'.join(map(str, mesh.devices.shape))}={n_shard})")
    rep = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(axes, None, None, None))
    out_sh = NamedSharding(mesh, P(axes, None))
    jitted = jax.jit(fwd, in_shardings=(rep, img_sh),
                     out_shardings=(out_sh, out_sh))
    put_params = lambda p: jax.device_put(p, rep)
    return jitted, put_params, n_shard


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization (jax.distributed). On single-host TPU VMs
    and in tests this is a no-op; on a pod slice the TPU runtime autodetects
    everything, so bare ``init_distributed()`` suffices. The reference has no
    distributed backend at all (SURVEY.md section 2.3)."""
    import jax

    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except ValueError as e:
        # ValueError = no cluster config detected: benign ONLY for the bare
        # call. If the caller explicitly described a cluster (any of the
        # three args), swallowing would silently degrade an intended
        # multi-process run into N independent single-host trainings.
        if (coordinator_address is not None or num_processes is not None
                or process_id is not None):
            raise
    except RuntimeError as e:
        # genuine coordination failures must NOT silently degrade a pod run
        # to N independent single-host trainings
        if "already" not in str(e).lower():
            raise


def make_hybrid_mesh(ici_shape: Tuple[int, int], dcn_data: int = 1) -> Mesh:
    """Multi-slice mesh: (data, inst) within each ICI-connected slice,
    replicated data-parallel groups across DCN. Collectives for the instance
    axis stay on ICI; only gradient sums cross DCN — the layout rule of the
    scaling-book recipe."""
    import jax
    from jax.experimental import mesh_utils

    if dcn_data == 1:
        devices = np.asarray(jax.devices()[:ici_shape[0] * ici_shape[1]])
        return Mesh(devices.reshape(ici_shape), (DATA_AXIS, INST_AXIS))
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=ici_shape, dcn_mesh_shape=(dcn_data, 1))
    return Mesh(grid, (DATA_AXIS, INST_AXIS))
