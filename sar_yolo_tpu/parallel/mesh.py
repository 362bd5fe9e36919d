"""Device mesh + sharding helpers — the SPMD replacement for the reference's DDP.

The reference scales with a torch.distributed.run subprocess re-exec + NCCL
DDP (reference engine/trainer.py:170-229, utils/dist.py:25-66). Here the whole
train step is a single jitted SPMD program over a jax.sharding.Mesh:

  * batch dim sharded over the 'dp' axis (NamedSharding) — gradient all-reduce
    is inserted by XLA automatically (rides ICI, no NCCL, no subprocess),
  * params/opt-state replicated,
  * the mesh keeps extra axes available ('tp', ...) so tensor/pipeline
    parallelism can be added without redesign (reference has none — §2.7).

BatchNorm batch statistics are computed over the *global* batch: the mean
reductions inside the jit cross the sharded axis, so XLA emits the cross-replica
psum — equivalent to SyncBN for free.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(mesh_shape=None, axis_names=("dp",), devices=None) -> Mesh:
    """Build a device mesh. Default: 1-D data-parallel mesh over all local devices."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_shape = tuple(int(s) for s in mesh_shape)
    n = int(np.prod(mesh_shape))
    if n > len(devices):
        raise ValueError(f"mesh_shape {mesh_shape} needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def shard_batch(mesh: Mesh, batch: dict, axis: str = "dp") -> dict:
    """Place a host batch dict onto the mesh, sharding dim 0 over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Multi-host SPMD (replaces reference utils/dist.py:25-66 subprocess DDP
# launcher + data/build.py:135-153 DistributedSampler).
# ---------------------------------------------------------------------------

def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize JAX multi-host runtime (one process per host).

    On Cloud TPU pods the arguments auto-detect from the metadata server, so
    plain ``init_distributed()`` works; elsewhere pass them or set the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    No-op when already initialized or when single-process (num_processes in
    (None, 1) and no coordinator configured).
    """
    import os
    if jax.process_count() > 1:  # already initialized
        return
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    env_tpu = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None and not env_tpu:
        return  # single-process run — nothing to do
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)


def get_global_mesh(axis_names=("dp", "tp"), tp=1, allow_split_physical_axes=False) -> Mesh:
    """Device mesh spanning ALL processes, laid out so the dp axis crosses
    DCN (slices/hosts) on its leading dimension and tp stays inside a slice
    on ICI — collectives for gradient reduction ride ICI first, DCN only for
    the inter-slice partial sums.
    """
    from jax.experimental import mesh_utils

    n = jax.device_count()
    if n % tp:
        raise ValueError(f"tp={tp} does not divide device_count={n}")
    # 1-D dp-only mesh when a single axis name is given (tp must be 1)
    one_d = len(axis_names) == 1
    if one_d and tp != 1:
        raise ValueError(f"tp={tp} needs a second mesh axis name")
    shape = (n,) if one_d else (n // tp, tp)
    try:
        # contiguous_submeshes keeps each host's devices adjacent along dp
        dev = mesh_utils.create_device_mesh(
            shape, allow_split_physical_axes=allow_split_physical_axes)
    except Exception:
        dev = np.array(jax.devices()).reshape(shape)
    return Mesh(dev, axis_names if one_d else axis_names[:2])


def process_shard(n_samples: int, shuffle_seed=None):
    """Index range owned by this process — the per-host data-sharding
    replacement for the reference's DistributedSampler. Pads by wrap-around so
    every process yields the same count (keeps jitted step shapes static)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = -(-n_samples // pc)  # ceil
    idx = np.arange(n_samples)
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(idx)
    idx = np.concatenate([idx, idx[: per * pc - n_samples]])
    return idx[pi * per: (pi + 1) * per]


def host_local_batch_to_global(mesh: Mesh, batch: dict, axis: str = "dp") -> dict:
    """Assemble per-host batch shards into one global jax.Array per leaf.

    Single-process: identical to shard_batch. Multi-process: each host
    contributes its local shard via make_array_from_process_local_data.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch, axis)
    from jax import make_array_from_process_local_data
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        return make_array_from_process_local_data(NamedSharding(mesh, spec), np.asarray(x))
    return jax.tree.map(put, batch)


def sync_flag(value: bool, mesh: Mesh = None) -> bool:
    """All-reduce a boolean across every device/process (max) — the SPMD
    replacement for the reference's dist.broadcast_object_list stop-flag
    (reference engine/trainer.py:459-462). Any rank voting True wins."""
    if jax.process_count() == 1 and (mesh is None or mesh.size == 1):
        return bool(value)
    arr = jnp_ones_like_flag(value)
    return bool(jax.jit(lambda x: x.max(), out_shardings=None)(arr))


def jnp_ones_like_flag(value: bool):
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    x = jnp.asarray([1.0 if value else 0.0])
    if jax.process_count() > 1:
        x = multihost_utils.process_allgather(x)
    return x
