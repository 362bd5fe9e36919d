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
