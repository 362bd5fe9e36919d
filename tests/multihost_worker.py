"""Worker for the 2-process jax.distributed multi-host simulation test.

Each process owns 2 virtual CPU devices (4 global). The worker initializes the
multi-host runtime, builds the global dp mesh, assembles its HOST-LOCAL half
of a deterministic global batch via host_local_batch_to_global, runs ONE
jitted SPMD train step (detection loss fwd + grad + SGD update) on tinydet,
and prints the resulting loss and a param checksum. The parent test compares
both workers' output against a single-process run of the identical step
(tests/test_parallel.py::test_two_process_multihost_train_step).

Usage: python multihost_worker.py <coordinator_port> <process_id>
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import numpy as np

from multihost_step import GLOBAL_BATCH, make_step_fn, param_checksum
from sar_yolo_tpu.parallel.mesh import get_global_mesh, host_local_batch_to_global

assert jax.process_count() == 2 and jax.device_count() == 4

mesh = get_global_mesh(axis_names=("dp",), tp=1)
step = make_step_fn(mesh)

batch = GLOBAL_BATCH()
half = batch["img"].shape[0] // 2
local = {k: v[pid * half:(pid + 1) * half] for k, v in batch.items()}
gbatch = host_local_batch_to_global(mesh, local)

loss, params = step(gbatch)
print(f"RESULT {float(loss):.10f} {param_checksum(params):.8f}", flush=True)
