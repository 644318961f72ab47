"""Worker for the two-process multi-host test (tools/test via pytest).

Each process owns 4 virtual CPU devices; jax.distributed.initialize forms
an 8-device global mesh across the process boundary (the DCN analog).
Runs the landmark-sharded distributed BA (parallel/dist_ba.py) on a
deterministic synthetic problem and process 0 writes the final cost for
the parent to check.

Usage: python tools/multihost_worker.py <process_id> <num_processes> <out>
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
out_path = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:9873",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ethzasl_brisk_tpu.ba import BaProblem
from ethzasl_brisk_tpu.parallel import make_mesh
from ethzasl_brisk_tpu.parallel.dist_ba import (
    partition_problem,
    solve_window_ba_sharded,
)

devices = jax.devices()
assert len(devices) == 4 * nproc, devices
mesh = make_mesh(1, len(devices))

# Deterministic synthetic problem (same on every process).
rng = np.random.default_rng(11)
k_pose, n_lm = 5, 64
pts = rng.uniform([-2, -2, 4], [2, 2, 9], (n_lm, 3))
t_cam = np.stack([np.linspace(0, 0.8, k_pose), np.zeros(k_pose),
                  np.zeros(k_pose)], 1)
kf = np.repeat(np.arange(k_pose), n_lm)
lm = np.tile(np.arange(n_lm), k_pose)
x_c = pts[lm] - t_cam[kf]
uv = np.stack([300.0 * x_c[:, 0] / x_c[:, 2] + 160,
               300.0 * x_c[:, 1] / x_c[:, 2] + 120], 1)
f32 = jnp.float32
prob = BaProblem(
    r=jnp.broadcast_to(jnp.eye(3, dtype=f32), (k_pose, 3, 3)),
    t=jnp.asarray(-t_cam + rng.normal(0, 0.01, t_cam.shape)
                  * (np.arange(k_pose) > 0)[:, None], f32),
    points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape), f32),
    kf_idx=jnp.asarray(kf, jnp.int32),
    lm_idx=jnp.asarray(lm, jnp.int32),
    uv=jnp.asarray(uv, f32),
    valid=jnp.ones((len(kf),), bool),
    fu=f32(300.0), fv=f32(300.0), cu=f32(160.0), cv=f32(120.0),
)
sharded = partition_problem(prob, len(devices))

# Shard global arrays across the multi-process mesh.
from jax.sharding import NamedSharding, PartitionSpec as P

def put(x, spec):
    return jax.make_array_from_callback(
        x.shape,
        NamedSharding(mesh, spec),
        lambda idx: np.asarray(x)[idx],
    )

import dataclasses
sharded = dataclasses.replace(
    sharded,
    points=put(sharded.points, P("model", None)),
    kf_idx=put(sharded.kf_idx, P("model")),
    lm_idx=put(sharded.lm_idx, P("model")),
    uv=put(sharded.uv, P("model", None)),
    valid=put(sharded.valid, P("model")),
)

with mesh:
    solved, costs = solve_window_ba_sharded(
        mesh, sharded, iterations=8, damping=1e-3
    )
    costs = np.asarray(jax.device_get(costs))

if pid == 0:
    with open(out_path, "w") as f:
        f.write(f"{costs[0]:.6e} {costs[-1]:.6e}\n")
print(f"proc {pid}: cost {costs[0]:.3e} -> {costs[-1]:.3e}", flush=True)
