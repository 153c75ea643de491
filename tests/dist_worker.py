"""Worker for the REAL 2-process `jax.distributed` test (SURVEY.md C20, §4.5).

Launched by tests/test_distributed.py as two separate OS processes on this
node, each owning 2 virtual CPU devices. Exercises the actual multi-process
path of `parallel/mesh.py` that every other multi-device artifact (virtual
8-device meshes, dryruns) runs single-process:

  * `init_distributed` -> `jax.distributed.initialize` against a localhost
    coordinator (the retry loop's success path),
  * `make_host_chip_mesh` building a (process x local-device) mesh from a
    REAL multi-process device set (per-process device grouping),
  * a `shard_map` psum whose reduction crosses the process boundary,
  * a pmean'd metric (the SURVEY C20 collective set: psum/all_gather/pmean).

Usage: python tests/dist_worker.py <coordinator> <process_id> <num_processes>
Prints "DIST_OK <total>" on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 2 virtual CPU devices per process; must be set before the CPU client exists
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon preload: env vars are too late

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main():
  coord, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

  from raisimlib_tpu.parallel import mesh as pm

  pm.init_distributed(coordinator_address=coord, num_processes=nproc,
                      process_id=pid)
  assert jax.process_count() == nproc, jax.process_count()
  assert jax.device_count() == 2 * nproc, jax.device_count()
  assert len(jax.local_devices()) == 2

  mesh = pm.make_host_chip_mesh()
  assert mesh.devices.shape == (nproc, 2), mesh.devices.shape
  # every row of the mesh must be single-process (the ICI axis guarantee)
  for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1

  # global (nproc*2, 4) batch, one row per device, value = process_id + 1
  sharding = pm.dp_sharding(mesh, 2)
  local = np.full((2, 4), float(pid + 1), np.float32)
  garr = jax.make_array_from_process_local_data(sharding, local)

  @jax.jit
  def reduce_all(x):
    f = shard_map(
        lambda v: (jax.lax.psum(jnp.sum(v), ("host", "chip")),
                   jax.lax.pmean(jnp.max(v), ("host", "chip"))),
        mesh=mesh, in_specs=P(("host", "chip"), None), out_specs=(P(), P()))
    return f(x)

  total, mx = reduce_all(garr)
  # psum crosses the process boundary: sum over all processes' rows
  expect = sum(4 * 2 * (p + 1) for p in range(nproc))
  np.testing.assert_allclose(float(total), expect, rtol=1e-6)
  # pmean of the per-device maxima (each device's rows hold process_id+1)
  np.testing.assert_allclose(float(mx), (nproc + 1) / 2.0, rtol=1e-6)
  print(f"DIST_OK {float(total)}", flush=True)


if __name__ == "__main__":
  main()
