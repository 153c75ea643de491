"""Device mesh + multi-host initialization (SURVEY.md C20).

The reference has no distributed backend at all — its only declared dependency is
Eigen3 (/root/reference/.travis.yml:7) and its only socket is the viz TCP channel.
The TPU-native equivalent is XLA collectives over ICI (intra-slice) and DCN
(cross-host), reached through one abstraction: a named `jax.sharding.Mesh`.

Design rules (SURVEY.md §5 "Distributed communication backend"):
  * ONE code path for 1 chip / 1 host / N hosts — the mesh shape is the only knob.
  * The data-parallel axis ("dp") shards the scenario/rollout batch; reductions
    (`psum`/`pmean` of QP blocks and metrics) ride ICI within a host and DCN across.
  * CI runs the same meshes on 8 virtual CPU devices
    (`--xla_force_host_platform_device_count=8`, tests/conftest.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
  """Initialize cross-host JAX (call once per process before building meshes).

  No-op on a single process. Arguments default to the standard JAX env vars
  (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so launchers can
  configure everything through the environment. Retries briefly on connection
  failure (SURVEY.md §5 failure-detection plan).
  """
  global _DISTRIBUTED_INITIALIZED
  if _DISTRIBUTED_INITIALIZED:
    return
  if num_processes is None:
    num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
  if num_processes <= 1:
    return
  import time

  last_err = None
  for _ in range(3):
    try:
      jax.distributed.initialize(
          coordinator_address=coordinator_address,
          num_processes=num_processes,
          process_id=process_id,
      )
      _DISTRIBUTED_INITIALIZED = True
      return
    except Exception as e:  # pragma: no cover - needs a real cluster
      last_err = e
      time.sleep(2.0)
  raise RuntimeError(f"jax.distributed.initialize failed after retries: {last_err}")


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
  """1-D data-parallel mesh over the first `n_devices` devices (default: all)."""
  devs = jax.devices()
  if n_devices is not None:
    assert n_devices <= len(devs), (n_devices, len(devs))
    devs = devs[:n_devices]
  return Mesh(np.asarray(devs), (axis_name,))


def make_host_chip_mesh(axis_names: Sequence[str] = ("host", "chip")) -> Mesh:
  """2-D (hosts × chips-per-host) mesh.

  On a multi-host pod slice the leading axis crosses DCN and the trailing axis
  stays on ICI — shard the scenario batch over BOTH, but keep any tightly-coupled
  reduction (the QP contact-block psum, SURVEY.md C20) on the "chip" axis where
  possible so it rides ICI.
  """
  n_hosts = jax.process_count()
  devs = jax.devices()
  per_host = len(devs) // n_hosts
  # Group devices explicitly by owning process so the trailing ("chip") axis is
  # guaranteed intra-host (ICI) even when jax.devices() ordering is not contiguous
  # per process — device-id contiguity is NOT a topology guarantee.
  by_host = {}
  for d in devs:
    by_host.setdefault(d.process_index, []).append(d)
  rows = [sorted(by_host[p], key=lambda d: d.id) for p in sorted(by_host)]
  assert all(len(r) == per_host for r in rows), "uneven devices per host"
  grid = np.asarray(rows, dtype=object)
  return Mesh(grid, tuple(axis_names))


def dp_sharding(mesh: Mesh, ndim: int, axis_name: Optional[str] = None) -> NamedSharding:
  """NamedSharding that shards axis 0 of an ndim-array over the mesh's dp axes."""
  names = mesh.axis_names if axis_name is None else (axis_name,)
  spec = P(names if len(names) > 1 else names[0], *([None] * (ndim - 1)))
  return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
  """device_put a pytree of batched arrays with axis 0 sharded over the mesh.

  Rank-0 leaves (e.g. an unbatched scalar time) have no batch axis to shard and
  are replicated instead of erroring with an opaque device_put message.
  """
  return jax.tree.map(
      lambda x: jax.device_put(
          x, replicated(mesh) if np.ndim(x) == 0 else dp_sharding(mesh, np.ndim(x))
      ),
      tree,
  )
