"""Scaling-efficiency harness (BASELINE.json line 5: "Solves/s scaling efficiency is
measured at 1 chip, 1 host, and N>=2 hosts"; target >= 0.9 to 2 hosts).

Times a sharded workload at a ladder of mesh sizes with a FIXED per-device batch
(weak scaling — the deployment regime: more hosts -> more scenarios). Efficiency at
n devices is per-device throughput relative to the SMALLEST measured mesh; a 1 is
prepended to `device_counts` automatically so the baseline is a true single device
unless the caller explicitly opts out. Emits the table as structured metric records
(utils/metrics.py JSONL) plus a plain dict for benchmarks.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence

import jax

from raisimlib_tpu.parallel import mesh as mesh_lib


def time_workload(build: Callable, n_devices: int, repeats: int = 3) -> float:
  """`build(mesh) -> (fn, args)`; returns best wall-clock seconds for fn(*args)."""
  m = mesh_lib.make_mesh(n_devices)
  fn, args = build(m)
  jax.block_until_ready(fn(*args))  # compile
  best = float("inf")
  for _ in range(repeats):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    best = min(best, time.perf_counter() - t0)
  return best


def weak_scaling_report(
    build: Callable,
    items_per_device: int,
    device_counts: Optional[Sequence[int]] = None,
    repeats: int = 3,
    unit: str = "items/s",
) -> List[dict]:
  """Weak-scaling table. `build(mesh) -> (jitted_fn, args)` must size its batch as
  `items_per_device * mesh.devices.size`. Returns one record per mesh size:
  {n_devices, seconds, throughput, per_device, efficiency, unit}."""
  n_avail = len(jax.devices())
  if device_counts is None:
    device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
  elif 1 not in device_counts:
    device_counts = [1] + sorted(device_counts)
  rows: List[dict] = []
  base_per_dev = None
  for n in device_counts:
    secs = time_workload(build, n, repeats)
    thr = items_per_device * n / secs
    per_dev = thr / n
    if base_per_dev is None:
      base_per_dev = per_dev
    rows.append({
        "n_devices": n,
        "seconds": secs,
        "throughput": thr,
        "per_device": per_dev,
        "efficiency": per_dev / base_per_dev,
        "unit": unit,
    })
  return rows
