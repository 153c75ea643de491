"""BASELINE config 3: ANYmal standing-balance MPC, flat terrain, 12 contacts max.

Receding-horizon MPPI through the hard-contact step recovers from lateral pushes
that topple the passive (PD-hold-only) robot. Reports recovery quality and MPC
solves/s — the graded MPC metric's per-config entry (BASELINE.json:2).

Run:  python examples/anymal_balance.py [--smoke]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def run(smoke: bool = False, metrics_path: str = "metrics/anymal_balance.jsonl"):
  from raisimlib_tpu.mpc.mppi import MPPIConfig, mppi_step_batch
  from raisimlib_tpu.mpc.state_map import make_contact_dyn_batch, state_to_vec
  from raisimlib_tpu.ops.spatial import quat_box_minus
  from raisimlib_tpu.utils import metrics

  from raisimlib_tpu import scenarios

  cfg = scenarios.load("anymal_balance")        # C12 scenario file
  cc, rcfg, cw = cfg["controller"], cfg["run"], cfg["run"]["cost"]
  dtype = jnp.float32
  control_dt, substeps = float(cc["control_dt"]), int(cc["substeps"])
  assert abs(float(cfg["world"]["dt"]) * substeps - control_dt) < 1e-12
  scene, info = scenarios.build_scene(cfg, dtype=dtype)

  q0 = jnp.asarray(info["standing_q"]["anymal"], dtype)
  # batched dynamics: the K-sample MPPI population rides the Pallas kernel's
  # lane axis (scene.step_batch) — the MPC throughput path (round-3 rewire)
  dyn_b, nx, nu = make_contact_dyn_batch(scene, control_dt, substeps, use_pd=True)
  q_stand = q0[7:]
  z0 = q0[2]
  quat_id = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)

  def rc(x, u, t):
    q, v = x[:19], x[19:]
    return (cw["height"] * (q[2] - z0) ** 2
            + cw["orientation"] * jnp.sum(quat_box_minus(q[3:7], quat_id) ** 2)
            + cw["base_vel"] * jnp.sum(v[:6] ** 2)
            + cw["joint_vel"] * jnp.sum(v[6:] ** 2)
            + cw["posture"] * jnp.sum((q[7:] - q_stand) ** 2)
            + cw["effort"] * jnp.sum((u - q_stand) ** 2)) * control_dt

  def fc(x):
    q, v = x[:19], x[19:]
    return (200.0 * (q[2] - z0) ** 2
            + 50.0 * jnp.sum(quat_box_minus(q[3:7], quat_id) ** 2)
            + 5.0 * jnp.sum(v[:6] ** 2))

  H = int(cc["smoke_horizon"] if smoke else cc["horizon"])
  K = int(cc["smoke_samples"] if smoke else cc["samples"])
  n_ticks = int(rcfg["smoke_ticks"] if smoke else rcfg["ticks"])
  push = float(rcfg["push_m_s"])
  mcfg = MPPIConfig(n_samples=K, sigma=float(cc["sigma"]),
                    temperature=float(cc["temperature"]))

  s0 = scene.init_state(q=q0)
  s_pushed = s0.replace(u=s0.u.at[4].set(push))

  @jax.jit
  def mpc_rollout(x0, U0, key):
    """Closed loop: one MPPI update per control tick, apply the first action."""

    def tick(carry, k):
      x, U = carry
      sol = mppi_step_batch(dyn_b, rc, fc, x[None], U[None], k, mcfg)
      Un = sol.U[0]
      x2 = dyn_b(x[None], Un[0][None], 0)[0]
      U_warm = jnp.concatenate([Un[1:], Un[-1:]])
      return (x2, U_warm), (x2, sol.cost[0])

    keys = jax.random.split(key, n_ticks)
    (xf, _), (xs, costs) = jax.lax.scan(tick, (x0, U0), keys)
    return xf, xs, costs

  x0 = state_to_vec(s_pushed)
  U0 = jnp.tile(q_stand[None], (H, 1))
  t0 = time.perf_counter()
  xf, xs, costs = mpc_rollout(x0, U0, jax.random.PRNGKey(0))
  jax.block_until_ready(xf)
  compile_s = time.perf_counter() - t0
  t0 = time.perf_counter()
  xf, xs, costs = mpc_rollout(x0, U0, jax.random.PRNGKey(0))
  jax.block_until_ready(xf)
  wall_s = time.perf_counter() - t0
  zs = xs[:, 2]

  # replayable recovery trajectory (SURVEY.md C14):
  # view with  python examples/replay.py metrics/anymal_balance_traj.npz
  from raisimlib_tpu.utils import trajectory
  import numpy as np

  nq = scene.model.nq
  traj = trajectory.from_states(scene, np.asarray(xs[:, :nq]),
                                np.asarray(xs[:, nq:]), dt=control_dt)
  trajectory.save("metrics/anymal_balance_traj.npz", traj)

  # passive comparison: PD hold only, no MPC
  @jax.jit
  def passive(s):
    hold = jnp.zeros((scene.model.nv,), dtype).at[6:].set(q_stand)

    def body(s, _):
      return scene.step(s, pd_target=hold), None

    s, _ = jax.lax.scan(body, s, None, length=n_ticks * substeps)
    return s

  s_passive = passive(s_pushed)

  result = {
      "push_m_s": push,
      "final_height": float(xf[2]),
      "passive_final_height": float(s_passive.q[2]),
      "min_height": float(zs.min()),
      "final_cost": float(costs[-1]),
      "mpc_solves_per_s": n_ticks / wall_s,
      "compile_s": compile_s,
      "ticks": n_ticks,
      "samples": K,
      "horizon": H,
  }
  metrics.emit("example_anymal_balance", path=metrics_path, echo=True, **result)
  if not smoke:
    # The demo is a DIFFERENTIAL claim (round-5 verdict #8): the push must be
    # strong enough to topple the passive PD-hold robot, and MPC must hold
    # height anyway — "MPC >= PD + margin", not just an absolute height.
    assert result["passive_final_height"] < 0.5 * float(z0), (
        "push too weak: passive robot did not topple — the demo proves nothing")
    assert result["final_height"] > 0.9 * float(z0), "MPC failed to hold height"
    assert (result["final_height"] - result["passive_final_height"]
            > 0.25 * float(z0)), "MPC did not beat passive PD by the margin"
  return result


if __name__ == "__main__":
  from raisimlib_tpu.utils.platform import apply_env_platform

  apply_env_platform()  # RAISIM_PLATFORM=cpu forces the CPU backend (smoke CI)
  ap = argparse.ArgumentParser()
  ap.add_argument("--smoke", action="store_true")
  run(smoke=ap.parse_args().smoke)
