"""BASELINE config 4: ANYmal trotting MPC over procedural heightmaps, with
BATCHED terrain scenarios — one compiled program, `vmap` over heightfield
arrays (the pattern SURVEY.md C5/C17 prescribe: terrains are pytree leaves of
the Scene, so scenarios batch without recompilation).

Controller: receding-horizon MPPI around a diagonal-pair trot reference
(LF+RH / RF+LH at opposite phase); the sampler optimizes PD-target sequences
through the hard-contact step on each terrain independently.

Run:  python examples/anymal_trot_heightmap.py [--smoke]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def gait_reference(n, control_dt, freq=1.5, swing=0.22, dtype=jnp.float32):
  """(n, 12) PD-target table: stand pose + trot flexion on the swing pair."""
  from raisimlib_tpu.models import anymal

  q_stand = jnp.asarray(anymal.standing_q(), dtype)[7:]
  t = jnp.arange(n, dtype=dtype) * control_dt
  phase = 2.0 * jnp.pi * freq * t                        # (n,)
  # legs LF RF LH RH; trot pairs (LF, RH) phase 0, (RF, LH) phase pi
  offsets = jnp.asarray([0.0, jnp.pi, jnp.pi, 0.0], dtype)
  mirror = jnp.asarray([1.0, 1.0, -1.0, -1.0], dtype)    # hind legs mirrored
  sw = jnp.maximum(jnp.sin(phase[:, None] + offsets[None, :]), 0.0)  # (n, 4)
  tgt = jnp.tile(q_stand[None], (n, 1)).reshape(n, 4, 3)
  tgt = tgt.at[:, :, 1].add(swing * sw * mirror[None, :])            # HFE flex
  tgt = tgt.at[:, :, 2].add(-1.6 * swing * sw * mirror[None, :])     # KFE fold
  return tgt.reshape(n, 12)


def run(smoke: bool = False, metrics_path: str = "metrics/anymal_trot.jsonl"):
  from raisimlib_tpu.mpc.mppi import MPPIConfig, mppi_step_batch
  from raisimlib_tpu.mpc.state_map import make_contact_dyn_batch, state_to_vec
  from raisimlib_tpu.ops import heightmap as hm
  from raisimlib_tpu.ops.spatial import quat_box_minus
  from raisimlib_tpu.utils import metrics, terrain

  from raisimlib_tpu import scenarios

  cfg = scenarios.load("anymal_trot_heightmap")  # C12 scenario file
  cc, tc, rcfg, gc = (cfg["controller"], cfg["terrain"], cfg["run"],
                      cfg["gait"])
  dtype = jnp.float32
  control_dt, substeps = float(cc["control_dt"]), int(cc["substeps"])
  assert abs(float(cfg["world"]["dt"]) * substeps - control_dt) < 1e-12
  n_terrains = int(tc["smoke_n_terrains"] if smoke else tc["n_terrains"])
  n_ticks = int(rcfg["smoke_ticks"] if smoke else rcfg["ticks"])
  H = int(cc["smoke_horizon"] if smoke else cc["horizon"])
  K = int(cc["smoke_samples"] if smoke else cc["samples"])
  v_target = float(rcfg["v_target"])
  z_rough = float(tc["smoke_z_scale"] if smoke else tc["z_scale"])

  scene0, info = scenarios.build_scene(cfg, dtype=dtype)
  tsize = tuple(info["terrain"]["size"])
  tsamples = tuple(info["terrain"]["samples"])

  q0 = jnp.asarray(info["standing_q"]["anymal"], dtype)
  q_stand = q0[7:]
  z0 = q0[2]
  quat_id = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
  gait = gait_reference(n_ticks + H, control_dt, freq=float(gc["freq_hz"]),
                        swing=float(gc["swing"]), dtype=dtype)
  mcfg = MPPIConfig(n_samples=K, sigma=float(cc["sigma"]),
                    temperature=float(cc["temperature"]))

  # per-env costs take the env's heightfield as ctx (mppi_step_batch env_ctx)
  field0 = scene0.field

  def rc(x, u, t, heights):
    q, v = x[:19], x[19:]
    z_surf, _, _ = hm.surface_at(field0.replace(heights=heights), q[:2])
    return (9.0 * (v[3] - v_target) ** 2                   # forward speed
            + 30.0 * (q[2] - z_surf - z0) ** 2             # height over terrain
            + 8.0 * jnp.sum(quat_box_minus(q[3:7], quat_id) ** 2)
            + 0.3 * (v[4] ** 2 + v[5] ** 2)                # lateral/vertical
            + 0.02 * jnp.sum(v[6:] ** 2)) * control_dt

  def fc(x, heights):
    q, v = x[:19], x[19:]
    z_surf, _, _ = hm.surface_at(field0.replace(heights=heights), q[:2])
    return (100.0 * (q[2] - z_surf - z0) ** 2
            + 30.0 * jnp.sum(quat_box_minus(q[3:7], quat_id) ** 2))

  # ONE batched controller over all terrains: the (n_terrains x K) sample
  # population rides the Pallas megakernel's lane axis with per-row terrains
  # (round-3: step_batch field_heights) — no vmap over per-terrain solvers
  dyn_b, nx, nu = make_contact_dyn_batch(scene0, control_dt, substeps,
                                         use_pd=True)

  tkeys = jax.random.split(jax.random.PRNGKey(11), n_terrains)
  heights = jax.vmap(lambda k: terrain.generate(
      k, terrain.TerrainProperties(z_scale=z_rough, x_size=tsize[0],
                                   y_size=tsize[1], x_samples=tsamples[0],
                                   y_samples=tsamples[1]),
      dtype=dtype).heights)(tkeys)

  @jax.jit
  def trot_all(heights, key):
    z_start = jax.vmap(lambda h: hm.surface_at(
        field0.replace(heights=h), q0[:2])[0])(heights)
    q0s = jnp.tile(q0[None], (n_terrains, 1)).at[:, 2].add(z_start)
    x0s = jnp.concatenate(
        [q0s, jnp.zeros((n_terrains, 18), dtype)], axis=1)

    def tick(carry, inp):
      xs, dUs = carry
      k, m = inp
      base = jax.lax.dynamic_slice(gait, (m, 0), (H, 12))  # upcoming references
      sol = mppi_step_batch(dyn_b, rc, fc, xs, base[None] + dUs, k, mcfg,
                            env_ctx=heights)
      x2 = dyn_b(xs, sol.U[:, 0], 0, heights)
      dU2 = jnp.concatenate([sol.U[:, 1:] - base[None, 1:],
                             sol.U[:, -1:] - base[None, -1:]], axis=1)
      return (x2, dU2), x2

    keys = jax.random.split(key, n_ticks)
    ms = jnp.arange(n_ticks)
    (xf, _), xs = jax.lax.scan(
        tick, (x0s, jnp.zeros((n_terrains, H, 12), dtype)), (keys, ms))
    return xf, jnp.moveaxis(xs, 0, 1)       # (n_terrains, n_ticks, nx)

  t0 = time.perf_counter()
  xf, xs = trot_all(heights, jax.random.PRNGKey(7))
  jax.block_until_ready(xf)
  compile_s = time.perf_counter() - t0
  t0 = time.perf_counter()
  xf, xs = trot_all(heights, jax.random.PRNGKey(7))
  jax.block_until_ready(xf)
  wall_s = time.perf_counter() - t0

  dist = np.asarray(xf[:, 0])                              # forward progress
  zs = np.asarray(xf[:, 2])

  # replayable trajectory of terrain 0's closed-loop trot (SURVEY.md C14):
  # view with  python examples/replay.py metrics/anymal_trot_traj.npz
  from raisimlib_tpu.utils import trajectory

  nq = scene0.model.nq
  traj = trajectory.from_states(scene0, np.asarray(xs[0][:, :nq]),
                                np.asarray(xs[0][:, nq:]), dt=control_dt)
  traj["terrain_heights"] = np.asarray(heights[0])
  trajectory.save("metrics/anymal_trot_traj.npz", traj)
  result = {
      "n_terrains": n_terrains,
      "ticks": n_ticks,
      "sim_seconds": n_ticks * control_dt,
      "mean_forward_m": float(dist.mean()),
      "min_forward_m": float(dist.min()),
      "final_heights": [round(float(z), 3) for z in zs],
      "mpc_solves_per_s": n_terrains * n_ticks / wall_s,
      "sample_rollouts_per_s": n_terrains * n_ticks * K / wall_s,
      "compile_s": compile_s,
      "terrain_z_scale": z_rough,
  }
  metrics.emit("example_anymal_trot_heightmap", path=metrics_path, echo=True,
               **result)
  if not smoke:
    # a defensible gait bar (round-5 verdict #1): every robot covers >= 0.5 m
    # over the >= 3 s closed loop — actual trotting toward v_target, not drift
    assert result["sim_seconds"] >= 3.0, "non-smoke run must simulate >= 3 s"
    assert result["min_forward_m"] > 0.5, "a robot failed to trot forward"
    assert (zs > 0.3).all(), "a robot fell"
  return result


if __name__ == "__main__":
  from raisimlib_tpu.utils.platform import apply_env_platform

  apply_env_platform()  # RAISIM_PLATFORM=cpu forces the CPU backend (smoke CI)
  ap = argparse.ArgumentParser()
  ap.add_argument("--smoke", action="store_true")
  run(smoke=ap.parse_args().smoke)
