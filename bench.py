"""Headline benchmark — prints ONE JSON line for the driver.

The graded config (BASELINE.json line 5): ANYmal 12-DoF contact-implicit
rollouts on one chip, 50-step horizon, target >= 10,000 rollouts/s/chip.
`vs_baseline` = measured rollouts/s divided by that 10k target — the honest
ratio on the config that counts: ANYmal on flat ground, 12 contact slots +
12 joint-limit rows, PD servo, the full collision -> cone solve -> integrate
pipeline. Round 4 routes physics through the FUSED full-step Pallas
megakernel (ops/pallas_step.py): the entire step — FK, narrow phase,
CRBA/RNEA, Cholesky, matrix-free Gauss-Seidel cone solve, integration —
is one kernel launch per step with the batch on the TPU lane axis.

Measurement notes (round-4 profiling, metrics/step_profile_r04.md):
  * Every timed repetition uses FRESH input arrays. Re-timing a jitted call
    on the identical input measured ~0.15 ms for work that takes 27 ms with
    fresh inputs on this remote-tunneled chip — reuse-based timings are not
    trustworthy here.
  * This harness reaches the TPU through a remote tunnel that adds ~20-25 ms
    of FIXED per-launch dispatch+transfer overhead (measured as T(1 update);
    a co-located host pays ~0.1-1 ms). The real-time MPC budget is therefore
    measured as MARGINAL per-update latency — (T(N sequential updates) -
    T(1))/(N-1), all updates chained on-device exactly as a 100 Hz control
    loop would run them — and the fixed overhead is reported separately.

Secondary fields (same JSON object, `extra`): MPC solves/s (MPPI receding-
horizon updates, K=128 samples, H=50), iLQR solves/s (batched lane-axis
iLQR, round-4), physics steps/s, the real-time budget fields, and the
speed-of-light fraction (FLOP model in metrics/step_profile_r04.md). A JSONL
copy of every record lands in bench_metrics.jsonl via utils/metrics.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

ROLLOUT_TARGET = 10_000.0  # BASELINE.json:5 rollouts/s/chip on this config


def _note(msg):
  print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
        flush=True)


_T0 = time.perf_counter()


def _balance_scene(dtype=jnp.float32, dt=0.0025):
  """Build the graded ANYmal balance scene ON THE HOST CPU device.

  Everything returned here becomes a closure constant of the jitted bench
  functions; keeping it on CPU makes jit tracing embed it from host memory
  instead of issuing blocking device->host readbacks against the remote TPU
  (see World.compile's docstring — this was the round-2 bench's multi-minute
  setup stall and a variance source)."""
  from raisimlib_tpu.models import anymal
  from raisimlib_tpu.models.urdf import load_urdf
  from raisimlib_tpu.world import World

  with jax.default_device(jax.devices("cpu")[0]):
    bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
    world = World(dt=dt, dtype=dtype)
    world.add_articulated_system(bodies, name="anymal", geoms=geoms)
    world.add_ground()
    scene = world.compile().set_pd_gains(100.0, 2.0)
    q0 = np.asarray(anymal.standing_q(), np.float32)
  return scene, q0


def _host_key(seed: int, n: int | None = None):
  """PRNG key(s) built on CPU, returned as numpy (uncommitted jit args)."""
  with jax.default_device(jax.devices("cpu")[0]):
    k = jax.random.PRNGKey(seed)
    if n is not None:
      k = jax.random.split(k, n)
    return np.asarray(k)


def bench_anymal_rollouts(B=16384, H=50, pack=8, dtype=jnp.float32):
  """Batched contact-implicit rollouts/s: B ANYmal worlds x H fused steps.

  pack=8 sublane-packs 8 worlds per VPU register (bitwise-identical results,
  measured 2.5x; see step_profile_r04.md "sublane packing")."""
  from raisimlib_tpu.ops import pallas_step
  from raisimlib_tpu.ops.integrator import State

  _note("rollouts: building scene")
  scene, q0 = _balance_scene(dtype)
  fused = pallas_step.make_step_batch_fused(scene, pack=pack)
  base_q = np.tile(q0[None], (B, 1)).astype(np.float32)
  pd = np.zeros((B, 18), np.float32)
  pd[:, 6:] = q0[7:][None]
  pd = jnp.asarray(pd)
  tau0 = jnp.zeros((B, 18), jnp.float32)

  def mk_states(seed):
    rng = np.random.RandomState(seed)
    qs = base_q + 0.02 * rng.randn(B, 19).astype(np.float32)
    qs[:, 3:7] /= np.linalg.norm(qs[:, 3:7], axis=1, keepdims=True)
    return State(q=jnp.asarray(qs), u=jnp.zeros((B, 18), jnp.float32),
                 t=jnp.zeros((B,), jnp.float32))

  @jax.jit
  def run(states):
    def body(s, _):
      return fused(s, tau0, pd), None

    out, _ = jax.lax.scan(body, states, None, length=H)
    return out.q

  _note("rollouts: compiling fused rollout")
  run(mk_states(0)).block_until_ready()  # compile
  _note("rollouts: compiled, timing (fresh inputs per rep)")
  times = []
  for r in range(4):
    s = mk_states(r + 1)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    run(s).block_until_ready()
    times.append(time.perf_counter() - t0)
  t = min(times)
  spread = 100.0 * (max(times) - min(times)) / min(times)
  return {"rollouts_per_s": B / t, "steps_per_s": B * H / t, "B": B, "H": H,
          "spread_pct": round(spread, 1)}


def bench_anymal_terrain_rollouts(B=16384, H=50, pack=8, n_terrains=64,
                                  dtype=jnp.float32):
  """Batched contact-implicit rollouts/s ON PROCEDURAL HEIGHTMAPS — BASELINE
  config 4's throughput path (round-5 verdict #2: the 105k flat-ground number
  had no terrain counterpart). Same fused megakernel, now with the in-kernel
  terrain narrow phase: each world reads a root-centered terrain patch
  operand; `n_terrains` distinct fractal heightfields tile across the B
  worlds (per-world heights, the batched-terrain-scenarios path)."""
  from raisimlib_tpu.models import anymal
  from raisimlib_tpu.models.urdf import load_urdf
  from raisimlib_tpu.ops import pallas_step
  from raisimlib_tpu.ops.integrator import State
  from raisimlib_tpu.utils import terrain
  from raisimlib_tpu.world import World

  _note("terrain: building scene")
  with jax.default_device(jax.devices("cpu")[0]):
    bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
    world = World(dt=0.0025, dtype=dtype)
    world.add_articulated_system(bodies, name="anymal", geoms=geoms)
    keys = jax.random.split(jax.random.PRNGKey(11), n_terrains)
    props = terrain.TerrainProperties(z_scale=0.06, x_size=12.0, y_size=6.0,
                                      x_samples=48, y_samples=24)
    hts_np = np.stack([np.asarray(terrain.generate(k, props, dtype=dtype)
                                  .heights) for k in keys])
    world.add_heightmap(terrain.flat(0.0, size=(12.0, 6.0), samples=(48, 24)))
    scene = world.compile().set_pd_gains(100.0, 2.0)
    q0 = np.asarray(anymal.standing_q(), np.float32)
  fused = pallas_step.make_step_batch_fused(scene, pack=pack)
  reps = (B + n_terrains - 1) // n_terrains
  hts = jnp.asarray(np.tile(hts_np, (reps, 1, 1))[:B])
  base_q = np.tile(q0[None], (B, 1)).astype(np.float32)
  # start each robot at its terrain's local surface height under the base
  z_surf = hts_np[np.tile(np.arange(n_terrains), reps)[:B], 24, 12]
  base_q[:, 2] += z_surf.astype(np.float32)
  pd = np.zeros((B, 18), np.float32)
  pd[:, 6:] = q0[7:][None]
  pd = jnp.asarray(pd)
  tau0 = jnp.zeros((B, 18), jnp.float32)

  def mk_states(seed):
    rng = np.random.RandomState(seed)
    qs = base_q + 0.02 * rng.randn(B, 19).astype(np.float32)
    qs[:, 3:7] /= np.linalg.norm(qs[:, 3:7], axis=1, keepdims=True)
    return State(q=jnp.asarray(qs), u=jnp.zeros((B, 18), jnp.float32),
                 t=jnp.zeros((B,), jnp.float32))

  @jax.jit
  def run(states):
    def body(s, _):
      return fused(s, tau0, pd, field_heights=hts), None

    out, _ = jax.lax.scan(body, states, None, length=H)
    return out.q

  _note("terrain: compiling fused terrain rollout")
  run(mk_states(0)).block_until_ready()
  _note("terrain: compiled, timing (fresh inputs per rep)")
  times = []
  for r in range(3):
    s = mk_states(r + 1)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    run(s).block_until_ready()
    times.append(time.perf_counter() - t0)
  t = min(times)
  return {"terrain_rollouts_per_s": B / t, "terrain_steps_per_s": B * H / t,
          "B": B, "H": H, "n_terrains": n_terrains}


def bench_atlas_rollouts(B=1024, H=50, dtype=jnp.float32):
  """Atlas 1024-robot x 50-step batched-scene rollouts/s on one chip — the
  graded BASELINE config 5 scene at contract scale (round-5 verdict #4: the
  scaling-bound doc needs a measured single-chip T_compute). pack=1: at
  Atlas scale sublane packing measured slower (see examples/atlas_batch.py).
  """
  from raisimlib_tpu import scenarios
  from raisimlib_tpu.ops import pallas_step
  from raisimlib_tpu.ops.integrator import State

  _note("atlas: building scene")
  with jax.default_device(jax.devices("cpu")[0]):
    cfg = scenarios.load("atlas_batch")
    scene, info = scenarios.build_scene(cfg, dtype=dtype)
    q0 = np.asarray(info["standing_q"]["atlas"], np.float32)
  fused = pallas_step.make_step_batch_fused(scene, pack=1)
  nv, nq = scene.model.nv, scene.model.nq
  base_q = np.tile(q0[None], (B, 1)).astype(np.float32)
  pd = np.zeros((B, nv), np.float32)
  pd[:, 6:] = q0[7:][None]
  pd = jnp.asarray(pd)
  tau0 = jnp.zeros((B, nv), jnp.float32)

  def mk_states(seed):
    rng = np.random.RandomState(seed)
    qs = base_q + 0.01 * rng.randn(B, nq).astype(np.float32)
    qs[:, 3:7] /= np.linalg.norm(qs[:, 3:7], axis=1, keepdims=True)
    return State(q=jnp.asarray(qs), u=jnp.zeros((B, nv), jnp.float32),
                 t=jnp.zeros((B,), jnp.float32))

  @jax.jit
  def run(states):
    def body(s, _):
      return fused(s, tau0, pd), None

    out, _ = jax.lax.scan(body, states, None, length=H)
    return out.q

  _note("atlas: compiling fused rollout")
  qf = run(mk_states(0))
  qf.block_until_ready()
  standing = float((np.asarray(qf[:, 2]) > 0.9).mean())
  _note(f"atlas: compiled (standing fraction {standing:.3f}), timing")
  times = []
  for r in range(3):
    s = mk_states(r + 1)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    run(s).block_until_ready()
    times.append(time.perf_counter() - t0)
  t = min(times)
  return {"atlas_rollouts_per_s": B / t, "atlas_steps_per_s": B * H / t,
          "B": B, "H": H, "standing_fraction": standing}


def _balance_cost(scene, q0, dtype):
  from raisimlib_tpu.ops.spatial import quat_box_minus

  q_stand = jnp.asarray(q0[7:], dtype)
  z0 = float(q0[2])
  quat_id = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)

  def rc(x, u, t):
    q, v = x[:19], x[19:]
    return (40.0 * (q[2] - z0) ** 2
            + 10.0 * jnp.sum(quat_box_minus(q[3:7], quat_id) ** 2)
            + 0.5 * jnp.sum(v[:6] ** 2)
            + 1.0 * jnp.sum((u - q_stand) ** 2)) * 0.01

  def fc(x):
    q, v = x[:19], x[19:]
    return 200.0 * (q[2] - z0) ** 2 + 5.0 * jnp.sum(v[:6] ** 2)

  return rc, fc, np.asarray(q0[7:], np.float32)


def bench_anymal_mpc(n_env=16, H=50, K=128, updates=4, dtype=jnp.float32):
  """MPC solves/s: one solve = one MPPI receding-horizon update (K samples, H
  control steps, 4 physics substeps each). All n_env * K sample rollouts run
  as ONE physics batch through the fused megakernel (state_map routes
  eligible scenes automatically)."""
  from raisimlib_tpu.mpc.mppi import MPPIConfig, mppi_step_batch
  from raisimlib_tpu.mpc.state_map import make_contact_dyn_batch, state_to_vec

  _note("mpc: building scene")
  scene, q0 = _balance_scene(dtype)
  # n_env*K = 2048 sample rollouts per update: a multiple of pack*tile=1024,
  # so the fused kernel runs fully sublane-packed
  dyn_b, nx, nu = make_contact_dyn_batch(scene, control_dt=0.01, substeps=4,
                                         use_pd=True, pack=8)
  rc, fc, q_stand = _balance_cost(scene, q0, dtype)

  with jax.default_device(jax.devices("cpu")[0]):
    s0 = scene.init_state(q=jnp.asarray(q0))
    x0 = np.asarray(state_to_vec(s0))
  cfg = MPPIConfig(n_samples=K, sigma=0.1, temperature=0.3)

  def mk(seed):
    rng = np.random.RandomState(seed)
    x0s = np.tile(x0[None], (n_env, 1)).astype(np.float32)
    x0s[:, 19 + 4] += 0.1 * rng.randn(n_env).astype(np.float32)
    U0s = np.tile(q_stand[None, None, :], (n_env, H, 1)).astype(np.float32)
    return jnp.asarray(x0s), jnp.asarray(U0s)

  @jax.jit
  def run(x0s, U0s, key):
    def body(Us, k):
      sol = mppi_step_batch(dyn_b, rc, fc, x0s, Us, k, cfg)
      return sol.U, None

    Us, _ = jax.lax.scan(body, U0s, jax.random.split(key, updates))
    return Us

  _note("mpc: compiling solve")
  x0s, U0s = mk(0)
  run(x0s, U0s, _host_key(1)).block_until_ready()  # compile
  _note("mpc: compiled, timing")
  times = []
  for r in range(3):
    x0s, U0s = mk(r + 1)
    key = _host_key(r + 2)
    jax.block_until_ready((x0s, U0s))
    t0 = time.perf_counter()
    run(x0s, U0s, key).block_until_ready()
    times.append(time.perf_counter() - t0)
  t = min(times)
  return {"mpc_solves_per_s": n_env * updates / t, "n_env": n_env, "K": K,
          "updates": updates}


def bench_anymal_mpc_realtime(K=64, H=50, chain=9, control_dt=0.01,
                              dtype=jnp.float32):
  """Real-time MPC budget (BASELINE.json:5 'meets its real-time MPC budget').

  THE BUDGET, pinned (round 3): a receding-horizon controller ticking at
  100 Hz must finish ONE MPPI plan update — K=64 sampled rollouts over the
  full H=50-step horizon — within its control period of 10 ms. The planning
  model uses one physics step per control step (dt = control_dt = 10 ms).

  Methodology (round 4): per-update latency is measured MARGINALLY —
  (T(chain updates) - T(1 update)) / (chain - 1), with the updates chained
  sequentially on-device exactly as the 100 Hz loop runs them — because this
  harness reaches the TPU through a remote tunnel whose FIXED per-launch
  dispatch+transfer overhead (~20-25 ms, reported as fixed_overhead_ms) is
  an artifact of the lab setup, not of the controller. Reports
  realtime_ok = (marginal latency <= control period)."""
  from raisimlib_tpu.mpc.mppi import MPPIConfig, mppi_step_batch
  from raisimlib_tpu.mpc.state_map import make_contact_dyn_batch, state_to_vec

  _note("mpc_rt: building scene")
  scene, q0 = _balance_scene(dtype, dt=control_dt)
  dyn_b, nx, nu = make_contact_dyn_batch(scene, control_dt=control_dt,
                                         substeps=1, use_pd=True)
  rc, fc, q_stand = _balance_cost(scene, q0, dtype)

  with jax.default_device(jax.devices("cpu")[0]):
    s0 = scene.init_state(q=jnp.asarray(q0))
    x0s = np.asarray(state_to_vec(s0))[None].astype(np.float32)
    U0 = np.tile(q_stand[None, None, :], (1, H, 1)).astype(np.float32)
  cfg = MPPIConfig(n_samples=K, sigma=0.1, temperature=0.3)

  def chain_fn(n):
    @jax.jit
    def f(x0s, U, key):
      def body(U, k):
        return mppi_step_batch(dyn_b, rc, fc, x0s, U, k, cfg).U, None

      return jax.lax.scan(body, U, jax.random.split(key, n))[0]

    return f

  lat = {}
  for n in (1, chain):
    f = chain_fn(n)
    _note(f"mpc_rt: compiling {n}-update chain")
    f(x0s, U0, _host_key(10 + n)).block_until_ready()
    times = []
    for r in range(4):
      key = _host_key(100 * n + r)
      t0 = time.perf_counter()
      f(x0s, U0, key).block_until_ready()
      times.append(time.perf_counter() - t0)
    lat[n] = min(times)
  marginal_ms = 1000.0 * (lat[chain] - lat[1]) / (chain - 1)
  fixed_ms = 1000.0 * lat[1] - marginal_ms
  return {"mpc_update_latency_ms": marginal_ms,
          "fixed_overhead_ms": round(fixed_ms, 1),
          "budget_ms": 1000.0 * control_dt,
          "realtime_ok": bool(marginal_ms <= 1000.0 * control_dt),
          "K": K, "H": H}


def bench_anymal_ilqr(n_env=8, H=50, iters=8, dtype=jnp.float32):
  """iLQR solves/s through the lane-axis batched solver (round 4; the r3
  verdict asked for a committed iLQR number next to MPPI's). One solve =
  `iters` full iLQR iterations (rollout + Jacobian stacks + Riccati +
  8-alpha parallel line search) on one env; n_env envs solve together.

  Round 5: the dynamics Jacobians come from ilqr_batch's kernel-FD path —
  2*(nx+nu) perturbed forward steps per (env, timestep) through the fused
  megakernel — instead of jvp-tracing the phase-split step (which compiled
  for ~246 s and solved at 4.3/s in BENCH_r04)."""
  from raisimlib_tpu.mpc.ilqr import ILQRConfig, ilqr_batch
  from raisimlib_tpu.mpc.state_map import make_contact_dyn_batch, state_to_vec

  _note("ilqr: building scene")
  scene, q0 = _balance_scene(dtype, dt=0.01)
  dyn_fast, nx, nu = make_contact_dyn_batch(scene, control_dt=0.01,
                                            substeps=1, use_pd=True)
  rc, fc, q_stand = _balance_cost(scene, q0, dtype)
  cfg = ILQRConfig(iters=iters, deriv="fd")

  with jax.default_device(jax.devices("cpu")[0]):
    s0 = scene.init_state(q=jnp.asarray(q0))
    x0 = np.asarray(state_to_vec(s0))

  def mk(seed):
    rng = np.random.RandomState(seed)
    x0s = np.tile(x0[None], (n_env, 1)).astype(np.float32)
    x0s[:, 19 + 4] += 0.1 * rng.randn(n_env).astype(np.float32)
    U0s = np.tile(q_stand[None, None, :], (n_env, H, 1)).astype(np.float32)
    return jnp.asarray(x0s), jnp.asarray(U0s)

  def dyn_u(X, U, t):
    return dyn_fast(X, U, t)

  @jax.jit
  def run(x0s, U0s):
    sol = ilqr_batch(dyn_u, None, rc, fc, x0s, U0s, cfg)
    return sol.cost, sol.cost_trace

  _note("ilqr: compiling solve (forward kernel + kernel-FD derivative stacks)")
  x0s, U0s = mk(0)
  c, ct = run(x0s, U0s)
  jax.block_until_ready(c)
  ct = np.asarray(ct)
  improved = float(np.mean(ct[:, -1] / np.maximum(ct[:, 0], 1e-9)))
  _note(f"ilqr: compiled (cost ratio final/initial = {improved:.3f}), timing")
  times = []
  for r in range(2):
    x0s, U0s = mk(r + 1)
    jax.block_until_ready((x0s, U0s))
    t0 = time.perf_counter()
    c, _ = run(x0s, U0s)
    jax.block_until_ready(c)
    times.append(time.perf_counter() - t0)
  t = min(times)
  return {"ilqr_solves_per_s": n_env / t, "n_env": n_env, "iters": iters,
          "cost_ratio": round(improved, 4)}


# Speed-of-light accounting (SURVEY.md §5 roofline; details + derivation in
# metrics/step_profile_r04.md). Analytical FLOP model of the fused step for
# the graded ANYmal scene; peak is the v5e VPU f32 FMA rate (the step is
# VPU-bound by design: MXU-shaped work does not exist at nv=18 and HBM
# traffic is ~300 B/world/step).
_FLOPS_PER_WORLD_STEP = 1.9e5    # see step_profile_r04.md "FLOP model"
_V5E_VPU_FLOPS = 1.97e12         # 8x128 lanes x 2 (FMA) x 0.94 GHz


def _sol_fraction(steps_per_s: float) -> float:
  return steps_per_s * _FLOPS_PER_WORLD_STEP / _V5E_VPU_FLOPS


if __name__ == "__main__":
  from raisimlib_tpu.utils import metrics

  roll = bench_anymal_rollouts()
  metrics.emit("bench_rollouts", path="bench_metrics.jsonl", **roll)
  try:
    terr = bench_anymal_terrain_rollouts()
    metrics.emit("bench_terrain", path="bench_metrics.jsonl", **terr)
  except Exception as e:
    terr = {"terrain_rollouts_per_s": None, "error": repr(e)[:200]}
  try:
    atl = bench_atlas_rollouts()
    metrics.emit("bench_atlas", path="bench_metrics.jsonl", **atl)
  except Exception as e:
    atl = {"atlas_rollouts_per_s": None, "error": repr(e)[:200]}
  try:
    mpc = bench_anymal_mpc()
    metrics.emit("bench_mpc", path="bench_metrics.jsonl", **mpc)
  except Exception as e:  # rollouts/s is the graded headline; never lose it
    mpc = {"mpc_solves_per_s": None, "error": repr(e)[:200]}
  try:
    rt = bench_anymal_mpc_realtime()
    metrics.emit("bench_mpc_realtime", path="bench_metrics.jsonl", **rt)
  except Exception as e:
    rt = {"realtime_ok": None, "error": repr(e)[:200]}
  try:
    ilqr_res = bench_anymal_ilqr()
    metrics.emit("bench_ilqr", path="bench_metrics.jsonl", **ilqr_res)
  except Exception as e:
    ilqr_res = {"ilqr_solves_per_s": None, "error": repr(e)[:200]}
  print(json.dumps({
      "metric": "anymal_contact_rollouts_per_s_per_chip",
      "value": round(roll["rollouts_per_s"], 1),
      "unit": "rollouts/s",
      "vs_baseline": round(roll["rollouts_per_s"] / ROLLOUT_TARGET, 3),
      "extra": {
          "mpc_solves_per_s": (round(mpc["mpc_solves_per_s"], 2)
                               if mpc.get("mpc_solves_per_s") else None),
          "ilqr_solves_per_s": (round(ilqr_res["ilqr_solves_per_s"], 2)
                                if ilqr_res.get("ilqr_solves_per_s") else None),
          "mpc_update_latency_ms": (round(rt["mpc_update_latency_ms"], 2)
                                    if rt.get("mpc_update_latency_ms") else None),
          "mpc_fixed_launch_overhead_ms": rt.get("fixed_overhead_ms"),
          "mpc_budget_ms": rt.get("budget_ms"),
          "realtime_ok": rt.get("realtime_ok"),
          "steps_per_s": round(roll["steps_per_s"], 0),
          "sol_fraction_vpu": round(_sol_fraction(roll["steps_per_s"]), 4),
          "rollouts_spread_pct": roll.get("spread_pct"),
          "batch": roll["B"],
          "horizon": roll["H"],
          "terrain_rollouts_per_s": (
              round(terr["terrain_rollouts_per_s"], 1)
              if terr.get("terrain_rollouts_per_s") else None),
          "atlas_1024_rollouts_per_s": (
              round(atl["atlas_rollouts_per_s"], 1)
              if atl.get("atlas_rollouts_per_s") else None),
          "atlas_standing_fraction": atl.get("standing_fraction"),
      },
  }))
