"""Generate the frozen f64 golden trajectories for the torque-parity gate.

SURVEY.md §7 hard-part 5: no reference binary exists anywhere (the reference tree is
the 3-file v0 commit, /root/reference/README.md:1), so the parity oracle is pinned
from this framework's own f64 CPU implementation, cross-checked against MuJoCo where
the models overlap (tests/test_dynamics.py), and frozen here as *the* reference
sequence for the BASELINE.json:5 1e-3 torque gate.

Run (from repo root):
    JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu python tests/make_goldens.py

Outputs tests/goldens/*.npz — committed artifacts; regenerate only when the physics
intentionally changes, and say so in the commit message.
"""

import os

import jax

# this machine preloads jax with a remote TPU backend via sitecustomize, so env
# vars are too late — switch platform through jax.config (same as conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def golden_cartpole():
  """Config 1 (BASELINE.json:7): cartpole swing-up iLQR, f64. Freezes the optimal
  control sequence U, the resulting state trajectory X, and the converged cost."""
  from raisimlib_tpu.models import primitives
  from raisimlib_tpu.mpc import ILQRConfig, ilqr, make_smooth_dyn

  model = primitives.cartpole(dtype=jnp.float64)
  G = jnp.array([0.0, 0.0, -9.81], jnp.float64)
  dyn, nx, nu = make_smooth_dyn(model, G, dt=0.02, substeps=2)

  def rc(x, u, t):
    return (4.0 * (jnp.cos(x[1]) + 1.0) + 0.1 * x[0] ** 2
            + 0.05 * (x[2] ** 2 + x[3] ** 2) + 0.01 * jnp.sum(u**2)) * 0.02

  def fc(x):
    return 40.0 * (jnp.cos(x[1]) + 1.0) + 2.0 * x[0] ** 2 + x[2] ** 2 + x[3] ** 2

  H = 50
  # theta=0 straight down is a symmetric stationary point of both dynamics and
  # cost — iLQR from (0, 0-controls) sees zero gradient and never swings up.
  # Start with a small deterministic tilt to break the symmetry.
  x0 = jnp.zeros((nx,), jnp.float64).at[1].set(0.05)
  U0 = jnp.zeros((H, nu), jnp.float64)
  sol = jax.jit(lambda x0, U0: ilqr(dyn, rc, fc, x0, U0, ILQRConfig(iters=40)))(x0, U0)

  def rollout(x0, U):
    def body(x, u):
      xn = dyn(x, u, 0.0)
      return xn, xn
    _, X = jax.lax.scan(body, x0, U)
    return X

  X = rollout(x0, sol.U)
  np.savez(
      os.path.join(GOLDEN_DIR, "cartpole_swingup.npz"),
      U=np.asarray(sol.U), X=np.asarray(X), x0=np.asarray(x0),
      cost=np.asarray(sol.cost), H=H,
  )
  print("cartpole: cost", float(sol.cost), "final theta", float(X[-1, 1]))


def golden_sphere_box():
  """Config 2 (BASELINE.json:8): sphere + box stack on flat ground, passive, f64.
  Freezes the full generalized-coordinate trajectory."""
  from raisimlib_tpu.world import World

  world = World(dt=0.002, dtype=jnp.float64)
  world.add_ground()
  world.add_box((0.25, 0.25, 0.15), mass=2.0, pos=(0.0, 0.0, 0.151))
  world.add_sphere(0.12, mass=1.0, pos=(0.05, 0.0, 0.45))
  scene = world.compile()
  s0 = scene.init_state()
  # small sideways kick on the BOX so stick/slip friction matters (a kicked
  # sphere would transition to rolling and never settle — see the example)
  u0 = s0.u.at[3].set(0.3)
  s0 = s0.replace(u=u0)

  N = 400

  @jax.jit
  def run(s):
    def body(s, _):
      s2 = scene.step(s)
      return s2, (s2.q, s2.u)
    _, (qs, us) = jax.lax.scan(body, s, None, length=N)
    return qs, us

  qs, us = run(s0)
  np.savez(
      os.path.join(GOLDEN_DIR, "sphere_box_stack.npz"),
      q=np.asarray(qs), u=np.asarray(us),
      q0=np.asarray(s0.q), u0=np.asarray(s0.u), N=N,
  )
  print("sphere_box: final sphere z", float(qs[-1, 16]), "box z", float(qs[-1, 2]))


def golden_anymal_balance():
  """Config 3 (BASELINE.json:9): ANYmal standing balance under the implicit PD servo
  holding a perturbed stance, f64. Freezes the PD-target sequence, the applied-torque
  observable (the BASELINE.json:5 parity quantity), and the state trajectory."""
  from raisimlib_tpu.models import anymal
  from raisimlib_tpu.models.urdf import load_urdf
  from raisimlib_tpu.world import World

  bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
  world = World(dt=0.0025, dtype=jnp.float64)
  world.add_articulated_system(bodies, name="anymal", geoms=geoms)
  world.add_ground()
  scene = world.compile().set_pd_gains(100.0, 2.0)

  q0 = jnp.asarray(anymal.standing_q(), jnp.float64)
  q_stand = q0[7:]
  H = 50

  # Settle first: standing_q places the feet at exactly zero depth, a knife edge
  # where the contact-activation branch is discontinuous (measured: a 1e-7 state
  # perturbation flips it and injects a 0.37 rad/s one-step velocity transient,
  # which then contracts to zero by step ~4). The parity window must start from
  # the settled, firmly-in-contact stance, where the step map is contraction-
  # dominated and the 1e-3 gate is meaningful.
  hold = jnp.zeros((scene.model.nv,), jnp.float64).at[6:].set(q_stand)
  s0 = scene.init_state(q=q0)

  @jax.jit
  def settle(s):
    def body(s, _):
      return scene.step(s, pd_target=hold), None
    s, _ = jax.lax.scan(body, s, None, length=400)
    return s

  s0 = settle(s0)
  # lateral push so the servo has real work to do
  s0 = s0.replace(u=s0.u.at[4].set(0.4), t=jnp.zeros_like(s0.t))
  # PD target: stance + small sinusoidal knee perturbation (deterministic)
  t_idx = jnp.arange(H, dtype=jnp.float64)
  targets = jnp.tile(q_stand[None, :], (H, 1))
  targets = targets.at[:, 2::3].add(0.05 * jnp.sin(0.2 * t_idx)[:, None])
  full_targets = jnp.zeros((H, scene.model.nv), jnp.float64).at[:, 6:].set(targets)

  @jax.jit
  def run(s, tgts):
    def body(s, tgt):
      s2 = scene.step(s, pd_target=tgt)
      return s2, (s2.q, s2.u)
    _, (qs, us) = jax.lax.scan(body, s, tgts)
    return qs, us

  qs, us = run(s0, full_targets)
  np.savez(
      os.path.join(GOLDEN_DIR, "anymal_balance.npz"),
      q=np.asarray(qs), u=np.asarray(us),
      q0=np.asarray(s0.q), u0=np.asarray(s0.u),
      pd_targets=np.asarray(full_targets), H=H,
      kp=100.0, kd=2.0,
  )
  print("anymal: final base z", float(qs[-1, 2]), "max |u|", float(jnp.max(jnp.abs(us))))


def golden_anymal_trot():
  """Config 4 (BASELINE.json:10): a short open-loop trot segment on a FIXED
  procedural heightfield — the dynamic-contact-switching regime MPC operates in
  (feet lift off and touch down inside the window). Deterministic: fixed terrain
  key, fixed gait table, no sampling. Freezes states + PD targets + the
  heightfield so the f32 test reconstructs the exact scene.

  Unlike config 3's settled window, this window CROSSES contact-activation
  boundaries by design; the f32 gate tolerance is therefore measured and
  documented in tests/test_parity.py rather than assumed 1e-3 everywhere."""
  from raisimlib_tpu.models import anymal
  from raisimlib_tpu.models.urdf import load_urdf
  from raisimlib_tpu.ops import heightmap as hm
  from raisimlib_tpu.utils import terrain
  from raisimlib_tpu.world import World

  dt, substeps = 0.0025, 8
  bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
  world = World(dt=dt, dtype=jnp.float64)
  world.add_articulated_system(bodies, name="anymal", geoms=geoms)
  field = terrain.generate(
      jax.random.PRNGKey(11),
      terrain.TerrainProperties(z_scale=0.05, x_size=12.0, y_size=6.0,
                                x_samples=48, y_samples=24),
      dtype=jnp.float64)
  world.add_heightmap(field)
  scene = world.compile().set_pd_gains(120.0, 3.0)

  q0 = jnp.asarray(anymal.standing_q(), jnp.float64)
  q_stand = q0[7:]
  z_start, _, _ = hm.surface_at(field, q0[:2])
  q0 = q0.at[2].add(z_start)
  hold = jnp.zeros((scene.model.nv,), jnp.float64).at[6:].set(q_stand)

  @jax.jit
  def settle(s):
    def body(s, _):
      return scene.step(s, pd_target=hold), None
    s, _ = jax.lax.scan(body, s, None, length=400)
    return s

  s0 = settle(scene.init_state(q=q0)).replace(t=jnp.zeros((), jnp.float64))

  # open-loop trot PD-target table: stance + diagonal-pair flexion, one target
  # per control tick (0.02 s), held for `substeps` physics steps
  H_ctrl = 10                           # 0.2 s — one full swing cycle at 1.5 Hz
  t_ctrl = jnp.arange(H_ctrl, dtype=jnp.float64) * dt * substeps
  phase = 2.0 * jnp.pi * 1.5 * t_ctrl
  offsets = jnp.asarray([0.0, jnp.pi, jnp.pi, 0.0], jnp.float64)
  mirror = jnp.asarray([1.0, 1.0, -1.0, -1.0], jnp.float64)
  sw = jnp.maximum(jnp.sin(phase[:, None] + offsets[None, :]), 0.0)
  tgt = jnp.tile(q_stand[None], (H_ctrl, 1)).reshape(H_ctrl, 4, 3)
  tgt = tgt.at[:, :, 1].add(0.25 * sw * mirror[None, :])
  tgt = tgt.at[:, :, 2].add(-0.4 * sw * mirror[None, :])
  tgts_ctrl = tgt.reshape(H_ctrl, 12)
  H = H_ctrl * substeps
  full_targets = jnp.zeros((H, scene.model.nv), jnp.float64).at[:, 6:].set(
      jnp.repeat(tgts_ctrl, substeps, axis=0))

  @jax.jit
  def run(s, tgts):
    def body(s, tgt):
      s2 = scene.step(s, pd_target=tgt)
      return s2, (s2.q, s2.u)
    _, (qs, us) = jax.lax.scan(body, s, tgts)
    return qs, us

  qs, us = run(s0, full_targets)
  np.savez(
      os.path.join(GOLDEN_DIR, "anymal_trot_heightmap.npz"),
      q=np.asarray(qs), u=np.asarray(us),
      q0=np.asarray(s0.q), u0=np.asarray(s0.u),
      pd_targets=np.asarray(full_targets), H=H,
      heights=np.asarray(field.heights), kp=120.0, kd=3.0,
      torque_limit=40.0, dt=dt,
  )
  print("trot: base z span", float(qs[:, 2].min()), float(qs[:, 2].max()),
        "knee sweep", float(jnp.ptp(qs[:, 9])))


def atlas_group_gains(jmap, nv):
  """Per-joint-group servo gains (stiff legs / medium back / soft arms — the
  scenarios/atlas_batch.yaml groups). A scalar kp=8000 on the ~0.01 kg m^2
  elbow exceeds its Nyquist rate at dt=4 ms and rings at +-40 N m with f32/f64
  landing a half-cycle apart — that certifies noise, not physics."""
  kp = np.zeros(nv)
  kd = np.zeros(nv)
  for jname, dof in jmap.items():
    if "_leg_" in jname:
      kp[dof], kd[dof] = 8000.0, 300.0
    elif "back_" in jname:
      kp[dof], kd[dof] = 4000.0, 150.0
    else:                                # arms
      kp[dof], kd[dof] = 400.0, 20.0
  return kp, kd


def golden_atlas_settle():
  """Config 5 (BASELINE.json:11): Atlas humanoid settling under its PD hold —
  29 dofs, 16 foot-contact slots, per-group gains (legs 8000, back 4000, arms
  400). Freezes the settle window's states + targets; torques are O(100), so
  the f32 gate in test_parity.py is relative (1e-3 of the actuator limit)."""
  from raisimlib_tpu.models import atlas
  from raisimlib_tpu.models.urdf import load_urdf
  from raisimlib_tpu.world import World

  bodies, geoms, jmap = load_urdf(atlas.atlas_urdf())
  world = World(dt=0.004, dtype=jnp.float64)
  world.add_articulated_system(bodies, name="atlas", geoms=geoms)
  world.add_ground()
  kp_vec, kd_vec = atlas_group_gains(jmap, 6 + len(jmap))
  scene = world.compile().set_pd_gains(jnp.asarray(kp_vec), jnp.asarray(kd_vec))

  q0 = jnp.asarray(atlas.standing_q(jmap), jnp.float64)
  q_stand = q0[7:]
  hold = jnp.zeros((scene.model.nv,), jnp.float64).at[6:].set(q_stand)

  @jax.jit
  def settle(s):
    def body(s, _):
      return scene.step(s, pd_target=hold), None
    s, _ = jax.lax.scan(body, s, None, length=250)
    return s

  s0 = settle(scene.init_state(q=q0)).replace(t=jnp.zeros((), jnp.float64))
  # small lateral push + arm-target sway so the servo works during the window
  s0 = s0.replace(u=s0.u.at[4].set(0.15))
  H = 50
  t_idx = jnp.arange(H, dtype=jnp.float64)
  targets = jnp.tile(q_stand[None, :], (H, 1))
  targets = targets.at[:, 2::4].add(0.02 * jnp.sin(0.15 * t_idx)[:, None])
  full_targets = jnp.zeros((H, scene.model.nv), jnp.float64).at[:, 6:].set(targets)

  @jax.jit
  def run(s, tgts):
    def body(s, tgt):
      s2 = scene.step(s, pd_target=tgt)
      return s2, (s2.q, s2.u)
    _, (qs, us) = jax.lax.scan(body, s, tgts)
    return qs, us

  qs, us = run(s0, full_targets)
  np.savez(
      os.path.join(GOLDEN_DIR, "atlas_settle.npz"),
      q=np.asarray(qs), u=np.asarray(us),
      q0=np.asarray(s0.q), u0=np.asarray(s0.u),
      pd_targets=np.asarray(full_targets), H=H,
      kp=kp_vec, kd=kd_vec, torque_limit=300.0, dt=0.004,
  )
  print("atlas: final base z", float(qs[-1, 2]), "max |u|",
        float(jnp.max(jnp.abs(us))))


if __name__ == "__main__":
  os.makedirs(GOLDEN_DIR, exist_ok=True)
  golden_cartpole()
  golden_sphere_box()
  golden_anymal_balance()
  golden_anymal_trot()
  golden_atlas_settle()
  print("goldens written to", GOLDEN_DIR)
