"""Constraints (SURVEY.md C8 wires/pins) + joint-limit enforcement (C2).

RaiSim surface covered: `World::addStiffWire` (unilateral cable),
`CompliantLengthConstraint` (spring force element), `PinConstraint` (ball joint),
and URDF joint position limits enforced inside the solver. All are masked
pseudo-contact rows in the same Gauss-Seidel pass as the real contacts
(ops/constraints.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.models.model import JointType
from raisimlib_tpu.world import World

F64 = jnp.float64


def _rollout(scene, s0, n, pd=None):
  @jax.jit
  def run(s):
    def body(s, _):
      s2 = scene.step(s, pd_target=pd)
      return s2, (s2.q, s2.u)

    _, (qs, us) = jax.lax.scan(body, s, None, length=n)
    return qs, us

  return run(s0)


class TestJointLimits:
  def _pendulum_world(self, lo=-0.5, hi=0.5):
    """1-dof pendulum swinging in x-z from the world, limit q in [lo, hi]."""
    spec = dict(parent=-1, joint=JointType.REVOLUTE, axis=[0.0, 1.0, 0.0],
                pos=[0.0, 0.0, 1.0], mass=1.0, com=[0.0, 0.0, -0.5],
                inertia=np.diag([0.1, 0.1, 0.001]), actuated=True,
                torque_limit=50.0, q_lo=lo, q_hi=hi, name="rod")
    world = World(dt=0.002, dtype=F64)
    world.add_articulated_system([spec], name="pendulum")
    return world

  def test_limit_stops_swing(self):
    """Released at 0.4 rad the pendulum would swing to -0.4 (equilibrium is
    q=0, hanging); the lower stop at -0.25 must catch it (inelastic)."""
    world = self._pendulum_world(lo=-0.25, hi=0.5)
    scene = world.compile(joint_limits=True)
    assert scene.constraints.n_rows == 1
    s0 = scene.init_state(q=jnp.array([0.4], F64))
    qs, us = _rollout(scene, s0, 1500)
    qmin = float(qs[:, 0].min())
    assert qmin >= -0.25 - 5e-3                    # never punches through
    assert qmin <= -0.24                           # it did reach the stop
    # the stop is inelastic: post-hit swing peaks can never exceed the
    # potential height of the stop itself
    first_hit = int(np.argmax(np.asarray(qs[:, 0]) <= -0.24))
    assert float(qs[first_hit:, 0].max()) <= 0.26

  def test_limits_off_swings_through(self):
    world = self._pendulum_world(lo=-0.25, hi=0.5)
    scene = world.compile(joint_limits=False)
    assert scene.constraints.n_rows == 0
    s0 = scene.init_state(q=jnp.array([0.4], F64))
    qs, _ = _rollout(scene, s0, 1500)
    assert float(qs[:, 0].min()) < -0.35           # blows past the "limit"

  def test_anymal_respects_limits_under_aggressive_pd(self):
    from raisimlib_tpu.models import anymal
    from raisimlib_tpu.models.urdf import load_urdf

    bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
    world = World(dt=0.0025, dtype=F64)
    world.add_articulated_system(bodies, name="anymal", geoms=geoms)
    world.add_ground()
    scene = world.compile(joint_limits=True).set_pd_gains(200.0, 2.0)
    assert scene.constraints.n_rows == 12          # all 12 joints limited in URDF
    q0 = jnp.asarray(anymal.standing_q(), F64)
    s0 = scene.init_state(q=q0)
    # drive the HAA (abduction) joints far past their +-0.8 rad limit
    tgt = jnp.zeros((scene.model.nv,), F64).at[6:].set(q0[7:])
    tgt = tgt.at[6::3].set(2.0)
    qs, _ = _rollout(scene, s0, 400, pd=tgt)
    haa = np.asarray(qs[:, 7::3])                  # HAA joint angles
    assert haa.max() <= 0.8 + 2e-2, f"HAA overshoot: {haa.max()}"
    # servo really was pushing: the joints sit pinned AT the limit
    assert haa[-1].min() >= 0.75


class TestStiffWire:
  def test_sphere_on_wire_is_pendulum(self):
    """Sphere hung from a world anchor on an inextensible wire: the wire holds
    length under gravity and the system conserves energy like a pendulum."""
    world = World(dt=0.001, dtype=F64)
    h = world.add_sphere(0.05, mass=1.0, pos=(0.6, 0.0, 1.0))
    world.add_stiff_wire(-1, (0.0, 0.0, 1.6), h.body_start, (0.0, 0.0, 0.0),
                         length=0.85)
    scene = world.compile()
    assert scene.constraints.n_rows == 1
    s0 = scene.init_state()
    qs, us = _rollout(scene, s0, 2500)
    anchor = np.array([0.0, 0.0, 1.6])
    d = np.linalg.norm(np.asarray(qs[:, :3]) - anchor, axis=1)
    # starts slack at ~0.849 (inside), goes taut, never stretches past ~L
    assert d.max() <= 0.85 + 5e-3
    # swings: x must cross zero (pendulum), not just hang
    assert float(qs[:, 0].min()) < -0.3

  def test_wire_never_pushes(self):
    """A sphere ABOVE its anchor distance (slack wire) is in free fall."""
    world = World(dt=0.002, dtype=F64)
    h = world.add_sphere(0.05, mass=1.0, pos=(0.0, 0.0, 1.0))
    world.add_stiff_wire(-1, (0.0, 0.0, 1.2), h.body_start, (0.0, 0.0, 0.0),
                         length=0.8)
    scene = world.compile()
    s0 = scene.init_state()
    qs, _ = _rollout(scene, s0, 100)
    t = 100 * 0.002
    z_ballistic = 1.0 - 0.5 * 9.81 * t * t
    # slack phase: pure ballistic fall (wire taut only after dropping 0.6)
    assert abs(float(qs[-1, 2]) - z_ballistic) < 1e-2


class TestCompliantWire:
  def test_spring_settles_at_force_balance(self):
    """m g = k (l - L): sphere on a soft cable settles below rest length."""
    k = 200.0
    world = World(dt=0.001, dtype=F64)
    h = world.add_sphere(0.05, mass=1.0, pos=(0.0, 0.0, 0.95))
    world.add_compliant_wire(-1, (0.0, 0.0, 1.5), h.body_start, (0.0, 0.0, 0.0),
                             length=0.5, stiffness=k, damping=30.0)
    scene = world.compile()
    s0 = scene.init_state()
    qs, us = _rollout(scene, s0, 4000)
    z_eq = 1.5 - (0.5 + 1.0 * 9.81 / k)
    assert abs(float(qs[-1, 2]) - z_eq) < 5e-3
    assert abs(float(us[-1, 5])) < 1e-2            # settled


class TestPin:
  def test_pinned_box_swings_and_holds_anchor(self):
    """Box pinned at a corner to the world: the pin point must stay fixed while
    the body swings as a rigid pendulum about it."""
    from raisimlib_tpu.ops.spatial import quat_to_mat

    world = World(dt=0.001, dtype=F64)
    h = world.add_box((0.2, 0.05, 0.05), mass=1.0, pos=(0.2, 0.0, 1.0))
    corner = (-0.2, 0.0, 0.0)                      # body-local attach point
    world.add_pin(h.body_start, corner, -1, (0.0, 0.0, 1.0))
    scene = world.compile()
    s0 = scene.init_state()
    qs, us = _rollout(scene, s0, 2000)

    # pin error along the whole trajectory
    errs = []
    for t in range(0, 2000, 200):
      R = np.asarray(quat_to_mat(qs[t, 3:7]))
      p_w = np.asarray(qs[t, :3]) + R @ np.asarray(corner)
      errs.append(np.linalg.norm(p_w - np.array([0.0, 0.0, 1.0])))
    assert max(errs) < 2e-3, f"pin drift {max(errs)}"
    # and it actually swung (center dropped below the anchor height)
    assert float(qs[:, 2].min()) < 0.92


class TestBatchedParity:
  def test_step_batch_matches_vmap_step_with_constraints(self):
    """The Pallas kind-specialized rows (lin + bilateral) must match the pure
    solver's generic path (run in interpret mode on CPU)."""
    from raisimlib_tpu.models import anymal
    from raisimlib_tpu.models.urdf import load_urdf

    bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
    world = World(dt=0.0025, dtype=jnp.float32)
    world.add_articulated_system(bodies, name="anymal", geoms=geoms)
    world.add_ground()
    scene = world.compile(joint_limits=True).set_pd_gains(100.0, 2.0)
    q0 = jnp.asarray(anymal.standing_q(), jnp.float32)
    B = 4
    key = jax.random.PRNGKey(3)
    dq = 0.05 * jax.random.normal(key, (B, scene.model.nq), jnp.float32)
    s0 = scene.init_state(q=q0)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), s0)
    states = states.replace(q=states.q + dq)
    tgt = jnp.zeros((B, scene.model.nv), jnp.float32).at[:, 6:].set(q0[7:][None])
    # drive HAA joints to the limit so the lin rows actually activate
    tgt = tgt.at[:, 6::3].set(1.5)
    tau = jnp.zeros((B, scene.model.nv), jnp.float32)

    s_ref = states
    s_bat = states
    for _ in range(5):
      s_ref = jax.jit(jax.vmap(lambda s, t, p: scene.step(s, t, p)))(s_ref, tau, tgt)
      s_bat = jax.jit(lambda s, t, p: scene.step_batch(s, t, p))(s_bat, tau, tgt)
    np.testing.assert_allclose(np.asarray(s_bat.q), np.asarray(s_ref.q),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_bat.u), np.asarray(s_ref.u),
                               atol=2e-3)
