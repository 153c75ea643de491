"""Contact pipeline tests: cone-solve KKT correctness, impact/restitution/friction
physics, and the sphere+box stack config (BASELINE.json config 2, SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.ops import contact as ct
from raisimlib_tpu.world import World


def _rand_spd(rng, scale=1.0):
  A = rng.normal(size=(3, 3))
  return jnp.asarray(A @ A.T + 0.5 * np.eye(3)) * scale


class TestConeSolve:
  def test_stick_recovered_exactly(self, rng):
    for _ in range(20):
      G = _rand_spd(rng)
      mu = 0.7
      lam_n = abs(rng.normal()) + 0.5
      t = rng.normal(size=2)
      t = t / np.linalg.norm(t) * 0.5 * mu * lam_n  # strictly inside cone
      lam_true = jnp.asarray([t[0], t[1], lam_n])
      c = -G @ lam_true
      lam = ct.cone_solve(G, c, mu)
      np.testing.assert_allclose(lam, lam_true, atol=1e-9)

  def test_open_contact_zero(self, rng):
    for _ in range(20):
      G = _rand_spd(rng)
      mu = 0.6
      ct_xy = rng.normal(size=2)
      cz = abs(rng.normal()) + 1e-3  # separating: v_n with lam=0 is positive
      c = jnp.asarray([ct_xy[0], ct_xy[1], cz])
      lam = ct.cone_solve(G, c, mu)
      np.testing.assert_allclose(lam, np.zeros(3), atol=1e-8)

  def test_complementarity(self, rng):
    """Signorini + Coulomb conditions hold in every case: lam in cone, v_n+ >= 0,
    lam_n * v_n+ = 0."""
    for _ in range(30):
      G = _rand_spd(rng)
      c = jnp.asarray(rng.normal(size=3) * 2.0)
      mu = float(abs(rng.normal())) * 0.8 + 0.1
      lam = ct.cone_solve(G, c, mu)
      v_plus = np.asarray(G @ lam + c)
      lam = np.asarray(lam)
      assert lam[2] >= -1e-9
      assert np.linalg.norm(lam[:2]) <= mu * lam[2] + 1e-6
      assert v_plus[2] >= -1e-6
      assert abs(lam[2] * v_plus[2]) < 1e-5

  def test_slip_kkt(self, rng):
    """In the slip case: v_n+ = 0 exactly, lam on cone boundary, E minimal on the
    constrained curve (max dissipation)."""
    n_slip = 0
    for _ in range(20):
      G = _rand_spd(rng)
      mu = 0.4
      c = jnp.asarray([2.0 * rng.normal(), 2.0 * rng.normal(), -abs(rng.normal()) - 1.0])
      lam = ct.cone_solve(G, c, mu)
      v_plus = G @ lam + c
      lam_stick = -jnp.linalg.solve(G, c)
      stick_feasible = (lam_stick[2] > 0) and (
          np.linalg.norm(lam_stick[:2]) <= mu * lam_stick[2]
      )
      if stick_feasible:
        np.testing.assert_allclose(v_plus, np.zeros(3), atol=1e-7)
        continue
      n_slip += 1
      # boundary: |lam_t| = mu lam_n, v_n+ = 0 exactly (no launch artifact)
      np.testing.assert_allclose(np.linalg.norm(lam[:2]), mu * float(lam[2]), rtol=1e-5)
      np.testing.assert_allclose(float(v_plus[2]), 0.0, atol=1e-7)
      # theta-optimality: sampled points on the constrained curve can't beat it
      E = lambda l: float(0.5 * l @ G @ l + l @ c)
      Gn = np.asarray(G)
      for th in np.linspace(0, 2 * np.pi, 181):
        d = np.array([mu * np.cos(th), mu * np.sin(th), 1.0])
        gdz = (Gn @ d)[2]
        if gdz <= 1e-12:
          continue
        s = -float(c[2]) / gdz
        if s <= 0:
          continue
        assert E(jnp.asarray(s * d)) >= E(lam) - 1e-6
    assert n_slip > 0  # the construction should hit slip cases


def drop_scene(obj="sphere", mu=0.8, e=0.0, z0=0.5, dt=1e-3):
  world = World(dt=dt)
  m = world.add_material(mu=mu, restitution=e, threshold=0.05 if e > 0 else 0.001)
  world.add_ground(material=m)
  if obj == "sphere":
    world.add_sphere(radius=0.1, mass=1.0, material=m, pos=(0.0, 0.0, z0))
  else:
    world.add_box((0.1, 0.1, 0.1), mass=1.0, material=m, pos=(0.0, 0.0, z0))
  return world.compile()


def rollout(scene, state, n, tau=None):
  def body(s, _):
    return scene.step(s), None

  return jax.lax.scan(body, state, None, length=n)[0]


class TestSingleContacts:
  def test_sphere_settles_on_plane(self):
    scene = drop_scene("sphere", z0=0.3)
    s = scene.init_state()
    s = jax.jit(lambda s: rollout(scene, s, 600))(s)
    # resting height = radius (within slop), zero velocity
    assert abs(float(s.q[2]) - 0.1) < 2e-3, s.q
    assert float(jnp.linalg.norm(s.u)) < 1e-3
    # penetration bounded
    assert float(s.q[2]) > 0.1 - 2e-3

  def test_box_settles_flat(self):
    scene = drop_scene("box", z0=0.2)
    s = scene.init_state()
    s = jax.jit(lambda s: rollout(scene, s, 600))(s)
    assert abs(float(s.q[2]) - 0.1) < 3e-3
    # orientation unchanged (flat drop)
    np.testing.assert_allclose(np.asarray(s.q[3:7]), [1, 0, 0, 0], atol=1e-5)
    assert float(jnp.linalg.norm(s.u)) < 1e-3

  def test_restitution_bounce(self):
    e = 0.8
    z0, r = 0.5, 0.1
    scene = drop_scene("sphere", e=e, z0=z0)
    s = scene.init_state()

    def body(s, _):
      s = scene.step(s)
      return s, s.q[2]

    _, zs = jax.jit(lambda s: jax.lax.scan(body, s, None, length=1500))(s)
    zs = np.asarray(zs)
    # first bounce apex ~ e^2 * initial drop height (above contact)
    drop_h = z0 - r
    # find apex after first impact
    impact_idx = int(np.argmax(zs < r + 1e-4))
    apex = float(np.max(zs[impact_idx:])) - r
    assert abs(apex - e * e * drop_h) / drop_h < 0.12, (apex, e * e * drop_h)

  def test_friction_decelerates_sliding_box(self):
    mu = 0.5
    scene = drop_scene("box", mu=mu, z0=0.1)  # start touching
    s = scene.init_state()
    s = s.replace(u=s.u.at[3].set(2.0))  # slide +x at 2 m/s

    def body(s, _):
      s = scene.step(s)
      return s, s.u[3]

    _, vx = jax.jit(lambda s: jax.lax.scan(body, s, None, length=500))(s)
    vx = np.asarray(vx)
    # deceleration during slide ~ mu*g
    decel = (vx[49] - vx[249]) / 0.2
    assert abs(decel - mu * 9.81) / (mu * 9.81) < 0.05, decel
    # eventually stops and stays stopped
    assert abs(vx[-1]) < 1e-3

  def test_frictionless_box_keeps_sliding(self):
    scene = drop_scene("box", mu=0.0, z0=0.1)
    s = scene.init_state()
    s = s.replace(u=s.u.at[3].set(2.0))
    s = jax.jit(lambda s: rollout(scene, s, 300))(s)
    assert abs(float(s.u[3]) - 2.0) < 1e-4

  def test_sliding_sphere_transitions_to_rolling(self):
    mu = 0.4
    scene = drop_scene("sphere", mu=mu, z0=0.1)
    s = scene.init_state()
    s = s.replace(u=s.u.at[3].set(3.0))
    s = jax.jit(lambda s: rollout(scene, s, 1500))(s)
    v = float(s.u[3])
    w = float(s.u[1])  # omega_y (rolling about +y for +x motion)
    r = 0.1
    # rolling without slipping: v = w * r; and v = 5/7 v0 for solid sphere
    assert abs(v - w * r) < 5e-3, (v, w * r)
    assert abs(v - 5.0 / 7.0 * 3.0) < 0.05


class TestTwoBody:
  def test_equal_mass_elastic_head_on(self):
    world = World(dt=1e-3, gravity=(0.0, 0.0, 0.0))
    m = world.add_material(mu=0.0, restitution=1.0, threshold=0.01)
    world.add_sphere(radius=0.1, mass=1.0, material=m, pos=(-0.3, 0.0, 0.0), name="a")
    world.add_sphere(radius=0.1, mass=1.0, material=m, pos=(0.3, 0.0, 0.0), name="b")
    scene = world.compile()
    s = scene.init_state()
    u = s.u.at[3].set(1.0).at[9].set(-1.0)  # approach at +-1 m/s
    s = s.replace(u=u)
    s = jax.jit(lambda s: rollout(scene, s, 400))(s)
    # velocities swap (equal mass elastic)
    assert abs(float(s.u[3]) + 1.0) < 0.05, s.u
    assert abs(float(s.u[9]) - 1.0) < 0.05, s.u

  def test_sphere_box_stack_stable(self):
    """BASELINE config 2: sphere on box on ground, stable for 2 simulated seconds."""
    world = World(dt=1e-3)
    world.add_box((0.15, 0.15, 0.15), mass=2.0, pos=(0.0, 0.0, 0.15), name="box")
    world.add_sphere(radius=0.1, mass=0.5, pos=(0.0, 0.0, 0.4), name="sphere")
    world.add_ground()
    scene = world.compile()
    s = scene.init_state()
    s = jax.jit(lambda s: rollout(scene, s, 2000))(s)
    # box stays put, sphere rests on top of box
    assert abs(float(s.q[2]) - 0.15) < 5e-3, s.q
    box_quat = np.asarray(s.q[3:7])
    np.testing.assert_allclose(box_quat, [1, 0, 0, 0], atol=1e-3)
    sphere_z = float(s.q[9])
    assert abs(sphere_z - 0.4) < 1e-2, sphere_z
    # everything at rest
    assert float(jnp.max(jnp.abs(s.u))) < 5e-3

  def test_momentum_conservation_offcenter(self, rng):
    """Zero gravity, frictionless collision: total linear momentum conserved."""
    world = World(dt=1e-3, gravity=(0.0, 0.0, 0.0))
    m = world.add_material(mu=0.0, restitution=0.5, threshold=0.01)
    world.add_sphere(radius=0.12, mass=1.5, material=m, pos=(-0.3, 0.02, 0.0), name="a")
    world.add_sphere(radius=0.1, mass=0.7, material=m, pos=(0.3, -0.03, 0.0), name="b")
    scene = world.compile()
    s = scene.init_state()
    u = s.u.at[3].set(1.2).at[9].set(-0.8)
    s = s.replace(u=u)
    p0 = 1.5 * np.asarray(s.u[3:6]) + 0.7 * np.asarray(s.u[9:12])
    s = jax.jit(lambda s: rollout(scene, s, 500))(s)
    p1 = 1.5 * np.asarray(s.u[3:6]) + 0.7 * np.asarray(s.u[9:12])
    np.testing.assert_allclose(p1, p0, atol=1e-6)


def test_tune_sweeps_small_scene():
  """tune_sweeps returns a small count on an easy scene (1 contact) and the
  reported error really is the one-step error at that count."""
  import jax
  import jax.numpy as jnp

  from raisimlib_tpu.utils.profiling import tune_sweeps
  from raisimlib_tpu.world import World
  from raisimlib_tpu.ops.integrator import State

  world = World(dt=0.002, dtype=jnp.float32)
  world.add_ground()
  world.add_sphere(0.1, 1.0, pos=(0.0, 0.0, 0.09))
  scene = world.compile(joint_limits=False)
  B = 8
  rng = np.random.default_rng(0)
  q = np.tile(np.asarray(scene.init_state().q)[None], (B, 1)).astype(np.float32)
  q[:, 2] += 0.01 * rng.random(B).astype(np.float32)
  u = 0.3 * rng.standard_normal((B, 6)).astype(np.float32)
  states = State(q=jnp.asarray(q), u=jnp.asarray(u),
                 t=jnp.zeros((B,), jnp.float32))
  tau = jnp.zeros((B, 6), jnp.float32)
  sweeps, err = tune_sweeps(scene, states, tau, tol=1e-4)
  assert sweeps <= 12
  assert err <= 1e-4
