"""Dynamics-kernel tests: ABA/CRBA/RNEA consistency + MuJoCo cross-validation.

SURVEY.md §4.1-4.2: the reference ships no tests (compile-only CI); correctness is
established here via algebraic identities (M qdd + h = tau round trips) and MuJoCo 3.10
as an independent oracle for identical models.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.models import primitives
from raisimlib_tpu.ops import dynamics, integrator, spatial as sp

G = jnp.array([0.0, 0.0, -9.81])
F64 = jnp.float64


def models(dtype=F64):
  return {
      "pendulum": primitives.pendulum(dtype=dtype),
      "double_pendulum": primitives.double_pendulum(m1=1.3, m2=0.7, l1=0.9, l2=1.1, dtype=dtype),
      "cartpole": primitives.cartpole(dtype=dtype),
      "free_box": primitives.free_box(m=2.0, half_extents=(0.1, 0.2, 0.3), dtype=dtype),
  }


def random_state(model, rng, scale=1.0):
  q = np.array(model.q_init, dtype=np.float64)
  from raisimlib_tpu.models.model import JointType

  for i in range(model.nb):
    qa = model.q_adr[i]
    if JointType(model.joint_types[i]) == JointType.FREE:
      q[qa : qa + 3] = rng.normal(size=3) * scale
      quat = rng.normal(size=4)
      q[qa + 3 : qa + 7] = quat / np.linalg.norm(quat)
    else:
      q[qa] = rng.normal() * scale
  u = rng.normal(size=model.nv) * scale
  return jnp.asarray(q), jnp.asarray(u)


class TestConsistency:
  @pytest.mark.parametrize("name", ["pendulum", "double_pendulum", "cartpole", "free_box"])
  def test_crba_matches_rnea_columns(self, name, rng):
    model = models()[name]
    q, _ = random_state(model, rng)
    zero_g = jnp.zeros(3)
    M = dynamics.crba(model, q)
    # M e_i = rnea(q, 0, e_i) with zero gravity and zero velocity
    for i in range(model.nv):
      e = jnp.zeros(model.nv, dtype=F64).at[i].set(1.0)
      col = dynamics.rnea(model, q, jnp.zeros(model.nv, dtype=F64), e, zero_g)
      np.testing.assert_allclose(M[:, i], col, atol=1e-10, err_msg=f"{name} col {i}")

  @pytest.mark.parametrize("name", ["pendulum", "double_pendulum", "cartpole", "free_box"])
  def test_aba_inverts_rnea(self, name, rng):
    model = models()[name]
    for _ in range(5):
      q, u = random_state(model, rng)
      tau = jnp.asarray(rng.normal(size=model.nv))
      qdd = dynamics.aba(model, q, u, tau, G)
      tau_back = dynamics.rnea(model, q, u, qdd, G)
      np.testing.assert_allclose(tau_back, tau, atol=1e-8, err_msg=name)

  @pytest.mark.parametrize("name", ["double_pendulum", "free_box"])
  def test_aba_with_external_force(self, name, rng):
    model = models()[name]
    q, u = random_state(model, rng)
    tau = jnp.asarray(rng.normal(size=model.nv))
    f_ext = jnp.asarray(rng.normal(size=(model.nb, 6)))
    qdd = dynamics.aba(model, q, u, tau, G, f_ext)
    tau_back = dynamics.rnea(model, q, u, qdd, G, f_ext)
    np.testing.assert_allclose(tau_back, tau, atol=1e-8)

  @pytest.mark.parametrize("name", ["pendulum", "double_pendulum", "cartpole", "free_box"])
  def test_crba_w_matches_crba(self, name, rng):
    """The einsum (world-frame congruence) CRBA equals the Featherstone recursion."""
    model = models()[name]
    for _ in range(5):
      q, u = random_state(model, rng)
      M_ref = dynamics.crba(model, q)
      M_w = dynamics.crba_w(model, q)
      np.testing.assert_allclose(M_w, M_ref, atol=1e-9, err_msg=name)
      # also with a shared FK (the hot-path form)
      kin = dynamics.fk(model, q, u)
      np.testing.assert_allclose(dynamics.crba_w(model, q, kin), M_ref, atol=1e-9)

  def test_crba_w_anymal(self, rng):
    from raisimlib_tpu.models import anymal
    from raisimlib_tpu.models.model import build_model
    from raisimlib_tpu.models.urdf import load_urdf
    bodies, _, _ = load_urdf(anymal.anymal_urdf())
    model = build_model("anymal", bodies, dtype=F64)
    q, _ = random_state(model, rng, scale=0.4)
    np.testing.assert_allclose(
        dynamics.crba_w(model, q), dynamics.crba(model, q), atol=1e-8)

  def test_unrolled_linalg_matches_lapack(self, rng):
    from raisimlib_tpu.ops import linalg
    A = rng.normal(size=(7, 7))
    A = jnp.asarray(A @ A.T + 7 * np.eye(7))
    B = jnp.asarray(rng.normal(size=(7, 4)))
    L = linalg.chol(A)
    np.testing.assert_allclose(L, np.linalg.cholesky(A), atol=1e-10)
    np.testing.assert_allclose(
        linalg.cho_solve(L, B), np.linalg.solve(A, B), atol=1e-9)
    # batched leading axes
    Ab = jnp.stack([A, 2.0 * A])
    Bb = jnp.stack([B, B])
    X = linalg.spd_solve(Ab, Bb)
    np.testing.assert_allclose(X[0], np.linalg.solve(A, B), atol=1e-9)
    np.testing.assert_allclose(X[1], np.linalg.solve(2 * A, B), atol=1e-9)

  @pytest.mark.parametrize("name", ["double_pendulum", "cartpole", "free_box"])
  def test_mass_matrix_spd(self, name, rng):
    model = models()[name]
    q, _ = random_state(model, rng)
    M = np.asarray(dynamics.crba(model, q))
    np.testing.assert_allclose(M, M.T, atol=1e-10)
    assert (np.linalg.eigvalsh(M) > 1e-9).all()

  def test_point_jacobian_matches_velocity(self, rng):
    model = models()["double_pendulum"]
    q, u = random_state(model, rng)
    kin = dynamics.fk(model, q, u)
    for body in range(model.nb):
      pt = kin.p[body] + kin.R[body] @ jnp.array([0.05, -0.02, -0.4])
      J = dynamics.point_jacobian(model, kin, body, pt)
      v_ref = dynamics.point_velocity(kin, body, pt)
      np.testing.assert_allclose(J @ u, v_ref, atol=1e-10)

  def test_point_jacobian_floating(self, rng):
    model = models()["free_box"]
    q, u = random_state(model, rng)
    kin = dynamics.fk(model, q, u)
    pt = kin.p[0] + kin.R[0] @ jnp.array([0.1, 0.2, 0.3])
    J = dynamics.point_jacobian(model, kin, 0, pt)
    np.testing.assert_allclose(J @ u, dynamics.point_velocity(kin, 0, pt), atol=1e-10)


class TestPhysicalInvariants:
  def test_double_pendulum_energy_conservation(self):
    model = models()["double_pendulum"]
    q = jnp.array([1.2, -0.6])
    u = jnp.array([0.3, -0.2])
    state = integrator.init_state(model, q, u)
    dt = 1e-4
    e0 = sum(dynamics.energy(model, q, u, G))

    def body(state, _):
      s = integrator.step_smooth(model, state, jnp.zeros(2, dtype=F64), G, dt)
      return s, None

    state, _ = jax.lax.scan(body, state, None, length=5000)
    e1 = sum(dynamics.energy(model, state.q, state.u, G))
    assert abs(e1 - e0) / abs(e0) < 2e-3

  def test_free_box_ballistic(self):
    model = models()["free_box"]
    v0_world = np.array([1.0, 0.5, 2.0])
    w0_body = np.array([3.0, 0.0, 0.0])  # spin about principal axis -> constant
    u = jnp.asarray(np.concatenate([w0_body, v0_world]))  # u = [w_body, v_world]
    state = integrator.init_state(model, model.q_init, u)
    dt = 1e-3
    T = 500

    def body(state, _):
      s = integrator.step_smooth(model, state, jnp.zeros(6, dtype=F64), G, dt)
      return s, None

    state, _ = jax.lax.scan(body, state, None, length=T)
    t = T * dt
    # semi-implicit Euler integrates position with v_{k+1}: discrete-exact solution is
    # p = p0 + v0 t + g (t^2 + t dt)/2
    p_expected = v0_world * t + 0.5 * np.array([0.0, 0.0, -9.81]) * (t * t + t * dt)
    np.testing.assert_allclose(state.q[:3], p_expected, atol=1e-8)
    # spin about a principal axis is preserved
    np.testing.assert_allclose(state.u[:3], w0_body, atol=1e-8)

  def test_free_box_angular_momentum_conserved(self):
    # torque-free tumbling: world-frame angular momentum constant even off-axis
    model = models()["free_box"]
    u = jnp.asarray(np.array([2.0, 1.5, -1.0, 0.0, 0.0, 0.0]))
    state = integrator.init_state(model, model.q_init, u)
    zero_g = jnp.zeros(3)
    I_body = np.asarray(model.inertia[0])[:3, :3]

    def L_world(state):
      R = sp.quat_to_mat(state.q[3:7])
      return R @ (I_body @ state.u[:3])

    L0 = L_world(state)
    dt = 1e-4

    def body(state, _):
      return integrator.step_smooth(model, state, jnp.zeros(6, dtype=F64), zero_g, dt), None

    state, _ = jax.lax.scan(body, state, None, length=5000)
    np.testing.assert_allclose(L_world(state), L0, atol=2e-3)


class TestMuJoCoOracle:
  """Cross-validate against MuJoCo 3.10 on identical models (SURVEY.md §4.2)."""

  def _mj_double_pendulum(self):
    import mujoco

    xml = """
    <mujoco>
      <option gravity="0 0 -9.81"/>
      <worldbody>
        <body name="link1" pos="0 0 0">
          <joint name="j1" type="hinge" axis="0 1 0"/>
          <inertial pos="0 0 -0.45" mass="1.3" diaginertia="0.08775 0.08775 1.3e-8"/>
          <body name="link2" pos="0 0 -0.9">
            <joint name="j2" type="hinge" axis="0 1 0"/>
            <inertial pos="0 0 -0.55" mass="0.7" diaginertia="0.0705833333333 0.0705833333333 7e-9"/>
          </body>
        </body>
      </worldbody>
    </mujoco>
    """
    return mujoco.MjModel.from_xml_string(xml)

  def test_double_pendulum_vs_mujoco(self, rng):
    import mujoco

    mj_model = self._mj_double_pendulum()
    mj_data = mujoco.MjData(mj_model)
    model = primitives.double_pendulum(m1=1.3, m2=0.7, l1=0.9, l2=1.1, dtype=F64)

    for _ in range(5):
      q = rng.normal(size=2)
      v = rng.normal(size=2)
      tau = rng.normal(size=2)

      mj_data.qpos[:] = q
      mj_data.qvel[:] = v
      mj_data.ctrl = 0
      mj_data.qfrc_applied[:] = tau
      mujoco.mj_forward(mj_model, mj_data)

      M_mj = np.zeros((2, 2))
      mujoco.mj_fullM(mj_model, mj_data, M_mj)
      M = dynamics.crba(model, jnp.asarray(q))
      np.testing.assert_allclose(M, M_mj, rtol=1e-8, atol=1e-10)

      h = dynamics.nonlinearities(model, jnp.asarray(q), jnp.asarray(v), G)
      np.testing.assert_allclose(h, mj_data.qfrc_bias, rtol=1e-7, atol=1e-9)

      qdd = dynamics.aba(model, jnp.asarray(q), jnp.asarray(v), jnp.asarray(tau), G)
      np.testing.assert_allclose(qdd, mj_data.qacc, rtol=1e-6, atol=1e-8)

  def test_free_box_vs_mujoco(self, rng):
    import mujoco

    xml = """
    <mujoco>
      <option gravity="0 0 -9.81"/>
      <worldbody>
        <body name="box" pos="0 0 0">
          <freejoint/>
          <inertial pos="0.02 -0.01 0.03" mass="2.0" diaginertia="0.05 0.08 0.11"/>
        </body>
      </worldbody>
    </mujoco>
    """
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_data = mujoco.MjData(mj_model)

    from raisimlib_tpu.models.model import JointType, build_model

    model = build_model(
        "box",
        [dict(parent=-1, joint=JointType.FREE, mass=2.0, com=[0.02, -0.01, 0.03],
              inertia=np.diag([0.05, 0.08, 0.11]), actuated=False)],
        dtype=F64,
    )

    for _ in range(5):
      pos = rng.normal(size=3)
      quat = rng.normal(size=4)
      quat /= np.linalg.norm(quat)
      R = np.asarray(sp.quat_to_mat(jnp.asarray(quat)))
      w_body = rng.normal(size=3)
      v_world = rng.normal(size=3)

      # MuJoCo free-joint qvel: linear velocity in WORLD frame, angular in BODY frame —
      # the same convention as ours (u = [w_body, v_world], but ordered [lin, ang]).
      mj_data.qpos[:3] = pos
      mj_data.qpos[3:7] = quat
      mj_data.qvel[:3] = v_world
      mj_data.qvel[3:6] = w_body
      mujoco.mj_forward(mj_model, mj_data)

      q = jnp.asarray(np.concatenate([pos, quat]))
      u = jnp.asarray(np.concatenate([w_body, v_world]))
      qdd = np.asarray(dynamics.aba(model, q, u, jnp.zeros(6, dtype=F64), G))

      np.testing.assert_allclose(qdd[3:], mj_data.qacc[:3], rtol=1e-6, atol=1e-8)
      np.testing.assert_allclose(qdd[:3], mj_data.qacc[3:6], rtol=1e-6, atol=1e-8)


class TestNonlinearitiesW:
  """nonlinearities_w (world-frame einsum RNEA) == nonlinearities (recursion),
  across every joint family, to f64 round-off."""

  def _models(self):
    from raisimlib_tpu.models import anymal, primitives
    from raisimlib_tpu.models.model import JointType, build_model
    from raisimlib_tpu.models.urdf import load_urdf

    out = {"cartpole": primitives.cartpole(dtype=jnp.float64),
           "double_pendulum": primitives.double_pendulum(dtype=jnp.float64),
           "free_box": primitives.free_box(dtype=jnp.float64)}
    bodies, _, _ = load_urdf(anymal.anymal_urdf())
    out["anymal"] = build_model("anymal", bodies, dtype=jnp.float64)
    r, l, m = 0.02, 0.5, 1.0
    Ixx = m * (3 * r * r + l * l) / 12.0
    I = np.diag([Ixx, Ixx, 0.5 * m * r * r])
    out["ball_chain"] = build_model("bc", [
        dict(parent=-1, joint=JointType.SPHERICAL, mass=m, com=[0, 0, -l / 2],
             inertia=I, actuated=True, name="a"),
        dict(parent=0, joint=JointType.SPHERICAL, mass=m, com=[0, 0, -l / 2],
             inertia=I, actuated=True, pos=[0, 0, -l], name="b"),
    ], dtype=jnp.float64)
    return out

  def test_matches_rnea_all_models(self, rng):
    from raisimlib_tpu.ops.dynamics import nonlinearities, nonlinearities_w

    G = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)
    for name, model in self._models().items():
      for _ in range(3):
        q = np.asarray(model.q_init, np.float64).copy()
        q += 0.3 * rng.normal(size=q.shape)
        # renormalize any quaternion blocks
        from raisimlib_tpu.models.model import JointType

        for i in range(model.nb):
          jt = JointType(model.joint_types[i])
          qa = model.q_adr[i]
          if jt == JointType.FREE:
            q[qa + 3 : qa + 7] /= np.linalg.norm(q[qa + 3 : qa + 7])
          elif jt == JointType.SPHERICAL:
            q[qa : qa + 4] /= np.linalg.norm(q[qa : qa + 4])
        u = rng.normal(size=(model.nv,))
        h_ref = np.asarray(nonlinearities(model, jnp.asarray(q), jnp.asarray(u), G))
        h_w = np.asarray(nonlinearities_w(model, jnp.asarray(q), jnp.asarray(u), G))
        np.testing.assert_allclose(h_w, h_ref, rtol=1e-9, atol=1e-10,
                                   err_msg=name)

  def test_matches_with_external_force(self, rng):
    from raisimlib_tpu.models import primitives
    from raisimlib_tpu.ops.dynamics import nonlinearities, nonlinearities_w

    model = primitives.free_box(dtype=jnp.float64)
    G = jnp.asarray([0.0, 0.0, -9.81], jnp.float64)
    q = np.asarray(model.q_init, np.float64).copy()
    q[3:7] = [0.9, 0.1, 0.3, -0.2]
    q[3:7] /= np.linalg.norm(q[3:7])
    u = rng.normal(size=(model.nv,))
    fext = jnp.asarray(rng.normal(size=(model.nb, 6)))
    h_ref = np.asarray(nonlinearities(model, jnp.asarray(q), jnp.asarray(u), G,
                                      fext))
    h_w = np.asarray(nonlinearities_w(model, jnp.asarray(q), jnp.asarray(u), G,
                                      f_ext_w=fext))
    np.testing.assert_allclose(h_w, h_ref, rtol=1e-9, atol=1e-10)


class TestLevelParallelFK:
  """fk (level-parallel, batched groups) == fk_reference (per-body recursion)
  for every joint family and tree shape, all KinData fields, f64 round-off."""

  def test_matches_reference(self, rng):
    from raisimlib_tpu.models import anymal, atlas, primitives
    from raisimlib_tpu.models.model import JointType, build_model
    from raisimlib_tpu.models.urdf import load_urdf
    from raisimlib_tpu.ops.dynamics import fk_levels as fk, fk_reference

    models = {"cartpole": primitives.cartpole(dtype=jnp.float64),
              "double_pendulum": primitives.double_pendulum(dtype=jnp.float64),
              "free_box": primitives.free_box(dtype=jnp.float64)}
    bodies, _, _ = load_urdf(anymal.anymal_urdf())
    models["anymal"] = build_model("anymal", bodies, dtype=jnp.float64)
    bodies, _, _ = load_urdf(atlas.atlas_urdf())
    models["atlas"] = build_model("atlas", bodies, dtype=jnp.float64)
    r, l, m = 0.02, 0.5, 1.0
    Ixx = m * (3 * r * r + l * l) / 12.0
    I = np.diag([Ixx, Ixx, 0.5 * m * r * r])
    models["ball_chain"] = build_model("bc", [
        dict(parent=-1, joint=JointType.SPHERICAL, mass=m, com=[0, 0, -l / 2],
             inertia=I, name="a"),
        dict(parent=0, joint=JointType.SPHERICAL, mass=m, com=[0, 0, -l / 2],
             inertia=I, pos=[0, 0, -l], name="b"),
    ], dtype=jnp.float64)

    for name, model in models.items():
      for _ in range(3):
        q = np.asarray(model.q_init, np.float64).copy()
        q += 0.3 * rng.normal(size=q.shape)
        for i in range(model.nb):
          jt = JointType(model.joint_types[i])
          qa = model.q_adr[i]
          if jt == JointType.FREE:
            q[qa + 3 : qa + 7] /= np.linalg.norm(q[qa + 3 : qa + 7])
          elif jt == JointType.SPHERICAL:
            q[qa : qa + 4] /= np.linalg.norm(q[qa : qa + 4])
        u = rng.normal(size=(model.nv,))
        ka = fk(model, jnp.asarray(q), jnp.asarray(u))
        kb = fk_reference(model, jnp.asarray(q), jnp.asarray(u))
        for field in ("R", "p", "S_w", "vel6", "Xup_E", "Xup_r"):
          np.testing.assert_allclose(
              np.asarray(getattr(ka, field)), np.asarray(getattr(kb, field)),
              rtol=1e-9, atol=1e-10, err_msg=f"{name}.{field}")
