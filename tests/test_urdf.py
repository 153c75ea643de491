"""URDF loader + ANYmal model tests: structure, MuJoCo oracle on the same URDF,
and PD-servo standing (BASELINE config 3 precursor)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.models import anymal
from raisimlib_tpu.models.model import JointType, build_model
from raisimlib_tpu.models.urdf import load_urdf
from raisimlib_tpu.ops import dynamics
from raisimlib_tpu.world import World

G = jnp.array([0.0, 0.0, -9.81])


def build_anymal(dtype=jnp.float64):
  bodies, geoms, jmap = load_urdf(anymal.anymal_urdf())
  model = build_model("anymal", bodies, dtype=dtype)
  return model, bodies, geoms, jmap


class TestParser:
  def test_structure(self):
    model, bodies, geoms, jmap = build_anymal()
    # base + 4 legs x 3 links (feet collapsed into shanks)
    assert model.nb == 13
    assert model.nq == 7 + 12
    assert model.nv == 6 + 12
    assert JointType(model.joint_types[0]) == JointType.FREE
    # 12 actuated joints in the dof map, after the 6 base dofs
    assert len(jmap) == 12
    assert sorted(jmap.values()) == list(range(6, 18))
    # base box + 4 foot spheres
    assert len(geoms) == 5
    # total mass
    expected = (anymal.BASE_MASS
                + 4 * (anymal.HIP_MASS + anymal.THIGH_MASS + anymal.SHANK_MASS
                       + anymal.FOOT_MASS))
    np.testing.assert_allclose(float(jnp.sum(model.mass)), expected, rtol=1e-6)

  def test_fixed_collapse_preserves_totals(self):
    # foot mass must be folded into shank
    model, bodies, _, _ = build_anymal()
    shank_masses = [b["mass"] for b in bodies if "shank" in b["name"]]
    np.testing.assert_allclose(
        shank_masses, [anymal.SHANK_MASS + anymal.FOOT_MASS] * 4, rtol=1e-9
    )

  def test_standing_feet_on_ground(self):
    model, _, geoms, _ = build_anymal()
    q = jnp.asarray(anymal.standing_q())
    kin = dynamics.fk(model, q, jnp.zeros(model.nv, dtype=jnp.float64))
    # foot geoms are on the shanks, offset (0,0,-SHANK_LEN)
    foot_geoms = [g for g in geoms if g["gtype"] == 0]
    for g in foot_geoms:
      b = g["body"]
      pos = kin.p[b] + kin.R[b] @ jnp.asarray(g["offset_pos"])
      # sphere bottom touches z=0
      assert abs(float(pos[2]) - anymal.FOOT_RADIUS) < 1e-6, pos


class TestMuJoCoOracle:
  def test_dynamics_match_on_same_urdf(self, rng):
    import mujoco

    urdf = anymal.anymal_urdf()
    mj_model = mujoco.MjModel.from_xml_string(urdf)
    mj_data = mujoco.MjData(mj_model)
    assert mj_model.nv == 18

    model, _, _, _ = build_anymal()
    # permutation: mine u = [w_body, v_world, joints]; mujoco [v_world, w_body, joints]
    T = np.zeros((18, 18))
    T[0:3, 3:6] = np.eye(3)   # mj w rows from my first block? build explicitly below
    T = np.zeros((18, 18))
    for k in range(3):
      T[k, 3 + k] = 1.0       # mj v_world  <- my u[3:6]
      T[3 + k, k] = 1.0       # mj w_body   <- my u[0:3]
    for k in range(12):
      T[6 + k, 6 + k] = 1.0

    for _ in range(3):
      pos = rng.normal(size=3) * 0.1 + np.array([0, 0, 0.6])
      quat = rng.normal(size=4)
      quat /= np.linalg.norm(quat)
      joints = rng.normal(size=12) * 0.3
      u_mine = rng.normal(size=18)
      q = jnp.asarray(np.concatenate([pos, quat, joints]))
      u = jnp.asarray(u_mine)

      mj_data.qpos[:3] = pos
      mj_data.qpos[3:7] = quat
      mj_data.qpos[7:] = joints
      mj_data.qvel[:] = T @ u_mine
      mujoco.mj_forward(mj_model, mj_data)

      M_mj = np.zeros((18, 18))
      mujoco.mj_fullM(mj_model, mj_data, M_mj)
      M = np.asarray(dynamics.crba(model, q))
      np.testing.assert_allclose(M, T.T @ M_mj @ T, rtol=2e-6, atol=1e-9)

      h = np.asarray(dynamics.nonlinearities(model, q, u, G))
      np.testing.assert_allclose(h, T.T @ mj_data.qfrc_bias, rtol=2e-5, atol=1e-8)

      tau_mine = rng.normal(size=18)
      mj_data.qfrc_applied[:] = np.linalg.solve(T.T, tau_mine)
      mujoco.mj_forward(mj_model, mj_data)
      qdd = np.asarray(dynamics.aba(model, q, u, jnp.asarray(tau_mine), G))
      np.testing.assert_allclose(qdd, np.linalg.solve(T, mj_data.qacc), rtol=2e-5,
                                 atol=1e-7)


class TestStanding:
  def test_pd_holds_stance(self):
    bodies, geoms, jmap = load_urdf(anymal.anymal_urdf())
    world = World(dt=2.5e-3)
    world.add_articulated_system(bodies, name="anymal", geoms=geoms)
    world.add_ground()
    scene = world.compile().set_pd_gains(100.0, 2.0)

    q0 = jnp.asarray(anymal.standing_q(), dtype=jnp.float32)
    s = scene.init_state(q=q0.astype(jnp.float32))
    target = jnp.zeros(18, jnp.float32).at[6:].set(q0[7:])

    def body(s, _):
      return scene.step(s, pd_target=target), None

    s = jax.jit(lambda s: jax.lax.scan(body, s, None, length=800)[0])(s)
    # base stays up and level
    assert float(s.q[2]) > 0.4, s.q[:7]
    np.testing.assert_allclose(np.asarray(s.q[3:7]), [1, 0, 0, 0], atol=0.03)
    # joints near target
    np.testing.assert_allclose(np.asarray(s.q[7:]), np.asarray(q0[7:]), atol=0.1)
    # nearly at rest
    assert float(jnp.max(jnp.abs(s.u))) < 0.2
