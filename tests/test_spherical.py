"""Spherical (ball) joints — SURVEY.md C2; VERDICT round-2 #10.

RaiSim's ArticulatedSystem supports spherical joints (quaternion joint
coordinates, 3-dof body-frame angular velocity). Validated here against the
MuJoCo oracle (mass matrix, bias forces, short contact-free trajectories of a
ball-joint pendulum), plus energy conservation, multi-joint chains, URDF
parsing, and the contact step running with a spherical joint in the tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.models.model import JointType, build_model
from raisimlib_tpu.ops import dynamics, integrator

F64 = jnp.float64
G = jnp.asarray([0.0, 0.0, -9.81], F64)


def _rod_specs(l=0.5, m=1.0, two_link=False):
  r = 0.02
  Ixx = m * (3 * r * r + l * l) / 12.0
  I = np.diag([Ixx, Ixx, 0.5 * m * r * r])
  specs = [dict(parent=-1, joint=JointType.SPHERICAL, mass=m,
                com=[0.0, 0.0, -l / 2], inertia=I, actuated=True, name="rod")]
  if two_link:
    specs.append(dict(parent=0, joint=JointType.SPHERICAL, mass=m,
                      com=[0.0, 0.0, -l / 2], inertia=I, actuated=True,
                      pos=[0.0, 0.0, -l], name="rod2"))
  return specs


def _mj_rod(l=0.5, m=1.0, two_link=False):
  import mujoco

  r = 0.02
  Ixx = m * (3 * r * r + l * l) / 12.0
  Izz = 0.5 * m * r * r
  inner = ""
  if two_link:
    inner = f"""
        <body name="rod2" pos="0 0 {-l}">
          <joint type="ball"/>
          <inertial pos="0 0 {-l/2}" mass="{m}" diaginertia="{Ixx} {Ixx} {Izz}"/>
        </body>"""
  xml = f"""
  <mujoco>
    <option gravity="0 0 -9.81"/>
    <worldbody>
      <body name="rod" pos="0 0 0">
        <joint type="ball"/>
        <inertial pos="0 0 {-l/2}" mass="{m}" diaginertia="{Ixx} {Ixx} {Izz}"/>
        {inner}
      </body>
    </worldbody>
  </mujoco>"""
  return mujoco.MjModel.from_xml_string(xml)


def _rand_quat(rng):
  v = rng.normal(size=4)
  return v / np.linalg.norm(v)


@pytest.mark.parametrize("two_link", [False, True])
class TestVsMujoco:
  def test_mass_matrix_and_bias(self, two_link, rng):
    import mujoco

    model = build_model("rod", _rod_specs(two_link=two_link), dtype=F64)
    mj_model = _mj_rod(two_link=two_link)
    mj_data = mujoco.MjData(mj_model)
    nv = model.nv

    for _ in range(5):
      nj = 2 if two_link else 1
      q = np.concatenate([_rand_quat(rng) for _ in range(nj)])
      u = 0.5 * rng.normal(size=nv)
      mj_data.qpos[:] = q
      mj_data.qvel[:] = u
      mujoco.mj_forward(mj_model, mj_data)
      M_mj = np.zeros((nv, nv))
      mujoco.mj_fullM(mj_model, mj_data, M_mj)

      M = np.asarray(dynamics.crba_w(model, jnp.asarray(q, F64)))
      np.testing.assert_allclose(M, M_mj, rtol=1e-6, atol=1e-9)
      h = np.asarray(dynamics.nonlinearities(
          model, jnp.asarray(q, F64), jnp.asarray(u, F64), G))
      np.testing.assert_allclose(h, mj_data.qfrc_bias, rtol=1e-6, atol=1e-8)

  def test_trajectory(self, two_link, rng):
    import mujoco

    model = build_model("rod", _rod_specs(two_link=two_link), dtype=F64)
    mj_model = _mj_rod(two_link=two_link)
    mj_model.opt.timestep = 5e-4
    mj_data = mujoco.MjData(mj_model)
    nj = 2 if two_link else 1
    q0 = np.concatenate(
        [np.array([np.cos(0.3), np.sin(0.3) * 0.6, np.sin(0.3) * 0.8, 0.0])
         for _ in range(nj)])
    q0 = q0 / np.linalg.norm(q0[:4])
    u0 = np.tile([0.2, -0.1, 0.3], nj)
    mj_data.qpos[:] = q0
    mj_data.qvel[:] = u0

    dt = 5e-4
    n = 400

    @jax.jit
    def roll(s):
      def body(s, _):
        s = integrator.step_smooth(model, s, jnp.zeros((model.nv,), F64), G, dt)
        return s, None

      s, _ = jax.lax.scan(body, s, None, length=n)
      return s

    s = integrator.init_state(model, jnp.asarray(q0, F64), jnp.asarray(u0, F64))
    s = roll(s)
    for _ in range(n):
      mujoco.mj_step(mj_model, mj_data)
    # integrators differ (semi-implicit vs MuJoCo's); compare loosely but
    # meaningfully over 0.2 s of tumbling
    np.testing.assert_allclose(np.asarray(s.u), mj_data.qvel, rtol=0.0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(s.q), mj_data.qpos, rtol=0.0, atol=2e-3)


class TestPhysics:
  def test_energy_conservation(self):
    model = build_model("rod", _rod_specs(), dtype=F64)
    dt = 1e-4
    tilt = np.array([np.cos(0.6), np.sin(0.6), 0.0, 0.0])
    s = integrator.init_state(model, jnp.asarray(tilt, F64),
                              jnp.asarray([0.1, 0.0, 0.5], F64))

    @jax.jit
    def roll(s):
      def body(s, _):
        s2 = integrator.step_smooth(model, s, jnp.zeros((3,), F64), G, dt)
        ke, pe = dynamics.energy(model, s2.q, s2.u, G)
        return s2, ke + pe

      return jax.lax.scan(body, s, None, length=5000)

    _, E = roll(s)
    E = np.asarray(E)
    assert abs(E[-1] - E[0]) / (abs(E[0]) + 1.0) < 2e-4

  def test_quaternion_stays_normalized(self):
    model = build_model("rod", _rod_specs(), dtype=F64)
    s = integrator.init_state(model, u=jnp.asarray([1.0, 2.0, 3.0], F64))

    @jax.jit
    def roll(s):
      def body(s, _):
        return integrator.step_smooth(model, s, jnp.zeros((3,), F64), G, 1e-3), None

      s, _ = jax.lax.scan(body, s, None, length=2000)
      return s

    s = roll(s)
    assert abs(float(jnp.linalg.norm(s.q)) - 1.0) < 1e-9

  def test_contact_step_with_spherical_joint(self):
    """A ball-jointed rod mounted on a free base box, dropped on the ground:
    the full collision -> cone solve -> integrate pipeline runs with a
    spherical joint in the tree and settles."""
    from raisimlib_tpu.world import World

    r = 0.02
    l = 0.3
    m = 0.5
    Ixx = m * (3 * r * r + l * l) / 12.0
    I = np.diag([Ixx, Ixx, 0.5 * m * r * r])
    bodies = [
        dict(parent=-1, joint=JointType.FREE, mass=2.0, com=[0, 0, 0],
             inertia=np.diag([0.02, 0.02, 0.02]), actuated=False, name="base",
             q_init=[0, 0, 0.3, 1, 0, 0, 0]),
        dict(parent=0, joint=JointType.SPHERICAL, mass=m, com=[0, 0, l / 2],
             inertia=I, actuated=True, pos=[0.0, 0.0, 0.1], name="pendulum"),
    ]
    geoms = [dict(body=0, gtype=1, params=[0.1, 0.1, 0.1])]  # box on the base
    world = World(dt=0.002, dtype=F64)
    world.add_articulated_system(bodies, name="wobbler", geoms=geoms)
    world.add_ground()
    # kp=0, kd>0: pure joint damping through the implicit-PD path — also
    # checks spherical dofs receive damping but NO position servo (their
    # coordinates are quaternions; _joint_pos_index masks them)
    scene = world.compile().set_pd_gains(0.0, 0.3)
    # tilt the pendulum so it swings while the base lands
    q0 = scene.model.q_init.at[7:11].set(
        jnp.asarray([np.cos(0.4), np.sin(0.4), 0, 0], F64))
    s = scene.init_state(q=q0)
    pd0 = jnp.zeros((scene.model.nv,), F64)

    @jax.jit
    def roll(s):
      def body(s, _):
        return scene.step(s, pd_target=pd0), None

      s, _ = jax.lax.scan(body, s, None, length=1500)
      return s

    s = roll(s)
    assert abs(float(s.q[2]) - 0.1) < 5e-3       # base box resting
    assert float(jnp.abs(s.u).max()) < 0.2       # damped out
    assert np.isfinite(np.asarray(s.q)).all()


class TestUrdf:
  def test_spherical_joint_parses(self):
    from raisimlib_tpu.models.urdf import load_urdf

    urdf = """<robot name="b">
      <link name="base">
        <inertial><mass value="1.0"/>
          <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
        </inertial>
      </link>
      <link name="arm">
        <inertial><origin xyz="0 0 -0.2"/><mass value="0.5"/>
          <inertia ixx="0.005" iyy="0.005" izz="0.001" ixy="0" ixz="0" iyz="0"/>
        </inertial>
      </link>
      <joint name="shoulder" type="spherical">
        <parent link="base"/><child link="arm"/>
        <origin xyz="0 0 -0.1"/>
      </joint>
    </robot>"""
    bodies, geoms, jmap = load_urdf(urdf)
    model = build_model("b", bodies, dtype=F64)
    assert JointType.SPHERICAL in [JointType(t) for t in model.joint_types]
    assert model.nq == 7 + 4 and model.nv == 6 + 3
    assert jmap["shoulder"] == 6
