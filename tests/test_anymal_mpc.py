"""ANYmal standing-balance MPC (BASELINE config 3): contact-implicit MPC via both
MPPI (sampling) and iLQR (derivatives through the hard-contact solver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.models import anymal
from raisimlib_tpu.models.urdf import load_urdf
from raisimlib_tpu.mpc import ILQRConfig, ilqr
from raisimlib_tpu.mpc.mppi import MPPIConfig, receding_horizon
from raisimlib_tpu.mpc.state_map import make_contact_dyn, state_to_vec, vec_to_state
from raisimlib_tpu.ops.spatial import quat_box_minus
from raisimlib_tpu.world import World


def balance_problem(dtype=jnp.float32, control_dt=0.01, substeps=4):
  bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
  world = World(dt=control_dt / substeps, dtype=dtype)
  world.add_articulated_system(bodies, name="anymal", geoms=geoms)
  world.add_ground()
  scene = world.compile().set_pd_gains(100.0, 2.0)

  q0 = jnp.asarray(anymal.standing_q(), dtype)
  s0 = scene.init_state(q=q0)
  dyn, nx, nu = make_contact_dyn(scene, control_dt, substeps, use_pd=True)
  q_stand_joints = q0[7:]
  z0 = q0[2]
  quat_id = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)

  def running_cost(x, u_ctrl, t):
    q, v = x[:19], x[19:]
    c_height = 40.0 * (q[2] - z0) ** 2
    c_att = 10.0 * jnp.sum(quat_box_minus(q[3:7], quat_id) ** 2)
    c_vel = 0.5 * jnp.sum(v[:6] ** 2) + 0.02 * jnp.sum(v[6:] ** 2)
    c_post = 2.0 * jnp.sum((q[7:] - q_stand_joints) ** 2)
    c_act = 1.0 * jnp.sum((u_ctrl - q_stand_joints) ** 2)
    return (c_height + c_att + c_vel + c_post + c_act) * 0.01

  def final_cost(x):
    q, v = x[:19], x[19:]
    return (
        200.0 * (q[2] - z0) ** 2
        + 50.0 * jnp.sum(quat_box_minus(q[3:7], quat_id) ** 2)
        + 5.0 * jnp.sum(v[:6] ** 2)
        + 10.0 * jnp.sum((q[7:] - q_stand_joints) ** 2)
    )

  return scene, s0, dyn, nx, nu, running_cost, final_cost, q_stand_joints


class TestBalanceMPPI:
  def test_push_recovery_beats_passive(self):
    scene, s0, dyn, nx, nu, rc, fc, q_stand = balance_problem()
    # lateral push: 0.6 m/s sideways base velocity
    s_pushed = s0.replace(u=s0.u.at[4].set(0.6))
    x0 = state_to_vec(s_pushed)
    H = 25
    U0 = jnp.tile(q_stand[None, :], (H, 1))

    cfg = MPPIConfig(n_samples=64, sigma=0.08, temperature=0.05, smooth=0.8)
    solve = jax.jit(
        lambda x0, U0, key: receding_horizon(dyn, rc, fc, x0, U0, key, 4, cfg)
    )
    U, cost, trace = solve(x0, U0, jax.random.PRNGKey(0))
    cost0 = trace[0]  # first iteration already improves over...
    # baseline: just holding the stance target
    from raisimlib_tpu.mpc.mppi import _rollout_cost

    passive = jax.jit(lambda x0, U0: _rollout_cost(dyn, rc, fc, x0, U0))(x0, U0)
    assert float(cost) < float(passive), (cost, passive)

    # executing the plan keeps the robot upright
    def exec_body(s, u):
      xn = dyn(state_to_vec(s), u, 0)
      return vec_to_state(scene.model, xn), xn[2]

    sf, zs = jax.jit(lambda s, U: jax.lax.scan(exec_body, s, U))(s_pushed, U)
    assert float(sf.q[2]) > 0.35, "base collapsed"
    np.testing.assert_allclose(np.asarray(sf.q[3:7]), [1, 0, 0, 0], atol=0.15)
    # lateral velocity reduced
    assert abs(float(sf.u[4])) < 0.3


class TestBalanceILQR:
  def test_gradients_through_contact_improve_cost(self):
    """iLQR differentiates through the full hard-contact step (fixed-trip solver
    is piecewise-smooth); cost must decrease on the balance problem."""
    scene, s0, dyn, nx, nu, rc, fc, q_stand = balance_problem(substeps=2,
                                                              control_dt=5e-3)
    s_pushed = s0.replace(u=s0.u.at[3].set(0.4))
    x0 = state_to_vec(s_pushed)
    H = 10
    U0 = jnp.tile(q_stand[None, :], (H, 1))
    sol = jax.jit(
        lambda x0, U0: ilqr(dyn, rc, fc, x0, U0, ILQRConfig(iters=5, reg_init=1e-3))
    )(x0, U0)
    trace = np.asarray(sol.cost_trace)
    from raisimlib_tpu.mpc.mppi import _rollout_cost

    c0 = float(jax.jit(lambda: _rollout_cost(dyn, rc, fc, x0, U0))())
    assert float(sol.cost) < c0, (sol.cost, c0)
    assert np.all(np.isfinite(trace))
