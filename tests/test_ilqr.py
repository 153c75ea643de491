"""iLQR tests: LQR sanity + cartpole and double-pendulum swing-up (BASELINE config 1)."""

import jax
import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.models import primitives
from raisimlib_tpu.mpc import ILQRConfig, ilqr, make_smooth_dyn

G = jnp.array([0.0, 0.0, -9.81])


class TestLQRSanity:
  def test_double_integrator_matches_lqr(self):
    # x' = Ax + Bu; iLQR on an LQ problem must converge in one iteration to the
    # batch-LQR optimum.
    dt = 0.1
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.0], [dt]])

    def dyn(x, u, t):
      return A @ x + B @ u

    Q = jnp.diag(jnp.array([1.0, 0.1]))
    R = jnp.array([[0.01]])

    def rc(x, u, t):
      return 0.5 * x @ Q @ x + 0.5 * u @ R @ u

    def fc(x):
      return 5.0 * x @ x

    x0 = jnp.array([1.0, 0.0])
    H = 50
    sol = ilqr(dyn, rc, fc, x0, jnp.zeros((H, 1)), ILQRConfig(iters=3))
    # LQ problem: converged after first iteration; later iterations don't regress
    assert sol.cost_trace[-1] <= sol.cost_trace[0] + 1e-10
    assert sol.cost < rc(x0, jnp.zeros(1), 0) * H  # vastly better than doing nothing
    np.testing.assert_allclose(sol.X[-1], np.zeros(2), atol=1e-2)


class TestCartpoleSwingUp:
  def make_problem(self, dtype=jnp.float64):
    model = primitives.cartpole(mc=1.0, mp=0.2, l=0.6, dtype=dtype)
    dyn, nx, nu = make_smooth_dyn(model, G, dt=0.02, substeps=2)
    assert (nx, nu) == (4, 1)

    # (1 + cos th) is quadratic near the upright target th=pi — good curvature for
    # DDP — and cheap to evaluate.
    w_pos, w_theta, w_v, w_u = 0.1, 4.0, 0.05, 0.01

    def rc(x, u, t):
      cart, th, cart_d, th_d = x[0], x[1], x[2], x[3]
      return (
          w_theta * (jnp.cos(th) + 1.0)
          + w_pos * cart**2
          + w_v * (cart_d**2 + th_d**2)
          + w_u * jnp.sum(u**2)
      ) * 0.02

    def fc(x):
      cart, th, cart_d, th_d = x[0], x[1], x[2], x[3]
      return 40.0 * (jnp.cos(th) + 1.0) + 2.0 * cart**2 + 1.0 * (cart_d**2 + th_d**2)

    return dyn, rc, fc

  def test_swing_up_converges(self):
    dyn, rc, fc = self.make_problem()
    x0 = jnp.zeros(4, dtype=jnp.float64)  # pole hanging down (theta=0 is down)
    H = 120
    # tiny sinusoidal warm start breaks the symmetric hanging equilibrium
    U0 = 0.5 * jnp.sin(jnp.arange(H, dtype=jnp.float64) * 0.3)[:, None]
    sol = jax.jit(
        lambda x0, U0: ilqr(dyn, rc, fc, x0, U0, ILQRConfig(iters=60))
    )(x0, U0)
    # cost decreased monotonically-ish and substantially
    c0 = sol.cost_trace[0]
    assert sol.cost < 0.2 * c0
    # pole ends near upright: cos(theta) ~ -1
    th_final = sol.X[-1, 1]
    assert float(jnp.cos(th_final)) < -0.95, f"not upright: theta={th_final}"
    # velocities damped near the end
    assert abs(float(sol.X[-1, 3])) < 1.5

  def test_batched_solve_vmaps(self):
    # The "thousands of scenarios per chip" pattern: vmap the entire solver.
    dyn, rc, fc = self.make_problem()
    H = 60
    x0s = jnp.stack(
        [jnp.array([-0.4, 0.2, 0.0, 0.0]), jnp.array([0.5, 0.3, 0.0, 0.0])]
    ).astype(jnp.float64)
    U0s = jnp.zeros((2, H, 1), dtype=jnp.float64)
    sols = jax.jit(
        jax.vmap(lambda x0, U0: ilqr(dyn, rc, fc, x0, U0, ILQRConfig(iters=10)))
    )(x0s, U0s)
    assert sols.cost.shape == (2,)
    assert bool(jnp.all(sols.cost < sols.cost_trace[:, 0]))


class TestDoublePendulumSwingUp:
  def test_acrobot_style_swing_up(self):
    # double pendulum torque on both joints (fully actuated -> easy): reach upright
    model = primitives.double_pendulum(m1=1.0, m2=1.0, l1=0.7, l2=0.7, dtype=jnp.float64)
    dyn, nx, nu = make_smooth_dyn(model, G, dt=0.02, substeps=2)
    assert (nx, nu) == (4, 2)

    # upright: both links pointing +z  => theta1 = pi, theta2 = 0
    def rc(x, u, t):
      return (0.02 * jnp.sum(u**2) + 1.0 * ((jnp.cos(x[0]) + 1.0) + x[1] ** 2)) * 0.02

    def fc(x):
      return 30.0 * ((jnp.cos(x[0]) + 1.0) + x[1] ** 2) + 1.0 * jnp.sum(x[2:] ** 2)

    x0 = jnp.zeros(4, dtype=jnp.float64)
    H = 100
    U0 = 0.3 * jnp.sin(jnp.arange(H, dtype=jnp.float64) * 0.25)[:, None] * jnp.ones(2)
    sol = jax.jit(
        lambda x0, U0: ilqr(dyn, rc, fc, x0, U0, ILQRConfig(iters=50))
    )(x0, U0)
    assert float(jnp.cos(sol.X[-1, 0])) < -0.9
    assert abs(float(sol.X[-1, 1])) < 0.3
