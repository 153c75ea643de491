"""BASELINE config 1: cartpole swing-up MPC (no contact) — iLQR over the smooth
dynamics. The reference's `examples/` tree is its de-facto test + benchmark
surface (/root/reference/.travis.yml:11 builds them; no test step exists), so
each example here doubles as an integration test (tests/test_examples.py) and a
benchmark entry emitting structured JSONL (SURVEY.md §5 observability).

Run:  python examples/cartpole_swingup.py [--smoke]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def run(smoke: bool = False, metrics_path: str = "metrics/cartpole_swingup.jsonl"):
  from raisimlib_tpu import scenarios
  from raisimlib_tpu.models import primitives
  from raisimlib_tpu.mpc import ILQRConfig, ilqr, make_smooth_dyn
  from raisimlib_tpu.utils import metrics

  cfg = scenarios.load("cartpole_swingup")      # C12 scenario file
  mc, cc = cfg["model"], cfg["controller"]
  cw = cfg["run"]["cost"]
  dtype = jnp.float32
  model = primitives.cartpole(dtype=dtype)
  G = jnp.array([0.0, 0.0, -9.81], dtype)
  dt = float(mc["dt"])
  dyn, nx, nu = make_smooth_dyn(model, G, dt=dt, substeps=int(mc["substeps"]))

  def rc(x, u, t):
    return (cw["upright"] * (jnp.cos(x[1]) + 1.0) + cw["cart"] * x[0] ** 2
            + cw["vel"] * (x[2] ** 2 + x[3] ** 2)
            + cw["effort"] * jnp.sum(u**2)) * dt

  def fc(x):
    return (cw["final_upright"] * (jnp.cos(x[1]) + 1.0)
            + 2.0 * x[0] ** 2 + x[2] ** 2 + x[3] ** 2)

  H = int(cc["horizon"])
  iters = int(cc["smoke_iters"] if smoke else cc["iters"])
  x0 = jnp.zeros((nx,), dtype).at[1].set(cfg["run"]["tilt0"])
  U0 = jnp.zeros((H, nu), dtype)

  solve = jax.jit(lambda a, b: ilqr(dyn, rc, fc, a, b, ILQRConfig(iters=iters)))
  t0 = time.perf_counter()
  sol = solve(x0, U0)
  jax.block_until_ready(sol.U)
  compile_s = time.perf_counter() - t0
  t0 = time.perf_counter()
  sol = solve(x0, U0)
  jax.block_until_ready(sol.U)
  solve_s = time.perf_counter() - t0

  # roll the converged plan, check the pole reaches upright (theta -> pi)
  def rollout(x, U):
    def body(x, u):
      return dyn(x, u, 0.0), x

    xf, _ = jax.lax.scan(body, x, U)
    return xf

  xf = rollout(x0, sol.U)
  theta_f = float(xf[1])
  result = {
      "cost": float(sol.cost),
      "final_theta": theta_f,
      "upright": abs(abs(theta_f) - 3.14159) < 0.5,
      "solve_s": solve_s,
      "compile_s": compile_s,
      "iters": iters,
  }
  metrics.emit("example_cartpole_swingup", path=metrics_path, echo=True, **result)
  if not smoke:
    assert result["upright"], f"swing-up failed: theta={theta_f}"
  return result


if __name__ == "__main__":
  from raisimlib_tpu.utils.platform import apply_env_platform

  apply_env_platform()  # RAISIM_PLATFORM=cpu forces the CPU backend (smoke CI)
  ap = argparse.ArgumentParser()
  ap.add_argument("--smoke", action="store_true")
  run(smoke=ap.parse_args().smoke)
