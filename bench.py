"""Headline benchmark — prints ONE JSON line for the driver.

Current flagship metric: batched contact-free rollouts/s/chip (cartpole, 50-step
horizon, semi-implicit integrator). Graduates to ANYmal 12-DoF contact-implicit MPC
rollouts as the contact + URDF layers land (BASELINE.json: target >= 10k rollouts/s/chip
on that config; vs_baseline is measured against that 10k target).
"""

import json
import time

import jax
import jax.numpy as jnp


def bench_rollouts(B=8192, H=50, dtype=jnp.float32):
  from raisimlib_tpu.models import primitives
  from raisimlib_tpu.ops import integrator

  model = primitives.cartpole(dtype=dtype)
  G = jnp.array([0.0, 0.0, -9.81], dtype=dtype)
  dt = 0.02

  def rollout(q0, key):
    taus = 0.1 * jax.random.normal(key, (H, model.nv), dtype)
    state = integrator.init_state(model, q0)

    def body(s, tau):
      return integrator.step_smooth(model, s, tau, G, dt), None

    final, _ = jax.lax.scan(body, state, taus)
    return final.q

  @jax.jit
  def run(q0s, keys):
    return jax.vmap(rollout)(q0s, keys)

  q0s = jnp.zeros((B, model.nq), dtype).at[:, 1].set(
      jnp.linspace(0, 0.1, B, dtype=dtype))
  keys = jax.random.split(jax.random.PRNGKey(0), B)

  run(q0s, keys).block_until_ready()  # compile
  times = []
  for _ in range(3):
    t0 = time.perf_counter()
    run(q0s, keys).block_until_ready()
    times.append(time.perf_counter() - t0)
  dt_best = min(times)
  return B / dt_best


if __name__ == "__main__":
  rps = bench_rollouts()
  target = 10_000.0  # BASELINE.json rollouts/s/chip target (ANYmal config)
  print(json.dumps({
      "metric": "rollouts_per_s_per_chip_cartpole_h50",
      "value": round(rps, 1),
      "unit": "rollouts/s",
      "vs_baseline": round(rps / target, 3),
  }))
