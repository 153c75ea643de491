"""Sampling-based MPC (MPPI / predictive sampling) — the TPU-native gait controller.

Model-predictive path integral control: K perturbed control sequences are rolled out
*in parallel* (`vmap` over samples — thousands per chip, the pattern BASELINE.json
line 5 demands), softmax-weighted by cost, and averaged. Derivative-free, so hard
contact nonsmoothness costs nothing — the complement to the iLQR/DDP path (C18).

Receding horizon: `mppi_step` returns the shifted warm start for the next solve.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class MPPIConfig:
  n_samples: int = struct.field(pytree_node=False, default=256)
  temperature: float = 1.0
  sigma: float = 0.2            # exploration std-dev per control dim
  smooth: float = 0.7           # exploration noise low-pass (colored noise)
  n_elite: int = struct.field(pytree_node=False, default=0)  # >0: elite averaging


class MPPISolution(NamedTuple):
  U: jnp.ndarray          # (H, nu) updated control plan
  cost: jnp.ndarray       # scalar expected cost of the plan
  best_cost: jnp.ndarray  # best sampled rollout cost


def _rollout_cost(dyn, running_cost, final_cost, x0, U):
  H = U.shape[0]

  def body(x, u_t):
    u, t = u_t
    xn = dyn(x, u, t)
    return xn, running_cost(x, u, t)

  ts = jnp.arange(H)
  xf, cs = jax.lax.scan(body, x0, (U, ts))
  return jnp.sum(cs) + final_cost(xf)


def mppi_step(
    dyn: Callable,
    running_cost: Callable,
    final_cost: Callable,
    x0: jnp.ndarray,
    U: jnp.ndarray,
    key: jnp.ndarray,
    config: MPPIConfig = MPPIConfig(),
) -> MPPISolution:
  """One MPPI update of the plan U (call repeatedly for receding-horizon MPC)."""
  H, nu = U.shape
  dtype = U.dtype

  # colored (low-pass) exploration noise — smoother than white for actuated systems
  eps_white = config.sigma * jax.random.normal(key, (config.n_samples, H, nu), dtype)

  def colorize(e):
    def body(prev, ek):
      s = config.smooth * prev + (1.0 - config.smooth) * ek
      return s, s

    _, out = jax.lax.scan(body, jnp.zeros((nu,), dtype), e)
    return out / jnp.sqrt(1.0 - config.smooth**2 + 1e-6)  # variance-normalize

  eps = jax.vmap(colorize)(eps_white)
  # keep one unperturbed rollout (sample 0) so the plan can never regress
  eps = eps.at[0].set(0.0)
  Us = U[None] + eps

  costs = jax.vmap(lambda Uk: _rollout_cost(dyn, running_cost, final_cost, x0, Uk))(Us)

  if config.n_elite > 0:
    # predictive-sampling variant: average the n_elite best
    _, top = jax.lax.top_k(-costs, config.n_elite)
    U_new = jnp.mean(Us[top], axis=0)
  else:
    beta = jnp.min(costs)
    w = jnp.exp(-(costs - beta) / config.temperature)
    w = w / jnp.sum(w)
    U_new = jnp.einsum("k,khu->hu", w, Us)

  cost_new = _rollout_cost(dyn, running_cost, final_cost, x0, U_new)
  return MPPISolution(U=U_new, cost=cost_new, best_cost=jnp.min(costs))


def receding_horizon(
    dyn, running_cost, final_cost, x0, U0, key, n_iters: int,
    config: MPPIConfig = MPPIConfig(),
):
  """Iterate mppi_step n_iters times on a fixed x0 (one MPC solve)."""

  def body(carry, k):
    U, _ = carry
    sol = mppi_step(dyn, running_cost, final_cost, x0, U, k, config)
    return (sol.U, sol.cost), sol.cost

  keys = jax.random.split(key, n_iters)
  (U, cost), trace = jax.lax.scan(body, (U0, jnp.asarray(jnp.inf, U0.dtype)), keys)
  return U, cost, trace
