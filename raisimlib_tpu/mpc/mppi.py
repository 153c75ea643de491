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
    # steady-state std of s*prev + (1-s)*e is sigma*sqrt((1-s)/(1+s)) — divide
    # by that so the effective exploration std is the configured sigma
    # (advisor round-3: sqrt(1-s^2) silently shrank sigma by 1/(1+s))
    return out / jnp.sqrt((1.0 - config.smooth) / (1.0 + config.smooth) + 1e-9)

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


def _colorize(eps_white, smooth):
  """(…, H, nu) white noise -> low-pass colored, variance-normalized."""
  H = eps_white.shape[-2]
  nu = eps_white.shape[-1]
  dtype = eps_white.dtype
  lead = eps_white.shape[:-2]

  def one(e):
    def body(prev, ek):
      s = smooth * prev + (1.0 - smooth) * ek
      return s, s

    _, out = jax.lax.scan(body, jnp.zeros((nu,), dtype), e)
    # same normalization as mppi_step's colorize (see comment there)
    return out / jnp.sqrt((1.0 - smooth) / (1.0 + smooth) + 1e-9)

  flat = eps_white.reshape((-1, H, nu))
  return jax.vmap(one)(flat).reshape(lead + (H, nu))


def mppi_step_batch(
    dyn_b: Callable,
    running_cost: Callable,
    final_cost: Callable,
    x0s: jnp.ndarray,     # (E, nx) — E independent MPC problems
    Us: jnp.ndarray,      # (E, H, nu) current plans
    key: jnp.ndarray,
    config: MPPIConfig = MPPIConfig(),
    env_ctx=None,         # optional per-env pytree (leading dim E), e.g. terrains
) -> MPPISolution:
  """One MPPI update of E plans, all E*K sample rollouts in ONE physics batch.

  `dyn_b(X, A, t) -> X_next` is a *batched* dynamics (make_contact_dyn_batch):
  the full (E*K) sample population rolls through `scene.step_batch` with the
  batch on the Pallas kernel's lane axis — the MPC throughput path. Per-env
  math is identical to `mppi_step` with key `jax.random.split(key, E)[e]`
  (tested in tests/test_anymal_mpc.py).

  Returned `cost` is the cost of the INCOMING plan (= sample 0, the unperturbed
  rollout) — exact and free; evaluating the updated plan would cost one more
  H-step sequential rollout, which at B=E*K lane occupancy would nearly double
  the solve latency for a number the receding-horizon loop re-measures next
  tick anyway.

  `env_ctx`: per-env parameters (a pytree with leading dim E, e.g. heightfield
  heights for batched terrain scenarios). When given, it is repeated across
  each env's K samples and passed as `dyn_b(x, u, t, ctx_rows)`, and the cost
  signatures become `running_cost(x, u, t, ctx)` / `final_cost(x, ctx)`.
  """
  E, H, nu = Us.shape
  K = config.n_samples
  dtype = Us.dtype

  keys = jax.random.split(key, E)
  eps_white = config.sigma * jax.vmap(
      lambda k: jax.random.normal(k, (K, H, nu), dtype))(keys)   # (E, K, H, nu)
  eps = _colorize(eps_white, config.smooth)
  eps = eps.at[:, 0].set(0.0)           # sample 0 = unperturbed plan
  Usamp = Us[:, None] + eps             # (E, K, H, nu)

  # one batched rollout over all E*K samples
  X0 = jnp.broadcast_to(x0s[:, None, :], (E, K, x0s.shape[-1])).reshape(E * K, -1)
  Uflat = Usamp.reshape(E * K, H, nu)
  ctx = (None if env_ctx is None
         else jax.tree.map(lambda a: jnp.repeat(a, K, axis=0), env_ctx))

  def body(carry, u_t):
    x, acc = carry
    u, t = u_t
    if ctx is None:
      c = jax.vmap(running_cost, in_axes=(0, 0, None))(x, u, t)
      xn = dyn_b(x, u, t)
    else:
      c = jax.vmap(running_cost, in_axes=(0, 0, None, 0))(x, u, t, ctx)
      xn = dyn_b(x, u, t, ctx)
    return (xn, acc + c), None

  ts = jnp.arange(H)
  (xf, acc), _ = jax.lax.scan(
      body, (X0, jnp.zeros((E * K,), dtype)), (jnp.moveaxis(Uflat, 0, 1), ts))
  fc = (jax.vmap(final_cost)(xf) if ctx is None
        else jax.vmap(final_cost)(xf, ctx))
  costs = (acc + fc).reshape(E, K)

  if config.n_elite > 0:
    _, top = jax.lax.top_k(-costs, config.n_elite)               # (E, n_elite)
    U_new = jnp.mean(jnp.take_along_axis(
        Usamp, top[:, :, None, None], axis=1), axis=1)
  else:
    beta = jnp.min(costs, axis=1, keepdims=True)
    w = jnp.exp(-(costs - beta) / config.temperature)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    U_new = jnp.einsum("ek,ekhu->ehu", w, Usamp)

  return MPPISolution(U=U_new, cost=costs[:, 0], best_cost=jnp.min(costs, axis=1))


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
