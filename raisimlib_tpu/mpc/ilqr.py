"""iLQR/DDP shooting optimizer — the MPC layer RaiSim lacks (SURVEY.md C18).

RaiSim users bolt RL/MPC on top of `World::integrate()` in user code
([BASELINE:5] "a new shooting/DDP-style MPC layer that RaiSim itself lacks"). Here it is
first-class and TPU-idiomatic:

  * the backward pass is a `lax.scan` over time (sequential by nature, small matrices);
  * the forward line search evaluates a whole ladder of step sizes *in parallel* with
    `vmap` — trading FLOPs (cheap on TPU) for sequential backtracking (expensive);
  * dynamics derivatives come from `jax.jacfwd` through the simulation step, evaluated
    for all timesteps with `vmap`;
  * everything is fixed-trip-count so one `jit` covers the entire solve.

State is a flat Euclidean vector; systems with quaternion states supply
retract/tangent maps (see `mpc/state_map.py`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ILQRConfig:
  iters: int = struct.field(pytree_node=False, default=30)
  n_alpha: int = struct.field(pytree_node=False, default=8)
  reg_init: float = 1e-6
  reg_min: float = 1e-9
  reg_max: float = 1e8
  reg_up: float = 8.0
  reg_down: float = 0.5
  # accept a step if actual cost decrease is positive (relative to tiny tolerance)
  accept_tol: float = 0.0


class ILQRSolution(NamedTuple):
  X: jnp.ndarray          # (H+1, nx) optimal state trajectory
  U: jnp.ndarray          # (H, nu) optimal controls
  cost: jnp.ndarray       # scalar final cost
  cost_trace: jnp.ndarray  # (iters,) cost after each iteration
  reg_trace: jnp.ndarray
  gains_K: jnp.ndarray    # (H, nu, nx) feedback gains of last accepted pass


def _rollout(dyn, x0, U):
  def body(x, u_t):
    u, t = u_t
    xn = dyn(x, u, t)
    return xn, xn

  H = U.shape[0]
  ts = jnp.arange(H)
  _, X1 = jax.lax.scan(body, x0, (U, ts))
  return jnp.concatenate([x0[None], X1], axis=0)


def _traj_cost(running_cost, final_cost, X, U):
  H = U.shape[0]
  ts = jnp.arange(H)
  cs = jax.vmap(running_cost)(X[:-1], U, ts)
  return jnp.sum(cs) + final_cost(X[-1])


def ilqr(
    dyn: Callable,            # (x, u, t) -> x_next
    running_cost: Callable,   # (x, u, t) -> scalar
    final_cost: Callable,     # (x) -> scalar
    x0: jnp.ndarray,
    U0: jnp.ndarray,
    config: ILQRConfig = ILQRConfig(),
) -> ILQRSolution:
  """Fixed-iteration iLQR. Fully jittable; vmap over x0/U0 for batched MPC."""
  H, nu = U0.shape
  nx = x0.shape[0]
  dtype = x0.dtype

  fx_fn = jax.vmap(jax.jacfwd(dyn, argnums=0))
  fu_fn = jax.vmap(jax.jacfwd(dyn, argnums=1))

  # cost derivatives (exact, via jax)
  cx_fn = jax.vmap(jax.grad(running_cost, argnums=0))
  cu_fn = jax.vmap(jax.grad(running_cost, argnums=1))
  cxx_fn = jax.vmap(jax.hessian(running_cost, argnums=0))
  cuu_fn = jax.vmap(jax.hessian(running_cost, argnums=1))
  cux_fn = jax.vmap(jax.jacfwd(jax.grad(running_cost, argnums=1), argnums=0))
  vx_fn = jax.grad(final_cost)
  vxx_fn = jax.hessian(final_cost)

  alphas = jnp.asarray(1.1 ** (-jnp.arange(config.n_alpha, dtype=jnp.float32) ** 2),
                       dtype=dtype)

  def backward(X, U, reg):
    ts = jnp.arange(H)
    fx = fx_fn(X[:-1], U, ts)
    fu = fu_fn(X[:-1], U, ts)
    cx = cx_fn(X[:-1], U, ts)
    cu = cu_fn(X[:-1], U, ts)
    cxx = cxx_fn(X[:-1], U, ts)
    cuu = cuu_fn(X[:-1], U, ts)
    cux = cux_fn(X[:-1], U, ts)

    def bstep(carry, inp):
      Vx, Vxx, dV1, dV2, ok = carry
      fx_t, fu_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
      Qx = cx_t + fx_t.T @ Vx
      Qu = cu_t + fu_t.T @ Vx
      Qxx = cxx_t + fx_t.T @ Vxx @ fx_t
      Quu = cuu_t + fu_t.T @ Vxx @ fu_t
      Qux = cux_t + fu_t.T @ Vxx @ fx_t
      Quu_reg = Quu + reg * jnp.eye(nu, dtype=dtype)
      # solve via Cholesky; detect non-PD through the residual check
      L = jnp.linalg.cholesky(Quu_reg)
      pd = jnp.all(jnp.isfinite(L))
      rhs = jnp.concatenate([Qu[:, None], Qux], axis=1)
      sol = jax.scipy.linalg.cho_solve((L, True), rhs)
      sol = jnp.where(pd, sol, jnp.zeros_like(sol))
      k = -sol[:, 0]
      K = -sol[:, 1:]
      Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
      Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
      Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
      dV1_new = dV1 + k @ Qu
      dV2_new = dV2 + 0.5 * k @ Quu @ k
      return (Vx_new, Vxx_new, dV1_new, dV2_new, ok & pd), (k, K)

    Vx0 = vx_fn(X[-1])
    Vxx0 = vxx_fn(X[-1])
    # derive scalar carry inits from traced values so their varying-manual-axes (vma)
    # metadata matches the loop outputs under shard_map
    zero = jnp.zeros((), dtype) + 0.0 * Vx0[0]
    true_ = jnp.isfinite(Vx0[0]) | jnp.bool_(True)
    init = (Vx0, Vxx0, zero, zero, true_)
    (Vx, Vxx, dV1, dV2, ok), (ks, Ks) = jax.lax.scan(
        bstep, init, (fx, fu, cx, cu, cxx, cuu, cux), reverse=True
    )
    return ks, Ks, dV1, dV2, ok

  def forward(X, U, ks, Ks, alpha):
    def fstep(x, inp):
      x_ref, u_ref, k, K, t = inp
      u = u_ref + alpha * k + K @ (x - x_ref)
      xn = dyn(x, u, t)
      return xn, (xn, u)

    ts = jnp.arange(H)
    _, (X1, Unew) = jax.lax.scan(fstep, X[0], (X[:-1], U, ks, Ks, ts))
    Xnew = jnp.concatenate([X[0][None], X1], axis=0)
    return Xnew, Unew, _traj_cost(running_cost, final_cost, Xnew, Unew)

  X0 = _rollout(dyn, x0, U0)
  c0 = _traj_cost(running_cost, final_cost, X0, U0)

  def iteration(carry, _):
    X, U, cost, reg, K_last = carry
    ks, Ks, dV1, dV2, ok = backward(X, U, reg)
    # parallel line search over the alpha ladder
    Xs, Us, costs = jax.vmap(lambda a: forward(X, U, ks, Ks, a))(alphas)
    best = jnp.argmin(costs)
    cbest = costs[best]
    improved = ok & (cbest < cost - config.accept_tol) & jnp.isfinite(cbest)
    Xn = jnp.where(improved, Xs[best], X)
    Un = jnp.where(improved, Us[best], U)
    cn = jnp.where(improved, cbest, cost)
    Kn = jnp.where(improved, Ks, K_last)
    reg_n = jnp.where(
        improved,
        jnp.maximum(reg * config.reg_down, config.reg_min),
        jnp.minimum(reg * config.reg_up, config.reg_max),
    )
    return (Xn, Un, cn, reg_n, Kn), (cn, reg_n)

  # 0*c0 terms: inherit vma metadata from the trajectory (see backward())
  K_init = jnp.zeros((H, nu, nx), dtype=dtype) + 0.0 * c0
  reg0 = jnp.asarray(config.reg_init, dtype) + 0.0 * c0
  (Xf, Uf, cf, _, Kf), (ctrace, rtrace) = jax.lax.scan(
      iteration,
      (X0, U0, c0, reg0, K_init),
      None,
      length=config.iters,
  )
  return ILQRSolution(X=Xf, U=Uf, cost=cf, cost_trace=ctrace, reg_trace=rtrace, gains_K=Kf)
