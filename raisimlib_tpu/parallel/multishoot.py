"""Multiple-shooting horizon decomposition across devices (SURVEY.md C19 "PP/SP/CP
analog", §5 "Long-context / sequence parallelism").

ML parallelism has no literal counterpart in a physics+MPC engine; the domain's long
axis is the rollout horizon. For horizons that exceed one device's latency budget the
horizon H = S·L is split into S segments, one per mesh device:

  * each device solves an iLQR subproblem on its own segment in parallel, with an
    augmented-Lagrangian/penalty term pulling its terminal state toward the next
    segment's knot state (consensus constraint);
  * segment boundary states travel to the next device with `lax.ppermute` (a ring
    shift over ICI — the pipeline-parallel communication pattern);
  * knots relax toward the received boundary states; defects contract geometrically
    (pure Gauss–Jacobi shooting closes all knots in ≤S outer rounds once controls
    settle).

The whole solve is ONE jitted shard_map program; outer rounds are a `lax.scan`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from raisimlib_tpu.mpc.ilqr import ILQRConfig, ilqr


@struct.dataclass
class MultiShootConfig:
  outer_iters: int = struct.field(pytree_node=False, default=6)
  ilqr: ILQRConfig = ILQRConfig(iters=8)
  rho: float = 10.0              # consensus penalty weight
  rho_growth: float = 1.6        # per-outer-round penalty escalation
  knot_relax: float = 1.0        # 1.0 = pure Gauss-Jacobi shooting update


class MultiShootSolution(NamedTuple):
  U: jnp.ndarray            # (H, nu) stitched control plan (replicated)
  knots: jnp.ndarray        # (S, nx) final knot states
  cost: jnp.ndarray         # scalar true cost of the stitched sequential rollout
  defect_trace: jnp.ndarray  # (outer_iters,) max knot defect norm per round


def _seq_rollout_cost(dyn, running_cost, final_cost, x0, U):
  H = U.shape[0]

  def body(x, u_t):
    u, t = u_t
    return dyn(x, u, t), running_cost(x, u, t)

  xf, cs = jax.lax.scan(body, x0, (U, jnp.arange(H)))
  return jnp.sum(cs) + final_cost(xf)


def multishoot_solve(
    dyn: Callable,            # (x, u, t) -> x_next
    running_cost: Callable,   # (x, u, t) -> scalar
    final_cost: Callable,
    x0: jnp.ndarray,
    U0: jnp.ndarray,          # (H, nu); H must be divisible by mesh size
    mesh: Mesh,
    config: MultiShootConfig = MultiShootConfig(),
) -> MultiShootSolution:
  """Consensus multiple-shooting MPC over a 1-D mesh (one segment per device)."""
  (axis,) = mesh.axis_names
  S = mesh.devices.size
  H, nu = U0.shape
  assert H % S == 0, f"horizon {H} not divisible by {S} segments"
  L = H // S
  nx = x0.shape[0]
  dtype = x0.dtype

  def solve_shard(x0_rep, U_seg, seg_idx):
    # shapes inside the shard: U_seg (1, L, nu), seg_idx (1,)
    k = seg_idx[0]
    t0 = k * L
    is_first = k == 0
    is_last = k == S - 1

    dyn_seg = lambda x, u, t: dyn(x, u, t + t0)
    rc_seg = lambda x, u, t: running_cost(x, u, t + t0)

    def seg_end(xk, Useg):
      def body(x, u_t):
        u, t = u_t
        return dyn_seg(x, u, t), None

      xf, _ = jax.lax.scan(body, xk, (Useg, jnp.arange(L)))
      return xf

    def outer(carry, _):
      xknot, xnext, U, rho = carry

      # terminal condition: consensus pull toward the next knot, except the last
      # segment, which owns the true terminal cost.
      def fc_seg(x):
        c_cons = 0.5 * rho * jnp.sum((x - xnext) ** 2)
        c_true = final_cost(x)
        return jnp.where(is_last, c_true, c_cons)

      sol = ilqr(dyn_seg, rc_seg, fc_seg, xknot, U, config.ilqr)
      x_end = seg_end(xknot, sol.U)

      # ring-shift boundary states forward one segment (the PP communication)
      perm = [(i, (i + 1) % S) for i in range(S)]
      x_in = jax.lax.ppermute(x_end[None], axis, perm)[0]  # device k gets end of k-1

      defect = jnp.sqrt(jnp.sum((x_in - xknot) ** 2))
      defect = jnp.where(is_first, 0.0, defect)            # segment 0's knot is x0
      max_defect = jax.lax.pmax(defect, axis)

      xknot_new = jnp.where(
          is_first, xknot, (1.0 - config.knot_relax) * xknot + config.knot_relax * x_in
      )
      # refresh each segment's consensus target with the NEW downstream knot
      xnext_new = jax.lax.ppermute(xknot_new[None], axis,
                                   [(i, (i - 1) % S) for i in range(S)])[0]
      return (xknot_new, xnext_new, sol.U, rho * config.rho_growth), max_defect

    # init: knots from the warm-start rollout of U0 (sequential scan, one-time)
    def init_body(x, u_t):
      u, t = u_t
      return dyn(x, u, t), x

    U_all0 = jax.lax.all_gather(U_seg[0], axis, tiled=True)    # (H, nu)
    _, X_warm = jax.lax.scan(init_body, x0_rep, (U_all0, jnp.arange(H)))
    xknot0 = X_warm[k * L]
    xnext0 = jax.lax.ppermute(xknot0[None], axis,
                              [(i, (i - 1) % S) for i in range(S)])[0]

    rho0 = jnp.asarray(config.rho, dtype)
    (xknot, _, U_opt, _), defects = jax.lax.scan(
        outer, (xknot0, xnext0, U_seg[0], rho0), None, length=config.outer_iters
    )

    # stitch: gather all segments' controls; evaluate the TRUE sequential cost
    U_full = jax.lax.all_gather(U_opt, axis, tiled=True)       # (H, nu)
    cost = _seq_rollout_cost(dyn, running_cost, final_cost, x0_rep, U_full)
    return U_full, xknot[None], cost, defects

  fn = shard_map(
      solve_shard,
      mesh=mesh,
      in_specs=(P(), P(axis, None, None), P(axis)),
      out_specs=(P(), P(axis, None), P(), P()),
      check_vma=False,

  )
  U_seg = U0.reshape(S, L, nu)
  seg_idx = jnp.arange(S, dtype=jnp.int32)
  U_full, knots, cost, defects = jax.jit(fn)(x0, U_seg, seg_idx)
  return MultiShootSolution(U=U_full, knots=knots, cost=cost, defect_trace=defects)
