"""Hard-contact Coulomb friction solver — batched per-contact exact cone solve.

TPU-native rewrite of RaiSim's per-contact iteration method (Hwangbo, Lee, Hutter,
RA-L 2018; SURVEY.md C7 `contact::BisectionContactSolver`). Per Gauss-Seidel sweep,
each contact's 3D impulse is solved *exactly* on its friction cone for the strictly
convex per-contact subproblem

    min_{lam in K_mu}  E(lam) = 1/2 lam^T G_ii lam + lam^T c_i ,

whose KKT conditions are precisely open/stick/slip complementarity (v+ = grad E).
The reference solves the cone-boundary case by bisection over the cone angle; here the
boundary search is a fixed n-point angular grid evaluated *in parallel* (one fused
vector op — the TPU-idiomatic replacement for the reference's scalar bisection loop)
followed by a fixed number of guarded Newton steps on dE/dtheta. Sequential depth per
cone solve is O(n_newton) ~ 2, not O(n_bisection) ~ 30, which is what keeps the
Gauss-Seidel sweep's serial chain short enough for the >=10k rollouts/s/chip target.

All loops are fixed-trip; inactive contacts are masked, never skipped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SolverConfig:
  """Fixed trip counts. Defaults balance accuracy against *sequential depth* — on TPU
  the scalar loop bodies execute serially (~us each), so depth = sweeps x contacts x
  newton steps is the single-world latency budget. 12 sweeps matches the reference's
  typical convergence; 2 Newton steps from the best grid cell reach ~machine-precision
  theta (E is smooth along the cone boundary)."""

  sweeps: int = struct.field(pytree_node=False, default=12)
  n_grid: int = struct.field(pytree_node=False, default=32)
  n_newton: int = struct.field(pytree_node=False, default=2)
  # static per-row kinds ("cone" | "lin" | "bilateral"), set by the pipeline when
  # constraint rows (joint limits / wires / pins) are appended; () = all cone.
  # The pure solver is kind-agnostic (the generic cone solve is exact for lin
  # rows, and bilateral rows are flagged by mu > BILATERAL_MU); the Pallas
  # kernel specializes its per-row update on these for throughput.
  row_kinds: tuple = struct.field(pytree_node=False, default=())


def _solve3(A, b):
  """Solve 3x3 SPD system via explicit cofactor inverse (fast, vmap-friendly)."""
  a00, a01, a02 = A[0, 0], A[0, 1], A[0, 2]
  a11, a12, a22 = A[1, 1], A[1, 2], A[2, 2]
  c00 = a11 * a22 - a12 * a12
  c01 = a02 * a12 - a01 * a22
  c02 = a01 * a12 - a02 * a11
  c11 = a00 * a22 - a02 * a02
  c12 = a01 * a02 - a00 * a12
  c22 = a00 * a11 - a01 * a01
  det = a00 * c00 + a01 * c01 + a02 * c02
  inv_det = 1.0 / (det + 1e-20)
  x0 = (c00 * b[0] + c01 * b[1] + c02 * b[2]) * inv_det
  x1 = (c01 * b[0] + c11 * b[1] + c12 * b[2]) * inv_det
  x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) * inv_det
  return jnp.stack([x0, x1, x2])


def cone_solve(G: jnp.ndarray, c: jnp.ndarray, mu, config: SolverConfig = SolverConfig()):
  """Exact per-contact solve of the hard-contact complementarity conditions.

  Cases (strict Signorini + Coulomb maximum dissipation, RA-L 2018 semantics):
    open:  lam = 0,               v_n+ = c_n >= 0
    stick: v+ = 0,                lam = -G^-1 c strictly inside the cone
    slip:  v_n+ = 0 (exactly),    lam on the cone boundary, theta chosen to
           minimize E = 1/2 lam^T G lam + lam^T c along the constrained curve
           lam(theta) = s(theta) [mu cos, mu sin, 1],  s = -c_n / (G d)_n.

  Enforcing v_n+ = 0 in the slip case (rather than minimizing E over s too) is what
  distinguishes this solver from the convex Anitescu-style relaxation — the latter
  exhibits a "launch" artifact (positive post-impact normal velocity under fast
  sliding) that RaiSim's formulation avoids.

  Args:
    G: (3,3) SPD Delassus block in the contact frame (t1, t2, n).
    c: (3,) free relative velocity in the contact frame (+ bias).
    mu: friction coefficient (scalar).
  Returns: lam (3,) impulse in the contact frame.
  """
  dtype = c.dtype
  big = jnp.asarray(1e30, dtype)

  # --- stick candidate: v+ = 0 ---
  lam_stick = -_solve3(G, c)
  t_norm = jnp.sqrt(lam_stick[0] ** 2 + lam_stick[1] ** 2 + 1e-20)
  stick_ok = (lam_stick[2] > 0.0) & (t_norm <= mu * lam_stick[2])

  # --- open: with lam = 0, v_n+ = c_n >= 0 ---
  open_ok = c[2] >= 0.0

  # --- slip: s(theta) pinned by v_n+ = 0; minimize E over theta ---
  # Coarse localization: evaluate E on the full angular grid in ONE vectorized op.
  thetas = jnp.linspace(0.0, 2.0 * jnp.pi, config.n_grid, endpoint=False, dtype=dtype)

  def curve(theta):
    d = jnp.stack([mu * jnp.cos(theta), mu * jnp.sin(theta), jnp.ones_like(theta)])
    gd = G @ d
    # safe division: zero out infeasible lanes BEFORE computing E so that neither
    # the primal nor its VJP can produce inf*0 = nan through the masked branch
    den_ok = gd[2] > 1e-12
    s = -c[2] / jnp.where(den_ok, gd[2], 1.0)
    feas = den_ok & (s > 0.0)
    s = jnp.where(feas, s, 0.0)
    E = 0.5 * s * s * (d @ gd) + s * (d @ c)
    return jnp.where(feas, E, big), s, d

  def curve_E(theta):
    return curve(theta)[0]

  E_grid = jax.vmap(curve_E)(thetas)
  k = jnp.argmin(E_grid)
  dtheta = 2.0 * jnp.pi / config.n_grid

  # Parabolic fit through the best cell's neighbors (wrap-around), then guarded
  # Newton on dE/dtheta — each step is one fused op, so the serial chain stays short.
  Em = E_grid[(k - 1) % config.n_grid]
  E0 = E_grid[k]
  Ep = E_grid[(k + 1) % config.n_grid]
  denom = Em - 2.0 * E0 + Ep
  den_ok = jnp.abs(denom) > 1e-30
  off = jnp.where(den_ok, 0.5 * (Em - Ep) / jnp.where(den_ok, denom, 1.0), 0.0)
  theta_best = thetas[k] + jnp.clip(off, -1.0, 1.0) * dtheta

  dE = jax.grad(curve_E)
  d2E = jax.grad(lambda t: dE(t))
  for _ in range(config.n_newton):
    g1 = dE(theta_best)
    g2 = d2E(theta_best)
    g2_ok = g2 > 1e-12
    step = jnp.where(g2_ok, g1 / jnp.where(g2_ok, g2, 1.0), 0.0)
    cand = theta_best - jnp.clip(step, -dtheta, dtheta)
    # keep the step only if it is feasible and does not increase E
    better = curve_E(cand) <= curve_E(theta_best)
    theta_best = jnp.where(better, cand, theta_best)

  _, s_best, d_best = curve(theta_best)
  # guard: if no feasible slip direction existed, fall back to the normal-only impulse
  any_feas = jnp.min(E_grid) < big
  s_safe = jnp.where(any_feas, s_best, -c[2] / (G[2, 2] + 1e-20))
  d_safe = jnp.where(any_feas, d_best, jnp.array([0.0, 0.0, 1.0], dtype))
  lam_slip = s_safe * d_safe

  # bilateral rows (pin constraints — ops/constraints.py) take the unconstrained
  # 3x3 solve regardless of cone feasibility; flagged by the mu sentinel
  bilateral = mu > 1e6
  return jnp.where(
      stick_ok | bilateral, lam_stick,
      jnp.where(open_ok, jnp.zeros(3, dtype), lam_slip)
  )


def solve_contacts(
    G: jnp.ndarray,        # (nc, 3, nc, 3) Delassus in contact frames
    c0: jnp.ndarray,       # (nc, 3) free velocity in contact frames (incl. bias)
    mu: jnp.ndarray,       # (nc,)
    active: jnp.ndarray,   # (nc,) float mask
    lam0: jnp.ndarray | None = None,
    config: SolverConfig = SolverConfig(),
) -> jnp.ndarray:
  """Masked Gauss-Seidel sweeps with exact per-contact cone solves.

  Sequential over contacts within a sweep (as the reference is) — nc is small and
  static; the batch axis over worlds comes from `vmap` outside.
  Returns lam (nc, 3) impulses in contact frames.
  """
  nc = c0.shape[0]
  lam = jnp.zeros_like(c0) if lam0 is None else lam0 * active[:, None]
  Gf = G.reshape(nc * 3, nc * 3)

  def sweep(_, lam):
    def contact_update(i, lam):
      # c_i = c0_i + sum_{j != i} G_ij lam_j  = c0_i + (G lam)_i - G_ii lam_i
      Gi = jax.lax.dynamic_slice(Gf, (3 * i, 0), (3, nc * 3))   # (3, nc*3)
      Gii = jax.lax.dynamic_slice(Gi, (0, 3 * i), (3, 3))
      lam_i = jax.lax.dynamic_slice(lam.reshape(-1), (3 * i,), (3,))
      ci = c0[i] + Gi @ lam.reshape(-1) - Gii @ lam_i
      lam_new = cone_solve(Gii, ci, mu[i], config) * active[i]
      return jax.lax.dynamic_update_slice(
          lam.reshape(-1), lam_new, (3 * i,)
      ).reshape(nc, 3)

    return jax.lax.fori_loop(0, nc, contact_update, lam)

  return jax.lax.fori_loop(0, config.sweeps, sweep, lam)
