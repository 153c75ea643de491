"""Fused Pallas TPU kernel for the batched per-contact cone solver (SURVEY.md C7).

Why a kernel: the pure-JAX Gauss-Seidel (ops/contact.py) is a chain of thousands of
tiny ops whose operands have 3-wide trailing dims — XLA lays the batch on sublanes and
pads 3 -> 128 lanes, so every intermediate wastes ~98% of HBM bandwidth and VPU lanes.
This kernel flips the layout: the BATCH lives on the lane axis ((..., TILE) blocks,
TILE a multiple of 128), every per-world scalar is a full vector register, and the
whole solve (sweeps x contacts x cone search) runs out of VMEM in ONE kernel with zero
HBM round-trips for intermediates.

Algorithm identical to ops/contact.py `solve_contacts` (RaiSim's per-contact exact
cone solve, RA-L 2018 semantics): Gauss-Seidel sweeps; per contact, closed-form
stick/open tests + boundary search over the cone angle. The boundary search here is a
parallel angular grid + two shrinking 5-point refinement rounds + a parabolic fit —
all lane-vectorized, no gathers (argmin-selects use the one-hot trick because TPU
cannot gather along sublanes).

Gradients: `solve_contacts_batch` carries a custom VJP whose backward pass re-derives
the solution with the differentiable pure-JAX solver and pulls the cotangent through
that — the kernel is the throughput path (MPPI rollouts, benchmarks), the pure solver
is the precision/derivative path (iLQR), and both implement the same math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisimlib_tpu.ops import contact as ct

TILE = 256


def _cone_solve_vec(Gii, ci, mu, n_grid, dtype):
  """Vectorized exact cone solve. Gii: (3,3,T), ci: (3,T), mu: (T,) -> lam (3,T).

  Same case analysis as ops/contact.py `cone_solve`, every scalar a lane vector.
  """
  big = jnp.asarray(3e38, dtype)
  T = ci.shape[-1]

  g00, g01, g02 = Gii[0, 0], Gii[0, 1], Gii[0, 2]
  g11, g12, g22 = Gii[1, 1], Gii[1, 2], Gii[2, 2]
  c0, c1, c2 = ci[0], ci[1], ci[2]

  # --- stick: lam = -Gii^{-1} c (cofactor inverse) ---
  k00 = g11 * g22 - g12 * g12
  k01 = g02 * g12 - g01 * g22
  k02 = g01 * g12 - g02 * g11
  k11 = g00 * g22 - g02 * g02
  k12 = g01 * g02 - g00 * g12
  k22 = g00 * g11 - g01 * g01
  det = g00 * k00 + g01 * k01 + g02 * k02
  inv_det = 1.0 / (det + 1e-20)
  ls0 = -(k00 * c0 + k01 * c1 + k02 * c2) * inv_det
  ls1 = -(k01 * c0 + k11 * c1 + k12 * c2) * inv_det
  ls2 = -(k02 * c0 + k12 * c1 + k22 * c2) * inv_det
  t_norm = jnp.sqrt(ls0 * ls0 + ls1 * ls1 + 1e-20)
  stick_ok = (ls2 > 0.0) & (t_norm <= mu * ls2)

  # --- open ---
  open_ok = c2 >= 0.0

  # --- slip: E(theta) on the cone boundary, v_n+ = 0 pins the magnitude ---
  def curve(theta):
    """theta: (K, T) -> E (masked), s, (d0, d1). d2 == 1."""
    d0 = mu[None, :] * jnp.cos(theta)
    d1 = mu[None, :] * jnp.sin(theta)
    gd0 = g00[None] * d0 + g01[None] * d1 + g02[None]
    gd1 = g01[None] * d0 + g11[None] * d1 + g12[None]
    gd2 = g02[None] * d0 + g12[None] * d1 + g22[None]
    den_ok = gd2 > 1e-12
    s = -c2[None] / jnp.where(den_ok, gd2, 1.0)
    feas = den_ok & (s > 0.0)
    s = jnp.where(feas, s, 0.0)
    dgd = d0 * gd0 + d1 * gd1 + gd2
    dc = d0 * c0[None] + d1 * c1[None] + c2[None]
    E = 0.5 * s * s * dgd + s * dc
    return jnp.where(feas, E, big), s, d0, d1

  def select_min(E, theta):
    """(K,T) -> argmin-selected theta + rolled neighbors, gather-free.
    argmin via min + first-match one-hot (min-reductions only — Mosaic-safe)."""
    K = E.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, E.shape, 0)
    Emin = jnp.min(E, axis=0)
    score = jnp.where(E == Emin[None, :], iota, K)
    kmin = jnp.min(score, axis=0)                                  # (T,)
    onehot = (iota == kmin[None, :]).astype(dtype)
    th0 = jnp.sum(onehot * theta, axis=0)
    E0 = jnp.sum(onehot * E, axis=0)
    Em = jnp.sum(onehot * pltpu.roll(E, 1, 0), axis=0)             # E[k-1]
    Ep = jnp.sum(onehot * pltpu.roll(E, K - 1, 0), axis=0)         # E[k+1]
    return th0, E0, Em, Ep

  # constants built in-kernel from iota (captured jnp constants are not allowed;
  # tpu.iota is integer-only, so cast after)
  dtheta = 2.0 * np.pi / n_grid
  thetas = (jax.lax.broadcasted_iota(jnp.int32, (n_grid, T), 0).astype(dtype)
            * dtheta)
  E_grid, _, _, _ = curve(thetas)
  theta_b, _, _, _ = select_min(E_grid, thetas)

  # two shrinking 5-point refinement rounds + parabolic fit (all parallel)
  offs = (jax.lax.broadcasted_iota(jnp.int32, (5, 1), 0).astype(dtype)
          * 0.5 - 1.0)
  span = 0.5 * dtheta
  for _ in range(2):
    th5 = theta_b[None, :] + offs * span
    E5, _, _, _ = curve(th5)
    theta_b, E0, Em, Ep = select_min(E5, th5)
    span = span * 0.25
  # parabolic fit on the final bracket (spacing = 4*span after the loop)
  h = span * 4.0 * 0.5
  denom = Em - 2.0 * E0 + Ep
  off = jnp.where(jnp.abs(denom) > 1e-30, 0.5 * (Em - Ep) / (denom + 1e-30), 0.0)
  theta_b = theta_b + jnp.clip(off, -1.0, 1.0) * h

  E_b, s_b, d0_b, d1_b = curve(theta_b[None, :])
  any_feas = jnp.min(E_grid, axis=0) < big
  s_safe = jnp.where(any_feas, s_b[0], -c2 / (g22 + 1e-20))
  l0 = jnp.where(any_feas, s_safe * d0_b[0], 0.0)
  l1 = jnp.where(any_feas, s_safe * d1_b[0], 0.0)
  l2 = s_safe

  zero = jnp.zeros_like(l0)
  lam0 = jnp.where(stick_ok, ls0, jnp.where(open_ok, zero, l0))
  lam1 = jnp.where(stick_ok, ls1, jnp.where(open_ok, zero, l1))
  lam2 = jnp.where(stick_ok, ls2, jnp.where(open_ok, zero, l2))
  return jnp.stack([lam0, lam1, lam2])


def _solver_kernel(G_ref, c_ref, mu_ref, act_ref, lam_ref, lam_scr, *,
                   nc, sweeps, n_grid, dtype):
  """One batch tile: full Gauss-Seidel solve in VMEM. Blocks:
  G (nc3, nc3, T), c (nc3, T), mu/act (nc, T), lam out (nc3, T)."""
  lam_scr[:] = jnp.zeros_like(lam_scr)

  def sweep_body(_, carry):
    def contact_body(i, carry):
      lam = lam_scr[:]                                   # (nc3, T)
      Gi = G_ref[pl.ds(3 * i, 3), :, :]                  # (3, nc3, T)
      Gii = G_ref[pl.ds(3 * i, 3), pl.ds(3 * i, 3), :]   # (3, 3, T)
      lam_i = lam_scr[pl.ds(3 * i, 3), :]                # (3, T)
      # residual c_i + sum_j G_ij lam_j  (then remove the diagonal term)
      ci = c_ref[pl.ds(3 * i, 3), :] + jnp.sum(Gi * lam[None, :, :], axis=1)
      ci = ci - jnp.sum(Gii * lam_i[None, :, :], axis=1)
      lam_new = _cone_solve_vec(Gii, ci, mu_ref[i, :], n_grid, dtype)
      lam_scr[pl.ds(3 * i, 3), :] = lam_new * act_ref[i, :][None, :]
      return carry

    return jax.lax.fori_loop(0, nc, contact_body, carry)

  jax.lax.fori_loop(0, sweeps, sweep_body, 0)
  lam_ref[:] = lam_scr[:]


def _solve_batch_impl(G, c0, mu, active, config: ct.SolverConfig):
  B, nc = c0.shape[0], c0.shape[1]
  nc3 = nc * 3
  dtype = c0.dtype

  Gt = jnp.moveaxis(G.reshape(B, nc3, nc3), 0, -1)   # (nc3, nc3, B)
  ctv = jnp.moveaxis(c0.reshape(B, nc3), 0, -1)      # (nc3, B)
  mut = jnp.moveaxis(mu, 0, -1)                      # (nc, B)
  att = jnp.moveaxis(active.astype(dtype), 0, -1)    # (nc, B)

  Bp = ((B + TILE - 1) // TILE) * TILE
  if Bp != B:
    Gt = jnp.pad(Gt, ((0, 0), (0, 0), (0, Bp - B)))
    # padded lanes: identity-ish diagonal keeps the solve well-posed
    eye = jnp.tile(jnp.eye(nc3, dtype=dtype)[:, :, None], (1, 1, Bp - B))
    Gt = Gt.at[:, :, B:].add(eye)
    ctv = jnp.pad(ctv, ((0, 0), (0, Bp - B)))
    mut = jnp.pad(mut, ((0, 0), (0, Bp - B)))
    att = jnp.pad(att, ((0, 0), (0, Bp - B)))

  kernel = functools.partial(
      _solver_kernel, nc=nc, sweeps=config.sweeps, n_grid=config.n_grid,
      dtype=dtype)
  lam = pl.pallas_call(
      kernel,
      # interpret mode lets the same code path run under the CPU test harness
      interpret=(jax.default_backend() == "cpu"),
      grid=(Bp // TILE,),
      in_specs=[
          pl.BlockSpec((nc3, nc3, TILE), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nc3, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
          pl.BlockSpec((nc, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
          pl.BlockSpec((nc, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((nc3, TILE), lambda t: (0, t),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((nc3, Bp), dtype),
      scratch_shapes=[pltpu.VMEM((nc3, TILE), dtype)],
  )(Gt, ctv, mut, att)

  return jnp.moveaxis(lam[:, :B], -1, 0).reshape(B, nc, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def solve_contacts_batch(G, c0, mu, active, config: ct.SolverConfig = ct.SolverConfig()):
  """Batched contact solve: G (B,nc,3,nc,3), c0 (B,nc,3), mu (B,nc), active (B,nc)
  -> lam (B,nc,3). Pallas forward; pure-JAX solver VJP for gradients."""
  return _solve_batch_impl(G, c0, mu, active, config)


def _fwd(G, c0, mu, active, config):
  return _solve_batch_impl(G, c0, mu, active, config), (G, c0, mu, active)


def _bwd(config, res, g):
  G, c0, mu, active = res
  ref = jax.vmap(lambda Gi, ci, mi, ai: ct.solve_contacts(Gi, ci, mi, ai,
                                                          config=config))
  _, vjp = jax.vjp(ref, G, c0, mu, active)
  return vjp(g)


solve_contacts_batch.defvjp(_fwd, _bwd)
