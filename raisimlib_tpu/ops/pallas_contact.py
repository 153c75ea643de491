"""Fused Pallas TPU kernel for the batched per-contact cone solver (SURVEY.md C7).

Why a kernel: the pure-JAX Gauss-Seidel (ops/contact.py) is a chain of thousands of
tiny ops whose operands have 3-wide trailing dims — XLA lays the batch on sublanes and
pads 3 -> 128 lanes, so every intermediate wastes ~98% of HBM bandwidth and VPU lanes.
This kernel flips the layout: the BATCH lives on the lane axis ((..., TILE) blocks,
TILE a multiple of 128), every per-world scalar is a full vector register, and the
whole solve (sweeps x contacts x cone search) runs out of VMEM in ONE kernel with zero
HBM round-trips for intermediates.

TPU-lowering layout rules (this is the round-2 rewrite; the round-1 kernel stored G as
(nc*3, nc*3, T) and loaded (3,3,T) sub-blocks, which slices the second-minor/sublane
axis at unaligned offsets — Mosaic cannot lower that):
  * every array is (..., small leading dims ..., nc, TILE): the ONLY tiled dims are
    (nc, TILE); the 3x3 contact-frame structure lives on untiled leading axes;
  * per-contact scalars (G_ii components, c_i, mu_i) are extracted with one-hot
    sublane reductions, never dynamic sublane indexing;
  * the Gauss-Seidel write-back is a full-tile masked blend, never a sub-tile store.

Algorithm identical to ops/contact.py `solve_contacts` (RaiSim's per-contact exact
cone solve, RA-L 2018 semantics): Gauss-Seidel sweeps; per contact, closed-form
stick/open tests + boundary search over the cone angle (parallel angular grid + two
shrinking 5-point refinement rounds + parabolic fit — all lane-vectorized, no gathers).

Gradients: `solve_contacts_batch` carries a custom VJP whose backward pass re-derives
the solution with the differentiable pure-JAX solver and pulls the cotangent through
that — the kernel is the throughput path (MPPI rollouts, benchmarks), the pure solver
is the precision/derivative path (iLQR), and both implement the same math (parity is
tested in tests/test_pallas_contact.py; gradient quality in tests/test_gradcheck.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisimlib_tpu.ops import contact as ct


def _tile_for(nc: int) -> int:
  """Batch tile: 256 lanes default; shrink when the (3,3,nc,nc,T) G block would
  blow the VMEM budget (block bytes ~ 9*nc*roundup(nc,8)*T*4, double-buffered)."""
  return 128 if nc > 16 else 256


def _stick_vec(g, c):
  """lam = -Gii^{-1} c on lane vectors (cofactor inverse of the 3x3 SPD block)."""
  g00, g01, g02, g11, g12, g22 = g
  c0, c1, c2 = c
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
  return ls0, ls1, ls2


def _cone_solve_vec(g, c, mu, n_grid, dtype):
  """Vectorized exact cone solve on (T,) lane vectors.

  g: dict of the 6 unique Gii components g00,g01,g02,g11,g12,g22 — each (T,);
  c: (c0, c1, c2) each (T,); mu: (T,). Returns (lam0, lam1, lam2) each (T,).
  Same case analysis as ops/contact.py `cone_solve`, every scalar a lane vector.
  """
  big = jnp.asarray(3e38, dtype)
  g00, g01, g02, g11, g12, g22 = g
  c0, c1, c2 = c
  T = c0.shape[-1]

  # --- stick: lam = -Gii^{-1} c (cofactor inverse) ---
  ls0, ls1, ls2 = _stick_vec(g, c)
  t_norm = jnp.sqrt(ls0 * ls0 + ls1 * ls1 + 1e-20)
  # mu > 1e6 is the BILATERAL sentinel (ops/constraints.py): always stick
  stick_ok = ((ls2 > 0.0) & (t_norm <= mu * ls2)) | (mu > 1e6)

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
  return lam0, lam1, lam2


def _solver_kernel(G_ref, c_ref, mu_ref, act_ref, lam_ref, lam_scr, *,
                   nc, sweeps, n_grid, dtype, kinds=()):
  """One batch tile: full Gauss-Seidel solve in VMEM.

  Blocks: G (3, 3, nc, nc, T) with G[a,b,i,j] = frame-a/frame-b coupling of contacts
  (i, j); c (3, nc, T); mu/act (nc, T); lam out + scratch (3, nc, T). The only tiled
  dims are the trailing (nc, T); everything else is leading-axis indexing.

  The contact loop is statically unrolled (nc is a trace-time constant), so the
  per-contact one-hot masks fold to compile-time vectors, and all sweep-invariant
  per-contact scalars (G_ii, c_i, mu_i, act_i — (T,) lane vectors) are hoisted out
  of the sweep loop; only the off-diagonal residual is recomputed per sweep.
  """
  T = mu_ref.shape[-1]
  lam_scr[:] = jnp.zeros_like(lam_scr)
  iota_nc = jax.lax.broadcasted_iota(jnp.int32, (nc, T), 0)

  # ---- sweep-invariant per-contact extractions (hoisted) ----
  onehots, keeps, Gii_all, ci0_all, mu_all, act_all = [], [], [], [], [], []
  for i in range(nc):
    onehot = (iota_nc == i).astype(dtype)                    # constant mask
    onehots.append(onehot)
    keeps.append(1.0 - onehot)
    Gii = {}
    for a in range(3):
      for b in range(a, 3):
        Gii[(a, b)] = jnp.sum(G_ref[a, b, i] * onehot, axis=0)   # (T,)
    Gii_all.append((Gii[(0, 0)], Gii[(0, 1)], Gii[(0, 2)],
                    Gii[(1, 1)], Gii[(1, 2)], Gii[(2, 2)]))
    ci0_all.append(tuple(jnp.sum(c_ref[a] * onehot, axis=0) for a in range(3)))
    mu_all.append(jnp.sum(mu_ref[:] * onehot, axis=0))
    act_all.append(jnp.sum(act_ref[:] * onehot, axis=0))

  def sweep_body(_, carry):
    for i in range(nc):
      kind = kinds[i] if kinds else "cone"
      onehot, keep = onehots[i], keeps[i]
      g = Gii_all[i]
      g_mat = ((g[0], g[1], g[2]), (g[1], g[3], g[4]), (g[2], g[4], g[5]))
      lam_b = (lam_scr[0], lam_scr[1], lam_scr[2])           # (nc, T) each

      if kind == "lin":
        # frictionless unilateral row (joint limit / wire): lam = (0, 0, lam_n),
        # lam_n = max(0, -c_n / G_nn) — a handful of FMAs, no cone search. The
        # row's tangent lanes stay zero, so only the normal residual is needed.
        lam_i2 = jnp.sum(lam_b[2] * onehot, axis=0)
        tot = ci0_all[i][2]
        for b in range(3):
          tot = tot + jnp.sum(G_ref[2, b, i] * lam_b[b], axis=0)
        c2 = tot - g[5] * lam_i2                             # g22 = g[5]
        ln2 = jnp.maximum(-c2 / (g[5] + 1e-20), 0.0)
        lam_scr[2, :, :] = lam_b[2] * keep + onehot * (ln2 * act_all[i])[None, :]
        continue

      lam_i = tuple(jnp.sum(lb * onehot, axis=0) for lb in lam_b)  # (T,) x3

      # residual c_i + sum_{j != i} G_ij lam_j
      ci = []
      for a in range(3):
        tot = ci0_all[i][a]
        diag_a = g_mat[a][0] * lam_i[0] + g_mat[a][1] * lam_i[1] + g_mat[a][2] * lam_i[2]
        for b in range(3):
          tot = tot + jnp.sum(G_ref[a, b, i] * lam_b[b], axis=0)
        ci.append(tot - diag_a)

      if kind == "bilateral":
        # pin triplet: exact equality solve, no cone cases
        ln = _stick_vec(g, tuple(ci))
      else:
        ln = _cone_solve_vec(g, tuple(ci), mu_all[i], n_grid, dtype)

      # masked full-tile blend write-back (no sub-tile stores)
      lam_scr[0, :, :] = lam_b[0] * keep + onehot * (ln[0] * act_all[i])[None, :]
      lam_scr[1, :, :] = lam_b[1] * keep + onehot * (ln[1] * act_all[i])[None, :]
      lam_scr[2, :, :] = lam_b[2] * keep + onehot * (ln[2] * act_all[i])[None, :]
    return carry

  jax.lax.fori_loop(0, sweeps, sweep_body, 0)
  lam_ref[:] = lam_scr[:]


def _solve_batch_impl(G, c0, mu, active, config: ct.SolverConfig):
  B, nc = c0.shape[0], c0.shape[1]
  dtype = c0.dtype

  # Pad the contact-row dim to a sublane multiple (8): every tiled block keeps
  # (nc, T) as its trailing dims, and Mosaic lowers aligned sublane tiles
  # orders-of-magnitude faster than ragged ones (measured: nc=28 compile blew
  # past 15 min; nc=32 is seconds). Pad rows are inert: identity diagonal,
  # active=0, kind "lin" (the cheapest row body).
  nc_orig = nc
  kinds = config.row_kinds
  pad_rows = (-nc) % 8
  if pad_rows:
    m = nc + pad_rows
    Gp = jnp.zeros((B, m, 3, m, 3), dtype)
    Gp = Gp.at[:, :nc, :, :nc, :].set(G)
    eye3 = jnp.eye(3, dtype=dtype)
    idx = jnp.arange(nc, m)
    Gp = Gp.at[:, idx, :, idx, :].set(eye3[None, None])
    G = Gp
    c0 = jnp.pad(c0, ((0, 0), (0, pad_rows), (0, 0)))
    mu = jnp.pad(mu, ((0, 0), (0, pad_rows)))
    active = jnp.pad(active, ((0, 0), (0, pad_rows)))
    kinds = (kinds or ("cone",) * nc_orig) + ("lin",) * pad_rows
    nc = m

  tile = _tile_for(nc)

  # (B, i, a, j, b) -> (a, b, i, j, B): frame components lead, (nc, B) trail
  Gt = jnp.transpose(G, (2, 4, 1, 3, 0))
  ctv = jnp.transpose(c0, (2, 1, 0))                 # (3, nc, B)
  mut = jnp.moveaxis(mu, 0, -1)                      # (nc, B)
  att = jnp.moveaxis(active.astype(dtype), 0, -1)    # (nc, B)

  Bp = ((B + tile - 1) // tile) * tile
  if Bp != B:
    pad = Bp - B
    Gt = jnp.pad(Gt, ((0, 0),) * 4 + ((0, pad),))
    # padded lanes: unit diagonal keeps the per-contact 3x3 solves well-posed
    eye3 = jnp.eye(3, dtype=dtype)[:, :, None, None]
    eyec = jnp.eye(nc, dtype=dtype)[None, None, :, :]
    Gt = Gt.at[:, :, :, :, B:].add((eye3 * eyec)[..., None])
    ctv = jnp.pad(ctv, ((0, 0), (0, 0), (0, pad)))
    mut = jnp.pad(mut, ((0, 0), (0, pad)))
    att = jnp.pad(att, ((0, 0), (0, pad)))

  if kinds:
    assert len(kinds) == nc, (kinds, nc)
  kernel = functools.partial(
      _solver_kernel, nc=nc, sweeps=config.sweeps, n_grid=config.n_grid,
      dtype=dtype, kinds=kinds)
  lam = pl.pallas_call(
      kernel,
      # interpret mode lets the same code path run under the CPU test harness
      interpret=(jax.default_backend() == "cpu"),
      grid=(Bp // tile,),
      in_specs=[
          pl.BlockSpec((3, 3, nc, nc, tile), lambda t: (0, 0, 0, 0, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((3, nc, tile), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nc, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
          pl.BlockSpec((nc, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((3, nc, tile), lambda t: (0, 0, t),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((3, nc, Bp), dtype),
      scratch_shapes=[pltpu.VMEM((3, nc, tile), dtype)],
  )(Gt, ctv, mut, att)

  return jnp.transpose(lam[:, :nc_orig, :B], (2, 1, 0))   # (B, nc, 3)


def _mf_kernel(Jr_ref, Wt_ref, vf_ref, bias_ref, mu_ref, act_ref,
               u_ref, lam_ref, z_scr, *, nc, sweeps, n_grid, dtype, kinds=()):
  """Matrix-free Gauss-Seidel dynamics solve for one batch tile (round 3).

  The round-2 kernel consumed a pre-assembled Delassus G (B,nc,3,nc,3) — whose
  XLA-side formation (73-column triangular solve + (72,72) matmul + 42 MB 5-D
  layout transposes) dominated the measured step. This kernel instead takes the
  FACTORS and never materializes G:

    Jr_ref  (3*nc, nvp, T)  contact-frame row Jacobians (rows lead, dofs on
                            sublanes padded to nvp, batch on lanes)
    Wt_ref  (3*nc, nvp, T)  rows of J M^-1  (so column j of M^-1 J^T = Wt[j])
    vf_ref  (nvp, T)        free velocity
    bias_ref(3*nc, 1, T)    restitution/Baumgarte bias per row
    mu_ref  (nc, 1, T), act_ref (nc, 1, T)

  Invariant maintained through the sweeps: z = M^-1 J^T lam (nvp, T). Per
  contact, (G lam)_i = Jr_i . z (three sublane reductions), and the final
  velocity is simply u_new = v_free + z — the impulse application costs
  nothing. Every extraction indexes LEADING dims only (Mosaic-safe); the only
  reductions are over the nvp sublane axis.

  Outputs: u_ref (nvp, T) new velocity; lam_ref (3, nc, T) impulses.
  """
  T = vf_ref.shape[-1]
  zero = jnp.zeros((T,), dtype)

  def row(ref, r):
    return ref[r]                       # (nvp, T) slab, leading index

  def dotv(a, b):
    return jnp.sum(a * b, axis=0)       # sublane reduction -> (T,)

  # ---- hoisted per-contact invariants ----
  # NOTE: Jr/Wt row slabs are read from their refs AT USE SITE, never hoisted
  # into python lists — holding 2*3nc live (nvp, T) values forces Mosaic into
  # register/VMEM spills (measured: ~5x kernel slowdown). Only (T,)-sized
  # scalars are hoisted.
  vf = vf_ref[:, :]
  ci0_all, Gii_all, mu_all, act_all = [], [], [], []
  for i in range(nc):
    kind = kinds[i] if kinds else "cone"
    mu_all.append(mu_ref[i, 0, :])
    act_all.append(act_ref[i, 0, :])
    if kind == "lin":
      # only the normal lane is ever used for frictionless unilateral rows
      g22 = dotv(Jr_ref[3 * i + 2], Wt_ref[3 * i + 2])
      Gii_all.append((None, None, None, None, None, g22))
      ci0_all.append((None, None,
                      dotv(Jr_ref[3 * i + 2], vf) - bias_ref[3 * i + 2, 0, :]))
    else:
      g = {}
      for a in range(3):
        for b in range(a, 3):
          g[(a, b)] = dotv(Jr_ref[3 * i + a], Wt_ref[3 * i + b])
      Gii_all.append((g[(0, 0)], g[(0, 1)], g[(0, 2)],
                      g[(1, 1)], g[(1, 2)], g[(2, 2)]))
      ci0_all.append(tuple(
          dotv(Jr_ref[3 * i + a], vf) - bias_ref[3 * i + a, 0, :]
          for a in range(3)))

  # lam lives in the lam_ref output block and z in a scratch slot, mutated in
  # place each sweep — NOT as fori_loop-carried values: carrying 3*nc lane
  # vectors through the loop carry spills vector registers and measured 4.7x
  # slower than the scratch pattern (which the round-2 kernel established).
  iota_nc = jax.lax.broadcasted_iota(jnp.int32, (nc, T), 0)
  onehots = [(iota_nc == i).astype(dtype) for i in range(nc)]
  keeps = [1.0 - oh for oh in onehots]
  lam_ref[:, :, :] = jnp.zeros((3, nc, T), dtype)
  z_scr[:, :] = jnp.zeros_like(vf)

  def sweep_body(_, carry):
    for i in range(nc):
      kind = kinds[i] if kinds else "cone"
      g = Gii_all[i]
      oh, keep = onehots[i], keeps[i]
      z = z_scr[:, :]

      if kind == "lin":
        li2 = jnp.sum(lam_ref[2] * oh, axis=0)
        c2 = ci0_all[i][2] + dotv(Jr_ref[3 * i + 2], z) - g[5] * li2
        ln2 = jnp.maximum(-c2 / (g[5] + 1e-20), 0.0) * act_all[i]
        z_scr[:, :] = z + Wt_ref[3 * i + 2] * (ln2 - li2)[None, :]
        lam_ref[2, :, :] = lam_ref[2] * keep + oh * ln2[None, :]
        continue

      li = tuple(jnp.sum(lam_ref[a] * oh, axis=0) for a in range(3))
      g_mat = ((g[0], g[1], g[2]), (g[1], g[3], g[4]), (g[2], g[4], g[5]))
      ci = []
      for a in range(3):
        diag_a = g_mat[a][0] * li[0] + g_mat[a][1] * li[1] + g_mat[a][2] * li[2]
        ci.append(ci0_all[i][a] + dotv(Jr_ref[3 * i + a], z) - diag_a)

      if kind == "bilateral":
        ln = _stick_vec(g, tuple(ci))
      else:
        ln = _cone_solve_vec(g, tuple(ci), mu_all[i], n_grid, dtype)

      dz = jnp.zeros_like(z)
      for a in range(3):
        la = ln[a] * act_all[i]
        dz = dz + Wt_ref[3 * i + a] * (la - li[a])[None, :]
        lam_ref[a, :, :] = lam_ref[a] * keep + oh * la[None, :]
      z_scr[:, :] = z + dz
    return carry

  jax.lax.fori_loop(0, sweeps, sweep_body, 0)
  u_ref[:, :] = vf + z_scr[:, :]


def _mf_impl(Jr, Wt, vf, bias, mu, active, config: ct.SolverConfig):
  """Batch-major inputs: Jr/Wt (B, nc, 3, nv), vf (B, nv), bias (B, nc, 3),
  mu/active (B, nc) -> (u_new (B, nv), lam (B, nc, 3))."""
  B, nc, _, nv = Jr.shape
  dtype = vf.dtype
  kinds = config.row_kinds
  if kinds:
    assert len(kinds) == nc, (kinds, nc)

  nvp = ((nv + 7) // 8) * 8             # sublane-align the dof axis
  tile = 128 if nc > 16 else 256

  def to_kernel(x):                     # (B, nc, 3, nv) -> (3nc, nvp, B)
    x = jnp.transpose(x.reshape(B, nc * 3, nv), (1, 2, 0))
    return jnp.pad(x, ((0, 0), (0, nvp - nv), (0, 0)))

  Jrt = to_kernel(Jr)
  Wtt = to_kernel(Wt)
  vft = jnp.pad(jnp.transpose(vf, (1, 0)), ((0, nvp - nv), (0, 0)))
  biast = jnp.transpose(bias.reshape(B, nc * 3), (1, 0))[:, None, :]
  mut = jnp.transpose(mu, (1, 0))[:, None, :]
  actt = jnp.transpose(active.astype(dtype), (1, 0))[:, None, :]

  Bp = ((B + tile - 1) // tile) * tile
  if Bp != B:
    pad = Bp - B
    Jrt = jnp.pad(Jrt, ((0, 0), (0, 0), (0, pad)))
    Wtt = jnp.pad(Wtt, ((0, 0), (0, 0), (0, pad)))
    vft = jnp.pad(vft, ((0, 0), (0, pad)))
    biast = jnp.pad(biast, ((0, 0), (0, 0), (0, pad)))
    mut = jnp.pad(mut, ((0, 0), (0, 0), (0, pad)))
    actt = jnp.pad(actt, ((0, 0), (0, 0), (0, pad)))
    # padded lanes: Jr = Wt = 0 -> Gii = 0; act = 0 keeps lam = 0; the one
    # guarded division in the lin row is against +1e-20, never 0/0

  kernel = functools.partial(
      _mf_kernel, nc=nc, sweeps=config.sweeps, n_grid=config.n_grid,
      dtype=dtype, kinds=kinds)
  u_new, lam = pl.pallas_call(
      kernel,
      interpret=(jax.default_backend() == "cpu"),
      grid=(Bp // tile,),
      in_specs=[
          pl.BlockSpec((3 * nc, nvp, tile), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((3 * nc, nvp, tile), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nvp, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
          pl.BlockSpec((3 * nc, 1, tile), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nc, 1, tile), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((nc, 1, tile), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((nvp, tile), lambda t: (0, t), memory_space=pltpu.VMEM),
          pl.BlockSpec((3, nc, tile), lambda t: (0, 0, t),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((nvp, Bp), dtype),
          jax.ShapeDtypeStruct((3, nc, Bp), dtype),
      ],
      scratch_shapes=[pltpu.VMEM((nvp, tile), dtype)],
  )(Jrt, Wtt, vft, biast, mut, actt)

  u_out = jnp.transpose(u_new[:nv, :B], (1, 0))
  lam_out = jnp.transpose(lam[:, :, :B], (2, 1, 0))
  return u_out, lam_out


def _mf_pure(Jr, Wt, vf, bias, mu, active, config: ct.SolverConfig):
  """Reference jnp implementation of the matrix-free solve (differentiable;
  the megakernel's VJP path and its CPU/parity oracle)."""
  B, nc, _, nv = Jr.shape
  Jf = Jr.reshape(B, nc * 3, nv)
  Wf = Wt.reshape(B, nc * 3, nv)
  G = jnp.einsum("brv,bsv->brs", Jf, Wf).reshape(B, nc, 3, nc, 3)
  c0 = jnp.einsum("brv,bv->br", Jf, vf).reshape(B, nc, 3) - bias
  lam = jax.vmap(lambda g, c, m, a: ct.solve_contacts(g, c, m, a,
                                                      config=config))(
      G, c0, mu, active)
  u_new = vf + jnp.einsum("brv,br->bv", Wf, lam.reshape(B, nc * 3))
  return u_new, lam


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def solve_dynamics_batch(Jr, Wt, vf, bias, mu, active,
                         config: ct.SolverConfig = ct.SolverConfig()):
  """Fused batched contact-dynamics solve (the round-3 megakernel path):

      u_new = vf + M^-1 J^T lam,   lam = GS-cone-solve(G = J M^-1 J^T, ...)

  without ever materializing G. Jr (B,nc,3,nv) contact-frame row Jacobians;
  Wt (B,nc,3,nv) rows of J M^-1; vf (B,nv); bias (B,nc,3); mu/active (B,nc).
  Pallas forward on TPU (interpret on CPU); pure-jnp VJP (same split as
  solve_contacts_batch: kernel = throughput, pure path = derivatives)."""
  return _mf_impl(Jr, Wt, vf, bias, mu, active, config)


def _mf_fwd(Jr, Wt, vf, bias, mu, active, config):
  out = _mf_impl(Jr, Wt, vf, bias, mu, active, config)
  return out, (Jr, Wt, vf, bias, mu, active)


def _mf_bwd(config, res, g):
  Jr, Wt, vf, bias, mu, active = res
  _, vjp = jax.vjp(lambda *a: _mf_pure(*a, config), Jr, Wt, vf, bias, mu, active)
  return vjp(g)


solve_dynamics_batch.defvjp(_mf_fwd, _mf_bwd)


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
