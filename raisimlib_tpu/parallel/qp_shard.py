"""Contact-QP block solve sharded across devices (SURVEY.md C19 TP-analog).

BASELINE.json line 5 asks for the QP/SQP contact-block linear algebra to shard
across devices with `psum`/`all_gather`. The domain mapping: one large scene's
Delassus system (nc contact blocks, G (nc,3,nc,3)) is row-sharded over a mesh
axis — each device owns nc/D contact blocks and their coupling row G_i: — and the
solve iterates PROJECTED JACOBI (the parallel form of the reference's sequential
Gauss-Seidel): per iteration every device

    1. `all_gather`s the impulse vector lam (the only cross-device traffic,
       nc*3 floats over ICI),
    2. computes its local coupling products  c_i + sum_{j != i} G_ij lam_j
       (a local matmul — the MXU work stays on-device),
    3. runs the exact per-contact cone solve on its own rows,
    4. under-relaxes:  lam <- (1-omega) lam + omega lam*.

Under-relaxation (omega ~ 0.7) restores the convergence Gauss-Seidel gets from
sequencing; for the diagonally-dominant Delassus systems of stacked/articulated
scenes both fixed points coincide (same KKT conditions — tested in
tests/test_qp_shard.py against the sequential solver and the cone conditions).

Composes with data parallelism: `make_sharded_contact_solver` builds a 2-D
(dp, qp) shard_map — worlds shard over dp, each world's contact blocks over qp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from raisimlib_tpu.ops import contact as ct


def _jacobi_shard(G_l, c0_l, mu_l, act_l, *, axis: str, iters: int,
                  omega: float, config: ct.SolverConfig):
  """One device's rows: G_l (nc_l, 3, nc, 3), c0_l/mu_l/act_l local shards."""
  nc_l = c0_l.shape[0]
  nc = G_l.shape[2]
  dtype = c0_l.dtype
  idx = jax.lax.axis_index(axis)

  # own diagonal blocks: global column offset of this shard's rows
  zero = jnp.zeros((), idx.dtype)
  G_own = jax.lax.dynamic_slice(
      G_l, (zero, zero, idx * nc_l, zero), (nc_l, 3, nc_l, 3))
  Gii = jax.vmap(lambda i: jax.lax.dynamic_slice(G_own, (i, 0, i, 0), (1, 3, 1, 3))
                 .reshape(3, 3))(jnp.arange(nc_l))            # (nc_l, 3, 3)
  Gf_l = G_l.reshape(nc_l * 3, nc * 3)

  def body(_, lam_l):
    lam_full = jax.lax.all_gather(lam_l, axis, tiled=True)    # (nc, 3)
    resid = (Gf_l @ lam_full.reshape(-1)).reshape(nc_l, 3)
    ci = c0_l + resid - jnp.einsum("ipq,iq->ip", Gii, lam_l)
    lam_star = jax.vmap(lambda g, c, m: ct.cone_solve(g, c, m, config))(
        Gii, ci, mu_l)
    lam_star = lam_star * act_l[:, None]
    return (1.0 - omega) * lam_l + omega * lam_star

  lam0 = jnp.zeros((nc_l, 3), dtype)
  return jax.lax.fori_loop(0, iters, body, lam0)


def make_sharded_contact_solver(mesh: Mesh, qp_axis: str = "qp",
                                dp_axis: str | None = "dp",
                                iters: int = 64, omega: float = 0.7,
                                config: ct.SolverConfig = ct.SolverConfig()):
  """solve(G, c0, mu, active) -> lam with contact rows sharded over `qp_axis`.

  Without `dp_axis`: G (nc, 3, nc, 3), c0/mu/active (nc, ...) — one world, rows
  split over the mesh. With `dp_axis`: a leading world-batch axis shards over dp
  while each world's rows shard over qp (the 2-D tp x dp layout). nc must be
  divisible by the qp axis size (pad with inactive rows otherwise).
  """
  solve_rows = functools.partial(_jacobi_shard, axis=qp_axis, iters=iters,
                                 omega=omega, config=config)

  if dp_axis is None:
    in_specs = (P(qp_axis), P(qp_axis), P(qp_axis), P(qp_axis))
    out_specs = P(qp_axis)
    fn = solve_rows
  else:
    in_specs = (P(dp_axis, qp_axis), P(dp_axis, qp_axis),
                P(dp_axis, qp_axis), P(dp_axis, qp_axis))
    out_specs = P(dp_axis, qp_axis)
    fn = jax.vmap(solve_rows)

  jitted = jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False))
  qp_size = dict(zip(mesh.axis_names, mesh.devices.shape))[qp_axis]
  row_axis = 0 if dp_axis is None else 1

  def solve(G, c0, mu, active):
    nc = c0.shape[row_axis]
    if nc % qp_size:
      raise ValueError(
          f"contact row count nc={nc} must be divisible by the '{qp_axis}' mesh "
          f"axis size {qp_size}; pad with inactive rows (active=0, identity "
          f"diagonal) to the next multiple — see tests/test_qp_shard._pad_rows")
    return jitted(G, c0, mu, active)

  return solve
