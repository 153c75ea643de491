"""Sharded contact-QP solve (SURVEY.md C19 TP-analog; BASELINE.json:5 "QP contact
blocks reduced via collectives"): projected-Jacobi rows over a mesh axis must
reproduce the sequential Gauss-Seidel solution and satisfy the cone KKT conditions.
Runs on the 8-virtual-CPU-device CI mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from raisimlib_tpu.ops import contact as ct
from raisimlib_tpu.ops import pipeline
from raisimlib_tpu.parallel.qp_shard import make_sharded_contact_solver
from raisimlib_tpu.world import World

F64 = jnp.float64


def _contact_problem(push=0.3, settle=150):
  """Real solver inputs from the sphere+box stack (BASELINE config 2)."""
  world = World(dt=0.002, dtype=F64)
  world.add_ground()
  world.add_box((0.25, 0.25, 0.15), mass=2.0, pos=(0.0, 0.0, 0.151))
  world.add_sphere(0.12, mass=1.0, pos=(0.05, 0.0, 0.45))
  scene = world.compile()
  s = scene.init_state()
  s = s.replace(u=s.u.at[9].set(push))

  @jax.jit
  def run(s):
    def body(s, _):
      return scene.step(s), None

    s, _ = jax.lax.scan(body, s, None, length=settle)
    return s

  s = run(s)
  tau = jnp.zeros((scene.model.nv,), F64)
  (G, c0, mu, active), _ = pipeline._pre_solve(scene, s, tau)
  return G, c0, mu, active


def _pad_rows(G, c0, mu, active, n_pad):
  """Append inactive rows with identity diagonal blocks (well-posed, inert)."""
  nc = c0.shape[0]
  m = nc + n_pad
  Gp = jnp.zeros((m, 3, m, 3), G.dtype)
  Gp = Gp.at[:nc, :, :nc, :].set(G)
  eye = jnp.eye(3, dtype=G.dtype)
  for k in range(nc, m):
    Gp = Gp.at[k, :, k, :].set(eye)
  c0p = jnp.concatenate([c0, jnp.zeros((n_pad, 3), c0.dtype)])
  mup = jnp.concatenate([mu, jnp.zeros((n_pad,), mu.dtype)])
  actp = jnp.concatenate([active, jnp.zeros((n_pad,), active.dtype)])
  return Gp, c0p, mup, actp


class TestShardedQP:
  def test_matches_sequential_gauss_seidel(self):
    G, c0, mu, active = _contact_problem()
    lam_ref = ct.solve_contacts(G, c0, mu, active,
                                config=ct.SolverConfig(sweeps=64))
    nc = c0.shape[0]
    n_pad = (-nc) % 4
    Gp, c0p, mup, actp = _pad_rows(G, c0, mu, active, n_pad)

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("qp",))
    solver = make_sharded_contact_solver(mesh, qp_axis="qp", dp_axis=None,
                                         iters=128, omega=0.7)
    lam = solver(Gp, c0p, mup, actp)
    # The 8-point box-plane manifold is statically indeterminate: the impulse
    # DISTRIBUTION is non-unique (GS and Jacobi land on different points of the
    # solution set), but the post-impact velocity G lam + c0 is unique — that is
    # the physical observable to match.
    v_sh = jnp.einsum("ipjq,jq->ip", G, lam[:nc]) + c0
    v_ref = jnp.einsum("ipjq,jq->ip", G, lam_ref) + c0
    act = np.asarray(active) > 0.5
    np.testing.assert_allclose(np.asarray(v_sh)[act], np.asarray(v_ref)[act],
                               atol=1e-5)
    if n_pad:
      assert float(jnp.abs(lam[nc:]).max()) == 0.0

  def test_kkt_conditions(self):
    """Independent of the reference solver: the sharded fixed point must satisfy
    Signorini + Coulomb conditions (v_n+ >= 0, lam in cone, complementarity)."""
    G, c0, mu, active = _contact_problem()
    nc = c0.shape[0]
    n_pad = (-nc) % 4
    Gp, c0p, mup, actp = _pad_rows(G, c0, mu, active, n_pad)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("qp",))
    solver = make_sharded_contact_solver(mesh, qp_axis="qp", dp_axis=None,
                                         iters=128, omega=0.7)
    lam = np.asarray(solver(Gp, c0p, mup, actp))[:nc]
    v_post = np.asarray(
        jnp.einsum("ipjq,jq->ip", G, jnp.asarray(lam)) + c0)
    act = np.asarray(active) > 0.5
    mu_n = np.asarray(mu)
    # cone feasibility
    t_norm = np.linalg.norm(lam[:, :2], axis=1)
    assert (lam[act, 2] >= -1e-12).all()
    assert (t_norm[act] <= mu_n[act] * lam[act, 2] + 1e-8).all()
    # Signorini: no approach at closed contacts; complementarity
    assert (v_post[act, 2] >= -1e-6).all()
    closed = act & (lam[:, 2] > 1e-8)
    # carrying a normal impulse => the contact is kinematically closed:
    # |v_n+| must vanish (not just the complementarity product below)
    assert np.abs(v_post[closed, 2]).max() < 1e-4
    assert (lam[closed, 2] * v_post[closed, 2] < 1e-6).all()

  def test_2d_dp_qp_mesh(self):
    """Worlds over dp, each world's contact rows over qp — the 2-D layout the
    multi-chip dryrun exercises."""
    G, c0, mu, active = _contact_problem()
    nc = c0.shape[0]
    n_pad = (-nc) % 2
    Gp, c0p, mup, actp = _pad_rows(G, c0, mu, active, n_pad)
    B = 4
    GB = jnp.broadcast_to(Gp, (B,) + Gp.shape)
    cB = jnp.broadcast_to(c0p, (B,) + c0p.shape)
    # vary the free velocity per world so shards aren't trivially identical
    cB = cB + 1e-3 * jnp.arange(B, dtype=F64)[:, None, None]
    muB = jnp.broadcast_to(mup, (B,) + mup.shape)
    aB = jnp.broadcast_to(actp, (B,) + actp.shape)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                axis_names=("dp", "qp"))
    solver = make_sharded_contact_solver(mesh, qp_axis="qp", dp_axis="dp",
                                         iters=128, omega=0.7)
    lam = solver(GB, cB, muB, aB)
    act = np.asarray(actp) > 0.5
    for b in range(B):
      lam_ref = ct.solve_contacts(Gp, cB[b], mup, actp,
                                  config=ct.SolverConfig(sweeps=64))
      v_sh = jnp.einsum("ipjq,jq->ip", Gp, lam[b]) + cB[b]
      v_ref = jnp.einsum("ipjq,jq->ip", Gp, lam_ref) + cB[b]
      np.testing.assert_allclose(np.asarray(v_sh)[act], np.asarray(v_ref)[act],
                                 atol=1e-5, err_msg=f"world {b}")
