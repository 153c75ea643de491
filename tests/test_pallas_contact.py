"""Pallas batched contact solver vs the pure-JAX reference solver (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.ops import contact as ct
from raisimlib_tpu.ops import pallas_contact as pc


def _random_problem(key, B, nc, mu_lo=0.3, mu_hi=1.2, dtype=jnp.float32):
  k1, k2, k3, k4, k5 = jax.random.split(key, 5)
  A = jax.random.normal(k1, (B, nc * 3, nc * 3), dtype)
  G = A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(nc * 3, dtype=dtype)
  G = G.reshape(B, nc, 3, nc, 3)
  c0 = jax.random.normal(k2, (B, nc, 3), dtype)
  mu = jax.random.uniform(k3, (B, nc), dtype, mu_lo, mu_hi)
  active = (jax.random.uniform(k4, (B, nc)) > 0.3).astype(dtype)
  return G, c0, mu, active


class TestPallasSolverParity:
  @pytest.mark.parametrize("nc", [1, 4, 12])
  def test_matches_pure_solver(self, nc):
    B = 8
    G, c0, mu, active = _random_problem(jax.random.PRNGKey(nc), B, nc)
    cfg = ct.SolverConfig()
    lam_k = jax.jit(lambda *a: pc.solve_contacts_batch(*a, cfg))(G, c0, mu, active)
    lam_r = jax.jit(jax.vmap(
        lambda Gi, ci, mi, ai: ct.solve_contacts(Gi, ci, mi, ai, config=cfg)
    ))(G, c0, mu, active)
    np.testing.assert_allclose(np.asarray(lam_k), np.asarray(lam_r),
                               atol=2e-3, rtol=2e-3)

  def test_solution_satisfies_contact_conditions(self):
    """Kernel output obeys Signorini + cone feasibility independently of the
    reference path."""
    B, nc = 16, 6
    G, c0, mu, active = _random_problem(jax.random.PRNGKey(7), B, nc)
    lam = jax.jit(lambda *a: pc.solve_contacts_batch(*a))(G, c0, mu, active)
    lam_n = np.asarray(lam)
    Gf = np.asarray(G.reshape(B, nc * 3, nc * 3))
    v_post = (np.asarray(c0).reshape(B, -1)
              + np.einsum("bij,bj->bi", Gf, lam_n.reshape(B, -1))).reshape(B, nc, 3)
    act = np.asarray(active) > 0.5
    mu_n = np.asarray(mu)
    # cone feasibility
    t_norm = np.linalg.norm(lam_n[..., :2], axis=-1)
    assert np.all(t_norm[act] <= mu_n[act] * lam_n[..., 2][act] + 2e-3)
    # normal impulses non-negative; inactive contacts exactly zero
    assert np.all(lam_n[..., 2][act] >= -1e-6)
    assert np.allclose(lam_n[~act], 0.0)
    # Signorini: v_n+ >= 0 where converged (GS tolerance), no pulling
    assert np.all(v_post[..., 2][act] > -5e-2)

  def test_batch_not_multiple_of_tile(self):
    B, nc = 37, 3
    G, c0, mu, active = _random_problem(jax.random.PRNGKey(3), B, nc)
    lam = jax.jit(lambda *a: pc.solve_contacts_batch(*a))(G, c0, mu, active)
    assert lam.shape == (B, nc, 3)
    assert np.all(np.isfinite(np.asarray(lam)))

  def test_gradients_flow_via_custom_vjp(self):
    B, nc = 4, 2
    G, c0, mu, active = _random_problem(jax.random.PRNGKey(11), B, nc)

    def loss(c0):
      lam = pc.solve_contacts_batch(G, c0, mu, active)
      return jnp.sum(lam**2)

    g = jax.jit(jax.grad(loss))(c0)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


class TestStepBatchParity:
  def test_step_batch_matches_vmap_step(self):
    from raisimlib_tpu.world import World

    world = World(dt=0.002, dtype=jnp.float32)
    world.add_sphere(0.1, 1.0, pos=(0.0, 0.0, 0.12))
    world.add_box((0.1, 0.1, 0.1), 2.0, pos=(0.35, 0.0, 0.1))
    world.add_ground()
    scene = world.compile()

    B = 8
    q0 = jnp.tile(scene.model.q_init[None], (B, 1))
    q0 = q0.at[:, 2].add(jnp.linspace(0, 0.05, B, dtype=q0.dtype))
    s = jax.vmap(scene.init_state)(q0)
    tau = jnp.zeros((B, scene.model.nv), jnp.float32)

    s_ref = jax.jit(jax.vmap(lambda st, t: scene.step(st, t)))(s, tau)
    s_bat = jax.jit(lambda st, t: scene.step_batch(st, t))(s, tau)
    np.testing.assert_allclose(np.asarray(s_bat.q), np.asarray(s_ref.q),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_bat.u), np.asarray(s_ref.u),
                               atol=5e-3, rtol=1e-3)
