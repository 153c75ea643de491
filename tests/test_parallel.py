"""Distributed/parallel layer tests (SURVEY.md C19/C20, §4.5) — run on the 8
virtual CPU devices set up by conftest.py; the same meshes run unchanged on a real
v5e slice (mesh shape is the only knob)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.models import primitives
from raisimlib_tpu.mpc import ILQRConfig, ilqr, make_smooth_dyn
from raisimlib_tpu.mpc.mppi import _rollout_cost
from raisimlib_tpu.ops.integrator import State
from raisimlib_tpu.parallel import (
    MultiShootConfig,
    make_mesh,
    make_sharded_ilqr,
    make_sharded_rollout,
    multishoot_solve,
    shard_batch,
    weak_scaling_report,
)
from raisimlib_tpu.world import World


def cartpole_problem(dtype=jnp.float32):
  model = primitives.cartpole(dtype=dtype)
  G = jnp.array([0.0, 0.0, -9.81], dtype)
  dyn, nx, nu = make_smooth_dyn(model, G, dt=0.02, substeps=1)

  def rc(x, u, t):
    return (4.0 * (jnp.cos(x[1]) + 1.0) + 0.1 * x[0] ** 2 + 0.01 * jnp.sum(u**2)) * 0.02

  def fc(x):
    return 40.0 * (jnp.cos(x[1]) + 1.0) + 2.0 * x[0] ** 2 + x[2] ** 2 + x[3] ** 2

  return dyn, nx, nu, rc, fc


class TestShardedRollout:
  def test_matches_single_device_vmap(self):
    """Sharding the batch over 8 devices must not change the physics."""
    world = World(dt=0.002, dtype=jnp.float32)
    world.add_sphere(0.1, 1.0, pos=(0.0, 0.0, 0.3))
    world.add_ground()
    scene = world.compile()
    mesh = make_mesh(8)

    B, H = 16, 40
    q0 = jnp.tile(scene.model.q_init[None], (B, 1))
    q0 = q0.at[:, 2].set(jnp.linspace(0.15, 0.5, B, dtype=jnp.float32))
    s0 = State(q=q0, u=jnp.zeros((B, scene.model.nv), jnp.float32),
               t=jnp.zeros((B,), jnp.float32))
    taus = jnp.zeros((B, H, scene.model.nv), jnp.float32)

    rollout = make_sharded_rollout(scene, mesh)
    final_sh, qs_sh = rollout(*shard_batch(mesh, (s0, taus)))

    def ref(s, taus):
      def body(st, tau_t):
        st2 = jax.vmap(scene.step)(st, tau_t)
        return st2, st2.q
      f, qs = jax.lax.scan(body, s, jnp.swapaxes(taus, 0, 1))
      return f, jnp.swapaxes(qs, 0, 1)

    final_ref, qs_ref = jax.jit(ref)(s0, taus)
    np.testing.assert_allclose(np.asarray(final_sh.q), np.asarray(final_ref.q),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(qs_sh), np.asarray(qs_ref), atol=1e-5)
    # falling spheres never penetrate the plane
    z = np.asarray(qs_sh[:, :, 2])
    assert np.all(z > 0.095), z.min()


class TestShardedILQR:
  def test_matches_unsharded_and_reduces_metrics(self):
    dyn, nx, nu, rc, fc = cartpole_problem()
    mesh = make_mesh(8)
    cfg = ILQRConfig(iters=4)
    B, H = 16, 30
    x0s = jnp.zeros((B, nx), jnp.float32).at[:, 0].set(
        jnp.linspace(-0.5, 0.5, B, dtype=jnp.float32))
    U0s = jnp.zeros((B, H, nu), jnp.float32)

    solve = make_sharded_ilqr(dyn, rc, fc, mesh, cfg)
    U, cost, metrics = solve(*shard_batch(mesh, (x0s, U0s)))

    sols_ref = jax.jit(jax.vmap(lambda x0, U0: ilqr(dyn, rc, fc, x0, U0, cfg)))(
        x0s, U0s)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(sols_ref.cost),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(float(metrics["mean_cost"]),
                               float(jnp.mean(sols_ref.cost)), rtol=2e-4)
    np.testing.assert_allclose(float(metrics["max_cost"]),
                               float(jnp.max(sols_ref.cost)), rtol=2e-4)
    # metrics are fully replicated (no shard axis)
    assert metrics["mean_cost"].shape == ()


class TestMultipleShooting:
  def test_defects_close_and_cost_improves(self):
    """8 horizon segments on 8 devices: knot defects contract; the stitched plan
    beats the warm start."""
    dyn, nx, nu, rc, fc = cartpole_problem()
    mesh = make_mesh(8)
    H = 64
    x0 = jnp.zeros((nx,), jnp.float32).at[1].set(0.3)
    U0 = jnp.zeros((H, nu), jnp.float32)

    cfg = MultiShootConfig(outer_iters=8, ilqr=ILQRConfig(iters=6), rho=20.0)
    sol = multishoot_solve(dyn, rc, fc, x0, U0, mesh, cfg)

    c_warm = float(jax.jit(lambda: _rollout_cost(dyn, rc, fc, x0, U0))())
    defects = np.asarray(sol.defect_trace)
    assert np.all(np.isfinite(defects))
    assert defects[-1] < 0.05 * max(defects[0], 1e-6) + 1e-3, defects
    assert float(sol.cost) < c_warm, (float(sol.cost), c_warm)
    assert sol.U.shape == (H, nu)


class TestScalingHarness:
  def test_weak_scaling_table(self):
    dyn, nx, nu, rc, fc = cartpole_problem()
    per_dev = 4
    H = 10
    cfg = ILQRConfig(iters=2)

    def build(mesh):
      n = mesh.devices.size
      B = per_dev * n
      x0s = jnp.zeros((B, nx), jnp.float32)
      U0s = jnp.zeros((B, H, nu), jnp.float32)
      solve = make_sharded_ilqr(dyn, rc, fc, mesh, cfg)
      args = shard_batch(mesh, (x0s, U0s))
      return solve, args

    rows = weak_scaling_report(build, per_dev, device_counts=[1, 2, 4],
                               repeats=1, unit="solves/s")
    assert [r["n_devices"] for r in rows] == [1, 2, 4]
    assert rows[0]["efficiency"] == 1.0
    for r in rows:
      assert r["throughput"] > 0 and np.isfinite(r["efficiency"])


class TestShardedILQRFD:
  def test_dyn_fast_only_uses_fd_path(self):
    """make_sharded_ilqr with dyn_fast alone (no dyn_diff) must route through
    the kernel-FD Jacobians (advisor r4 #1: a custom-vjp dyn has no forward
    rule, so it must never hit the jvp path) and still descend."""
    dyn, nx, nu, rc, fc = cartpole_problem()
    mesh = make_mesh(4)
    cfg = ILQRConfig(iters=6, deriv="fd", fd_eps=1e-2)
    B, H = 8, 20
    x0s = jnp.zeros((B, nx), jnp.float32).at[:, 0].set(
        jnp.linspace(-0.4, 0.4, B, dtype=jnp.float32))
    U0s = jnp.zeros((B, H, nu), jnp.float32)

    def dyn_fast(X, U, t):
      return jax.vmap(lambda x, u: dyn(x, u, t))(X, U)

    solve = make_sharded_ilqr(dyn, rc, fc, mesh, cfg, dyn_fast=dyn_fast,
                              dyn_diff=None)
    U, cost, metrics = solve(*shard_batch(mesh, (x0s, U0s)))
    # the point of the advisor fix: this must not trace jvp through a
    # forward-only dyn, and must equal the UNSHARDED FD solve exactly
    from raisimlib_tpu.mpc.ilqr import ilqr_batch

    sol_ref = jax.jit(lambda x, U: ilqr_batch(
        dyn_fast, None, rc, fc, x, U, cfg))(x0s, U0s)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(sol_ref.cost),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(U), np.asarray(sol_ref.U),
                               atol=2e-4)
    assert np.all(np.isfinite(np.asarray(U)))
