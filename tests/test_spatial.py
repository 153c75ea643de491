"""Unit tests for the spatial-algebra substrate (SURVEY.md §4.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.ops import spatial as sp


def random_quat(rng):
  q = rng.normal(size=4)
  return jnp.asarray(q / np.linalg.norm(q))


def random_xform(rng):
  E = np.asarray(sp.quat_to_mat(random_quat(rng)))
  r = rng.normal(size=3)
  return jnp.asarray(E), jnp.asarray(r)


class TestQuaternions:
  def test_mul_matches_matrix_composition(self, rng):
    for _ in range(10):
      q1, q2 = random_quat(rng), random_quat(rng)
      R = sp.quat_to_mat(sp.quat_mul(q1, q2))
      np.testing.assert_allclose(R, sp.quat_to_mat(q1) @ sp.quat_to_mat(q2), atol=1e-12)

  def test_rotate_matches_matrix(self, rng):
    for _ in range(10):
      q = random_quat(rng)
      v = jnp.asarray(rng.normal(size=3))
      np.testing.assert_allclose(sp.quat_rotate(q, v), sp.quat_to_mat(q) @ v, atol=1e-12)

  def test_mat_quat_roundtrip(self, rng):
    for _ in range(50):
      q = random_quat(rng)
      q2 = sp.mat_to_quat(sp.quat_to_mat(q))
      # sign ambiguity
      s = np.sign(np.dot(q, q2))
      np.testing.assert_allclose(q, s * q2, atol=1e-8)

  def test_exp_map_small_angle_stable(self):
    q = sp.quat_exp(jnp.array([1e-12, 0.0, 0.0]))
    np.testing.assert_allclose(q, [1.0, 5e-13, 0.0, 0.0], atol=1e-15)

  def test_integrate_constant_omega(self):
    q = jnp.array([1.0, 0.0, 0.0, 0.0])
    omega = jnp.array([0.0, 0.0, np.pi])  # half-turn/s about z
    for _ in range(100):
      q = sp.quat_integrate(q, omega, 0.01)
    expected = sp.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi)
    s = np.sign(np.dot(q, expected))
    np.testing.assert_allclose(q, s * expected, atol=1e-9)

  def test_box_minus_inverse_of_integrate(self, rng):
    q = random_quat(rng)
    w = jnp.asarray(rng.normal(size=3)) * 0.3
    q2 = sp.quat_integrate(q, w, 1.0)
    np.testing.assert_allclose(sp.quat_box_minus(q2, q), w, atol=1e-9)


class TestTransforms:
  def test_compose_matches_dense(self, rng):
    X1, X2 = random_xform(rng), random_xform(rng)
    Xc = sp.xform_compose(X2, X1)
    np.testing.assert_allclose(
        sp.xform_motion_mat(Xc),
        sp.xform_motion_mat(X2) @ sp.xform_motion_mat(X1),
        atol=1e-12,
    )

  def test_inverse(self, rng):
    X = random_xform(rng)
    Xi = sp.xform_inv(X)
    I6 = sp.xform_motion_mat(sp.xform_compose(Xi, X))
    np.testing.assert_allclose(I6, np.eye(6), atol=1e-12)

  def test_motion_apply_matches_dense(self, rng):
    X = random_xform(rng)
    v = jnp.asarray(rng.normal(size=6))
    np.testing.assert_allclose(sp.xform_motion(X, v), sp.xform_motion_mat(X) @ v, atol=1e-12)
    np.testing.assert_allclose(sp.xform_motion_inv(X, sp.xform_motion(X, v)), v, atol=1e-12)

  def test_force_is_dual(self, rng):
    # <X* f, X v> == <f, v>
    X = random_xform(rng)
    v = jnp.asarray(rng.normal(size=6))
    f = jnp.asarray(rng.normal(size=6))
    lhs = jnp.dot(sp.xform_force(X, f), sp.xform_motion(X, v))
    np.testing.assert_allclose(lhs, jnp.dot(f, v), atol=1e-12)

  def test_point_roundtrip(self, rng):
    X = random_xform(rng)
    p = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(sp.xform_point_inv(X, sp.xform_point(X, p)), p, atol=1e-12)


class TestSpatialCross:
  def test_cross_motion_is_lie_bracket(self, rng):
    v = jnp.asarray(rng.normal(size=6))
    m = jnp.asarray(rng.normal(size=6))
    # antisymmetry
    np.testing.assert_allclose(sp.cross_motion(v, m), -sp.cross_motion(m, v), atol=1e-12)

  def test_cross_force_duality(self, rng):
    # d/dt <f, v> identity: <v x* f, m> = -<f, v x m>
    v = jnp.asarray(rng.normal(size=6))
    f = jnp.asarray(rng.normal(size=6))
    m = jnp.asarray(rng.normal(size=6))
    lhs = jnp.dot(sp.cross_force(v, f), m)
    rhs = -jnp.dot(f, sp.cross_motion(v, m))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


class TestInertia:
  def test_point_mass_ke(self, rng):
    m = 2.0
    c = jnp.asarray(rng.normal(size=3))
    I6 = sp.spatial_inertia(m, c, jnp.zeros((3, 3)))
    # pure translation: KE = 1/2 m v^2
    v = jnp.concatenate([jnp.zeros(3), jnp.asarray(rng.normal(size=3))])
    np.testing.assert_allclose(
        sp.kinetic_energy(I6, v), 0.5 * m * jnp.dot(v[3:], v[3:]), atol=1e-12
    )
    # pure rotation about origin: KE = 1/2 w . I_o w with I_o = I_c + m skew(c)skew(c)^T
    w = jnp.asarray(rng.normal(size=3))
    v = jnp.concatenate([w, jnp.zeros(3)])
    C = sp.skew(c)
    I_o = m * (C @ C.T)
    np.testing.assert_allclose(sp.kinetic_energy(I6, v), 0.5 * w @ I_o @ w, atol=1e-12)

  def test_symmetric_psd(self, rng):
    I6 = sp.spatial_inertia(1.5, jnp.asarray(rng.normal(size=3)),
                            jnp.asarray(np.diag([0.1, 0.2, 0.3])))
    np.testing.assert_allclose(I6, I6.T, atol=1e-12)
    w = np.linalg.eigvalsh(np.asarray(I6))
    assert (w > -1e-12).all()
