"""Spatial (Plücker) algebra substrate — the TPU-native equivalent of RaiSim's L0 math layer.

The reference builds on Eigen3 fixed-size matrices (reference: .travis.yml:7) with thin
``raisim::Vec<n>`` / ``raisim::Mat<r,c>`` wrappers. Here the substrate is pure ``jnp``:
every function is shape-static, branch-free, dtype-polymorphic (f32 on TPU, f64 for CPU
oracles), and written for a *single* world so that ``jax.vmap`` supplies the batch axis.

Conventions (Featherstone, "Rigid Body Dynamics Algorithms"):
  * Spatial motion vectors are 6-vectors ``[angular(3), linear(3)]``.
  * Spatial force  vectors are 6-vectors ``[moment(3),  force(3)]``.
  * Quaternions are ``[w, x, y, z]``, unit norm.
  * A spatial transform ``X`` from frame A to frame B is stored as the pair ``(E, r)``:
    ``E`` is the 3x3 rotation taking A-coordinates to B-coordinates and ``r`` is the
    position of B's origin expressed in A.  Motion vectors map as
    ``w' = E w,  v' = E (v - r × w)``; force vectors as
    ``n' = E (n - r × f),  f' = E f``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# SO(3): skew, exp/log, quaternions
# ---------------------------------------------------------------------------


def skew(v):
  """3-vector -> 3x3 skew-symmetric matrix such that skew(v) @ u = v × u."""
  x, y, z = v[..., 0], v[..., 1], v[..., 2]
  zero = jnp.zeros_like(x)
  return jnp.stack(
      [
          jnp.stack([zero, -z, y], axis=-1),
          jnp.stack([z, zero, -x], axis=-1),
          jnp.stack([-y, x, zero], axis=-1),
      ],
      axis=-2,
  )


def quat_mul(q1, q2):
  """Hamilton product q1 ⊗ q2 (both [w,x,y,z])."""
  w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
  w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
  return jnp.stack(
      [
          w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
          w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
          w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
          w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
      ],
      axis=-1,
  )


def quat_conj(q):
  return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q, eps=1e-12):
  return q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)


def quat_rotate(q, v):
  """Rotate vector v by unit quaternion q (active rotation: v_world = R(q) v_body)."""
  w = q[..., :1]
  u = q[..., 1:]
  uv = jnp.cross(u, v)
  return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q, v):
  return quat_rotate(quat_conj(q), v)


def quat_to_mat(q):
  """Unit quaternion -> rotation matrix R with v_world = R v_body."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return jnp.stack(
      [
          jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
          jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
          jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
      ],
      axis=-2,
  )


def mat_to_quat(R):
  """Rotation matrix -> unit quaternion [w,x,y,z].

  Branch-free (TPU-friendly): computes all four candidate quaternions (one per
  largest diagonal pivot) and selects via where-masks, so it is safe under vmap.
  """
  m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
  m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
  m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
  tr = m00 + m11 + m22

  # Four candidates; each is valid (non-degenerate) when its pivot is largest.
  def cand_w():
    s = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], axis=-1)

  def cand_x():
    s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], axis=-1)

  def cand_y():
    s = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], axis=-1)

  def cand_z():
    s = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], axis=-1)

  use_w = tr > 0.0
  use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
  use_y = (~use_w) & (~use_x) & (m11 >= m22)
  q = jnp.where(
      use_w[..., None],
      cand_w(),
      jnp.where(use_x[..., None], cand_x(), jnp.where(use_y[..., None], cand_y(), cand_z())),
  )
  return quat_normalize(q)


def quat_from_axis_angle(axis, angle):
  """axis (unit 3-vec), angle (scalar) -> quaternion."""
  half = 0.5 * angle
  return jnp.concatenate(
      [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
  )


def quat_exp(omega_dt):
  """Exp map: rotation vector (3,) -> unit quaternion. Safe at zero."""
  angle2 = jnp.sum(omega_dt * omega_dt, axis=-1, keepdims=True)
  angle = jnp.sqrt(angle2 + 1e-32)
  half = 0.5 * angle
  # sin(x)/x stable form
  sinc_half = jnp.where(angle2 > 1e-16, jnp.sin(half) / angle, 0.5 - angle2 / 48.0)
  return jnp.concatenate([jnp.cos(half), sinc_half * omega_dt], axis=-1)


def quat_integrate(q, omega_world, dt):
  """Integrate unit quaternion by world-frame angular velocity over dt (exp map)."""
  dq = quat_exp(omega_world * dt)
  return quat_normalize(quat_mul(dq, q))


def quat_box_minus(q1, q2):
  """Rotation-vector difference log(q1 ⊗ q2⁻¹) — world-frame tangent. Safe at identity."""
  dq = quat_mul(q1, quat_conj(q2))
  # enforce w >= 0 for shortest arc
  dq = dq * jnp.sign(jnp.where(dq[..., :1] == 0.0, 1.0, dq[..., :1]))
  w = jnp.clip(dq[..., 0], -1.0, 1.0)
  xyz = dq[..., 1:]
  n = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1) + 1e-32)
  angle = 2.0 * jnp.arctan2(n, w)
  scale = jnp.where(n > 1e-8, angle / n, 2.0 / jnp.maximum(w, 1e-8))
  return scale[..., None] * xyz


# ---------------------------------------------------------------------------
# Spatial transforms X = (E, r): A-coords -> B-coords
# ---------------------------------------------------------------------------


def xform_identity(dtype=jnp.float32):
  return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype)


def xform_compose(X2, X1):
  """(A->B = X1) then (B->C = X2) -> A->C."""
  E2, r2 = X2
  E1, r1 = X1
  E = E2 @ E1
  r = r1 + E1.T @ r2
  return E, r


def xform_inv(X):
  E, r = X
  return E.T, -(E @ r)


def xform_motion(X, v):
  """Motion vector from A-coords to B-coords."""
  E, r = X
  w, vl = v[..., :3], v[..., 3:]
  return jnp.concatenate([w @ E.T, (vl - jnp.cross(r, w)) @ E.T], axis=-1)


def xform_motion_inv(X, v):
  """Motion vector from B-coords back to A-coords."""
  E, r = X
  w = v[..., :3] @ E
  vl = v[..., 3:] @ E
  return jnp.concatenate([w, vl + jnp.cross(r, w)], axis=-1)


def xform_force(X, f):
  """Force vector from A-coords to B-coords (dual transform)."""
  E, r = X
  n, fl = f[..., :3], f[..., 3:]
  return jnp.concatenate([(n - jnp.cross(r, fl)) @ E.T, fl @ E.T], axis=-1)


def xform_force_inv(X, f):
  """Force vector from B-coords back to A-coords."""
  E, r = X
  n = f[..., :3] @ E
  fl = f[..., 3:] @ E
  return jnp.concatenate([n + jnp.cross(r, fl), fl], axis=-1)


def xform_point(X, p):
  """Transform a point's A-coordinates to B-coordinates: p' = E (p - r)."""
  E, r = X
  return (p - r) @ E.T


def xform_point_inv(X, p):
  E, r = X
  return p @ E + r


def xform_motion_mat(X):
  """Dense 6x6 motion transform [E 0; -E r̃ E] (for matrix congruences)."""
  E, r = X
  Z = jnp.zeros_like(E)
  top = jnp.concatenate([E, Z], axis=-1)
  bot = jnp.concatenate([-E @ skew(r), E], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Spatial cross products
# ---------------------------------------------------------------------------


def cross_motion(v, m):
  """v ×ₘ m — spatial cross product of motion vectors."""
  w, vl = v[..., :3], v[..., 3:]
  mw, ml = m[..., :3], m[..., 3:]
  return jnp.concatenate(
      [jnp.cross(w, mw), jnp.cross(w, ml) + jnp.cross(vl, mw)], axis=-1
  )


def cross_force(v, f):
  """v ×* f — spatial cross product applied to a force vector."""
  w, vl = v[..., :3], v[..., 3:]
  n, fl = f[..., :3], f[..., 3:]
  return jnp.concatenate(
      [jnp.cross(w, n) + jnp.cross(vl, fl), jnp.cross(w, fl)], axis=-1
  )


# ---------------------------------------------------------------------------
# Spatial inertia: stored dense 6x6 about the body-frame origin.
#   I = [ I_o        skew(h) ]    h = m * com,  I_o = I_com - m * skew(com)^2
#       [ skew(h)^T  m * 1   ]
# ---------------------------------------------------------------------------


def spatial_inertia(mass, com, inertia_com):
  """Build the 6x6 spatial inertia about the body-frame origin.

  Args:
    mass: scalar.
    com: (3,) center of mass in body frame.
    inertia_com: (3,3) rotational inertia about the COM, body-frame axes.
  """
  C = skew(com)
  I_o = inertia_com + mass * (C @ C.T)
  h = skew(mass * com)
  top = jnp.concatenate([I_o, h], axis=-1)
  m_eye = mass * jnp.eye(3, dtype=I_o.dtype)
  bot = jnp.concatenate([h.T, m_eye], axis=-1)
  return jnp.concatenate([top, bot], axis=-2)


def kinetic_energy(I6, v):
  return 0.5 * jnp.dot(v, I6 @ v)


def force_at_point(point_w, force_w, torque_w=None):
  """World wrench [torque_at_origin, force] for a force applied at a world
  point (+ optional pure torque): the 6-vector convention rnea/step expect."""
  tau = jnp.cross(point_w, force_w)
  if torque_w is not None:
    tau = tau + torque_w
  return jnp.concatenate([tau, force_w], axis=-1)
