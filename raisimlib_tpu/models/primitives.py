"""Hand-built benchmark models: pendulum, double pendulum, cartpole, free bodies.

These are the PR1 reference systems (BASELINE.json configs line 7: "Cartpole /
double-pendulum swing-up MPC, no contact") — the smooth-dynamics slice that the
MuJoCo cross-validation oracle and the MPC layer are first proven on.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.models.model import JointType, build_model


def _rod_inertia(m, l, axis="x"):
  """Inertia of a thin rod of length l about its COM, extended along +z."""
  i = m * l * l / 12.0
  return np.diag([i, i, 1e-8 * m])


def pendulum(m=1.0, l=1.0, dtype=jnp.float32):
  """Single pendulum: revolute about world y-axis, rod hanging along -z at q=0."""
  return build_model(
      "pendulum",
      [
          dict(
              parent=-1,
              joint=JointType.REVOLUTE,
              axis=[0.0, 1.0, 0.0],
              pos=[0.0, 0.0, 0.0],
              mass=m,
              com=[0.0, 0.0, -l / 2],
              inertia=_rod_inertia(m, l),
              name="rod",
          )
      ],
      dtype=dtype,
  )


def double_pendulum(m1=1.0, m2=1.0, l1=1.0, l2=1.0, dtype=jnp.float32):
  return build_model(
      "double_pendulum",
      [
          dict(
              parent=-1,
              joint=JointType.REVOLUTE,
              axis=[0.0, 1.0, 0.0],
              pos=[0.0, 0.0, 0.0],
              mass=m1,
              com=[0.0, 0.0, -l1 / 2],
              inertia=_rod_inertia(m1, l1),
              name="link1",
          ),
          dict(
              parent=0,
              joint=JointType.REVOLUTE,
              axis=[0.0, 1.0, 0.0],
              pos=[0.0, 0.0, -l1],
              mass=m2,
              com=[0.0, 0.0, -l2 / 2],
              inertia=_rod_inertia(m2, l2),
              name="link2",
          ),
      ],
      dtype=dtype,
  )


def cartpole(mc=1.0, mp=0.1, l=0.5, dtype=jnp.float32):
  """Cart (prismatic along x) + pole (revolute about y); pole up is q1 = pi."""
  return build_model(
      "cartpole",
      [
          dict(
              parent=-1,
              joint=JointType.PRISMATIC,
              axis=[1.0, 0.0, 0.0],
              pos=[0.0, 0.0, 0.0],
              mass=mc,
              com=[0.0, 0.0, 0.0],
              inertia=np.eye(3) * 1e-6,
              name="cart",
          ),
          dict(
              parent=0,
              joint=JointType.REVOLUTE,
              axis=[0.0, 1.0, 0.0],
              pos=[0.0, 0.0, 0.0],
              mass=mp,
              com=[0.0, 0.0, -l / 2],
              inertia=_rod_inertia(mp, l),
              actuated=False,
              name="pole",
          ),
      ],
      dtype=dtype,
  )


def free_box(m=1.0, half_extents=(0.1, 0.1, 0.1), dtype=jnp.float32):
  hx, hy, hz = half_extents
  I = m / 3.0 * np.diag([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy])
  return build_model(
      "free_box",
      [
          dict(
              parent=-1,
              joint=JointType.FREE,
              mass=m,
              com=[0.0, 0.0, 0.0],
              inertia=I,
              actuated=False,
              name="box",
          )
      ],
      dtype=dtype,
  )


def free_sphere(m=1.0, radius=0.1, dtype=jnp.float32):
  I = 0.4 * m * radius * radius * np.eye(3)
  return build_model(
      "free_sphere",
      [
          dict(
              parent=-1,
              joint=JointType.FREE,
              mass=m,
              com=[0.0, 0.0, 0.0],
              inertia=I,
              actuated=False,
              name="sphere",
          )
      ],
      dtype=dtype,
  )
