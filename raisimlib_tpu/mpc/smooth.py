"""Glue: build iLQR-ready dynamics from a RobotModel's smooth (contact-free) step.

For models without quaternion states (all REVOLUTE/PRISMATIC — cartpole, pendulums)
the iLQR state is simply x = [q, u]. Floating-base systems use mpc/state_map.py's
tangent-space retraction instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.models.model import JointType, RobotModel
from raisimlib_tpu.ops import dynamics, integrator


def actuated_indices(model: RobotModel) -> np.ndarray:
  return np.nonzero(np.asarray(model.actuated) > 0.5)[0]


def make_smooth_dyn(model: RobotModel, gravity, dt: float, substeps: int = 1):
  """Returns (dyn, nx, nu): dyn(x, u_ctrl, t) -> x_next for Euclidean-state models."""
  assert all(JointType(j) != JointType.FREE for j in model.joint_types), (
      "make_smooth_dyn is for Euclidean-state models; floating bases use state_map"
  )
  act = actuated_indices(model)
  nu = len(act)
  nx = model.nq + model.nv
  g = jnp.asarray(gravity)
  h = dt / substeps

  def dyn(x, u_ctrl, t):
    del t
    q, v = x[: model.nq], x[model.nq :]
    tau = jnp.zeros((model.nv,), dtype=x.dtype).at[act].set(u_ctrl)
    for _ in range(substeps):
      qdd = dynamics.aba(model, q, v, tau, g)
      v = v + h * qdd
      q = dynamics.integrate_q(model, q, v, h)
    return jnp.concatenate([q, v])

  return dyn, nx, nu
