"""Frozen robot-model pytree — TPU-native equivalent of RaiSim's ArticulatedSystem model.

RaiSim builds a heap-allocated link/joint object tree from URDF at runtime
(reference `raisim/ArticulatedSystem.hpp` API surface; see SURVEY.md C2). Here the model
is a *frozen pytree* built once at trace time: static tree topology (Python tuples, so
`jit` specializes and unrolls the O(depth) recursions) + numeric parameter arrays
(leaves, so they can be differentiated/remapped). One model <-> one compiled step; the
batch axis over worlds comes from `vmap`.

Joint conventions:
  * FREE:      q = [pos(3), quat wxyz(4)]  u = [omega_body(3), v_body(3)]
               (Featherstone body-frame twist; RaiSim-layout accessors live in World)
  * REVOLUTE:  q = angle, u = rate, about `axis` in the child body frame
  * PRISMATIC: q = displacement, u = rate, along `axis` in the child body frame
  * Fixed joints are collapsed into their parent at build time (as RaiSim does).
"""

from __future__ import annotations

import enum
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


class JointType(enum.IntEnum):
  FREE = 0
  REVOLUTE = 1
  PRISMATIC = 2
  SPHERICAL = 3     # ball joint: q = quat wxyz(4), u = omega_body(3)


# dof / coord counts per joint type
_NQ = {JointType.FREE: 7, JointType.REVOLUTE: 1, JointType.PRISMATIC: 1,
       JointType.SPHERICAL: 4}
_NV = {JointType.FREE: 6, JointType.REVOLUTE: 1, JointType.PRISMATIC: 1,
       JointType.SPHERICAL: 3}


def joint_nv(jt: JointType) -> int:
  return _NV[JointType(jt)]


@struct.dataclass
class RobotModel:
  """Static kinematic tree + inertial parameters for one articulated system.

  Bodies are indexed 0..nb-1 in topological order (parent[i] < i); parent -1 is the
  world. Exactly one joint connects body i to its parent.
  """

  # --- static metadata (not pytree leaves; jit specializes on these) ---
  name: str = struct.field(pytree_node=False)
  parent: tuple = struct.field(pytree_node=False)        # len nb, ints, parent[i] < i
  joint_types: tuple = struct.field(pytree_node=False)   # len nb, JointType ints
  q_adr: tuple = struct.field(pytree_node=False)         # start index into q per body
  v_adr: tuple = struct.field(pytree_node=False)         # start index into u per body
  nq: int = struct.field(pytree_node=False)
  nv: int = struct.field(pytree_node=False)
  body_names: tuple = struct.field(pytree_node=False)

  # --- numeric parameters (leaves) ---
  # Transform from parent body frame to this body's joint frame (at q=0 the body
  # frame coincides with the joint frame): rotation (nb,3,3), translation (nb,3).
  X_rot: jnp.ndarray
  X_pos: jnp.ndarray
  axis: jnp.ndarray          # (nb,3) joint axis in child body frame (unused for FREE)
  inertia: jnp.ndarray       # (nb,6,6) spatial inertia about body-frame origin
  mass: jnp.ndarray          # (nb,)
  # actuation
  actuated: jnp.ndarray      # (nv,) 1.0 where a motor acts
  torque_limit: jnp.ndarray  # (nv,)
  # joint position limits, per dof (±1e9 = unlimited; FREE dofs unlimited)
  joint_lo: jnp.ndarray      # (nv,)
  joint_hi: jnp.ndarray      # (nv,)
  # default / initial configuration
  q_init: jnp.ndarray        # (nq,)

  @property
  def nb(self) -> int:
    return len(self.parent)


def _identity_quat_block(jt: JointType) -> list:
  if jt == JointType.FREE:
    return [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
  return [0.0]


def build_model(
    name: str,
    bodies: Sequence[dict],
    dtype: Any = jnp.float32,
) -> RobotModel:
  """Assemble a RobotModel from per-body spec dicts.

  Each body dict:
    parent: int (-1 for world)
    joint: JointType
    axis: (3,) joint axis in child frame (revolute/prismatic)
    pos: (3,) joint origin in parent frame
    rot: (3,3) rotation parent->child at q=0 (default identity)
    mass: float
    com: (3,) center of mass in body frame
    inertia: (3,3) rotational inertia about COM (body axes)
    name: str (optional)
    actuated: bool (default True for non-FREE)
    torque_limit: float (default 1e9)
  """
  from raisimlib_tpu.ops import spatial

  nb = len(bodies)
  parent, jtypes, names = [], [], []
  q_adr, v_adr = [], []
  nq = nv = 0
  X_rot = np.zeros((nb, 3, 3))
  X_pos = np.zeros((nb, 3))
  axis = np.zeros((nb, 3))
  inertia6 = np.zeros((nb, 6, 6))
  mass = np.zeros((nb,))
  actuated_list, tl_list, q_init = [], [], []
  lo_list, hi_list = [], []

  for i, b in enumerate(bodies):
    p = int(b["parent"])
    assert p < i, "bodies must be in topological order"
    jt = JointType(b["joint"])
    if jt == JointType.FREE:
      assert p == -1, "FREE joints are root-only (floating base / single bodies)"
    parent.append(p)
    jtypes.append(int(jt))
    names.append(b.get("name", f"body{i}"))
    q_adr.append(nq)
    v_adr.append(nv)
    nq += _NQ[jt]
    ndof = _NV[jt]
    nv += ndof
    X_rot[i] = np.asarray(b.get("rot", np.eye(3)))
    X_pos[i] = np.asarray(b.get("pos", np.zeros(3)))
    a = np.asarray(b.get("axis", [0.0, 0.0, 1.0]), dtype=np.float64)
    axis[i] = a / max(np.linalg.norm(a), 1e-12)
    m = float(b["mass"])
    mass[i] = m
    # host-side build math stays in numpy f64 (device arrays would truncate to f32
    # on TPU and spam dtype warnings)
    com = np.asarray(b.get("com", np.zeros(3)), dtype=np.float64)
    I_com = np.asarray(b.get("inertia", np.zeros((3, 3))), dtype=np.float64)
    C = np.array([[0, -com[2], com[1]], [com[2], 0, -com[0]], [-com[1], com[0], 0]])
    I_o = I_com + m * (C @ C.T)
    h = m * com
    H = np.array([[0, -h[2], h[1]], [h[2], 0, -h[0]], [-h[1], h[0], 0]])
    inertia6[i] = np.block([[I_o, H], [H.T, m * np.eye(3)]])
    act = bool(b.get("actuated", jt != JointType.FREE))
    tl = float(b.get("torque_limit", 1e9))
    actuated_list += [1.0 if act else 0.0] * ndof
    tl_list += [tl] * ndof
    if jt in (JointType.FREE, JointType.SPHERICAL):
      # multi-dof joints have no scalar position limits (quaternion coords)
      lo_list += [-1e9] * ndof
      hi_list += [1e9] * ndof
    else:
      lo_list.append(float(b.get("q_lo", -1e9)))
      hi_list.append(float(b.get("q_hi", 1e9)))
    q0 = b.get("q_init")
    if q0 is None:
      if jt == JointType.FREE:
        q0 = [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
      elif jt == JointType.SPHERICAL:
        q0 = [1.0, 0.0, 0.0, 0.0]
      else:
        q0 = [0.0]
    q_init += list(np.atleast_1d(np.asarray(q0, dtype=np.float64)))

  assert len(q_init) == nq

  return RobotModel(
      name=name,
      parent=tuple(parent),
      joint_types=tuple(jtypes),
      q_adr=tuple(q_adr),
      v_adr=tuple(v_adr),
      nq=nq,
      nv=nv,
      body_names=tuple(names),
      X_rot=jnp.asarray(X_rot, dtype=dtype),
      X_pos=jnp.asarray(X_pos, dtype=dtype),
      axis=jnp.asarray(axis, dtype=dtype),
      inertia=jnp.asarray(inertia6, dtype=dtype),
      mass=jnp.asarray(mass, dtype=dtype),
      actuated=jnp.asarray(actuated_list, dtype=dtype),
      torque_limit=jnp.asarray(tl_list, dtype=dtype),
      joint_lo=jnp.asarray(lo_list, dtype=dtype),
      joint_hi=jnp.asarray(hi_list, dtype=dtype),
      q_init=jnp.asarray(q_init, dtype=dtype),
  )
