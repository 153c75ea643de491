"""Constraint rows: joint limits, wires, pins — extra rows for the contact solver.

TPU-native equivalent of RaiSim's constraint surface (SURVEY.md C8:
`StiffLengthConstraint`, `CompliantLengthConstraint`, `PinConstraint`,
`World::addStiffWire`) plus joint-limit enforcement (SURVEY.md C2 — the reference
enforces URDF position limits inside its solver). The reference appends
dynamically-sized constraint entries to its CPU solver each step; here every
constraint is a statically-shaped pseudo-contact row masked by an `active` flag,
appended to the SAME Delassus system as the real contacts so limit/wire/pin
impulses and contact impulses are solved jointly in one Gauss-Seidel pass.

Row kinds (static per row — the Pallas kernel specializes its per-row update on
these, so a frictionless limit row costs a couple of FMAs, not a cone search):
  * "cone"      — real frictional contact (mu from the material table)
  * "lin"       — frictionless unilateral row (joint limit, stiff wire):
                  J has only a "normal" (3rd) component; exact solve is the 1-D
                  LCP  lam_n = max(0, -c_n / G_nn)
  * "bilateral" — equality row triplet (pin): exact solve is lam = -G_ii^{-1} c,
                  encoded for the pure solver by the BILATERAL_MU sentinel

Compliant wires are NOT solver rows — they are spring-damper forces folded into
the bias term h via RNEA's external-force input (exactly a force element).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.ops import dynamics

# mu >= this in the solver means "bilateral row": take the unconstrained 3x3
# solve unconditionally (physical mu never exceeds ~5)
BILATERAL_MU = 1e6


class WireSpec(NamedTuple):
  """Static spec: body index (-1 = world), local attach points, rest length."""

  body_a: int
  pos_a: Tuple[float, float, float]
  body_b: int
  pos_b: Tuple[float, float, float]
  length: float


class PinSpec(NamedTuple):
  body_a: int
  pos_a: Tuple[float, float, float]
  body_b: int
  pos_b: Tuple[float, float, float]


class CompliantWireSpec(NamedTuple):
  body_a: int
  pos_a: Tuple[float, float, float]
  body_b: int
  pos_b: Tuple[float, float, float]
  length: float
  stiffness: float
  damping: float


class ConstraintTables(NamedTuple):
  """Frozen (hashable, trace-time) constraint description on a Scene."""

  limit_vadr: Tuple[int, ...]      # dof index per limited 1-dof joint
  limit_qadr: Tuple[int, ...]
  limit_lo: Tuple[float, ...]
  limit_hi: Tuple[float, ...]
  wires: Tuple[WireSpec, ...]
  pins: Tuple[PinSpec, ...]
  compliant: Tuple[CompliantWireSpec, ...]

  @property
  def n_rows(self) -> int:
    """Number of extra pseudo-CONTACTS (each is a 3-component solver block):
    limits and wires use only their 3rd component; a pin uses all three."""
    return len(self.limit_vadr) + len(self.wires) + len(self.pins)

  @property
  def row_kinds(self) -> Tuple[str, ...]:
    return (("lin",) * (len(self.limit_vadr) + len(self.wires))
            + ("bilateral",) * len(self.pins))


EMPTY = ConstraintTables((), (), (), (), (), (), ())


def build_tables(model, joint_limits: bool, wires=(), pins=(),
                 compliant=()) -> ConstraintTables:
  """Collect limit rows from the model (finite URDF limits only) + user wires/pins."""
  vadr, qadr, lo, hi = [], [], [], []
  if joint_limits:
    jlo = np.asarray(model.joint_lo)
    jhi = np.asarray(model.joint_hi)
    for j in range(model.nv):
      if jlo[j] > -1e8 or jhi[j] < 1e8:
        # 1-dof joints only (FREE dofs are stored unlimited by build_model)
        vadr.append(j)
        qadr.append(_dof_to_q(model, j))
        lo.append(float(jlo[j]))
        hi.append(float(jhi[j]))
  return ConstraintTables(tuple(vadr), tuple(qadr), tuple(lo), tuple(hi),
                          tuple(wires), tuple(pins), tuple(compliant))


def _dof_to_q(model, j: int) -> int:
  """qpos index of 1-dof joint dof j (static lookup over the model tables)."""
  from raisimlib_tpu.models.model import JointType

  for i in range(model.nb):
    if JointType(model.joint_types[i]) in (JointType.FREE, JointType.SPHERICAL):
      continue
    if model.v_adr[i] == j:
      return model.q_adr[i]
  raise ValueError(f"dof {j} is not a 1-dof joint dof")


def _attach_world(kin, body: int, pos, dtype):
  p = jnp.asarray(pos, dtype)
  if body < 0:
    return p
  return kin.p[body] + kin.R[body] @ p


def _point_jac(model, kin, body: int, pt_w, dtype):
  if body < 0:
    return jnp.zeros((3, model.nv), dtype)
  return dynamics.point_jacobian(model, kin, body, pt_w)


def constraint_rows(model, tables: ConstraintTables, kin, q, u, dt,
                    erp: float, max_corr: float, dtype):
  """(J (k,3,nv), bias (k,3), mu (k,), active (k,)) for all constraint rows.

  Row frames are already final (caller uses identity C): rows 1,2 are unused
  zero "tangents" for lin rows, the 3 world axes for bilateral triplets; row 3
  (index 2) is the constrained direction with the Baumgarte bias, matching the
  contact convention v_n+ >= b.
  """
  nv = model.nv
  Js, biases, mus, acts = [], [], [], []
  zrow = jnp.zeros((nv,), dtype)

  # --- joint limits: one row per limited dof, runtime sign picks lo vs hi ---
  for vj, qj, lo, hi in zip(tables.limit_vadr, tables.limit_qadr,
                            tables.limit_lo, tables.limit_hi):
    qv = q[qj]
    uv = u[vj]
    q_pred = qv + uv * dt                  # one-step lookahead: engage pre-impact
    near_hi = q_pred > hi
    near_lo = q_pred < lo
    s = jnp.where(near_hi, -1.0, 1.0).astype(dtype)
    viol = jnp.maximum(lo - q_pred, q_pred - hi)
    b = jnp.clip(erp * jnp.maximum(viol, 0.0) / dt, 0.0, max_corr)
    Jn = zrow.at[vj].set(1.0) * s
    Js.append(jnp.stack([zrow, zrow, Jn]))
    biases.append(jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype), b]))
    mus.append(jnp.zeros((), dtype))
    acts.append((near_lo | near_hi).astype(dtype))

  # --- stiff wires: unilateral tension row along the wire direction ---
  for w in tables.wires:
    pA = _attach_world(kin, w.body_a, w.pos_a, dtype)
    pB = _attach_world(kin, w.body_b, w.pos_b, dtype)
    d = pA - pB
    l = jnp.sqrt(jnp.sum(d * d) + 1e-18)
    n = -d / l                             # impulse on A pulls toward B (tension)
    Jrel = (_point_jac(model, kin, w.body_a, pA, dtype)
            - _point_jac(model, kin, w.body_b, pB, dtype))
    Jn = n @ Jrel
    stretch = l - w.length
    # engage when taut now or by end of step (dl/dt = -Jn u)
    taut = (stretch - (Jn @ u) * dt) > 0.0
    b = jnp.clip(erp * jnp.maximum(stretch, 0.0) / dt, 0.0, max_corr)
    Js.append(jnp.stack([zrow, zrow, Jn]))
    biases.append(jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype), b]))
    mus.append(jnp.zeros((), dtype))
    acts.append(taut.astype(dtype))

  # --- pins: bilateral triplet closing the anchor gap ---
  for p in tables.pins:
    pA = _attach_world(kin, p.body_a, p.pos_a, dtype)
    pB = _attach_world(kin, p.body_b, p.pos_b, dtype)
    Jrel = (_point_jac(model, kin, p.body_a, pA, dtype)
            - _point_jac(model, kin, p.body_b, pB, dtype))
    err = pA - pB
    b = jnp.clip(-erp * err / dt, -max_corr, max_corr)   # v_rel+ = b closes the gap
    Js.append(Jrel)
    biases.append(b)
    mus.append(jnp.asarray(BILATERAL_MU * 10.0, dtype))
    acts.append(jnp.ones((), dtype))

  J = jnp.stack(Js)
  bias = jnp.stack(biases)
  mu = jnp.stack(mus)
  active = jnp.stack(acts)
  return J, bias, mu, active


def compliant_forces(model, tables: ConstraintTables, kin, u, dtype):
  """(nb, 6) world-frame spatial forces (at world origin) from compliant wires.

  F = -k * max(l - L, 0) * d_hat - c * dl/dt (cable: tension only), applied equal
  and opposite at the attach points — a pure force element, never a solver row.
  """
  f = jnp.zeros((model.nb, 6), dtype)
  for w in tables.compliant:
    pA = _attach_world(kin, w.body_a, w.pos_a, dtype)
    pB = _attach_world(kin, w.body_b, w.pos_b, dtype)
    d = pA - pB
    l = jnp.sqrt(jnp.sum(d * d) + 1e-18)
    dn = d / l
    vA = dynamics.point_velocity(kin, w.body_a, pA) if w.body_a >= 0 else jnp.zeros(3, dtype)
    vB = dynamics.point_velocity(kin, w.body_b, pB) if w.body_b >= 0 else jnp.zeros(3, dtype)
    ldot = dn @ (vA - vB)
    stretch = l - w.length
    tension = jnp.maximum(w.stiffness * stretch + w.damping * ldot, 0.0)
    tension = tension * (stretch > 0.0)    # cables cannot push
    FA = -tension * dn                     # force on A, world frame
    if w.body_a >= 0:
      f = f.at[w.body_a].add(jnp.concatenate([jnp.cross(pA, FA), FA]))
    if w.body_b >= 0:
      f = f.at[w.body_b].add(jnp.concatenate([jnp.cross(pB, -FA), -FA]))
  return f
