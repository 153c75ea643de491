"""Full physics step: collision -> contact impulse solve -> integrate.

This is the TPU-native `World::integrate()` (SURVEY.md §3.1 call stack):

    kin      = fk(q, u)
    contacts = collide(geoms, pairs, kin)          # padded, masked
    v_free   = u + dt M^-1 (tau - h)               # semi-implicit free velocity
    G, c     = Delassus + free contact velocity in per-contact frames
    lam      = per-contact bisection/cone Gauss-Seidel solve
    u'       = v_free + M^-1 J^T lam
    q'       = q (+) u' dt

One pure function over static shapes; `vmap` batches worlds; `lax.scan` rolls the
horizon. Restitution and Baumgarte stabilization enter as a normal-velocity bias,
as the reference does (material pair table, SURVEY.md C11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from raisimlib_tpu.ops import collision as coll
from raisimlib_tpu.ops import constraints as cs
from raisimlib_tpu.ops import contact as ct
from raisimlib_tpu.ops import dynamics
from raisimlib_tpu.ops import linalg
from raisimlib_tpu.ops.integrator import State


@struct.dataclass
class StepConfig:
  erp: float = 0.2               # Baumgarte position-error velocity gain (per step)
  slop: float = 1e-4             # penetration tolerance before correction kicks in
  max_correction_vel: float = 1.0
  solver: ct.SolverConfig = ct.SolverConfig()


def _tangent_basis(n):
  """Orthonormal (t1, t2) for unit normal n, branchless axis pick."""
  # pick the world axis least aligned with n
  ax = jnp.abs(n)
  a = jnp.where(
      (ax[0] <= ax[1]) & (ax[0] <= ax[2]),
      jnp.array([1.0, 0.0, 0.0], n.dtype),
      jnp.where(
          ax[1] <= ax[2],
          jnp.array([0.0, 1.0, 0.0], n.dtype),
          jnp.array([0.0, 0.0, 1.0], n.dtype),
      ),
  )
  t1 = jnp.cross(n, a)
  t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1) + 1e-18)
  t2 = jnp.cross(n, t1)
  return t1, t2


def contact_jacobians(model, kin, contacts: coll.ContactSet):
  """(nc, 3, nv) world-frame relative-velocity Jacobians: v_rel = J u = v(A) - v(B)."""
  rows = []
  for k in range(len(contacts.body_a)):
    ba, bb = contacts.body_a[k], contacts.body_b[k]
    pt = contacts.pos[k]
    Ja = (
        dynamics.point_jacobian(model, kin, ba, pt)
        if ba >= 0
        else jnp.zeros((3, model.nv), dtype=pt.dtype)
    )
    Jb = (
        dynamics.point_jacobian(model, kin, bb, pt)
        if bb >= 0
        else jnp.zeros((3, model.nv), dtype=pt.dtype)
    )
    rows.append(Ja - Jb)
  return jnp.stack(rows)


def _joint_pos_index(model):
  """Static (nv,) map dof -> qpos index for 1-dof joints (0 + mask 0 for FREE dofs)."""
  import numpy as np
  from raisimlib_tpu.models.model import JointType

  idx = np.zeros(model.nv, dtype=np.int32)
  mask = np.zeros(model.nv)
  for i in range(model.nb):
    if JointType(model.joint_types[i]) != JointType.FREE:
      idx[model.v_adr[i]] = model.q_adr[i]
      mask[model.v_adr[i]] = 1.0
  return idx, mask


def _pre_solve(
    scene,
    state: State,
    tau: jnp.ndarray,
    pd_target: jnp.ndarray | None = None,
    config: StepConfig = StepConfig(),
):
  """Everything up to the contact solve: returns solver inputs + apply context."""
  model = scene.model
  dt = scene.dt
  q, u = state.q, state.u
  dtype = q.dtype

  # --- actuation: feedforward torque + optional stable PD (SURVEY.md C10) ---
  # PD is integrated implicitly: the -kd v' term moves into the LHS mass matrix
  # (M + dt*diag(kd)), which keeps large gains stable at physics dt, as the
  # reference's PD servo does.
  tau = tau * model.actuated
  D = jnp.zeros((model.nv,), dtype=dtype)
  if pd_target is not None:
    jidx, jmask = _joint_pos_index(model)
    joint_q = q[jnp.asarray(jidx)] * jnp.asarray(jmask, dtype=dtype)
    tau = tau + scene.kp * (pd_target - joint_q) * model.actuated
    D = scene.kd * model.actuated
  tau = jnp.clip(tau, -model.torque_limit, model.torque_limit)

  kin = dynamics.fk(model, q, u)
  contacts = coll.collide(scene.geoms, scene.pairs, kin, getattr(scene, "field", None))
  nc = contacts.depth.shape[0]
  tabs = getattr(scene, "constraints", None) or cs.EMPTY

  # --- smooth dynamics quantities ---
  # crba_w (einsum CRBA, reusing FK products) + trace-time-unrolled Cholesky:
  # the scatter CRBA + XLA batched Cholesky were ~80% of the step (ops/linalg.py).
  M = dynamics.crba_w(model, q, kin) + dt * jnp.diag(D)
  f_ext = (cs.compliant_forces(model, tabs, kin, u, dtype)
           if tabs.compliant else None)
  h = dynamics.nonlinearities(model, q, u, scene.gravity, f_ext)
  L = linalg.chol(M)

  # --- contact frames + Jacobians (nc can be 0: constraints-only scenes) ---
  if nc > 0:
    Jc = contact_jacobians(model, kin, contacts)          # (nc, 3, nv)
    t1t2 = [_tangent_basis(contacts.normal[k]) for k in range(nc)]
    C = jnp.stack(
        [jnp.stack([t1, t2, contacts.normal[k]]) for k, (t1, t2) in enumerate(t1t2)]
    )                                                      # (nc, 3, 3) rows t1,t2,n

    # --- contact bias: restitution + Baumgarte (reference: materials C11) ---
    mats = scene.materials  # (n_mat, n_mat, 3): mu, restitution, threshold
    mu = jnp.stack([mats[contacts.mat_a[k], contacts.mat_b[k], 0] for k in range(nc)])
    e = jnp.stack([mats[contacts.mat_a[k], contacts.mat_b[k], 1] for k in range(nc)])
    thresh = jnp.stack(
        [mats[contacts.mat_a[k], contacts.mat_b[k], 2] for k in range(nc)])

    v_pre_c = jnp.einsum("ipq,iqv,v->ip", C, Jc, u)        # pre-impact, contact frames
    vn_pre = v_pre_c[:, 2]
    b_rest = jnp.where(vn_pre < -thresh, -e * vn_pre, 0.0)
    b_baum = jnp.minimum(
        config.erp * jnp.maximum(contacts.depth - config.slop, 0.0) / dt,
        config.max_correction_vel,
    )
    b = jnp.maximum(b_rest, b_baum)                        # desired v_n+ >= b
    bias = b[:, None] * jnp.array([0.0, 0.0, 1.0], dtype)[None, :]
    active = contacts.active.astype(dtype)
  else:
    Jc = jnp.zeros((0, 3, model.nv), dtype)
    C = jnp.zeros((0, 3, 3), dtype)
    bias = jnp.zeros((0, 3), dtype)
    mu = jnp.zeros((0,), dtype)
    active = jnp.zeros((0,), dtype)

  # --- constraint rows: joint limits / wires / pins (ops/constraints.py) ---
  if tabs.n_rows:
    Jx, bx, mux, actx = cs.constraint_rows(
        model, tabs, kin, q, u, dt, config.erp, config.max_correction_vel, dtype)
    Jc = jnp.concatenate([Jc, Jx], axis=0)
    C = jnp.concatenate(
        [C, jnp.broadcast_to(jnp.eye(3, dtype=dtype), (tabs.n_rows, 3, 3))], axis=0)
    bias = jnp.concatenate([bias, bx], axis=0)
    mu = jnp.concatenate([mu, mux], axis=0)
    active = jnp.concatenate([active, actx], axis=0)
    nc = nc + tabs.n_rows

  # Rotate each row triplet's Jacobian into its contact frame FIRST (a small
  # (nc,3,3)x(nc,3,nv) contraction), so the Delassus product below lands
  # directly in contact frames. The naive order — build world-frame G, then
  # conjugate by C on both sides — moves the full (nc,3,nc,3) Delassus through
  # HBM twice more per step; at B=2048 those two einsums plus the post-solve
  # impulse rotation were ~10% of the measured step time (round-3 profile).
  Jr = jnp.einsum("ipq,iqv->ipv", C, Jc)                   # rows now (t1,t2,n)
  Jf = Jr.reshape(nc * 3, model.nv)
  # One fused pair of triangular sweeps for both solves:
  #   col 0: (M + dt D) v_free = M u + dt (tau - h)
  #           == v_free = u + dt Minv(tau - h - D u);  cols 1..: Minv J^T
  rhs = jnp.concatenate([(tau - h - D * u)[:, None], Jf.T], axis=1)
  sol = linalg.cho_solve(L, rhs)                           # (nv, 1 + nc*3)
  v_free = u + dt * sol[:, 0]
  MinvJT = sol[:, 1:]                                      # (nv, nc*3), rotated basis
  G = (Jf @ MinvJT).reshape(nc, 3, nc, 3)                  # contact frames directly

  c0 = jnp.einsum("ipv,v->ip", Jr, v_free) - bias

  return (G, c0, mu, active), (MinvJT, v_free)


def scene_row_kinds(scene) -> tuple:
  """Static ("cone" | "lin" | "bilateral") kind per solver row — contacts first,
  then constraint rows in ops/constraints.py order. Trace-time only; the Pallas
  kernel specializes its per-row update on these."""
  # collide() emits one inert slot when the scene has no candidate pairs
  nc = max(coll.num_contact_slots(scene.geoms, scene.pairs), 1)
  tabs = getattr(scene, "constraints", None) or cs.EMPTY
  return ("cone",) * nc + tabs.row_kinds


def _post_solve(scene, state: State, ctx, lam_loc) -> State:
  """Apply contact impulses and integrate positions.

  MinvJT is in the rotated (contact-frame) basis — see _pre_solve — so the
  contact-frame impulses apply directly, no world-frame rotation needed."""
  MinvJT, v_free = ctx
  du = MinvJT @ lam_loc.reshape(-1)
  u_new = v_free + du
  q_new = dynamics.integrate_q(scene.model, state.q, u_new, scene.dt)
  return State(q=q_new, u=u_new, t=state.t + scene.dt)


def step(
    scene,
    state: State,
    tau: jnp.ndarray,
    pd_target: jnp.ndarray | None = None,
    config: StepConfig = StepConfig(),
) -> State:
  solver_in, ctx = _pre_solve(scene, state, tau, pd_target, config)
  G, c0, mu, active = solver_in
  lam_loc = ct.solve_contacts(G, c0, mu, active, config=config.solver)
  return _post_solve(scene, state, ctx, lam_loc)


def step_batch(
    scene,
    state: State,
    tau: jnp.ndarray,
    pd_target: jnp.ndarray | None = None,
    config: StepConfig = StepConfig(),
) -> State:
  """Batched physics step: state/tau/pd_target carry a leading batch axis.

  Identical math to `vmap(step)`, but the contact solve runs as ONE fused Pallas
  kernel with the batch on the TPU lane axis (ops/pallas_contact.py) instead of a
  per-world chain of tiny padded ops — this is the throughput path for rollout
  benchmarks, MPPI sampling, and RL-style batched stepping."""
  from raisimlib_tpu.ops import pallas_contact

  pre = jax.vmap(
      lambda s, t, p: _pre_solve(scene, s, t, p, config),
      in_axes=(0, 0, 0 if pd_target is not None else None),
  )
  solver_in, ctx = pre(state, tau, pd_target)
  G, c0, mu, active = solver_in
  kinds = scene_row_kinds(scene)
  # Per-section count check (advisor round-2): the contacts-then-constraints row
  # order is a cross-function contract between _pre_solve's assembly and
  # scene_row_kinds; validate section-by-section against the assembled rows so a
  # reordering fails here instead of silently mislabeling rows in the kernel.
  tabs = getattr(scene, "constraints", None) or cs.EMPTY
  n_con = c0.shape[1] - tabs.n_rows
  assert n_con >= 0 and kinds == ("cone",) * n_con + tabs.row_kinds, (
      f"solver row sections out of sync: {c0.shape[1]} assembled rows "
      f"({n_con} contacts + {tabs.n_rows} constraints) vs kinds {kinds}")
  solver_cfg = config.solver.replace(row_kinds=kinds)
  lam = pallas_contact.solve_contacts_batch(G, c0, mu, active, solver_cfg)
  return jax.vmap(lambda s, c, l: _post_solve(scene, s, c, l))(state, ctx, lam)


def step_with_report(scene, state, tau, pd_target=None,
                     config: StepConfig = StepConfig()):
  """Like step() but also returns the ContactSet and the solved impulses — both in
  contact frames (t1, t2, n) and world frame — RaiSim's `getContacts()` /
  `getImpulse()` observability surface. Slightly slower; use in tests/viz."""
  model = scene.model
  solver_in, ctx = _pre_solve(scene, state, tau, pd_target, config)
  G, c0, mu, active = solver_in
  lam_loc = ct.solve_contacts(G, c0, mu, active, config=config.solver)
  new_state = _post_solve(scene, state, ctx, lam_loc)
  # reconstruct the contact frames (the hot path keeps everything in the
  # rotated basis and no longer carries C — _pre_solve's rotation refactor);
  # constraint rows use the identity frame, so only contact rows need rotating
  kin = dynamics.fk(model, state.q, state.u)
  contacts = coll.collide(scene.geoms, scene.pairs, kin, getattr(scene, "field", None))
  ncc = contacts.depth.shape[0]
  t1t2 = [_tangent_basis(contacts.normal[k]) for k in range(ncc)]
  C = jnp.stack(
      [jnp.stack([t1, t2, contacts.normal[k]]) for k, (t1, t2) in enumerate(t1t2)])
  lam_world = lam_loc.at[:ncc].set(
      jnp.einsum("iqp,iq->ip", C, lam_loc[:ncc]))
  return new_state, contacts, lam_loc, lam_world
