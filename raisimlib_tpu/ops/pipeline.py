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
  """(nc, 3, nv) world-frame relative-velocity Jacobians: v_rel = J u = v(A) - v(B).

  Vectorized over contacts in ONE masked einsum-style expression: the per-dof
  world columns are lin_j + ang_j x p for every (contact, dof) pair, weighted
  by the STATIC ancestor-mask difference mask_A - mask_B. The previous
  per-contact python loop emitted ~6 ops per contact; on the remote TPU every
  op in the sequential assembly chain costs fixed dispatch latency (round-3
  profile: the assembly phase is ~flat in batch size), so op count is the
  budget here."""
  nc = len(contacts.body_a)
  amask = dynamics.ancestor_dof_mask(model)          # (nb, nv) static numpy
  import numpy as _np

  mdiff = _np.zeros((nc, model.nv))
  for k in range(nc):
    if contacts.body_a[k] >= 0:
      mdiff[k] += amask[contacts.body_a[k]]
    if contacts.body_b[k] >= 0:
      mdiff[k] -= amask[contacts.body_b[k]]
  mdiff = jnp.asarray(mdiff, dtype=contacts.pos.dtype)

  ang = kin.S_w[:, :3]                               # (nv, 3)
  lin = kin.S_w[:, 3:]                               # (nv, 3)
  # cols[k, j] = lin_j + ang_j x p_k  -> (nc, nv, 3)
  cols = lin[None, :, :] + jnp.cross(
      jnp.broadcast_to(ang[None, :, :], (nc, model.nv, 3)),
      jnp.broadcast_to(contacts.pos[:, None, :], (nc, model.nv, 3)))
  return jnp.transpose(cols * mdiff[:, :, None], (0, 2, 1))


def _tangent_frames(normals: jnp.ndarray) -> jnp.ndarray:
  """(nc, 3) unit normals -> (nc, 3, 3) frames with rows (t1, t2, n),
  vectorized branch-free axis pick (the batched form of _tangent_basis)."""
  n = normals
  dtype = n.dtype
  ax = jnp.abs(n)
  ex = jnp.array([1.0, 0.0, 0.0], dtype)
  ey = jnp.array([0.0, 1.0, 0.0], dtype)
  ez = jnp.array([0.0, 0.0, 1.0], dtype)
  pick_x = ((ax[:, 0] <= ax[:, 1]) & (ax[:, 0] <= ax[:, 2]))[:, None]
  pick_y = (~pick_x[:, 0] & (ax[:, 1] <= ax[:, 2]))[:, None]
  a = jnp.where(pick_x, ex[None], jnp.where(pick_y, ey[None], ez[None]))
  t1 = jnp.cross(n, a)
  t1 = t1 / jnp.sqrt(jnp.sum(t1 * t1, axis=1, keepdims=True) + 1e-18)
  t2 = jnp.cross(n, t1)
  return jnp.stack([t1, t2, n], axis=1)


def _joint_pos_index(model):
  """Static (nv,) map dof -> qpos index for 1-dof joints (0 + mask 0 for FREE dofs)."""
  import numpy as np
  from raisimlib_tpu.models.model import JointType

  idx = np.zeros(model.nv, dtype=np.int32)
  mask = np.zeros(model.nv)
  for i in range(model.nb):
    # only scalar-coordinate joints take PD position targets; FREE/SPHERICAL
    # use quaternion coordinates (orientation servoing is a controller concern)
    if JointType(model.joint_types[i]) in (JointType.REVOLUTE,
                                           JointType.PRISMATIC):
      idx[model.v_adr[i]] = model.q_adr[i]
      mask[model.v_adr[i]] = 1.0
  return idx, mask


def _assemble_rows(
    scene,
    state: State,
    tau: jnp.ndarray,
    pd_target: jnp.ndarray | None = None,
    config: StepConfig = StepConfig(),
    f_ext_w: jnp.ndarray | None = None,
):
  """Collision -> solver-row assembly, shared by the pure and megakernel paths.

  Returns (Jr, bias, mu, active, M, rhs0, u):
    Jr   (n_rows, 3, nv) row Jacobians ALREADY rotated into contact frames
    bias (n_rows, 3) desired post-velocity bias (restitution + Baumgarte)
    M    (nv, nv) mass matrix incl. the implicit-PD dt*diag(kd) term
    rhs0 (nv,)   tau - h - D u  (so v_free = u + dt M^-1 rhs0)
  """
  model = scene.model
  dt = scene.dt
  q, u = state.q, state.u
  dtype = q.dtype

  # --- actuation: feedforward torque + optional stable PD (SURVEY.md C10) ---
  tau = tau * model.actuated
  D = jnp.zeros((model.nv,), dtype=dtype)
  if pd_target is not None:
    jidx, jmask = _joint_pos_index(model)
    jm = jnp.asarray(jmask, dtype=dtype)
    joint_q = q[jnp.asarray(jidx)] * jm
    # kp acts only on scalar-coordinate dofs (jmask): FREE/SPHERICAL dofs
    # have no position coordinate a PD target could servo — previously an
    # actuated multi-dof joint got a spurious kp*(target - 0) term here
    # while the fused kernel correctly skipped it (advisor r4 #4)
    tau = tau + scene.kp * (pd_target - joint_q) * model.actuated * jm
    D = scene.kd * model.actuated
  tau = jnp.clip(tau, -model.torque_limit, model.torque_limit)

  kin = dynamics.fk(model, q, u)
  contacts = coll.collide(scene.geoms, scene.pairs, kin, getattr(scene, "field", None))
  nc = contacts.depth.shape[0]
  tabs = getattr(scene, "constraints", None) or cs.EMPTY

  M = dynamics.crba_w(model, q, kin) + dt * jnp.diag(D)
  f_ext = (cs.compliant_forces(model, tabs, kin, u, dtype)
           if tabs.compliant else None)
  if f_ext_w is not None:                 # user wrenches (setExternalForce)
    f_ext = f_ext_w if f_ext is None else f_ext + f_ext_w
  # bias via the RNEA recursion: the einsum alternative (nonlinearities_w,
  # == rnea to round-off) measured ~1 ms/step SLOWER at B=2048 on the v5e —
  # its static-index gathers outweigh the saved op dispatches (in-process A/B)
  h = dynamics.nonlinearities(model, q, u, scene.gravity, f_ext)

  if nc > 0:
    Jc = contact_jacobians(model, kin, contacts)          # (nc, 3, nv)
    C = _tangent_frames(contacts.normal)                   # (nc, 3, 3) rows t1,t2,n

    mats = scene.materials  # (n_mat, n_mat, 3): mu, restitution, threshold
    import numpy as _np

    pair_props = mats[_np.asarray(contacts.mat_a), _np.asarray(contacts.mat_b)]
    mu, e, thresh = pair_props[:, 0], pair_props[:, 1], pair_props[:, 2]

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
    Jr = jnp.einsum("ipq,iqv->ipv", C, Jc)                 # rows -> (t1, t2, n)
  else:
    Jr = jnp.zeros((0, 3, model.nv), dtype)
    bias = jnp.zeros((0, 3), dtype)
    mu = jnp.zeros((0,), dtype)
    active = jnp.zeros((0,), dtype)

  # --- constraint rows: joint limits / wires / pins (identity frame) ---
  if tabs.n_rows:
    kin2 = kin
    Jx, bx, mux, actx = cs.constraint_rows(
        model, tabs, kin2, q, u, dt, config.erp, config.max_correction_vel, dtype)
    Jr = jnp.concatenate([Jr, Jx], axis=0)
    bias = jnp.concatenate([bias, bx], axis=0)
    mu = jnp.concatenate([mu, mux], axis=0)
    active = jnp.concatenate([active, actx], axis=0)

  rhs0 = tau - h - D * u
  return Jr, bias, mu, active, M, rhs0, u


def _pre_solve(
    scene,
    state: State,
    tau: jnp.ndarray,
    pd_target: jnp.ndarray | None = None,
    config: StepConfig = StepConfig(),
    f_ext_w: jnp.ndarray | None = None,
):
  """Everything up to the contact solve: returns solver inputs + apply context.

  Single-world pure path (scene.step / derivatives / observability): assembles
  the rows, then materializes the Delassus G via one fused 1+3nc-column
  cho_solve. The batched throughput path (step_batch) skips G entirely — see
  the matrix-free megakernel in ops/pallas_contact.py."""
  model = scene.model
  dt = scene.dt
  Jr, bias, mu, active, M, rhs0, u = _assemble_rows(
      scene, state, tau, pd_target, config, f_ext_w)
  nc = Jr.shape[0]
  L = linalg.chol(M)

  Jf = Jr.reshape(nc * 3, model.nv)
  # One fused pair of triangular sweeps for both solves:
  #   col 0: (M + dt D) v_free = M u + dt (tau - h)
  #           == v_free = u + dt Minv(tau - h - D u);  cols 1..: Minv J^T
  rhs = jnp.concatenate([rhs0[:, None], Jf.T], axis=1)
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
    f_ext_w: jnp.ndarray | None = None,
) -> State:
  solver_in, ctx = _pre_solve(scene, state, tau, pd_target, config, f_ext_w)
  G, c0, mu, active = solver_in
  lam_loc = ct.solve_contacts(G, c0, mu, active, config=config.solver)
  return _post_solve(scene, state, ctx, lam_loc)


def step_batch(
    scene,
    state: State,
    tau: jnp.ndarray,
    pd_target: jnp.ndarray | None = None,
    config: StepConfig = StepConfig(),
    field_heights: jnp.ndarray | None = None,
    use_kernel: bool = True,
) -> State:
  """Batched physics step: state/tau/pd_target carry a leading batch axis.

  Identical math to `vmap(step)`, but the contact dynamics solve runs as ONE
  fused matrix-free Pallas kernel with the batch on the TPU lane axis
  (ops/pallas_contact.solve_dynamics_batch): the Delassus matrix is never
  materialized — the kernel consumes J and J M^-1 and returns the post-impulse
  velocity directly. This is the throughput path for rollout benchmarks, MPPI
  sampling, and RL-style batched stepping; round-3 profiling showed the old
  G-assembly (73-column triangular solve + (3nc)^2 matmul + 5-D layout
  transposes) dominating the step.

  `use_kernel=False` swaps the Pallas megakernel for its pure-jnp oracle
  (`pallas_contact._mf_pure`) — identical math, no custom VJP, so the whole
  batched step supports `jax.jvp`/`jacfwd` (iLQR's per-timestep dynamics
  Jacobians are evaluated through this path; the kernel's custom VJP only
  provides reverse mode)."""
  from raisimlib_tpu.ops import pallas_contact

  model = scene.model
  dt = scene.dt

  def pre_one(s, t, p, h):
    # per-world heightfield (batched terrain scenarios, SURVEY.md C5/C17):
    # heights are Scene pytree leaves, so a replace under vmap batches terrains
    # without recompilation or a second code path
    sc = (scene if h is None
          else scene.replace(field=scene.field.replace(heights=h)))
    Jr, bias, mu, active, M, rhs0, u = _assemble_rows(sc, s, t, p, config)
    L = linalg.chol(M)
    invL = linalg.solve_lower(L, jnp.eye(model.nv, dtype=u.dtype))
    # apply M^-1 as (invL^T)(invL .): two MXU matmuls, no explicit inverse
    Wt = (Jr.reshape(-1, model.nv) @ invL.T) @ invL        # rows of J M^-1
    vf = u + dt * (invL.T @ (invL @ rhs0))
    return Jr, Wt.reshape(Jr.shape), vf, bias, mu, active

  pre = jax.vmap(pre_one,
                 in_axes=(0, 0, 0 if pd_target is not None else None,
                          0 if field_heights is not None else None))
  Jr, Wt, vf, bias, mu, active = pre(state, tau, pd_target, field_heights)

  kinds = scene_row_kinds(scene)
  # Per-section count check (advisor round-2): the contacts-then-constraints row
  # order is a cross-function contract between _assemble_rows and
  # scene_row_kinds; validate section-by-section against the assembled rows so a
  # reordering fails here instead of silently mislabeling rows in the kernel.
  tabs = getattr(scene, "constraints", None) or cs.EMPTY
  n_con = Jr.shape[1] - tabs.n_rows
  assert n_con >= 0 and kinds == ("cone",) * n_con + tabs.row_kinds, (
      f"solver row sections out of sync: {Jr.shape[1]} assembled rows "
      f"({n_con} contacts + {tabs.n_rows} constraints) vs kinds {kinds}")
  solver_cfg = config.solver.replace(row_kinds=kinds)

  solve = (pallas_contact.solve_dynamics_batch if use_kernel
           else pallas_contact._mf_pure)
  u_new, _lam = solve(Jr, Wt, vf, bias, mu, active, solver_cfg)
  q_new = jax.vmap(lambda q, un: dynamics.integrate_q(model, q, un, dt))(
      state.q, u_new)
  return State(q=q_new, u=u_new, t=state.t + dt)


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
