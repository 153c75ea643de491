"""Articulated-body dynamics kernels: FK, RNEA, CRBA, ABA, Jacobians.

TPU-native equivalent of RaiSim's closed-source dynamics core (SURVEY.md C3:
`getMassMatrix`, `getNonlinearities`, ABA inside `World::integrate`). The reference
implements Featherstone's recursions in C++/Eigen over a pointer tree; here the tree is
*static* (tuples in RobotModel), so every recursion unrolls at trace time into a fixed
dataflow graph of small (3,3)/(6,6) ops. `vmap` over worlds turns each small op into a
batched op whose batch axis maps onto TPU vector lanes — this is where the throughput
comes from, not from parallelizing within one robot.

All functions take a single world's (q, u) and are pure; no global state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from raisimlib_tpu.models.model import JointType, RobotModel
from raisimlib_tpu.ops import spatial as sp


@struct.dataclass
class KinData:
  """Forward-kinematics products consumed by collision, Jacobians, and the solver."""

  R: jnp.ndarray      # (nb,3,3) body->world rotations
  p: jnp.ndarray      # (nb,3)   body origins in world
  S_w: jnp.ndarray    # (nv,6)   world-frame motion subspace per dof, [ang, lin@world origin]
  vel6: jnp.ndarray   # (nb,6)   body spatial velocity, world frame, referenced at world origin
  Xup_E: jnp.ndarray  # (nb,3,3) parent->body transform rotation part
  Xup_r: jnp.ndarray  # (nb,3)   parent->body transform translation part (in parent coords)


# ---------------------------------------------------------------------------
# Per-joint kinematics
# ---------------------------------------------------------------------------


def _joint_X_and_S(model: RobotModel, i: int, q):
  """Joint transform X_J (joint frame -> body frame) and motion subspace S (body coords).

  Returns ((E, r), S, vJ_fn) where S has shape (ndof, 6) and vJ = u_i @ S.
  """
  jt = JointType(model.joint_types[i])
  qa = model.q_adr[i]
  dtype = q.dtype
  if jt == JointType.FREE:
    # Root-only floating joint with u = [omega_body(3), v_world(3)].  World-frame
    # linear velocity makes ballistic translation discrete-exact under gravity
    # (matching RaiSim's world-frame base velocity); body-frame angular velocity
    # keeps principal-axis spin exact.  S(q) = blkdiag(I3, R) with bias
    # cJ = [0, -w_b x v_b] (handled in _joint_cj).
    quat = q[qa + 3 : qa + 7]
    pos = q[qa : qa + 3]
    R = sp.quat_to_mat(quat)          # body->jointframe(world) rotation
    E = R.T
    r = pos
    Z3 = jnp.zeros((3, 3), dtype=dtype)
    I3 = jnp.eye(3, dtype=dtype)
    S = jnp.concatenate(
        [jnp.concatenate([I3, Z3], axis=1), jnp.concatenate([Z3, R], axis=1)], axis=0
    )
  elif jt == JointType.REVOLUTE:
    ang = q[qa]
    a = model.axis[i]
    R = sp.quat_to_mat(sp.quat_from_axis_angle(a, ang))  # body->jointframe
    E = R.T
    r = jnp.zeros(3, dtype=dtype)
    S = jnp.concatenate([a, jnp.zeros(3, dtype=dtype)])[None, :]
  elif jt == JointType.PRISMATIC:
    d = q[qa]
    a = model.axis[i]
    E = jnp.eye(3, dtype=dtype)
    r = a * d
    S = jnp.concatenate([jnp.zeros(3, dtype=dtype), a])[None, :]
  elif jt == JointType.SPHERICAL:
    # ball joint (SURVEY.md C2): q = quat wxyz (child -> joint frame),
    # u = omega in CHILD body coords — constant S = [I3 | 0] in body frame,
    # so cJ = 0 (same structure as the FREE joint's angular block)
    quat = q[qa : qa + 4]
    R = sp.quat_to_mat(quat)
    E = R.T
    r = jnp.zeros(3, dtype=dtype)
    Z3 = jnp.zeros((3, 3), dtype=dtype)
    S = jnp.concatenate([jnp.eye(3, dtype=dtype), Z3], axis=1)
  else:
    raise NotImplementedError(jt)
  return (E, r), S


def _xup(model: RobotModel, i: int, q):
  """X_up[i]: parent-body coords -> body-i coords."""
  X_J, S = _joint_X_and_S(model, i, q)
  X_tree = (model.X_rot[i].T.astype(q.dtype), model.X_pos[i].astype(q.dtype))
  return sp.xform_compose(X_J, X_tree), S


def _vj(model: RobotModel, i: int, S, u):
  va = model.v_adr[i]
  nd = S.shape[0]
  ui = u[va : va + nd]
  return ui @ S, ui


def _joint_cj(model: RobotModel, i: int, vJ):
  """Velocity-product bias cJ = S-dot @ u.  Zero for constant-S joints; for the FREE
  joint's world-frame linear dofs, cJ = [0, -w_b x v_b]."""
  if JointType(model.joint_types[i]) == JointType.FREE:
    return jnp.concatenate(
        [jnp.zeros(3, dtype=vJ.dtype), -jnp.cross(vJ[:3], vJ[3:])]
    )
  return jnp.zeros(6, dtype=vJ.dtype)


# ---------------------------------------------------------------------------
# Forward kinematics
# ---------------------------------------------------------------------------


def fk(model: RobotModel, q: jnp.ndarray, u: jnp.ndarray | None = None) -> KinData:
  """Forward kinematics: world poses, world-frame dof subspaces, body twists.

  Uses the per-body sequential recursion (fk_reference). A level-parallel
  variant exists (`fk_levels`) that batches bodies of equal tree depth into
  grouped contractions — measured SLOWER on the v5e chip (3.0 -> 3.7 ms/step
  on the B=2048 ANYmal step): its static-index gathers/permutations lower to
  expensive data movement that outweighs the saved op dispatches. Kept (with a
  round-off parity test) as the starting point for a future in-kernel FK.
  """
  return fk_reference(model, q, u)


def fk_levels(model: RobotModel, q: jnp.ndarray,
              u: jnp.ndarray | None = None) -> KinData:
  """Level-parallel FK (see fk's docstring for the measured tradeoff)."""
  return _fk_levels(model, q, u)


def _fk_schedule(model: RobotModel):
  """Static schedule: [level0, level1, ...], each level a list of
  (joint_type, [body indices]) groups; plus body -> accumulation position."""
  from raisimlib_tpu.models.model import JointType

  nb = model.nb
  depth = [0] * nb
  for i in range(nb):
    p = model.parent[i]
    depth[i] = 0 if p < 0 else depth[p] + 1
  levels = []
  acc_pos = [0] * nb
  pos = 0
  for d in range(max(depth) + 1 if nb else 0):
    members = [i for i in range(nb) if depth[i] == d]
    groups = {}
    for i in members:
      groups.setdefault(JointType(model.joint_types[i]), []).append(i)
    level = []
    for jt, idxs in sorted(groups.items()):
      level.append((jt, idxs))
      for i in idxs:
        acc_pos[i] = pos
        pos += 1
    levels.append(level)
  return levels, acc_pos


def _axis_angle_mats(axes, angs):
  """Batched Rodrigues: (m,3) unit axes + (m,) angles -> (m,3,3) rotations."""
  K = sp.skew(axes)
  s = jnp.sin(angs)[:, None, None]
  c = jnp.cos(angs)[:, None, None]
  I = jnp.eye(3, dtype=axes.dtype)[None]
  return I + s * K + (1.0 - c) * (K @ K)


def _fk_levels(model: RobotModel, q: jnp.ndarray, u: jnp.ndarray | None) -> KinData:
  from raisimlib_tpu.models.model import JointType, joint_nv

  nb = model.nb
  dtype = q.dtype
  if u is None:
    u = jnp.zeros((model.nv,), dtype=dtype)
  levels, acc_pos = _fk_schedule(model)

  E_acc = None        # (n_done, 3, 3) world->body rotations, accumulation order
  r_acc = None        # (n_done, 3)    body origins in world
  upE_chunks, upr_chunks = [], []
  S_chunks, S_dofs = [], []    # body-frame subspace rows + their dof indices

  for level in levels:
    lev_E, lev_r = [], []
    for jt, idxs in level:
      m = len(idxs)
      ii = jnp.asarray(np.array(idxs))
      Xr = model.X_rot[ii].astype(dtype)              # (m,3,3) parent->child at q=0
      Xp = model.X_pos[ii].astype(dtype)
      qa = np.array([model.q_adr[i] for i in idxs])
      Z = jnp.zeros((m, 3), dtype)
      I3 = jnp.eye(3, dtype=dtype)

      if jt == JointType.REVOLUTE:
        axes = model.axis[ii].astype(dtype)
        angs = q[jnp.asarray(qa)]
        R = _axis_angle_mats(axes, angs)              # body->joint frame
        EJ = jnp.swapaxes(R, -1, -2)
        rJ = Z
        S_chunks.append(jnp.concatenate([axes, Z], axis=1)[:, None, :])
      elif jt == JointType.PRISMATIC:
        axes = model.axis[ii].astype(dtype)
        d = q[jnp.asarray(qa)]
        EJ = jnp.broadcast_to(I3[None], (m, 3, 3))
        rJ = axes * d[:, None]
        S_chunks.append(jnp.concatenate([Z, axes], axis=1)[:, None, :])
      elif jt == JointType.SPHERICAL:
        quats = q[jnp.asarray(qa[:, None] + np.arange(4)[None, :])]
        R = sp.quat_to_mat(quats)
        EJ = jnp.swapaxes(R, -1, -2)
        rJ = Z
        S_chunks.append(jnp.concatenate(
            [jnp.broadcast_to(I3[None], (m, 3, 3)),
             jnp.zeros((m, 3, 3), dtype)], axis=2))
      elif jt == JointType.FREE:
        quats = q[jnp.asarray(qa[:, None] + 3 + np.arange(4)[None, :])]
        R = sp.quat_to_mat(quats)                     # body->world
        EJ = jnp.swapaxes(R, -1, -2)
        rJ = q[jnp.asarray(qa[:, None] + np.arange(3)[None, :])]
        # S = [[I3, 0], [0, R]]: u = [omega_body, v_world]
        Srows = jnp.zeros((m, 6, 6), dtype)
        Srows = Srows.at[:, :3, :3].set(I3[None])
        Srows = Srows.at[:, 3:, 3:].set(R)
        S_chunks.append(Srows)
      else:
        raise NotImplementedError(jt)
      for i in idxs:
        va = model.v_adr[i]
        S_dofs += list(range(va, va + joint_nv(jt)))

      # Xup = compose(X_J, X_tree): E = EJ @ Xr^T;  r = Xp + Xr @ rJ
      upE = jnp.einsum("mij,mkj->mik", EJ, Xr)
      upr = Xp + jnp.einsum("mij,mj->mi", Xr, rJ)
      upE_chunks.append(upE)
      upr_chunks.append(upr)

      parents = np.array([model.parent[i] for i in idxs])
      if (parents < 0).all():
        E0, r0 = upE, upr
      else:
        pp = jnp.asarray(np.array([acc_pos[p] for p in parents]))
        Ep = E_acc[pp]
        rp = r_acc[pp]
        # compose(Xup, X0_parent): E = upE @ Ep;  r = rp + Ep^T @ upr
        E0 = jnp.einsum("mij,mjk->mik", upE, Ep)
        r0 = rp + jnp.einsum("mji,mj->mi", Ep, upr)
      lev_E.append(E0)
      lev_r.append(r0)
    newE = jnp.concatenate(lev_E, axis=0)
    newr = jnp.concatenate(lev_r, axis=0)
    E_acc = newE if E_acc is None else jnp.concatenate([E_acc, newE], axis=0)
    r_acc = newr if r_acc is None else jnp.concatenate([r_acc, newr], axis=0)

  # restore body order with one static permutation
  perm = np.zeros(nb, dtype=np.int32)
  for i in range(nb):
    perm[i] = acc_pos[i]
  pi = jnp.asarray(perm)
  E0 = E_acc[pi]                                      # (nb,3,3) world->body
  r0 = r_acc[pi]
  upE = jnp.concatenate(upE_chunks, axis=0)[pi]
  upr = jnp.concatenate(upr_chunks, axis=0)[pi]

  # world-frame subspace rows for ALL dofs in one batched transform
  S_body = jnp.concatenate([c.reshape(-1, 6) for c in S_chunks], axis=0)
  dperm = np.zeros(model.nv, dtype=np.int32)
  dperm[np.array(S_dofs)] = np.arange(model.nv)
  S_body = S_body[jnp.asarray(dperm)]
  dof_body = jnp.asarray(_dof_body_map(model))
  Ed = E0[dof_body]                                   # (nv,3,3)
  rd = r0[dof_body]
  w_w = jnp.einsum("ja,jab->jb", S_body[:, :3], Ed)
  v_w = jnp.einsum("ja,jab->jb", S_body[:, 3:], Ed) + jnp.cross(rd, w_w)
  S_w = jnp.concatenate([w_w, v_w], axis=1)

  mask = jnp.asarray(ancestor_dof_mask(model), dtype=dtype)
  vel6 = jnp.einsum("bj,jk->bk", mask, S_w * u[:, None])

  return KinData(R=jnp.swapaxes(E0, -1, -2), p=r0, S_w=S_w, vel6=vel6,
                 Xup_E=upE, Xup_r=upr)


def fk_reference(model: RobotModel, q: jnp.ndarray,
                 u: jnp.ndarray | None = None) -> KinData:
  """Per-body sequential FK — the readable reference implementation the
  level-parallel `fk` is tested against."""
  nb = model.nb
  dtype = q.dtype
  if u is None:
    u = jnp.zeros((model.nv,), dtype=dtype)

  X0 = [None] * nb         # world -> body transforms
  v = [None] * nb          # body twists in body coords
  Xup_E, Xup_r, R_list, p_list = [], [], [], []
  Sw_rows = [None] * model.nv
  vel6_w = []

  for i in range(nb):
    p_idx = model.parent[i]
    Xup, S = _xup(model, i, q)
    Xup_E.append(Xup[0])
    Xup_r.append(Xup[1])
    vJ, _ = _vj(model, i, S, u)
    if p_idx < 0:
      X0[i] = Xup
      v[i] = vJ
    else:
      X0[i] = sp.xform_compose(Xup, X0[p_idx])
      v[i] = sp.xform_motion(Xup, v[p_idx]) + vJ
    E, r = X0[i]
    R_list.append(E.T)      # body->world
    p_list.append(r)        # body origin in world
    # world-frame subspace rows for this body's dofs
    va = model.v_adr[i]
    S_w = sp.xform_motion_inv(X0[i], S)  # (ndof, 6) in world coords @ world origin
    for k in range(S.shape[0]):
      Sw_rows[va + k] = S_w[k]
    vel6_w.append(sp.xform_motion_inv(X0[i], v[i]))

  return KinData(
      R=jnp.stack(R_list),
      p=jnp.stack(p_list),
      S_w=jnp.stack(Sw_rows),
      vel6=jnp.stack(vel6_w),
      Xup_E=jnp.stack(Xup_E),
      Xup_r=jnp.stack(Xup_r),
  )


def point_velocity(kin: KinData, body: int, pt_w: jnp.ndarray) -> jnp.ndarray:
  """World-frame linear velocity of a world point rigidly attached to `body`."""
  w = kin.vel6[body, :3]
  v0 = kin.vel6[body, 3:]
  return v0 + jnp.cross(w, pt_w)


def ancestor_dof_mask(model: RobotModel) -> np.ndarray:
  """(nb, nv) static 0/1 mask: dof j moves body b iff j's body is an ancestor-or-self."""
  nb, nv = model.nb, model.nv
  from raisimlib_tpu.models.model import joint_nv

  mask = np.zeros((nb, nv), dtype=np.float64)
  for b in range(nb):
    k = b
    while k >= 0:
      va = model.v_adr[k]
      nd = joint_nv(model.joint_types[k])
      mask[b, va : va + nd] = 1.0
      k = model.parent[k]
  return mask


def point_jacobian(model: RobotModel, kin: KinData, body: int, pt_w: jnp.ndarray):
  """(3, nv) world-frame point Jacobian: v_pt = J @ u. `body` is a static index."""
  mask = jnp.asarray(ancestor_dof_mask(model)[body], dtype=pt_w.dtype)  # (nv,)
  ang = kin.S_w[:, :3]                       # (nv,3)
  lin = kin.S_w[:, 3:]                       # (nv,3)
  cols = lin + jnp.cross(ang, pt_w[None, :])  # (nv,3)
  return (cols * mask[:, None]).T


def frame_jacobian(model: RobotModel, kin: KinData, body: int, pt_w: jnp.ndarray):
  """(6, nv) world-frame spatial Jacobian [ang; lin] at the given world point."""
  mask = jnp.asarray(ancestor_dof_mask(model)[body], dtype=pt_w.dtype)
  ang = kin.S_w[:, :3]
  lin = kin.S_w[:, 3:] + jnp.cross(kin.S_w[:, :3], pt_w[None, :])
  return jnp.concatenate([(ang * mask[:, None]).T, (lin * mask[:, None]).T], axis=0)


# ---------------------------------------------------------------------------
# RNEA — inverse dynamics: tau = M(q) qdd + C(q,u) u + g(q) - J^T f_ext
# ---------------------------------------------------------------------------


def rnea(
    model: RobotModel,
    q: jnp.ndarray,
    u: jnp.ndarray,
    qdd: jnp.ndarray,
    gravity: jnp.ndarray,
    f_ext_w: jnp.ndarray | None = None,
) -> jnp.ndarray:
  """Recursive Newton-Euler. `f_ext_w`: optional (nb,6) spatial forces, world frame at
  world origin, applied to each body."""
  nb = model.nb
  dtype = q.dtype
  a_base = jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity.astype(dtype)])

  X0 = [None] * nb
  Xup = [None] * nb
  Ss = [None] * nb
  v = [None] * nb
  a = [None] * nb
  f = [None] * nb

  for i in range(nb):
    p_idx = model.parent[i]
    Xup[i], S = _xup(model, i, q)
    Ss[i] = S
    vJ, ui = _vj(model, i, S, u)
    va = model.v_adr[i]
    nd = S.shape[0]
    qddi = qdd[va : va + nd]
    aJ = qddi @ S + _joint_cj(model, i, vJ)
    if p_idx < 0:
      X0[i] = Xup[i]
      v[i] = vJ
      a[i] = sp.xform_motion(Xup[i], a_base) + aJ + sp.cross_motion(v[i], vJ)
    else:
      X0[i] = sp.xform_compose(Xup[i], X0[p_idx])
      v[i] = sp.xform_motion(Xup[i], v[p_idx]) + vJ
      a[i] = sp.xform_motion(Xup[i], a[p_idx]) + aJ + sp.cross_motion(v[i], vJ)
    I6 = model.inertia[i].astype(dtype)
    f[i] = I6 @ a[i] + sp.cross_force(v[i], I6 @ v[i])
    if f_ext_w is not None:
      f[i] = f[i] - sp.xform_force(X0[i], f_ext_w[i])

  tau = jnp.zeros((model.nv,), dtype=dtype)
  for i in range(nb - 1, -1, -1):
    va = model.v_adr[i]
    nd = Ss[i].shape[0]
    tau = tau.at[va : va + nd].set(Ss[i] @ f[i])
    p_idx = model.parent[i]
    if p_idx >= 0:
      f[p_idx] = f[p_idx] + sp.xform_force_inv(Xup[i], f[i])
  return tau


def nonlinearities(model, q, u, gravity, f_ext_w=None):
  """h(q,u) = C u + g - f_ext term (RaiSim's `getNonlinearities`)."""
  return rnea(model, q, u, jnp.zeros((model.nv,), dtype=q.dtype), gravity, f_ext_w)


def _dof_body_map(model: RobotModel) -> np.ndarray:
  """(nv,) static map: dof index -> owning body index."""
  from raisimlib_tpu.models.model import joint_nv

  m = np.zeros(model.nv, dtype=np.int32)
  for i in range(model.nb):
    nd = joint_nv(model.joint_types[i])
    m[model.v_adr[i] : model.v_adr[i] + nd] = i
  return m


def _sdot_mask(model: RobotModel) -> np.ndarray:
  """(nv,) static: 1 where Sdot_w = v_body x_m S_w holds, 0 where S_w is
  CONSTANT in world coords (only the FREE joint's world-linear dofs)."""
  from raisimlib_tpu.models.model import JointType, joint_nv

  m = np.ones(model.nv)
  for i in range(model.nb):
    if JointType(model.joint_types[i]) == JointType.FREE:
      m[model.v_adr[i] + 3 : model.v_adr[i] + 6] = 0.0
  return m


def nonlinearities_w(model, q, u, gravity, kin: KinData | None = None,
                     f_ext_w=None):
  """h(q,u) as batched world-frame einsums — the bias-force analog of crba_w.

  RNEA's two per-body recursions become four stacked contractions, using the
  world-@-origin identities (all quantities share one frame, so the Xform
  compositions vanish):

      Sdot_w[j] = v_w[body(j)] x_m S_w[j]        (0 for FREE linear dofs,
                                                  whose S_w is constant)
      a_w[b]    = [0; -g] + sum_{j in anc(b)} Sdot_w[j] u_j     (qdd = 0)
      f_w[b]    = I_w[b] a_w[b] + v_w[b] x* (I_w[b] v_w[b]) - f_ext_w[b]
      h[j]      = S_w[j] . sum_{b : j in anc(b)} f_w[b]

  Exactly equal to `nonlinearities` (tested to f64 round-off in
  tests/test_dynamics.py). NOT used on the hot path: measured ~1 ms/step
  slower than the recursion at B=2048 on the v5e (its dof->body gathers lower
  to expensive data movement — same finding as fk_levels). Kept as the
  oracle-tested starting point for a future in-kernel formulation.
  Pass `kin` to reuse FK products."""
  if kin is None:
    kin = fk(model, q, u)
  dtype = q.dtype
  mask = jnp.asarray(ancestor_dof_mask(model), dtype=dtype)   # (nb, nv)
  dof_body = jnp.asarray(_dof_body_map(model))
  sdm = jnp.asarray(_sdot_mask(model), dtype=dtype)

  vb = kin.vel6[dof_body]                                     # (nv, 6)
  Sd = sp.cross_motion(vb, kin.S_w) * sdm[:, None]            # (nv, 6)
  a0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity.astype(dtype)])
  a = a0[None, :] + jnp.einsum("bj,jk->bk", mask, Sd * u[:, None])  # (nb, 6)

  Iw = inertia_world(model, kin)                              # (nb, 6, 6)
  Iv = jnp.einsum("bij,bj->bi", Iw, kin.vel6)
  f = jnp.einsum("bij,bj->bi", Iw, a) + sp.cross_force(kin.vel6, Iv)
  if f_ext_w is not None:
    f = f - f_ext_w
  fsum = jnp.einsum("bj,bk->jk", mask, f)                     # (nv, 6)
  return jnp.sum(kin.S_w * fsum, axis=1)


# ---------------------------------------------------------------------------
# CRBA — joint-space mass matrix
# ---------------------------------------------------------------------------


def crba(model: RobotModel, q: jnp.ndarray) -> jnp.ndarray:
  """Composite-rigid-body algorithm: symmetric PD mass matrix M (nv, nv)."""
  nb = model.nb
  dtype = q.dtype
  Xup = [None] * nb
  Ss = [None] * nb
  for i in range(nb):
    Xup[i], Ss[i] = _xup(model, i, q)

  Ic = [model.inertia[i].astype(dtype) for i in range(nb)]
  M = jnp.zeros((model.nv, model.nv), dtype=dtype)

  for i in range(nb - 1, -1, -1):
    p_idx = model.parent[i]
    if p_idx >= 0:
      Xm = sp.xform_motion_mat(Xup[i])
      Ic[p_idx] = Ic[p_idx] + Xm.T @ Ic[i] @ Xm
    S = Ss[i]                       # (nd, 6)
    F = Ic[i] @ S.T                 # (6, nd)
    va, nd = model.v_adr[i], S.shape[0]
    M = M.at[va : va + nd, va : va + nd].set(S @ F)
    j = i
    while model.parent[j] >= 0:
      F = sp.xform_motion_mat(Xup[j]).T @ F
      j = model.parent[j]
      Sj = Ss[j]
      vb, ndb = model.v_adr[j], Sj.shape[0]
      blk = (Sj @ F).T              # (nd, ndb)
      M = M.at[va : va + nd, vb : vb + ndb].set(blk)
      M = M.at[vb : vb + ndb, va : va + nd].set(blk.T)
  return M


def inertia_world(model: RobotModel, kin: KinData) -> jnp.ndarray:
  """(nb, 6, 6) body spatial inertias in world coords at the world origin.

  I_w = X^T I_b X with X the world->body motion transform (E = R^T, r = p), so
  KE = 1/2 v_w^T I_w v_w for the world-frame twist referenced at the origin.
  Batched over bodies (xform_motion_mat/skew broadcast) — one congruence
  einsum instead of a per-body op chain."""
  dtype = kin.p.dtype
  Xm = sp.xform_motion_mat((jnp.swapaxes(kin.R, -1, -2), kin.p))  # (nb, 6, 6)
  I = model.inertia.astype(dtype)
  return jnp.einsum("bji,bjk,bkl->bil", Xm, I, Xm)


def crba_w(model: RobotModel, q: jnp.ndarray, kin: KinData | None = None):
  """Mass matrix by masked world-frame congruence — the einsum form of CRBA.

  Identity: M = sum_b J_b^T I_w[b] J_b, where J_b (6, nv) is body b's world-frame
  spatial Jacobian, i.e. column j = ancestor_mask[b, j] * S_w[j]. Exactly equal to
  `crba` (same M), but expressed as two einsums over (nb, nv, 6) stacks instead of
  the reference-style Featherstone backward recursion with per-block scatters.
  On TPU under vmap the scatters serialize into dynamic-update-slice chains, while
  this form becomes a handful of batched matmuls on the MXU; round-2 profiling of
  the ANYmal step (B=1024, v5e) put the scatter CRBA + XLA Cholesky at ~80% of the
  3.3 ms step. Reuses FK products — pass `kin` to share with collision/Jacobians.
  """
  if kin is None:
    kin = fk(model, q)
  dtype = q.dtype
  mask = jnp.asarray(ancestor_dof_mask(model), dtype=dtype)   # (nb, nv)
  Iw = inertia_world(model, kin)                              # (nb, 6, 6)
  Jb = mask[:, :, None] * kin.S_w[None, :, :]                 # (nb, nv, 6)
  A = jnp.einsum("bvp,bpq->bvq", Jb, Iw)
  return jnp.einsum("bvq,bwq->vw", A, Jb)


# ---------------------------------------------------------------------------
# ABA — forward dynamics: qdd = ABA(q, u, tau, f_ext)
# ---------------------------------------------------------------------------


def aba(
    model: RobotModel,
    q: jnp.ndarray,
    u: jnp.ndarray,
    tau: jnp.ndarray,
    gravity: jnp.ndarray,
    f_ext_w: jnp.ndarray | None = None,
) -> jnp.ndarray:
  """Articulated-body algorithm, O(nb) with unrolled static recursions."""
  nb = model.nb
  dtype = q.dtype

  X0 = [None] * nb
  Xup = [None] * nb
  Ss = [None] * nb
  v = [None] * nb
  c = [None] * nb
  IA = [None] * nb
  pA = [None] * nb

  for i in range(nb):
    p_idx = model.parent[i]
    Xup[i], S = _xup(model, i, q)
    Ss[i] = S
    vJ, _ = _vj(model, i, S, u)
    if p_idx < 0:
      X0[i] = Xup[i]
      v[i] = vJ
    else:
      X0[i] = sp.xform_compose(Xup[i], X0[p_idx])
      v[i] = sp.xform_motion(Xup[i], v[p_idx]) + vJ
    c[i] = sp.cross_motion(v[i], vJ) + _joint_cj(model, i, vJ)
    I6 = model.inertia[i].astype(dtype)
    IA[i] = I6
    pA[i] = sp.cross_force(v[i], I6 @ v[i])
    if f_ext_w is not None:
      pA[i] = pA[i] - sp.xform_force(X0[i], f_ext_w[i])

  U = [None] * nb
  Dinv = [None] * nb
  uu = [None] * nb

  for i in range(nb - 1, -1, -1):
    S = Ss[i]                                    # (nd,6)
    va, nd = model.v_adr[i], S.shape[0]
    taui = tau[va : va + nd]
    U[i] = IA[i] @ S.T                            # (6,nd)
    D = S @ U[i]                                  # (nd,nd)
    if nd == 1:
      Dinv[i] = 1.0 / D
    else:
      Dinv[i] = jnp.linalg.inv(D)
    uu[i] = taui - S @ pA[i]
    p_idx = model.parent[i]
    if p_idx >= 0:
      Ia = IA[i] - U[i] @ Dinv[i] @ U[i].T
      pa = pA[i] + Ia @ c[i] + U[i] @ (Dinv[i] @ uu[i])
      Xm = sp.xform_motion_mat(Xup[i])
      IA[p_idx] = IA[p_idx] + Xm.T @ Ia @ Xm
      pA[p_idx] = pA[p_idx] + sp.xform_force_inv(Xup[i], pa)

  a_base = jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity.astype(dtype)])
  a = [None] * nb
  qdd = jnp.zeros((model.nv,), dtype=dtype)
  for i in range(nb):
    p_idx = model.parent[i]
    a_p = a_base if p_idx < 0 else a[p_idx]
    ai = sp.xform_motion(Xup[i], a_p) + c[i]
    S = Ss[i]
    va, nd = model.v_adr[i], S.shape[0]
    qddi = Dinv[i] @ (uu[i] - U[i].T @ ai)
    a[i] = ai + qddi @ S
    qdd = qdd.at[va : va + nd].set(qddi)
  return qdd


# ---------------------------------------------------------------------------
# Position integration (per-joint manifold update)
# ---------------------------------------------------------------------------


def integrate_q(model: RobotModel, q: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
  """Semi-implicit position update: q' = q ⊕ u dt (quaternion exp-map for FREE)."""
  out = q
  for i in range(model.nb):
    jt = JointType(model.joint_types[i])
    qa, va = model.q_adr[i], model.v_adr[i]
    if jt == JointType.FREE:
      pos = q[qa : qa + 3]
      quat = q[qa + 3 : qa + 7]
      w_b = u[va : va + 3]
      v_w = u[va + 3 : va + 6]
      R = sp.quat_to_mat(quat)
      pos_new = pos + v_w * dt
      quat_new = sp.quat_integrate(quat, R @ w_b, dt)
      out = out.at[qa : qa + 3].set(pos_new)
      out = out.at[qa + 3 : qa + 7].set(quat_new)
    elif jt == JointType.SPHERICAL:
      quat = q[qa : qa + 4]
      w_b = u[va : va + 3]                  # child-body angular velocity
      R = sp.quat_to_mat(quat)
      out = out.at[qa : qa + 4].set(sp.quat_integrate(quat, R @ w_b, dt))
    else:
      out = out.at[qa].set(q[qa] + u[va] * dt)
  return out


# ---------------------------------------------------------------------------
# Energy (for conservation tests)
# ---------------------------------------------------------------------------


def energy(model: RobotModel, q: jnp.ndarray, u: jnp.ndarray, gravity: jnp.ndarray):
  """(kinetic, potential) total energies."""
  kin = fk(model, q, u)
  ke = 0.0
  pe = 0.0
  # recompute body twists in body coords for KE via world-frame twist transform
  for i in range(model.nb):
    # world-frame twist referenced at world origin -> body-frame at body origin
    E = kin.R[i].T
    r = kin.p[i]
    vb = sp.xform_motion((E, r), kin.vel6[i])
    I6 = model.inertia[i].astype(q.dtype)
    ke = ke + 0.5 * jnp.dot(vb, I6 @ vb)
    # COM position in world
    m = model.mass[i]
    h = model.inertia[i][ :3, 3:]  # skew(m*com)
    com_b = jnp.array([h[2, 1], h[0, 2], h[1, 0]], dtype=q.dtype) / jnp.maximum(m, 1e-12)
    com_w = kin.p[i] + kin.R[i] @ com_b
    pe = pe - m * jnp.dot(gravity.astype(q.dtype), com_w)
  return ke, pe
