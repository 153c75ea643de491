"""Collision detection — branchless analytic narrow phase over a static pair list.

TPU-native redesign of RaiSim's broad/narrow phase (SURVEY.md C6). The reference builds
dynamic contact lists from AABB pruning + per-pair `dCollide`-style dispatch; here the
candidate pair list is *fixed at trace time* (scene topology is static), every pair
kernel always executes, and validity is a mask. Each pair type contributes a fixed
number of contact slots, so the contact set has a static shape — the solver then runs
fixed-trip-count masked iterations (SURVEY.md §7 "hard parts" #1).

Contact convention: normal `n` points from geom B towards geom A; relative velocity is
v(A) - v(B) at the contact point; positive normal velocity = separating; impulse +λ is
applied to A, -λ to B. depth > 0 means penetration.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from raisimlib_tpu.models.model import RobotModel

GEOM_SPHERE = 0
GEOM_BOX = 1
GEOM_CAPSULE = 2
GEOM_PLANE = 3
GEOM_HEIGHTMAP = 4
GEOM_CYLINDER = 5

# slots contributed per pair type (keyed by sorted gtype pair)
_PAIR_SLOTS = {
    (GEOM_SPHERE, GEOM_SPHERE): 1,
    (GEOM_SPHERE, GEOM_BOX): 1,
    (GEOM_SPHERE, GEOM_CAPSULE): 1,
    (GEOM_SPHERE, GEOM_PLANE): 1,
    (GEOM_BOX, GEOM_BOX): 9,
    (GEOM_BOX, GEOM_PLANE): 8,
    (GEOM_CAPSULE, GEOM_PLANE): 2,
    (GEOM_CAPSULE, GEOM_CAPSULE): 1,
    (GEOM_BOX, GEOM_CAPSULE): 1,
    (GEOM_SPHERE, GEOM_HEIGHTMAP): 1,
    (GEOM_CAPSULE, GEOM_HEIGHTMAP): 2,
    (GEOM_BOX, GEOM_HEIGHTMAP): 8,
}


@struct.dataclass
class GeomTable:
  """Numeric geom parameters (leaves) + static type/body metadata."""

  gtype: tuple = struct.field(pytree_node=False)   # len ng
  body: tuple = struct.field(pytree_node=False)    # len ng, -1 = static world
  material: tuple = struct.field(pytree_node=False)
  params: jnp.ndarray        # (ng, 4)
  offset_pos: jnp.ndarray    # (ng, 3)
  offset_rot: jnp.ndarray    # (ng, 3, 3)


def build_geom_table(specs: Sequence, dtype=jnp.float32) -> GeomTable:
  ng = len(specs)
  params = np.zeros((ng, 4))
  opos = np.zeros((ng, 3))
  orot = np.zeros((ng, 3, 3))
  for i, g in enumerate(specs):
    params[i] = g.params
    opos[i] = g.offset_pos
    orot[i] = g.offset_rot
  return GeomTable(
      gtype=tuple(int(g.gtype) for g in specs),
      body=tuple(int(g.body) for g in specs),
      material=tuple(int(g.material) for g in specs),
      params=jnp.asarray(params, dtype=dtype),
      offset_pos=jnp.asarray(opos, dtype=dtype),
      offset_rot=jnp.asarray(orot, dtype=dtype),
  )


def candidate_pairs(specs: Sequence, model: RobotModel,
                    self_collision: bool = False) -> tuple:
  """Static candidate pair list (ia, ib): every supported geom pair except same-body
  and parent-child body pairs (adjacent links overlap by construction).

  Geoms belonging to the same object (same `obj` id >= 0) are skipped unless
  `self_collision` — matching the reference, where an ArticulatedSystem's
  self-collisions are opt-in. Fewer pairs = fewer contact slots = a shorter
  Gauss-Seidel chain, which is the hot serial path on TPU."""
  pairs = []
  ng = len(specs)
  for i in range(ng):
    for j in range(i + 1, ng):
      bi, bj = specs[i].body, specs[j].body
      if bi == bj:
        continue
      oi = getattr(specs[i], "obj", -1)
      oj = getattr(specs[j], "obj", -1)
      if oi >= 0 and oi == oj and not self_collision:
        continue
      if bi >= 0 and bj >= 0:
        if model.parent[bi] == bj or model.parent[bj] == bi:
          continue
      if bi < 0 and bj < 0:
        continue  # two static geoms never produce dynamics
      ti, tj = int(specs[i].gtype), int(specs[j].gtype)
      key = tuple(sorted((ti, tj)))
      if key not in _PAIR_SLOTS:
        continue  # unsupported pair type (cylinder/mesh narrow phase)
      # order pair so the lower gtype comes first (kernels assume canonical order)
      if ti <= tj:
        pairs.append((i, j))
      else:
        pairs.append((j, i))
  return tuple(pairs)


def num_contact_slots(geoms: GeomTable, pairs: tuple) -> int:
  n = 0
  for ia, ib in pairs:
    n += _PAIR_SLOTS[tuple(sorted((geoms.gtype[ia], geoms.gtype[ib])))]
  return n


@struct.dataclass
class ContactSet:
  """Padded, statically-shaped contact manifold for one world."""

  pos: jnp.ndarray      # (nc, 3) contact point, world
  normal: jnp.ndarray   # (nc, 3) unit normal, world (B -> A)
  depth: jnp.ndarray    # (nc,)  penetration depth (>0 touching)
  active: jnp.ndarray   # (nc,)  1.0 / 0.0
  body_a: tuple = struct.field(pytree_node=False)  # static body indices (len nc)
  body_b: tuple = struct.field(pytree_node=False)
  mat_a: tuple = struct.field(pytree_node=False)
  mat_b: tuple = struct.field(pytree_node=False)


# ---------------------------------------------------------------------------
# Geom world pose helpers
# ---------------------------------------------------------------------------


def _geom_pose(geoms: GeomTable, gi: int, kin):
  b = geoms.body[gi]
  op, oR = geoms.offset_pos[gi], geoms.offset_rot[gi]
  if b < 0:
    return oR, op
  R = kin.R[b] @ oR
  p = kin.p[b] + kin.R[b] @ op
  return R, p


# ---------------------------------------------------------------------------
# Pair kernels — each returns lists (pos, normal, depth, valid) with a FIXED number
# of entries. All math is branchless; `valid` is a float mask.
# ---------------------------------------------------------------------------


def _sphere_plane(geoms, ia, ib, kin):
  r = geoms.params[ia, 0]
  h = geoms.params[ib, 0]
  _, c = _geom_pose(geoms, ia, kin)
  n = jnp.array([0.0, 0.0, 1.0], dtype=c.dtype)
  depth = (h + r) - c[2]
  pos = c - r * n
  return [(pos, n, depth, depth > 0)]


def _sphere_sphere(geoms, ia, ib, kin):
  ra, rb = geoms.params[ia, 0], geoms.params[ib, 0]
  _, ca = _geom_pose(geoms, ia, kin)
  _, cb = _geom_pose(geoms, ib, kin)
  d = ca - cb
  dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
  n = d / dist
  depth = (ra + rb) - dist
  pos = cb + n * (rb - 0.5 * depth)
  return [(pos, n, depth, depth > 0)]


def _sphere_box(geoms, ia, ib, kin):
  """Sphere (A) vs box (B). Handles shallow (closest-point) case branchlessly; a
  sphere center deep inside the box resolves along the minimum-penetration face."""
  r = geoms.params[ia, 0]
  he = geoms.params[ib, :3]
  _, c = _geom_pose(geoms, ia, kin)
  Rb, pb = _geom_pose(geoms, ib, kin)
  cl = Rb.T @ (c - pb)                       # sphere center in box frame
  clamped = jnp.clip(cl, -he, he)
  delta = cl - clamped
  dist = jnp.sqrt(jnp.sum(delta * delta) + 1e-18)
  outside = dist > 1e-9
  n_out = delta / dist
  # inside: push along the face with least penetration
  face_pen = he - jnp.abs(cl)                # >= 0 when inside
  k = jnp.argmin(face_pen)
  n_in = jnp.sign(cl) * jax.nn.one_hot(k, 3, dtype=cl.dtype)
  n_local = jnp.where(outside, n_out, n_in)
  depth = jnp.where(outside, r - dist, r + face_pen[k])
  surf_local = jnp.where(outside, clamped, cl + n_in * face_pen[k])
  n = Rb @ n_local
  pos = pb + Rb @ surf_local
  return [(pos, n, depth, depth > 0)]


def _box_plane(geoms, ia, ib, kin):
  """Box (A) vs plane (B): all 8 corners, each its own slot (mask selects)."""
  he = geoms.params[ia, :3]
  h = geoms.params[ib, 0]
  Ra, pa = _geom_pose(geoms, ia, kin)
  n = jnp.array([0.0, 0.0, 1.0], dtype=pa.dtype)
  out = []
  for sx in (-1.0, 1.0):
    for sy in (-1.0, 1.0):
      for sz in (-1.0, 1.0):
        corner = pa + Ra @ (he * jnp.array([sx, sy, sz], dtype=pa.dtype))
        depth = h - corner[2]
        out.append((corner, n, depth, depth > 0))
  return out


def _capsule_plane(geoms, ia, ib, kin):
  r, hl = geoms.params[ia, 0], geoms.params[ia, 1]
  h = geoms.params[ib, 0]
  Ra, pa = _geom_pose(geoms, ia, kin)
  axis = Ra[:, 2]
  n = jnp.array([0.0, 0.0, 1.0], dtype=pa.dtype)
  out = []
  for s in (-1.0, 1.0):
    end = pa + axis * (s * hl)
    depth = (h + r) - end[2]
    pos = end - r * n
    out.append((pos, n, depth, depth > 0))
  return out


def _closest_segment_segment(p1, d1, hl1, p2, d2, hl2):
  """Closest points between segments p±hl*d (branchless clamped solve)."""
  r = p1 - p2
  a = 1.0  # d1.d1 (unit)
  e = 1.0
  b = jnp.dot(d1, d2)
  c = jnp.dot(d1, r)
  f = jnp.dot(d2, r)
  denom = a * e - b * b
  s = jnp.where(jnp.abs(denom) > 1e-9, (b * f - c * e) / (denom + 1e-18), 0.0)
  s = jnp.clip(s, -hl1, hl1)
  t = (b * s + f) / e
  t = jnp.clip(t, -hl2, hl2)
  s = jnp.clip((b * t - c) / a, -hl1, hl1)
  return p1 + d1 * s, p2 + d2 * t


def _capsule_capsule(geoms, ia, ib, kin):
  ra, hla = geoms.params[ia, 0], geoms.params[ia, 1]
  rb, hlb = geoms.params[ib, 0], geoms.params[ib, 1]
  Ra, pa = _geom_pose(geoms, ia, kin)
  Rb, pb = _geom_pose(geoms, ib, kin)
  qa, qb = _closest_segment_segment(pa, Ra[:, 2], hla, pb, Rb[:, 2], hlb)
  d = qa - qb
  dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
  n = d / dist
  depth = (ra + rb) - dist
  pos = qb + n * (rb - 0.5 * depth)
  return [(pos, n, depth, depth > 0)]


def _sphere_capsule(geoms, ia, ib, kin):
  ra = geoms.params[ia, 0]
  rb, hlb = geoms.params[ib, 0], geoms.params[ib, 1]
  _, ca = _geom_pose(geoms, ia, kin)
  Rb, pb = _geom_pose(geoms, ib, kin)
  t = jnp.clip(jnp.dot(ca - pb, Rb[:, 2]), -hlb, hlb)
  qb = pb + Rb[:, 2] * t
  d = ca - qb
  dist = jnp.sqrt(jnp.sum(d * d) + 1e-18)
  n = d / dist
  depth = (ra + rb) - dist
  pos = qb + n * (rb - 0.5 * depth)
  return [(pos, n, depth, depth > 0)]


def _box_capsule(geoms, ia, ib, kin):
  """Box (A) vs capsule (B): sample the capsule segment at both ends + midpoint,
  take deepest vs box via the sphere-box kernel logic. One slot (approximate
  manifold; sufficient for feet/limbs; SURVEY.md C6 notes mesh/box-box as the
  full-manifold gap)."""
  he = geoms.params[ia, :3]
  rb, hlb = geoms.params[ib, 0], geoms.params[ib, 1]
  Ra, pa = _geom_pose(geoms, ia, kin)
  Rb, pb = _geom_pose(geoms, ib, kin)

  best = None
  for s in (-1.0, 0.0, 1.0):
    cpt = pb + Rb[:, 2] * (s * hlb)
    cl = Ra.T @ (cpt - pa)
    clamped = jnp.clip(cl, -he, he)
    delta = cl - clamped
    dist = jnp.sqrt(jnp.sum(delta * delta) + 1e-18)
    n_ab = Ra @ (delta / dist)   # points box(A) -> capsule(B)
    depth = rb - dist
    pos = pa + Ra @ clamped
    cand = (pos, -n_ab, depth)   # convention: normal B -> A
    if best is None:
      best = cand
    else:
      better = cand[2] > best[2]
      best = tuple(jnp.where(better, c, b) for c, b in zip(cand, best))
  pos, n, depth = best
  return [(pos, n, depth, depth > 0)]


def _onehot_min(x):
  """One-hot (first) argmin of a small 1-D vector, gather-free."""
  n = x.shape[0]
  return jax.nn.one_hot(jnp.argmin(x), n, dtype=x.dtype)


def _onehot_max(x):
  n = x.shape[0]
  return jax.nn.one_hot(jnp.argmax(x), n, dtype=x.dtype)


def _box_box(geoms, ia, ib, kin):
  """Box (A) vs box (B): SAT over the 15 candidate axes + fixed 9-slot manifold.

  RaiSim's box-box runs ODE-heritage `dBoxBox` (dynamic clipping, variable contact
  count — SURVEY.md C6); here the manifold has a STATIC shape: 4 slots for the
  A-reference-face case (B's incident-face vertices), 4 for the B-reference-face
  case, 1 for the edge-edge case. Exactly one group is active per step, selected
  branchlessly by which SAT axis family wins (faces preferred over edges by the
  usual 5% bias to avoid manifold flicker).
  """
  ea = geoms.params[ia, :3]
  eb = geoms.params[ib, :3]
  Ra, pa = _geom_pose(geoms, ia, kin)
  Rb, pb = _geom_pose(geoms, ib, kin)
  dtype = pa.dtype
  I3 = jnp.eye(3, dtype=dtype)

  Rab = Ra.T @ Rb                      # B axes in A frame (columns)
  tab = Ra.T @ (pb - pa)               # B center in A frame
  Cabs = jnp.abs(Rab) + 1e-7           # guard near-parallel axes (ODE's trick)

  # --- face axes: penetration depth along each (positive = overlapping) ---
  depthA = (ea + Cabs @ eb) - jnp.abs(tab)        # (3,) A's axes
  tb = Rab.T @ tab                                 # A->B center in B frame
  depthB = (eb + Cabs.T @ ea) - jnp.abs(tb)       # (3,) B's axes

  # --- edge-edge axes: cross(a_i, b_j), 9 of them ---
  big = jnp.asarray(3e38, dtype)
  ax_list, de_list = [], []
  for i in range(3):
    for j in range(3):
      ax = jnp.cross(I3[i], Rab[:, j])
      n2 = jnp.sum(ax * ax)
      ok = n2 > 1e-8                               # parallel edges: axis degenerate
      axu = ax * jax.lax.rsqrt(jnp.maximum(n2, 1e-12))
      ra = jnp.sum(ea * jnp.abs(axu))
      rb = jnp.sum(eb * jnp.abs(axu @ Rab))
      d = (ra + rb) - jnp.abs(jnp.dot(axu, tab))
      ax_list.append(axu)
      de_list.append(jnp.where(ok, d, big))
  axes_e = jnp.stack(ax_list)                      # (9, 3) in A frame
  depth_e = jnp.stack(de_list)                     # (9,)

  overlap = (jnp.min(depthA) > 0) & (jnp.min(depthB) > 0) & (jnp.min(depth_e) > 0)

  bestA = jnp.min(depthA)
  bestB = jnp.min(depthB)
  bestE = jnp.min(depth_e)
  best_face = jnp.minimum(bestA, bestB)
  face_wins = best_face <= bestE * 1.05 + 1e-9
  a_wins = face_wins & (bestA <= bestB)
  b_wins = face_wins & ~(bestA <= bestB)
  e_wins = ~face_wins

  out = []

  def face_manifold(e_ref, e_inc, R_ri, t_ri, R_ref_w, p_ref_w, depth_ref, flip):
    """Reference-face contacts: incident box's face verts vs reference box's slab.

    e_ref/e_inc: half extents; R_ri/t_ri: incident->reference frame; R_ref_w/p_ref_w:
    reference box world pose; depth_ref: (3,) SAT depths along reference axes;
    flip: False when reference box is A (normal must point B->A = -ref_axis_toward_inc).
    Returns 4 (pos, n, depth, valid_geom) tuples; caller masks with the case winner.
    """
    oh_i = _onehot_min(depth_ref)                  # reference axis one-hot (3,)
    s = jnp.where(jnp.dot(oh_i, t_ri) >= 0, 1.0, -1.0)   # which face of ref box
    # incident face on the other box: axis most anti-parallel to ref normal
    row = oh_i @ jnp.abs(R_ri)                     # (3,) |n_ref . b_k|
    oh_j = _onehot_max(row)
    sgn_j = jnp.dot(oh_i @ R_ri, oh_j)             # n_ref . b_j (signed)
    sb = -s * jnp.sign(sgn_j + 1e-30)              # incident face offset sign
    ebj = jnp.dot(e_inc, oh_j)
    vb_c = t_ri + sb * ebj * (R_ri @ oh_j)         # incident face center, ref frame
    oh_1, oh_2 = jnp.roll(oh_j, 1), jnp.roll(oh_j, 2)
    w1 = jnp.dot(e_inc, oh_1) * (R_ri @ oh_1)
    w2 = jnp.dot(e_inc, oh_2) * (R_ri @ oh_2)
    ea_i = jnp.dot(e_ref, oh_i)
    n_ref = s * oh_i                               # ref-frame normal toward incident
    n_w = R_ref_w @ n_ref
    n_out = jnp.where(flip, n_w, -n_w)             # convention: B -> A
    res = []
    for s1 in (-1.0, 1.0):
      for s2 in (-1.0, 1.0):
        v = vb_c + s1 * w1 + s2 * w2
        d_k = ea_i - s * jnp.dot(v, oh_i)          # penetration into ref slab
        v_cl = jnp.clip(v, -e_ref, e_ref)          # keep point in the overlap region
        v_cl = v_cl * (1.0 - oh_i) + oh_i * s * (ea_i - 0.5 * d_k)
        pos = p_ref_w + R_ref_w @ v_cl
        res.append((pos, n_out, d_k, d_k > 0))
    return res

  # case 1: A's face is the reference (normal = B->A = -A_face_axis_toward_B)
  mfA = face_manifold(ea, eb, Rab, tab, Ra, pa, depthA, flip=False)
  # case 2: B's face is the reference (normal toward A already = B->A)
  mfB = face_manifold(eb, ea, Rab.T, tb, Rb, pb, depthB, flip=True)

  for pos, n, d, v in mfA:
    out.append((pos, n, d, v & a_wins & overlap))
  for pos, n, d, v in mfB:
    out.append((pos, n, d, v & b_wins & overlap))

  # case 3: edge-edge — closest points between the two winning edges
  oh_e = _onehot_min(depth_e)                      # (9,)
  n_e = oh_e @ axes_e                              # A-frame unit axis
  n_e = n_e * jnp.where(jnp.dot(n_e, tab) >= 0, 1.0, -1.0)   # orient A -> B
  oh_ei = jnp.sum(oh_e.reshape(3, 3), axis=1)      # A edge direction one-hot
  oh_ej = jnp.sum(oh_e.reshape(3, 3), axis=0)      # B edge direction one-hot
  # A's edge: runs along axis i; the other two coords sit on the face toward B
  pa_e = jnp.sign(n_e) * ea * (1.0 - oh_ei)
  da_e = oh_ei
  # B's edge: along b_j; other coords on B's face toward A (against n_e)
  nb = -(n_e @ Rab)                                # normal in B frame, toward A
  pb_e_b = jnp.sign(nb) * eb * (1.0 - oh_ej)
  pb_e = tab + Rab @ pb_e_b
  db_e = Rab @ oh_ej
  qa, qb2 = _closest_segment_segment(
      pa_e, da_e, jnp.dot(ea, oh_ei), pb_e, db_e, jnp.dot(eb, oh_ej)
  )
  pos_e = pa + Ra @ (0.5 * (qa + qb2))
  n_e_w = -(Ra @ n_e)                              # convention: B -> A
  d_e = jnp.dot(oh_e, depth_e)
  out.append((pos_e, n_e_w, d_e, e_wins & overlap & (d_e > 0)))
  return out


# ---------------------------------------------------------------------------
# Broad phase — masked AABB overlap test (SURVEY.md C6)
# ---------------------------------------------------------------------------

_AABB_BIG = 3e38


def geom_aabb(geoms: GeomTable, gi: int, kin):
  """World-frame AABB (lo, hi) of geom `gi`. Planes/heightmaps are unbounded."""
  gt = geoms.gtype[gi]
  R, p = _geom_pose(geoms, gi, kin)
  dtype = p.dtype
  if gt in (GEOM_PLANE, GEOM_HEIGHTMAP):
    return (jnp.full((3,), -_AABB_BIG, dtype), jnp.full((3,), _AABB_BIG, dtype))
  if gt == GEOM_SPHERE:
    r = geoms.params[gi, 0]
    e = jnp.full((3,), 1.0, dtype) * r
  elif gt == GEOM_BOX:
    e = jnp.abs(R) @ geoms.params[gi, :3]
  elif gt == GEOM_CAPSULE:
    r, hl = geoms.params[gi, 0], geoms.params[gi, 1]
    e = jnp.abs(R[:, 2]) * hl + r
  elif gt == GEOM_CYLINDER:
    r, hl = geoms.params[gi, 0], geoms.params[gi, 1]
    e = jnp.abs(R[:, 2]) * hl + r
  else:
    return (jnp.full((3,), -_AABB_BIG, dtype), jnp.full((3,), _AABB_BIG, dtype))
  return p - e, p + e


def broadphase_mask(geoms: GeomTable, pairs: tuple, kin, margin: float = 0.0):
  """(n_pairs,) bool: AABB overlap per candidate pair.

  The TPU-native replacement for the reference's dynamic AABB pruning: the pair
  LIST stays static (shapes never change under jit); the broad phase instead
  gates the narrow-phase `active` masks, so far-apart pairs contribute provably
  inactive contact slots and XLA can skip none — correctness masking, not
  compute skipping. The win is in the solver: inactive rows take the trivial
  path of the masked cone solve.
  """
  los, his = {}, {}
  masks = []
  for ia, ib in pairs:
    for g in (ia, ib):
      if g not in los:
        los[g], his[g] = geom_aabb(geoms, g, kin)
    lo_a, hi_a = los[ia], his[ia]
    lo_b, hi_b = los[ib], his[ib]
    ok = jnp.all((lo_a <= hi_b + margin) & (lo_b <= hi_a + margin))
    masks.append(ok)
  return jnp.stack(masks) if masks else jnp.zeros((0,), jnp.bool_)


def collide(geoms: GeomTable, pairs: tuple, kin, heightmap=None) -> ContactSet:
  """Run all pair kernels; assemble the padded ContactSet."""
  from raisimlib_tpu.ops import heightmap as hm

  pos_l: List = []
  nrm_l: List = []
  dep_l: List = []
  act_l: List = []
  body_a, body_b, mat_a, mat_b = [], [], [], []

  dispatch = {
      (GEOM_SPHERE, GEOM_PLANE): _sphere_plane,
      (GEOM_SPHERE, GEOM_SPHERE): _sphere_sphere,
      (GEOM_SPHERE, GEOM_BOX): _sphere_box,
      (GEOM_SPHERE, GEOM_CAPSULE): _sphere_capsule,
      (GEOM_BOX, GEOM_BOX): _box_box,
      (GEOM_BOX, GEOM_PLANE): _box_plane,
      (GEOM_CAPSULE, GEOM_PLANE): _capsule_plane,
      (GEOM_CAPSULE, GEOM_CAPSULE): _capsule_capsule,
      (GEOM_BOX, GEOM_CAPSULE): _box_capsule,
  }

  bp = broadphase_mask(geoms, pairs, kin) if pairs else None

  for pi, (ia, ib) in enumerate(pairs):
    ta, tb = geoms.gtype[ia], geoms.gtype[ib]
    if tb == GEOM_HEIGHTMAP:
      assert heightmap is not None, "scene has heightmap pairs but no heightmap data"
      results = hm.collide_heightmap(geoms, ia, kin, heightmap)
    else:
      results = dispatch[(ta, tb)](geoms, ia, ib, kin)
    results = [(pos, n, depth, valid & bp[pi]) for pos, n, depth, valid in results]
    for pos, n, depth, valid in results:
      pos_l.append(pos)
      nrm_l.append(n)
      dep_l.append(depth)
      act_l.append(valid)
      body_a.append(geoms.body[ia])
      body_b.append(geoms.body[ib])
      mat_a.append(geoms.material[ia])
      mat_b.append(geoms.material[ib])

  if not pos_l:  # no candidate pairs: one inert slot keeps shapes static
    z3 = jnp.zeros(3, dtype=kin.p.dtype)
    pos_l, nrm_l = [z3], [jnp.array([0.0, 0.0, 1.0], dtype=kin.p.dtype)]
    dep_l, act_l = [jnp.zeros((), kin.p.dtype)], [jnp.zeros((), jnp.bool_)]
    body_a, body_b, mat_a, mat_b = [-1], [-1], [0], [0]

  return ContactSet(
      pos=jnp.stack(pos_l),
      normal=jnp.stack(nrm_l),
      depth=jnp.stack(dep_l),
      active=jnp.stack([jnp.asarray(a, dtype=kin.p.dtype) for a in act_l]),
      body_a=tuple(body_a),
      body_b=tuple(body_b),
      mat_a=tuple(mat_a),
      mat_b=tuple(mat_b),
  )
