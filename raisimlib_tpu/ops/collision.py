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
        continue  # unsupported pair type (documented gap, e.g. box-box)
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
      (GEOM_BOX, GEOM_PLANE): _box_plane,
      (GEOM_CAPSULE, GEOM_PLANE): _capsule_plane,
      (GEOM_CAPSULE, GEOM_CAPSULE): _capsule_capsule,
      (GEOM_BOX, GEOM_CAPSULE): _box_capsule,
  }

  for ia, ib in pairs:
    ta, tb = geoms.gtype[ia], geoms.gtype[ib]
    if tb == GEOM_HEIGHTMAP:
      assert heightmap is not None, "scene has heightmap pairs but no heightmap data"
      results = hm.collide_heightmap(geoms, ia, kin, heightmap)
    else:
      results = dispatch[(ta, tb)](geoms, ia, ib, kin)
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
