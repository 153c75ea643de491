"""Fused full-physics-step Pallas TPU megakernel (round 4).

Round-3 profiling (metrics/step_profile_r03.md) showed the batched contact step
capped by the XLA-side ASSEMBLY chain — FK recursion, narrow phase, CRBA,
RNEA, Cholesky, W = J M^-1 formation — a ~1.3 ms/step sequence of small ops
that is latency- (not bandwidth-) bound and flat in batch size. The measured
negative results (fk_levels, nonlinearities_w) showed the fix is NOT
reshuffling XLA ops but moving assembly INTO kernel space. This module does
that: ONE Pallas kernel per scene computes, per batch tile with the batch on
the TPU lane axis,

    PD torque -> FK -> RNEA bias -> CRBA mass matrix -> narrow phase ->
    contact/limit solver rows -> Cholesky -> triangular solves (v_free, W) ->
    matrix-free Gauss-Seidel cone solve -> integrate

with zero HBM round-trips for intermediates. Every per-world scalar is a
(T,)-lane vector; the static model tree unrolls at trace time through a tiny
scalar algebra whose python-float constants fold and whose structural zeros
vanish (identity frame rotations, unit joint axes, ancestor sparsity), so the
emitted op count tracks the model's true structure.

This is the TPU-native analog of the reference engine's single fused
`World::integrate()` call (SURVEY.md §3.1): where RaiSim's C++ runs the whole
step in one cache-resident pass per world, this kernel runs it in one
VMEM-resident pass per 128 worlds.

Scope (checked by `_analyze`; unsupported scenes raise FusedStepUnsupported
and callers fall back to ops/pipeline.step_batch):
  * joints: FREE roots, REVOLUTE, PRISMATIC, SPHERICAL
  * contacts vs plane: sphere, capsule (2 endpoint spheres), box (8 corners)
  * contacts vs heightmap (round 5): the COMPLETE geom family — sphere,
    capsule endpoints (radius probes with the full riser march of
    ops/heightmap._point_contact), box corners, cylinder downhill-rim
    points, cone apex/base-rim points, and mesh hull vertices (all probes
    + in-kernel top-4 selection); the surface gather reads one
    root-centered terrain patch operand per FREE root (see _HmStatic)
  * runtime-frame pairs: sphere-sphere, sphere-box, sphere-capsule
  * constraint rows: joint limits (wires/pins/compliant -> fallback)
  * no external wrenches, f32 only

Parity: bit-compatible math with pipeline.step_batch (same formulas, same row
order, same solver semantics) up to f32 reassociation — tested in
tests/test_pallas_step.py. Gradients: `make_step_batch_fused` wraps the kernel
in a custom VJP whose backward re-derives through the differentiable pure path
(same split as ops/pallas_contact.solve_dynamics_batch).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisimlib_tpu.models.model import JointType
from raisimlib_tpu.ops import collision as coll
from raisimlib_tpu.ops.pallas_contact import _cone_solve_vec


class FusedStepUnsupported(Exception):
  """Scene outside the fused kernel's supported class; use the pure path."""


def _pad8(n: int) -> int:
  return ((n + 7) // 8) * 8


# ---------------------------------------------------------------------------
# Trace-time scalar algebra: a "scalar" is a python float (static) or a (T,)
# lane vector. Static zeros/ones fold away, so the unrolled recursions emit
# only the ops the model's structure actually needs.
# ---------------------------------------------------------------------------


def _is_c(x) -> bool:
  return isinstance(x, (int, float))


def _mul(a, b):
  if _is_c(a) and _is_c(b):
    return float(a) * float(b)
  if _is_c(a):
    if a == 0.0:
      return 0.0
    if a == 1.0:
      return b
    if a == -1.0:
      return -b
    return a * b
  if _is_c(b):
    return _mul(b, a)
  return a * b


def _add2(a, b):
  if _is_c(a):
    if a == 0.0:
      return b
    if _is_c(b):
      return float(a) + float(b)
  if _is_c(b) and b == 0.0:
    return a
  return a + b


def _add(*xs):
  out = 0.0
  for x in xs:
    out = _add2(out, x)
  return out


def _neg(a):
  return -float(a) if _is_c(a) else -a


def _sub(a, b):
  return _add2(a, _neg(b))


def _dot(u, v):
  return _add(*[_mul(a, b) for a, b in zip(u, v)])


def _vadd(u, v):
  return tuple(_add2(a, b) for a, b in zip(u, v))


def _vsub(u, v):
  return tuple(_sub(a, b) for a, b in zip(u, v))


def _vscale(s, u):
  return tuple(_mul(s, a) for a in u)


def _cross(u, v):
  return (
      _sub(_mul(u[1], v[2]), _mul(u[2], v[1])),
      _sub(_mul(u[2], v[0]), _mul(u[0], v[2])),
      _sub(_mul(u[0], v[1]), _mul(u[1], v[0])),
  )


def _mv(M, v):
  """3x3 @ 3."""
  return tuple(_dot(row, v) for row in M)


def _mTv(M, v):
  """3x3 transpose @ 3."""
  return tuple(_dot((M[0][j], M[1][j], M[2][j]), v) for j in range(3))


def _mm(A, B):
  """3x3 @ 3x3."""
  return tuple(
      tuple(_dot(A[i], tuple(B[k][j] for k in range(3))) for j in range(3))
      for i in range(3))


def _mT(A):
  return tuple(tuple(A[j][i] for j in range(3)) for i in range(3))


def _m_add(A, B):
  return tuple(tuple(_add2(a, b) for a, b in zip(ra, rb))
               for ra, rb in zip(A, B))


def _skew(v):
  return ((0.0, _neg(v[2]), v[1]),
          (v[2], 0.0, _neg(v[0])),
          (_neg(v[1]), v[0], 0.0))


_Z3 = ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
_I3 = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))


def _np_m(M):
  return tuple(tuple(float(x) for x in row) for row in np.asarray(M))


def _np_v(v):
  return tuple(float(x) for x in np.asarray(v))


# 6-vectors as (vec3, vec3) pairs; 6x6 as (A, B, C, D) 3x3 blocks.


def _xf_motion(E, r, wv):
  """Motion vector A-coords -> B-coords for X = (E, r) (mirror sp.xform_motion)."""
  w, v = wv
  return (_mv(E, w), _mv(E, _vsub(v, _cross(r, w))))


def _xf_motion_inv(E, r, wv):
  """Motion vector B-coords -> A-coords (mirror sp.xform_motion_inv)."""
  w, v = wv
  wp = _mTv(E, w)
  return (wp, _vadd(_mTv(E, v), _cross(r, wp)))


def _xf_force_inv(E, r, nf):
  """Force vector B-coords -> A-coords (mirror sp.xform_force_inv)."""
  n, f = nf
  fp = _mTv(E, f)
  return (_vadd(_mTv(E, n), _cross(r, fp)), fp)


def _cross_motion(v, m):
  w, vl = v
  mw, ml = m
  return (_cross(w, mw), _vadd(_cross(w, ml), _cross(vl, mw)))


def _cross_force(v, f):
  w, vl = v
  n, fl = f
  return (_vadd(_cross(w, n), _cross(vl, fl)), _cross(w, fl))


def _I_mul(I4, wv):
  """6x6 (A,B,C,D blocks) @ motion (w, v)."""
  A, B, C, D = I4
  w, v = wv
  return (_vadd(_mv(A, w), _mv(B, v)), _vadd(_mv(C, w), _mv(D, v)))


def _vadd6(*wvs):
  w = (0.0, 0.0, 0.0)
  v = (0.0, 0.0, 0.0)
  for ww, vv in wvs:
    w = _vadd(w, ww)
    v = _vadd(v, vv)
  return (w, v)


def _b_mm(X, Y):
  """6x6 block matmul: (A,B,C,D) @ (A,B,C,D)."""
  XA, XB, XC, XD = X
  YA, YB, YC, YD = Y
  return (_m_add(_mm(XA, YA), _mm(XB, YC)), _m_add(_mm(XA, YB), _mm(XB, YD)),
          _m_add(_mm(XC, YA), _mm(XD, YC)), _m_add(_mm(XC, YB), _mm(XD, YD)))


def _b_T(X):
  A, B, C, D = X
  return (_mT(A), _mT(C), _mT(B), _mT(D))


def _b_add(X, Y):
  return tuple(_m_add(a, b) for a, b in zip(X, Y))


def _quat_to_mat(qw, qx, qy, qz):
  """Mirror sp.quat_to_mat on scalar components."""
  xx, yy, zz = _mul(qx, qx), _mul(qy, qy), _mul(qz, qz)
  xy, xz, yz = _mul(qx, qy), _mul(qx, qz), _mul(qy, qz)
  wx, wy, wz = _mul(qw, qx), _mul(qw, qy), _mul(qw, qz)
  return (
      (_sub(1.0, _mul(2.0, _add2(yy, zz))), _mul(2.0, _sub(xy, wz)),
       _mul(2.0, _add2(xz, wy))),
      (_mul(2.0, _add2(xy, wz)), _sub(1.0, _mul(2.0, _add2(xx, zz))),
       _mul(2.0, _sub(yz, wx))),
      (_mul(2.0, _sub(xz, wy)), _mul(2.0, _add2(yz, wx)),
       _sub(1.0, _mul(2.0, _add2(xx, yy)))),
  )


def _rodrigues(axis, c, s):
  """R = I + s K + (1-c) K^2 for STATIC unit axis; c, s are (T,) lane vectors."""
  K = _skew(axis)
  KK = _mm(K, K)
  one_c = _sub(1.0, c)
  return tuple(
      tuple(_add(_I3[i][j], _mul(s, K[i][j]), _mul(one_c, KK[i][j]))
            for j in range(3)) for i in range(3))


# ---------------------------------------------------------------------------
# Static scene analysis
# ---------------------------------------------------------------------------


class _Slot(NamedTuple):
  """One contact slot. kind selects the in-kernel narrow phase:

    "plane_pt": feature point (body_a frame, static `local`) + sphere radius
                vs the static plane z = plane_h — sphere centers, capsule
                endpoints, box corners. Static contact frame (t1=+y, t2=-x,
                n=+z, matching pipeline._tangent_frames for n=z).
    "ss":       sphere (body_a, center offset `local`, radius) vs sphere
                (body_b, offset b_pos, radius rb) — runtime normal/frames;
                body_b = -1 means a static world sphere at b_pos.
    "sb":       sphere (A) vs box (B: half extents he, offset b_pos/b_rot on
                body_b or static at -1) — scalar port of collision._sphere_box
                incl. the interior min-penetration branch.
    "sc":       sphere (A) vs capsule (B) — he carries (rb, hl, 0); scalar
                port of collision._sphere_capsule (segment clamp + sphere).
    "hm_pt":    feature point / sphere (body_a frame `local`, radius; 0.0 for
                box corners) vs the heightmap field — the scalar port of
                heightmap._point_contact incl. the 16-sample riser march for
                radius > 0, reading the per-world terrain patch operand.
  """

  kind: str
  body_a: int
  body_b: int           # -1: plane ("plane_pt") or static world geom
  local: tuple          # A-side feature point / sphere-center offset (A frame)
  radius: float         # A sphere radius (0.0 for box corners)
  plane_h: float
  rb: float             # "ss": B sphere radius
  he: tuple             # "sb": B box half extents
  b_pos: tuple          # B offset pos (body_b frame; world if body_b < 0)
  b_rot: tuple          # B offset rot (3x3)
  mu: float
  e: float
  thresh: float


class _Limit(NamedTuple):
  vadr: int
  qadr: int
  lo: float
  hi: float


class _HmStatic(NamedTuple):
  """Static heightfield data for the in-kernel terrain narrow phase.

  The full (nx, ny) field never enters the kernel: the wrapper extracts a
  (PRx, PRy) patch per world, centered on the FREE root's (x, y) cell, plus
  the patch origin's world coords, and passes them as one extra operand
  (PRx*PRy + 2 rows). `reach` (a static bound on how far any field-colliding
  feature can be from the root, from summed link-offset norms) guarantees
  every probe and its riser-march samples land >= 1 cell inside the patch,
  so patch-local index math reproduces the full-field math of
  ops/heightmap.surface_at exactly (parity caveat: the patch-relative fx
  differs from the full-field fx by one f32 rounding of the patch origin —
  floor() can flip only exactly on a cell boundary)."""

  prx: int              # patch rows (x samples)
  pry: int              # patch cols (y samples)
  nx: int
  ny: int
  dx: float
  dy: float
  x_min: float          # world x of heights[0, :] (static field center)
  y_min: float
  root_qs: tuple        # q index of each patch-centering FREE root's x coord
  roots: tuple          # body index of each FREE root with field contacts
  reach: float          # static bound: max feature distance from a root (m)


class _StaticData(NamedTuple):
  """Everything the kernel needs, concretized to python/numpy at build time."""

  # model
  nb: int
  nq: int
  nv: int
  parent: tuple
  joint_types: tuple
  q_adr: tuple
  v_adr: tuple
  axis: tuple           # per body, static 3-tuple
  X_rotT: tuple         # per body, static 3x3 (transpose of parent->joint rot)
  X_rot: tuple
  X_pos: tuple
  I6: tuple             # per body, (A, B, C, D) static 3x3 blocks
  anc_dofs: tuple       # per body, tuple of ancestor dof indices
  # actuation
  actuated: tuple
  torque_limit: tuple
  kp: tuple
  kd: tuple
  jidx: tuple           # dof -> qpos index for 1-dof joints
  jmask: tuple
  use_pd: bool
  # physics
  dt: float
  gravity: tuple
  erp: float
  slop: float
  max_corr: float
  sweeps: int
  n_grid: int
  # rows
  slots: tuple          # of _Slot
  limits: tuple         # of _Limit
  ncp: int              # padded GS contact-row count
  n_wrows: int          # solver rows needing W (3*ncone + nlim)
  nrp: int              # padded solve-RHS column count (n_wrows + 1 for vf)
  hm: Any = None        # _HmStatic when the scene has a heightmap field
  # per mesh-vs-heightmap geom: (body, verts ((n,3) static), vcount) —
  # the "hm_mesh" slots reference entries here by index (slot.local[0])
  hm_meshes: tuple = ()


def _chain_reach(model, body: int, root: int, tabs) -> float:
  """Static bound on the distance from `root`'s origin to `body`'s origin
  over ALL joint configurations: the sum of fixed link-offset norms down the
  chain (rotational joints can't stretch a chain past its offset norms).
  Prismatic joints add their largest limit magnitude; an unlimited prismatic
  joint in the chain makes the bound impossible -> FusedStepUnsupported."""
  reach = 0.0
  b = body
  lim_by_vadr = {int(v): (float(lo), float(hi))
                 for v, lo, hi in zip(tabs.limit_vadr, tabs.limit_lo,
                                      tabs.limit_hi)}
  while b != root:
    if b < 0:
      raise FusedStepUnsupported(
          "heightmap-colliding geom not attached below the FREE root")
    reach += float(np.linalg.norm(np.asarray(model.X_pos)[b]))
    if JointType(model.joint_types[b]) == JointType.PRISMATIC:
      lim = lim_by_vadr.get(int(model.v_adr[b]))
      if lim is None:
        raise FusedStepUnsupported(
            "unlimited prismatic joint above a heightmap-colliding geom "
            "(no static patch-reach bound)")
      reach += max(abs(lim[0]), abs(lim[1]))
    b = int(model.parent[b])
  return reach


def _analyze_field(scene, field, geoms) -> _HmStatic:
  """Concretize the heightfield to static patch data (see _HmStatic)."""
  from raisimlib_tpu.ops import constraints as cs

  model = scene.model
  tabs = getattr(scene, "constraints", None) or cs.EMPTY
  H = np.asarray(field.heights)
  if H.ndim != 2:
    raise FusedStepUnsupported("field.heights must be (nx, ny) at build time")
  nx, ny = H.shape
  try:
    center = np.asarray(jax.device_get(field.center), np.float64)
  except Exception as e:                              # traced center
    raise FusedStepUnsupported(f"field.center must be concrete ({e})")
  dx = float(field.size_x) / (nx - 1)
  dy = float(field.size_y) / (ny - 1)
  x_min = float(center[0]) - 0.5 * float(field.size_x)
  y_min = float(center[1]) - 0.5 * float(field.size_y)

  # the patch centers on the ONE FREE root all field-colliding geoms hang off
  hm_geom = next(i for i, t in enumerate(geoms.gtype)
                 if t == coll.GEOM_HEIGHTMAP)
  reach = 0.0
  roots = set()
  for ia, ib in scene.pairs:
    if ib != hm_geom and ia != hm_geom:
      continue
    gi = ia if ib == hm_geom else ib
    b = geoms.body[gi]
    r = b
    while r >= 0 and model.parent[r] >= 0:
      r = int(model.parent[r])
    if r < 0 or JointType(model.joint_types[r]) != JointType.FREE:
      raise FusedStepUnsupported(
          "heightmap-colliding geoms must descend from a FREE root")
    roots.add(r)
    pa = np.asarray(geoms.params)[gi]
    oa = np.asarray(geoms.offset_pos)[gi]
    t = geoms.gtype[gi]
    ext = float(np.linalg.norm(oa))
    if t == coll.GEOM_SPHERE:
      ext += 2.0 * float(pa[0])          # radius + march span r
    elif t == coll.GEOM_CAPSULE:
      ext += float(pa[1]) + 2.0 * float(pa[0])
    elif t == coll.GEOM_BOX:
      ext += float(np.linalg.norm(pa[:3]))
    elif t == coll.GEOM_CYLINDER:
      ext += float(np.hypot(pa[0], pa[1]))
    elif t == coll.GEOM_CONE:
      ext += max(0.75 * float(pa[1]),
                 float(np.hypot(pa[0], 0.25 * pa[1])))
    elif t == coll.GEOM_MESH:
      vc = int(geoms.mesh_vcount[gi])
      V = np.asarray(geoms.mesh_verts)[gi][:vc]   # geom offset baked in
      ext = float(np.linalg.norm(V, axis=1).max())
    else:
      raise FusedStepUnsupported(f"geom type {t} vs heightmap")
    reach = max(reach, _chain_reach(model, b, r, tabs) + ext)
  if not roots:
    raise FusedStepUnsupported("heightmap present but no colliding pairs")
  roots = tuple(sorted(roots))    # ONE patch per FREE root (multi-object
  # terrain scenes: each loose body / robot centers its own patch)

  # patch size: the probe cell +-(reach/d) cells around the root cell, plus
  # 1 cell of gather neighborhood and 2 of floor/clamp slack each side
  prx = min(2 * (int(np.ceil(reach / dx)) + 3) + 2, nx)
  pry = min(2 * (int(np.ceil(reach / dy)) + 3) + 2, ny)
  return _HmStatic(prx=prx, pry=pry, nx=nx, ny=ny, dx=dx, dy=dy,
                   x_min=x_min, y_min=y_min,
                   root_qs=tuple(int(model.q_adr[r]) for r in roots),
                   roots=roots, reach=float(reach))


def _analyze(scene, config, use_pd: bool) -> _StaticData:
  """Concretize the scene to static kernel data; raise FusedStepUnsupported
  for anything outside the kernel's scene class."""
  from raisimlib_tpu.ops import constraints as cs

  model = scene.model
  for jt in model.joint_types:
    if JointType(jt) not in (JointType.FREE, JointType.REVOLUTE,
                             JointType.PRISMATIC, JointType.SPHERICAL):
      raise FusedStepUnsupported(f"joint type {JointType(jt)!r}")
  tabs = getattr(scene, "constraints", None) or cs.EMPTY
  if tabs.wires or tabs.pins or tabs.compliant:
    raise FusedStepUnsupported("wires/pins/compliant constraints")
  geoms = scene.geoms
  mats = np.asarray(scene.materials, np.float64)

  field = getattr(scene, "field", None)
  hm = None
  if field is not None:
    hm = _analyze_field(scene, field, geoms)

  slots = []
  hm_meshes = []
  _Z = (0.0, 0.0, 0.0)
  _ID = _np_m(np.eye(3))
  for ia, ib in scene.pairs:
    ta, tb = geoms.gtype[ia], geoms.gtype[ib]
    ba, bb = geoms.body[ia], geoms.body[ib]
    pa = np.asarray(geoms.params)[ia]
    pb = np.asarray(geoms.params)[ib]
    oa = np.asarray(geoms.offset_pos)[ia]
    ra_ = np.asarray(geoms.offset_rot)[ia]
    ob = np.asarray(geoms.offset_pos)[ib]
    rb_ = np.asarray(geoms.offset_rot)[ib]
    mu, e, th = (float(x) for x in mats[geoms.material[ia], geoms.material[ib]])

    def plane_pt(body, local, radius, h):
      slots.append(_Slot("plane_pt", body, -1, _np_v(local), float(radius),
                         float(h), 0.0, _Z, _Z, _ID, mu, e, th))

    def hm_pt(body, local, radius):
      slots.append(_Slot("hm_pt", body, -1, _np_v(local), float(radius),
                         0.0, 0.0, _Z, _Z, _ID, mu, e, th))

    if tb == coll.GEOM_HEIGHTMAP:
      # slot counts/order mirror heightmap.collide_heightmap exactly
      if ta == coll.GEOM_SPHERE:
        hm_pt(ba, oa, pa[0])
      elif ta == coll.GEOM_CAPSULE:
        r_, hl = float(pa[0]), float(pa[1])
        for s_ in (-1.0, 1.0):
          hm_pt(ba, oa + ra_ @ np.array([0.0, 0.0, s_ * hl]), r_)
      elif ta == coll.GEOM_BOX:
        he = pa[:3]
        for sx in (-1.0, 1.0):
          for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
              hm_pt(ba, oa + ra_ @ (he * np.array([sx, sy, sz])), 0.0)
      elif ta == coll.GEOM_CYLINDER:
        # 6 downhill-frame rim points (r=0 probes at RUNTIME offsets) —
        # mirror heightmap._cylinder_hm's sample order exactly
        r_, hl = float(pa[0]), float(pa[1])
        for s_ in (-1.0, 1.0):
          for phi in (0.0, 2.0943951, -2.0943951):
            slots.append(_Slot("hm_cylpt", ba, -1, (s_, phi, 0.0), 0.0, 0.0,
                               0.0, (r_, hl, 0.0), _np_v(oa), _np_m(ra_),
                               mu, e, th))
      elif ta == coll.GEOM_CONE:
        # apex + 3 base-rim points — mirror heightmap._cone_hm
        r_, hc = float(pa[0]), float(pa[1])
        slots.append(_Slot("hm_conept", ba, -1, (0.0, 0.0, 0.0), 0.0, 0.0,
                           0.0, (r_, hc, 0.0), _np_v(oa), _np_m(ra_),
                           mu, e, th))
        for phi in (0.0, 2.0943951, -2.0943951):
          slots.append(_Slot("hm_conept", ba, -1, (1.0, phi, 0.0), 0.0, 0.0,
                             0.0, (r_, hc, 0.0), _np_v(oa), _np_m(ra_),
                             mu, e, th))
      elif ta == coll.GEOM_MESH:
        # 4 deepest of the (<= 32) hull-vertex probes, selected IN-KERNEL —
        # mirror heightmap._mesh_hm (vertex probes, lax.top_k(4) order)
        vcount = int(geoms.mesh_vcount[ia])
        mverts = tuple(_np_v(v)
                       for v in np.asarray(geoms.mesh_verts)[ia][:vcount])
        mi = len(hm_meshes)
        hm_meshes.append((ba, mverts, vcount))
        for k in range(4):
          slots.append(_Slot("hm_mesh", ba, -1, (float(mi), float(k), 0.0),
                             0.0, 0.0, 0.0, _Z, _Z, _ID, mu, e, th))
      else:
        raise FusedStepUnsupported(f"geom type {ta} vs heightmap")
    elif tb == coll.GEOM_PLANE:
      if ba < 0:
        raise FusedStepUnsupported("static non-plane geom vs plane")
      h = float(pb[0])
      if ta == coll.GEOM_SPHERE:
        plane_pt(ba, oa, pa[0], h)
      elif ta == coll.GEOM_CAPSULE:
        # two endpoint spheres at STATIC body-local points (r, hl along the
        # capsule z axis) — exactly collision._capsule_plane's 2 slots
        r_, hl = float(pa[0]), float(pa[1])
        for s_ in (-1.0, 1.0):
          plane_pt(ba, oa + ra_ @ np.array([0.0, 0.0, s_ * hl]), r_, h)
      elif ta == coll.GEOM_BOX:
        he = pa[:3]
        for sx in (-1.0, 1.0):
          for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
              plane_pt(ba, oa + ra_ @ (he * np.array([sx, sy, sz])), 0.0, h)
      else:
        raise FusedStepUnsupported(f"geom type {ta} vs plane")
    elif (ta, tb) == (coll.GEOM_SPHERE, coll.GEOM_SPHERE):
      slots.append(_Slot("ss", ba, bb, _np_v(oa), float(pa[0]), 0.0,
                         float(pb[0]), _Z, _np_v(ob), _ID, mu, e, th))
    elif (ta, tb) == (coll.GEOM_SPHERE, coll.GEOM_BOX):
      slots.append(_Slot("sb", ba, bb, _np_v(oa), float(pa[0]), 0.0, 0.0,
                         _np_v(pb[:3]), _np_v(ob), _np_m(rb_), mu, e, th))
    elif (ta, tb) == (coll.GEOM_SPHERE, coll.GEOM_CAPSULE):
      # he carries (rb, hl, 0): the capsule's radius + half-length
      slots.append(_Slot("sc", ba, bb, _np_v(oa), float(pa[0]), 0.0,
                         float(pb[0]), (float(pb[0]), float(pb[1]), 0.0),
                         _np_v(ob), _np_m(rb_), mu, e, th))
    else:
      raise FusedStepUnsupported(f"pair types ({ta}, {tb})")

  limits = tuple(
      _Limit(int(v), int(q), float(lo), float(hi))
      for v, q, lo, hi in zip(tabs.limit_vadr, tabs.limit_qadr,
                              tabs.limit_lo, tabs.limit_hi))

  if use_pd and scene.kp is None:
    raise FusedStepUnsupported("use_pd=True but scene has no PD gains")

  from raisimlib_tpu.ops.dynamics import ancestor_dof_mask

  amask = ancestor_dof_mask(model)
  anc = tuple(tuple(int(j) for j in np.nonzero(amask[b])[0])
              for b in range(model.nb))

  from raisimlib_tpu.ops.pipeline import _joint_pos_index

  jidx, jmask = _joint_pos_index(model)

  I6 = []
  inr = np.asarray(model.inertia, np.float64)
  for b in range(model.nb):
    I6.append((_np_m(inr[b, :3, :3]), _np_m(inr[b, :3, 3:]),
               _np_m(inr[b, 3:, :3]), _np_m(inr[b, 3:, 3:])))

  nc_total = max(len(slots) + len(limits), 1)
  ncp = _pad8(nc_total)
  n_wrows = 3 * len(slots) + len(limits)
  nrp = _pad8(n_wrows + 1)

  kp = np.asarray(scene.kp, np.float64) if scene.kp is not None else np.zeros(
      model.nv)
  kd = np.asarray(scene.kd, np.float64) if scene.kd is not None else np.zeros(
      model.nv)

  return _StaticData(
      nb=model.nb, nq=model.nq, nv=model.nv,
      parent=tuple(model.parent),
      joint_types=tuple(JointType(j) for j in model.joint_types),
      q_adr=tuple(model.q_adr), v_adr=tuple(model.v_adr),
      axis=tuple(_np_v(np.asarray(model.axis)[b]) for b in range(model.nb)),
      X_rotT=tuple(_np_m(np.asarray(model.X_rot)[b].T)
                   for b in range(model.nb)),
      X_rot=tuple(_np_m(np.asarray(model.X_rot)[b]) for b in range(model.nb)),
      X_pos=tuple(_np_v(np.asarray(model.X_pos)[b]) for b in range(model.nb)),
      I6=tuple(I6), anc_dofs=anc,
      actuated=_np_v(model.actuated),
      torque_limit=_np_v(model.torque_limit),
      kp=_np_v(kp), kd=_np_v(kd),
      jidx=tuple(int(x) for x in jidx), jmask=_np_v(jmask),
      use_pd=use_pd,
      dt=float(scene.dt), gravity=_np_v(scene.gravity),
      erp=float(config.erp), slop=float(config.slop),
      max_corr=float(config.max_correction_vel),
      sweeps=int(config.solver.sweeps), n_grid=int(config.solver.n_grid),
      slots=tuple(slots), limits=limits,
      ncp=ncp, n_wrows=n_wrows, nrp=nrp, hm=hm,
      hm_meshes=tuple(hm_meshes))


# ---------------------------------------------------------------------------
# Kernel emission
# ---------------------------------------------------------------------------


def _emit_fk_rnea(sd: _StaticData, q, u):
  """FK + RNEA bias for one tile. Returns (E0, r0, Rquat, Sw, h) where
  E0/r0 are per-body world->body transforms, Rquat the FREE bodies' raw
  quaternion rotations (for integrate), Sw per-dof world subspace rows,
  h the (nv,) bias torque list."""
  nb, nv = sd.nb, sd.nv
  E0 = [None] * nb
  r0 = [None] * nb
  EupL = [None] * nb
  rupL = [None] * nb
  Rquat = {}
  Sbody = [None] * nb       # list of per-dof body-frame (w, v) rows
  Sw = [None] * nv
  vbody = [None] * nb
  vJs = [None] * nb
  cJs = [None] * nb

  for i in range(nb):
    jt = sd.joint_types[i]
    qa, va = sd.q_adr[i], sd.v_adr[i]
    XrT, Xr, Xp = sd.X_rotT[i], sd.X_rot[i], sd.X_pos[i]
    if jt == JointType.FREE:
      quat = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
      pos = (q[qa], q[qa + 1], q[qa + 2])
      R = _quat_to_mat(*quat)
      Rquat[i] = (quat, R)
      EJ = _mT(R)
      rJ = pos
      # S rows: ang k -> (e_k, 0); lin k -> (0, R[k, :])
      Srows = [((_I3[k]), (0.0, 0.0, 0.0)) for k in range(3)]
      Srows += [((0.0, 0.0, 0.0), tuple(R[k])) for k in range(3)]
      w_b = (u[va], u[va + 1], u[va + 2])
      v_b = _mTv(R, (u[va + 3], u[va + 4], u[va + 5]))
      vJ = (w_b, v_b)
      cJ = ((0.0, 0.0, 0.0), _vscale(-1.0, _cross(w_b, v_b)))
    elif jt == JointType.SPHERICAL:
      # ball joint: q = quat wxyz (child -> joint frame), u = omega in child
      # body coords — constant S = [I3 | 0], cJ = 0 (mirror dynamics.py)
      quat = (q[qa], q[qa + 1], q[qa + 2], q[qa + 3])
      R = _quat_to_mat(*quat)
      Rquat[i] = (quat, R)
      EJ = _mT(R)
      rJ = (0.0, 0.0, 0.0)
      Srows = [((_I3[k]), (0.0, 0.0, 0.0)) for k in range(3)]
      vJ = ((u[va], u[va + 1], u[va + 2]), (0.0, 0.0, 0.0))
      cJ = ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    elif jt == JointType.REVOLUTE:
      th = q[qa]
      RJ = _rodrigues(sd.axis[i], jnp.cos(th), jnp.sin(th))
      EJ = _mT(RJ)
      rJ = (0.0, 0.0, 0.0)
      Srows = [(sd.axis[i], (0.0, 0.0, 0.0))]
      vJ = (_vscale(u[va], sd.axis[i]), (0.0, 0.0, 0.0))
      cJ = ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    else:  # PRISMATIC
      d = q[qa]
      EJ = _I3
      rJ = _vscale(d, sd.axis[i])
      Srows = [((0.0, 0.0, 0.0), sd.axis[i])]
      vJ = ((0.0, 0.0, 0.0), _vscale(u[va], sd.axis[i]))
      cJ = ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    # Xup = compose(X_J, X_tree): E = EJ @ Xr^T; r = Xp + Xr @ rJ
    Eup = _mm(EJ, XrT)
    rup = _vadd(Xp, _mv(Xr, rJ))
    EupL[i], rupL[i] = Eup, rup
    Sbody[i] = Srows
    vJs[i], cJs[i] = vJ, cJ
    p = sd.parent[i]
    if p < 0:
      E0[i], r0[i] = Eup, rup
      vbody[i] = vJ
    else:
      E0[i] = _mm(Eup, E0[p])
      r0[i] = _vadd(r0[p], _mTv(E0[p], rup))
      vbody[i] = _vadd6(_xf_motion(Eup, rup, vbody[p]), vJ)
    for k, srow in enumerate(Srows):
      Sw[va + k] = _xf_motion_inv(E0[i], r0[i], srow)

  # RNEA with qdd = 0: bias h
  g = sd.gravity
  a_base = ((0.0, 0.0, 0.0), (-g[0], -g[1], -g[2]))
  a = [None] * nb
  f = [None] * nb
  for i in range(nb):
    p = sd.parent[i]
    ap = a_base if p < 0 else a[p]
    a[i] = _vadd6(_xf_motion(EupL[i], rupL[i], ap), cJs[i],
                  _cross_motion(vbody[i], vJs[i]))
    Iv = _I_mul(sd.I6[i], vbody[i])
    f[i] = _vadd6(_I_mul(sd.I6[i], a[i]), _cross_force(vbody[i], Iv))

  h = [0.0] * nv
  for i in reversed(range(nb)):
    va = sd.v_adr[i]
    fn, fl = f[i]
    for k, (sw, sv) in enumerate(Sbody[i]):
      h[va + k] = _add2(_dot(sw, fn), _dot(sv, fl))
    p = sd.parent[i]
    if p >= 0:
      f[p] = _vadd6(f[p], _xf_force_inv(EupL[i], rupL[i], f[i]))

  return E0, r0, Rquat, Sw, h, EupL, rupL, Sbody


def _emit_crba(sd: _StaticData, EupL, rupL, Sbody, D_diag):
  """Composite-rigid-body mass matrix (+ implicit-PD dt*diag(D)) as a dense
  python matrix of scalars (static zeros elided)."""
  nb, nv = sd.nb, sd.nv
  Ic = [sd.I6[i] for i in range(nb)]
  M = [[0.0] * nv for _ in range(nv)]

  def set_sym(i, j, val):
    M[i][j] = val
    if i != j:
      M[j][i] = val

  for i in reversed(range(nb)):
    p = sd.parent[i]
    if p >= 0:
      E, r = EupL[i], rupL[i]
      # Xm = [[E, 0], [-E r~, E]] (motion transform of Xup); congruence
      # Xm^T Ic Xm accumulates the child composite into the parent
      nEr = tuple(tuple(_neg(x) for x in row) for row in _mm(E, _skew(r)))
      Xm = (E, _Z3, nEr, E)
      Ic[p] = _b_add(Ic[p], _b_mm(_b_T(Xm), _b_mm(Ic[i], Xm)))
    va = sd.v_adr[i]
    nd = len(Sbody[i])
    # F_k = Ic_i @ S_k ; diag block M[va+k, va+l] = S_l . F_k
    Fs = [_I_mul(Ic[i], Sbody[i][k]) for k in range(nd)]
    for k in range(nd):
      for l in range(k, nd):
        sw, sv = Sbody[i][l]
        set_sym(va + k, va + l, _add2(_dot(sw, Fs[k][0]), _dot(sv, Fs[k][1])))
    # walk ancestors: F <- Xm^T F; off-diag blocks
    for k in range(nd):
      Fc = Fs[k]
      j = i
      while sd.parent[j] >= 0:
        Fc = _xf_force_inv(EupL[j], rupL[j], Fc)
        j = sd.parent[j]
        vb = sd.v_adr[j]
        for l, (sw, sv) in enumerate(Sbody[j]):
          set_sym(va + k, vb + l, _add2(_dot(sw, Fc[0]), _dot(sv, Fc[1])))

  for j in range(nv):
    if not (_is_c(D_diag[j]) and D_diag[j] == 0.0):
      M[j][j] = _add2(M[j][j], _mul(sd.dt, D_diag[j]))
  return M


def _emit_chol(nv: int, M):
  """Dense lower Cholesky over scalar entries; returns (L, invdiag)."""
  L = [[0.0] * nv for _ in range(nv)]
  invd = [None] * nv
  for k in range(nv):
    acc = M[k][k]
    for j in range(k):
      acc = _sub(acc, _mul(L[k][j], L[k][j]))
    dk = jnp.sqrt(acc)
    L[k][k] = dk
    invd[k] = 1.0 / dk
    for i in range(k + 1, nv):
      s = M[i][k]
      for j in range(k):
        s = _sub(s, _mul(L[i][j], L[k][j]))
      L[i][k] = _mul(invd[k], s)
  return L, invd


def _emit_hm_probe(hm: _HmStatic, P, ox, oy, ca, r: float, S, dtype):
  """Scalar port of heightmap._point_contact against the patch operand.

  P is the list of patch rows (patch[a, b] = P[a*pry + b], each shape S);
  (ox, oy) the patch origin's world coords. Returns (pos3, nrm3, depth, act)
  with the identical sample order, gating, and best-candidate selection as
  the full-field march (r > 0: 4 directions x 4 fractions; r == 0: single
  sample). Height gathers run as shifted one-hot rowsums over the patch —
  every march sample reuses the slot's (prx + pry) index one-hots and the
  cross-pattern neighborhood N[(di, dj)], so the per-sample cost is O(span)
  selects instead of O(prx*pry) gathers."""
  prx, pry = hm.prx, hm.pry
  dx, dy = hm.dx, hm.dy
  npatch = prx * pry
  px, py, pz = (_asvec(c, S, dtype) for c in ca)
  fx = (px - ox) / dx
  fy = (py - oy) / dy
  i = jnp.clip(jnp.floor(fx), 0.0, prx - 2.0)
  j = jnp.clip(jnp.floor(fy), 0.0, pry - 2.0)
  u = jnp.clip(fx - i, 0.0, 1.0)
  v = jnp.clip(fy - j, 0.0, 1.0)

  span_x = max(1, int(np.ceil(r / dx))) if r > 0.0 else 0
  span_y = max(1, int(np.ceil(r / dy))) if r > 0.0 else 0
  dis = list(range(-span_x, span_x + 2)) if r > 0.0 else [0, 1]
  djs = list(range(-span_y, span_y + 2)) if r > 0.0 else [0, 1]
  # cross pattern: x-march samples shift only di, y-march only dj
  keys = [(di, dj) for di in dis for dj in djs
          if dj in (0, 1) or di in (0, 1)]

  ohx = [(i == float(a)).astype(dtype) for a in range(prx - 1)]
  ohy = [(j == float(b)).astype(dtype) for b in range(pry - 1)]
  colsel = {}
  for dj in sorted({dj for _, dj in keys}):
    col = []
    for a in range(prx):
      acc = 0.0
      for b in range(pry - 1):
        idx = a * pry + b + dj
        # out-of-range entries are never selected (the march can only step
        # past the patch border where the full-field clip pins the index);
        # substitute any finite value so the zero-weighted term is benign
        pv = P[idx] if 0 <= idx < npatch else P[0]
        acc = _add2(acc, _mul(ohy[b], pv))
      col.append(acc)
    colsel[dj] = col
  N = {}
  for di, dj in keys:
    acc = 0.0
    for a in range(prx - 1):
      aa = a + di
      cv = colsel[dj][aa] if 0 <= aa < prx else colsel[dj][0]
      acc = _add2(acc, _mul(ohx[a], cv))
    N[(di, dj)] = acc

  def tri(h00, h10, h01, h11, uu, vv):
    """Mirror heightmap.surface_at's triangle-plane evaluation."""
    lower = (uu + vv) <= 1.0
    z_low = h00 + uu * (h10 - h00) + vv * (h01 - h00)
    z_up = h11 + (1.0 - uu) * (h01 - h11) + (1.0 - vv) * (h10 - h11)
    z = jnp.where(lower, z_low, z_up)
    gx = jnp.where(lower, h10 - h00, h11 - h01) / dx
    gy = jnp.where(lower, h01 - h00, h11 - h10) / dy
    norm = jnp.sqrt(gx * gx + gy * gy + 1.0 + 1e-18)
    return z, (-gx / norm, -gy / norm, 1.0 / norm)

  def inside_at(qx, qy):
    # float 0/1 mask (Mosaic's vector select on i1 operands does not lower —
    # "Unsupported target bitwidth for truncation" — so inside-ness stays in
    # float all the way through the best-candidate updates)
    fxf = (qx - hm.x_min) / dx
    fyf = (qy - hm.y_min) / dy
    return ((fxf >= 0.0).astype(dtype) * (fxf <= hm.nx - 1.0).astype(dtype)
            * (fyf >= 0.0).astype(dtype) * (fyf <= hm.ny - 1.0).astype(dtype))

  z_c, n_c = tri(N[(0, 0)], N[(1, 0)], N[(0, 1)], N[(1, 1)], u, v)
  depth = r - n_c[2] * (pz - z_c)
  inside = inside_at(px, py)
  if r == 0.0:
    return (px, py, pz), n_c, depth, (depth > 0).astype(dtype) * inside

  best_d, best_n, best_in = depth, n_c, inside
  for oxd, oyd in ((1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0)):
    ndir = (-oxd, -oyd, 0.0)
    for f in (0.25, 0.5, 0.75, 1.0):
      qx = px + oxd * (f * r) if oxd != 0.0 else px
      qy = py + oyd * (f * r) if oyd != 0.0 else py
      if oyd == 0.0:                       # x-march: j, v unchanged (bitwise)
        fx_s = (qx - ox) / dx
        i_s = jnp.clip(jnp.floor(fx_s), 0.0, prx - 2.0)
        u_s = jnp.clip(fx_s - i_s, 0.0, 1.0)
        sel = [(i_s == i + float(d)).astype(dtype)
               for d in range(-span_x, span_x + 1)]
        pick = lambda dj: (
            _add(*[_mul(sel[k], N[(d, dj)])
                   for k, d in enumerate(range(-span_x, span_x + 1))]),
            _add(*[_mul(sel[k], N[(d + 1, dj)])
                   for k, d in enumerate(range(-span_x, span_x + 1))]))
        h00, h10 = pick(0)
        h01, h11 = pick(1)
        z_k, n_k = tri(h00, h10, h01, h11, u_s, v)
      else:                                # y-march: i, u unchanged
        fy_s = (qy - oy) / dy
        j_s = jnp.clip(jnp.floor(fy_s), 0.0, pry - 2.0)
        v_s = jnp.clip(fy_s - j_s, 0.0, 1.0)
        sel = [(j_s == j + float(d)).astype(dtype)
               for d in range(-span_y, span_y + 1)]
        pick = lambda di: (
            _add(*[_mul(sel[k], N[(di, d)])
                   for k, d in enumerate(range(-span_y, span_y + 1))]),
            _add(*[_mul(sel[k], N[(di, d + 1)])
                   for k, d in enumerate(range(-span_y, span_y + 1))]))
        h00, h01 = pick(0)
        h10, h11 = pick(1)
        z_k, n_k = tri(h00, h10, h01, h11, u, v_s)
      in_k = inside_at(qx, qy)
      d_k = _dot(n_k, _vsub((px, py, pz), (qx, qy, z_k)))
      dep_plane = jnp.where(n_k[2] < 0.77, r - d_k, -1.0)
      dep_wall = jnp.where(z_k > pz, r - f * r, -1.0)
      use_plane = dep_plane >= dep_wall
      dep_k = jnp.maximum(dep_plane, dep_wall)
      n_cand = tuple(jnp.where(use_plane, _asvec(n_k[k], S, dtype),
                               _asvec(ndir[k], S, dtype)) for k in range(3))
      better = dep_k > best_d
      best_d = jnp.where(better, dep_k, best_d)
      best_n = tuple(jnp.where(better, n_cand[k],
                               _asvec(best_n[k], S, dtype)) for k in range(3))
      best_in = jnp.where(better, in_k, best_in)
  pos = _vsub((px, py, pz), _vscale(r, best_n))
  return pos, best_n, best_d, (best_d > 0).astype(dtype) * best_in


def _step_kernel(q_ref, u_ref, tau_ref, pd_ref, *refs, sd: _StaticData,
                 tile: int, pack: int):
  """One batch tile: the full physics step in VMEM (see module docstring).

  `pack` > 1 puts `pack` worlds on the SUBLANE axis of every per-world
  "scalar" — shape (pack, tile) instead of (tile,) — so each VPU
  instruction processes pack*tile worlds instead of tile. The kernel body
  is shape-generic; only S below changes.

  When the scene has a heightmap (sd.hm), one extra input ref carries the
  per-world terrain patch + origin (see _HmStatic) between pd_ref and the
  outputs."""
  if sd.hm is not None:
    hm_ref, qo_ref, uo_ref, jt_scr, wt_scr, lam_scr, z_scr = refs
  else:
    hm_ref = None
    qo_ref, uo_ref, jt_scr, wt_scr, lam_scr, z_scr = refs
  S = (pack, tile) if pack > 1 else (tile,)
  dtype = jnp.float32
  nv, nq, nb = sd.nv, sd.nq, sd.nb
  dt = sd.dt

  q = [q_ref[i] for i in range(nq)]
  u = [u_ref[i] for i in range(nv)]
  if sd.hm is not None:
    npatch = sd.hm.prx * sd.hm.pry
    nroots = len(sd.hm.roots)
    hm_P = {r: [hm_ref[ri * npatch + k] for k in range(npatch)]
            for ri, r in enumerate(sd.hm.roots)}
    hm_org = {r: (hm_ref[nroots * npatch + 2 * ri],
                  hm_ref[nroots * npatch + 2 * ri + 1])
              for ri, r in enumerate(sd.hm.roots)}

    def hm_root_of(b):
      while sd.parent[b] >= 0:
        b = sd.parent[b]
      return b

  # ---- A. actuation: feedforward + implicit PD, clamp (mirror _assemble_rows)
  tau = [0.0] * nv
  D_diag = [0.0] * nv
  for j in range(nv):
    t = _mul(sd.actuated[j], tau_ref[j])
    if sd.use_pd:
      if sd.actuated[j] != 0.0 and sd.jmask[j] != 0.0:
        t = _add2(t, _mul(sd.kp[j] * sd.actuated[j],
                          _sub(pd_ref[j], q[sd.jidx[j]])))
      D_diag[j] = sd.kd[j] * sd.actuated[j]
    tl = sd.torque_limit[j]
    if not _is_c(t):
      t = jnp.clip(t, -tl, tl)
    tau[j] = t

  # ---- B/C. FK + RNEA ----
  E0, r0, Rquat, Sw, h, EupL, rupL, Sbody = _emit_fk_rnea(sd, q, u)

  # ---- D. CRBA + Cholesky ----
  M = _emit_crba(sd, EupL, rupL, Sbody, D_diag)
  L, invd = _emit_chol(nv, M)

  # ---- E. contact + limit rows (static plane frames t1=+y, t2=-x, n=+z,
  #      matching pipeline._tangent_frames for n = z) ----
  ncone = len(sd.slots)
  nlim = len(sd.limits)
  Jrows = [dict() for _ in range(3 * ncone + nlim)]   # row -> {dof: scalar}
  bias = [0.0] * (3 * ncone + nlim)
  act = [None] * (ncone + nlim)
  mu_stat = [0.0] * ncone

  def _body_pose(b):
    """(R body->world, p) — static identities for b = -1 (world geoms)."""
    if b < 0:
      return _I3, (0.0, 0.0, 0.0)
    return _mT(E0[b]), r0[b]

  def _runtime_frame(n):
    """Branchless (t1, t2) for runtime unit normal n — the exact scalar port
    of pipeline._tangent_frames (parity with the phase-split path)."""
    ax = tuple(jnp.abs(_asvec(c, S, dtype)) for c in n)
    pick_x = (ax[0] <= ax[1]) & (ax[0] <= ax[2])
    pick_y = (~pick_x) & (ax[1] <= ax[2])
    fx = pick_x.astype(dtype)
    fy = pick_y.astype(dtype)
    a = (fx, fy, 1.0 - fx - fy)
    t1 = _cross(n, a)
    inv = jax.lax.rsqrt(_add(*[_mul(c, c) for c in t1]) + 1e-18)
    t1 = _vscale(inv, t1)
    return t1, _cross(n, t1)

  hm_frames = {}    # (body, b_pos, b_rot, he) -> shared downhill probe frame
  hm_mesh_cache = {}  # mesh idx -> 4 selected (pos, nrm, depth, act)
  for s_i, slot in enumerate(sd.slots):
    ba = slot.body_a
    Ra, pa_ = _body_pose(ba)
    ca = _vadd(pa_, _mv(Ra, slot.local))         # A feature point/center, world

    valid = None                                 # default: depth > 0
    if slot.kind == "plane_pt":
      depth = _sub(slot.plane_h + slot.radius, ca[2])
      pos = (ca[0], ca[1], _sub(ca[2], slot.radius))
      # static frame for n = +z (matches _tangent_frames): t1=+y, t2=-x
      t1, t2, nrm = (0.0, 1.0, 0.0), (-1.0, 0.0, 0.0), (0.0, 0.0, 1.0)
      cmap = {j: 1.0 for j in sd.anc_dofs[ba]}
    elif slot.kind == "hm_pt":
      rt = hm_root_of(ba)
      pos, nrm, depth, valid = _emit_hm_probe(
          sd.hm, hm_P[rt], *hm_org[rt], ca, slot.radius, S, dtype)
      t1, t2 = _runtime_frame(nrm)
      cmap = {j: 1.0 for j in sd.anc_dofs[ba]}
    elif slot.kind in ("hm_cylpt", "hm_conept"):
      # runtime downhill-frame rim/apex probes — exact scalar port of
      # heightmap._cylinder_hm / _cone_hm; the (u, w, axis) frame is shared
      # by a geom's 6 (resp. 4) slots via the cache
      key = (ba, slot.b_pos, slot.b_rot, slot.he)
      if key not in hm_frames:
        Rg = _mm(Ra, slot.b_rot)
        pg = _vadd(pa_, _mv(Ra, slot.b_pos))
        aax = tuple(Rg[k][2] for k in range(3))
        a2 = aax[2]
        radial = (_neg(_mul(a2, aax[0])), _neg(_mul(a2, aax[1])),
                  _sub(1.0, _mul(a2, a2)))
        rn = jnp.sqrt(_asvec(_add(*[_mul(c, c) for c in radial]), S, dtype))
        degen = rn < 1e-6
        denom = jnp.where(degen, 1.0, rn)
        u0 = tuple(jnp.where(degen, _asvec(Rg[k][0], S, dtype),
                             _asvec(_neg(radial[k]), S, dtype) / denom)
                   for k in range(3))
        un = jnp.sqrt(_add(*[_mul(c, c) for c in u0]) + 1e-18)
        uu = tuple(u0[k] / un for k in range(3))
        hm_frames[key] = (pg, aax, uu, _cross(aax, uu))
      pg, aax, uu, ww = hm_frames[key]
      rg, hg = slot.he[0], slot.he[1]
      if slot.kind == "hm_cylpt":
        s_sign, phi = slot.local[0], slot.local[1]
        cc = _vadd(pg, _vscale(s_sign * hg, aax))
        dvec = _vadd(_vscale(float(np.cos(phi)), uu),
                     _vscale(float(np.sin(phi)), ww))
        pt = _vadd(cc, _vscale(rg, dvec))
      elif slot.local[0] == 0.0:                       # cone apex
        pt = _vadd(pg, _vscale(0.75 * hg, aax))
      else:                                            # cone base rim
        phi = slot.local[1]
        base_c = _vadd(pg, _vscale(-0.25 * hg, aax))
        dvec = _vadd(_vscale(float(np.cos(phi)), uu),
                     _vscale(float(np.sin(phi)), ww))
        pt = _vadd(base_c, _vscale(rg, dvec))
      rt = hm_root_of(ba)
      pos, nrm, depth, valid = _emit_hm_probe(
          sd.hm, hm_P[rt], *hm_org[rt], pt, 0.0, S, dtype)
      t1, t2 = _runtime_frame(nrm)
      cmap = {j: 1.0 for j in sd.anc_dofs[ba]}
    elif slot.kind == "hm_mesh":
      # 4 deepest hull-vertex probes, selected in-kernel by a 4-pass
      # first-match max sweep (mirrors _mesh_hm's masked lax.top_k: equal
      # depths resolve to the LOWER vertex index — XLA top_k's stable order)
      mi, k_out = int(slot.local[0]), int(slot.local[1])
      if mi not in hm_mesh_cache:
        mb, mverts, vc = sd.hm_meshes[mi]
        rt = hm_root_of(mb)
        probes = []
        for v in mverts:
          vw = _vadd(pa_, _mv(Ra, v))
          probes.append(_emit_hm_probe(sd.hm, hm_P[rt], *hm_org[rt], vw,
                                       0.0, S, dtype))
        dcur = [_asvec(p[2], S, dtype) for p in probes]
        sel = []
        for _pass in range(4):
          dmax = dcur[0]
          for i in range(1, vc):
            dmax = jnp.maximum(dmax, dcur[i])
          any_prev = jnp.zeros(S, dtype)
          pk = [jnp.zeros(S, dtype) for _ in range(3)]
          nk = [jnp.zeros(S, dtype) for _ in range(3)]
          dk = jnp.zeros(S, dtype)
          ak = jnp.zeros(S, dtype)
          for i in range(vc):
            c = (dcur[i] == dmax).astype(dtype) * (1.0 - any_prev)
            any_prev = any_prev + c
            for a3 in range(3):
              pk[a3] = pk[a3] + c * _asvec(probes[i][0][a3], S, dtype)
              nk[a3] = nk[a3] + c * _asvec(probes[i][1][a3], S, dtype)
            dk = dk + c * dcur[i]
            ak = ak + c * _asvec(probes[i][3], S, dtype)
            dcur[i] = jnp.where(c > 0.5, jnp.full(S, -3e38, dtype), dcur[i])
          sel.append((tuple(pk), tuple(nk), dk, ak))
        hm_mesh_cache[mi] = sel
      pos, nrm, depth, valid = hm_mesh_cache[mi][k_out]
      t1, t2 = _runtime_frame(nrm)
      cmap = {j: 1.0 for j in sd.anc_dofs[ba]}
    elif slot.kind in ("ss", "sc"):
      Rb, pb_ = _body_pose(slot.body_b)
      if slot.kind == "sc":
        # scalar port of collision._sphere_capsule: clamp the sphere center
        # onto the capsule segment, then sphere-vs-endpoint-sphere
        Rg = _mm(Rb, slot.b_rot)
        pg = _vadd(pb_, _mv(Rb, slot.b_pos))
        axis = tuple(Rg[k][2] for k in range(3))
        hl = slot.he[1]
        t_ = jnp.clip(_asvec(_dot(_vsub(ca, pg), axis), S, dtype), -hl, hl)
        cb = _vadd(pg, _vscale(t_, axis))
      else:
        cb = _vadd(pb_, _mv(Rb, slot.b_pos))
      d = _vsub(ca, cb)
      dist = jnp.sqrt(_add(*[_mul(c, c) for c in d]) + 1e-18)
      nrm = _vscale(1.0 / dist, d)
      depth = _sub(slot.radius + slot.rb, dist)
      pos = _vadd(cb, _vscale(_sub(slot.rb, 0.5 * depth), nrm))
      t1, t2 = _runtime_frame(nrm)
      cmap = {j: 1.0 for j in sd.anc_dofs[ba]} if ba >= 0 else {}
      if slot.body_b >= 0:
        for j in sd.anc_dofs[slot.body_b]:
          cmap[j] = cmap.get(j, 0.0) - 1.0
      cmap = {j: c for j, c in cmap.items() if c != 0.0}
    else:  # "sb" — scalar port of collision._sphere_box
      Rbw, pbw = _body_pose(slot.body_b)
      Rb = _mm(Rbw, slot.b_rot)
      pb_ = _vadd(pbw, _mv(Rbw, slot.b_pos))
      cl = _mTv(Rb, _vsub(ca, pb_))              # sphere center, box frame
      he = slot.he
      clamped = tuple(jnp.clip(_asvec(cl[k], S, dtype), -he[k], he[k])
                      for k in range(3))
      delta = _vsub(cl, clamped)
      dist = jnp.sqrt(_add(*[_mul(c, c) for c in delta]) + 1e-18)
      outside = dist > 1e-9
      n_out = _vscale(1.0 / dist, delta)
      fp = tuple(_sub(he[k], jnp.abs(_asvec(cl[k], S, dtype)))
                 for k in range(3))
      is0 = (fp[0] <= fp[1]) & (fp[0] <= fp[2])  # argmin, first-match
      is1 = (~is0) & (fp[1] <= fp[2])
      ind = (is0.astype(dtype), is1.astype(dtype),
             1.0 - is0.astype(dtype) - is1.astype(dtype))
      fp_k = _add(*[_mul(ind[k], fp[k]) for k in range(3)])
      sgn = tuple(jnp.where(_asvec(cl[k], S, dtype) >= 0.0, 1.0, -1.0)
                  for k in range(3))
      n_in = tuple(_mul(sgn[k], ind[k]) for k in range(3))
      n_local = tuple(jnp.where(outside, _asvec(n_out[k], S, dtype), n_in[k])
                      for k in range(3))
      depth = jnp.where(outside, _asvec(_sub(slot.radius, dist), S, dtype),
                        _asvec(_add2(slot.radius, fp_k), S, dtype))
      surf = tuple(jnp.where(outside, _asvec(clamped[k], S, dtype),
                             _asvec(_add2(cl[k], _mul(n_in[k], fp_k)), S,
                                    dtype))
                   for k in range(3))
      nrm = _mv(Rb, n_local)
      pos = _vadd(pb_, _mv(Rb, surf))
      t1, t2 = _runtime_frame(nrm)
      cmap = {j: 1.0 for j in sd.anc_dofs[ba]} if ba >= 0 else {}
      if slot.body_b >= 0:
        for j in sd.anc_dofs[slot.body_b]:
          cmap[j] = cmap.get(j, 0.0) - 1.0
      cmap = {j: c for j, c in cmap.items() if c != 0.0}

    act[s_i] = (valid if valid is not None else (depth > 0)).astype(dtype)
    mu_stat[s_i] = slot.mu
    r_t1, r_t2, r_n = 3 * s_i, 3 * s_i + 1, 3 * s_i + 2
    vn_pre = 0.0
    for j, cj in cmap.items():
      ang, lin = Sw[j][0], Sw[j][1]
      col = _vscale(cj, _vadd(lin, _cross(ang, pos)))
      Jrows[r_t1][j] = _dot(col, t1)
      Jrows[r_t2][j] = _dot(col, t2)
      Jrows[r_n][j] = _dot(col, nrm)
      vn_pre = _add2(vn_pre, _mul(_dot(col, nrm), u[j]))
    b_baum = jnp.minimum(
        sd.erp * jnp.maximum(depth - sd.slop, 0.0) / dt, sd.max_corr)
    if slot.e > 0.0:
      b_rest = jnp.where(vn_pre < -slot.thresh, -slot.e * vn_pre, 0.0)
      bias[r_n] = jnp.maximum(b_rest, b_baum)
    else:
      bias[r_n] = b_baum

  for k, lim in enumerate(sd.limits):
    row = 3 * ncone + k
    q_pred = _add2(q[lim.qadr], _mul(dt, u[lim.vadr]))
    near_hi = q_pred > lim.hi
    near_lo = q_pred < lim.lo
    s = jnp.where(near_hi, -1.0, 1.0).astype(dtype)
    viol = jnp.maximum(lim.lo - q_pred, q_pred - lim.hi)
    bias[row] = jnp.clip(sd.erp * jnp.maximum(viol, 0.0) / dt, 0.0, sd.max_corr)
    act[ncone + k] = (near_lo | near_hi).astype(dtype)
    Jrows[row][lim.vadr] = s

  # ---- F. triangular solves: columns = W rows (J M^-1) + v_free rhs ----
  # jt_scr (nv, nrp, T) holds the RHS matrix [J^T | rhs0] dof-major; the
  # subs run in place with (nrp, T)-slab FMAs (one per L entry), then the
  # result transposes into wt_scr rows for the Gauss-Seidel z updates.
  rhs0 = [_sub(_sub(tau[j], h[j]), _mul(D_diag[j], u[j])) for j in range(nv)]
  nw, nrp = sd.n_wrows, sd.nrp
  vf_col = nw

  jt_scr[...] = jnp.zeros_like(jt_scr)
  for row in range(nw):
    for j, val in Jrows[row].items():
      jt_scr[j, row] = _asvec(val, S, dtype)
  for j in range(nv):
    jt_scr[j, vf_col] = _asvec(rhs0[j], S, dtype)

  def rowmul(x, s):
    # (n, T) * per-lane scalar; s may be (T,), 0-d (all-static model entries
    # collapse to traced scalars), or a python float
    if _is_c(s) or getattr(s, "ndim", 1) == 0:
      return x * s
    return x * s[None]

  for i in range(nv):                    # forward: L y = rhs
    acc = jt_scr[i]
    for j in range(i):
      if not (_is_c(L[i][j]) and L[i][j] == 0.0):
        acc = acc - rowmul(jt_scr[j], L[i][j])
    jt_scr[i] = rowmul(acc, invd[i])
  for i in reversed(range(nv)):          # backward: L^T x = y
    acc = jt_scr[i]
    for j in range(i + 1, nv):
      if not (_is_c(L[j][i]) and L[j][i] == 0.0):
        acc = acc - rowmul(jt_scr[j], L[j][i])
    jt_scr[i] = rowmul(acc, invd[i])

  vf = [_add2(u[j], _mul(dt, jt_scr[j, vf_col])) for j in range(nv)]

  wt_scr[...] = jnp.zeros_like(wt_scr)
  for row in range(nw):
    for j in range(nv):
      wt_scr[row, j] = jt_scr[j, row]

  # ---- G. hoisted GS invariants ----
  Gii_all, ci0_all = [], []
  for i in range(ncone):
    g = {}
    for a in range(3):
      for bb in range(a, 3):
        tot = 0.0
        for j, val in Jrows[3 * i + a].items():
          tot = _add2(tot, _mul(val, wt_scr[3 * i + bb, j]))
        g[(a, bb)] = _asvec(tot, S, dtype)
    Gii_all.append((g[(0, 0)], g[(0, 1)], g[(0, 2)],
                    g[(1, 1)], g[(1, 2)], g[(2, 2)]))
    ci0 = []
    for a in range(3):
      tot = _neg(bias[3 * i + a])
      for j, val in Jrows[3 * i + a].items():
        tot = _add2(tot, _mul(val, vf[j]))
      ci0.append(_asvec(tot, S, dtype))
    ci0_all.append(tuple(ci0))
  lim_g, lim_ci0 = [], []
  for k in range(nlim):
    row = 3 * ncone + k
    j = sd.limits[k].vadr
    sval = Jrows[row][j]
    # G_rr = J_row . W_row = s * (s * Minv_jj) = Minv_jj (W already carries s)
    lim_g.append(_mul(sval, wt_scr[row, j]))
    lim_ci0.append(_sub(_mul(sval, vf[j]), bias[row]))

  # ---- H. matrix-free Gauss-Seidel cone solve (mirror pallas_contact) ----
  ncp = sd.ncp
  iota_nc = jax.lax.broadcasted_iota(jnp.int32, (ncp,) + S, 0)
  onehots = [(iota_nc == i).astype(dtype) for i in range(ncone + nlim)]
  keeps = [1.0 - oh for oh in onehots]
  lam_scr[...] = jnp.zeros_like(lam_scr)
  z_scr[...] = jnp.zeros_like(z_scr)
  mu_vecs = [jnp.full(S, m, dtype) for m in mu_stat]

  def sweep_body(_, carry):
    for i in range(ncone):
      g = Gii_all[i]
      oh, keep = onehots[i], keeps[i]
      li = tuple(jnp.sum(lam_scr[a] * oh, axis=0) for a in range(3))
      g_mat = ((g[0], g[1], g[2]), (g[1], g[3], g[4]), (g[2], g[4], g[5]))
      ci = []
      for a in range(3):
        diag_a = (g_mat[a][0] * li[0] + g_mat[a][1] * li[1]
                  + g_mat[a][2] * li[2])
        jz = 0.0
        for j in Jrows[3 * i + a]:
          jz = _add2(jz, _mul(Jrows[3 * i + a][j], z_scr[j]))
        ci.append(ci0_all[i][a] + jz - diag_a)
      ln = _cone_solve_vec(g, tuple(ci), mu_vecs[i], sd.n_grid, dtype)
      dz = jnp.zeros_like(z_scr[...])
      for a in range(3):
        la = ln[a] * act[i]
        dz = dz + wt_scr[3 * i + a] * (la - li[a])[None]
        lam_scr[a] = lam_scr[a] * keep + oh * la[None]
      z_scr[...] = z_scr[...] + dz
    for k in range(nlim):
      i = ncone + k
      row = 3 * ncone + k
      oh, keep = onehots[i], keeps[i]
      jdof = sd.limits[k].vadr
      li2 = jnp.sum(lam_scr[2] * oh, axis=0)
      jz = _mul(Jrows[row][jdof], z_scr[jdof])
      c2 = lim_ci0[k] + jz - lim_g[k] * li2
      ln2 = jnp.maximum(-c2 / (lim_g[k] + 1e-20), 0.0) * act[i]
      z_scr[...] = z_scr[...] + wt_scr[row] * (ln2 - li2)[None]
      lam_scr[2] = lam_scr[2] * keep + oh * ln2[None]
    return carry

  if ncone + nlim:
    jax.lax.fori_loop(0, sd.sweeps, sweep_body, 0)

  # ---- I. integrate (mirror dynamics.integrate_q) ----
  u_new = [_add2(vf[j], z_scr[j]) for j in range(nv)]
  qo_ref[...] = jnp.zeros_like(qo_ref)
  uo_ref[...] = jnp.zeros_like(uo_ref)
  for j in range(nv):
    uo_ref[j] = _asvec(u_new[j], S, dtype)
  for i in range(nb):
    jt = sd.joint_types[i]
    qa, va = sd.q_adr[i], sd.v_adr[i]
    if jt == JointType.FREE:
      quat, R = Rquat[i]
      for k in range(3):
        qo_ref[qa + k] = _asvec(
            _add2(q[qa + k], _mul(dt, u_new[va + 3 + k])), S, dtype)
      w_w = _mv(R, (u_new[va], u_new[va + 1], u_new[va + 2]))
      wdt = _vscale(dt, w_w)
      ang2 = _add(*[_mul(x, x) for x in wdt])
      angle = jnp.sqrt(ang2 + 1e-32)
      half = 0.5 * angle
      sinc_half = jnp.where(ang2 > 1e-16, jnp.sin(half) / angle,
                            0.5 - ang2 / 48.0)
      dq = (jnp.cos(half), sinc_half * wdt[0], sinc_half * wdt[1],
            sinc_half * wdt[2])
      w1, x1, y1, z1 = dq
      w2, x2, y2, z2 = quat
      qn = (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)
      norm = jax.lax.rsqrt(qn[0] * qn[0] + qn[1] * qn[1] + qn[2] * qn[2]
                           + qn[3] * qn[3] + 1e-12)
      for k in range(4):
        qo_ref[qa + 3 + k] = _asvec(qn[k] * norm, S, dtype)
    elif jt == JointType.SPHERICAL:
      quat, R = Rquat[i]
      w_w = _mv(R, (u_new[va], u_new[va + 1], u_new[va + 2]))
      wdt = _vscale(dt, w_w)
      ang2 = _add(*[_mul(x, x) for x in wdt])
      angle = jnp.sqrt(ang2 + 1e-32)
      half = 0.5 * angle
      sinc_half = jnp.where(ang2 > 1e-16, jnp.sin(half) / angle,
                            0.5 - ang2 / 48.0)
      dq = (jnp.cos(half), sinc_half * wdt[0], sinc_half * wdt[1],
            sinc_half * wdt[2])
      w1, x1, y1, z1 = dq
      w2, x2, y2, z2 = quat
      qn = (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)
      norm = jax.lax.rsqrt(qn[0] * qn[0] + qn[1] * qn[1] + qn[2] * qn[2]
                           + qn[3] * qn[3] + 1e-12)
      for k in range(4):
        qo_ref[qa + k] = _asvec(qn[k] * norm, S, dtype)
    else:
      qo_ref[qa] = _asvec(_add2(q[qa], _mul(dt, u_new[va])), S, dtype)


def _asvec(x, S, dtype):
  """Materialize a scalar (python float, 0-d, or S-shaped value) as shape S."""
  if _is_c(x):
    return jnp.full(S, x, dtype)
  if x.ndim < len(S):
    return jnp.broadcast_to(x.astype(dtype), S)
  return x


# ---------------------------------------------------------------------------
# Public wrappers
# ---------------------------------------------------------------------------


def build_fused_step_lane(scene, config=None, use_pd: bool = True,
                          tile: int = 128, pack: int = 1):
  """Build the lane-major fused step: (qT, uT, tauT, pdT) -> (qT', uT').

  Arrays are (nqp,)+S+... with S = (tile,) for pack=1 or (pack, tile) for
  pack>1, batch laid out as (rows, [pack,] lanes) with Bp a multiple of
  pack*tile; `make_step_batch_fused` wraps it with the batch-major State
  interface. Returns (step_lane, sd).

  `pack` puts `pack` worlds on the SUBLANE axis of every per-world scalar:
  a (T,) value occupies 1/8 of an (8,128) VPU register, so pack=8 makes
  each emitted instruction process 8x the worlds for the same issue slots —
  measured as the dominant throughput lever once the step became VPU
  issue-bound (metrics/step_profile_r04.md). Costs pack x the VMEM scratch
  (~1.2 MB -> ~10 MB for the ANYmal scene at pack=8) and forces the batch
  to pad to pack*tile."""
  from raisimlib_tpu.ops import pipeline

  assert pack in (1, 2, 4, 8), pack
  config = config if config is not None else pipeline.StepConfig()
  sd = _analyze(scene, config, use_pd)
  nqp, nvp = _pad8(sd.nq), _pad8(sd.nv)
  kernel = functools.partial(_step_kernel, sd=sd, tile=tile, pack=pack)
  S = (pack, tile) if pack > 1 else (tile,)
  zeros = (0,) * len(S)

  nhmp = (_pad8(len(sd.hm.roots) * (sd.hm.prx * sd.hm.pry + 2))
          if sd.hm is not None else 0)

  def step_lane(qT, uT, tauT, pdT, hmT=None):
    # qT etc: (nrows,) + (pack, L) or (L,) with L a multiple of tile;
    # hmT (nhmp,) + ... carries the terrain patch + origin when sd.hm
    L = qT.shape[-1]
    assert L % tile == 0, (L, tile)
    assert (hmT is None) == (sd.hm is None)
    grid = (L // tile,)
    idx = lambda t: (0,) + zeros[:-1] + (t,)
    spec = lambda nrow: pl.BlockSpec((nrow,) + S, idx,
                                     memory_space=pltpu.VMEM)
    in_specs = [spec(nqp), spec(nvp), spec(nvp), spec(nvp)]
    ins = [qT, uT, tauT, pdT]
    if sd.hm is not None:
      in_specs.append(spec(nhmp))
      ins.append(hmT)
    return pl.pallas_call(
        kernel,
        interpret=(jax.default_backend() == "cpu"),
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec(nqp), spec(nvp)],
        out_shape=[jax.ShapeDtypeStruct((nqp,) + S[:-1] + (L,), jnp.float32),
                   jax.ShapeDtypeStruct((nvp,) + S[:-1] + (L,), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((sd.nv, sd.nrp) + S, jnp.float32),
            # max(1, .) guards the contact-free case (cartpole): zero-size
            # scratch blocks are not lowerable
            pltpu.VMEM((max(sd.n_wrows, 1), nvp) + S, jnp.float32),
            pltpu.VMEM((3, sd.ncp) + S, jnp.float32),
            pltpu.VMEM((nvp,) + S, jnp.float32),
        ],
    )(*ins)

  return step_lane, sd


def make_step_batch_fused(scene, config=None, use_pd: bool = True,
                          tile: int = 128, pack: int = 1):
  """Drop-in fused replacement for pipeline.step_batch on eligible scenes.

  Returns step(state, tau, pd_target, field_heights=None) -> State
  (pd_target ignored when use_pd=False). Forward runs the megakernel; the
  custom VJP re-derives gradients through the differentiable pure path
  (pipeline.step_batch), the same forward/backward split as
  ops/pallas_contact.solve_dynamics_batch. Raises FusedStepUnsupported for
  scenes outside the kernel's class.

  Heightmap scenes (round 5): `field_heights` (B, nx, ny) gives each world
  its own terrain (batched terrain scenarios); None uses the scene's field
  for every world. The wrapper slices a root-centered (prx, pry) patch per
  world outside the kernel (one vmapped dynamic_slice — bandwidth-trivial
  next to the step) and the kernel runs the full heightmap narrow phase
  including the riser march in-kernel.

  `pack` sublane-packs worlds (see build_fused_step_lane) — use 8 for
  large-batch throughput, 1 for small batches (B pads to pack*tile)."""
  from raisimlib_tpu.ops import pipeline
  from raisimlib_tpu.ops.integrator import State

  config = config if config is not None else pipeline.StepConfig()
  step_lane, sd = build_fused_step_lane(scene, config, use_pd, tile, pack)
  nqp, nvp = _pad8(sd.nq), _pad8(sd.nv)
  dt = sd.dt
  chunk = pack * tile
  hm = sd.hm
  nhmp = (_pad8(len(hm.roots) * (hm.prx * hm.pry + 2))
          if hm is not None else 0)

  def extract_patch(qb, heights):
    """(B, nq), (B, nx, ny) -> (B, n_roots*prx*pry + 2*n_roots): one
    root-centered patch per FREE root with field contacts, then the
    (ox, oy) origin pairs.

    Each slice runs as TWO one-hot batched matmuls instead of a vmapped
    dynamic_slice: B per-world 2-D gathers lower to lax.gather, which
    measured ~6.5k rollouts/s ALONE on the v5e (terrain_prof r5) — 16x
    slower than the entire fused physics step. One-hot selection rides the
    MXU (0/1 weights select exactly in the f32-matmul regime the package
    pins) at ~30k MACs/world/root, which is noise next to the step."""
    B = qb.shape[0]
    dtype = qb.dtype
    patches, origins = [], []
    for rq in hm.root_qs:
      fx = (qb[:, rq] - hm.x_min) / hm.dx
      fy = (qb[:, rq + 1] - hm.y_min) / hm.dy
      i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32) - (hm.prx // 2 - 1),
                    0, hm.nx - hm.prx)
      j0 = jnp.clip(jnp.floor(fy).astype(jnp.int32) - (hm.pry // 2 - 1),
                    0, hm.ny - hm.pry)
      i_idx = i0[:, None] + jnp.arange(hm.prx, dtype=jnp.int32)[None]
      j_idx = j0[:, None] + jnp.arange(hm.pry, dtype=jnp.int32)[None]
      ohx = (i_idx[:, :, None]
             == jnp.arange(hm.nx, dtype=jnp.int32)[None, None]).astype(dtype)
      ohy = (j_idx[:, :, None]
             == jnp.arange(hm.ny, dtype=jnp.int32)[None, None]).astype(dtype)
      rows = jnp.einsum("bpn,bnm->bpm", ohx, heights)    # (B, prx, ny)
      patch = jnp.einsum("bpm,bqm->bpq", rows, ohy)      # (B, prx, pry)
      patches.append(patch.reshape(B, -1))
      origins.append((hm.x_min + i0.astype(dtype) * hm.dx)[:, None])
      origins.append((hm.y_min + j0.astype(dtype) * hm.dy)[:, None])
    return jnp.concatenate(patches + origins, axis=1)

  def to_lane(x, nrow):
    xT = jnp.transpose(x, (1, 0))
    B = xT.shape[1]
    Bp = ((B + chunk - 1) // chunk) * chunk
    # pad lanes edge-replicated: pad worlds stay numerically benign (a zero
    # quaternion would feed garbage into the cone solve's case analysis)
    xT = jnp.pad(xT, ((0, nrow - xT.shape[0]), (0, Bp - B)), mode="edge")
    if pack > 1:
      xT = xT.reshape(nrow, pack, Bp // pack)
    return xT

  def from_lane(xo, nrows, B):
    if pack > 1:
      xo = xo.reshape(xo.shape[0], -1)
    return jnp.transpose(xo[:nrows, :B], (1, 0))

  def fused_raw(state, tau, pd, heights):
    B = state.q.shape[0]
    qT = to_lane(state.q, nqp)
    uT = to_lane(state.u, nvp)
    tauT = to_lane(tau, nvp)
    pdT = to_lane(pd, nvp) if pd is not None else jnp.zeros_like(uT)
    hmT = (to_lane(extract_patch(state.q, heights), nhmp)
           if hm is not None else None)
    qo, uo = step_lane(qT, uT, tauT, pdT, hmT)
    return State(q=from_lane(qo, sd.nq, B),
                 u=from_lane(uo, sd.nv, B),
                 t=state.t + dt)

  def pure_ref(state, tau, pd, heights):
    return pipeline.step_batch(scene, state, tau,
                               pd if use_pd else None, config,
                               field_heights=heights)

  @jax.custom_vjp
  def fused(state, tau, pd, heights):
    return fused_raw(state, tau, pd, heights)

  def fwd(state, tau, pd, heights):
    return fused_raw(state, tau, pd, heights), (state, tau, pd, heights)

  def bwd(res, g):
    state, tau, pd, heights = res
    _, vjp = jax.vjp(pure_ref, state, tau, pd, heights)
    return vjp(g)

  fused.defvjp(fwd, bwd)

  def norm_heights(state, fh):
    if hm is None:
      assert fh is None, "field_heights passed for a field-less scene"
      return None
    if fh is None:
      hts = scene.field.heights
      return jnp.broadcast_to(hts, (state.q.shape[0],) + hts.shape)
    return fh

  if use_pd:
    return lambda state, tau, pd_target, field_heights=None: fused(
        state, tau, pd_target, norm_heights(state, field_heights))
  return lambda state, tau, pd_target=None, field_heights=None: fused(
      state, tau, None, norm_heights(state, field_heights))
