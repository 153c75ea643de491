"""World — the public scene-building API, mirroring `raisim::World`'s role (SURVEY.md C12).

RaiSim's `World` owns heap objects and mutates them in place each `integrate()` call.
The TPU-native design splits that into two phases:

  * **Build phase (host, Python):** `World.add_*` calls accumulate object specs.
    `World.compile()` merges every articulated system and single body into ONE forest
    `RobotModel` (single bodies become FREE-joint roots — same dynamics path, as
    SURVEY.md C4 prescribes) plus static geometry tables, and returns a frozen `Scene`.
  * **Run phase (device):** `Scene.step(state, tau)` is a pure jitted function;
    `vmap`/`shard_map` supply batching. No mutation, no pointers, no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from raisimlib_tpu.models.model import JointType, RobotModel, build_model
from raisimlib_tpu.models import primitives
from raisimlib_tpu.ops import dynamics, integrator
from raisimlib_tpu.ops.collision import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CONE,
    GEOM_CYLINDER,
    GEOM_HEIGHTMAP,
    GEOM_MESH,
    GEOM_PLANE,
    GEOM_SPHERE,
)
from raisimlib_tpu.ops.integrator import State


@dataclasses.dataclass
class _GeomSpec:
  body: int           # merged-model body index; -1 = static world
  gtype: int
  params: np.ndarray  # (4,) type-specific: sphere r; box hx,hy,hz; capsule r,hl
  offset_pos: np.ndarray
  offset_rot: np.ndarray
  material: int
  obj: int = -1       # owning object id; same-obj pairs skipped unless self_collision
  mesh: Any = None    # (n, 3) convex-hull vertices for GEOM_MESH geoms


@dataclasses.dataclass
class _ObjectHandle:
  """Returned by add_* — records where the object landed in the merged model."""

  name: str
  body_start: int
  q_slice: slice
  v_slice: slice


class World:
  """Accumulates objects, then compiles to a frozen `Scene`."""

  def __init__(self, dt: float = 0.001, gravity=(0.0, 0.0, -9.81), dtype=jnp.float32,
               self_collision: bool = False):
    self.dt = float(dt)
    self.self_collision = bool(self_collision)  # opt-in, as the reference
    self.gravity = np.asarray(gravity, dtype=np.float64)
    self.dtype = dtype
    self._bodies: List[dict] = []       # merged body specs (build_model format)
    self._geoms: List[_GeomSpec] = []
    self._handles: List[_ObjectHandle] = []
    self._materials: List[tuple] = [(0.8, 0.0, 0.001)]  # (mu, restitution, threshold)
    self._pair_props: dict = {}         # (mat_a, mat_b) -> (mu, e, threshold)
    self._field = None                  # HeightField (at most one per world, as RaiSim)
    self._wires: List = []              # stiff wires (solver rows, SURVEY.md C8)
    self._pins: List = []               # pin constraints (bilateral row triplets)
    self._compliant: List = []          # compliant wires (force elements)
    self._nq = 0
    self._nv = 0

  # -- materials (RaiSim's MaterialManager, SURVEY.md C11) ---------------
  def add_material(self, mu: float, restitution: float = 0.0, threshold: float = 0.001) -> int:
    self._materials.append((float(mu), float(restitution), float(threshold)))
    return len(self._materials) - 1

  def set_default_friction(self, mu: float):
    m = self._materials[0]
    self._materials[0] = (float(mu), m[1], m[2])

  def set_material_pair_prop(self, mat_a: int, mat_b: int, mu: float,
                             restitution: float = 0.0, threshold: float = 0.001):
    """Explicit per-pair contact properties (mirrors `setMaterialPairProp`)."""
    key = (min(mat_a, mat_b), max(mat_a, mat_b))
    self._pair_props[key] = (float(mu), float(restitution), float(threshold))

  def _material_pair_table(self) -> np.ndarray:
    """(n_mat, n_mat, 3) table; unset pairs combine as mu=sqrt(mu_i mu_j),
    e=max, threshold=max."""
    n = len(self._materials)
    tab = np.zeros((n, n, 3))
    for i in range(n):
      for j in range(n):
        key = (min(i, j), max(i, j))
        if key in self._pair_props:
          tab[i, j] = self._pair_props[key]
        else:
          mi, mj = self._materials[i], self._materials[j]
          tab[i, j] = (np.sqrt(mi[0] * mj[0]), max(mi[1], mj[1]), max(mi[2], mj[2]))
    return tab

  # -- objects -----------------------------------------------------------
  def _merge_model_bodies(self, bodies: Sequence[dict], name: str) -> _ObjectHandle:
    ofs = len(self._bodies)
    nq0, nv0 = self._nq, self._nv
    for b in bodies:
      b = dict(b)
      if b["parent"] >= 0:
        b["parent"] = b["parent"] + ofs
      self._bodies.append(b)
      from raisimlib_tpu.models.model import _NQ, _NV

      jt = JointType(b["joint"])
      self._nq += _NQ[jt]
      self._nv += _NV[jt]
    h = _ObjectHandle(name, ofs, slice(nq0, self._nq), slice(nv0, self._nv))
    self._handles.append(h)
    return h

  def add_articulated_system(
      self, bodies: Sequence[dict], name: str = "robot", geoms: Sequence[dict] = ()
  ) -> _ObjectHandle:
    """Add a robot from build_model-format body specs + optional collision geoms.

    Each geom dict: body (local index), gtype, params, offset_pos, offset_rot, material.
    """
    h = self._merge_model_bodies(bodies, name)
    obj = len(self._handles) - 1
    for g in geoms:
      self._geoms.append(
          _GeomSpec(
              body=g["body"] + h.body_start,
              gtype=int(g["gtype"]),
              params=np.resize(np.asarray(g.get("params", []), dtype=np.float64), 4),
              offset_pos=np.asarray(g.get("offset_pos", np.zeros(3)), dtype=np.float64),
              offset_rot=np.asarray(g.get("offset_rot", np.eye(3)), dtype=np.float64),
              material=int(g.get("material", 0)),
              obj=obj,
              mesh=g.get("mesh"),
          )
      )
    return h

  def add_sphere(self, radius: float, mass: float, name="sphere", material=0,
                 pos=(0.0, 0.0, 1.0)) -> _ObjectHandle:
    I = 0.4 * mass * radius * radius * np.eye(3)
    spec = dict(parent=-1, joint=JointType.FREE, mass=mass, com=[0, 0, 0],
                inertia=I, actuated=False, name=name,
                q_init=list(pos) + [1.0, 0.0, 0.0, 0.0])
    h = self._merge_model_bodies([spec], name)
    self._geoms.append(_GeomSpec(h.body_start, GEOM_SPHERE,
                                 np.array([radius, 0, 0, 0]), np.zeros(3), np.eye(3), material))
    return h

  def add_box(self, half_extents, mass: float, name="box", material=0,
              pos=(0.0, 0.0, 1.0), static: bool = False,
              rot=None) -> Optional[_ObjectHandle]:
    """Box rigid body; `static=True` makes it immovable world geometry at
    (pos, rot) with no dynamics state (RaiSim's BodyType::STATIC — ramps,
    platforms, fixed obstacles). Static boxes collide with every dynamic
    geom but contribute no solver dofs; returns None (no state slice)."""
    hx, hy, hz = half_extents
    R = np.eye(3) if rot is None else np.asarray(rot, np.float64)
    if static:
      self._geoms.append(_GeomSpec(-1, GEOM_BOX, np.array([hx, hy, hz, 0]),
                                   np.asarray(pos, np.float64), R, material))
      return None
    I = mass / 3.0 * np.diag([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy])
    spec = dict(parent=-1, joint=JointType.FREE, mass=mass, com=[0, 0, 0],
                inertia=I, actuated=False, name=name,
                q_init=list(pos) + [1.0, 0.0, 0.0, 0.0])
    h = self._merge_model_bodies([spec], name)
    self._geoms.append(_GeomSpec(h.body_start, GEOM_BOX,
                                 np.array([hx, hy, hz, 0]),
                                 np.zeros(3), R, material))
    return h

  def add_capsule(self, radius: float, half_length: float, mass: float, name="capsule",
                  material=0, pos=(0.0, 0.0, 1.0)) -> _ObjectHandle:
    # capsule along body z
    m_cyl = mass  # lump: treat as cylinder + caps approximated
    r2 = radius * radius
    l = 2 * half_length
    Ixx = m_cyl * (3 * r2 + l * l) / 12.0
    I = np.diag([Ixx, Ixx, 0.5 * m_cyl * r2])
    spec = dict(parent=-1, joint=JointType.FREE, mass=mass, com=[0, 0, 0],
                inertia=I, actuated=False, name=name,
                q_init=list(pos) + [1.0, 0.0, 0.0, 0.0])
    h = self._merge_model_bodies([spec], name)
    self._geoms.append(_GeomSpec(h.body_start, GEOM_CAPSULE,
                                 np.array([radius, half_length, 0, 0]),
                                 np.zeros(3), np.eye(3), material))
    return h

  def add_cylinder(self, radius: float, half_length: float, mass: float,
                   name="cylinder", material=0, pos=(0.0, 0.0, 1.0)) -> _ObjectHandle:
    """Flat-capped cylinder along body z (RaiSim `World::addCylinder`).
    Narrow phase exists vs plane/heightmap/sphere; other pairs warn at
    compile time (ops/collision.candidate_pairs) instead of silently dropping."""
    r2 = radius * radius
    l = 2 * half_length
    Ixx = mass * (3 * r2 + l * l) / 12.0
    I = np.diag([Ixx, Ixx, 0.5 * mass * r2])
    spec = dict(parent=-1, joint=JointType.FREE, mass=mass, com=[0, 0, 0],
                inertia=I, actuated=False, name=name,
                q_init=list(pos) + [1.0, 0.0, 0.0, 0.0])
    h = self._merge_model_bodies([spec], name)
    self._geoms.append(_GeomSpec(h.body_start, GEOM_CYLINDER,
                                 np.array([radius, half_length, 0, 0]),
                                 np.zeros(3), np.eye(3), material))
    return h

  def add_cone(self, radius: float, height: float, mass: float, name="cone",
               material=0, pos=(0.0, 0.0, 1.0)) -> _ObjectHandle:
    """Solid cone along body +z (RaiSim `World::addCone`): base ring of
    `radius` at z = -height/4, apex at z = +3*height/4 (origin at the COM).
    Narrow phase: analytic vs plane; the generic support-function kernel vs
    every other convex primitive (ops/collision._support_pair)."""
    r2 = radius * radius
    # solid cone about its COM (a quarter height above the base)
    Izz = 0.3 * mass * r2
    Ixx = mass * (3.0 / 20.0 * r2 + 3.0 / 80.0 * height * height)
    spec = dict(parent=-1, joint=JointType.FREE, mass=mass, com=[0, 0, 0],
                inertia=np.diag([Ixx, Ixx, Izz]), actuated=False, name=name,
                q_init=list(pos) + [1.0, 0.0, 0.0, 0.0])
    h = self._merge_model_bodies([spec], name)
    self._geoms.append(_GeomSpec(h.body_start, GEOM_CONE,
                                 np.array([radius, height, 0, 0]),
                                 np.zeros(3), np.eye(3), material))
    return h

  def add_mesh(self, vertices, mass: float, name="mesh", material=0,
               pos=(0.0, 0.0, 1.0), inertia=None,
               com=(0.0, 0.0, 0.0)) -> _ObjectHandle:
    """Convex-mesh rigid body from a hull vertex table (RaiSim `World::addMesh`).

    `vertices`: (n, 3) body-local points; the collision kernels use a
    support-sampled subset (ops/collision.MAX_MESH_VERTS). `inertia`: (3,3)
    about the COM; defaults to the vertex-AABB box inertia (a documented
    approximation — pass the true tensor for accurate dynamics)."""
    V = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    assert len(V) >= 4, "mesh needs >= 4 vertices"
    if inertia is None:
      ext = V.max(axis=0) - V.min(axis=0)
      inertia = mass / 12.0 * np.diag([ext[1]**2 + ext[2]**2,
                                       ext[0]**2 + ext[2]**2,
                                       ext[0]**2 + ext[1]**2])
    spec = dict(parent=-1, joint=JointType.FREE, mass=mass, com=list(com),
                inertia=np.asarray(inertia), actuated=False, name=name,
                q_init=list(pos) + [1.0, 0.0, 0.0, 0.0])
    h = self._merge_model_bodies([spec], name)
    self._geoms.append(_GeomSpec(h.body_start, GEOM_MESH, np.zeros(4),
                                 np.zeros(3), np.eye(3), material, mesh=V))
    return h

  def add_compound(self, children, mass: float, name="compound", material=0,
                   pos=(0.0, 0.0, 1.0), inertia=None,
                   com=(0.0, 0.0, 0.0)) -> _ObjectHandle:
    """Rigid body composed of several primitive collision geoms (RaiSim
    `Compound`): one FREE-joint body, many geoms.

    children: list of dicts {type: "sphere"|"box"|"capsule"|"cylinder",
    params: [...], pos: (3,), rot: (3,3) optional, material: int optional}.
    params per type: sphere [r]; box [hx,hy,hz]; capsule/cylinder [r, hl].
    `inertia` (3,3 about the COM) defaults to the mass-weighted sum of the
    children's primitive inertias via the parallel-axis theorem, with mass
    split proportional to child volume."""
    import math

    def _vol(t, p):
      if t == "sphere":
        return 4.0 / 3.0 * math.pi * p[0] ** 3
      if t == "box":
        return 8.0 * p[0] * p[1] * p[2]
      if t == "capsule":
        return math.pi * p[0] ** 2 * (2 * p[1]) + 4.0 / 3.0 * math.pi * p[0] ** 3
      if t == "cylinder":
        return math.pi * p[0] ** 2 * (2 * p[1])
      raise ValueError(t)

    def _prim_inertia(t, p, m):
      if t == "sphere":
        return 0.4 * m * p[0] ** 2 * np.eye(3)
      if t == "box":
        hx, hy, hz = p
        return m / 3.0 * np.diag([hy * hy + hz * hz, hx * hx + hz * hz,
                                  hx * hx + hy * hy])
      # capsule/cylinder along z (capsule approximated as cylinder of same
      # total length for the default inertia — pass `inertia` for exactness)
      r, hl = p[0], p[1]
      l = 2 * hl
      Ixx = m * (3 * r * r + l * l) / 12.0
      return np.diag([Ixx, Ixx, 0.5 * m * r * r])

    gtype_map = {"sphere": GEOM_SPHERE, "box": GEOM_BOX,
                 "capsule": GEOM_CAPSULE, "cylinder": GEOM_CYLINDER}
    vols = [_vol(c["type"], c["params"]) for c in children]
    vtot = sum(vols)
    if inertia is None:
      I = np.zeros((3, 3))
      for c, v in zip(children, vols):
        mi = mass * v / vtot
        ci = np.asarray(c.get("pos", (0, 0, 0)), dtype=np.float64) - np.asarray(com)
        R = np.asarray(c.get("rot", np.eye(3)), dtype=np.float64)
        Ii = R @ _prim_inertia(c["type"], c["params"], mi) @ R.T
        I += Ii + mi * (np.dot(ci, ci) * np.eye(3) - np.outer(ci, ci))
      inertia = I
    spec = dict(parent=-1, joint=JointType.FREE, mass=mass, com=list(com),
                inertia=np.asarray(inertia), actuated=False, name=name,
                q_init=list(pos) + [1.0, 0.0, 0.0, 0.0])
    h = self._merge_model_bodies([spec], name)
    obj = len(self._handles) - 1
    for c in children:
      self._geoms.append(_GeomSpec(
          h.body_start, gtype_map[c["type"]],
          np.resize(np.asarray(c["params"], dtype=np.float64), 4),
          np.asarray(c.get("pos", np.zeros(3)), dtype=np.float64),
          np.asarray(c.get("rot", np.eye(3)), dtype=np.float64),
          int(c.get("material", material)), obj=obj))
    return h

  def add_ground(self, height: float = 0.0, material: int = 0) -> None:
    self._geoms.append(_GeomSpec(-1, GEOM_PLANE, np.array([height, 0, 0, 0]),
                                 np.zeros(3), np.eye(3), material))

  def add_heightmap(self, field, material: int = 0) -> None:
    """Add a `HeightField` terrain (RaiSim `World::addHeightMap`, SURVEY.md C5).

    The field's heights/center are pytree leaves on the compiled Scene, so batched
    terrain scenarios are `scene.replace(field=...)` under `vmap`.

    Tunneling guard (round-5 verdict #7): the narrow phase has no continuous
    collision detection — a near-vertical face (stairs riser) is a one-cell
    band, and a body crossing that band in a single step passes through it.
    If the field contains steep cells (adjacent-sample slope > ~45 deg), warn
    LOUDLY with the speed bound `min_cell / dt` above which tunneling is
    possible, so the failure mode is a build-time message instead of a silent
    fly-through (STATUS gap #3, two rounds open).
    """
    assert self._field is None, "one heightmap per world (matches reference usage)"
    import warnings

    import numpy as _np

    H = _np.asarray(field.heights)
    if H.ndim == 2 and min(H.shape) >= 2:
      dx = float(field.size_x) / (H.shape[0] - 1)
      dy = float(field.size_y) / (H.shape[1] - 1)
      gx = float(_np.abs(_np.diff(H, axis=0)).max()) / dx if H.shape[0] > 1 else 0.0
      gy = float(_np.abs(_np.diff(H, axis=1)).max()) / dy if H.shape[1] > 1 else 0.0
      if max(gx, gy) > 1.0:                      # slope > 45 deg: riser-like
        v_max = min(dx, dy) / self.dt
        warnings.warn(
            f"heightmap contains near-vertical faces (max cell slope "
            f"{max(gx, gy):.1f}); there is no continuous collision detection, "
            f"so bodies moving faster than ~{v_max:.1f} m/s (one cell of "
            f"{min(dx, dy):.3f} m per dt={self.dt} s step) can TUNNEL "
            f"through a riser. Keep speeds below that bound, reduce dt, or "
            f"refine the grid.", stacklevel=2)
    self._field = field
    self._geoms.append(_GeomSpec(-1, GEOM_HEIGHTMAP, np.zeros(4),
                                 np.zeros(3), np.eye(3), material))

  # -- constraints (RaiSim wires/pins, SURVEY.md C8) ----------------------
  def add_stiff_wire(self, body_a: int, pos_a, body_b: int, pos_b,
                     length: float) -> None:
    """Inextensible cable between two body-local points (`World::addStiffWire`):
    a unilateral tension row in the contact solver — resists stretch, never
    pushes. body index -1 anchors to the world (pos in world coords)."""
    from raisimlib_tpu.ops.constraints import WireSpec

    self._wires.append(WireSpec(int(body_a), tuple(map(float, pos_a)),
                                int(body_b), tuple(map(float, pos_b)),
                                float(length)))

  def add_compliant_wire(self, body_a: int, pos_a, body_b: int, pos_b,
                         length: float, stiffness: float,
                         damping: float = 0.0) -> None:
    """Spring-damper cable (`CompliantLengthConstraint`): a force element folded
    into the bias term, not a solver row. Tension-only (cables cannot push)."""
    from raisimlib_tpu.ops.constraints import CompliantWireSpec

    self._compliant.append(CompliantWireSpec(
        int(body_a), tuple(map(float, pos_a)), int(body_b),
        tuple(map(float, pos_b)), float(length), float(stiffness),
        float(damping)))

  def add_pin(self, body_a: int, pos_a, body_b: int, pos_b) -> None:
    """Ball-joint (`PinConstraint`): coincident body-local points, enforced as a
    bilateral row triplet in the solver. body index -1 pins to the world."""
    from raisimlib_tpu.ops.constraints import PinSpec

    self._pins.append(PinSpec(int(body_a), tuple(map(float, pos_a)),
                              int(body_b), tuple(map(float, pos_b))))

  # -- compile -----------------------------------------------------------
  def compile(self, joint_limits: bool = True) -> "Scene":
    """Freeze to a Scene. `joint_limits=True` (default, matching the reference)
    adds one unilateral solver row per dof with a finite URDF position limit.

    Scene construction runs ON THE HOST CPU DEVICE and the Scene stays there:
    build-time math is dozens of tiny ops, and on a remote-compile TPU backend
    (this machine's `axon` tunnel) each un-jitted op costs a full compile
    round-trip — minutes of setup instead of ~1 s (measured). The Scene's
    arrays are closure CONSTANTS of the jitted step functions, so jit embeds
    them from host memory at trace time (free) and uploads them once inside
    the compiled executable; putting them on the accelerator up front would
    force a blocking device->host readback per constant at every trace.
    """
    from raisimlib_tpu.ops import collision as coll
    from raisimlib_tpu.ops import constraints as cs

    host = jax.devices("cpu")[0]
    with jax.default_device(host):
      model = build_model("scene", self._bodies, dtype=self.dtype)
      geom_table = coll.build_geom_table(self._geoms, dtype=self.dtype)
      pairs = coll.candidate_pairs(self._geoms, model, self.self_collision)
      materials = jnp.asarray(self._material_pair_table(), dtype=self.dtype)
      tables = cs.build_tables(model, joint_limits, wires=self._wires,
                               pins=self._pins, compliant=self._compliant)
      objects = tuple(
          (h.name, h.q_slice.start, h.q_slice.stop, h.v_slice.start,
           h.v_slice.stop, h.body_start) for h in self._handles)
      scene = Scene(
          model=model,
          geoms=geom_table,
          pairs=pairs,
          materials=materials,
          gravity=jnp.asarray(self.gravity, dtype=self.dtype),
          dt=self.dt,
          kp=jnp.zeros((model.nv,), dtype=self.dtype),
          kd=jnp.zeros((model.nv,), dtype=self.dtype),
          field=self._field,
          constraints=tables,
          objects=objects,
      )
    return scene


@struct.dataclass
class Scene:
  """Frozen, compiled world: one forest model + static geometry/contact tables."""

  model: RobotModel
  geoms: Any                      # GeomTable (ops.collision)
  pairs: Any = struct.field(pytree_node=False)  # static candidate pair list
  materials: jnp.ndarray          # (n_mat, n_mat, 3) pair table: mu, e, threshold
  gravity: jnp.ndarray
  dt: float = struct.field(pytree_node=False)
  kp: jnp.ndarray = None          # (nv,) PD stiffness (0 disables)
  kd: jnp.ndarray = None          # (nv,) PD damping
  field: Any = None               # HeightField terrain, or None
  constraints: Any = struct.field(pytree_node=False, default=None)  # ConstraintTables
  # name registry: (name, q_start, q_stop, v_start, v_stop, body_start) per object
  objects: tuple = struct.field(pytree_node=False, default=())

  def init_state(self, q=None, u=None) -> State:
    return integrator.init_state(self.model, q, u)

  # -- per-object accessors (RaiSim's name registry + getState/setState,
  # SURVEY.md C12: "name -> object registry") --------------------------------
  @property
  def object_names(self) -> tuple:
    return tuple(o[0] for o in self.objects)

  def _object(self, name: str):
    for o in self.objects:
      if o[0] == name:
        return o
    raise KeyError(f"unknown object {name!r}; registered: {self.object_names}")

  def object_state(self, state: State, name: str):
    """(q_obj, u_obj) slices of the named object's generalized state."""
    _, q0, q1, v0, v1, _ = self._object(name)
    return state.q[..., q0:q1], state.u[..., v0:v1]

  def set_object_state(self, state: State, name: str, q=None, u=None) -> State:
    """Functional per-object setState: returns a new State with the named
    object's coordinates and/or velocities replaced."""
    _, q0, q1, v0, v1, _ = self._object(name)
    qn, un = state.q, state.u
    if q is not None:
      qn = qn.at[..., q0:q1].set(jnp.asarray(q, qn.dtype))
    if u is not None:
      un = un.at[..., v0:v1].set(jnp.asarray(u, un.dtype))
    return state.replace(q=qn, u=un)

  def body_index(self, body_name: str) -> int:
    """Static body index by name (RaiSim `getBodyIdx`)."""
    return self.model.body_names.index(body_name)

  def body_pose(self, state: State, body_name: str):
    """(R, p) world pose of the named body at `state` (one FK evaluation —
    observability surface, not the hot path; jit it for repeated use)."""
    from raisimlib_tpu.ops import dynamics

    kin = dynamics.fk(self.model, state.q, state.u)
    b = self.body_index(body_name)
    return kin.R[b], kin.p[b]

  def set_pd_gains(self, kp, kd) -> "Scene":
    """Per-dof PD gains (RaiSim `setPdGains`); scalars broadcast over actuated dofs.

    Host numpy broadcast + one transfer (no un-jitted device math — see
    `World.compile` on why that matters on remote-compile backends)."""
    dtype = self.model.q_init.dtype
    kp = jnp.asarray(np.broadcast_to(np.asarray(kp), (self.model.nv,)), dtype)
    kd = jnp.asarray(np.broadcast_to(np.asarray(kd), (self.model.nv,)), dtype)
    return self.replace(kp=kp, kd=kd)

  def step(
      self,
      state: State,
      tau: Optional[jnp.ndarray] = None,
      pd_target: Optional[jnp.ndarray] = None,
      f_ext_w: Optional[jnp.ndarray] = None,
  ) -> State:
    """One physics step: collision -> contact solve -> integrate (SURVEY.md §3.1).

    `f_ext_w`: optional (nb, 6) external spatial forces, world frame at the
    world origin ([torque_at_origin, force]; build per-point wrenches with
    `Scene.external_force` / `spatial.force_at_point`) — RaiSim's
    `setExternalForce`, functional-style."""
    from raisimlib_tpu.ops import pipeline

    if tau is None:
      tau = jnp.zeros((self.model.nv,), dtype=state.q.dtype)
    return pipeline.step(self, state, tau, pd_target, f_ext_w=f_ext_w)

  def external_force(self, body_name: str, point_w, force_w,
                     dtype=None) -> jnp.ndarray:
    """(nb, 6) world-frame wrench table applying `force_w` at world point
    `point_w` on the named body (zero elsewhere) — feed to `step(f_ext_w=...)`."""
    from raisimlib_tpu.ops import spatial as sp

    dtype = dtype or self.model.q_init.dtype
    b = self.body_index(body_name)
    w = sp.force_at_point(jnp.asarray(point_w, dtype), jnp.asarray(force_w, dtype))
    out = jnp.zeros((self.model.nb, 6), dtype)
    return out.at[b].set(w)

  def step_batch(
      self,
      state: State,
      tau: Optional[jnp.ndarray] = None,
      pd_target: Optional[jnp.ndarray] = None,
      field_heights: Optional[jnp.ndarray] = None,
  ) -> State:
    """Batched step (leading batch axis on state/tau/pd_target): same math as
    `vmap(step)` but the contact solve runs as one fused Pallas kernel with the
    batch on the TPU lane axis — the throughput path for rollouts/MPPI/RL.
    `field_heights` (B, nx, ny) gives each world its own heightfield (batched
    terrain scenarios)."""
    from raisimlib_tpu.ops import pipeline

    if tau is None:
      tau = jnp.zeros((state.q.shape[0], self.model.nv), dtype=state.q.dtype)
    return pipeline.step_batch(self, state, tau, pd_target,
                               field_heights=field_heights)

  def step_smooth(self, state: State, tau: Optional[jnp.ndarray] = None) -> State:
    if tau is None:
      tau = jnp.zeros((self.model.nv,), dtype=state.q.dtype)
    return integrator.step_smooth(self.model, state, tau, self.gravity, self.dt)
