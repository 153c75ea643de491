"""URDF parser -> frozen RobotModel + collision geom specs (SURVEY.md C2).

RaiSim's `ArticulatedSystem(urdfPath)` builds its kinematic tree from URDF at runtime;
this is the trace-time Python equivalent. Supported: revolute/continuous/prismatic/
fixed/floating joints, inertial origins with rpy, sphere/box/cylinder/capsule collision
geoms. Fixed joints are collapsed into the parent (inertia composed via parallel-axis,
geoms re-expressed in the parent frame) exactly as the reference does. Meshes are
approximated by their bounding capsule/sphere if <collision> provides one, else skipped
with a warning (documented gap: convex mesh narrow phase).
"""

from __future__ import annotations

import warnings
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

import numpy as np

from raisimlib_tpu.models.model import JointType
from raisimlib_tpu.ops.collision import (
    GEOM_BOX,
    GEOM_CAPSULE,
    GEOM_CYLINDER,
    GEOM_MESH,
    GEOM_SPHERE,
)


def _rpy_to_mat(rpy) -> np.ndarray:
  r, p, y = rpy
  cr, sr = np.cos(r), np.sin(r)
  cp, sp = np.cos(p), np.sin(p)
  cy, sy = np.cos(y), np.sin(y)
  Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
  Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
  Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
  return Rz @ Ry @ Rx


def _parse_origin(el) -> Tuple[np.ndarray, np.ndarray]:
  if el is None:
    return np.zeros(3), np.eye(3)
  xyz = np.array([float(v) for v in el.get("xyz", "0 0 0").split()])
  rpy = [float(v) for v in el.get("rpy", "0 0 0").split()]
  return xyz, _rpy_to_mat(rpy)


class _Link:
  def __init__(self, name):
    self.name = name
    self.mass = 0.0
    self.com = np.zeros(3)
    self.inertia = np.zeros((3, 3))  # about com, link-frame axes
    self.geoms: List[dict] = []      # local geom dicts

  def add_inertial(self, mass, com, inertia):
    """Combine another rigid component (parallel-axis in link frame)."""
    if mass <= 0.0 and self.mass <= 0.0:
      return
    m_tot = self.mass + mass
    com_tot = (self.mass * self.com + mass * com) / m_tot

    def shift(I, m, c, c_new):
      d = c - c_new
      return I + m * ((d @ d) * np.eye(3) - np.outer(d, d))

    self.inertia = shift(self.inertia, self.mass, self.com, com_tot) + shift(
        inertia, mass, com, com_tot
    )
    self.mass = m_tot
    self.com = com_tot


def _parse_inertial(el) -> Tuple[float, np.ndarray, np.ndarray]:
  if el is None:
    return 0.0, np.zeros(3), np.zeros((3, 3))
  pos, R = _parse_origin(el.find("origin"))
  mass = float(el.find("mass").get("value"))
  ie = el.find("inertia")
  ixx = float(ie.get("ixx"))
  iyy = float(ie.get("iyy"))
  izz = float(ie.get("izz"))
  ixy = float(ie.get("ixy", 0))
  ixz = float(ie.get("ixz", 0))
  iyz = float(ie.get("iyz", 0))
  I = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
  return mass, pos, R @ I @ R.T  # inertia about com, link-frame axes


def _parse_geometry(geo_el, pos, R, material) -> Optional[dict]:
  sphere = geo_el.find("sphere")
  if sphere is not None:
    r = float(sphere.get("radius"))
    return dict(gtype=GEOM_SPHERE, params=[r], offset_pos=pos, offset_rot=R,
                material=material)
  box = geo_el.find("box")
  if box is not None:
    size = [float(v) for v in box.get("size").split()]
    return dict(gtype=GEOM_BOX, params=[s / 2 for s in size], offset_pos=pos,
                offset_rot=R, material=material)
  cyl = geo_el.find("cylinder")
  if cyl is not None:
    r = float(cyl.get("radius"))
    l = float(cyl.get("length"))
    # true flat-capped cylinder (round-3: cylinder narrow phase exists for
    # plane/heightmap/sphere pairs; other pairs warn at compile, never silent)
    return dict(gtype=GEOM_CYLINDER, params=[r, l / 2], offset_pos=pos,
                offset_rot=R, material=material)
  cap = geo_el.find("capsule")
  if cap is not None:
    r = float(cap.get("radius"))
    l = float(cap.get("length"))
    return dict(gtype=GEOM_CAPSULE, params=[r, l / 2], offset_pos=pos, offset_rot=R,
                material=material)
  mesh = geo_el.find("mesh")
  if mesh is not None:
    fname = mesh.get("filename", "")
    verts = load_mesh_vertices(fname)
    if verts is None:
      return None                        # caller warns (unreadable/missing file)
    scale = mesh.get("scale")
    if scale:
      verts = verts * np.array([float(v) for v in scale.split()])
    return dict(gtype=GEOM_MESH, params=[], offset_pos=pos, offset_rot=R,
                material=material, mesh=verts)
  return None


def load_mesh_vertices(path: str):
  """Vertex table from an .obj (ascii) or .stl (binary or ascii) mesh file.
  Returns (n, 3) float64 array, or None if the file is missing/unsupported.
  Only vertices are needed: the collision kernels are vertex-sampled convex
  hulls (ops/collision.py MAX_MESH_VERTS support sampling)."""
  import os
  import struct as pystruct

  if not path or not os.path.exists(path):
    return None
  ext = os.path.splitext(path)[1].lower()
  if ext == ".obj":
    verts = []
    with open(path) as f:
      for line in f:
        if line.startswith("v "):
          parts = line.split()
          verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.asarray(verts) if len(verts) >= 4 else None
  if ext == ".stl":
    with open(path, "rb") as f:
      raw = f.read()
    if raw[:5].lower() == b"solid" and b"facet" in raw[:500]:
      verts = []
      for line in raw.decode(errors="ignore").splitlines():
        t = line.split()
        if len(t) == 4 and t[0] == "vertex":
          verts.append([float(t[1]), float(t[2]), float(t[3])])
      return np.unique(np.asarray(verts), axis=0) if len(verts) >= 4 else None
    (n_tri,) = pystruct.unpack_from("<I", raw, 80)
    if len(raw) < 84 + 50 * n_tri:
      return None
    tri = np.frombuffer(raw[84:84 + 50 * n_tri], dtype=np.uint8)
    tri = tri.reshape(n_tri, 50)[:, 12:48].copy().view("<f4").reshape(n_tri, 3, 3)
    return np.unique(tri.reshape(-1, 3).astype(np.float64), axis=0)
  return None


def load_urdf(
    path_or_string: str,
    floating_base: bool = True,
    material: int = 0,
    collapse_fixed: bool = True,
) -> Tuple[List[dict], List[dict], Dict[str, int]]:
  """Parse URDF into (body_specs, geom_specs, joint_name_to_dof) for World.

  body_specs: build_model format. geom_specs: dicts with local `body` indices
  (pass both to `World.add_articulated_system`). Joint map gives the generalized-
  velocity index of each named actuated joint (after the 6 base dofs if floating).
  """
  if path_or_string.lstrip().startswith("<"):
    root = ET.fromstring(path_or_string)
  else:
    root = ET.parse(path_or_string).getroot()

  links: Dict[str, _Link] = {}
  for lel in root.findall("link"):
    link = _Link(lel.get("name"))
    m, com, I = _parse_inertial(lel.find("inertial"))
    link.mass, link.com, link.inertia = m, com, I
    for cel in lel.findall("collision"):
      pos, R = _parse_origin(cel.find("origin"))
      g = _parse_geometry(cel.find("geometry"), pos, R, material)
      if g is None:
        warnings.warn(f"unsupported collision geometry on link {link.name}; skipped")
      else:
        link.geoms.append(g)
    links[link.name] = link

  joints = []
  child_of = {}
  for jel in root.findall("joint"):
    jtype = jel.get("type")
    parent = jel.find("parent").get("link")
    child = jel.find("child").get("link")
    pos, R = _parse_origin(jel.find("origin"))
    axis_el = jel.find("axis")
    axis = (
        np.array([float(v) for v in axis_el.get("xyz").split()])
        if axis_el is not None
        else np.array([1.0, 0.0, 0.0])
    )
    limit_el = jel.find("limit")
    effort = float(limit_el.get("effort", 1e9)) if limit_el is not None else 1e9
    # URDF spec: when a <limit> element is present, missing lower/upper default
    # to 0 for revolute/prismatic joints; an absent <limit> means unlimited.
    q_lo = float(limit_el.get("lower", 0.0)) if limit_el is not None else -1e9
    q_hi = float(limit_el.get("upper", 0.0)) if limit_el is not None else 1e9
    if jtype == "continuous":  # no position limits by definition
      q_lo, q_hi = -1e9, 1e9
    joints.append(
        dict(name=jel.get("name"), type=jtype, parent=parent, child=child,
             pos=pos, rot=R, axis=axis, effort=effort, q_lo=q_lo, q_hi=q_hi)
    )
    child_of[child] = joints[-1]

  # find root link
  children = set(child_of.keys())
  roots = [n for n in links if n not in children]
  assert len(roots) == 1, f"URDF must have exactly one root link, got {roots}"
  root_link = roots[0]

  # explicit floating-base pattern: massless "world" root + one floating joint
  rl = links[root_link]
  root_joints = [j for j in joints if j["parent"] == root_link]
  if (rl.mass == 0.0 and not rl.geoms and len(root_joints) == 1
      and root_joints[0]["type"] == "floating"):
    joints.remove(root_joints[0])
    del links[root_link]
    root_link = root_joints[0]["child"]
    floating_base = True

  # Collapse fixed joints: fold child link into parent (transform inertial + geoms).
  if collapse_fixed:
    changed = True
    while changed:
      changed = False
      for j in list(joints):
        if j["type"] != "fixed":
          continue
        # only collapse if the child has no remaining non-fixed children... we can
        # always collapse fixed joints bottom-up; re-express grandchildren joints.
        p, c = j["parent"], j["child"]
        plink, clink = links[p], links[c]
        T_pos, T_rot = j["pos"], j["rot"]
        # inertial into parent frame
        com_p = T_pos + T_rot @ clink.com
        I_p = T_rot @ clink.inertia @ T_rot.T
        plink.add_inertial(clink.mass, com_p, I_p)
        # geoms into parent frame
        for g in clink.geoms:
          plink.geoms.append(
              dict(g, offset_pos=T_pos + T_rot @ np.asarray(g["offset_pos"]),
                   offset_rot=T_rot @ np.asarray(g["offset_rot"]))
          )
        # re-parent grandchild joints
        for j2 in joints:
          if j2["parent"] == c:
            j2["parent"] = p
            j2["pos"] = T_pos + T_rot @ j2["pos"]
            j2["rot"] = T_rot @ j2["rot"]
        joints.remove(j)
        del links[c]
        changed = True

  # topological order from root
  body_specs: List[dict] = []
  geom_specs: List[dict] = []
  body_index: Dict[str, int] = {}
  joint_to_dof: Dict[str, int] = {}

  type_map = {"revolute": JointType.REVOLUTE, "continuous": JointType.REVOLUTE,
              "prismatic": JointType.PRISMATIC,
              # non-standard but common URDF extensions for ball joints
              "spherical": JointType.SPHERICAL, "ball": JointType.SPHERICAL}

  def emit(link_name: str, parent_idx: int, joint: Optional[dict]):
    link = links[link_name]
    if joint is None:
      if floating_base:
        jt = JointType.FREE
        spec = dict(parent=-1, joint=jt, mass=max(link.mass, 1e-9), com=link.com,
                    inertia=link.inertia, actuated=False, name=link_name)
      else:
        # welded root: should have been handled by caller; model needs >= 1 dof
        raise ValueError("fixed-base URDF requires at least one moving joint at root")
    else:
      jt = type_map.get(joint["type"])
      if jt is None:
        raise ValueError(f"unsupported joint type {joint['type']}")
      spec = dict(parent=parent_idx, joint=jt, axis=joint["axis"], pos=joint["pos"],
                  rot=joint["rot"], mass=max(link.mass, 1e-9), com=link.com,
                  inertia=link.inertia, actuated=True, torque_limit=joint["effort"],
                  q_lo=joint.get("q_lo", -1e9), q_hi=joint.get("q_hi", 1e9),
                  name=link_name)
    idx = len(body_specs)
    body_specs.append(spec)
    body_index[link_name] = idx
    for g in link.geoms:
      geom_specs.append(dict(g, body=idx))
    # children in declaration order
    for j in joints:
      if j["parent"] == link_name:
        emit(j["child"], idx, j)

  emit(root_link, -1, None)

  # dof index map (computed the same way build_model assigns them)
  from raisimlib_tpu.models.model import joint_nv

  nv = 0
  for i, spec in enumerate(body_specs):
    ndof = joint_nv(spec["joint"])
    for j in joints:
      if body_index.get(j["child"]) == i:
        joint_to_dof[j["name"]] = nv
    nv += ndof

  return body_specs, geom_specs, joint_to_dof
