"""Cylinder + convex-mesh narrow phase (SURVEY.md C4/C6; VERDICT round-2 #6).

The reference collides flat-capped cylinders and convex meshes through its
ODE-heritage dCollide dispatch; round 2 silently promoted URDF cylinders to
capsules and dropped (CYLINDER, *) pairs. Now: true cylinder kernels vs
plane/heightmap/sphere (static 6-slot rim manifold), vertex-sampled convex
mesh kernels vs plane/heightmap/sphere, OBJ/STL vertex loading in the URDF
parser, and a compile-time warning (never silence) for any pair type without
a kernel.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.world import World

F64 = jnp.float64


def _settle(scene, s, n=800):
  @jax.jit
  def run(s):
    def body(s, _):
      return scene.step(s), None

    s, _ = jax.lax.scan(body, s, None, length=n)
    return s

  return run(s)


class TestCylinder:
  def test_upright_cylinder_rests_on_face(self):
    world = World(dt=0.002, dtype=F64)
    world.add_cylinder(radius=0.1, half_length=0.15, mass=1.0,
                       pos=(0.0, 0.0, 0.4))
    world.add_ground()
    scene = world.compile()
    s = _settle(scene, scene.init_state())
    # rests on the cap face: center at half_length; no tipping
    assert abs(float(s.q[2]) - 0.15) < 5e-3, float(s.q[2])
    assert abs(float(s.q[3]) - 1.0) < 1e-3   # quaternion ~ identity
    assert float(jnp.abs(s.u).max()) < 0.05

  def test_lying_cylinder_rests_on_side(self):
    world = World(dt=0.002, dtype=F64)
    h = world.add_cylinder(radius=0.1, half_length=0.2, mass=1.0,
                           pos=(0.0, 0.0, 0.3))
    world.add_ground()
    scene = world.compile()
    # rotate axis to horizontal (90 deg about x): q = (cos45, sin45, 0, 0)
    c = float(np.cos(np.pi / 4))
    q0 = scene.model.q_init.at[3:7].set(jnp.asarray([c, c, 0.0, 0.0], F64))
    s = _settle(scene, scene.init_state(q=q0))
    assert abs(float(s.q[2]) - 0.1) < 5e-3, float(s.q[2])

  def test_sphere_rests_on_cylinder_cap(self):
    world = World(dt=0.002, dtype=F64)
    world.add_cylinder(radius=0.2, half_length=0.15, mass=5.0,
                       pos=(0.0, 0.0, 0.151))
    world.add_sphere(radius=0.08, mass=0.5, pos=(0.0, 0.0, 0.5))
    world.add_ground()
    scene = world.compile()
    s = _settle(scene, scene.init_state(), n=1200)
    # cylinder on ground at z=0.15; sphere on its cap at 0.30 + r
    assert abs(float(s.q[2]) - 0.15) < 5e-3
    assert abs(float(s.q[9]) - 0.38) < 8e-3, float(s.q[9])

  def test_urdf_cylinder_is_true_cylinder(self):
    from raisimlib_tpu.models.urdf import load_urdf
    from raisimlib_tpu.ops.collision import GEOM_CYLINDER

    urdf = """<robot name="wheel">
      <link name="base">
        <inertial><mass value="1.0"/>
          <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
        </inertial>
        <collision><geometry><cylinder radius="0.1" length="0.3"/></geometry>
        </collision>
      </link>
    </robot>"""
    bodies, geoms, _ = load_urdf(urdf)
    assert geoms[0]["gtype"] == GEOM_CYLINDER
    assert geoms[0]["params"] == [0.1, 0.15]

  def test_cylinder_on_heightmap(self):
    from raisimlib_tpu.utils import terrain

    world = World(dt=0.002, dtype=F64)
    world.add_cylinder(radius=0.1, half_length=0.15, mass=1.0,
                       pos=(0.0, 0.0, 0.4))
    world.add_heightmap(terrain.flat(0.1, size=(4.0, 4.0), samples=(8, 8),
                                     dtype=F64))
    scene = world.compile()
    s = _settle(scene, scene.init_state())
    assert abs(float(s.q[2]) - 0.25) < 5e-3, float(s.q[2])


class TestMesh:
  def _foot_verts(self):
    # a wedge-shaped "foot": flat 4-vertex sole + raised heel/toe ridge
    return np.array([
        [-0.10, -0.05, 0.0], [0.14, -0.05, 0.0],
        [-0.10, 0.05, 0.0], [0.14, 0.05, 0.0],
        [-0.08, -0.04, 0.06], [0.12, -0.04, 0.08],
        [-0.08, 0.04, 0.06], [0.12, 0.04, 0.08],
    ])

  def test_mesh_foot_rests_flat_on_plane(self):
    world = World(dt=0.002, dtype=F64)
    world.add_mesh(self._foot_verts(), mass=1.0, pos=(0.0, 0.0, 0.3))
    world.add_ground()
    scene = world.compile()
    s = _settle(scene, scene.init_state())
    # sole vertices at local z=0 -> body origin rests at z ~= 0
    assert abs(float(s.q[2])) < 5e-3, float(s.q[2])
    assert float(jnp.abs(s.u).max()) < 0.05

  def test_mesh_on_heightmap(self):
    from raisimlib_tpu.utils import terrain

    world = World(dt=0.002, dtype=F64)
    world.add_mesh(self._foot_verts(), mass=1.0, pos=(0.0, 0.0, 0.3))
    world.add_heightmap(terrain.flat(0.05, size=(4.0, 4.0), samples=(8, 8),
                                     dtype=F64))
    scene = world.compile()
    s = _settle(scene, scene.init_state())
    assert abs(float(s.q[2]) - 0.05) < 5e-3, float(s.q[2])

  def test_sphere_rests_on_mesh_apex(self):
    # octahedron with apex at z=0.3: the vertex-sampled sphere-mesh kernel is
    # exact for vertex contacts (the documented approximation regime)
    octa = np.array([
        [0.2, 0, 0.15], [-0.2, 0, 0.15], [0, 0.2, 0.15], [0, -0.2, 0.15],
        [0, 0, 0.3], [0, 0, 0.0],
    ])
    world = World(dt=0.002, dtype=F64)
    world.add_mesh(octa, mass=20.0, pos=(0.0, 0.0, 0.0))
    world.add_sphere(radius=0.1, mass=0.2, pos=(0.0, 0.0, 0.6))
    world.add_ground()
    scene = world.compile()
    s = _settle(scene, scene.init_state(), n=1200)
    # sphere settles on the apex: z ~= 0.3 + r (mesh base pinned by gravity)
    assert abs(float(s.q[9]) - 0.4) < 0.02, float(s.q[9])

  def test_obj_and_stl_loading(self, tmp_path):
    from raisimlib_tpu.models.urdf import load_mesh_vertices, load_urdf
    from raisimlib_tpu.ops.collision import GEOM_MESH

    obj = tmp_path / "tet.obj"
    obj.write_text("# tet\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\nf 1 2 3\n")
    V = load_mesh_vertices(str(obj))
    assert V.shape == (4, 3)

    import struct as pystruct
    stl = tmp_path / "tri.stl"
    tris = [((0, 0, 1), (0, 0, 0), (1, 0, 0), (0, 1, 0)),
            ((0, 0, -1), (0, 0, 1), (1, 0, 0), (0, 1, 0))]
    buf = b"\0" * 80 + pystruct.pack("<I", len(tris))
    for n, a, b, c in tris:
      for v in (n, a, b, c):
        buf += pystruct.pack("<3f", *v)
      buf += b"\0\0"
    stl.write_bytes(buf)
    V2 = load_mesh_vertices(str(stl))
    assert V2.shape[0] == 4  # unique vertices

    urdf = f"""<robot name="m"><link name="base">
      <inertial><mass value="1.0"/>
        <inertia ixx="0.01" iyy="0.01" izz="0.01" ixy="0" ixz="0" iyz="0"/>
      </inertial>
      <collision><geometry><mesh filename="{obj}"/></geometry></collision>
    </link></robot>"""
    bodies, geoms, _ = load_urdf(urdf)
    assert geoms[0]["gtype"] == GEOM_MESH
    assert geoms[0]["mesh"].shape == (4, 3)


class TestNoSilentDrops:
  def test_pair_matrix_fully_closed(self):
    # round 4: EVERY built-in primitive pair has a narrow-phase kernel
    # (analytic, support-function, or heightfield) — the unsupported-pair
    # warning can no longer fire for built-ins. Assert the slot table covers
    # the full matrix so a future primitive that misses entries fails here.
    from raisimlib_tpu.ops import collision as coll

    prims = (coll.GEOM_SPHERE, coll.GEOM_BOX, coll.GEOM_CAPSULE,
             coll.GEOM_CYLINDER, coll.GEOM_MESH, coll.GEOM_CONE)
    uncovered = []
    for i, ta in enumerate(prims):
      for tb in prims[i:]:
        if tuple(sorted((ta, tb))) not in coll._PAIR_SLOTS:
          uncovered.append((ta, tb))
      for tb in (coll.GEOM_PLANE, coll.GEOM_HEIGHTMAP):
        if tuple(sorted((ta, tb))) not in coll._PAIR_SLOTS:
          uncovered.append((ta, tb))
    assert not uncovered, uncovered

  def test_cylinder_box_pair_supported(self):
    # the exact scene the round-3 advisor flagged as a regression (cylinder
    # feet vs boxes falling through) now compiles with active pair kernels
    import warnings

    world = World(dt=0.002, dtype=F64)
    world.add_cylinder(radius=0.1, half_length=0.1, mass=1.0, pos=(0, 0, 0.5))
    world.add_box((0.2, 0.2, 0.2), mass=1.0, pos=(0, 0, 0.1))
    world.add_ground()
    with warnings.catch_warnings():
      warnings.simplefilter("error")
      scene = world.compile()
    assert len(scene.pairs) == 3    # cyl-box, cyl-plane, box-plane

  def test_supported_scene_does_not_warn(self):
    import warnings

    world = World(dt=0.002, dtype=F64)
    world.add_sphere(radius=0.1, mass=1.0, pos=(0, 0, 0.5))
    world.add_ground()
    with warnings.catch_warnings():
      warnings.simplefilter("error")
      world.compile()
