"""Box-box SAT narrow phase + AABB broad phase (SURVEY.md C6; VERDICT r1 #6).

The reference resolves box-box through ODE-heritage clipping with dynamic contact
counts; the TPU kernel emits a fixed 9-slot masked manifold. These tests check the
analytic face case, the stacking behavior (the r1 acceptance test: a 3-box stack is
stable over a long sim), and the broad-phase mask."""

import jax
import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.ops import collision as coll
from raisimlib_tpu.ops import dynamics
from raisimlib_tpu.world import World


def _two_box_world(pos_b, rot_b=None, he_a=(0.3, 0.3, 0.1), he_b=(0.2, 0.2, 0.1)):
  world = World(dt=0.002)
  world.add_box(he_a, mass=2.0, pos=(0.0, 0.0, 1.0), name="a")
  world.add_box(he_b, mass=1.0, pos=tuple(pos_b), name="b")
  scene = world.compile()
  s = scene.init_state()
  if rot_b is not None:
    q = s.q.at[10:14].set(jnp.asarray(rot_b, s.q.dtype))
    s = s.replace(q=q)
  return scene, s


def _collide(scene, s):
  kin = dynamics.fk(scene.model, s.q, s.u)
  return coll.collide(scene.geoms, scene.pairs, kin, None)


class TestBoxBoxNarrowPhase:
  def test_face_case_depth_and_normal(self):
    # B sits on top of A, overlapping 0.02 in z: expect 4 active face contacts
    # with normal +z (B->A is -z... convention: normal points B towards A).
    scene, s = _two_box_world(pos_b=(0.0, 0.0, 1.0 + 0.1 + 0.1 - 0.02))
    cs = _collide(scene, s)
    # isolate the box-box pair slots (9 of them; the plane pairs don't exist here)
    act = np.asarray(cs.active)
    dep = np.asarray(cs.depth)
    nrm = np.asarray(cs.normal)
    assert act.sum() == 4, f"expected 4 face contacts, got {act.sum()}"
    for k in np.nonzero(act)[0]:
      assert abs(dep[k] - 0.02) < 1e-5
      # A is body_a (lower box): normal B->A = -z
      np.testing.assert_allclose(nrm[k], [0, 0, -1], atol=1e-6)

  def test_separated_no_contacts(self):
    scene, s = _two_box_world(pos_b=(0.0, 0.0, 1.5))
    cs = _collide(scene, s)
    assert float(jnp.sum(cs.active)) == 0.0

  def test_corner_overhang_clamped(self):
    # B overhangs A's +x edge: contact points must stay inside A's top face.
    scene, s = _two_box_world(pos_b=(0.35, 0.0, 1.0 + 0.2 - 0.01))
    cs = _collide(scene, s)
    act = np.asarray(cs.active)
    pos = np.asarray(cs.pos)
    assert act.sum() >= 1
    for k in np.nonzero(act)[0]:
      assert pos[k, 0] <= 0.3 + 1e-5, "contact outside reference face"

  def test_edge_case_rotated(self):
    # B rotated 45 deg about z, deep enough that edge axes compete; the kernel
    # must produce a penetrating manifold with a unit normal either way.
    c = np.cos(np.pi / 8)
    sz = np.sin(np.pi / 8)
    scene, s = _two_box_world(
        pos_b=(0.45, 0.0, 1.0), rot_b=(c, 0.0, 0.0, sz), he_b=(0.2, 0.2, 0.1)
    )
    cs = _collide(scene, s)
    act = np.asarray(cs.active)
    assert act.sum() >= 1
    for k in np.nonzero(act)[0]:
      n = np.asarray(cs.normal)[k]
      assert abs(np.linalg.norm(n) - 1.0) < 1e-4


class TestBoxStack:
  def test_three_box_stack_stable(self):
    """The r1 acceptance test: 3-box stack stays up for a long simulation."""
    world = World(dt=0.002)
    world.add_ground()
    zs = []
    z = 0.0
    for i, he in enumerate([(0.25, 0.25, 0.12), (0.2, 0.2, 0.1), (0.15, 0.15, 0.08)]):
      z += he[2]
      world.add_box(he, mass=1.0, pos=(0.005 * i, -0.003 * i, z + 0.002), name=f"b{i}")
      zs.append(z)
      z += he[2]
    scene = world.compile()
    s0 = scene.init_state()

    @jax.jit
    def run(s):
      def body(s, _):
        return scene.step(s), None
      s, _ = jax.lax.scan(body, s, None, length=2500)  # 5 s sim
      return s

    sf = run(s0)
    q = np.asarray(sf.q)
    for i, z_expect in enumerate(zs):
      z_i = q[7 * i + 2]
      assert abs(z_i - z_expect) < 0.02, f"box {i} settled at {z_i} vs {z_expect}"
      # stack hasn't slid apart
      assert abs(q[7 * i]) < 0.08 and abs(q[7 * i + 1]) < 0.08

  def test_tilted_box_comes_to_rest(self):
    # box dropped tilted 30 deg onto a grounded big box: settles without tunnelling
    ang = np.pi / 6
    world = World(dt=0.002)
    world.add_ground()
    world.add_box((0.5, 0.5, 0.1), mass=5.0, pos=(0.0, 0.0, 0.1), name="a")
    world.add_box((0.1, 0.1, 0.1), mass=1.0, pos=(0.0, 0.0, 0.45), name="b")
    scene = world.compile()
    s = scene.init_state()
    s = s.replace(
        q=s.q.at[10:14].set(
            jnp.asarray([np.cos(ang / 2), np.sin(ang / 2), 0.0, 0.0], s.q.dtype)
        )
    )

    @jax.jit
    def run(s):
      def body(s, _):
        return scene.step(s), None
      s, _ = jax.lax.scan(body, s, None, length=2000)
      return s

    sf = run(s)
    zb = float(sf.q[9])
    assert 0.25 < zb < 0.45, f"tilted box at z={zb}"
    assert float(jnp.max(jnp.abs(sf.u[6:]))) < 0.5  # settled


class TestBroadPhase:
  def test_aabb_mask_matches_distance(self):
    scene, s = _two_box_world(pos_b=(0.0, 0.0, 1.15))
    kin = dynamics.fk(scene.model, s.q, s.u)
    mask = coll.broadphase_mask(scene.geoms, scene.pairs, kin)
    assert bool(mask[0])  # overlapping AABBs
    scene2, s2 = _two_box_world(pos_b=(2.0, 0.0, 1.0))
    kin2 = dynamics.fk(scene2.model, s2.q, s2.u)
    mask2 = coll.broadphase_mask(scene2.geoms, scene2.pairs, kin2)
    assert not bool(mask2[0])

  def test_rotated_box_aabb_covers(self):
    # 45-deg rotated box: AABB must still cover the rotated extents
    c = np.cos(np.pi / 8)
    sz = np.sin(np.pi / 8)
    scene, s = _two_box_world(pos_b=(0.48, 0.0, 1.1), rot_b=(c, 0.0, 0.0, sz))
    kin = dynamics.fk(scene.model, s.q, s.u)
    lo, hi = coll.geom_aabb(scene.geoms, 1, kin)
    half_diag = 0.2 * np.sqrt(2.0)
    assert float(hi[0]) >= 0.48 + half_diag - 1e-4
