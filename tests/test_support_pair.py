"""Generic support-function narrow phase (round 4 — closes the C6 pair matrix).

The reference reaches box/cylinder/cone/mesh cross pairs through ODE's
dCollide + libccd support callbacks; our single `_support_pair` kernel covers
every convex-convex pair via a sampled separating-axis search with local
refinement and a 4-slot perturbed-support manifold. These tests validate the
kernel against analytic pair kernels, then run the acceptance sims the
round-3 verdict asked for: a cylinder resting on a tilted box ramp, a mesh
cube resting on a box, a capsule resting on a box top without oscillation,
and a cone resting base-down on the plane.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.ops import collision as coll
from raisimlib_tpu.ops import dynamics
from raisimlib_tpu.world import World


def _collide(scene, s):
  kin = dynamics.fk(scene.model, s.q, s.u)
  return coll.collide(scene.geoms, scene.pairs, kin, None)


def _settle(scene, s, n=600):
  @jax.jit
  def roll(s):
    def body(s, _):
      return scene.step(s), None
    return jax.lax.scan(body, s, None, length=n)[0]

  return roll(s)


def _axis_angle_quat(axis, ang):
  axis = np.asarray(axis, np.float64)
  axis = axis / np.linalg.norm(axis)
  return np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])


class TestSupportPrimitives:
  def test_support_points_box_cylinder_cone(self):
    world = World(dt=0.002)
    world.add_box((0.2, 0.3, 0.4), 1.0, pos=(0, 0, 0), name="b")
    world.add_cylinder(0.1, 0.25, 1.0, pos=(0, 0, 0), name="cy")
    world.add_cone(0.2, 0.4, 1.0, pos=(0, 0, 0), name="co")
    scene = world.compile(joint_limits=False)
    s = scene.init_state()
    kin = dynamics.fk(scene.model, s.q, s.u)
    D = jnp.asarray(np.array([[1.0, 1.0, 1.0], [0.0, 0.0, -1.0]]) /
                    np.array([[np.sqrt(3.0)], [1.0]]), s.q.dtype)
    box_pts = np.asarray(coll.support_points(scene.geoms, 0, kin, D))
    np.testing.assert_allclose(box_pts[0], [0.2, 0.3, 0.4], atol=1e-6)
    cyl_pts = np.asarray(coll.support_points(scene.geoms, 1, kin, D))
    np.testing.assert_allclose(
        cyl_pts[0], [0.1 / np.sqrt(2), 0.1 / np.sqrt(2), 0.25], atol=1e-6)
    np.testing.assert_allclose(cyl_pts[1][2], -0.25, atol=1e-6)
    cone_pts = np.asarray(coll.support_points(scene.geoms, 2, kin, D))
    np.testing.assert_allclose(cone_pts[1][2], -0.1, atol=1e-6)  # base ring z

  def test_support_pair_matches_analytic_capsules(self):
    # two crossing capsules, penetrating: the generic kernel's depth/normal
    # must match the analytic segment-segment kernel
    world = World(dt=0.002)
    # offset in y so the segments do not intersect (an exact crossing makes
    # the MTV direction degenerate and the analytic kernel's normal arbitrary)
    world.add_capsule(0.1, 0.3, 1.0, pos=(0.0, 0.0, 0.0), name="ca")
    world.add_capsule(0.1, 0.3, 1.0, pos=(0.05, 0.12, 0.15), name="cb")
    scene = world.compile(joint_limits=False)
    s = scene.init_state()
    # rotate capsule B to lie along x (quat about y by 90deg)
    q = np.array(s.q)
    q[10:14] = _axis_angle_quat([0, 1, 0], np.pi / 2)
    s = s.replace(q=jnp.asarray(q, s.q.dtype))
    kin = dynamics.fk(scene.model, s.q, s.u)
    analytic = coll._capsule_capsule(scene.geoms, 0, 1, kin)
    (pos_a, n_a, d_a, _), = analytic
    generic = coll._support_pair(scene.geoms, 0, 1, kin)
    d_g = max(float(d) for _, _, d, _ in generic)
    n_g = np.asarray(generic[0][1])
    assert abs(d_g - float(d_a)) < 3e-3, (d_g, float(d_a))
    assert np.dot(n_g, np.asarray(n_a)) > 0.99, (n_g, np.asarray(n_a))

  def test_no_unsupported_primitive_pairs(self):
    # every built-in primitive pair has a kernel: candidate_pairs must not warn
    world = World(dt=0.002)
    world.add_ground()
    world.add_sphere(0.1, 1.0, pos=(0, 0, 0.5), name="s")
    world.add_box((0.1, 0.1, 0.1), 1.0, pos=(1, 0, 0.5), name="b")
    world.add_capsule(0.1, 0.2, 1.0, pos=(2, 0, 0.5), name="ca")
    world.add_cylinder(0.1, 0.2, 1.0, pos=(3, 0, 0.5), name="cy")
    world.add_cone(0.1, 0.3, 1.0, pos=(4, 0, 0.5), name="co")
    cube = np.array([[sx, sy, sz] for sx in (-0.1, 0.1)
                     for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)])
    world.add_mesh(cube, 1.0, pos=(5, 0, 0.5), name="m")
    with warnings.catch_warnings():
      warnings.simplefilter("error")     # any candidate_pairs warning -> fail
      scene = world.compile(joint_limits=False)
    # all 15 cross pairs + 6 vs-plane pairs present
    assert len(scene.pairs) == 21, len(scene.pairs)


class TestRestingAcceptance:
  def test_cylinder_rests_on_box_ramp(self):
    # 10-degree ramp (tilted box), cylinder axis along the downhill direction:
    # friction (mu=0.8 > tan 10deg) holds it; it must neither tunnel nor sink
    ang = np.deg2rad(10.0)
    c, si = np.cos(ang), np.sin(ang)
    Ry = np.array([[c, 0.0, si], [0.0, 1.0, 0.0], [-si, 0.0, c]])
    world = World(dt=0.002)
    world.add_box((1.5, 1.0, 0.1), 0.0, pos=(0.0, 0.0, 0.5), rot=Ry,
                  static=True, name="ramp")
    world.add_cylinder(0.1, 0.25, 1.0, pos=(0.0, 0.0, 1.2), name="cyl")
    scene = world.compile(joint_limits=False)
    s = scene.init_state()
    q = np.array(s.q)
    # cylinder lies along the slope (axis = downhill direction): friction
    # mu=0.8 > tan(10deg) holds it against sliding; the axis orientation
    # prevents rolling downhill
    q[3:7] = _axis_angle_quat([0, 1, 0], np.pi / 2 + ang)
    q[0:3] = [0.0, 0.0, 0.5 + (0.1 + 0.1) / np.cos(ang) + 0.05]
    s = s.replace(q=jnp.asarray(q, s.q.dtype))
    sf = _settle(scene, s, n=600)
    qf = np.asarray(sf.q)
    # distance from cylinder axis to the ramp top plane ~= radius (no sink/tunnel)
    nrm = np.array([si, 0.0, c])                # ramp top-plane normal (Ry@ez)
    ramp_top = np.array([0.0, 0.0, 0.5]) + nrm * 0.1
    dist = float(nrm @ (qf[0:3] - ramp_top))
    assert 0.07 < dist < 0.13, dist
    # still on the ramp (did not roll/slide off)
    assert abs(qf[0]) < 0.9 and abs(qf[1]) < 0.9, qf[0:3]

  def test_mesh_cube_rests_on_box(self):
    cube = np.array([[sx, sy, sz] for sx in (-0.1, 0.1)
                     for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)])
    world = World(dt=0.002)
    world.add_box((0.4, 0.4, 0.2), 0.0, pos=(0.0, 0.0, 0.2), static=True,
                  name="base")
    world.add_mesh(cube, 1.0, pos=(0.0, 0.0, 0.58), name="cube")
    scene = world.compile(joint_limits=False)
    sf = _settle(scene, scene.init_state(), n=600)
    qf = np.asarray(sf.q)
    # cube rests face-down on the box top: z = 0.4 (box top) + 0.1
    assert abs(qf[2] - 0.5) < 0.02, qf[0:3]
    # orientation stayed flat
    assert abs(abs(qf[3]) - 1.0) < 0.02, qf[3:7]

  def test_capsule_rests_on_box_without_oscillation(self):
    world = World(dt=0.002)
    world.add_box((0.5, 0.5, 0.2), 0.0, pos=(0.0, 0.0, 0.2), static=True,
                  name="base")
    world.add_capsule(0.08, 0.2, 1.0, pos=(0.0, 0.0, 0.52), name="cap")
    scene = world.compile(joint_limits=False)
    s = scene.init_state()
    q = np.array(s.q)
    q[3:7] = _axis_angle_quat([0, 1, 0], np.pi / 2)   # lying along x
    s = s.replace(q=jnp.asarray(q, s.q.dtype))
    sf = _settle(scene, s, n=800)
    qf, uf = np.asarray(sf.q), np.asarray(sf.u)
    # resting height = box top + radius; no residual rattling/rocking (weak
    # #5). u[2] (spin about the capsule's own axis = rolling) is excluded:
    # Coulomb friction provides no rolling resistance, so an f32-seeded roll
    # of a few cm/s never damps — identical behavior to the analytic
    # capsule-plane kernel.
    assert abs(qf[2] - 0.48) < 0.02, qf[0:3]
    assert np.abs(uf[[0, 1, 3, 4, 5]]).max() < 0.02, uf
    assert abs(uf[2]) < 0.2, uf

  def test_cone_rests_base_down_on_plane(self):
    world = World(dt=0.002)
    world.add_ground()
    world.add_cone(0.2, 0.4, 1.0, pos=(0.0, 0.0, 0.3), name="cone")
    scene = world.compile(joint_limits=False)
    sf = _settle(scene, scene.init_state(), n=600)
    qf, uf = np.asarray(sf.q), np.asarray(sf.u)
    # base ring at z=0 -> COM at +0.25*h = 0.1
    assert abs(qf[2] - 0.1) < 0.01, qf[:3]
    assert np.abs(uf).max() < 0.05, uf


class TestSupportPairFuzz:
  """Randomized oracle check: _support_pair's depth against a dense
  separating-axis oracle (4096 f64 directions) on random convex pairs of
  every support-mapped type. Bounds the whole search pipeline — grid,
  refinement, feature-normal snap — not just the hand-picked cases."""

  def test_depth_matches_dense_sat_oracle(self):
    rng = np.random.default_rng(12)
    # dense direction set for the oracle
    k = np.arange(4096)
    phi = np.pi * (3.0 - np.sqrt(5.0)) * k
    z = 1.0 - 2.0 * (k + 0.5) / len(k)
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    DIRS = np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)

    def rand_quat():
      q = rng.normal(size=4)
      return q / np.linalg.norm(q)

    adders = [
        lambda w, p, n: w.add_box((0.2, 0.15, 0.1), 1.0, pos=p, name=n),
        lambda w, p, n: w.add_capsule(0.08, 0.2, 1.0, pos=p, name=n),
        lambda w, p, n: w.add_cylinder(0.1, 0.15, 1.0, pos=p, name=n),
        lambda w, p, n: w.add_cone(0.15, 0.3, 1.0, pos=p, name=n),
    ]
    checked = 0
    for trial in range(12):
      ia, ib = rng.integers(0, len(adders), 2)
      world = World(dt=0.002, dtype=jnp.float64)
      adders[ia](world, (0.0, 0.0, 0.0), "a")
      off = rng.normal(size=3) * 0.12
      adders[ib](world, tuple(off), "b")
      scene = world.compile(joint_limits=False)
      s = scene.init_state()
      q = np.array(s.q)
      q[3:7] = rand_quat()
      q[10:14] = rand_quat()
      s = s.replace(q=jnp.asarray(q, jnp.float64))
      kin = dynamics.fk(scene.model, s.q, s.u)
      gi, gj = scene.pairs[0]
      # oracle: min_d [h_A(d) + h_B(-d)] over the dense set
      D = jnp.asarray(DIRS, jnp.float64)
      sA = coll.support_points(scene.geoms, gi, kin, D)
      sB = coll.support_points(scene.geoms, gj, kin, -D)
      h = np.asarray(jnp.sum(D * (sA - sB), axis=1))
      depth_oracle = float(h.min())
      out = coll._support_pair(scene.geoms, gi, gj, kin)
      depth_kernel = max(float(d) for _, _, d, _ in out)
      if depth_oracle > 0.01:            # clearly penetrating
        # both are sampled searches: the oracle's 4096 directions resolve
        # ~0.055 rad (h error up to ~1.6e-2 on flat features, where h grows
        # linearly in the angle), and the kernel's refinement routinely
        # lands BELOW the oracle. Agree within the combined resolution.
        assert depth_kernel == pytest.approx(depth_oracle, abs=1.2e-2), (
            trial, depth_kernel, depth_oracle)
        checked += 1
      elif depth_oracle < -0.01:         # clearly separated
        assert depth_kernel <= 0.005, (trial, depth_kernel, depth_oracle)
        checked += 1
    assert checked >= 6, checked          # the fuzz actually exercised cases


class TestMeshExactness:
  """Round-5 verdict #6: quantitative mesh depth accuracy via the
  supporting-face normal snap, plus the hull-subsample error bound."""

  def test_mesh_cube_on_box_depth_under_1mm(self):
    """Narrow-phase direct check: a mesh cube overlapping a box top by a
    known 5 mm must report depth within 1 mm, normal along +z."""
    cube = np.array([[sx, sy, sz] for sx in (-0.1, 0.1)
                     for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)])
    delta = 0.005
    world = World(dt=0.002)
    world.add_box((0.4, 0.4, 0.2), 0.0, pos=(0.0, 0.0, 0.2), static=True,
                  name="base")
    # slight yaw so no axis aligns exactly (the hard case for sampled SAT)
    world.add_mesh(cube, 1.0, pos=(0.03, -0.02, 0.4 + 0.1 - delta),
                   name="cube")
    scene = world.compile(joint_limits=False)
    s = scene.init_state()
    q = np.array(s.q)
    c, si = np.cos(0.15), np.sin(0.15)
    q[3:7] = [c, 0.0, 0.0, si]           # yaw 0.3 rad about z
    s = s.replace(q=jnp.asarray(q, s.q.dtype))
    kin = dynamics.fk(scene.model, s.q, s.u)
    contacts = coll.collide(scene.geoms, scene.pairs, kin)
    dep = np.asarray(contacts.depth)
    act = np.asarray(contacts.active) > 0.5
    nrm = np.asarray(contacts.normal)
    assert act.any()
    deepest = dep[act].max()
    assert abs(deepest - delta) < 1e-3, (deepest, delta)
    # every active contact's normal is the face normal (+z up to sign conv.)
    nz = np.abs(nrm[act][:, 2])
    assert (nz > 0.999).all(), nrm[act]

  def test_dense_mesh_hull_sample_error_bound(self):
    """162-vert icosphere subsampled by hull_support_sample: the support-
    function error is QUANTIFIED (was only named as 'conservative' in C6):
    measured over 500 directions it is ~0.11 r at k=32 — consistent with
    r*(1 - cos(theta_k)) for the ~0.47 rad worst nearest-sample angle of 32
    Fibonacci directions — and scales ~1/k (measured rel err 0.21 / 0.11 /
    0.07 / 0.04 at k = 16 / 32 / 64 / 128)."""
    rng = np.random.RandomState(0)
    # icosphere-ish: 162 unit directions (fibonacci), radius 0.2
    n, r = 162, 0.2
    k = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * k / n)
    theta = np.pi * (1 + 5**0.5) * k
    V = r * np.stack([np.cos(theta) * np.sin(phi),
                      np.sin(theta) * np.sin(phi), np.cos(phi)], 1)
    D = rng.randn(500, 3)
    D /= np.linalg.norm(D, axis=1, keepdims=True)

    def err(kk):
      Vs = coll.hull_support_sample(V, kk)
      return ((D @ V.T).max(axis=1) - (D @ Vs.T).max(axis=1)).max()

    e32 = err(coll.MAX_MESH_VERTS)
    assert e32 < 0.12 * r, (e32, 0.12 * r)
    # ~1/k convergence: doubling the budget must at least halve-ish the error
    assert err(64) < 0.66 * e32

  def test_dense_mesh_rests_on_box(self):
    """>=100-vert mesh (pre-sample) resting on a box settles and stays."""
    n, r = 162, 0.15
    k = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * k / n)
    theta = np.pi * (1 + 5**0.5) * k
    V = r * np.stack([np.cos(theta) * np.sin(phi),
                      np.sin(theta) * np.sin(phi), np.cos(phi)], 1)
    world = World(dt=0.002)
    world.add_box((0.5, 0.5, 0.2), 0.0, pos=(0.0, 0.0, 0.2), static=True,
                  name="base")
    world.add_mesh(V, 1.0, pos=(0.0, 0.0, 0.4 + r + 0.02), name="ball")
    scene = world.compile(joint_limits=False)
    sf = _settle(scene, scene.init_state(), n=800)
    qf = np.asarray(sf.q)
    # rests ON the box top at ~r above it (sampled-hull r may be a few % low)
    assert 0.4 + 0.9 * r < qf[2] < 0.4 + 1.1 * r, qf[0:3]
    assert abs(qf[0]) < 0.45 and abs(qf[1]) < 0.45
