"""Fused full-step Pallas megakernel (round 4, ops/pallas_step.py).

CPU tests run the kernel in interpret mode, which scales badly with model
size — so parity here uses TINY scenes (a cartpole, a sphere on the plane,
a 2-dof arm with limits); the ANYmal-scale parity runs on real TPU hardware
via the bench/verify drives. Together they cover: smooth dynamics (FK, RNEA,
CRBA, implicit PD, integration), contact rows (sphere/box vs plane), joint
limits, eligibility gating, and the custom-VJP gradient path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu.models.model import JointType
from raisimlib_tpu.ops import pipeline
from raisimlib_tpu.ops import pallas_step
from raisimlib_tpu.world import World

F32 = jnp.float32


def _cartpole_world():
  world = World(dt=0.01, dtype=F32)
  bodies = [
      dict(parent=-1, joint=JointType.PRISMATIC, axis=[1, 0, 0], mass=1.0,
           com=[0, 0, 0], inertia=np.zeros((3, 3)), name="cart",
           torque_limit=50.0),
      dict(parent=0, joint=JointType.REVOLUTE, axis=[0, 1, 0], mass=0.2,
           com=[0, 0, 0.3], inertia=0.2 * 0.09 * np.eye(3), name="pole",
           actuated=False),
  ]
  world.add_articulated_system(bodies, name="cartpole")
  return world.compile(joint_limits=False)


def _sphere_world():
  world = World(dt=0.002, dtype=F32)
  world.add_ground()
  world.add_sphere(0.1, 1.0, pos=(0.0, 0.0, 0.12))
  return world.compile(joint_limits=False)


def _batch(scene, B, seed=0, dq=0.01, du=0.05):
  rng = np.random.RandomState(seed)
  s0 = scene.init_state()
  qs = np.tile(np.asarray(s0.q)[None], (B, 1)).astype(np.float32)
  # perturb only non-quaternion coords; renormalize any quats after
  qs += dq * rng.randn(*qs.shape).astype(np.float32)
  from raisimlib_tpu.models.model import JointType as JT

  for b in range(scene.model.nb):
    if JT(scene.model.joint_types[b]) == JT.FREE:
      qa = scene.model.q_adr[b]
      qs[:, qa + 3:qa + 7] /= np.linalg.norm(
          qs[:, qa + 3:qa + 7], axis=1, keepdims=True)
  us = du * rng.randn(B, scene.model.nv).astype(np.float32)
  return s0.__class__(q=jnp.asarray(qs), u=jnp.asarray(us),
                      t=jnp.zeros((B,), F32))


class TestParity:
  def test_cartpole_smooth_parity(self):
    scene = _cartpole_world().set_pd_gains(10.0, 0.5)
    fused = pallas_step.make_step_batch_fused(scene)
    B = 4
    s = _batch(scene, B, dq=0.3, du=0.3)
    tau = jnp.zeros((B, 2), F32)
    pd = jnp.asarray(0.2 * np.random.RandomState(1).randn(B, 2), F32)
    sA = jax.jit(lambda s: pipeline.step_batch(scene, s, tau, pd))(s)
    sB = jax.jit(lambda s: fused(s, tau, pd))(s)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=2e-6)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=2e-4)

  def test_sphere_contact_parity_rollout(self):
    scene = _sphere_world()
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 4
    s = _batch(scene, B, dq=0.005, du=0.2)
    tau = jnp.zeros((B, 6), F32)

    def roll(stepfn, s):
      def body(s, _):
        return stepfn(s), None
      return jax.lax.scan(body, s, None, length=30)[0]

    sA = jax.jit(lambda s: roll(
        lambda x: pipeline.step_batch(scene, x, tau, None), s))(s)
    sB = jax.jit(lambda s: roll(lambda x: fused(x, tau), s))(s)
    # 30 contact steps: bouncing/sticking trajectories must track closely
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=5e-4)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=5e-3)
    # physical: spheres rest on the plane at z ~= r
    assert np.all(np.asarray(sB.q)[:, 2] > 0.09)

  def test_limit_rows_parity(self):
    world = World(dt=0.005, dtype=F32)
    bodies = [
        dict(parent=-1, joint=JointType.REVOLUTE, axis=[0, 1, 0], mass=1.0,
             com=[0, 0, 0.2], inertia=0.04 * np.eye(3), name="link1",
             q_lo=-0.5, q_hi=0.5, torque_limit=20.0),
        dict(parent=0, joint=JointType.REVOLUTE, axis=[0, 1, 0], mass=0.5,
             com=[0, 0, 0.2], inertia=0.02 * np.eye(3), pos=[0, 0, 0.4],
             name="link2", q_lo=-0.3, q_hi=0.3, torque_limit=20.0),
    ]
    world.add_articulated_system(bodies, name="arm")
    scene = world.compile(joint_limits=True)
    assert scene.constraints.n_rows == 2
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 4
    s = _batch(scene, B, dq=0.2, du=1.0)    # inside the limits, moving fast
    # constant torques driving every joint OUT toward its limits
    tau = jnp.asarray(np.array([[5.0, 3.0], [-5.0, 3.0],
                                [5.0, -3.0], [-5.0, -3.0]]), F32)

    def roll(stepfn, s):
      def body(s, _):
        return stepfn(s), None
      return jax.lax.scan(body, s, None, length=60)[0]

    sA = jax.jit(lambda s: roll(
        lambda x: pipeline.step_batch(scene, x, tau, None), s))(s)
    sB = jax.jit(lambda s: roll(lambda x: fused(x, tau), s))(s)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=2e-3)
    # limits enforced (one-step lookahead allows tiny transient overshoot)
    assert np.all(np.abs(np.asarray(sB.q)[:, 0]) < 0.55), sB.q
    assert np.all(np.abs(np.asarray(sB.q)[:, 1]) < 0.35), sB.q


class TestEligibility:
  def test_anymal_scene_is_eligible(self):
    from raisimlib_tpu.models import anymal
    from raisimlib_tpu.models.urdf import load_urdf

    bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
    world = World(dt=0.0025, dtype=F32)
    world.add_articulated_system(bodies, name="anymal", geoms=geoms)
    world.add_ground()
    scene = world.compile().set_pd_gains(100.0, 2.0)
    sd = pallas_step._analyze(scene, pipeline.StepConfig(), use_pd=True)
    assert len(sd.slots) == 12           # 8 base-box corners + 4 feet
    assert len(sd.limits) == 12

  def test_unsupported_cross_pair_falls_back(self):
    # every geom now has heightmap probes in the fused class (r5); what
    # stays outside are support-function CROSS pairs (here mesh-vs-mesh)
    # -> clean fallback for the whole scene
    from raisimlib_tpu.utils import terrain

    cube = np.array([[sx, sy, sz] for sx in (-0.1, 0.1)
                     for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)])
    world = World(dt=0.002, dtype=F32)
    world.add_heightmap(terrain.flat(0.0))
    world.add_mesh(cube, 1.0, pos=(0, 0, 0.5), name="m1")
    world.add_mesh(cube, 1.0, pos=(0.5, 0, 0.5), name="m2")
    scene = world.compile(joint_limits=False)
    with pytest.raises(pallas_step.FusedStepUnsupported):
      pallas_step.make_step_batch_fused(scene, use_pd=False)

  def _hm_world(self, riser=True, nsamp=17):
    import jax as _jax
    from raisimlib_tpu.utils import terrain

    field = terrain.generate(
        _jax.random.PRNGKey(3),
        terrain.TerrainProperties(z_scale=0.15, x_size=4.0, y_size=4.0,
                                  x_samples=nsamp, y_samples=nsamp),
        dtype=F32)
    if riser:
      H = np.asarray(field.heights).copy()
      H[10:, :] += 0.25                     # step band: march gates fire
      field = field.replace(heights=jnp.asarray(H))
    world = World(dt=0.002, dtype=F32)
    world.add_heightmap(field)
    world.add_sphere(0.1, 1.0, pos=(0.0, 0.0, 0.5))
    return world.compile(joint_limits=False), field

  def _hm_batch(self, scene, B):
    rng = np.random.RandomState(0)
    s0 = scene.init_state()
    qs = np.tile(np.asarray(s0.q)[None], (B, 1)).astype(np.float32)
    qs[:, 0] = np.linspace(-1.2, 1.2, B)
    qs[:, 1] = rng.uniform(-1.0, 1.0, B)
    qs[:, 2] = 0.28 + 0.1 * rng.rand(B)
    qs[:, 3:7] /= np.linalg.norm(qs[:, 3:7], axis=1, keepdims=True)
    us = 0.5 * rng.randn(B, scene.model.nv).astype(np.float32)
    us[:, 3] = 2.0                          # drive toward the riser band
    return s0.__class__(q=jnp.asarray(qs), u=jnp.asarray(us),
                        t=jnp.zeros((B,), F32))

  def test_heightmap_parity_rollout(self):
    """Fused in-kernel terrain narrow phase (incl. the riser march) vs the
    phase-split path, 5-step rollout over a bumpy field with a step band
    (round-5 verdict #2)."""
    scene, _ = self._hm_world()
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 8
    s = self._hm_batch(scene, B)
    tau = jnp.zeros((B, scene.model.nv), F32)

    def roll(stepfn, s, n=5):
      for _ in range(n):
        s = stepfn(s)
      return s

    sA = roll(lambda st: pipeline.step_batch(scene, st, tau, None), s)
    sB = roll(lambda st: fused(st, tau, None), s)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=5e-6)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=5e-4)

  def test_heightmap_parity_batched_terrains(self):
    """Per-world heights (batched terrain scenarios) through the fused patch
    operand vs pipeline.step_batch(field_heights=...)."""
    import jax as _jax
    from raisimlib_tpu.utils import terrain

    scene, field = self._hm_world(riser=False)
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 4
    s = self._hm_batch(scene, B)
    tau = jnp.zeros((B, scene.model.nv), F32)
    keys = _jax.random.split(_jax.random.PRNGKey(9), B)
    hts = _jax.vmap(lambda k: terrain.generate(
        k, terrain.TerrainProperties(z_scale=0.2, x_size=4.0, y_size=4.0,
                                     x_samples=17, y_samples=17),
        dtype=F32).heights)(keys)
    sA = pipeline.step_batch(scene, s, tau, None, field_heights=hts)
    sB = fused(s, tau, None, field_heights=hts)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=5e-6)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=5e-4)

  def test_dyn_builder_auto_fallback(self):
    # make_contact_dyn_batch(fused="auto") on an ineligible scene still works
    from raisimlib_tpu.mpc.state_map import make_contact_dyn_batch
    from raisimlib_tpu.utils import terrain

    world = World(dt=0.005, dtype=F32)
    world.add_heightmap(terrain.flat(0.0))
    world.add_sphere(0.1, 1.0, pos=(0, 0, 0.3))
    scene = world.compile(joint_limits=False)
    dyn_b, nx, nu = make_contact_dyn_batch(scene, control_dt=0.005,
                                           substeps=1, use_pd=False)
    x = jnp.zeros((2, nx), F32).at[:, 2].set(0.3).at[:, 3].set(1.0)
    out = jax.jit(dyn_b)(x, jnp.zeros((2, max(nu, 1)))[:, :nu],
                         jnp.asarray(0))
    assert out.shape == (2, nx) and np.isfinite(np.asarray(out)).all()


class TestGradients:
  def test_custom_vjp_matches_pure_gradient(self):
    scene = _sphere_world()
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 2
    s = _batch(scene, B, dq=0.004, du=0.1)
    tau = jnp.zeros((B, 6), F32)

    def loss_fused(u0):
      out = fused(s.replace(u=u0), tau)
      return jnp.sum(out.q[:, 2] ** 2)

    def loss_pure(u0):
      out = pipeline.step_batch(scene, s.replace(u=u0), tau, None)
      return jnp.sum(out.q[:, 2] ** 2)

    gF = jax.jit(jax.grad(loss_fused))(s.u)
    gP = jax.jit(jax.grad(loss_pure))(s.u)
    np.testing.assert_allclose(np.asarray(gF), np.asarray(gP),
                               rtol=2e-3, atol=1e-5)


class TestSublanePacking:
  """pack > 1 lays several worlds on the sublane axis of every per-world
  scalar (8x VPU occupancy on hardware; measured bitwise-identical there).
  Lock the pack path's shape handling + parity in CI via interpret mode."""

  def test_pack_matches_unpacked(self):
    scene = _sphere_world()
    B = 4
    s = _batch(scene, B, dq=0.005, du=0.2)
    tau = jnp.zeros((B, 6), F32)
    # tiny tile keeps interpret-mode cost trivial; hardware uses tile=128
    f1 = pallas_step.make_step_batch_fused(scene, use_pd=False, tile=8,
                                           pack=1)
    f4 = pallas_step.make_step_batch_fused(scene, use_pd=False, tile=8,
                                           pack=4)
    o1 = jax.jit(lambda s: f1(s, tau))(s)
    o4 = jax.jit(lambda s: f4(s, tau))(s)
    np.testing.assert_array_equal(np.asarray(o1.q), np.asarray(o4.q))
    np.testing.assert_array_equal(np.asarray(o1.u), np.asarray(o4.u))


class TestRuntimeFramePairs:
  """Round-4 extension: the fused kernel's scene class includes capsule-vs-
  plane (static endpoint slots), sphere-vs-sphere, and sphere-vs-box pairs
  with RUNTIME contact frames — the full sphere+box stack config (BASELINE
  config 2) runs fused."""

  def test_stack_config_parity_rollout(self):
    world = World(dt=0.002, dtype=F32)
    world.add_ground()
    world.add_box((0.1, 0.1, 0.1), 2.0, pos=(0.0, 0.0, 0.1))
    world.add_sphere(0.08, 1.0, pos=(0.02, 0.0, 0.29))
    scene = world.compile(joint_limits=False)
    sd = pallas_step._analyze(scene, pipeline.StepConfig(), use_pd=False)
    assert sorted(s.kind for s in sd.slots) == (
        ["plane_pt"] * 9 + ["sb"])       # 8 box corners + sphere-plane + sb
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 4
    s = _batch(scene, B, dq=0.003, du=0.1)
    tau = jnp.zeros((B, 12), F32)

    def roll(stepfn, s):
      def body(s, _):
        return stepfn(s), None
      return jax.lax.scan(body, s, None, length=40)[0]

    sA = jax.jit(lambda s: roll(
        lambda x: pipeline.step_batch(scene, x, tau, None), s))(s)
    sB = jax.jit(lambda s: roll(lambda x: fused(x, tau), s))(s)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=2e-2)
    # physical: sphere stays stacked on the box (z ~ 0.2 + 0.08)
    assert np.all(np.asarray(sB.q)[:, 2 + 7] > 0.2), np.asarray(sB.q)[:, 9]

  def test_sphere_sphere_and_capsule_plane_parity(self):
    world = World(dt=0.002, dtype=F32)
    world.add_ground()
    world.add_sphere(0.1, 1.0, pos=(0.0, 0.0, 0.11), name="a")
    world.add_sphere(0.1, 1.0, pos=(0.12, 0.0, 0.28), name="b")
    world.add_capsule(0.06, 0.15, 0.5, pos=(1.0, 0.0, 0.07), name="c")
    scene = world.compile(joint_limits=False)
    sd = pallas_step._analyze(scene, pipeline.StepConfig(), use_pd=False)
    assert sorted(s.kind for s in sd.slots) == (
        ["plane_pt"] * 4 + ["sc"] * 2 + ["ss"])
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 3
    s = _batch(scene, B, dq=0.002, du=0.05)
    tau = jnp.zeros((B, 18), F32)

    def roll(stepfn, s):
      def body(s, _):
        return stepfn(s), None
      return jax.lax.scan(body, s, None, length=30)[0]

    sA = jax.jit(lambda s: roll(
        lambda x: pipeline.step_batch(scene, x, tau, None), s))(s)
    sB = jax.jit(lambda s: roll(lambda x: fused(x, tau), s))(s)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=1e-3)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=2e-2)


class TestSphericalJoint:
  def test_spherical_pendulum_parity(self):
    # FREE-rooted? no — a world-anchored ball joint swinging under gravity
    world = World(dt=0.005, dtype=F32)
    bodies = [
        dict(parent=-1, joint=JointType.SPHERICAL, mass=1.0,
             com=[0.15, 0.0, -0.25], inertia=0.03 * np.eye(3), name="bob",
             actuated=False),
    ]
    world.add_articulated_system(bodies, name="ball")
    scene = world.compile(joint_limits=False)
    fused = pallas_step.make_step_batch_fused(scene, use_pd=False)
    B = 4
    rng = np.random.RandomState(0)
    s0 = scene.init_state()
    qs = np.tile(np.asarray(s0.q)[None], (B, 1)).astype(np.float32)
    qs += 0.1 * rng.randn(B, 4).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    s = s0.__class__(q=jnp.asarray(qs),
                     u=jnp.asarray(0.3 * rng.randn(B, 3), F32),
                     t=jnp.zeros((B,), F32))
    tau = jnp.zeros((B, 3), F32)

    def roll(stepfn, s):
      def body(s, _):
        return stepfn(s), None
      return jax.lax.scan(body, s, None, length=40)[0]

    sA = jax.jit(lambda s: roll(
        lambda x: pipeline.step_batch(scene, x, tau, None), s))(s)
    sB = jax.jit(lambda s: roll(lambda x: fused(x, tau), s))(s)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=5e-4)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=1e-2)
    # quaternions stay unit
    nrm = np.linalg.norm(np.asarray(sB.q), axis=1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)


class TestAutoGuard:
  def test_auto_fused_skipped_on_cpu_but_require_works(self):
    # "auto" must NOT engage on the CPU backend (interpret mode is minutes
    # per step at robot scale — example smoke runs and the virtual-device
    # dryrun would hang); "require" still builds for explicit opt-in.
    from raisimlib_tpu.mpc import state_map

    scene = _sphere_world()
    import raisimlib_tpu.ops.pallas_step as ps

    calls = []
    orig = ps.make_step_batch_fused

    def spy(*a, **k):
      calls.append(1)
      return orig(*a, **k)

    ps.make_step_batch_fused = spy
    try:
      state_map.make_contact_dyn_batch(scene, control_dt=0.002, substeps=1,
                                       use_pd=False)        # auto, CPU
      assert not calls, "auto engaged the fused kernel on the CPU backend"
      state_map.make_contact_dyn_batch(scene, control_dt=0.002, substeps=1,
                                       use_pd=False, fused="require")
      assert calls, "require did not build the fused kernel"
    finally:
      ps.make_step_batch_fused = orig


class TestSceneEligibility:
  def test_trot_scenario_is_fused_eligible(self):
    """The graded terrain config (BASELINE 4) must stay in the fused kernel's
    scene class — a regression to FusedStepUnsupported would silently drop
    terrain MPC back to the phase-split path (~15x slower on the v5e)."""
    from raisimlib_tpu import scenarios

    cfg = scenarios.load("anymal_trot_heightmap")
    scene, _ = scenarios.build_scene(cfg, dtype=F32)
    sd = pallas_step._analyze(scene, pipeline.StepConfig(), use_pd=True)
    assert sd.hm is not None
    kinds = {s.kind for s in sd.slots}
    assert "hm_pt" in kinds, kinds
    # the 4 feet are radius probes; patch fits VMEM comfortably
    assert sum(s.kind == "hm_pt" and s.radius > 0 for s in sd.slots) >= 4
    assert sd.hm.prx * sd.hm.pry <= 1024


class TestHeightmapCylCone:
  def test_cylinder_cone_heightmap_parity(self):
    """Round-5 widening: cylinder (6 rim probes) and cone (apex + 3 rim)
    vs heightmap run IN-KERNEL with the runtime downhill frame — parity
    with the phase-split path on bumpy terrain."""
    import jax as _jax
    from raisimlib_tpu.utils import terrain

    from raisimlib_tpu.ops import pallas_step as ps

    field = terrain.generate(
        _jax.random.PRNGKey(5),
        terrain.TerrainProperties(z_scale=0.2, x_size=4.0, y_size=4.0,
                                  x_samples=17, y_samples=17),
        dtype=F32)

    for geom, kind, nslots in (("cyl", "hm_cylpt", 6), ("cone", "hm_conept",
                                                        4)):
      world = World(dt=0.002, dtype=F32)
      world.add_heightmap(field)
      if geom == "cyl":
        world.add_cylinder(0.1, 0.15, 1.0, pos=(0.3, 0.1, 0.45))
      else:
        world.add_cone(0.12, 0.2, 1.0, pos=(-0.4, -0.2, 0.5))
      scene = world.compile(joint_limits=False)
      sd = ps._analyze(scene, pipeline.StepConfig(), use_pd=False)
      assert [s.kind for s in sd.slots].count(kind) == nslots

      fused = ps.make_step_batch_fused(scene, use_pd=False)
      B = 4
      rng = np.random.RandomState(1)
      s0 = scene.init_state()
      qs = np.tile(np.asarray(s0.q)[None], (B, 1)).astype(np.float32)
      # tilt so the downhill frame is generic (non-degenerate)
      qs[:, 3:7] += 0.3 * rng.randn(B, 4).astype(np.float32)
      qs[:, 3:7] /= np.linalg.norm(qs[:, 3:7], axis=1, keepdims=True)
      us = 0.4 * rng.randn(B, scene.model.nv).astype(np.float32)
      s = s0.__class__(q=jnp.asarray(qs), u=jnp.asarray(us),
                       t=jnp.zeros((B,), F32))
      tau = jnp.zeros((B, scene.model.nv), F32)

      def roll(stepfn, st, n=4):
        for _ in range(n):
          st = stepfn(st)
        return st

      sA = roll(lambda st: pipeline.step_batch(scene, st, tau, None), s)
      sB = roll(lambda st: fused(st, tau, None), s)
      np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q),
                                 atol=1e-5)
      np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u),
                                 atol=1e-3)

  def test_two_roots_share_field(self):
    """Two independent spheres on one terrain: one patch per FREE root
    (round-5 multi-root generalization)."""
    import jax as _jax
    from raisimlib_tpu.ops import pallas_step as ps
    from raisimlib_tpu.utils import terrain

    field = terrain.generate(
        _jax.random.PRNGKey(6),
        terrain.TerrainProperties(z_scale=0.15, x_size=4.0, y_size=4.0,
                                  x_samples=17, y_samples=17),
        dtype=F32)
    world = World(dt=0.002, dtype=F32)
    world.add_heightmap(field)
    world.add_sphere(0.1, 1.0, pos=(0.8, 0.4, 0.45), name="s1")
    world.add_sphere(0.08, 0.5, pos=(-0.9, -0.5, 0.4), name="s2")
    scene = world.compile(joint_limits=False)
    sd = ps._analyze(scene, pipeline.StepConfig(), use_pd=False)
    assert len(sd.hm.roots) == 2

    fused = ps.make_step_batch_fused(scene, use_pd=False)
    B = 3
    rng = np.random.RandomState(2)
    s0 = scene.init_state()
    qs = np.tile(np.asarray(s0.q)[None], (B, 1)).astype(np.float32)
    qs[:, :3] += 0.05 * rng.randn(B, 3).astype(np.float32)
    qs[:, 7:10] += 0.05 * rng.randn(B, 3).astype(np.float32)
    us = 0.5 * rng.randn(B, scene.model.nv).astype(np.float32)
    s = s0.__class__(q=jnp.asarray(qs), u=jnp.asarray(us),
                     t=jnp.zeros((B,), F32))
    tau = jnp.zeros((B, scene.model.nv), F32)
    sA = s
    sB = s
    for _ in range(4):
      sA = pipeline.step_batch(scene, sA, tau, None)
      sB = fused(sB, tau, None)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=1e-3)


class TestHeightmapMesh:
  def test_mesh_heightmap_parity(self):
    """Mesh hull-vertex probes + in-kernel top-4 selection vs the
    phase-split _mesh_hm path (round 5: completes the fused heightmap geom
    family). Yawed cube on bumpy terrain — ties between equal-depth verts
    exercise the stable selection order."""
    import jax as _jax
    from raisimlib_tpu.ops import pallas_step as ps
    from raisimlib_tpu.utils import terrain

    field = terrain.generate(
        _jax.random.PRNGKey(7),
        terrain.TerrainProperties(z_scale=0.15, x_size=4.0, y_size=4.0,
                                  x_samples=17, y_samples=17),
        dtype=F32)
    cube = np.array([[sx, sy, sz] for sx in (-0.1, 0.1)
                     for sy in (-0.1, 0.1) for sz in (-0.1, 0.1)])
    world = World(dt=0.002, dtype=F32)
    world.add_heightmap(field)
    world.add_mesh(cube, 1.0, pos=(0.2, -0.1, 0.35))
    scene = world.compile(joint_limits=False)
    sd = ps._analyze(scene, pipeline.StepConfig(), use_pd=False)
    assert [s.kind for s in sd.slots].count("hm_mesh") == 4
    assert len(sd.hm_meshes) == 1

    fused = ps.make_step_batch_fused(scene, use_pd=False)
    B = 4
    rng = np.random.RandomState(3)
    s0 = scene.init_state()
    qs = np.tile(np.asarray(s0.q)[None], (B, 1)).astype(np.float32)
    qs[:, 3:7] += 0.2 * rng.randn(B, 4).astype(np.float32)
    qs[:, 3:7] /= np.linalg.norm(qs[:, 3:7], axis=1, keepdims=True)
    us = 0.4 * rng.randn(B, scene.model.nv).astype(np.float32)
    s = s0.__class__(q=jnp.asarray(qs), u=jnp.asarray(us),
                     t=jnp.zeros((B,), F32))
    tau = jnp.zeros((B, scene.model.nv), F32)
    sA, sB = s, s
    for _ in range(4):
      sA = pipeline.step_batch(scene, sA, tau, None)
      sB = fused(sB, tau, None)
    np.testing.assert_allclose(np.asarray(sB.q), np.asarray(sA.q), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sB.u), np.asarray(sA.u), atol=1e-3)
