"""Per-object state accessors, name registry, and external forces
(SURVEY.md C12 gaps flagged in the round-2 verdict: "no per-object state
accessors / name registry beyond handles"; RaiSim's setExternalForce)."""

import jax
import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.world import World

F64 = jnp.float64


def _two_body_scene():
  world = World(dt=0.002, dtype=F64)
  world.add_sphere(radius=0.1, mass=1.0, name="ball", pos=(0.0, 0.0, 0.5))
  world.add_box((0.1, 0.1, 0.1), mass=2.0, name="crate", pos=(1.0, 0.0, 0.5))
  world.add_ground()
  return world.compile()


class TestRegistry:
  def test_object_names_and_state_slices(self):
    scene = _two_body_scene()
    assert scene.object_names == ("ball", "crate")
    s = scene.init_state()
    qb, ub = scene.object_state(s, "ball")
    qc, uc = scene.object_state(s, "crate")
    assert qb.shape == (7,) and ub.shape == (6,)
    np.testing.assert_allclose(np.asarray(qb[:3]), [0.0, 0.0, 0.5])
    np.testing.assert_allclose(np.asarray(qc[:3]), [1.0, 0.0, 0.5])

  def test_set_object_state(self):
    scene = _two_body_scene()
    s = scene.init_state()
    s2 = scene.set_object_state(s, "crate",
                                q=[2.0, 3.0, 4.0, 1.0, 0.0, 0.0, 0.0],
                                u=[0.0, 0.0, 0.0, 0.1, 0.2, 0.3])
    qc, uc = scene.object_state(s2, "crate")
    np.testing.assert_allclose(np.asarray(qc[:3]), [2.0, 3.0, 4.0])
    np.testing.assert_allclose(np.asarray(uc[3:]), [0.1, 0.2, 0.3])
    # the other object is untouched
    qb, _ = scene.object_state(s2, "ball")
    np.testing.assert_allclose(np.asarray(qb[:3]), [0.0, 0.0, 0.5])

  def test_unknown_name_raises(self):
    import pytest

    scene = _two_body_scene()
    with pytest.raises(KeyError, match="registered"):
      scene.object_state(scene.init_state(), "nope")

  def test_body_pose(self):
    scene = _two_body_scene()
    s = scene.init_state()
    R, p = scene.body_pose(s, "crate")
    np.testing.assert_allclose(np.asarray(p), [1.0, 0.0, 0.5], atol=1e-12)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-12)


class TestExternalForce:
  def test_force_accelerates_free_body(self):
    """F = ma through the full contact step (body in flight, no contacts)."""
    world = World(dt=0.001, dtype=F64)
    world.add_sphere(radius=0.1, mass=2.0, name="ball", pos=(0.0, 0.0, 5.0))
    world.add_ground()
    scene = world.compile()
    s = scene.init_state()
    fext = scene.external_force("ball", point_w=(0.0, 0.0, 5.0),
                                force_w=(4.0, 0.0, 0.0))
    s2 = scene.step(s, f_ext_w=fext)
    # dv_x = F/m * dt = 4/2 * 0.001
    assert abs(float(s2.u[3]) - 0.002) < 1e-9

  def test_offset_force_spins_body(self):
    """A force applied off-center produces the matching angular acceleration."""
    world = World(dt=0.001, dtype=F64, gravity=(0.0, 0.0, 0.0))
    world.add_sphere(radius=0.1, mass=2.0, name="ball", pos=(0.0, 0.0, 5.0))
    world.add_ground()
    scene = world.compile()
    s = scene.init_state()
    # force +x applied 0.1 above the COM -> torque r x F = z x x = +y
    fext = scene.external_force("ball", point_w=(0.0, 0.0, 5.1),
                                force_w=(4.0, 0.0, 0.0))
    s2 = scene.step(s, f_ext_w=fext)
    I = 0.4 * 2.0 * 0.1**2
    w_y = float(s2.u[1])
    assert abs(w_y - (0.1 * 4.0 / I) * 0.001) < 1e-9, w_y

  def test_push_overcomes_friction(self):
    """Resting box: tangential push below mu*m*g holds, above it slides —
    the external force interacts correctly with the contact solver."""
    world = World(dt=0.002, dtype=F64)
    world.set_default_friction(0.5)
    world.add_box((0.1, 0.1, 0.1), mass=1.0, name="crate", pos=(0.0, 0.0, 0.1))
    world.add_ground()
    scene = world.compile()
    s0 = scene.init_state()

    def push(fx, n=200):
      f = scene.external_force("crate", point_w=(0.0, 0.0, 0.1),
                               force_w=(fx, 0.0, 0.0))

      @jax.jit
      def run(s):
        def body(s, _):
          return scene.step(s, f_ext_w=f), None

        s, _ = jax.lax.scan(body, s, None, length=n)
        return s

      return run(s0)

    hold = push(2.0)        # mu m g ~= 4.9 N
    slide = push(8.0)
    assert abs(float(hold.q[0])) < 1e-3, float(hold.q[0])
    assert float(slide.q[0]) > 0.05, float(slide.q[0])


class TestCompound:
  def test_dumbbell_rests_on_both_spheres(self):
    """Compound of two spheres on a bar (dumbbell): both sphere geoms collide,
    the body rests level on the plane at z = r."""
    world = World(dt=0.002, dtype=F64)
    world.add_compound(
        [{"type": "sphere", "params": [0.1], "pos": (-0.2, 0.0, 0.0)},
         {"type": "sphere", "params": [0.1], "pos": (0.2, 0.0, 0.0)},
         {"type": "capsule", "params": [0.03, 0.17], "pos": (0.0, 0.0, 0.0),
          "rot": np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0],
                           [-1.0, 0.0, 0.0]])}],
        mass=2.0, name="dumbbell", pos=(0.0, 0.0, 0.5))
    world.add_ground()
    scene = world.compile()

    @jax.jit
    def run(s):
      def body(s, _):
        return scene.step(s), None

      s, _ = jax.lax.scan(body, s, None, length=800)
      return s

    s = run(scene.init_state())
    assert abs(float(s.q[2]) - 0.1) < 5e-3, float(s.q[2])
    # level: quaternion stays ~identity (no roll onto one sphere)
    assert abs(float(s.q[3]) - 1.0) < 1e-2
    assert float(jnp.abs(s.u).max()) < 0.05

  def test_compound_inertia_default_is_parallel_axis(self):
    world = World(dt=0.002, dtype=F64)
    world.add_compound(
        [{"type": "sphere", "params": [0.1], "pos": (-0.2, 0.0, 0.0)},
         {"type": "sphere", "params": [0.1], "pos": (0.2, 0.0, 0.0)}],
        mass=2.0, name="d", pos=(0.0, 0.0, 1.0))
    scene = world.compile()
    I6 = np.asarray(scene.model.inertia[0])
    # Iyy ~ 2 * (0.4 m r^2 + m d^2) with m=1 per sphere, d=0.2
    expect = 2 * (0.4 * 1.0 * 0.01 + 1.0 * 0.04)
    assert abs(I6[1, 1] - expect) < 1e-9, (I6[1, 1], expect)
