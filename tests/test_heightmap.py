"""Heightmap terrain: narrow phase, procedural generation, batched scenarios
(SURVEY.md C5; BASELINE config 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.ops import heightmap as hm
from raisimlib_tpu.utils import terrain
from raisimlib_tpu.world import World


def _sphere_on_field(field, pos, radius=0.1, mass=1.0, dtype=jnp.float64):
  world = World(dt=0.002, dtype=dtype)
  world.add_sphere(radius, mass, pos=pos)
  world.add_heightmap(field)
  return world.compile()


class TestSurfaceSample:
  def test_flat_field_height_and_normal(self):
    field = terrain.flat(height=0.25, dtype=jnp.float64)
    z, n, inside = hm.surface_at(field, jnp.array([0.3, -1.2]))
    assert np.isclose(float(z), 0.25)
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-12)
    assert bool(inside)

  def test_out_of_bounds_masked(self):
    field = terrain.flat(size=(2.0, 2.0), dtype=jnp.float64)
    _, _, inside = hm.surface_at(field, jnp.array([5.0, 0.0]))
    assert not bool(inside)

  def test_slope_normal(self):
    grade = 0.2
    field = terrain.slope(grade, dtype=jnp.float64)
    z, n, _ = hm.surface_at(field, jnp.array([1.0, 0.5]))
    assert np.isclose(float(z), grade * 1.0, atol=1e-9)
    expected = np.array([-grade, 0.0, 1.0]) / np.sqrt(1 + grade**2)
    np.testing.assert_allclose(np.asarray(n), expected, atol=1e-9)

  def test_triangle_plane_consistency(self):
    """Sampled (z, n) must satisfy the plane equation across a cell: moving dxy in
    the same triangle changes z by -(_n_xy / n_z) . dxy."""
    field = terrain.generate(jax.random.PRNGKey(3),
                             terrain.TerrainProperties(z_scale=0.5),
                             dtype=jnp.float64)
    p = jnp.array([0.31, 0.27])
    z, n, _ = hm.surface_at(field, p)
    d = jnp.array([0.004, 0.003])
    z2, n2, _ = hm.surface_at(field, p + d)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n2), atol=1e-12)
    dz_pred = -(n[0] * d[0] + n[1] * d[1]) / n[2]
    assert np.isclose(float(z2 - z), float(dz_pred), atol=1e-12)


class TestHeightmapContact:
  def test_flat_field_matches_plane(self):
    """A sphere settling on a flat heightfield lands at the same height as on the
    analytic ground plane."""
    def settle(scene, q0):
      s = scene.init_state(q=jnp.asarray(q0, jnp.float64))
      step = jax.jit(lambda s: scene.step(s))
      for _ in range(600):
        s = step(s)
      return float(s.q[2])

    r = 0.1
    q0 = [0.0, 0.0, 0.3, 1.0, 0.0, 0.0, 0.0]
    sc_hm = _sphere_on_field(terrain.flat(0.0, dtype=jnp.float64), (0, 0, 0.3), r)
    wp = World(dt=0.002, dtype=jnp.float64)
    wp.add_sphere(r, 1.0, pos=(0, 0, 0.3))
    wp.add_ground()
    sc_pl = wp.compile()
    z_hm = settle(sc_hm, q0)
    z_pl = settle(sc_pl, q0)
    assert np.isclose(z_hm, z_pl, atol=1e-6), (z_hm, z_pl)
    assert np.isclose(z_hm, r, atol=2e-3)

  def test_sphere_rolls_down_slope(self):
    field = terrain.slope(0.3, dtype=jnp.float64)
    scene = _sphere_on_field(field, (0.0, 0.0, 0.4), radius=0.1)
    s = scene.init_state()
    step = jax.jit(lambda s: scene.step(s))
    for _ in range(800):
      s = step(s)
    # ball ends downhill (-x), still on the surface (no tunneling)
    assert float(s.q[0]) < -0.05
    z_surf, _, _ = hm.surface_at(field, s.q[:2])
    assert float(s.q[2]) > float(z_surf)  # above terrain

  def test_box_rests_on_terrain(self):
    field = terrain.flat(0.1, dtype=jnp.float64)
    world = World(dt=0.002, dtype=jnp.float64)
    world.add_box((0.1, 0.1, 0.05), 1.0, pos=(0.0, 0.0, 0.3))
    world.add_heightmap(field)
    scene = world.compile()
    s = scene.init_state()
    step = jax.jit(lambda s: scene.step(s))
    for _ in range(700):
      s = step(s)
    assert np.isclose(float(s.q[2]), 0.15, atol=3e-3)   # 0.1 field + 0.05 half-height
    np.testing.assert_allclose(np.abs(np.asarray(s.u)), 0.0, atol=0.05)

  def test_sphere_settles_on_fractal_terrain(self):
    field = terrain.generate(jax.random.PRNGKey(0),
                             terrain.TerrainProperties(z_scale=0.4),
                             dtype=jnp.float64)
    scene = _sphere_on_field(field, (0.5, -0.3, 1.5), radius=0.15)
    s = scene.init_state()
    step = jax.jit(lambda s: scene.step(s))
    for _ in range(1500):
      s = step(s)
    z_surf, _, inside = hm.surface_at(field, s.q[:2])
    assert bool(inside)
    # resting on (not inside, not far above) the surface
    gap = float(s.q[2] - z_surf)
    assert 0.1 < gap < 0.25, gap


class TestBatchedTerrains:
  def test_vmap_over_heightfields(self):
    """Batched terrain scenarios: one compiled scene, vmap over field heights —
    the BASELINE config-4 pattern."""
    base8 = terrain.flat(0.0, samples=(8, 8))
    scene = _sphere_on_field(base8, (0.0, 0.0, 0.5), radius=0.1, dtype=jnp.float32)

    B = 16
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    heights = jax.vmap(
        lambda k: terrain.generate(
            k, terrain.TerrainProperties(z_scale=0.2, x_samples=8, y_samples=8)
        ).heights
    )(keys)

    def rollout(h):
      sc = scene.replace(field=scene.field.replace(heights=h))
      s = sc.init_state(q=jnp.asarray([0, 0, 0.5, 1, 0, 0, 0], jnp.float32))
      def body(s, _):
        return sc.step(s), None
      s, _ = jax.lax.scan(body, s, None, length=200)
      return s.q[2]

    zs = np.asarray(jax.jit(jax.vmap(rollout))(heights))
    assert np.all(np.isfinite(zs))
    assert np.all(zs > -0.3)          # nothing tunneled through its terrain
    assert np.std(zs) > 1e-4          # different terrains -> different rest heights
