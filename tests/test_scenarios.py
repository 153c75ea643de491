"""YAML scenario files + loader (SURVEY.md C12; VERDICT round-2 #8).

The reference's `World(xmlFile)` loads worlds from serialized descriptions;
here each of the 5 BASELINE configs has a YAML scenario consumed by its
example. Tests: all 5 parse + validate, worlds build to working scenes, the
YAML-built ANYmal scene is structurally identical to direct construction, and
validation rejects malformed files.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raisimlib_tpu import scenarios

ALL = ["cartpole_swingup", "sphere_box_stack", "anymal_balance",
       "anymal_trot_heightmap", "atlas_batch"]


class TestLoad:
  @pytest.mark.parametrize("name", ALL)
  def test_loads_and_validates(self, name):
    cfg = scenarios.load(name)
    assert cfg["name"] == name
    assert "description" in cfg

  def test_rejects_bad_object_type(self, tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("name: bad\nworld:\n  dt: 0.01\n  objects:\n    - type: torus\n")
    with pytest.raises(ValueError, match="unknown object type"):
      scenarios.load(str(p))

  def test_rejects_missing_dt(self, tmp_path):
    p = tmp_path / "bad2.yaml"
    p.write_text("name: bad2\nworld:\n  objects: []\n")
    with pytest.raises(ValueError, match="dt"):
      scenarios.load(str(p))


class TestBuild:
  def test_sphere_box_world_builds_and_steps(self):
    cfg = scenarios.load("sphere_box_stack")
    world, _ = scenarios.build_world(cfg, dtype=jnp.float64)
    scene = world.compile()
    s = scene.init_state()
    for _ in range(5):
      s = scene.step(s)
    assert np.isfinite(np.asarray(s.q)).all()

  def test_anymal_yaml_matches_direct_construction(self):
    from raisimlib_tpu.models import anymal
    from raisimlib_tpu.models.urdf import load_urdf
    from raisimlib_tpu.world import World

    cfg = scenarios.load("anymal_balance")
    scene_y, info = scenarios.build_scene(cfg, dtype=jnp.float64)

    bodies, geoms, _ = load_urdf(anymal.anymal_urdf())
    w = World(dt=float(cfg["world"]["dt"]), dtype=jnp.float64)
    w.add_articulated_system(bodies, name="anymal", geoms=geoms)
    w.add_ground()
    scene_d = w.compile().set_pd_gains(*info["pd_gains"])

    assert scene_y.model.nq == scene_d.model.nq
    assert scene_y.model.nv == scene_d.model.nv
    assert scene_y.pairs == scene_d.pairs
    np.testing.assert_array_equal(np.asarray(scene_y.kp), np.asarray(scene_d.kp))
    np.testing.assert_array_equal(np.asarray(scene_y.model.q_init),
                                  np.asarray(scene_d.model.q_init))
    q0 = jnp.asarray(info["standing_q"]["anymal"], jnp.float64)
    np.testing.assert_allclose(np.asarray(q0),
                               np.asarray(anymal.standing_q()))

  def test_heightmap_scenario_has_field(self):
    cfg = scenarios.load("anymal_trot_heightmap")
    scene, info = scenarios.build_scene(cfg, dtype=jnp.float64)
    assert scene.field is not None
    assert info["terrain"]["size"] == [12.0, 6.0]
