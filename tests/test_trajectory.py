"""Trajectory recording + replay tests (SURVEY.md C14; VERDICT round-2 #4)."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.utils import trajectory
from raisimlib_tpu.world import World

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _drop_scene(dtype=jnp.float64):
  world = World(dt=0.002, dtype=dtype)
  world.add_sphere(radius=0.1, mass=1.0, pos=(0.0, 0.0, 0.5))
  world.add_ground()
  return world.compile()


class TestRecord:
  def test_record_schema_and_physics(self, tmp_path):
    scene = _drop_scene()
    traj = trajectory.record(scene, scene.init_state(), n_steps=200)
    assert traj["q"].shape == (201, scene.model.nq)
    assert traj["body_pos"].shape == (201, scene.model.nb, 3)
    assert traj["con_pos"].shape[0] == 200
    # ball falls from 0.5 and settles on the ground at z ~= r
    z = traj["body_pos"][:, 0, 2]
    assert z[0] > 0.45
    assert abs(z[-1] - 0.1) < 0.02
    # impulses appear only after touchdown, and act upward
    imp_n = (traj["con_imp"] * traj["con_nrm"]).sum(-1) * traj["con_act"]
    touchdown = np.nonzero(imp_n.sum(1) > 1e-6)[0]
    assert len(touchdown) > 0 and touchdown[0] > 10
    assert imp_n.min() > -1e-9

    p = str(tmp_path / "drop.npz")
    trajectory.save(p, traj)
    back = trajectory.load(p)
    np.testing.assert_array_equal(back["q"], traj["q"])
    np.testing.assert_array_equal(back["con_imp"], traj["con_imp"])

  def test_replay_script_renders(self, tmp_path):
    scene = _drop_scene()
    traj = trajectory.record(scene, scene.init_state(), n_steps=50)
    p = str(tmp_path / "drop.npz")
    trajectory.save(p, traj)
    out = str(tmp_path / "drop.png")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "replay.py"), p,
         "-o", out],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out) and os.path.getsize(out) > 10_000
