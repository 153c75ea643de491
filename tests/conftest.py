"""Test configuration: run on CPU with 8 virtual devices (SURVEY.md §4.5).

Tests must import nothing that imports jax before this module sets the platform —
pytest loads conftest.py first, so setting env vars here is sufficient.
f64 is enabled so CPU oracle tests can be tight; engine code is dtype-polymorphic
and separate tests pin f32 behavior (the TPU precision path).
"""

import os

# NOTE: this machine preloads jax with an 'axon' TPU backend via sitecustomize, so
# env vars alone are too late — switch the platform through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
  return np.random.default_rng(0)
