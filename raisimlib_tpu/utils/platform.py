"""Runtime platform selection helper.

On this machine a sitecustomize preloads JAX with a remote `axon` TPU backend
and pins `JAX_PLATFORMS=axon` — exporting `JAX_PLATFORMS=cpu` to a subprocess
does NOT work (the sitecustomize re-registers the TPU). The only reliable
switch is `jax.config.update("jax_platforms", ...)` before first device use,
which is what tests/conftest.py does for the test suite and what examples do
via this helper when RAISIM_PLATFORM is set (e.g. the example-smoke CI runs
them with RAISIM_PLATFORM=cpu).
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
  """If RAISIM_PLATFORM is set, force that JAX platform (call before jax use)."""
  p = os.environ.get("RAISIM_PLATFORM")
  if p:
    import jax

    jax.config.update("jax_platforms", p)
