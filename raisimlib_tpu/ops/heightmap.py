"""Heightmap terrain (SURVEY.md C5) — dense grid heightfield + narrow phase.

Implemented in the PR4 slice (ANYmal trot over procedural terrain). The field data
structure and collide entry point are defined here; kernels land with that milestone.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class HeightField:
  """Regular-grid heightfield centered at (cx, cy): z = h(x, y), bilinear cells."""

  heights: jnp.ndarray   # (nx, ny)
  size_x: float = struct.field(pytree_node=False)
  size_y: float = struct.field(pytree_node=False)
  center: jnp.ndarray    # (2,)


def collide_heightmap(geoms, gi, kin, field: HeightField):
  raise NotImplementedError("heightmap narrow phase lands with the PR4 milestone")
