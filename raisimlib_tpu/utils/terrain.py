"""Procedural terrain generation — RaiSim `TerrainProperties` analog (SURVEY.md C5).

The reference generates fractal-noise heightmaps host-side from a `TerrainProperties`
struct (frequency, zScale, octaves, ...). Here generation is a pure JAX function of a
PRNG key, so thousands of distinct terrains are generated *on device* and batched
with `vmap` (BASELINE config 4: "ANYmal trot over procedural heightmap, batched
terrain scenarios").

Noise model: fractal value noise — per octave, i.i.d. lattice values upsampled to the
output grid with smoothstep (Hermite) interpolation, summed with geometric amplitude
decay. Deterministic in the key; static output shape (x_samples, y_samples).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from raisimlib_tpu.ops.heightmap import HeightField


@dataclasses.dataclass(frozen=True)
class TerrainProperties:
  """Static terrain config (host-side; shapes/octaves must be trace-time constants)."""

  x_size: float = 8.0
  y_size: float = 8.0
  x_samples: int = 64
  y_samples: int = 64
  frequency: float = 0.5      # base lattice cells per meter
  z_scale: float = 0.3        # peak-to-peak height of the first octave
  fractal_octaves: int = 3
  fractal_lacunarity: float = 2.0
  fractal_gain: float = 0.5


def _value_noise(key, nx, ny, cells_x, cells_y, dtype):
  """One octave: random lattice (cells+1)^2, smoothstep-upsampled to (nx, ny)."""
  lat = jax.random.uniform(key, (cells_x + 1, cells_y + 1), dtype, -1.0, 1.0)
  fx = jnp.linspace(0.0, cells_x, nx, dtype=dtype)
  fy = jnp.linspace(0.0, cells_y, ny, dtype=dtype)
  ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, cells_x - 1)
  iy = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, cells_y - 1)
  ux = fx - ix
  uy = fy - iy
  # Hermite smoothstep keeps the gradient continuous across lattice lines
  sx = ux * ux * (3.0 - 2.0 * ux)
  sy = uy * uy * (3.0 - 2.0 * uy)
  v00 = lat[ix[:, None], iy[None, :]]
  v10 = lat[ix[:, None] + 1, iy[None, :]]
  v01 = lat[ix[:, None], iy[None, :] + 1]
  v11 = lat[ix[:, None] + 1, iy[None, :] + 1]
  a = v00 + sx[:, None] * (v10 - v00)
  b = v01 + sx[:, None] * (v11 - v01)
  return a + sy[None, :] * (b - a)


def generate(
    key, props: TerrainProperties = TerrainProperties(), center=(0.0, 0.0),
    dtype=jnp.float32,
) -> HeightField:
  """Fractal-noise heightfield; jit/vmap over `key` for batched scenarios."""
  nx, ny = props.x_samples, props.y_samples
  h = jnp.zeros((nx, ny), dtype)
  amp = 0.5 * props.z_scale
  freq = props.frequency
  keys = jax.random.split(key, props.fractal_octaves)
  for o in range(props.fractal_octaves):
    cx = max(1, int(round(freq * props.x_size)))
    cy = max(1, int(round(freq * props.y_size)))
    h = h + amp * _value_noise(keys[o], nx, ny, cx, cy, dtype)
    amp *= props.fractal_gain
    freq *= props.fractal_lacunarity
  return HeightField(
      heights=h,
      center=jnp.asarray(center, dtype),
      size_x=props.x_size,
      size_y=props.y_size,
  )


def flat(height=0.0, size=(8.0, 8.0), samples=(8, 8), center=(0.0, 0.0),
         dtype=jnp.float32) -> HeightField:
  return HeightField(
      heights=jnp.full(samples, height, dtype),
      center=jnp.asarray(center, dtype),
      size_x=float(size[0]),
      size_y=float(size[1]),
  )


def slope(grade: float, size=(8.0, 8.0), samples=(32, 32), center=(0.0, 0.0),
          dtype=jnp.float32) -> HeightField:
  """Plane tilted along +x: z = grade * x (world frame)."""
  xs = jnp.linspace(-0.5 * size[0], 0.5 * size[0], samples[0], dtype=dtype)
  h = (center[0] + xs)[:, None] * grade * jnp.ones((1, samples[1]), dtype)
  return HeightField(
      heights=h, center=jnp.asarray(center, dtype),
      size_x=float(size[0]), size_y=float(size[1]),
  )


def stairs(step_width: float, step_height: float, size=(8.0, 8.0),
           samples=(128, 16), center=(0.0, 0.0), dtype=jnp.float32) -> HeightField:
  """Staircase rising along +x from the field's -x edge."""
  xs = jnp.linspace(0.0, size[0], samples[0], dtype=dtype)
  levels = jnp.floor(xs / step_width) * step_height
  h = levels[:, None] * jnp.ones((1, samples[1]), dtype)
  return HeightField(
      heights=h, center=jnp.asarray(center, dtype),
      size_x=float(size[0]), size_y=float(size[1]),
  )
