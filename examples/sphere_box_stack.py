"""BASELINE config 2: sphere + box stack on flat ground — contact-solver
correctness surface (4+ simultaneous contacts, friction, stacking). Mirrors the
reference's `primitives` demo. Asserts stack stability over a 10 s simulation
and reports penetration / drift bounds.

Run:  python examples/sphere_box_stack.py [--smoke]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(smoke: bool = False, metrics_path: str = "metrics/sphere_box_stack.jsonl"):
  from raisimlib_tpu import scenarios
  from raisimlib_tpu.utils import metrics

  cfg = scenarios.load("sphere_box_stack")   # C12 world-description file
  rcfg = cfg["run"]
  dtype = jnp.float32
  dt = float(cfg["world"]["dt"])
  world, _ = scenarios.build_world(cfg, dtype=dtype)
  scene = world.compile()
  s0 = scene.init_state()
  # kick the BOX sideways: sliding friction stops a box, so the stack must
  # re-settle (a kicked SPHERE transitions to rolling at 5/7 v0 and rolls off
  # the box — no gate can hold without rolling resistance; found round 3)
  s0 = s0.replace(u=s0.u.at[3].set(rcfg["kick_m_s"]))

  seconds = rcfg["smoke_seconds"] if smoke else rcfg["sim_seconds"]
  n = int(seconds / dt)

  @jax.jit
  def simulate(s):
    def body(s, _):
      s2 = scene.step(s)
      return s2, (s2.q[2], s2.q[9])          # box z, sphere z

    return jax.lax.scan(body, s, None, length=n)

  t0 = time.perf_counter()
  final, (box_z, sph_z) = simulate(s0)
  jax.block_until_ready(final.q)
  wall_s = time.perf_counter() - t0

  box_z = np.asarray(box_z)
  sph_z = np.asarray(sph_z)
  result = {
      "sim_seconds": seconds,
      "wall_s": wall_s,
      "realtime_factor": seconds / wall_s,
      "box_z_final": float(box_z[-1]),
      "sphere_z_final": float(sph_z[-1]),
      "box_penetration_max": float(max(0.0, 0.15 - box_z.min())),
      "sphere_drift_xy": float(jnp.linalg.norm(final.q[7:9])),
      "settled_speed": float(jnp.abs(final.u).max()),
  }
  metrics.emit("example_sphere_box_stack", path=metrics_path, echo=True, **result)
  if not smoke:
    g = rcfg["gates"]
    assert abs(result["box_z_final"] - g["box_rest_z"]) < g["rest_tol"], (
        "box not resting on ground")
    assert abs(result["sphere_z_final"] - g["sphere_rest_z"]) < g["rest_tol"], (
        "sphere not resting on box")
    assert result["box_penetration_max"] < g["max_penetration"], "penetration grew"
    assert result["settled_speed"] < g["settled_speed"], "stack did not settle"
  return result


if __name__ == "__main__":
  from raisimlib_tpu.utils.platform import apply_env_platform

  apply_env_platform()  # RAISIM_PLATFORM=cpu forces the CPU backend (smoke CI)
  ap = argparse.ArgumentParser()
  ap.add_argument("--smoke", action="store_true")
  run(smoke=ap.parse_args().smoke)
