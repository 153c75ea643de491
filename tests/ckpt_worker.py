"""Fault-injection worker: a receding-horizon MPPI loop that checkpoints every
iteration (SURVEY.md §5 "failure detection / fault injection").

Run by tests/test_checkpoint.py as a subprocess. On launch it resumes from the
latest checkpoint if one exists (the restart path a supervisor would take after
a worker death), runs cartpole swing-up MPPI updates with per-iteration keys
derived by fold_in(seed, i) — so the update sequence is a pure function of the
iteration index and the final plan is bitwise identical whether or not the run
was interrupted — and writes the final plan to RESULT.

Usage: python tests/ckpt_worker.py <workdir> [--sleep SECONDS_PER_ITER]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon preload: env vars are too late
jax.config.update("jax_enable_x64", True)

import time  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from raisimlib_tpu.models import primitives  # noqa: E402
from raisimlib_tpu.mpc.mppi import MPPIConfig, mppi_step  # noqa: E402
from raisimlib_tpu.mpc.smooth import make_smooth_dyn  # noqa: E402
from raisimlib_tpu.utils import checkpoint  # noqa: E402

N_ITERS = 6
H = 20


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("workdir")
  ap.add_argument("--sleep", type=float, default=0.0)
  args = ap.parse_args()
  ckpt_path = os.path.join(args.workdir, "mppi.ckpt.npz")
  result_path = os.path.join(args.workdir, "result.npy")

  model = primitives.cartpole(dtype=jnp.float64)
  dyn, nx, nu = make_smooth_dyn(model, (0.0, 0.0, -9.81), dt=0.05)

  def rc(x, u, t):
    return 0.1 * (x[1] - np.pi) ** 2 + 0.01 * jnp.sum(u**2)

  def fc(x):
    return 10.0 * (x[1] - np.pi) ** 2 + 1.0 * x[3] ** 2

  x0 = jnp.zeros((nx,), jnp.float64)
  U = jnp.zeros((H, nu), jnp.float64)
  start = 0
  if checkpoint.latest(ckpt_path):
    U, scalars = checkpoint.restore(ckpt_path, U)
    start = int(scalars["iteration"]) + 1
    print(f"resumed from iteration {start - 1}", flush=True)

  cfg = MPPIConfig(n_samples=32, sigma=0.5, temperature=1.0)
  seed = jax.random.PRNGKey(7)
  step = jax.jit(lambda U, k: mppi_step(dyn, rc, fc, x0, U, k, cfg).U)
  for i in range(start, N_ITERS):
    U = step(U, jax.random.fold_in(seed, i))
    U.block_until_ready()
    checkpoint.save(ckpt_path, U, iteration=i)
    print(f"iteration {i} checkpointed", flush=True)
    if args.sleep:
      time.sleep(args.sleep)

  np.save(result_path, np.asarray(U))
  print("done", flush=True)


if __name__ == "__main__":
  main()
