"""REAL 2-process distributed-init test (SURVEY.md C20; round-3 verdict #3).

Every other multi-device artifact in this repo runs single-process over
virtual devices; this test actually spawns 2 OS processes, runs
`jax.distributed.initialize` against a localhost coordinator through
`parallel.mesh.init_distributed`, builds the host-chip mesh from a genuine
multi-process device set, and psums across the process boundary — the only
part of C20 that is testable on a single node and was previously untested
(`mesh.py` init path was `pragma: no cover`).
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "dist_worker.py")


def _free_port() -> int:
  with socket.socket() as s:
    s.bind(("127.0.0.1", 0))
    return s.getsockname()[1]


@pytest.mark.timeout(300)
def test_two_process_distributed_init_and_psum():
  coord = f"127.0.0.1:{_free_port()}"
  env = dict(os.environ)
  env.pop("JAX_NUM_PROCESSES", None)  # worker args take precedence
  procs = [
      subprocess.Popen(
          [sys.executable, _WORKER, coord, str(pid), "2"],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
      for pid in range(2)
  ]
  outs = []
  try:
    for p in procs:
      out, _ = p.communicate(timeout=240)
      outs.append(out)
  finally:
    for p in procs:
      if p.poll() is None:
        p.kill()
  for pid, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    assert "DIST_OK" in out, f"worker {pid} output:\n{out[-4000:]}"
  # both processes agree on the cross-process reduction
  vals = {line for out in outs for line in out.splitlines()
          if line.startswith("DIST_OK")}
  assert len(vals) == 1, vals
