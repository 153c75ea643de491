"""raisimlib_tpu — a TPU-native rigid-body dynamics, contact, and MPC engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of RaiSim
(leggedrobotics/raisimLib, reference mounted at /root/reference): articulated-body
dynamics (ABA/CRBA/RNEA), primitive + heightmap collision, a hard-contact
Coulomb-friction per-contact solver, a semi-implicit integrator, and — new over the
reference — a first-class shooting/DDP MPC layer with multi-host scaling via
`jax.sharding` meshes.

Everything device-side is a pure, statically-shaped, `vmap`-able function; the batch
axis is supplied by `vmap`/`shard_map`, never hand-rolled.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU matmuls/einsums default to BFLOAT16 inputs. Physics is full of
# catastrophic cancellations that bf16 cannot represent — the world-frame
# inertia congruence (crba_w/inertia_world) reconstructs a small rotational
# inertia as the difference of large parallel-axis terms, and for a body a
# few meters from the origin that difference underflows to EXACTLY ZERO in
# bf16, making the mass matrix singular and the step NaN (observed on a v5e:
# a cone at x=2 m produced M[8,8] = 4.0 - 3.988 -> 0). Demand true f32
# multiply-accumulate engine-wide — but never CLOBBER a choice the process
# already made (advisor r4 #5: co-resident NN code may want bf16): the config
# is set only if it is still at its default (None), and setting
# RAISIM_NO_GLOBAL_MATMUL_PRECISION=1 skips it entirely (physics then needs
# per-op `precision=` care — the engine's own correctness tests run f32).
import os as _os

if (_os.environ.get("RAISIM_NO_GLOBAL_MATMUL_PRECISION") != "1"
    and _jax.config.jax_default_matmul_precision is None):
  _jax.config.update("jax_default_matmul_precision", "float32")

from raisimlib_tpu.models.model import RobotModel, JointType  # noqa: F401
from raisimlib_tpu.world import World  # noqa: F401
