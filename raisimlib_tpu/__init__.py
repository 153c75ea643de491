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

from raisimlib_tpu.models.model import RobotModel, JointType  # noqa: F401
from raisimlib_tpu.world import World  # noqa: F401
