"""Semi-implicit Euler step — TPU-native equivalent of RaiSim's `World::integrate()`.

RaiSim's step (SURVEY.md §3.1): collision -> contact impulse solve -> velocity update ->
position update, split as `integrate1`/`integrate2`. Here the whole step is one pure,
jittable function `step(model, state, tau) -> state`; the contact path is added by
`world.py` composing this with the collision + solver ops. Horizon rollouts wrap it in
`lax.scan`; batching is `vmap`.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from raisimlib_tpu.models.model import RobotModel
from raisimlib_tpu.ops import dynamics


@struct.dataclass
class State:
  q: jnp.ndarray  # (nq,)
  u: jnp.ndarray  # (nv,)
  t: jnp.ndarray  # scalar sim time


def init_state(model: RobotModel, q=None, u=None) -> State:
  import numpy as np

  # host-built zeros (transfer, not an un-jitted device op — cf. World.compile)
  q = model.q_init if q is None else q
  u = jnp.asarray(np.zeros((model.nv,)), dtype=q.dtype) if u is None else u
  return State(q=q, u=u, t=jnp.asarray(np.zeros(()), dtype=q.dtype))


def step_smooth(
    model: RobotModel,
    state: State,
    tau: jnp.ndarray,
    gravity: jnp.ndarray,
    dt,
    f_ext_w=None,
) -> State:
  """Contact-free semi-implicit Euler step (PR1 path: cartpole/pendulum MPC)."""
  tau = jnp.clip(tau * model.actuated, -model.torque_limit, model.torque_limit)
  qdd = dynamics.aba(model, state.q, state.u, tau, gravity, f_ext_w)
  u_new = state.u + dt * qdd
  q_new = dynamics.integrate_q(model, state.q, u_new, dt)
  return State(q=q_new, u=u_new, t=state.t + dt)
