"""State embedding/retraction helpers for MPC over floating-base systems.

The optimizer works on flat vectors; quaternions are embedded (nq + nv dims) and
renormalized by the dynamics each step. Orientation costs use the tangent-space
difference `quat_box_minus` so the cost is chart-independent; Riccati null directions
along the quat norm are absorbed by iLQR's Levenberg regularization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raisimlib_tpu.ops.integrator import State


def state_to_vec(state: State) -> jnp.ndarray:
  return jnp.concatenate([state.q, state.u])


def vec_to_state(model, x: jnp.ndarray, t=0.0) -> State:
  return State(q=x[: model.nq], u=x[model.nq :], t=jnp.asarray(t, x.dtype))


def make_contact_dyn(scene, control_dt: float, substeps: int, use_pd: bool = True):
  """dyn(x, action, t) -> x_next rolling `substeps` physics steps per control step.

  action: PD joint-position targets (nu = # actuated dofs) if use_pd, else torques.
  """
  import numpy as np

  model = scene.model
  act_idx = np.nonzero(np.asarray(model.actuated) > 0.5)[0]
  nu = len(act_idx)
  assert abs(scene.dt * substeps - control_dt) < 1e-9, (
      f"scene.dt * substeps ({scene.dt}*{substeps}) must equal control_dt {control_dt}"
  )

  def dyn(x, action, t):
    state = vec_to_state(model, x)
    full = jnp.zeros((model.nv,), x.dtype).at[act_idx].set(action)

    # scan (not Python loop) over substeps: keeps the traced graph one-physics-step
    # big, which matters — the contact step is the largest subgraph in the program
    def body(s, _):
      if use_pd:
        return scene.step(s, pd_target=full), None
      return scene.step(s, full), None

    state, _ = jax.lax.scan(body, state, None, length=substeps)
    return state_to_vec(state)

  return dyn, model.nq + model.nv, nu
