"""Trajectory recording + replay — the C14 viz surface (SURVEY.md C14).

RaiSim streams object poses over a TCP socket to a Unity/Ogre viewer each frame
(`RaisimServer`, SURVEY.md §3.4). The TPU-native replacement keeps visualization
strictly out of the compute path: rollouts record on-device (a `lax.scan`
stacking states + the `step_with_report` contact observables), transfer to host
ONCE at the end, and land in a single `.npz` any offline tool can replay —
`examples/replay.py` renders it with matplotlib, or export to MuJoCo's viewer.

File schema (all float arrays):
  q         (T+1, nq)   generalized coordinates (row 0 = initial state)
  u         (T+1, nv)   generalized velocities
  t         (T+1,)      sim time
  body_pos  (T+1, nb, 3) world body origins (FK, precomputed for viewers)
  body_rot  (T+1, nb, 3, 3)
  con_pos   (T, nc, 3)  contact points          } step_with_report observables;
  con_nrm   (T, nc, 3)  contact normals         } present iff with_contacts
  con_imp   (T, nc, 3)  world-frame impulses    }
  con_act   (T, nc)     contact validity mask   }
plus string metadata: body names, dt.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from raisimlib_tpu.ops import dynamics, pipeline
from raisimlib_tpu.ops.integrator import State


def record(scene, state0: State, n_steps: int, tau=None, pd_target=None,
           with_contacts: bool = True):
  """Roll `n_steps` and record everything -> dict of host numpy arrays.

  tau / pd_target: None, a constant (nv,) vector, or a (n_steps, nv) schedule.
  The rollout runs as one jitted scan; recording costs one stacked device->host
  transfer at the end, never a per-step sync (the reference's TCP-per-frame
  pattern inverted, as SURVEY.md C14 prescribes).
  """
  model = scene.model
  dtype = state0.q.dtype
  zeros = jnp.zeros((model.nv,), dtype)

  def sched(x):
    if x is None:
      return jnp.broadcast_to(zeros, (n_steps, model.nv)), False
    x = jnp.asarray(x, dtype)
    if x.ndim == 1:
      return jnp.broadcast_to(x, (n_steps, model.nv)), True
    assert x.shape == (n_steps, model.nv), x.shape
    return x, True

  taus, _ = sched(tau)
  pds, use_pd = sched(pd_target)

  @jax.jit
  def roll(state0):
    def body(s, inp):
      tau_t, pd_t = inp
      pd = pd_t if use_pd else None
      if with_contacts:
        s2, con, _, lam_w = pipeline.step_with_report(scene, s, tau_t, pd)
        rep = (con.pos, con.normal, lam_w[: con.pos.shape[0]],
               con.active.astype(dtype))
      else:
        s2 = pipeline.step(scene, s, tau_t, pd)
        rep = ()
      return s2, (s2.q, s2.u, s2.t) + rep

    _, out = jax.lax.scan(body, state0, (taus, pds))
    return out

  out = roll(state0)
  qs = np.concatenate([np.asarray(state0.q)[None], np.asarray(out[0])])
  us = np.concatenate([np.asarray(state0.u)[None], np.asarray(out[1])])
  ts = np.concatenate([np.asarray(state0.t)[None], np.asarray(out[2])])

  # FK for viewers (host-side, once)
  kin_fn = jax.jit(jax.vmap(lambda q: dynamics.fk(model, q)))
  kin = kin_fn(jnp.asarray(qs, dtype))
  traj = {
      "q": qs, "u": us, "t": ts,
      "body_pos": np.asarray(kin.p), "body_rot": np.asarray(kin.R),
      "dt": np.asarray(scene.dt),
      "body_names": np.asarray(list(model.body_names), dtype=object),
  }
  if with_contacts:
    traj.update(con_pos=np.asarray(out[3]), con_nrm=np.asarray(out[4]),
                con_imp=np.asarray(out[5]), con_act=np.asarray(out[6]))
  return traj


def from_states(scene, qs, us=None, dt: float | None = None) -> dict:
  """Build a replayable trajectory dict from recorded (T, nq) coordinates —
  for closed-loop examples that log states tick-by-tick (MPC loops) rather
  than through `record`'s open-loop scan. FK runs host-side, once."""
  model = scene.model
  qs = np.asarray(qs)
  T = qs.shape[0]
  us = np.zeros((T, model.nv)) if us is None else np.asarray(us)
  dt = scene.dt if dt is None else dt
  kin_fn = jax.jit(jax.vmap(lambda q: dynamics.fk(model, q)))
  kin = kin_fn(jnp.asarray(qs, model.q_init.dtype))
  return {
      "q": qs, "u": us, "t": dt * np.arange(T),
      "body_pos": np.asarray(kin.p), "body_rot": np.asarray(kin.R),
      "dt": np.asarray(dt),
      "body_names": np.asarray(list(model.body_names), dtype=object),
  }


def save(path: str, traj: dict) -> None:
  import os

  d = os.path.dirname(os.path.abspath(path))
  os.makedirs(d, exist_ok=True)
  np.savez_compressed(path, **traj, allow_pickle=True)


def load(path: str) -> dict:
  with np.load(path, allow_pickle=True) as z:
    return {k: z[k] for k in z.files if k != "allow_pickle"}


def render_matplotlib(traj: dict, out_png: str, stride: int = 10,
                      bodies: Optional[list] = None) -> None:
  """Offline replay: 3-panel figure (XZ side view ghosted over time, body
  heights, contact impulse magnitudes) saved to PNG. Headless-safe (Agg)."""
  import matplotlib

  matplotlib.use("Agg")
  import matplotlib.pyplot as plt

  bp = traj["body_pos"]                      # (T, nb, 3)
  t = traj["t"]
  T, nb, _ = bp.shape
  sel = list(range(nb)) if bodies is None else bodies

  fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))
  ax = axes[0]
  frames = range(0, T, max(1, stride))
  n_frames = len(list(frames))
  for fi, k in enumerate(range(0, T, max(1, stride))):
    alpha = 0.15 + 0.85 * fi / max(1, n_frames - 1)
    ax.plot(bp[k, sel, 0], bp[k, sel, 2], ".", ms=3, alpha=alpha, color="C0")
  ax.set_xlabel("x [m]")
  ax.set_ylabel("z [m]")
  ax.set_title("side view (time-ghosted)")
  ax.axhline(0.0, color="k", lw=0.5)

  ax = axes[1]
  for b in sel[: min(len(sel), 8)]:
    ax.plot(t, bp[:, b, 2], lw=0.8)
  ax.set_xlabel("t [s]")
  ax.set_ylabel("body z [m]")
  ax.set_title("body heights")

  ax = axes[2]
  if "con_imp" in traj:
    imp = np.linalg.norm(traj["con_imp"], axis=-1) * traj["con_act"]  # (T, nc)
    ax.plot(t[1:], imp.sum(axis=1), lw=0.8, color="C3")
    ax.set_title("total contact impulse")
    ax.set_xlabel("t [s]")
    ax.set_ylabel("|impulse| [N s]")
  else:
    ax.set_axis_off()
  fig.tight_layout()
  fig.savefig(out_png, dpi=110)
  plt.close(fig)
