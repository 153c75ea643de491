"""Checkpoint / resume for simulation, solver, and MPC state (SURVEY.md §5).

The reference keeps no checkpointing at all (single-process desktop sim; users
call getState/setState by hand). Here every piece of run state — `State`
pytrees, MPPI/iLQR carries, batched rollout states, RNG keys — is a JAX pytree
of arrays, so checkpointing is structural: flatten, dump leaves to one `.npz`,
restore by unflattening into a caller-supplied *template* pytree with the same
structure. The template supplies the treedef (npz cannot carry one portably),
and restore validates leaf count, shapes, and dtypes so a topology change fails
loudly instead of resuming garbage.

Writes are atomic (tmp file + os.replace) so a worker killed mid-save leaves
the previous checkpoint intact — the property the fault-injection test
(tests/test_checkpoint.py) relies on when it SIGKILLs a worker mid-run and
restarts from the latest checkpoint.

Pure host-side code; never called inside jit.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _leaf_paths(tree) -> list:
  """Stable per-leaf key strings, e.g. 'state.q', 'carry[0].u'."""
  flat = jax.tree_util.tree_flatten_with_path(tree)[0]
  return [jax.tree_util.keystr(path) for path, _ in flat]


def save(path: str, tree: Any, **scalars) -> None:
  """Dump a pytree of arrays (+ optional python scalars, e.g. iteration=k)."""
  leaves = jax.tree_util.tree_leaves(tree)
  arrays = {f"leaf_{i:05d}": np.asarray(x) for i, x in enumerate(leaves)}
  arrays["__paths__"] = np.asarray(_leaf_paths(tree), dtype=object)
  for k, v in scalars.items():
    assert not k.startswith("leaf_") and k != "__paths__", k
    arrays[f"scalar_{k}"] = np.asarray(v)
  d = os.path.dirname(os.path.abspath(path))
  os.makedirs(d, exist_ok=True)
  tmp = path + ".tmp"
  with open(tmp, "wb") as f:
    # NOTE: np.savez has no allow_pickle kwarg (np.save's default already
    # permits the object-dtype __paths__ array); passing one would be silently
    # stored as a junk array named 'allow_pickle' (advisor round-3)
    np.savez(f, **arrays)
  os.replace(tmp, path)  # atomic: a crash mid-save never corrupts `path`


def restore(path: str, template: Any) -> tuple:
  """Load `path` into the structure of `template` -> (tree, scalars dict).

  Validates leaf count, per-leaf shape and dtype against the template, and the
  recorded leaf paths against the template's, so resuming onto a different
  scene/solver topology is an error, not silent corruption.
  """
  with np.load(path, allow_pickle=True) as z:
    keys = sorted(k for k in z.files if k.startswith("leaf_"))
    loaded = [z[k] for k in keys]
    saved_paths = [str(p) for p in z["__paths__"]]
    scalars = {k[len("scalar_"):]: z[k][()] for k in z.files
               if k.startswith("scalar_")}

  t_leaves, treedef = jax.tree_util.tree_flatten(template)
  t_paths = _leaf_paths(template)
  if saved_paths != t_paths:
    raise ValueError(
        f"checkpoint structure mismatch: saved {len(saved_paths)} leaves "
        f"{saved_paths[:4]}..., template has {len(t_paths)} leaves "
        f"{t_paths[:4]}...")
  for p, a, t in zip(saved_paths, loaded, t_leaves):
    ts = np.shape(t)
    td = np.asarray(t).dtype
    if a.shape != ts or a.dtype != td:
      raise ValueError(
          f"checkpoint leaf {p}: saved shape/dtype {a.shape}/{a.dtype} vs "
          f"template {ts}/{td}")
  tree = jax.tree_util.tree_unflatten(
      treedef, [jax.numpy.asarray(a) for a in loaded])
  return tree, scalars


def latest(path: str) -> bool:
  """True if a complete checkpoint exists at `path`."""
  return os.path.exists(path)
