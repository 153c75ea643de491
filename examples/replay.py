"""Offline trajectory viewer (SURVEY.md C14) — renders a recorded .npz rollout.

RaiSim's viewer is a live TCP client (RaisimServer -> Unity/Ogre); the
TPU-native replacement replays recorded trajectory files instead, keeping
rendering entirely off the compute path.

    python examples/replay.py metrics/anymal_trot_traj.npz -o trot.png
"""

import argparse


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("traj", help=".npz written by utils/trajectory.save")
  ap.add_argument("-o", "--out", default=None, help="output PNG (default: <traj>.png)")
  ap.add_argument("--stride", type=int, default=10)
  args = ap.parse_args()

  from raisimlib_tpu.utils import trajectory

  traj = trajectory.load(args.traj)
  out = args.out or (args.traj.rsplit(".", 1)[0] + ".png")
  trajectory.render_matplotlib(traj, out, stride=args.stride)
  T, nb, _ = traj["body_pos"].shape
  print(f"rendered {T} frames x {nb} bodies -> {out}")


if __name__ == "__main__":
  main()
