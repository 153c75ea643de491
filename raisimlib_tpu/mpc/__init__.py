from raisimlib_tpu.mpc.ilqr import ILQRConfig, ILQRSolution, ilqr  # noqa: F401
from raisimlib_tpu.mpc.smooth import actuated_indices, make_smooth_dyn  # noqa: F401
