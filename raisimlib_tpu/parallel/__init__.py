"""Parallelism + distributed backend (SURVEY.md C19/C20).

DP = shard the scenario/rollout batch over a device mesh (sharded.py);
PP/SP/CP-analog = multiple-shooting time decomposition of the horizon
(multishoot.py); scaling harness = scaling.py. ML-style TP/EP/ring-attention have
no domain analog here (documented N/A in SURVEY.md C19)."""

from raisimlib_tpu.parallel.mesh import (
    dp_sharding,
    init_distributed,
    make_host_chip_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
from raisimlib_tpu.parallel.multishoot import (
    MultiShootConfig,
    MultiShootSolution,
    multishoot_solve,
)
from raisimlib_tpu.parallel.scaling import time_workload, weak_scaling_report
from raisimlib_tpu.parallel.sharded import (
    make_sharded_ilqr,
    make_sharded_mppi,
    make_sharded_rollout,
)
