"""Multi-device execution: problem-batch sharding and cycle-ring pipelines."""

from .mesh import (batched_pschur_real, batched_pschur_complex,  # noqa: F401
                   ensemble_pschur_real_pipelined, make_mesh)
from .sweep_sharded import (ShardedSweep,  # noqa: F401
                            chase_sweep_ff_sharded, pschur_real_sharded)
