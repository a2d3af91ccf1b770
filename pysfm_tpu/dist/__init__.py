"""L7 distributed runtime: mesh, sharding, distributed Schur BA (SURVEY §1 L7)."""

from pysfm_tpu.dist.mesh import AXIS, make_mesh  # noqa: F401
from pysfm_tpu.dist.shard import (  # noqa: F401
    ShardedProblem,
    device_put_sharded,
    shard_problem,
    unshard_points,
    unshard_problem,
)
from pysfm_tpu.dist.sharded_lm import solve_sharded  # noqa: F401
from pysfm_tpu.dist.sharded_cm import (  # noqa: F401
    ShardedCMProblem,
    device_put_sharded_cm,
    shard_cm_problem,
    solve_sharded_cm,
    unshard_cm,
)
