from worldforge_tpu.core.dtypes import Policy, DEFAULT_POLICY
from worldforge_tpu.core.mesh import (
    AXIS_DP,
    AXIS_FSDP,
    AXIS_SP,
    make_mesh,
    shard_constraint,
)
