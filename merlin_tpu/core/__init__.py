from merlin_tpu.core.mesh import MeshConfig, create_mesh, AXIS_DATA, AXIS_FSDP, AXIS_TENSOR
from merlin_tpu.core.partitioning import (
    DEFAULT_LOGICAL_AXIS_RULES,
    logical_axis_rules,
    sharding_for_tree,
)
from merlin_tpu.core.precision import Policy, DEFAULT_POLICY
