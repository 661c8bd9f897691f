from tpudf.core.precision import Policy, DEFAULT_POLICY, cast_tree
from tpudf.core.mesh import make_mesh, data_sharding, replicated

__all__ = [
    "Policy",
    "DEFAULT_POLICY",
    "cast_tree",
    "make_mesh",
    "data_sharding",
    "replicated",
]
