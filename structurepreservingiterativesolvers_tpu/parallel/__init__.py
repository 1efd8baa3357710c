from .mesh import (  # noqa: F401
    ROWS,
    make_mesh,
    replicated,
    shard_constraint,
    shard_matrix,
    shard_system,
    shard_vector,
)
from .halo_spmv import HaloDia, dia_spmv_halo  # noqa: F401
