from .mesh import (DATA_AXIS, SPACE_AXIS, make_mesh, batch_sharding,
                   batch_space_sharding, replicated)
from .halo import exchange_rows, exchange_accumulate_rows
from .frame_parallel import (batched_flow, make_data_parallel_flow,
                             stream_flow)
from .spatial import make_spatial_flow, make_batch_spatial_flow
from .spatial_fine import (make_fine_spatial_flow, sharded_scale_levels,
                           displacement_bound)

__all__ = [
    "DATA_AXIS", "SPACE_AXIS", "make_mesh", "batch_sharding",
    "batch_space_sharding", "replicated", "exchange_rows",
    "exchange_accumulate_rows", "batched_flow", "make_data_parallel_flow",
    "stream_flow", "make_spatial_flow", "make_batch_spatial_flow",
    "make_fine_spatial_flow", "sharded_scale_levels", "displacement_bound",
]
