from dmd_era5_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_SPACE,
    AXIS_TIME,
    MESH_AXES,
    initialize_distributed,
    make_mesh,
    parse_mesh_shape,
    single_device_mesh,
)
from dmd_era5_tpu.parallel.sharding import (
    col_sharded,
    grid_sharded,
    pad_rows_to_multiple,
    replicated,
    reshard,
    row_sharded,
    shard_rows,
)

__all__ = [
    "AXIS_DATA",
    "AXIS_SPACE",
    "AXIS_TIME",
    "MESH_AXES",
    "initialize_distributed",
    "make_mesh",
    "parse_mesh_shape",
    "single_device_mesh",
    "replicated",
    "row_sharded",
    "col_sharded",
    "grid_sharded",
    "pad_rows_to_multiple",
    "shard_rows",
    "reshard",
]
