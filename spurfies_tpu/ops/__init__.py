from spurfies_tpu.ops.voxel_grid import (
    QueryTable,
    VoxelGridSpec,
    build_grid,
    build_query_table,
    compact_rays,
    query_grid,
)
from spurfies_tpu.ops.knn_brute import knn_brute
from spurfies_tpu.ops.downsample import voxel_downsample
