from spurfies_tpu.ops.voxel_grid import (
    VoxelGridSpec,
    build_grid,
    query_grid,
    compact_rays,
)
from spurfies_tpu.ops.knn_brute import knn_brute
from spurfies_tpu.ops.downsample import voxel_downsample
