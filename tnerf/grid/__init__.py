"""Occupancy grid + ray-grid traversal.

TPU-native replacement for the reference's entire rtx/ layer: the OptiX
acceleration structure over 512 custom AABB primitives
(rtxFunctions.cpp:293-351, main.cu:154-174,394-399) and the RT-core
ray-march pipeline (optixPrograms.cu:43-248).  A dense axis-aligned grid
needs no BVH — traversal is exact and closed-form.
"""

from tnerf.grid.occupancy import OccupancyGridState, init_occupancy, update_occupancy  # noqa: F401
from tnerf.grid.traversal import ray_aabb, traverse_grid  # noqa: F401
