from esvo_tpu.mapping.block_matching import (
    BlockMatchConfig,
    EventMatches,
    match_events,
    derive_disparity_bounds,
)
from esvo_tpu.mapping.depth_solver import (
    DepthProblemConfig,
    DepthEstimates,
    solve_depth,
    cull_points,
)
from esvo_tpu.mapping.fusion import (
    DepthGrid,
    FusionConfig,
    empty_grid,
    propagate_points,
    fuse_frame,
    fuse_window,
    clean_grid,
    grid_points_world,
)
from esvo_tpu.mapping.regularization import (
    RegularizationConfig,
    regularize,
)

__all__ = [
    "BlockMatchConfig", "EventMatches", "match_events",
    "derive_disparity_bounds",
    "DepthProblemConfig", "DepthEstimates", "solve_depth", "cull_points",
    "DepthGrid", "FusionConfig", "empty_grid", "propagate_points",
    "fuse_frame", "fuse_window", "clean_grid", "grid_points_world",
    "RegularizationConfig", "regularize",
]
