from esvo_tpu.mapping.block_matching import (
    BlockMatchConfig,
    EventMatches,
    match_events,
    derive_disparity_bounds,
)
from esvo_tpu.mapping.depth_refinement import (
    DepthProblemConfig,
    DepthEstimates,
    solve,
    point_culling,
)
from esvo_tpu.mapping.fusion import (
    FusionConfig,
    DepthGrid,
    empty_grid,
    propagate_points,
    fuse_frame,
    naive_fuse_frame,
    clean_grid,
    grid_points_world,
)
from esvo_tpu.mapping.regularization import RegularizationConfig, regularize
from esvo_tpu.mapping.initialization import (
    SGMConfig,
    semi_global_matching,
    sgm_depth_points,
    event_edge_mask,
    denoising_mask,
    select_denoised,
)
from esvo_tpu.mapping.event_matcher import (
    EventMatcherConfig,
    match_events_temporal,
    match_events_temporal_stats,
)

__all__ = [
    "BlockMatchConfig", "EventMatches", "match_events",
    "derive_disparity_bounds",
    "DepthProblemConfig", "DepthEstimates", "solve", "point_culling",
    "FusionConfig", "DepthGrid", "empty_grid", "propagate_points",
    "fuse_frame", "naive_fuse_frame", "clean_grid", "grid_points_world",
    "RegularizationConfig", "regularize",
    "SGMConfig", "semi_global_matching", "sgm_depth_points",
    "event_edge_mask", "denoising_mask", "select_denoised",
    "EventMatcherConfig", "match_events_temporal",
    "match_events_temporal_stats",
]
