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

__all__ = [
    "BlockMatchConfig", "EventMatches", "match_events",
    "derive_disparity_bounds",
    "DepthProblemConfig", "DepthEstimates", "solve", "point_culling",
]
