from esvo_tpu.backend.bundle_adjustment import (
    BAProblem,
    BAConfig,
    bundle_adjust,
    reprojection_residuals,
)
from esvo_tpu.backend.keyframes import KeyframeGraph, build_ba_problem
from esvo_tpu.backend.pose_graph import (
    PoseGraph,
    PoseGraphConfig,
    optimize_pose_graph,
    odometry_graph,
    add_edge,
)
from esvo_tpu.backend.loop_closure import (
    LoopClosureConfig,
    LoopClosureDetector,
    ts_descriptor,
    verify_loop,
    verify_loop_icp,
    icp_align,
)

__all__ = ["BAProblem", "BAConfig", "bundle_adjust",
           "reprojection_residuals", "KeyframeGraph", "build_ba_problem",
           "PoseGraph", "PoseGraphConfig", "optimize_pose_graph",
           "odometry_graph", "add_edge", "LoopClosureConfig",
           "LoopClosureDetector", "ts_descriptor", "verify_loop",
           "verify_loop_icp", "icp_align"]
