from esvo_tpu.backend.bundle_adjustment import (
    BAProblem,
    BAConfig,
    bundle_adjust,
    reprojection_residuals,
)
from esvo_tpu.backend.keyframes import KeyframeGraph, build_ba_problem

__all__ = ["BAProblem", "BAConfig", "bundle_adjust",
           "reprojection_residuals", "KeyframeGraph", "build_ba_problem"]
