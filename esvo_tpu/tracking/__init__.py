from esvo_tpu.tracking.registration import (
    RegProblemConfig,
    RegProblem,
    make_problem,
    residuals_and_weights,
    analytic_jacobian,
    solve,
    pose_of,
    negative_time_surface,
)

__all__ = [
    "RegProblemConfig", "RegProblem", "make_problem",
    "residuals_and_weights", "analytic_jacobian", "solve", "pose_of",
    "negative_time_surface",
]
