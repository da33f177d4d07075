from esvo_tpu.parallel.sharding import (
    make_mesh,
    sharded_surface_update,
    sharded_map_estimate,
    sharded_tracking_step,
    sharded_ba_normal_equations,
    sharded_bundle_adjust,
)

__all__ = ["make_mesh", "sharded_surface_update", "sharded_map_estimate",
           "sharded_tracking_step", "sharded_ba_normal_equations",
           "sharded_bundle_adjust"]
