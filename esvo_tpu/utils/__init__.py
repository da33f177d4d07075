from esvo_tpu.utils.visualization import (
    jet_colormap,
    plot_inv_depth_map,
    plot_std_var_map,
    plot_age_map,
    plot_cost_map,
    plot_event_map,
)
from esvo_tpu.utils.profiling import TicToc, StageTimer

__all__ = [
    "jet_colormap", "plot_inv_depth_map", "plot_std_var_map",
    "plot_age_map", "plot_cost_map", "plot_event_map",
    "TicToc", "StageTimer",
]
