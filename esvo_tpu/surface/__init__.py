from esvo_tpu.surface.time_surface import (
    EventBatch,
    TimeSurfaceState,
    TimeSurfaceConfig,
    init_state,
    insert_events,
    render_backward,
    render_forward,
    roll_ticks,
    median_blur_3x3,
    gaussian_blur,
    sobel_x,
    sobel_y,
)

__all__ = [
    "EventBatch", "TimeSurfaceState", "TimeSurfaceConfig", "init_state",
    "insert_events", "render_backward", "render_forward", "roll_ticks",
    "median_blur_3x3", "gaussian_blur", "sobel_x", "sobel_y",
]
