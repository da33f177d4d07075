from esvo_tpu.io.events import EventArray, frame_events, load_events_txt
from esvo_tpu.io.synthetic import SyntheticScene, simulate_stereo_events

__all__ = [
    "EventArray", "frame_events", "load_events_txt",
    "SyntheticScene", "simulate_stereo_events",
]
