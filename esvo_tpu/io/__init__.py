from esvo_tpu.io.events import (EventArray, frame_events, load_events_txt,
                                save_events_npz, load_events_npz)
from esvo_tpu.io.stream import EventFrameStream
from esvo_tpu.io.synthetic import SyntheticScene, simulate_stereo_events

__all__ = [
    "EventArray", "frame_events", "load_events_txt",
    "save_events_npz", "load_events_npz", "EventFrameStream",
    "SyntheticScene", "simulate_stereo_events",
]
