from esvo_tpu.io.events import (EventArray, frame_events, load_events_txt,
                                save_events_npz, load_events_npz)
from esvo_tpu.io.stream import EventFrameStream
from esvo_tpu.io.rosbag import BagReader, load_stereo_bag
from esvo_tpu.io.synthetic import SyntheticScene, simulate_stereo_events

__all__ = [
    "EventArray", "frame_events", "load_events_txt",
    "save_events_npz", "load_events_npz", "EventFrameStream",
    "BagReader", "load_stereo_bag",
    "SyntheticScene", "simulate_stereo_events",
]
