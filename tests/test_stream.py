"""EventFrameStream == frame_events, plus prefetch/roll semantics."""
import numpy as np
import pytest

from esvo_tpu.io.events import EventArray, frame_events
from esvo_tpu.io.stream import EventFrameStream


def _stream(n=5000, seed=0, t_end=1.0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, t_end, n))
    return EventArray(t=t, x=rng.integers(0, 240, n).astype(np.int32),
                      y=rng.integers(0, 180, n).astype(np.int32),
                      p=rng.random(n) > 0.5)


@pytest.mark.parametrize("prefetch", [0, 2])
def test_matches_frame_events(prefetch):
    ev = _stream()
    sync = np.arange(0.01, 1.0, 0.01)
    cap = 80  # small enough that some frames overflow
    ref = frame_events(ev, sync, cap)
    st = EventFrameStream(ev, sync, cap, prefetch=prefetch)
    assert len(st) == len(sync)
    got = list(st)
    assert len(got) == len(sync)
    total_dropped = 0
    for k, (ts, f) in enumerate(got):
        assert ts == pytest.approx(sync[k])
        for key in ("x", "y", "t", "p", "valid"):
            np.testing.assert_array_equal(f[key], ref[key][k], err_msg=key)
        assert f["dropped"] == ref["dropped"][k]
        total_dropped += int(f["dropped"])
    assert st.total_dropped == total_dropped == ref["dropped"].sum()


def test_rolls_match_frames():
    ev = _stream(3000, seed=1)
    sync = np.arange(0.02, 0.9, 0.01)
    st = EventFrameStream(ev, sync, 64)
    ref = frame_events(ev, sync, 64)
    R = 5
    seen = 0
    for times, batch in st.rolls(R):
        r = len(times)
        assert r == min(R, len(sync) - seen)
        for key in ("x", "y", "t", "p", "valid"):
            np.testing.assert_array_equal(batch[key],
                                          ref[key][seen:seen + r])
        seen += r
    assert seen == len(sync)


def test_prefetch_propagates_errors():
    ev = _stream(100)
    st = EventFrameStream(ev, np.array([0.5, 1.0]), 64, prefetch=2)
    orig = st.frame
    st.frame = lambda k: (_ for _ in ()).throw(RuntimeError("boom")) \
        if k == 1 else orig(k)
    with pytest.raises(RuntimeError, match="boom"):
        list(st)


def test_absolute_timestamps_rejected():
    ev = EventArray(t=np.array([1.4e9]), x=np.zeros(1, np.int32),
                    y=np.zeros(1, np.int32), p=np.ones(1, bool))
    with pytest.raises(ValueError, match="rebase"):
        EventFrameStream(ev, np.array([1.4e9 + 1]), 8)


def test_streaming_memory_is_per_frame():
    """The stream must not materialize K x capacity buffers up front."""
    ev = _stream(2000)
    sync = np.arange(0.001, 1.0, 0.001)  # 999 ticks
    cap = 100_000                        # frame_events would need ~1.3 GB
    st = EventFrameStream(ev, sync, cap, prefetch=1)
    it = iter(st)
    ts, f = next(it)
    assert f["x"].shape == (cap,)
