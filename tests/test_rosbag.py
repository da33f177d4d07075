"""Pure-Python rosbag v2.0 reader (io/rosbag.py) on generated bags.

The writer below produces structurally valid bags (record framing,
connection records, chunked message stream, bz2 and none compression)
with real dvs_msgs/EventArray + geometry_msgs/PoseStamped wire
payloads, so the reader is exercised end-to-end without ROS.
"""
import bz2
import struct

import numpy as np
import pytest

from esvo_tpu.io.rosbag import BagReader, load_stereo_bag


def _field(name: str, value: bytes) -> bytes:
    item = name.encode() + b"=" + value
    return struct.pack("<I", len(item)) + item


def _record(fields: dict, data: bytes) -> bytes:
    hdr = b"".join(_field(k, v) for k, v in fields.items())
    return (struct.pack("<I", len(hdr)) + hdr
            + struct.pack("<I", len(data)) + data)


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _event_array_msg(t, x, y, p, height=180, width=240) -> bytes:
    out = [struct.pack("<III", 0, int(t[0]), 0), _string("davis"),
           struct.pack("<II", height, width),
           struct.pack("<I", len(t))]
    for ti, xi, yi, pi in zip(t, x, y, p):
        sec = int(ti)
        nsec = int(round((ti - sec) * 1e9))
        out.append(struct.pack("<HHIIB", xi, yi, sec, nsec, int(pi)))
    return b"".join(out)


def _pose_msg(t, xyz, quat_xyzw) -> bytes:
    sec = int(t)
    nsec = int(round((t - sec) * 1e9))
    return (struct.pack("<III", 0, sec, nsec) + _string("world")
            + struct.pack("<7d", *xyz, *quat_xyzw))


def _camera_info_msg(width, height, model, D, K, R, P) -> bytes:
    return (struct.pack("<III", 0, 0, 0) + _string("cam")
            + struct.pack("<II", height, width) + _string(model)
            + struct.pack("<I", len(D))
            + np.asarray(D, "<f8").tobytes()
            + np.asarray(K, "<f8").tobytes()
            + np.asarray(R, "<f8").tobytes()
            + np.asarray(P, "<f8").tobytes()
            + struct.pack("<II", 0, 0)          # binning
            + struct.pack("<IIII?", 0, 0, 0, 0, False))


def _connection(conn: int, topic: str, msg_type: str) -> bytes:
    sub = _field("type", msg_type.encode()) + _field("md5sum", b"x")
    return _record({"op": b"\x07", "conn": struct.pack("<I", conn),
                    "topic": topic.encode()}, sub)


def _message(conn: int, data: bytes) -> bytes:
    return _record({"op": b"\x02", "conn": struct.pack("<I", conn),
                    "time": struct.pack("<II", 0, 0)}, data)


def _write_bag(path, chunks, compression="none"):
    """chunks: list of inner-record byte strings to pack per chunk."""
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03",
                         "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", 3),
                         "chunk_count": struct.pack("<I", len(chunks))},
                        b"\x00" * 4096))       # padded bag header
        for inner in chunks:
            comp = (bz2.compress(inner) if compression == "bz2"
                    else inner)
            f.write(_record({"op": b"\x05",
                             "compression": compression.encode(),
                             "size": struct.pack("<I", len(inner))},
                            comp))


@pytest.fixture(params=["none", "bz2"])
def stereo_bag(request, tmp_path):
    rng = np.random.default_rng(0)
    n = 200
    t0 = 1468941032.0  # epoch-scale, like real rpg bags
    tl = np.sort(t0 + rng.uniform(0, 0.5, n))
    tr = np.sort(t0 + 0.003 + rng.uniform(0, 0.5, n))
    xl = rng.integers(0, 240, n)
    yl = rng.integers(0, 180, n)
    pl = rng.random(n) > 0.5

    inner1 = (
        _connection(0, "/davis/left/events", "dvs_msgs/EventArray")
        + _connection(1, "/davis/right/events", "dvs_msgs/EventArray")
        + _connection(2, "/optitrack/davis", "geometry_msgs/PoseStamped")
        + _message(0, _event_array_msg(tl[:100], xl[:100], yl[:100],
                                       pl[:100]))
        + _message(1, _event_array_msg(tr[:100], xl[:100], yl[:100],
                                       pl[:100]))
        + _message(2, _pose_msg(t0, (1.0, 2.0, 3.0), (0, 0, 0, 1))))
    inner2 = (
        _message(0, _event_array_msg(tl[100:], xl[100:], yl[100:],
                                     pl[100:]))
        + _message(1, _event_array_msg(tr[100:], xl[100:], yl[100:],
                                       pl[100:]))
        + _message(2, _pose_msg(t0 + 0.5, (1.5, 2.0, 3.0),
                                (0, 0, np.sin(0.1), np.cos(0.1)))))
    path = str(tmp_path / f"stereo_{request.param}.bag")
    _write_bag(path, [inner1, inner2], request.param)
    return path, tl, tr, xl, yl, pl, t0


def test_bag_reader_topics_and_events(stereo_bag):
    path, tl, tr, xl, yl, pl, t0 = stereo_bag
    bag = BagReader(path)
    assert bag.topics == {"/davis/left/events": 2,
                          "/davis/right/events": 2,
                          "/optitrack/davis": 2}
    assert bag.topic_type("/davis/left/events") == "dvs_msgs/EventArray"
    ev = bag.events("/davis/left/events")
    assert len(ev) == len(tl)
    np.testing.assert_allclose(ev.t, tl, atol=2e-9)   # nsec quantization
    np.testing.assert_array_equal(ev.x, xl)
    np.testing.assert_array_equal(ev.y, yl)
    np.testing.assert_array_equal(ev.p, pl)


def test_bag_reader_poses(stereo_bag):
    path, *_, t0 = stereo_bag
    bag = BagReader(path)
    times, poses = bag.poses("/optitrack/davis")
    assert len(times) == 2
    np.testing.assert_allclose(times[0], t0, atol=2e-9)
    np.testing.assert_allclose(poses[0][:3, 3], [1.0, 2.0, 3.0])
    # second pose carries a z-rotation of 0.2 rad
    ang = np.arctan2(poses[1][1, 0], poses[1][0, 0])
    np.testing.assert_allclose(ang, 0.2, atol=1e-9)


def test_load_stereo_bag_shared_origin(stereo_bag):
    path, tl, tr, *_ , t0 = stereo_bag
    ev_l, ev_r, gt_t, gt_T = load_stereo_bag(
        path, gt_topic="/optitrack/davis")
    # one shared origin: the earlier (left) stream starts at 0, the
    # right keeps its true offset, and GT times share the clock
    assert abs(float(ev_l.t[0])) < 1e-6
    np.testing.assert_allclose(float(ev_r.t[0]), tr[0] - tl[0], atol=2e-9)
    assert ev_l.t_offset == pytest.approx(tl[0], abs=2e-9)
    np.testing.assert_allclose(gt_t[0], t0 - tl[0], atol=2e-9)
    assert gt_T.shape == (2, 4, 4)


def test_missing_topic_lists_available(stereo_bag):
    path, *_ = stereo_bag
    bag = BagReader(path)
    with pytest.raises(KeyError, match="davis/left"):
        bag.events("/nonexistent")


def test_rig_from_camera_info(tmp_path):
    """load_rig_from_bag builds the full rectified rig (LUTs, masks,
    baseline) from camera_info topics alone."""
    from esvo_tpu.io.rosbag import load_rig_from_bag
    W, H, FX, BASE = 240, 180, 150.0, 0.1
    K = [[FX, 0, W / 2 - 0.5], [0, FX, H / 2 - 0.5], [0, 0, 1]]
    R = np.eye(3)
    P_l = [[FX, 0, W / 2 - 0.5, 0], [0, FX, H / 2 - 0.5, 0],
           [0, 0, 1, 0]]
    P_r = [[FX, 0, W / 2 - 0.5, -FX * BASE], [0, FX, H / 2 - 0.5, 0],
           [0, 0, 1, 0]]
    D = [0.0, 0.0, 0.0, 0.0, 0.0]
    inner = (
        _connection(0, "/davis/left/camera_info",
                    "sensor_msgs/CameraInfo")
        + _connection(1, "/davis/right/camera_info",
                      "sensor_msgs/CameraInfo")
        + _message(0, _camera_info_msg(W, H, "plumb_bob", D, K, R, P_l))
        + _message(1, _camera_info_msg(W, H, "plumb_bob", D, K, R, P_r)))
    path = str(tmp_path / "calib.bag")
    _write_bag(path, [inner])
    rig = load_rig_from_bag(path)
    assert rig.left.width == W and rig.left.height == H
    np.testing.assert_allclose(float(rig.baseline), BASE, rtol=1e-6)
    assert bool(np.asarray(rig.left.mask).all())  # ideal pinhole: full


def test_write_roundtrip_and_repack(tmp_path):
    """write_events_bag output reads back identically, messages are
    fixed-period, and the repack CLI filters hot pixels."""
    from esvo_tpu.io.events import EventArray
    from esvo_tpu.io.rosbag import write_events_bag, hot_pixel_mask
    rng = np.random.default_rng(2)
    n = 5000
    t = np.sort(1000.0 + rng.uniform(0, 0.05, n))
    ev = EventArray(t=t, x=rng.integers(0, 346, n).astype(np.int32),
                    y=rng.integers(0, 260, n).astype(np.int32),
                    p=rng.random(n) > 0.5)
    path = str(tmp_path / "out.bag")
    write_events_bag(path, {"/davis/left/events": ev}, period=1e-3)
    bag = BagReader(path)
    back = bag.events("/davis/left/events")
    np.testing.assert_allclose(back.t, ev.t, atol=2e-9)
    np.testing.assert_array_equal(back.x, ev.x)
    np.testing.assert_array_equal(back.p, ev.p)
    # fixed-period chunking: ~50 ms span / 1 ms -> ~50 messages
    assert 40 <= bag.topics["/davis/left/events"] <= 60

    # hot-pixel filter: a pixel firing 500x stands out
    hx, hy = 100, 50
    ev_hot = EventArray(
        t=np.sort(np.concatenate([t, 1000.0 + rng.uniform(0, 0.05, 500)])),
        x=np.concatenate([ev.x, np.full(500, hx, np.int32)]),
        y=np.concatenate([ev.y, np.full(500, hy, np.int32)]),
        p=np.concatenate([ev.p, np.ones(500, bool)]))
    keep = hot_pixel_mask(ev_hot, 260, 346)
    dropped_px = set(zip(ev_hot.x[~keep].tolist(),
                         ev_hot.y[~keep].tolist()))
    assert (hx, hy) in dropped_px and len(dropped_px) <= 3
    assert keep.sum() >= n - 50


def test_repack_cli(tmp_path):
    import importlib.util
    import os as _os
    spec = importlib.util.spec_from_file_location(
        "repack_bag", _os.path.join(_os.path.dirname(__file__), "..",
                                    "scripts", "repack_bag.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rng = np.random.default_rng(3)
    n = 400
    t0 = 500.0
    tl = np.sort(t0 + rng.uniform(0, 0.02, n))
    inner = (_connection(0, "/davis/left/events", "dvs_msgs/EventArray")
             + _connection(1, "/davis/right/events",
                           "dvs_msgs/EventArray")
             + _message(0, _event_array_msg(
                 tl, rng.integers(0, 346, n), rng.integers(0, 260, n),
                 rng.random(n) > 0.5))
             + _message(1, _event_array_msg(
                 tl, rng.integers(0, 346, n), rng.integers(0, 260, n),
                 rng.random(n) > 0.5)))
    src = str(tmp_path / "src.bag")
    dst = str(tmp_path / "dst.bag")
    _write_bag(src, [inner], "bz2")
    streams = mod.main([src, dst, "--period-ms", "1",
                        "--filter-hot-pixels"])
    out = BagReader(dst)
    assert out.topics["/davis/left/events"] >= 15
    back = out.events("/davis/left/events")
    np.testing.assert_allclose(back.t, streams["/davis/left/events"].t,
                               atol=2e-9)


def test_not_a_bag(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"hello world, definitely not a bag")
    with pytest.raises(ValueError, match="not a rosbag"):
        BagReader(str(p))
