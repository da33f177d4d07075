"""Live browser viewer (utils/live_view.py): PNG encoder correctness and
HTTP dashboard roundtrip (the rviz analogue must actually serve what it
was fed)."""
import json
import struct
import urllib.request
import zlib

import numpy as np

from esvo_tpu.utils.live_view import LiveViewer, encode_png


def decode_png_rgb(png: bytes):
    """Tiny decoder for the subset encode_png emits (8-bit RGB, filter 0
    on every row)."""
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(png):
        (n,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        data = png[pos + 8:pos + 8 + n]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
            assert depth == 8 and ctype == 2
        elif tag == b"IDAT":
            idat += data
        pos += 12 + n
    raw = zlib.decompress(idat)
    stride = 1 + 3 * w
    rows = []
    for i in range(h):
        row = raw[i * stride:(i + 1) * stride]
        assert row[0] == 0, "encoder uses filter type 0"
        rows.append(np.frombuffer(row[1:], np.uint8).reshape(w, 3))
    return np.stack(rows)


def test_png_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_png_rgb(encode_png(img)), img)
    # grayscale input broadcasts to RGB
    g = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    out = decode_png_rgb(encode_png(g))
    np.testing.assert_array_equal(out[..., 0], g)
    np.testing.assert_array_equal(out[..., 1], g)


def test_http_dashboard_roundtrip():
    viewer = LiveViewer(port=0, host="127.0.0.1")   # ephemeral port
    try:
        img = np.zeros((8, 8, 3), np.uint8)
        img[2, 3] = (250, 10, 99)
        viewer.update("inv_depth", img)
        viewer.update_text("status", "WORKING tick 5")
        base = f"http://127.0.0.1:{viewer.port}"

        page = urllib.request.urlopen(base + "/").read().decode()
        assert "esvo_tpu live" in page

        state = json.loads(
            urllib.request.urlopen(base + "/state.json").read())
        assert state["frames"] == ["inv_depth"]
        assert state["text"]["status"] == "WORKING tick 5"

        png = urllib.request.urlopen(base + "/frame/inv_depth.png").read()
        np.testing.assert_array_equal(decode_png_rgb(png), img)

        code = urllib.request.urlopen(
            base + "/frame/nope.png").getcode() if False else None
        try:
            urllib.request.urlopen(base + "/frame/nope.png")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # newest frame wins
        img2 = np.full((4, 4, 3), 7, np.uint8)
        viewer.update("inv_depth", img2)
        png2 = urllib.request.urlopen(
            base + "/frame/inv_depth.png").read()
        np.testing.assert_array_equal(decode_png_rgb(png2), img2)
    finally:
        viewer.close()


def test_param_and_reset_control_channel():
    """POST /param and /reset — the dynamic_reconfigure analogue
    (reference cfg/DVS_MappingStereo.cfg; change handler resets,
    esvo_Mapping.cpp:806-866). Handlers receive the requests; a
    rejected parameter surfaces the reason with a 400."""
    got = {"params": [], "resets": 0}

    def on_param(s):
        if "bogus" in s:
            raise ValueError(f"unknown field {s!r}")
        got["params"].append(s)
        return "queued"

    def on_reset():
        got["resets"] += 1

    v = LiveViewer(port=0, host="127.0.0.1", on_param=on_param,
                   on_reset=on_reset)
    base = f"http://127.0.0.1:{v.port}"
    try:
        req = urllib.request.Request(
            f"{base}/param", data=b"bm.zncc_threshold=0.3", method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200 and b"queued" in r.read()
        req = urllib.request.Request(f"{base}/reset", data=b"",
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        bad = urllib.request.Request(
            f"{base}/param", data=b"bogus.field=1", method="POST")
        try:
            urllib.request.urlopen(bad)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code == 400 and b"unknown field" in e.read()
        assert raised
        assert got["params"] == ["bm.zncc_threshold=0.3"]
        assert got["resets"] == 1
        # control UI is embedded in the dashboard page
        with urllib.request.urlopen(f"{base}/") as r:
            page = r.read().decode()
        assert "setParam" in page and "reset system" in page
    finally:
        v.close()
