"""Pure-NumPy golden model of the reference time-surface semantics.

Implements, directly from the documented behavior of
esvo_time_surface/src/TimeSurface.cpp:52-152 (BACKWARD mode), a per-pixel
"most recent event before T" lookup with exponential decay, 8-bit scaling,
3x3 median blur (replicate border) and bilinear rectification remap.
Used only as a test oracle.
"""
import numpy as np


def golden_backward_surface(events, t_sync, height, width, decay_sec,
                            ignore_polarity=True, median_blur=True,
                            inv_map=None):
    """events: list of (t, x, y, p) tuples in arrival order."""
    last_t = np.full((height, width), -np.inf)
    last_p = np.zeros((height, width), dtype=bool)
    for (t, x, y, p) in events:
        if t <= t_sync and 0 <= x < width and 0 <= y < height:
            if t >= last_t[y, x]:
                last_t[y, x] = t
                last_p[y, x] = p
    img = np.zeros((height, width))
    has = np.isfinite(last_t)
    dt = np.where(has, t_sync - last_t, 0.0)
    val = np.where(has, np.exp(-dt / decay_sec), 0.0)
    if not ignore_polarity:
        val = val * np.where(last_p, 1.0, -1.0)
        img = 255.0 * (np.where(has, val, 0.0) + 1.0) / 2.0
        img = np.where(has, img, 0.0)
        # reference writes expVal only where an event exists; elsewhere the
        # zero-initialized map is scaled too: 255*(0+1)/2 = 127.5 -> 128
        img = np.where(has, 255.0 * (val + 1.0) / 2.0, 255.0 * 0.5)
    else:
        img = 255.0 * val
    # cvRound = round half to even
    img = np.clip(np.rint(img), 0, 255)
    if median_blur:
        img = median_3x3_replicate(img)
    if inv_map is not None:
        img = bilinear_remap(img, inv_map)
    return img


def median_3x3_replicate(img):
    H, W = img.shape
    padded = np.pad(img, 1, mode="edge")
    out = np.empty_like(img)
    for y in range(H):
        for x in range(W):
            out[y, x] = np.median(padded[y:y + 3, x:x + 3])
    return out


def bilinear_remap(img, map_xy, fill=0.0):
    H, W = img.shape
    out = np.zeros(map_xy.shape[:-1])
    for idx in np.ndindex(out.shape):
        x, y = map_xy[idx]
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        acc = 0.0
        for dy, wy_ in ((0, 1 - fy), (1, fy)):
            for dx, wx_ in ((0, 1 - fx), (1, fx)):
                xi, yi = x0 + dx, y0 + dy
                v = img[yi, xi] if (0 <= xi < W and 0 <= yi < H) else fill
                acc += wx_ * wy_ * v
        out[idx] = acc
    return out
