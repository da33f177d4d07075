"""Pure-NumPy golden model of the reference DepthProblem residual.

Literal reimplementation (for testing only) of
esvo_core/src/core/DepthProblem.cpp:34-262 — warping, patch interpolation
and the l2 / zncc / Tdist residual norms, including the Student-t scale
fixed-point loop. Used to validate esvo_tpu.mapping.depth_refinement.
"""
import numpy as np


def cam2world(P, x, inv_depth):
    z = 1.0 / inv_depth
    A = P[:, :3]
    b = P[:, 3]
    xh = np.array([x[0], x[1], 1.0])
    return np.linalg.inv(A) @ (z * xh - b)


def warping(x, d, P_left, P_right, T_left_virtual, wx, wy, width, height):
    p_rv = cam2world(P_left, x, d)
    p_left = T_left_virtual[:3, :3] @ p_rv + T_left_virtual[:3, 3]
    x1h = P_left[:, :3] @ p_left + P_left[:, 3]
    x2h = P_right[:, :3] @ p_left + P_right[:, 3]
    x1 = x1h[:2] / x1h[2]
    x2 = x2h[:2] / x2h[2]
    bx = (wx - 1) // 2
    by = (wy - 1) // 2
    ok = not (x1[0] < bx or x1[0] > width - bx or x1[1] < by
              or x1[1] > height - by or x2[0] < bx or x2[0] > width - bx
              or x2[1] < by or x2[1] > height - by)
    return x1, x2, ok


def patch_interpolation(img, location, wx, wy):
    H, W = img.shape
    ulx = int(np.floor(location[0])) - (wx - 1) // 2
    uly = int(np.floor(location[1])) - (wy - 1) // 2
    drx = int(np.floor(location[0])) + (wx - 1) // 2
    dry = int(np.floor(location[1])) + (wy - 1) // 2
    if ulx < 0 or uly < 0:
        return None
    if drx >= W or dry >= H:
        return None
    if uly + wy >= H or ulx + wx >= W:
        return None
    q1 = (np.floor(location[0]) + 1) - location[0]
    q2 = location[0] - np.floor(location[0])
    q3 = (np.floor(location[1]) + 1) - location[1]
    q4 = location[1] - np.floor(location[1])
    src = img[uly:uly + wy + 1, ulx:ulx + wx + 1]
    r = q1 * src[:, 0:wx] + q2 * src[:, 1:wx + 1]
    return q3 * r[0:wy, :] + q4 * r[1:wy + 1, :]


def residuals(d, coord, T_left_virtual, ts_left, ts_right, P_left, P_right,
              wx, wy, ls_norm="Tdist", td_nu=2.1897, td_scale=16.6397):
    H, W = ts_left.shape
    P = wx * wy
    td_scale_sq = td_scale ** 2

    def oob():
        if ls_norm == "l2":
            return np.full(P, 255.0)
        if ls_norm == "zncc":
            return np.full(P, 2.0 / np.sqrt(P))
        if ls_norm == "Tdist":
            w = (td_nu + 1) / (td_nu + (255.0 / td_scale) ** 2)
            return np.full(P, np.sqrt(w) * 255.0)
        raise ValueError(ls_norm)

    x1, x2, ok = warping(coord, d, P_left, P_right, T_left_virtual, wx, wy,
                         W, H)
    if not ok:
        return oob()
    tau1 = patch_interpolation(ts_left, x1, wx, wy)
    tau2 = patch_interpolation(ts_right, x2, wx, wy)
    if tau1 is None or tau2 is None:
        return oob()

    if ls_norm == "l2":
        return (tau1 - tau2).reshape(-1)
    if ls_norm == "zncc":
        mu1, s1 = tau1.mean(), tau1.std() + 1e-6
        mu2, s2 = tau2.mean(), tau2.std() + 1e-6
        return (((tau1 - mu1) / s1 - (tau2 - mu2) / s2) / np.sqrt(P)) \
            .reshape(-1)
    if ls_norm == "Tdist":
        r = (tau1 - tau2).reshape(-1)
        r2 = r ** 2
        s1 = td_scale_sq
        s2 = -1.0
        first = True
        while first or abs(s2 - s1) / s1 > 0.05:
            if not first:
                s1 = s2
            ssum = 0.0
            for i in range(P):
                if r[i] != 0:
                    ssum += r2[i] * (td_nu + 1) / (td_nu + r2[i] / s1)
            if ssum == 0:
                s2 = td_scale_sq
                break
            s2 = ssum / P
            first = False
        w = (td_nu + 1) / (td_nu + r2 / s2)
        return np.sqrt(w) * r
    raise ValueError(ls_norm)
