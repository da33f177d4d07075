"""SE(3) / SO(3) utilities as pure JAX functions.

Re-derives (from the published math, not by translation) the rotation
parameterizations the reference relies on:

- Cayley transform <-> rotation matrix (reference: esvo_core/src/tools/cayley.cpp:3-39),
  used by the tracker's 6-DoF state.
- Quaternion pose interpolation (reference: tf::Transformer::lookupTransform
  interpolation, used by esvo_Mapping::getPoseAt,
  esvo_core/src/esvo_Mapping.cpp:646-667).
- SVD re-orthonormalization of drifting rotations
  (reference: esvo_core/src/core/RegProblemLM.cpp:336-337).

All functions are batched-friendly (leading dims broadcast) and
dtype-polymorphic; poses are 4x4 homogeneous matrices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cayley_to_rot(c: jax.Array) -> jax.Array:
    """Cayley parameters (..., 3) -> rotation matrices (..., 3, 3).

    R = ((1 - [c]x)^-1 (1 + [c]x)) expressed in closed form:
    R = 1/(1+|c|^2) * [[1+c1^2-c2^2-c3^2, 2(c1 c2 - c3), 2(c1 c3 + c2)], ...]
    """
    c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2]
    s = 1.0 + c1 * c1 + c2 * c2 + c3 * c3
    r = jnp.stack(
        [
            1.0 + c1 * c1 - c2 * c2 - c3 * c3,
            2.0 * (c1 * c2 - c3),
            2.0 * (c1 * c3 + c2),
            2.0 * (c1 * c2 + c3),
            1.0 - c1 * c1 + c2 * c2 - c3 * c3,
            2.0 * (c2 * c3 - c1),
            2.0 * (c1 * c3 - c2),
            2.0 * (c2 * c3 + c1),
            1.0 - c1 * c1 - c2 * c2 + c3 * c3,
        ],
        axis=-1,
    ).reshape(c.shape[:-1] + (3, 3))
    return r / s[..., None, None]


def rot_to_cayley(R: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> Cayley parameters (..., 3).

    C = (R - I)(R + I)^-1, cayley = (-C12, C02, -C01).
    """
    eye = jnp.eye(3, dtype=R.dtype)
    C = jnp.matmul(R - eye, jnp.linalg.inv(R + eye))
    return jnp.stack([-C[..., 1, 2], C[..., 0, 2], -C[..., 0, 1]], axis=-1)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) in (x, y, z, w) order -> (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    r = jnp.stack(
        [
            1.0 - (yy + zz), xy - wz, xz + wy,
            xy + wz, 1.0 - (xx + zz), yz - wx,
            xz - wy, yz + wx, 1.0 - (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4), (x, y, z, w), w>=0.

    Branch-free Shepperd-style extraction: compute all four candidate
    quaternions (each numerically good in one trace regime) and select the
    one with the largest pivot — no data-dependent control flow, jit-safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, pivot on (tr, m00, m11, m22)
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-30))

    sw = safe_sqrt(1.0 + tr)            # 2w
    q_w = jnp.stack([(m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw),
                     (m10 - m01) / (2 * sw), sw / 2], axis=-1)
    sx = safe_sqrt(1.0 + m00 - m11 - m22)  # 2x
    q_x = jnp.stack([sx / 2, (m01 + m10) / (2 * sx),
                     (m02 + m20) / (2 * sx), (m21 - m12) / (2 * sx)], axis=-1)
    sy = safe_sqrt(1.0 - m00 + m11 - m22)  # 2y
    q_y = jnp.stack([(m01 + m10) / (2 * sy), sy / 2,
                     (m12 + m21) / (2 * sy), (m02 - m20) / (2 * sy)], axis=-1)
    sz = safe_sqrt(1.0 - m00 - m11 + m22)  # 2z
    q_z = jnp.stack([(m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz),
                     sz / 2, (m10 - m01) / (2 * sz)], axis=-1)

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign (w >= 0) and normalization
    q = q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def slerp(q0: jax.Array, q1: jax.Array, alpha) -> jax.Array:
    """Spherical linear interpolation between quaternions (x, y, z, w)."""
    alpha = jnp.asarray(alpha, dtype=q0.dtype)[..., None]
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta)
                   / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, alpha, jnp.sin(alpha * theta)
                   / jnp.where(small, 1.0, sin_theta))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def so3_hat(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric cross-product matrices."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([zero, -wz, wy], -1),
        jnp.stack([wz, zero, -wx], -1),
        jnp.stack([-wy, wx, zero], -1),
    ], -2)


def _theta_coeffs(th2: jax.Array):
    """Taylor-safe (A, B, C) = (sin/th, (1-cos)/th^2, (th-sin)/th^3).

    The small-angle branch uses series so the jnp.where never divides by
    zero in either branch (which would poison forward-mode tangents)."""
    small = th2 < 1e-8
    th2s = jnp.where(small, 1.0, th2)        # safe denominator
    th = jnp.sqrt(th2s)
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2s)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (1.0 - A) / th2s)
    return A, B, C


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues exponential (..., 3) axis-angle -> (..., 3, 3)."""
    th2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _theta_coeffs(th2)
    K = so3_hat(w)
    K2 = jnp.matmul(K, K)
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + A[..., None, None] * K + B[..., None, None] * K2


def so3_log(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3) axis-angle, |w| in [0, pi].

    Routed through the branch-free quaternion extraction (rot_to_quat
    pivots on the largest component, so this is stable for all angles
    including near pi, where the classic (R - R^T) skew formula
    degenerates)."""
    q = rot_to_quat(R)                        # (x, y, z, w), w >= 0
    xyz = q[..., :3]
    qw = q[..., 3]
    n2 = jnp.sum(xyz * xyz, axis=-1)
    small = n2 < 1e-12
    n = jnp.sqrt(jnp.where(small, 1.0, n2))
    angle = 2.0 * jnp.arctan2(n, qw)
    # |w| = angle, axis = xyz / n; small-angle limit 2 * xyz / qw
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-12), angle / n)
    return xyz * scale[..., None]


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) = (omega, v) -> (..., 4, 4) rigid transform.

    Rotation block exp([omega]x); translation V(omega) v with the left
    Jacobian V = I + B [w]x + C [w]x^2."""
    w = xi[..., :3]
    v = xi[..., 3:]
    th2 = jnp.sum(w * w, axis=-1)
    A, B, C = _theta_coeffs(th2)
    K = so3_hat(w)
    K2 = jnp.matmul(K, K)
    eye = jnp.eye(3, dtype=xi.dtype)
    R = eye + A[..., None, None] * K + B[..., None, None] * K2
    V = eye + B[..., None, None] * K + C[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return se3_matrix(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> twist (..., 6) = (omega, v); inverse of se3_exp."""
    w = so3_log(T[..., :3, :3])
    th2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _theta_coeffs(th2)
    small = th2 < 1e-8
    th2s = jnp.where(small, 1.0, th2)
    # V^-1 = I - 1/2 [w]x + D [w]x^2,  D = (1 - A/(2B)) / th^2
    # (Taylor: 1/12 + th^2/720 + ...)
    D = jnp.where(small, 1.0 / 12.0 + th2 / 720.0,
                  (1.0 - A / (2.0 * B)) / th2s)
    K = so3_hat(w)
    K2 = jnp.matmul(K, K)
    eye = jnp.eye(3, dtype=T.dtype)
    Vinv = eye - 0.5 * K + D[..., None, None] * K2
    v = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3])
    return jnp.concatenate([w, v], axis=-1)


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4) homogeneous transform."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jax.Array) -> jax.Array:
    """Inverse of (..., 4, 4) rigid transforms (closed form, no solve)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest"))


def se3_compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return jnp.matmul(A, B)


def transform_points(T: jax.Array, p: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, p, precision="highest") + t


def orthonormalize_rotation(R: jax.Array) -> jax.Array:
    """Project (..., 3, 3) onto SO(3) via SVD (UV^T), fixing handedness.

    The reference re-orthonormalizes after every Cayley composition
    (esvo_core/src/core/RegProblemLM.cpp:336-337, :357-358).
    """
    U, _, Vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(jnp.matmul(U, Vt))
    # flip last column of U where det < 0 to stay in SO(3)
    U = U.at[..., :, 2].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return jnp.matmul(U, Vt)


def orthonormalize_rotation_fast(R: jax.Array) -> jax.Array:
    """Project a NEARLY orthogonal (..., 3, 3) matrix onto SO(3) with two
    Newton-Schulz polar iterations R <- R (3I - R^T R) / 2.

    Quadratic convergence: for drift ~1e-6 (products of rotations) the
    result matches the SVD projection to f32 precision, without the SVD
    custom call that dominates the tracker's sequential LM rounds on TPU
    (reference re-orthonormalizes with Jacobi SVD,
    esvo_core/src/core/RegProblemLM.cpp:336-337). NOT valid for matrices
    far from orthogonal — use orthonormalize_rotation there.
    """
    eye3 = 3.0 * jnp.eye(3, dtype=R.dtype)
    for _ in range(2):
        R = 0.5 * R @ (eye3 - jnp.swapaxes(R, -1, -2) @ R) \
            if R.ndim > 2 else 0.5 * (R @ (eye3 - R.T @ R))
    return R


def interpolate_pose(t0, T0: jax.Array, t1, T1: jax.Array, t) -> jax.Array:
    """Interpolate a rigid pose at time t between stamped poses (t0, T0),
    (t1, T1): lerp on translation, slerp on rotation — the same semantics as
    tf interpolation used by esvo_Mapping::getPoseAt
    (esvo_core/src/esvo_Mapping.cpp:646-667).
    """
    t0 = jnp.asarray(t0, dtype=T0.dtype)
    t1 = jnp.asarray(t1, dtype=T0.dtype)
    t = jnp.asarray(t, dtype=T0.dtype)
    denom = jnp.where(jnp.abs(t1 - t0) < 1e-12, 1.0, t1 - t0)
    alpha = jnp.clip((t - t0) / denom, 0.0, 1.0)
    q0 = rot_to_quat(T0[..., :3, :3])
    q1 = rot_to_quat(T1[..., :3, :3])
    q = slerp(q0, q1, alpha)
    trans = (1.0 - alpha)[..., None] * T0[..., :3, 3] \
        + alpha[..., None] * T1[..., :3, 3]
    return se3_matrix(quat_to_rot(q), trans)


def interpolate_pose_table(times: jax.Array, poses: jax.Array,
                           query_t: jax.Array) -> jax.Array:
    """Vectorized pose lookup: given a sorted stamped-pose table
    (times (S,), poses (S, 4, 4)), interpolate poses at query_t (Q,).

    Device-side replacement for the reference's tf buffer +
    StampTransformationMap virtual-view table
    (esvo_core/src/esvo_Mapping.cpp:581-599).
    Queries outside the table clamp to the end poses.
    """
    S = times.shape[0]
    # method='compare_all': the default 'scan' lowers to a serialized
    # while loop on TPU; the table is small, so S comparisons per query
    # vectorize better
    hi = jnp.clip(jnp.searchsorted(times, query_t, side="left",
                                   method="compare_all"), 1, S - 1)
    lo = hi - 1
    T0 = poses[lo]
    T1 = poses[hi]
    return interpolate_pose(times[lo], T0, times[hi], T1, query_t)


# ---------------------------------------------------------------------------
# SoA pose rows: the TPU-native layout for per-event / per-point pose tables
# ---------------------------------------------------------------------------
# A batch of N rigid transforms stored as (N, 4, 4) is hostile to the TPU
# memory system: the trailing 4x4 pads to an (8, 128) tile (a 32x blow-up),
# and batched 3x3 matvecs lower to tiny serialized dot_generals (measured
# ~0.7 ms just to *slice* an (8192, 4, 4) array on-chip). The SoA layout
# stores the top 3x4 of each transform row-major as 12 coefficient planes
# of shape (12, N): each plane is lane-contiguous, every compose/apply is
# plain VPU elementwise math, and the whole table is 3x smaller in HBM.
# rows[4*i + j] == T[i, j].

def rows_from_matrices(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (12, ...). One transpose at the layout boundary."""
    flat = T[..., :3, :4].reshape(T.shape[:-2] + (12,))
    return jnp.moveaxis(flat, -1, 0)


def matrices_from_rows(rows: jax.Array) -> jax.Array:
    """(12, ...) -> (..., 4, 4) with the affine bottom row appended."""
    batch = rows.shape[1:]
    T34 = jnp.moveaxis(rows, 0, -1).reshape(batch + (3, 4))
    bottom = jnp.zeros(batch + (1, 4), rows.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([T34, bottom], axis=-2)


def rows_apply(rows: jax.Array, px, py, pz):
    """Apply (12, N) transforms to per-lane points: returns (qx, qy, qz)."""
    qx = rows[0] * px + rows[1] * py + rows[2] * pz + rows[3]
    qy = rows[4] * px + rows[5] * py + rows[6] * pz + rows[7]
    qz = rows[8] * px + rows[9] * py + rows[10] * pz + rows[11]
    return qx, qy, qz

