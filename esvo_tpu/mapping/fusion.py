"""Probabilistic depth propagation + fusion on a dense per-pixel grid.

Re-designs the reference's ``DepthFusion`` + ``SmartGrid``/``DepthMap``
(esvo_core/src/core/DepthFusion.cpp, container/SmartGrid.h). The reference
keeps a pointer-chasing sparse grid and fuses points one by one, in history
order, under a global mutex. Here the map is a dense struct-of-arrays grid
(every field an (H, W) plane — pure VPU work), and fusion is batched:

1. every history point is propagated into the current frame in parallel
   (first-order inverse-depth uncertainty propagation,
   DepthFusion.cpp:17-68);
2. each propagated point emits 4 (fusion_radius=0) or 9 (radius>=1)
   pixel candidates (DepthFusion.cpp:96-117);
3. candidates are sorted by (pixel, variance) — two stable argsorts — and
   the best K per pixel are scattered into per-pixel slots;
4. a K-step unrolled fold applies the reference's sequential per-pixel
   rules exactly (insert / chi-square- or Student-t-compatible fuse /
   occlusion / replace, DepthFusion.cpp:119-192) as (H, W) elementwise math.

The only semantic deviation from the reference is fusion *order*: the
reference fuses in history order; we canonicalize to variance-ascending
order and cap at K candidates/pixel/cycle (K=8 default; overflow counted,
not silent). Gaussian fusion is order-independent; Student-t fusion is
order-sensitive only at third order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.camera import Camera, cam_to_world, world_to_cam
from esvo_tpu.mapping.depth_refinement import DepthEstimates

EMPTY = -1.0


@struct.dataclass
class FusionConfig:
    ls_norm: str = struct.field(pytree_node=False, default="Tdist")
    fusion_radius: int = struct.field(pytree_node=False, default=0)
    max_candidates_per_pixel: int = struct.field(pytree_node=False, default=8)


@struct.dataclass
class DepthGrid:
    """Dense struct-of-arrays DepthMap (reference SmartGrid<DepthPoint>).

    inv_depth == -1 marks an empty cell (DepthPoint ctor,
    container/DepthPoint.cpp:7-34).
    """
    inv_depth: jax.Array   # (H, W)
    variance: jax.Array    # (H, W)
    scale2: jax.Array      # (H, W)
    nu: jax.Array          # (H, W)
    residual: jax.Array    # (H, W)
    age: jax.Array         # (H, W) int32
    x: jax.Array           # (H, W, 2) sub-pixel coordinate of the point
    p_cam: jax.Array       # (H, W, 3) 3D point in the frame's camera coords

    @property
    def occupied(self) -> jax.Array:
        return self.inv_depth > -1e-6


def empty_grid(height: int, width: int, dtype=jnp.float32) -> DepthGrid:
    hw = (height, width)
    gx, gy = jnp.meshgrid(jnp.arange(width, dtype=dtype),
                          jnp.arange(height, dtype=dtype))
    centers = jnp.stack([gx + 0.5, gy + 0.5], axis=-1)
    return DepthGrid(
        inv_depth=jnp.full(hw, EMPTY, dtype),
        variance=jnp.zeros(hw, dtype),
        scale2=jnp.zeros(hw, dtype),
        nu=jnp.zeros(hw, dtype),
        residual=jnp.zeros(hw, dtype),
        age=jnp.zeros(hw, jnp.int32),
        x=centers,
        p_cam=jnp.zeros(hw + (3,), dtype),
    )


@struct.dataclass
class Candidates:
    """Flat propagated-point candidates prior to the per-pixel fold."""
    inv_depth: jax.Array
    variance: jax.Array
    scale2: jax.Array
    nu: jax.Array
    residual: jax.Array
    age: jax.Array
    x: jax.Array        # (M, 2) propagated sub-pixel coordinate
    p_cam: jax.Array    # (M, 3) point in the target frame
    valid: jax.Array


def propagate_points(est: DepthEstimates, T_frame_world: jax.Array,
                     camera: Camera, cfg: FusionConfig) -> Candidates:
    """Propagate depth points into the target frame with first-order
    uncertainty propagation (reference propagate_one_point,
    DepthFusion.cpp:17-68; update loop :70-87).
    """
    W, H = camera.width, camera.height
    P = camera.params.P

    T = jnp.einsum("ij,njk->nik", T_frame_world, est.T_world_cam)  # (N,4,4)
    p = jnp.einsum("nij,nj->ni", T[:, :3, :3], est.p_cam) + T[:, :3, 3]
    x_prop = world_to_cam(P, p)
    ok = (est.valid & (x_prop[:, 0] >= 0) & (x_prop[:, 0] < W)
          & (x_prop[:, 1] >= 0) & (x_prop[:, 1] < H) & (p[:, 2] > 1e-6))

    inv_depth = 1.0 / jnp.maximum(p[:, 2], 1e-6)
    # J = d(invDepth_prop)/d(invDepth_prior), DepthFusion.cpp:41-45
    denom = (jnp.einsum("ni,ni->n", T[:, 2, :2], est.p_cam[:, :2])
             + T[:, 2, 3]) / est.p_cam[:, 2] + T[:, 2, 2]
    J = T[:, 2, 2] / jnp.maximum(denom * denom, 1e-20)
    J2 = J * J

    if cfg.ls_norm == "Tdist":
        scale2 = J2 * est.scale2
        nu = est.nu
        variance = nu / (nu - 2.0) * scale2
    else:
        variance = J2 * est.variance
        scale2 = variance
        nu = est.nu
    variance = jnp.maximum(variance, 1e-6)

    return Candidates(inv_depth=inv_depth, variance=variance, scale2=scale2,
                      nu=nu, residual=est.residual, age=est.age, x=x_prop,
                      p_cam=p, valid=ok)


def _splat(cand: Candidates, height: int, width: int,
           radius: int) -> tuple[Candidates, jax.Array]:
    """Expand each candidate to its 4 or 9 target pixels
    (DepthFusion.cpp:96-117). Returns (tiled candidates, pixel ids)."""
    col = jnp.floor(cand.x[:, 0]).astype(jnp.int32)
    row = jnp.floor(cand.x[:, 1]).astype(jnp.int32)
    if radius == 0:
        offs = [(dy, dx) for dy in (0, 1) for dx in (0, 1)]
    else:
        offs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    K = len(offs)
    dy = jnp.asarray([o[0] for o in offs], jnp.int32)
    dx = jnp.asarray([o[1] for o in offs], jnp.int32)
    rows = row[:, None] + dy[None, :]
    cols = col[:, None] + dx[None, :]
    inb = (rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)
    pix = jnp.clip(rows, 0, height - 1) * width + jnp.clip(cols, 0, width - 1)

    def tile(a):
        reps = (1, K) + (1,) * (a.ndim - 1)
        return jnp.tile(a[:, None], reps).reshape((-1,) + a.shape[1:])

    tiled = Candidates(
        inv_depth=tile(cand.inv_depth), variance=tile(cand.variance),
        scale2=tile(cand.scale2), nu=tile(cand.nu),
        residual=tile(cand.residual), age=tile(cand.age), x=tile(cand.x),
        p_cam=tile(cand.p_cam),
        valid=(tile(cand.valid) & inb.reshape(-1)))
    return tiled, pix.reshape(-1)


def _student_t_update(invD_a, scale2_a, nu_a, invD_b, scale2_b, nu_b):
    """Student-t posterior of (a <- b) (DepthPoint::update_studentT,
    container/DepthPoint.cpp:167-188). Returns (invD, scale2, nu, var)."""
    nu_u = jnp.minimum(nu_a, nu_b)
    s_sum = scale2_a + scale2_b
    invD = (scale2_b * invD_a + scale2_a * invD_b) / s_sum
    d2 = (invD_a - invD_b) ** 2
    scale2 = (nu_u + d2 / s_sum) / (nu_u + 1.0) * (scale2_a * scale2_b / s_sum)
    nu = nu_u + 1.0
    var = nu / (nu - 2.0) * scale2
    return invD, scale2, nu, var


def fuse_frame(grid: DepthGrid, cand: Candidates, camera: Camera,
               cfg: FusionConfig):
    """Fuse propagated candidates into the grid.

    Applies the reference's per-pixel rules (DepthFusion::fusion,
    DepthFusion.cpp:89-192) to the best K candidates per pixel, in
    variance-ascending order. Returns (grid, num_fusions, num_dropped).
    """
    H, W = grid.inv_depth.shape
    K = cfg.max_candidates_per_pixel
    tiled, pix = _splat(cand, H, W, cfg.fusion_radius)
    M = pix.shape[0]

    # order candidates by (pixel, variance): stable argsort by variance,
    # then stable argsort by pixel id.
    var_key = jnp.where(tiled.valid, tiled.variance, jnp.inf)
    o1 = jnp.argsort(var_key)
    pix_key = jnp.where(tiled.valid[o1], pix[o1], H * W)  # invalid last
    o2 = jnp.argsort(pix_key, stable=True)
    order = o1[o2]

    pix_sorted = pix_key[o2]
    first = jnp.searchsorted(pix_sorted, pix_sorted, side="left")
    rank = jnp.arange(M, dtype=jnp.int32) - first.astype(jnp.int32)
    keep = (pix_sorted < H * W) & (rank < K)
    num_dropped = jnp.sum((pix_sorted < H * W) & (rank >= K))

    slot_idx = jnp.where(keep, pix_sorted * K + rank, H * W * K)

    def to_slots(a_sorted, fill):
        shape = (H * W * K,) + a_sorted.shape[1:]
        buf = jnp.full(shape, fill, a_sorted.dtype)
        return buf.at[slot_idx].set(a_sorted, mode="drop") \
                  .reshape((H, W, K) + a_sorted.shape[1:])

    sl = Candidates(
        inv_depth=to_slots(tiled.inv_depth[order], 0.0),
        variance=to_slots(tiled.variance[order], 0.0),
        scale2=to_slots(tiled.scale2[order], 0.0),
        nu=to_slots(tiled.nu[order], 0.0),
        residual=to_slots(tiled.residual[order], 0.0),
        age=to_slots(tiled.age[order], 0),
        x=to_slots(tiled.x[order], 0.0),
        p_cam=to_slots(tiled.p_cam[order], 0.0),
        valid=to_slots(tiled.valid[order], False),
    )

    P = camera.params.P
    tdist = cfg.ls_norm == "Tdist"
    num_fused = jnp.zeros((), jnp.int32)

    for k in range(K):
        c_invD = sl.inv_depth[..., k]
        c_var = sl.variance[..., k]
        c_s2 = sl.scale2[..., k]
        c_nu = sl.nu[..., k]
        c_res = sl.residual[..., k]
        c_age = sl.age[..., k]
        c_x = sl.x[..., k, :]
        c_p = sl.p_cam[..., k, :]
        c_ok = sl.valid[..., k]

        occ = grid.occupied
        # --- case 1: empty cell -> insert at pixel centre
        # (DepthFusion.cpp:127-146)
        ins = c_ok & ~occ
        p_center = cam_to_world(P, grid.x, c_invD)   # grid.x is the centre
        # --- case 2: occupied -> compatibility test
        if tdist:
            std_g = jnp.sqrt(jnp.maximum(grid.variance, 0.0))
            std_c = jnp.sqrt(jnp.maximum(c_var, 0.0))
            diff = jnp.abs(c_invD - grid.inv_depth)
            compat = (diff < 2.0 * std_g) | (diff < 2.0 * std_c)
        else:
            d2 = (c_invD - grid.inv_depth) ** 2
            compat = (d2 / jnp.maximum(c_var, 1e-20)
                      + d2 / jnp.maximum(grid.variance, 1e-20)) < 5.99
        fuse = c_ok & occ & compat

        if tdist:
            f_invD, f_s2, f_nu, f_var = _student_t_update(
                grid.inv_depth, grid.scale2, grid.nu, c_invD, c_s2, c_nu)
            f_age = grid.age + 2   # update_studentT age_++ AND fusion age()++
        else:
            vsum = grid.variance + c_var
            f_invD = (grid.variance * c_invD + c_var * grid.inv_depth) / vsum
            f_var = grid.variance * c_var / vsum
            f_s2 = f_var
            f_nu = grid.nu
            f_age = grid.age + 1
        f_var = jnp.maximum(f_var, 1e-6)
        f_res = jnp.minimum(grid.residual, c_res)
        # p_cam refresh at the *fused pixel's* coordinate with the
        # candidate's inverse depth (DepthFusion.cpp:173-175)
        p_fused = cam_to_world(P, grid.x, c_invD)

        # --- case 2.2: incompatible -> occlusion check then replace
        occluded = (grid.inv_depth
                    - 2.0 * jnp.sqrt(jnp.maximum(grid.variance, 0.0))
                    ) > c_invD
        repl = (c_ok & occ & ~compat & ~occluded
                & (c_var < grid.variance) & (c_res < grid.residual))

        def pick(ins_v, fuse_v, repl_v, keep_v):
            out = jnp.where(_bcast(ins, ins_v), ins_v, keep_v)
            out = jnp.where(_bcast(fuse, fuse_v), fuse_v, out)
            return jnp.where(_bcast(repl, repl_v), repl_v, out)

        grid = DepthGrid(
            inv_depth=pick(c_invD, f_invD, c_invD, grid.inv_depth),
            variance=pick(jnp.maximum(c_var, 1e-6), f_var, c_var,
                          grid.variance),
            scale2=pick(c_s2, f_s2, c_s2, grid.scale2),
            nu=pick(c_nu, f_nu, c_nu, grid.nu),
            residual=pick(c_res, f_res, c_res, grid.residual),
            age=pick(c_age, f_age, c_age, grid.age),
            # insert keeps the pixel-centre x; replace adopts the
            # candidate's sub-pixel x (DepthFusion.cpp:186)
            x=pick(grid.x, grid.x, c_x, grid.x),
            p_cam=pick(p_center, p_fused, c_p, grid.p_cam),
        )
        num_fused = num_fused + jnp.sum(fuse)

    return grid, num_fused, num_dropped


def _bcast(mask, like):
    return mask.reshape(mask.shape + (1,) * (like.ndim - mask.ndim))


def naive_fuse_frame(grid: DepthGrid, cand: Candidates, camera: Camera,
                     cfg: FusionConfig) -> DepthGrid:
    """Naive propagation fusion used by initialization and the
    non-probabilistic MVStereo modes (DepthFusion::naive_propagation,
    DepthFusion.cpp:233-288): insert if empty; else keep the closer point
    unless the candidate has lower residual."""
    H, W = grid.inv_depth.shape
    K = cfg.max_candidates_per_pixel
    tiled, pix = _splat(cand, H, W, 0)
    M = pix.shape[0]

    res_key = jnp.where(tiled.valid, tiled.residual, jnp.inf)
    o1 = jnp.argsort(res_key)
    pix_key = jnp.where(tiled.valid[o1], pix[o1], H * W)
    o2 = jnp.argsort(pix_key, stable=True)
    order = o1[o2]
    pix_sorted = pix_key[o2]
    first = jnp.searchsorted(pix_sorted, pix_sorted, side="left")
    rank = jnp.arange(M, dtype=jnp.int32) - first.astype(jnp.int32)
    keep = (pix_sorted < H * W) & (rank < K)
    slot_idx = jnp.where(keep, pix_sorted * K + rank, H * W * K)

    def to_slots(a_sorted, fill):
        shape = (H * W * K,) + a_sorted.shape[1:]
        buf = jnp.full(shape, fill, a_sorted.dtype)
        return buf.at[slot_idx].set(a_sorted, mode="drop") \
                  .reshape((H, W, K) + a_sorted.shape[1:])

    invD_s = to_slots(tiled.inv_depth[order], 0.0)
    var_s = to_slots(tiled.variance[order], 0.0)
    res_s = to_slots(tiled.residual[order], 0.0)
    age_s = to_slots(tiled.age[order], 0)
    p_s = to_slots(tiled.p_cam[order], 0.0)
    ok_s = to_slots(tiled.valid[order], False)

    P = camera.params.P
    for k in range(K):
        c_ok = ok_s[..., k]
        c_invD = invD_s[..., k]
        occ = grid.occupied
        ins = c_ok & ~occ
        # occupied: skip if existing point is closer (larger invDepth);
        # else replace when candidate residual is lower
        # (DepthFusion.cpp:276-285)
        repl = c_ok & occ & ~(grid.inv_depth > c_invD) \
            & (res_s[..., k] < grid.residual)
        take = ins | repl
        p_center = cam_to_world(P, grid.x, c_invD)
        grid = DepthGrid(
            inv_depth=jnp.where(take, c_invD, grid.inv_depth),
            variance=jnp.where(take, jnp.maximum(var_s[..., k], 1e-6),
                               grid.variance),
            scale2=jnp.where(take, jnp.maximum(var_s[..., k], 1e-6),
                             grid.scale2),
            nu=jnp.where(take, jnp.inf, grid.nu),
            residual=jnp.where(take, res_s[..., k], grid.residual),
            age=jnp.where(take, age_s[..., k], grid.age),
            x=grid.x,
            p_cam=jnp.where(take[..., None],
                            jnp.where(ins[..., None], p_center, p_s[..., k, :]),
                            grid.p_cam),
        )
    return grid


def clean_grid(grid: DepthGrid, var_threshold: float, age_threshold: int,
               inv_depth_max: float, inv_depth_min: float) -> DepthGrid:
    """Remove points failing the validity predicate (SmartGrid::clean,
    container/SmartGrid.h:222-243 with DepthPoint::valid,
    container/DepthPoint.cpp:221-231)."""
    ok = (grid.occupied & (grid.age >= age_threshold)
          & (grid.variance <= var_threshold)
          & (grid.inv_depth <= inv_depth_max)
          & (grid.inv_depth >= inv_depth_min))
    return grid.replace(inv_depth=jnp.where(ok, grid.inv_depth, EMPTY))


def grid_points_world(grid: DepthGrid, T_world_frame: jax.Array):
    """All grid points in world coordinates + validity mask (the mapper's
    point-cloud publisher, esvo_Mapping.cpp:909-978)."""
    p = jnp.einsum("ij,hwj->hwi", T_world_frame[:3, :3], grid.p_cam) \
        + T_world_frame[:3, 3]
    return p, grid.occupied
