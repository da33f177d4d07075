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

from esvo_tpu.geometry.camera import Camera, cam_to_world, world_to_cam, inv3
from esvo_tpu.mapping.depth_refinement import DepthEstimates

EMPTY = -1.0
# occupancy threshold shared by DepthGrid.occupied and the fuse fold
_OCC_EPS = -1e-6


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
        return self.inv_depth > _OCC_EPS


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

    T = jnp.einsum("ij,njk->nik", T_frame_world, est.T_world_cam,
                  precision="highest")  # (N,4,4)
    p = jnp.einsum("nij,nj->ni", T[:, :3, :3], est.p_cam,
                  precision="highest") + T[:, :3, 3]
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
        nu = est.nu
        # Estimates carrying nu=inf (SGM bootstrap, EM/BM pseudo points) have
        # no Student-t scale; nu/(nu-2)*scale2 would be inf/inf = NaN. Fall
        # back to the Gaussian propagation rule for those points.
        finite_nu = jnp.isfinite(nu)
        scale2_t = J2 * est.scale2
        var_g = J2 * est.variance
        variance = jnp.where(finite_nu, nu / (nu - 2.0) * scale2_t, var_g)
        scale2 = jnp.where(finite_nu, scale2_t, var_g)
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
    """Expand each candidate to its 4 (radius 0) or (2r+1)^2 target
    pixels (DepthFusion.cpp:96-117). Returns (tiled candidates, pixel
    ids)."""
    col = jnp.floor(cand.x[:, 0]).astype(jnp.int32)
    row = jnp.floor(cand.x[:, 1]).astype(jnp.int32)
    if radius == 0:
        offs = [(dy, dx) for dy in (0, 1) for dx in (0, 1)]
    else:
        r = range(-radius, radius + 1)
        offs = [(dy, dx) for dy in r for dx in r]
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


def _segment_rank(sorted_ids: jax.Array) -> jax.Array:
    """rank[i] = i - (first index of sorted_ids[i]'s segment).

    Computed with a cummax over segment-start positions — searchsorted's
    'scan' lowering is a serialized while loop on TPU (~8 ms at 65k keys);
    this is one associative scan.
    """
    n = sorted_ids.shape[0]
    ar = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool),
                                sorted_ids[1:] != sorted_ids[:-1]])
    start_pos = jnp.where(is_start, ar, 0)
    seg_start = jax.lax.cummax(start_pos)
    return ar - seg_start


def _assign_slots_sort(pix, valid, val_key, hw, K):
    """Slot id per candidate (rank*hw + pix, or hw*K = dropped) via ONE
    2-key lexicographic sort (jax.lax.sort num_keys=2; stable, so ties
    in (pixel, value) break by original index)."""
    M = pix.shape[0]
    vk = jnp.where(valid, val_key, jnp.inf)
    pk = jnp.where(valid, pix, hw)                      # invalid last
    ar = jnp.arange(M, dtype=jnp.int32)
    pix_sorted, _, order = jax.lax.sort((pk, vk, ar), num_keys=2)
    rank = _segment_rank(pix_sorted)
    keep = (pix_sorted < hw) & (rank < K)
    slot_sorted = jnp.where(keep, rank * hw + pix_sorted, hw * K)
    slot = jnp.zeros((M,), jnp.int32).at[order].set(slot_sorted)
    num_dropped = jnp.sum((pix_sorted < hw) & (rank >= K))
    return slot, num_dropped


def _assign_slots(pix, valid, val_key, hw, K):
    # One strategy only: an alternative "scatter_min" assignment (K
    # rounds of per-pixel (value, index) scatter-min, bitwise-identical
    # slots) was carried through r03-r04 but measured 5x slower than the
    # sort on every device/shape ever benched (BENCH_r04 fuse_ab_ms:
    # 18.0 vs 3.5 ms rpg, 35.9 vs 7.3 ms DSEC) — deleted in r5.
    return _assign_slots_sort(pix, valid, val_key, hw, K)


def _student_t_update(invD_a, scale2_a, nu_a, invD_b, scale2_b, nu_b):
    """Student-t posterior of (a <- b) (DepthPoint::update_studentT,
    container/DepthPoint.cpp:167-188). Returns (invD, scale2, nu, var).

    nu = inf marks Gaussian-statistics points (SGM bootstrap, naive
    modes); the nu -> inf limit of the Tdist update is exactly the
    Gaussian product scale2_a*scale2_b/s_sum, but evaluating the Tdist
    formula at inf is inf/inf = NaN — select the limit explicitly."""
    nu_u = jnp.minimum(nu_a, nu_b)
    s_sum = scale2_a + scale2_b
    invD = (scale2_b * invD_a + scale2_a * invD_b) / s_sum
    d2 = (invD_a - invD_b) ** 2
    gauss = scale2_a * scale2_b / s_sum
    finite = jnp.isfinite(nu_u)
    nu_safe = jnp.where(finite, nu_u, 3.0)
    scale2 = jnp.where(
        finite, (nu_safe + d2 / s_sum) / (nu_safe + 1.0) * gauss, gauss)
    nu = jnp.where(finite, nu_u + 1.0, nu_u)
    var = jnp.where(finite, nu / jnp.maximum(nu - 2.0, 1e-6) * scale2,
                    scale2)
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

    # best-K-per-pixel slots in variance-ascending order (strategy:
    # one lexicographic sort, or K scatter-min rounds — identical slots)
    slot_idx, num_dropped = _assign_slots(
        pix, tiled.valid, tiled.variance, H * W, K)
    dt = tiled.inv_depth.dtype

    # K-major slot layout: channel buffers come out as (K, H, W), so the
    # fold reads dense (H, W) planes with no relayout (a pixel-major
    # (H, W, K, C) buffer forces either strided plane reads or a
    # pathological materialized transpose). One independent 1D scatter
    # per channel: a single (C, M) -> slots scatter composed with a
    # gather-pack makes XLA pick a layout that serializes the scatter
    # (~21 ns/update, 33 ms at DSEC scale); per-channel flat scatters
    # with the shared index vector run at full scatter throughput.
    # Only 8 channels are scattered: the candidate's p_cam is recomputed
    # in the fold by back-projecting (x, invD) — exact, because
    # propagate_points produced x by projecting p_cam — and validity is
    # invD > 0 (every candidate surviving propagation has positive
    # inverse depth; empty slots stay at the 0 fill). 33% less scatter
    # traffic on the stage's dominant cost.
    def scat(src):
        return jnp.zeros((H * W * K,), dt) \
            .at[slot_idx].set(src.astype(dt), mode="drop") \
            .reshape(K, H, W)

    buf = [
        scat(tiled.inv_depth),
        scat(tiled.variance),
        scat(tiled.scale2),
        scat(tiled.nu),
        scat(tiled.residual),
        scat(tiled.age.astype(dt)),
        scat(tiled.x[:, 0]),
        scat(tiled.x[:, 1]),
    ]

    P = camera.params.P
    tdist = cfg.ls_norm == "Tdist"
    num_fused = jnp.zeros((), jnp.int32)

    # The fold runs on (H, W) channel PLANES: on TPU an (H, W, 3) array
    # tiles its minor dim into the 128-lane axis (42x wasted bandwidth);
    # per-plane math keeps every op dense. Reassemble at the end.
    g = {
        "invD": grid.inv_depth, "var": grid.variance, "s2": grid.scale2,
        "nu": grid.nu, "res": grid.residual, "age": grid.age,
        "x0": grid.x[..., 0], "x1": grid.x[..., 1],
        "p0": grid.p_cam[..., 0], "p1": grid.p_cam[..., 1],
        "p2": grid.p_cam[..., 2],
    }
    Ainv = inv3(P[:, :3])
    b = P[:, 3]

    def back_project_planes(x0, x1, invD):
        """cam_to_world on planes: p = Ainv (z*[u,v,1] - b)."""
        z = 1.0 / invD
        r0 = z * x0 - b[0]
        r1 = z * x1 - b[1]
        r2 = z - b[2]
        return (Ainv[0, 0] * r0 + Ainv[0, 1] * r1 + Ainv[0, 2] * r2,
                Ainv[1, 0] * r0 + Ainv[1, 1] * r1 + Ainv[1, 2] * r2,
                Ainv[2, 0] * r0 + Ainv[2, 1] * r1 + Ainv[2, 2] * r2)

    for k in range(K):
        c_invD = buf[0][k]
        c_var = buf[1][k]
        c_s2 = buf[2][k]
        c_nu = buf[3][k]
        c_res = buf[4][k]
        c_age = buf[5][k].astype(jnp.int32)
        c_x0 = buf[6][k]
        c_x1 = buf[7][k]
        c_ok = c_invD > 0.0
        # candidate 3D point, recomputed instead of scattered (see buf)
        c_p0, c_p1, c_p2 = back_project_planes(
            c_x0, c_x1, jnp.maximum(c_invD, 1e-12))

        occ = g["invD"] > _OCC_EPS
        # --- case 1: empty cell -> insert at pixel centre
        # (DepthFusion.cpp:127-146)
        ins = c_ok & ~occ
        pc0, pc1, pc2 = back_project_planes(g["x0"], g["x1"],
                                            jnp.maximum(c_invD, 1e-12))
        # --- case 2: occupied -> compatibility test
        if tdist:
            std_g = jnp.sqrt(jnp.maximum(g["var"], 0.0))
            std_c = jnp.sqrt(jnp.maximum(c_var, 0.0))
            diff = jnp.abs(c_invD - g["invD"])
            compat = (diff < 2.0 * std_g) | (diff < 2.0 * std_c)
        else:
            d2 = (c_invD - g["invD"]) ** 2
            compat = (d2 / jnp.maximum(c_var, 1e-20)
                      + d2 / jnp.maximum(g["var"], 1e-20)) < 5.99
        fuse = c_ok & occ & compat

        if tdist:
            f_invD, f_s2, f_nu, f_var = _student_t_update(
                g["invD"], g["s2"], g["nu"], c_invD, c_s2, c_nu)
            f_age = g["age"] + 2   # update_studentT age_++ AND fusion age()++
        else:
            vsum = g["var"] + c_var
            f_invD = (g["var"] * c_invD + c_var * g["invD"]) / vsum
            f_var = g["var"] * c_var / vsum
            f_s2 = f_var
            f_nu = g["nu"]
            f_age = g["age"] + 1
        f_var = jnp.maximum(f_var, 1e-6)
        f_res = jnp.minimum(g["res"], c_res)

        # --- case 2.2: incompatible -> occlusion check then replace
        occluded = (g["invD"]
                    - 2.0 * jnp.sqrt(jnp.maximum(g["var"], 0.0))) > c_invD
        repl = (c_ok & occ & ~compat & ~occluded
                & (c_var < g["var"]) & (c_res < g["res"]))

        def pick(ins_v, fuse_v, repl_v, keep_v):
            out = jnp.where(ins, ins_v, keep_v)
            out = jnp.where(fuse, fuse_v, out)
            return jnp.where(repl, repl_v, out)

        g = {
            "invD": pick(c_invD, f_invD, c_invD, g["invD"]),
            "var": pick(jnp.maximum(c_var, 1e-6), f_var, c_var, g["var"]),
            "s2": pick(c_s2, f_s2, c_s2, g["s2"]),
            "nu": pick(c_nu, f_nu, c_nu, g["nu"]),
            "res": pick(c_res, f_res, c_res, g["res"]),
            "age": pick(c_age, f_age, c_age, g["age"]),
            # insert keeps the pixel-centre x; replace adopts the
            # candidate's sub-pixel x (DepthFusion.cpp:186)
            "x0": pick(g["x0"], g["x0"], c_x0, g["x0"]),
            "x1": pick(g["x1"], g["x1"], c_x1, g["x1"]),
            # p_cam: insert/fuse re-back-project at the cell's coordinate
            # with the candidate depth (DepthFusion.cpp:141-143,173-175);
            # replace adopts the candidate's propagated point
            "p0": pick(pc0, pc0, c_p0, g["p0"]),
            "p1": pick(pc1, pc1, c_p1, g["p1"]),
            "p2": pick(pc2, pc2, c_p2, g["p2"]),
        }
        num_fused = num_fused + jnp.sum(fuse)

    grid = DepthGrid(
        inv_depth=g["invD"], variance=g["var"], scale2=g["s2"], nu=g["nu"],
        residual=g["res"], age=g["age"],
        x=jnp.stack([g["x0"], g["x1"]], axis=-1),
        p_cam=jnp.stack([g["p0"], g["p1"], g["p2"]], axis=-1),
    )
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

    # best-K per pixel in residual-ascending order
    slot_idx, _ = _assign_slots(
        pix, tiled.valid, tiled.residual, H * W, K)

    dt = tiled.inv_depth.dtype

    # per-channel flat scatters (see fuse_frame: a packed multi-channel
    # scatter after the gather-pack serializes on TPU). As in fuse_frame,
    # p_cam is recomputed from (x, invD) instead of scattered, and
    # validity is invD > 0 — 6 channels instead of 8.
    def scat(src):
        return jnp.zeros((H * W * K,), dt) \
            .at[slot_idx].set(src.astype(dt), mode="drop") \
            .reshape(K, H, W)

    buf = [
        scat(tiled.inv_depth),
        scat(tiled.variance),
        scat(tiled.residual),
        scat(tiled.age.astype(dt)),
        scat(tiled.x[:, 0]),
        scat(tiled.x[:, 1]),
    ]

    P = camera.params.P
    for k in range(K):
        c_invD = buf[0][k]
        c_ok = c_invD > 0.0
        c_var = buf[1][k]
        c_res = buf[2][k]
        c_age = buf[3][k].astype(jnp.int32)
        c_x = jnp.stack([buf[4][k], buf[5][k]], axis=-1)
        c_p = cam_to_world(P, c_x, jnp.maximum(c_invD, 1e-12))
        occ = grid.occupied
        ins = c_ok & ~occ
        # occupied: skip if existing point is closer (larger invDepth);
        # else replace when candidate residual is lower
        # (DepthFusion.cpp:276-285)
        repl = c_ok & occ & ~(grid.inv_depth > c_invD) \
            & (c_res < grid.residual)
        take = ins | repl
        p_center = cam_to_world(P, grid.x, jnp.maximum(c_invD, 1e-12))
        grid = DepthGrid(
            inv_depth=jnp.where(take, c_invD, grid.inv_depth),
            variance=jnp.where(take, jnp.maximum(c_var, 1e-6),
                               grid.variance),
            scale2=jnp.where(take, jnp.maximum(c_var, 1e-6), grid.scale2),
            nu=jnp.where(take, jnp.inf, grid.nu),
            residual=jnp.where(take, c_res, grid.residual),
            age=jnp.where(take, c_age, grid.age),
            x=grid.x,
            p_cam=jnp.where(take[..., None],
                            jnp.where(ins[..., None], p_center, c_p),
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
    # reset x to the pixel centre as well: the reference's clean removes
    # the DepthPoint entirely, so a later insert back-projects at the
    # centre — keeping a replaced point's propagated sub-pixel x would
    # poison the next occupant of the cell (incremental fuse users; the
    # runtime itself always rebuilds from empty_grid)
    H, W = grid.inv_depth.shape
    dt = grid.x.dtype
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=dt), jnp.arange(H, dtype=dt))
    centers = jnp.stack([gx + 0.5, gy + 0.5], axis=-1)
    return grid.replace(
        inv_depth=jnp.where(ok, grid.inv_depth, EMPTY),
        x=jnp.where(ok[..., None], grid.x, centers))


def grid_points_world(grid: DepthGrid, T_world_frame: jax.Array):
    """All grid points in world coordinates + validity mask (the mapper's
    point-cloud publisher, esvo_Mapping.cpp:909-978)."""
    p = jnp.einsum("ij,hwj->hwi", T_world_frame[:3, :3], grid.p_cam,
                  precision="highest") + T_world_frame[:3, 3]
    return p, grid.occupied
