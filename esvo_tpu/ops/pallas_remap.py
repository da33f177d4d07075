"""Pallas TPU kernel: bilinear remap with a fixed (calibration) map.

The rectification remap (reference cv::remap in
esvo_time_surface/src/TimeSurface.cpp:144-151) is the single largest
cost of the time-surface stage on TPU when expressed as an XLA gather:
arbitrary per-element gathers run at ~9 ns/element (11.5 ms for a
640x480 surface), independent of how smooth the index map is.

This kernel exploits that the map is STATIC per camera: a host-side
plan partitions the output into (8, 128) tiles, and for each tile
precomputes a band origin such that every source sample lies inside a
small (BH, 128+U) window of the image. The kernel loads each tile's
band with one aligned slab load + two on-chip rolls and reconstructs
exact bilinear samples with a static shift/mask double loop:

    out(i,j) = sum_{b<BH-1, s<U} [v==b][u==s] *
               bilinear(band[b:b+2, s+j:s+j+2]; fy, fx)

where v/u are the per-element integer offsets inside the band (host
precomputed) and fy/fx the bilinear fractions. BH and U adapt to the
map: an ideal (identity) map gives BH=9, U=1; the reference's real
rectification maps give BH <= ~36, U <= ~50 (rotation tilts the map
across a tile's 128 columns).

Border semantics match cv::remap BORDER_CONSTANT with fill=0 exactly:
the image is zero-padded by one pixel, so taps that fall outside
contribute 0; elements whose 2x2 source window lies entirely outside
are masked to 0.
"""
from __future__ import annotations

import functools
import hashlib

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 8, 128


class RemapPlan:
    """Host-side static plan for one (H, W, 2) sample map."""

    def __init__(self, map_xy: np.ndarray, height: int, width: int):
        H, W = height, width
        x = np.asarray(map_xy[..., 0], np.float64)
        y = np.asarray(map_xy[..., 1], np.float64)
        assert x.shape == (H, W)
        Hp = -(-H // TH) * TH
        Wp = -(-W // TW) * TW
        xs = np.full((Hp, Wp), -10.0)
        ys = np.full((Hp, Wp), -10.0)
        xs[:H, :W] = x
        ys[:H, :W] = y

        # "at least partially inside": some of the 2x2 window overlaps
        # the image (matches the per-tap masking of the XLA path)
        valid = (xs > -1.0) & (xs < W) & (ys > -1.0) & (ys < H)
        # shift into the zero-padded frame: 1-row top margin, 129-col
        # left margin (band origins subtract the tile-local column, up
        # to 127, so x0 - j must stay addressable); clamp invalid
        xs = np.where(valid, xs + 129.0, 129.0)
        ys = np.where(valid, ys + 1.0, 1.0)
        x0 = np.floor(xs)
        y0 = np.floor(ys)
        self.fx = (xs - x0).astype(np.float32)
        self.fy = (ys - y0).astype(np.float32)
        self.m = valid.astype(np.float32)
        x0 = x0.astype(np.int64)
        y0 = y0.astype(np.int64)

        TY, TX = Hp // TH, Wp // TW
        jj = np.tile(np.arange(Wp)[None, :] % TW, (Hp, 1))
        # per-tile band origins / extents over VALID elements only
        # (invalid elements carry clamped coords and are masked out)
        oy = np.zeros((TY, TX), np.int64)
        ox = np.zeros((TY, TX), np.int64)
        BH = 2
        U = 1
        for ty in range(TY):
            for tx in range(TX):
                sl = np.s_[ty * TH:(ty + 1) * TH, tx * TW:(tx + 1) * TW]
                ok = valid[sl]
                if not ok.any():
                    continue
                yb = y0[sl][ok]
                xb = (x0[sl] - jj[sl])[ok]
                oy[ty, tx] = yb.min()
                ox[ty, tx] = xb.min()
                BH = max(BH, int(yb.max() - yb.min()) + 2)
                U = max(U, int(xb.max() - xb.min()) + 1)
        self.BH = BH
        self.U = U
        # padded-image geometry: (H + 2, W + 2) zeros-bordered, then
        # sublane/lane padding with room for the widest shifted window;
        # clamp origins so slabs and column windows stay in range
        self.Hpad = H + 2
        self.Wpad = -(-(129 + W + 2 + U + 128) // 128) * 128
        slab_h = -(-BH // 8) * 8 + 8
        self.slab_h = slab_h
        Himg = self.Hpad + slab_h            # bottom margin for slabs
        self.Himg = -(-Himg // 8) * 8
        oy = np.clip(oy, 0, self.Hpad - 1)
        ox = np.clip(ox, 0, self.Wpad - 129 - U)
        v = y0 - oy.repeat(TH, 0).repeat(TW, 1)[:Hp, :Wp]
        u = (x0 - jj) - ox.repeat(TH, 0).repeat(TW, 1)[:Hp, :Wp]
        v = np.where(valid, v, 0)
        u = np.where(valid, u, 0)
        assert v.min() >= 0 and v.max() <= BH - 2, (v.min(), v.max(), BH)
        assert u.min() >= 0 and u.max() <= U - 1, (u.min(), u.max(), U)
        self.v = v.astype(np.int32)
        self.u = u.astype(np.int32)
        self.oy = oy.reshape(-1).astype(np.int32)
        self.ox = ox.reshape(-1).astype(np.int32)
        self.H, self.W, self.Hp, self.Wp = H, W, Hp, Wp
        self.TY, self.TX = TY, TX


def _kernel(oy_ref, ox_ref, img_ref, v_ref, u_ref, fy_ref, fx_ref, m_ref,
            out_ref, *, BH: int, U: int, slab_h: int):
    t = pl.program_id(0)
    oy = oy_ref[t]
    ox = ox_ref[t]
    y_base = pl.multiple_of((oy // 8) * 8, 8)
    slab = img_ref[pl.ds(y_base, slab_h), :]
    # all roll shifts kept non-negative: negative traced shifts abort
    # the Mosaic vector-layout pass (padding >= 0 check) depending on
    # surrounding code
    Wp = slab.shape[1]
    slab = pltpu.roll(slab, (slab_h - (oy - y_base)) % slab_h, axis=0)
    band = pltpu.roll(slab, (Wp - ox) % Wp, axis=1)
    v = v_ref[...]
    u = u_ref[...]
    fy = fy_ref[...]
    fx = fx_ref[...]
    gx = 1.0 - fx
    acc = jnp.zeros((TH, TW), jnp.float32)

    def s_step(s, carry):
        acc, rolled = carry
        win0 = rolled[:, :TW]
        win1 = rolled[:, 1:TW + 1]
        um = u == s
        for b in range(BH - 1):
            vm = um & (v == b)
            h0 = gx * win0[b][None, :] + fx * win1[b][None, :]
            h1 = gx * win0[b + 1][None, :] + fx * win1[b + 1][None, :]
            acc = acc + jnp.where(vm, (1.0 - fy) * h0 + fy * h1, 0.0)
        # roll by -1 == roll by size-1 (the primitive rejects negative
        # literals; traced negative shifts elsewhere are fine)
        return acc, pltpu.roll(rolled, rolled.shape[1] - 1, axis=1)

    acc, _ = jax.lax.fori_loop(0, U, s_step, (acc, band))
    out_ref[...] = acc * m_ref[...]


@functools.partial(jax.jit, static_argnames=("plan", "interpret"))
def _remap_with_plan(img: jax.Array, plan_arrays, plan: "_PlanStatic",
                     interpret: bool = False) -> jax.Array:
    oy, ox, v, u, fy, fx, m = plan_arrays
    H, W = plan.H, plan.W
    padded = jnp.zeros((plan.Himg, plan.Wpad), jnp.float32)
    padded = jax.lax.dynamic_update_slice(
        padded, img.astype(jnp.float32), (1, 129))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.TY * plan.TX,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # padded image
            pl.BlockSpec((TH, TW), lambda t, *_: (t // plan.TX, t % plan.TX),
                         memory_space=pltpu.VMEM),        # v
            pl.BlockSpec((TH, TW), lambda t, *_: (t // plan.TX, t % plan.TX),
                         memory_space=pltpu.VMEM),        # u
            pl.BlockSpec((TH, TW), lambda t, *_: (t // plan.TX, t % plan.TX),
                         memory_space=pltpu.VMEM),        # fy
            pl.BlockSpec((TH, TW), lambda t, *_: (t // plan.TX, t % plan.TX),
                         memory_space=pltpu.VMEM),        # fx
            pl.BlockSpec((TH, TW), lambda t, *_: (t // plan.TX, t % plan.TX),
                         memory_space=pltpu.VMEM),        # m
        ],
        out_specs=pl.BlockSpec((TH, TW),
                               lambda t, *_: (t // plan.TX, t % plan.TX),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, BH=plan.BH, U=plan.U,
                          slab_h=plan.slab_h),
        out_shape=jax.ShapeDtypeStruct((plan.Hp, plan.Wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, padded, v, u, fy, fx, m)
    return out[:H, :W].astype(img.dtype)


class _PlanStatic:
    """Hashable static metadata for jit keying."""

    def __init__(self, plan: RemapPlan):
        for k in ("H", "W", "Hp", "Wp", "TY", "TX", "BH", "U",
                  "slab_h", "Himg", "Wpad"):
            setattr(self, k, getattr(plan, k))
        self._key = (self.H, self.W, self.BH, self.U, self.TY, self.TX,
                     self.slab_h, self.Himg, self.Wpad)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _PlanStatic) and self._key == other._key


_PLAN_CACHE: dict = {}          # content-keyed plans (deduped)
_ID_CACHE: dict = {}            # identity fast path (bounded LRU)
_ID_CACHE_MAX = 8               # a system holds a handful of LUTs
_PLAN_CACHE_MAX = 32


def get_plan(map_xy, height: int, width: int):
    """Build (or fetch) the remap plan for a concrete sample map.

    Two-level cache: by object identity first (the per-camera LUT is a
    long-lived array — skips hashing 2+ MB per eager call), then by
    content sha1 (distinct objects with equal maps share one plan).
    Both levels are bounded so parameter sweeps / reconfigure loops
    that rebuild cameras cannot grow memory without bound."""
    hit = _ID_CACHE.get(id(map_xy))
    if hit is not None and hit[0] is map_xy:
        return hit[1]
    m = np.asarray(map_xy)
    key = (m.shape, hashlib.sha1(m.tobytes()).hexdigest())
    entry = _PLAN_CACHE.get(key)
    if entry is None:
        plan = RemapPlan(m, height, width)
        arrays = (jnp.asarray(plan.oy), jnp.asarray(plan.ox),
                  jnp.asarray(plan.v), jnp.asarray(plan.u),
                  jnp.asarray(plan.fy), jnp.asarray(plan.fx),
                  jnp.asarray(plan.m))
        entry = (arrays, _PlanStatic(plan))
        while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[key] = entry
    # keep the object alive so its id cannot be reused by a new array;
    # evict oldest first (dict preserves insertion order)
    while len(_ID_CACHE) >= _ID_CACHE_MAX:
        _ID_CACHE.pop(next(iter(_ID_CACHE)))
    _ID_CACHE[id(map_xy)] = (map_xy, entry)
    return entry


# Band-size ceiling for routing to the kernel: the loop body unrolls
# (BH-1) adds inside a U-trip fori, so pathological (non-smooth) maps
# would compile a huge kernel that loses to the XLA gather anyway.
# Real rectification LUTs measure BH <= ~36, U <= ~50.
MAX_BAND = 96


def plan_is_banded(map_xy, height: int, width: int) -> bool:
    """True when the map is smooth enough for the banded kernel."""
    _, static = get_plan(map_xy, height, width)
    return static.BH <= MAX_BAND and static.U <= MAX_BAND


def remap_fixed_map(img: jax.Array, map_xy, interpret: bool = False):
    """Bilinear remap of img (H, W) with a CONCRETE (H, W, 2) map.

    Exactly remap_bilinear(img, map_xy, fill=0.0); the map must not be
    a tracer (it is baked into the plan). Callers should check
    plan_is_banded first — pathological maps raise."""
    H, W = img.shape
    arrays, static = get_plan(map_xy, H, W)
    if static.BH > MAX_BAND or static.U > MAX_BAND:
        raise ValueError(
            f"remap_fixed_map: map bands too wide for the banded kernel "
            f"(BH={static.BH}, U={static.U} > {MAX_BAND}); use the XLA "
            f"gather path")
    return _remap_with_plan(img, arrays, static, interpret=interpret)
