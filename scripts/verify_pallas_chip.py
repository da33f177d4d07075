"""On-chip verification of the Pallas kernels after the roll hardening.

Checks, on the real TPU:
  1. pallas_remap parity vs the XLA bilinear path on a real-shaped
     rectification map (rotation + distortion-like warp), plus timing.
  2. pallas_slice_patches parity vs the flat-gather fallback.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

from esvo_tpu.ops.pallas_remap import remap_fixed_map
from esvo_tpu.ops.pallas_patches import pallas_slice_patches
def _slice_patches_gather(img, uy, ux, h, w):
    H, W = img.shape
    yy = jnp.clip(uy[:, None, None] + jnp.arange(h)[None, :, None], 0, H - 1)
    xx = jnp.clip(ux[:, None, None] + jnp.arange(w)[None, None, :], 0, W - 1)
    return jnp.take(img.reshape(-1), yy * W + xx, mode="clip")


def xla_remap(img, map_xy, fill=0.0):
    H, W = img.shape
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(-1).astype(jnp.float32)

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        idx = jnp.clip(yy, 0, H - 1) * W + jnp.clip(xx, 0, W - 1)
        return jnp.where(ok, jnp.take(flat, idx.reshape(-1)).reshape(idx.shape), fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    return out.astype(img.dtype)


def make_map(H, W, seed=0, angle=0.02, scale=1.01):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    cx, cy = W / 2, H / 2
    ca, sa = np.cos(angle), np.sin(angle)
    xs = scale * (ca * (xx - cx) - sa * (yy - cy)) + cx
    ys = scale * (sa * (xx - cx) + ca * (yy - cy)) + cy
    # smooth radial "distortion" wobble
    r2 = ((xx - cx) / W) ** 2 + ((yy - cy) / H) ** 2
    xs = xs + 3.0 * r2 * (xx - cx) / W
    ys = ys + 3.0 * r2 * (yy - cy) / H
    return np.stack([xs, ys], axis=-1)


def check_remap(H, W, label):
    m = make_map(H, W)
    img = jnp.asarray(np.random.default_rng(1).random((H, W)), jnp.float32)
    ref = np.asarray(jax.jit(xla_remap)(img, jnp.asarray(m, jnp.float32)))
    out = np.asarray(remap_fixed_map(img, m.astype(np.float32)))
    err = np.abs(out - ref).max()
    print(f"remap {label}: max|err|={err:.3e}", "OK" if err < 1e-4 else "FAIL")
    assert err < 1e-4, err
    # timing
    m32 = m.astype(np.float32)
    f_ref = jax.jit(lambda im: xla_remap(im, jnp.asarray(m32)))
    f_pal = lambda im: remap_fixed_map(im, m32)
    for name, f in [("xla", f_ref), ("pallas", f_pal)]:
        f(img).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(img)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 20 * 1e3
        print(f"  {name}: {dt:.3f} ms")


def check_patches():
    rng = np.random.default_rng(2)
    H, W, N, h, w = 240, 320, 4096, 8, 8
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    uy = jnp.asarray(rng.integers(0, H - h, N), jnp.int32)
    ux = jnp.asarray(rng.integers(0, W - w, N), jnp.int32)
    out = np.asarray(pallas_slice_patches(img, uy, ux, h, w))
    ref = np.asarray(_slice_patches_gather(img, uy, ux, h, w))
    err = np.abs(out - ref).max()
    print(f"patches: max|err|={err:.3e}", "OK" if err == 0 else "FAIL")
    assert err == 0, err
    f = jax.jit(lambda im, a, b: pallas_slice_patches(im, a, b, h, w))
    f(img, uy, ux).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        r = f(img, uy, ux)
    r.block_until_ready()
    print(f"  pallas patches: {(time.perf_counter()-t0)/20*1e3:.3f} ms")


if __name__ == "__main__":
    check_remap(240, 180, "240x180")
    check_remap(480, 640, "DSEC 480x640")
    check_patches()
    print("ALL OK")
