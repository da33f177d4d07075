"""Weak-scaling efficiency of the sharded mapping estimate.

Measures the depth-LM solve (the mapping cycle's dominant, event-parallel
stage) with the event axis sharded over an n-device mesh, growing the
event count proportionally (weak scaling): efficiency(n) =
t(1 device, N events) / t(n devices, n*N events).

On the virtual CPU mesh all devices share this host's physical cores, so
wall-clock efficiency mostly measures core oversubscription. Two extra
measurements isolate the *sharding* overhead (the quantity that predicts
real multi-chip efficiency, where each device has its own compute):

- **CPU time per shard**: process CPU seconds (getrusage, includes the
  XLA worker threads) divided by device count. Oversubscription stretches
  wall-clock but not total CPU work; any growth of CPU-time-per-shard
  with n IS sharding/partitioning/collective overhead. Projected
  multi-chip weak-scaling efficiency = cpu_per_shard(1)/cpu_per_shard(n).
- **Collective bytes per step**: parsed from the compiled HLO
  (all-gather/all-reduce/... output shapes) — the exact cross-device
  traffic a real pod would put on ICI.

Run on the virtual CPU mesh (the environment has one physical TPU chip;
BASELINE.md's >=80%-efficiency north star is a multi-host target —
this harness is the drop-in measurement for real pods):

    python scripts/bench_scaling.py --cpu --devices 1,2,4,8

On a real pod, run without the flag. Writes a markdown table to stdout
and (with --out) to a file.
"""
import argparse
import os
import re
import resource
import sys
import time

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def collective_bytes(compiled_text: str) -> dict:
    """Sum output bytes of collective ops in a compiled HLO dump."""
    out = {}
    pat = re.compile(
        r"(\w[\w.\-]*)\s*=\s*(?:\(([^)]*)\)|(\S+?))\s*"
        r"(all-gather|all-reduce|reduce-scatter|collective-permute|"
        r"all-to-all)")
    for m in pat.finditer(compiled_text):
        shapes = m.group(2) if m.group(2) else m.group(3)
        op = m.group(4)
        nbytes = 0
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES.get(dt, 4)
        out[op] = out.get(op, 0) + nbytes
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--events-per-device", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    dev_counts = [int(s) for s in args.devices.split(",")]

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(dev_counts)}")

    import numpy as np
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from esvo_tpu.geometry.camera import make_ideal_rig
    from esvo_tpu.mapping import depth_refinement as dr
    from esvo_tpu.parallel.sharding import make_mesh, EVENT_AXIS
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    W, H = 240, 180
    disp = 8
    rng = np.random.default_rng(0)
    rig = make_ideal_rig(W, H, 200.0, 200.0, W / 2 - 0.5, H / 2 - 0.5,
                         0.1, dtype=jnp.float32)
    cfg = dr.DepthProblemConfig(max_iteration=8)
    base = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    ts_l = jnp.asarray(base[:, 32:32 + W])
    ts_r = jnp.asarray(base[:, 32 + disp:32 + disp + W])
    d_true = disp / (0.1 * 200.0)

    est_specs = jax.tree.map(lambda _: P(EVENT_AXIS),
                             dr.DepthEstimates(*([0] * 10)))

    rows = []
    t1 = None
    for n_dev in dev_counts:
        if n_dev > len(jax.devices()):
            print(f"skip n={n_dev}: only {len(jax.devices())} devices")
            continue
        N = args.events_per_device * n_dev
        mesh = make_mesh(n_dev)
        coords = jnp.stack(
            [jnp.asarray(rng.uniform(30, W - 30, N), jnp.float32),
             jnp.asarray(rng.uniform(20, H - 20, N), jnp.float32)], axis=1)
        d_init = jnp.asarray(d_true * rng.uniform(0.85, 1.15, N),
                             jnp.float32)
        eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))
        valid = jnp.ones(N, bool)
        t_ev = jnp.zeros(N, jnp.float32)

        body = lambda *a: dr.solve(*a, rig, cfg)
        fn = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(EVENT_AXIS),) * 6 + (P(), P()),
            out_specs=est_specs, check_vma=False))
        lowered = fn.lower(coords, eye, eye, d_init, valid, t_ev,
                           ts_l, ts_r)
        compiled = lowered.compile()
        coll = collective_bytes(compiled.as_text())
        coll_total = sum(coll.values())
        out = fn(coords, eye, eye, d_init, valid, t_ev, ts_l, ts_r)
        jax.block_until_ready(out.inv_depth)
        ru0 = resource.getrusage(resource.RUSAGE_SELF)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(coords, eye, eye, d_init, valid, t_ev, ts_l, ts_r)
        jax.block_until_ready(out.inv_depth)
        dt = (time.perf_counter() - t0) / args.reps
        ru1 = resource.getrusage(resource.RUSAGE_SELF)
        cpu = ((ru1.ru_utime + ru1.ru_stime)
               - (ru0.ru_utime + ru0.ru_stime)) / args.reps
        cpu_shard = cpu / n_dev
        if t1 is None:
            t1 = dt
            cpu1 = cpu_shard
        eff = t1 / dt
        proj = cpu1 / cpu_shard
        rows.append((n_dev, N, dt * 1e3, N / dt / 1e3, eff,
                     cpu_shard * 1e3, proj, coll_total, coll))
        print(f"n={n_dev}  N={N}  wall {dt*1e3:8.2f} ms  "
              f"{N/dt/1e3:9.1f} k ev/s  wall-eff {eff*100:5.1f}%  "
              f"cpu/shard {cpu_shard*1e3:7.2f} ms  "
              f"sharding-eff {proj*100:5.1f}%  "
              f"collectives {coll_total/1e3:.1f} kB {coll}")

    lines = [
        "| devices | events | wall (ms) | throughput (k ev/s) "
        "| wall-clock eff (oversubscribed) | CPU ms/shard "
        "| sharding eff (projected multi-chip) | collective kB/step |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n_dev, N, ms, kevs, eff, cpums, proj, cb, _ in rows:
        lines.append(f"| {n_dev} | {N} | {ms:.2f} | {kevs:.1f} "
                     f"| {eff*100:.1f}% | {cpums:.2f} | {proj*100:.1f}% "
                     f"| {cb/1e3:.1f} |")
    table = "\n".join(lines)
    print()
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
