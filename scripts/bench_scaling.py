"""Weak-scaling efficiency of every sharded pipeline stage.

r4's scaling bench only timed the depth-LM solve, whose out-specs stay
sharded — zero collectives, so the "≥80 % scaling efficiency" target was
supported by a bench with no communication (VERDICT r4 weak #6). This
harness measures EVERY sharded stage, including the ones with real
cross-device traffic:

| stage      | sharded axis | collectives (per compiled HLO)           |
|---|---|---|
| solve      | events       | none (outputs stay sharded)              |
| surface    | events       | 2x pmax all-reduce of the (H, W) grids   |
| tracking   | map points   | psum of J^T J (6,6) + J^T r (6) + cost   |
| ba         | observations | psum'd Schur normal-equation blocks      |
| pose_graph | edges        | psum'd (6K, 6K) normal equations         |

Per stage and device count: wall time, throughput, **CPU time per
shard** (process CPU seconds / device count — on the virtual CPU mesh
all devices share this host's cores, so wall-clock measures
oversubscription while CPU-per-shard growth isolates the true
sharding/collective overhead; projected multi-chip weak-scaling
efficiency = cpu_per_shard(1)/cpu_per_shard(n)), and **collective bytes
per step** parsed from the compiled HLO (all-gather/all-reduce/... output
shapes) — the exact traffic a real pod would put on ICI.

Run on the virtual CPU mesh (this environment has one physical TPU chip;
BASELINE.md's >=80 %-efficiency north star is a multi-host target — this
harness is the drop-in measurement for real pods):

    python scripts/bench_scaling.py --cpu --devices 1,2,4,8

On a real pod, run without the flag. Writes markdown tables to stdout
and (with --out) to a file.
"""
import argparse
import os
import re
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def measure(fn, args, reps):
    """(wall s/step, cpu s/step, collective byte dict) of a jitted fn."""
    import jax
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    coll = collective_bytes(compiled.as_text())
    out = compiled(*args)
    jax.block_until_ready(out)
    ru0 = resource.getrusage(resource.RUSAGE_SELF)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(*args)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / reps
    ru1 = resource.getrusage(resource.RUSAGE_SELF)
    cpu = ((ru1.ru_utime + ru1.ru_stime)
           - (ru0.ru_utime + ru0.ru_stime)) / reps
    return wall, cpu, coll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--events-per-device", type=int, default=2048)
    ap.add_argument("--points-per-device", type=int, default=2048)
    ap.add_argument("--obs-per-device", type=int, default=2048)
    ap.add_argument("--edges-per-device", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    ap.add_argument("--stages", default="solve,surface,tracking,ba,"
                    "pose_graph")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    dev_counts = [int(s) for s in args.devices.split(",")]
    stages = args.stages.split(",")

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(dev_counts)}")

    import numpy as np
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from esvo_tpu.geometry.camera import make_ideal_rig
    from esvo_tpu.geometry import se3
    from esvo_tpu.surface import time_surface as tsf
    from esvo_tpu.tracking import registration as reg
    from esvo_tpu.mapping import depth_refinement as dr
    from esvo_tpu.backend import bundle_adjustment as ba
    from esvo_tpu.backend import pose_graph as pg
    from esvo_tpu.parallel import sharding as ps

    W, H = 240, 180
    disp = 8
    rng = np.random.default_rng(0)
    rig = make_ideal_rig(W, H, 200.0, 200.0, W / 2 - 0.5, H / 2 - 0.5,
                         0.1, dtype=jnp.float32)
    base = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
    k = np.ones(5) / 5
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    ts_l = jnp.asarray(base[:, 32:32 + W])
    ts_r = jnp.asarray(base[:, 32 + disp:32 + disp + W])
    d_true = disp / (0.1 * 200.0)

    # ---- per-stage builders: (fn, args) for device count n ----
    def build_solve(n, mesh):
        N = args.events_per_device * n
        cfg = dr.DepthProblemConfig(max_iteration=8)
        coords = jnp.stack(
            [jnp.asarray(rng.uniform(30, W - 30, N), jnp.float32),
             jnp.asarray(rng.uniform(20, H - 20, N), jnp.float32)], axis=1)
        d_init = jnp.asarray(d_true * rng.uniform(0.85, 1.15, N),
                             jnp.float32)
        eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (N, 4, 4))
        est_specs = jax.tree.map(lambda _: P(ps.EVENT_AXIS),
                                 dr.DepthEstimates(*([0] * 10)))
        body = lambda *a: dr.solve(*a, rig, cfg)
        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(ps.EVENT_AXIS),) * 6 + (P(), P()),
                       out_specs=est_specs, check_vma=False)
        return fn, (coords, eye, eye, d_init, jnp.ones(N, bool),
                    jnp.zeros(N, jnp.float32), ts_l, ts_r), N

    def build_surface(n, mesh):
        N = args.events_per_device * n
        ev = tsf.EventBatch.from_arrays(
            rng.integers(0, W, N), rng.integers(0, H, N),
            np.sort(rng.uniform(0, 0.01, N)).astype(np.float32),
            rng.random(N) > 0.5)
        state = tsf.init_state(H, W)
        fn = lambda st, e: ps.sharded_surface_update(mesh, st, e)
        return fn, (state, ev), N

    def build_tracking(n, mesh):
        M = args.points_per_device * n
        cfg = reg.RegProblemConfig()
        pts = jnp.stack([
            jnp.asarray(rng.uniform(-0.8, 0.8, M), jnp.float32),
            jnp.asarray(rng.uniform(-0.5, 0.5, M), jnp.float32),
            jnp.asarray(rng.uniform(1.5, 3.0, M), jnp.float32)], axis=1)
        neg, gu, gv = reg.negative_time_surface(ts_l, cfg.kernel_size)
        step = ps.sharded_tracking_step(mesh, rig.left, cfg)
        eye3 = jnp.eye(3, dtype=jnp.float32)
        return (step, (eye3, jnp.zeros(3, jnp.float32),
                       jnp.eye(4, dtype=jnp.float32), neg, gu, gv, pts,
                       jnp.ones(M, bool)), M)

    def build_ba(n, mesh):
        M = args.obs_per_device * n
        K, Pn = 8, 512
        cfg = ba.BAConfig(max_iterations=5)
        pts = np.stack([rng.uniform(-1, 1, Pn), rng.uniform(-0.7, 0.7, Pn),
                        rng.uniform(2.0, 4.0, Pn)], axis=1)
        T_kf = np.broadcast_to(np.eye(4), (K, 4, 4)).copy()
        T_kf[:, 0, 3] = np.linspace(-0.2, 0.2, K)
        obs_kf = rng.integers(0, K, M)
        obs_pt = rng.integers(0, Pn, M)
        p_cam = pts[obs_pt] - T_kf[obs_kf][:, :3, 3]
        uv = np.stack([200.0 * p_cam[:, 0] / p_cam[:, 2] + W / 2 - 0.5,
                       200.0 * p_cam[:, 1] / p_cam[:, 2] + H / 2 - 0.5],
                      axis=1) + rng.normal(0, 0.5, (M, 2))
        prob = ba.BAProblem(
            T_world_kf=jnp.asarray(T_kf, jnp.float32),
            points=jnp.asarray(pts, jnp.float32),
            obs_kf=jnp.asarray(obs_kf, jnp.int32),
            obs_point=jnp.asarray(obs_pt, jnp.int32),
            obs_uv=jnp.asarray(uv, jnp.float32),
            obs_valid=jnp.ones(M, bool),
            fx=jnp.float32(200.0), fy=jnp.float32(200.0),
            cx=jnp.float32(W / 2 - 0.5), cy=jnp.float32(H / 2 - 0.5))
        run = ps.sharded_bundle_adjust(mesh, cfg)
        return run, (prob,), M

    def build_pose_graph(n, mesh):
        E = args.edges_per_device * n
        K = 256
        cfg = pg.PoseGraphConfig(max_iterations=5)
        ang = np.linspace(0, 2 * np.pi, K)
        T = np.broadcast_to(np.eye(4), (K, 4, 4)).copy()
        T[:, 0, 3] = np.cos(ang)
        T[:, 1, 3] = np.sin(ang)
        ei = np.concatenate([np.arange(K - 1),
                             rng.integers(0, K // 2, max(E - K + 1, 1))])[:E]
        ej = np.concatenate([np.arange(1, K),
                             rng.integers(K // 2, K, max(E - K + 1, 1))])[:E]
        T_ij = np.einsum("eij,ejk->eik", np.linalg.inv(T[ei]), T[ej])
        graph = pg.PoseGraph(
            T_world=jnp.asarray(T, jnp.float32),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            T_ij=jnp.asarray(T_ij, jnp.float32),
            w_rot=jnp.full(E, 100.0, jnp.float32),
            w_trans=jnp.full(E, 100.0, jnp.float32),
            edge_valid=jnp.ones(E, bool))
        run = ps.sharded_pose_graph(mesh, cfg)
        return run, (graph,), E

    builders = {"solve": build_solve, "surface": build_surface,
                "tracking": build_tracking, "ba": build_ba,
                "pose_graph": build_pose_graph}

    results = {s: [] for s in stages}
    refs = {}
    for n_dev in dev_counts:
        if n_dev > len(jax.devices()):
            print(f"skip n={n_dev}: only {len(jax.devices())} devices")
            continue
        mesh = ps.make_mesh(n_dev)
        for stage in stages:
            fn, fargs, items = builders[stage](n_dev, mesh)
            wall, cpu, coll = measure(fn, fargs, args.reps)
            cpu_shard = cpu / n_dev
            if stage not in refs:
                refs[stage] = (wall, cpu_shard)
            w1, c1 = refs[stage]
            eff_wall = w1 / wall
            eff_proj = c1 / max(cpu_shard, 1e-12)
            coll_total = sum(coll.values())
            results[stage].append(
                (n_dev, items, wall * 1e3, eff_wall, cpu_shard * 1e3,
                 eff_proj, coll_total, coll))
            print(f"{stage:>10}  n={n_dev}  items={items:7d}  "
                  f"wall {wall*1e3:8.2f} ms  wall-eff {eff_wall*100:5.1f}%  "
                  f"cpu/shard {cpu_shard*1e3:7.2f} ms  "
                  f"sharding-eff {eff_proj*100:5.1f}%  "
                  f"collectives {coll_total/1e3:.1f} kB {coll}")

    blocks = []
    for stage in stages:
        lines = [
            f"### {stage}",
            "",
            "| devices | items | wall (ms) | wall-clock eff "
            "(oversubscribed) | CPU ms/shard | sharding eff "
            "(projected multi-chip) | collective kB/step | by op |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for (n_dev, items, ms, effw, cpums, effp, cb,
             coll) in results[stage]:
            by_op = ", ".join(f"{k} {v/1e3:.1f}"
                              for k, v in sorted(coll.items())) or "-"
            lines.append(
                f"| {n_dev} | {items} | {ms:.2f} | {effw*100:.1f}% "
                f"| {cpums:.2f} | {effp*100:.1f}% | {cb/1e3:.1f} "
                f"| {by_op} |")
        blocks.append("\n".join(lines))
    table = "\n\n".join(blocks)
    print()
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
