"""Multi-chip scaling: shard the event/point axes over a device mesh.

The reference's concurrency is CPU thread striping over events
(core/EventBM.cpp:299-315, core/DepthProblemSolver.cpp:80-90) and over
map points (core/RegProblemLM.cpp:98-113), plus ROS process pipelining
(SURVEY.md section 2). The TPU-native equivalents, all built on
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI:

- **time-surface update**: events are data-parallel; each device scatters
  its shard into a local last-timestamp grid, and the grids merge with an
  elementwise max all-reduce (scatter-max is associative, so the sharded
  update is exactly the serial one);
- **mapping (BM + depth refinement)**: embarrassingly parallel over the
  event axis — each device matches/refines its shard, results
  all-gather (the per-event estimates are tiny next to the compute);
- **tracking Gauss-Newton**: points shard across devices; J^T J (6x6) and
  J^T r (6,) reduce with psum — the canonical data-parallel normal
  equations.

Everything here also runs on a CPU host mesh
(``--xla_force_host_platform_device_count``) for CI.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from esvo_tpu.geometry.camera import StereoRig, Camera
from esvo_tpu.surface import time_surface as tsf
from esvo_tpu.mapping import block_matching as bm
from esvo_tpu.mapping import depth_refinement as dr
from esvo_tpu.ops.linalg import solve_spd
from esvo_tpu.tracking import registration as reg
from esvo_tpu.backend import bundle_adjustment as ba

EVENT_AXIS = "ev"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (EVENT_AXIS,))


def sharded_surface_update(mesh: Mesh, state: tsf.TimeSurfaceState,
                           ev: tsf.EventBatch) -> tsf.TimeSurfaceState:
    """Scatter-max event timestamps with the event axis sharded.

    Per-device local scatter + max all-reduce == the serial insert_events
    (esvo_tpu/surface/time_surface.py), because max is associative.
    """
    def body(last_pos, last_neg, ev_shard):
        local = tsf.insert_events(
            tsf.TimeSurfaceState(last_t_pos=last_pos, last_t_neg=last_neg),
            ev_shard)
        return (jax.lax.pmax(local.last_t_pos, EVENT_AXIS),
                jax.lax.pmax(local.last_t_neg, EVENT_AXIS))

    # jit the shard_map: called eagerly it would dispatch every
    # primitive of the body as its own sharded program (minutes of
    # per-op compiles on a CPU mesh) instead of one compiled program
    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(EVENT_AXIS)),
        out_specs=(P(), P()), check_vma=False))
    pos, neg = fn(state.last_t_pos, state.last_t_neg, ev)
    return tsf.TimeSurfaceState(last_t_pos=pos, last_t_neg=neg)


def sharded_map_estimate(mesh: Mesh, rig: StereoRig,
                         bm_cfg: bm.BlockMatchConfig,
                         dp_cfg: dr.DepthProblemConfig):
    """Returns a function (ts_l, ts_r, x_rect, t, valid, T_wv, T_lv,
    d_init_unused...) -> DepthEstimates with the event axis sharded.

    Mirrors the thread-striped EventBM + DepthProblemSolver pipeline
    (EventBM.cpp:299-315, DepthProblemSolver.cpp:28-90) as one device
    program per shard; outputs stay sharded (callers usually scatter/fuse
    them next, which is cheapest on the gathered host of the estimates).
    """

    def body(ts_l, ts_r, x_rect, t, valid, T_wv, T_lv):
        matches = bm.match_events(ts_l, ts_r, x_rect, x_rect, t, valid,
                                  rig.left.mask, rig, bm_cfg)
        est = dr.solve(matches.x_left, T_wv, T_lv, matches.inv_depth,
                       matches.valid, t, ts_l, ts_r, rig, dp_cfg)
        return est

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(EVENT_AXIS), P(EVENT_AXIS), P(EVENT_AXIS),
                  P(EVENT_AXIS), P(EVENT_AXIS)),
        # prefix spec: every DepthEstimates leaf is sharded on its
        # leading (event) axis
        out_specs=P(EVENT_AXIS),
        check_vma=False))
    return fn


def sharded_tracking_step(mesh: Mesh, camera: Camera,
                          cfg: reg.RegProblemConfig):
    """Returns fn(prob_R, prob_t, T_world_ref, ts_neg, grad_u, grad_v,
    points, valid) -> (dx (6,), cost) with points sharded: per-shard
    J^T J / J^T r + psum, replicated solve.
    """

    def body(R, t, T_world_ref, ts_neg, gu, gv, pts, ok):
        prob = reg.RegProblem(R=R, t=t, T_world_ref=T_world_ref,
                              points=pts, point_valid=ok, ts_negative=ts_neg,
                              grad_u=gu, grad_v=gv)
        zero = jnp.zeros(6, dtype=R.dtype)
        fvec, _, _ = reg.residuals_and_weights(prob, zero, pts, ok, camera,
                                               cfg)
        # same dispatch as the serial solver (registration.solve):
        # numerical path for RegProblemType 0 or patch sizes > 1
        if cfg.use_numerical_diff or cfg.patch_size_x * cfg.patch_size_y > 1:
            J = reg.numerical_jacobian(prob, pts, ok, camera, cfg)
        else:
            J = reg.analytic_jacobian(prob, pts, ok, camera, cfg)
        f = fvec.reshape(-1)
        H = jax.lax.psum(jnp.matmul(J.T, J, precision="highest"),
                         EVENT_AXIS)
        g = jax.lax.psum(jnp.matmul(J.T, f, precision="highest"),
                         EVENT_AXIS)
        cost = jax.lax.psum(jnp.sum(f * f), EVENT_AXIS)
        damp = cfg.lm_damping * jnp.diag(jnp.diag(H)) \
            + 1e-12 * jnp.eye(6, dtype=R.dtype)
        dx = -solve_spd(H + damp, g)
        # a singular/indefinite H NaNs the unrolled Cholesky; reject the
        # step like the serial solver (registration.solve) instead of
        # handing callers a NaN pose update
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        return dx, cost

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(EVENT_AXIS),
                  P(EVENT_AXIS)),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


def sharded_bundle_adjust(mesh: Mesh, cfg: ba.BAConfig):
    """Returns fn(BAProblem-with-obs-padded-to-mesh-size) ->
    (T_world_kf, points, costs): the full LM-damped Schur BA with the
    observation axis sharded across the mesh. Poses/points stay
    replicated; every segment reduction inside the Schur assembly psums
    over ICI (see bundle_adjust(axis_name=...)). The observation count
    must be divisible by the mesh size (pad with obs_valid=False)."""

    def body(T_kf, points, obs_kf, obs_point, obs_uv, obs_valid,
             fx, fy, cx, cy):
        prob = ba.BAProblem(T_world_kf=T_kf, points=points, obs_kf=obs_kf,
                            obs_point=obs_point, obs_uv=obs_uv,
                            obs_valid=obs_valid, fx=fx, fy=fy, cx=cx,
                            cy=cy)
        prob, costs = ba.bundle_adjust(prob, cfg, axis_name=EVENT_AXIS)
        return prob.T_world_kf, prob.points, costs

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(EVENT_AXIS), P(EVENT_AXIS), P(EVENT_AXIS),
                  P(EVENT_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(), P()), check_vma=False))

    def run(prob: ba.BAProblem):
        T_kf, points, costs = fn(prob.T_world_kf, prob.points, prob.obs_kf,
                                 prob.obs_point, prob.obs_uv,
                                 prob.obs_valid, prob.fx, prob.fy, prob.cx,
                                 prob.cy)
        return prob.replace(T_world_kf=T_kf, points=points), costs

    return run


def sharded_ba_normal_equations(mesh: Mesh, cfg: ba.BAConfig):
    """Returns fn(problem-with-sharded-observations) -> (B, C, gc, gp):
    the BA normal-equation blocks assembled per observation shard and
    psum-reduced over the mesh (ba.assemble_normal_equations — the same
    assembly _gn_step uses; the dense (P, K, 6, 3) cross tensor is
    never materialized, Schur columns reduce observation-indexed). The
    (small) reduced camera solve runs replicated afterwards — the
    Schur-complement reduction pattern from the north star, with
    observations as the sharded axis and ICI all-reduce as the only
    communication.
    """

    def body(T_kf, points, obs_kf, obs_point, obs_uv, obs_valid,
             fx, fy, cx, cy):
        prob = ba.BAProblem(T_world_kf=T_kf, points=points, obs_kf=obs_kf,
                            obs_point=obs_point, obs_uv=obs_uv,
                            obs_valid=obs_valid, fx=fx, fy=fy, cx=cx,
                            cy=cy)
        B, C, gc, gp, _, _ = ba.assemble_normal_equations(
            prob, cfg, axis_name=EVENT_AXIS)
        return B, C, gc, gp

    return jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(EVENT_AXIS), P(EVENT_AXIS), P(EVENT_AXIS),
                  P(EVENT_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()), check_vma=False))


def sharded_pose_graph(mesh: Mesh, cfg):
    """Returns fn(PoseGraph-with-edges-padded-to-mesh-size) ->
    (graph, costs): LM pose-graph optimization with the EDGE axis sharded
    across the mesh. Poses stay replicated; the (6K, 6K) normal-equation
    assembly psums the per-shard scatter-adds over ICI and the small
    dense solve runs replicated (optimize_pose_graph(axis_name=...)).
    The edge count must be divisible by the mesh size (pad with
    edge_valid=False slots)."""
    from esvo_tpu.backend import pose_graph as pg

    def body(T_world, ei, ej, T_ij, w_rot, w_trans, valid):
        graph = pg.PoseGraph(T_world=T_world, edge_i=ei, edge_j=ej,
                             T_ij=T_ij, w_rot=w_rot, w_trans=w_trans,
                             edge_valid=valid)
        graph, costs = pg.optimize_pose_graph(graph, cfg,
                                              axis_name=EVENT_AXIS)
        return graph.T_world, costs

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(EVENT_AXIS), P(EVENT_AXIS), P(EVENT_AXIS),
                  P(EVENT_AXIS), P(EVENT_AXIS), P(EVENT_AXIS)),
        out_specs=(P(), P()), check_vma=False))

    def run(graph):
        T_world, costs = fn(graph.T_world, graph.edge_i, graph.edge_j,
                            graph.T_ij, graph.w_rot, graph.w_trans,
                            graph.edge_valid)
        return graph.replace(T_world=T_world), costs

    return run
