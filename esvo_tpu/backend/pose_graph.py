"""SE(3) pose-graph optimization, TPU-batched.

A new capability beyond the reference (which has no backend at all — the
tracker's raw pose stream is the final trajectory, esvo_Tracking.cpp:430-462):
given keyframe poses and relative-pose measurements (odometry chain +
loop-closure edges from backend.loop_closure), minimize

    sum_e  || log( T_e^-1 · T_i^-1 · T_j ) ||^2_{W_e}

over the absolute poses {T_k}. Structured for TPU:

- every edge's 6-vector residual and its (6, 12) Jacobian w.r.t. the two
  incident local twists evaluate in one batched jacfwd (12 JVPs through
  ~30 elementwise ops + two 4x4 matmuls — no per-edge Python);
- the (6K, 6K) normal equations assemble with flat scatter-adds of the
  per-edge 12x12 outer products (one scatter, duplicate-index add);
- Levenberg-Marquardt with fixed trips and accept/reject damping
  (jax.lax.scan — no data-dependent control flow);
- the edge axis shards across a device mesh: pass `axis_name` inside
  shard_map and the H / g / cost reductions psum over it
  (parallel.sharding.sharded_pose_graph).

Pose increments are left-multiplicative twists T_k <- exp(xi_k) T_k
(geometry.se3.se3_exp/se3_log).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from esvo_tpu.geometry.se3 import (
    se3_exp, se3_log, se3_inverse, orthonormalize_rotation_fast)
from esvo_tpu.utils.precision import highest_precision


@struct.dataclass
class PoseGraphConfig:
    max_iterations: int = struct.field(pytree_node=False, default=20)
    damping: float = struct.field(pytree_node=False, default=1e-6)
    # gauge fixing: keep the first `num_fixed_poses` poses constant
    num_fixed_poses: int = struct.field(pytree_node=False, default=1)
    # Huber threshold on the weighted residual norm (robustifies against
    # a false loop closure); inf = plain least squares
    huber_threshold: float = struct.field(pytree_node=False,
                                          default=jnp.inf)


@struct.dataclass
class PoseGraph:
    """K poses, E edges (fixed capacity, masked by edge_valid)."""
    T_world: jax.Array      # (K, 4, 4) absolute poses
    edge_i: jax.Array       # (E,) int32 source pose index
    edge_j: jax.Array       # (E,) int32 target pose index
    T_ij: jax.Array         # (E, 4, 4) measured T_i^-1 T_j
    w_rot: jax.Array        # (E,) rotation information weight
    w_trans: jax.Array      # (E,) translation information weight
    edge_valid: jax.Array   # (E,) bool


def _edge_residual(xi2, T_i, T_j, T_ij_inv, sqw):
    """Weighted 6-residual of one edge at local twists xi2 = (xi_i, xi_j).

    r = sqrt(W) * log( T_ij^-1 · (exp(xi_i) T_i)^-1 · exp(xi_j) T_j ).
    """
    Ti = se3_exp(xi2[:6]) @ T_i
    Tj = se3_exp(xi2[6:]) @ T_j
    return sqw * se3_log(T_ij_inv @ se3_inverse(Ti) @ Tj)


@highest_precision
def edge_residuals_and_jacobians(graph: PoseGraph):
    """(E, 6) weighted residuals + (E, 6, 12) Jacobians w.r.t. the two
    incident twists, evaluated at xi = 0 (batched jacfwd)."""
    T_ij_inv = se3_inverse(graph.T_ij)
    sqw = _edge_sqw(graph)
    T_i = graph.T_world[graph.edge_i]
    T_j = graph.T_world[graph.edge_j]
    zero = jnp.zeros((graph.edge_i.shape[0], 12), graph.T_world.dtype)
    r = jax.vmap(_edge_residual)(zero, T_i, T_j, T_ij_inv, sqw)
    J = jax.vmap(jax.jacfwd(_edge_residual))(zero, T_i, T_j, T_ij_inv, sqw)
    return r, J


def _edge_sqw(graph: PoseGraph):
    """(E, 6) per-component sqrt information weights, zero for invalid
    edges (the single source for residual weighting — the solver's
    accept test compares costs from _normal_equations and _cost_only,
    which must stay in lockstep)."""
    sqw = jnp.stack([graph.w_rot] * 3 + [graph.w_trans] * 3, axis=-1)
    return jnp.sqrt(jnp.where(graph.edge_valid[:, None], sqw, 0.0))


def _robust_weights_and_cost(r, graph: PoseGraph, cfg: PoseGraphConfig,
                             psum):
    """Huber IRLS weights on the weighted residual norm + total cost."""
    rn = jnp.linalg.norm(r, axis=1)
    w = jnp.where(rn > cfg.huber_threshold,
                  cfg.huber_threshold / jnp.maximum(rn, 1e-12), 1.0)
    w = jnp.where(graph.edge_valid, w, 0.0)
    return w, psum(jnp.sum(w * rn * rn))


@highest_precision
def _normal_equations(graph: PoseGraph, cfg: PoseGraphConfig,
                      axis_name=None):
    """Dense (6K, 6K) H, (6K,) g and the robust cost, assembled with one
    flat scatter-add over edges (psum-reduced when axis_name is set)."""
    K = graph.T_world.shape[0]
    psum = ((lambda x: jax.lax.psum(x, axis_name)) if axis_name
            else (lambda x: x))
    r, J = edge_residuals_and_jacobians(graph)
    w, cost = _robust_weights_and_cost(r, graph, cfg, psum)

    wJ = J * w[:, None, None]
    JtJ = jnp.einsum("eri,erj->eij", wJ, J)      # (E, 12, 12)
    Jtr = jnp.einsum("eri,er->ei", wJ, r)        # (E, 12)

    # flat scatter: block rows/cols of edge e are (6i..6i+5, 6j..6j+5)
    base = jnp.concatenate(
        [graph.edge_i[:, None] * 6 + jnp.arange(6)[None, :],
         graph.edge_j[:, None] * 6 + jnp.arange(6)[None, :]], axis=1)
    n6 = 6 * K
    flat_idx = base[:, :, None] * n6 + base[:, None, :]  # (E, 12, 12)
    H = psum(jnp.zeros((n6 * n6,), r.dtype)
             .at[flat_idx.reshape(-1)].add(JtJ.reshape(-1))
             .reshape(n6, n6))
    g = psum(jnp.zeros((n6,), r.dtype)
             .at[base.reshape(-1)].add(Jtr.reshape(-1)))
    return H, g, cost


@highest_precision
def _cost_only(graph: PoseGraph, cfg: PoseGraphConfig, axis_name=None):
    psum = ((lambda x: jax.lax.psum(x, axis_name)) if axis_name
            else (lambda x: x))
    T_i = graph.T_world[graph.edge_i]
    T_j = graph.T_world[graph.edge_j]
    r = _edge_sqw(graph) * se3_log(
        jnp.matmul(se3_inverse(graph.T_ij),
                   jnp.matmul(se3_inverse(T_i), T_j)))
    _, cost = _robust_weights_and_cost(r, graph, cfg, psum)
    return cost


@highest_precision
def _apply(graph: PoseGraph, dx, cfg: PoseGraphConfig):
    K = graph.T_world.shape[0]
    fixed = jnp.arange(K) < cfg.num_fixed_poses
    T_new = jnp.matmul(se3_exp(dx.reshape(K, 6)), graph.T_world)
    # the product of two near-exact rotations drifts only by rounding:
    # two Newton-Schulz iterations re-project without an SVD custom call
    R = orthonormalize_rotation_fast(T_new[:, :3, :3])
    T_new = T_new.at[:, :3, :3].set(R)
    T_new = jnp.where(fixed[:, None, None], graph.T_world, T_new)
    return graph.replace(T_world=T_new)


def optimize_pose_graph(graph: PoseGraph,
                        cfg: PoseGraphConfig = PoseGraphConfig(),
                        axis_name=None):
    """LM-damped Gauss-Newton over the pose graph. Returns
    (graph, cost history (iters,)).

    `axis_name`: when called inside shard_map with the EDGE axis sharded,
    the H/g/cost reductions psum over the mesh; poses stay replicated."""
    K = graph.T_world.shape[0]
    fixed_rows = jnp.repeat(jnp.arange(K) < cfg.num_fixed_poses, 6)

    dt = graph.T_world.dtype

    def step(carry, _):
        graph, lam = carry
        H, g, cost = _normal_equations(graph, cfg, axis_name)
        # LM damping + gauge prior on the fixed poses (eye/diag pinned to
        # the graph dtype — default-f64 constants under jax_enable_x64
        # would promote a float32 graph and break the scan carry)
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6 * K,
                                                              dtype=dt)
        H = jnp.where(fixed_rows[:, None] | fixed_rows[None, :],
                      jnp.zeros((), dt), H)
        H = H + jnp.diag(jnp.where(fixed_rows, 1.0, 0.0).astype(dt))
        g = jnp.where(fixed_rows, 0.0, g)
        dx = -jnp.linalg.solve(H, g)
        trial = _apply(graph, dx, cfg)
        new_cost = _cost_only(trial, cfg, axis_name)
        accept = new_cost < cost
        graph = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (1,) * a.ndim), b, a)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            graph, trial)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 5.0), 1e-12, 1e3)
        return (graph, lam), cost

    (graph, _), costs = jax.lax.scan(
        step, (graph, jnp.asarray(cfg.damping, graph.T_world.dtype)),
        None, length=cfg.max_iterations)
    # the scan emits the cost ENTERING each iteration; append the cost of
    # the returned graph so costs[-1] reflects the final accepted state
    # (history length = max_iterations + 1, costs[0] = initial)
    final = _cost_only(graph, cfg, axis_name)
    return graph, jnp.concatenate([costs, final[None]])


def odometry_graph(T_world: jax.Array, w_rot: float = 100.0,
                   w_trans: float = 100.0, extra_capacity: int = 0):
    """Build a chain pose graph from a trajectory: edge (k, k+1) measures
    the current relative pose. `extra_capacity` reserves masked edge
    slots for loop closures (fixed shapes under jit)."""
    K = T_world.shape[0]
    Ec = K - 1 + extra_capacity
    ei = jnp.concatenate([jnp.arange(K - 1, dtype=jnp.int32),
                          jnp.zeros(extra_capacity, jnp.int32)])
    ej = jnp.concatenate([jnp.arange(1, K, dtype=jnp.int32),
                          jnp.zeros(extra_capacity, jnp.int32)])
    T_ij = jnp.matmul(se3_inverse(T_world[ei]), T_world[ej])
    return PoseGraph(
        T_world=T_world,
        edge_i=ei, edge_j=ej, T_ij=T_ij,
        w_rot=jnp.full((Ec,), w_rot, T_world.dtype),
        w_trans=jnp.full((Ec,), w_trans, T_world.dtype),
        edge_valid=jnp.concatenate([jnp.ones(K - 1, bool),
                                    jnp.zeros(extra_capacity, bool)]))


def add_edge(graph: PoseGraph, slot: int, i: int, j: int, T_ij,
             w_rot: float, w_trans: float) -> PoseGraph:
    """Fill a reserved edge slot (in-place functional update)."""
    return graph.replace(
        edge_i=graph.edge_i.at[slot].set(i),
        edge_j=graph.edge_j.at[slot].set(j),
        T_ij=graph.T_ij.at[slot].set(jnp.asarray(T_ij,
                                                 graph.T_ij.dtype)),
        w_rot=graph.w_rot.at[slot].set(w_rot),
        w_trans=graph.w_trans.at[slot].set(w_trans),
        edge_valid=graph.edge_valid.at[slot].set(True))
