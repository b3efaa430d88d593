"""Device-mesh parallel kernels: the multi-chip path the reference never had
(SURVEY.md §2.3 — its concurrency is 4 ROS processes + a 4-pthread Hessian
build, MarginalizationFactor.cpp:151-174).

TPU-native design:

* **Correspondence/data parallelism** — scan feature points (the GN residual
  rows) are sharded over the mesh axis ``"q"``. Each device matches its query
  shard against the map and reduces its local (H, g) block; a ``psum`` over
  ICI yields the global normal equations on every device; the tiny dense
  solve is replicated. This is the distributed Gauss-Newton reduction: the
  communication volume per iteration is one 6×6 (or 15W×15W) matrix —
  independent of the number of points.
* **Map sharding** — the voxel map can additionally be sharded over ``"m"``;
  each device finds top-k among its map shard and the per-query candidate
  sets are merged with an ``all_gather`` of (Q_local, k) blocks (k·Q_local
  floats — tiny next to the O(Q·P) distance work it parallelizes).

Everything runs under ``shard_map`` over a ``jax.sharding.Mesh`` — on a real
pod slice the same program drives ICI collectives; tests run it on a virtual
8-device CPU mesh.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..factors.lidar import PlaneFactorBatch, huber_weight, plane_residual
from ..ops.fitting import solve3
from ..ops.knn import knn
from ..solver.gn import solve_normal
from ..utils.math import exp_so3, quat_mul, quat_normalize, quat_rotate


def make_mesh(n_devices: int | None = None, axis: str = "q") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devs, (axis,))


def _local_match_and_reduce(t, q, scan_q, scan_mask, map_pts, map_mask,
                            k: int, nn_gate: float, plane_tol: float,
                            min_weight: float, huber: float):
    """Per-device shard: match local queries, reduce local (H, g).

    Mirrors the single-chip round in models/odometry.py:_find_and_solve but
    returns the normal-equation block instead of solving.
    """
    pw = quat_rotate(q[None, :], scan_q) + t[None, :]
    d2, idx = knn(pw, map_pts, k=k, p_mask=map_mask)
    nbrs = map_pts[idx]
    nn_ok = d2[:, k - 1] < nn_gate
    AtA = jnp.einsum("qki,qkj->qij", nbrs, nbrs)
    Atb = -jnp.sum(nbrs, axis=-2)
    n_raw = solve3(AtA, Atb, damping=1e-9)
    norm = jnp.maximum(jnp.linalg.norm(n_raw, axis=-1, keepdims=True), 1e-12)
    normal = n_raw / norm
    d_off = 1.0 / norm[..., 0]
    pd_nbr = jnp.abs(jnp.einsum("qki,qi->qk", nbrs, normal) + d_off[:, None])
    plane_ok = jnp.all(pd_nbr <= plane_tol, axis=-1)
    pd = jnp.sum(normal * pw, axis=-1) + d_off
    pw_norm = jnp.sqrt(jnp.maximum(jnp.linalg.norm(pw, axis=-1), 1e-9))
    weight = 1.0 - 0.9 * jnp.abs(pd) / pw_norm
    keep = scan_mask & nn_ok & plane_ok & (weight > min_weight)
    batch = PlaneFactorBatch(scan_q, normal, d_off, jnp.where(keep, weight, 0.0), keep)
    r, J = plane_residual(t, q, batch)
    w = huber_weight(r * r, huber)
    Jw = J * w[:, None]
    rw = r * w
    return Jw.T @ Jw, -(Jw.T @ rw), jnp.sum(keep.astype(jnp.int32)).astype(jnp.int32)


def sharded_scan_match_step(
    mesh: Mesh,
    t: jnp.ndarray,
    q: jnp.ndarray,
    scan_pts: jnp.ndarray,  # (Q,3) — Q divisible by mesh size, sharded on "q"
    scan_mask: jnp.ndarray,
    map_pts: jnp.ndarray,  # (P,3) replicated
    map_mask: jnp.ndarray,
    n_iters: int = 4,
    k: int = 5,
    nn_gate: float = 1.0,
    plane_tol: float = 0.06,
    min_weight: float = 0.4,
    huber: float = 0.1,
    damping: float = 1e-8,
):
    """One distributed scan-to-map GN update: queries sharded over the mesh,
    (H, g) psum-reduced over ICI, replicated 6-dof solve + retraction.

    Returns (t, q, n_corr_total). The same program runs on a CPU test mesh
    and a TPU pod slice.
    """
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
    )
    def step(t, q, scan_q, scan_mask, map_pts, map_mask):
        def body(_, carry):
            t, q, _ = carry
            H, b, n = _local_match_and_reduce(
                t, q, scan_q, scan_mask, map_pts, map_mask,
                k, nn_gate, plane_tol, min_weight, huber,
            )
            H = jax.lax.psum(H, axis)
            b = jax.lax.psum(b, axis)
            n = jax.lax.psum(n, axis)
            delta = solve_normal(H, b, damping)
            t = t + delta[:3]
            q = quat_normalize(quat_mul(q, exp_so3(delta[3:6])))
            return t, q, n

        return jax.lax.fori_loop(
            0, n_iters, body, (t, q, jnp.zeros((), jnp.int32)))

    return jax.jit(step)(t, q, scan_pts, scan_mask, map_pts, map_mask)


def make_sharded_odometry(mesh: Mesh, cfg, axis: str | None = None):
    """PRODUCTION query-sharded frontend odometry over the mesh — the mesh
    twin of ``models/odometry.py:odometry_step_split``, wired by
    ``LiliOmSystem(mesh=…)``:

    * prepare/finalize phases run replicated (table slice + 8k scan
      downsample + keyframe logic — tiny);
    * each matching round shards the QUERY axis: every device kNN-searches
      its scan shard against the replicated local map (the O(Q·P) distance
      work scales 1/n), fits/gates its correspondences with the exact
      production code (``plane_correspondences`` — same centered fit, same
      reference gates, same trust-region clamps and step-norm early exit),
      and the 6-dof normal equations psum over ICI (one 6×6 + 6-vector per
      GN iteration, independent of the point count).

    Returns ``step(state, surf_pts, surf_mask, n_rounds)`` with
    ``odometry_step``'s result contract (matches single-chip to collective
    reduction-order noise).
    """
    from ..models.odometry import (_odo_finalize, _odo_prepare,
                                   clamp_step, plane_correspondences)

    axis = axis or mesh.axis_names[0]
    n = mesh.devices.size
    assert cfg.query_cap % n == 0, "query_cap must divide the mesh"

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)  # replicated outputs via psum
    def matching_round(t, q, scan_q, scan_mask, map_pts, map_mask):
        pw = quat_rotate(q[None, :], scan_q) + t[None, :]
        d2, idx = knn(pw, map_pts, k=cfg.k, p_mask=map_mask)
        batch = plane_correspondences(scan_q, scan_mask, pw, map_pts[idx],
                                      d2, cfg)

        def gn_step(t, q):
            r, J = plane_residual(t, q, batch)
            w = huber_weight(r * r, cfg.huber)
            Jw = J * w[:, None]
            H = jax.lax.psum(Jw.T @ Jw, axis)
            g = jax.lax.psum(Jw.T @ (r * w), axis)
            delta = clamp_step(solve_normal(H, -g, 1e-8), cfg)
            t = t + delta[:3]
            q = quat_normalize(quat_mul(q, exp_so3(delta[3:6])))
            return t, q, jnp.linalg.norm(delta)

        if cfg.gn_tol > 0.0:
            def cond(c):
                return (c[0] < cfg.gn_iters) & (c[1] > cfg.gn_tol)

            def body(c):
                t, q, step = gn_step(c[2], c[3])
                return (c[0] + 1, step, t, q)

            c = jax.lax.while_loop(
                cond, body,
                (jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, t.dtype), t, q))
            t, q = c[2], c[3]
        else:
            def fbody(_, carry):
                t, q, _s = gn_step(*carry[:2])
                return (t, q)

            t, q = jax.lax.fori_loop(0, cfg.gn_iters, fbody, (t, q))
        n_corr = jax.lax.psum(jnp.sum(batch.mask.astype(jnp.int32)), axis)
        return t, q, n_corr.astype(jnp.int32)

    round_jit = jax.jit(matching_round)

    def step(state, surf_pts, surf_mask, n_rounds: int | None = None):
        if n_rounds is None:
            n_rounds = cfg.scan_match_cnt
        t, q, scan_q, scan_q_mask, map_pts, map_mask = _odo_prepare(
            state, surf_pts, surf_mask, cfg)
        t_guess, q_guess = t, q
        n_corr = jnp.zeros((), jnp.int32)
        for _ in range(n_rounds):
            t, q, n_corr = round_jit(t, q, scan_q, scan_q_mask,
                                     map_pts, map_mask)
        return _odo_finalize(state, scan_q, scan_q_mask, surf_pts, surf_mask,
                             t_guess, q_guess, t, q, n_corr, cfg)

    return step


def sharded_knn(mesh: Mesh, queries: jnp.ndarray, map_pts: jnp.ndarray,
                map_mask: jnp.ndarray, k: int = 5):
    """Map-sharded exact kNN: each device searches its map shard, the
    per-shard (Q, k) candidates are all-gathered (k·Q floats — tiny next to
    the O(Q·P) distance work it parallelizes) and merged to the global
    top-k. Returns replicated (dists² (Q,k), global idx (Q,k)).

    This is the memory-scaling axis: the voxel map can exceed a single
    chip's HBM; shards live where they're searched.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    P_total = map_pts.shape[0]
    assert P_total % n_dev == 0, "map size must divide the mesh"
    shard = P_total // n_dev

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(axis), P(axis)), out_specs=(P(), P()),
             check_vma=False)  # outputs replicated by construction (all_gather+top_k)
    def run(q, pts_shard, mask_shard):
        d_loc, i_loc = knn(q, pts_shard, k=k, p_mask=mask_shard)
        i_glob = i_loc + jax.lax.axis_index(axis) * shard
        d_all = jax.lax.all_gather(d_loc, axis, axis=1, tiled=True)  # (Q, n·k)
        i_all = jax.lax.all_gather(i_glob, axis, axis=1, tiled=True)
        neg, arg = jax.lax.top_k(-d_all, k)
        return -neg, jnp.take_along_axis(i_all, arg, axis=1)

    return jax.jit(run)(queries, map_pts, map_mask)


def sharded_hessian_reduce(mesh: Mesh, J: jnp.ndarray, r: jnp.ndarray):
    """Distributed (H, g) = (ΣJᵀJ, ΣJᵀr) with rows sharded over the mesh —
    the TPU-native replacement for the reference's 4-pthread Hessian fan-in
    (MarginalizationFactor.cpp:151-174). Rows must be pre-zeroed when
    invalid."""
    axis = mesh.axis_names[0]

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=(P(), P()))
    def red(J, r):
        return jax.lax.psum(J.T @ J, axis), jax.lax.psum(J.T @ r, axis)

    return jax.jit(red)(J, r)
