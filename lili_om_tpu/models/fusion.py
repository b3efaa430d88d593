"""Backend sliding-window LiDAR-inertial fusion — the TPU-native re-design of
``LiLi-OM/src/BackendFusion.cpp`` (the core estimator).

One jitted program per keyframe replaces the ROS node's ``run()`` path
(BackendFusion.cpp:2725-2749):

* IMU batch propagation + preintegration for the new interval
  (processIMU :801-827, saveKeyFramesAndFactors :1700-1771) with the
  reference's accel clamping (±15/±18 m/s², :1717-1723);
* local feature map from the ``local_map_width`` most recent keyframes,
  transformed by their current best poses and voxel-downsampled
  (buildLocalMapWithLandMark :1387-1484, downSampleCloud :1486-1528);
* batched correspondence search for every window keyframe at once:
  exact 5-NN (MXU-tiled) → line fits with the λ₂>3λ₁ gate and ±0.1·dir
  virtual points (findCorrespondingCornerFeatures :1531-1599), and
  reflectivity-weighted plane fits with the ``sum_w``/``reflect_thres``
  gates (findCorrespondingSurfFeatures :1601-1681);
* the sliding-window MAP problem (optimizeSlidingWindowWithLandMark
  :830-1287): marginalization prior + (optional) speed-bias priors + IMU
  factors + lidar factors with Cauchy-1.0 IRLS, solved by Gauss-Newton on
  the 15·W-dim tangent via one dense Cholesky per iteration;
* guarded write-back (update-rejection gates :1215-1283);
* Schur-complement marginalization of the exiting keyframe into the new
  linear prior (:1009-1184 + MarginalizationFactor.cpp) as one XLA program.

Everything is fixed-shape; the keyframe history is a ring buffer; the
"problem assembly" is matmuls, not a factor registry.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors.imu import imu_factor_analytic, retract_state
from ..factors.lidar import (
    EdgeFactorBatch,
    PlaneFactorBatch,
    body_points,
    cauchy_weight,
    edge_residual,
    plane_residual,
)
from ..factors.prior import MarginalPrior, marginal_prior_residual, speed_bias_prior
from ..ops.fitting import eig3_symmetric, fit_line, fit_plane
from ..ops.knn import knn_auto, knn_pair_auto
from ..ops.marginalization import schur_marginalize
from ..ops.preintegration import (
    ImuNoise,
    Preint,
    init_preint,
    integrate_parallel,
    propagate_world_parallel,
    sqrt_info,
)
from ..ops.voxel import merge_voxel_entries, voxel_downsample
from ..solver.gn import solve_normal, solve_normal_lm
from ..utils.math import quat_conj, quat_mul, quat_normalize, quat_rotate, unify_quaternion


class FusionConfig(NamedTuple):
    """Static backend knobs. Defaults = Livox FR_IOSB
    (LiLi-OM/config/config_fr_iosb.yaml)."""

    window: int = 3  # slide_window_width
    local_map_width: int = 40
    # extra PHYSICAL ring slots beyond local_map_width — permanently
    # invalid padding so the slot axis divides a device mesh
    # (LiliOmSystem(mesh=…) sets this to ceil(M/n)·n − M; the ring-cursor
    # arithmetic stays modulo local_map_width, so the logical map width —
    # and reference parity — is unchanged)
    map_slots_pad: int = 0
    kf_surf_cap: int = 2048  # stored surf points per keyframe (post 0.4-voxel)
    kf_edge_cap: int = 1024  # stored edge points per keyframe
    map_surf_cap: int = 32768
    map_edge_cap: int = 8192
    surf_leaf: float = 0.4  # surf_ds
    edge_leaf: float = 0.2  # edge_ds
    imu_cap: int = 256  # max IMU samples per keyframe interval
    k: int = 5
    kd_max_radius: float = 1.0  # surf 5th-NN gate (config)
    edge_nn_gate: float = 1.0  # corner 5th-NN gate (hardcoded :1543)
    surf_dist_thres: float = 0.12
    reflect_thres: float = 15.0
    lidar_const: float = 20.0
    cauchy_c: float = 1.0
    # GN iteration cap — 15 like the backend_fusion max_num_iter in BOTH
    # fr_iosb yamls (Livox yaml:15, ROT yaml:22; the 12 sometimes quoted
    # is the ROT *lidar_odometry* budget → OdometryConfig.gn_iters). With
    # the gn_tol early exit below, converged windows stop far earlier, so
    # the cap only binds on bootstrap/aggressive-motion windows.
    max_num_iter: int = 15
    # step-norm early exit: stop the GN iterations once ‖Δ‖ drops below
    # this (tangent units — m / rad / m/s). Ceres terminates on its own
    # parameter/function tolerances well before max_num_iter on converged
    # windows (defaults 1e-8/1e-6), so a fixed-iteration loop does MORE
    # work than the reference; the traced while_loop recovers the
    # reference's adaptive cost. 0 = fixed fori_loop (bit-exact round-2
    # behavior).
    gn_tol: float = 1e-4
    use_reflectivity: bool = True  # Livox variant; False → ROT plain fit
    weight_gate: float = 0.2  # surf weight keep gate (0.3 in ROT :1464-1521)
    # speed-bias prior component weights: uniform 15 Livox
    # (PriorFactor.h:13-25); (8,8,1,…) ROT (LiLi-OM-ROT PriorFactor.h)
    sb_weights: tuple = (15.0,) * 9
    damping: float = 1e-6
    # Adaptive Levenberg-Marquardt damping for the window GN loop — the
    # reference solves this problem with Ceres, whose DEFAULT trust-region
    # strategy is LM (BackendFusion.cpp:984-992 uses stock Solver::Options),
    # so fixed-λ GN was the deviation here, not the parity choice. Measured
    # motivation: on bootstrap/violent-motion windows the fixed-λ steps
    # GROW ~1.5× per iteration (oscillating overshoot) until the write-back
    # gates discard the result; Marquardt scaling (λ·diag H, grown on step
    # growth, decayed on contraction) turns those frames into converging
    # solves. 0 = fixed damping (round-3 behavior).
    lm_lam0: float = 1e-4  # initial relative λ (Ceres: 1e-4)
    lm_up: float = 10.0  # λ multiplier when the step norm grows
    lm_down: float = 0.5  # λ decay on contraction
    lm_max: float = 1e2
    # "centered": covariance plane fit (f32-stable); "ref": the reference's
    # origin-dependent weighted A·n=−1 form (see models/odometry.py note)
    plane_fit: str = "centered"
    # incremental local-map build: keyframes that have EXITED the active
    # window have frozen poses (only a loop closure moves them — that
    # triggers a host-flagged rebuild), so their world-frame voxel
    # aggregates persist in a (cell, sums, count) table; per keyframe the
    # match map merges [table + the W previous-window keyframes] and the
    # table updates [+newly-matured − ring-evicted] — ONE ~45k-entry sort
    # instead of re-transforming and re-sorting the full 102k+51k ring
    # union (buildLocalMapWithLandMark semantics preserved,
    # BackendFusion.cpp:1387-1528). Forced off under the map-sharded mesh
    # path (parallel/map_fusion.py shards the ring, not the table).
    incremental_map: bool = True
    # lidar→body extrinsic (config ql2b/tl2b); identity by default
    q_lb: tuple = (1.0, 0.0, 0.0, 0.0)
    t_lb: tuple = (0.0, 0.0, 0.0)


class FusionState(NamedTuple):
    # --- sliding window (W, ·) ---
    t: jnp.ndarray
    q: jnp.ndarray
    v: jnp.ndarray
    ba: jnp.ndarray
    bg: jnp.ndarray
    preints: Preint  # stacked (W-1) intervals between consecutive window kfs
    prior: MarginalPrior  # over window[0..W-2]
    sb_anchor_on: jnp.ndarray  # () bool — ``!marg``: add speed-bias priors once
    # --- keyframe history ring buffer (M = local_map_width slots) ---
    hist_surf: jnp.ndarray  # (M, Sc, 3) sensor frame
    hist_surf_mask: jnp.ndarray  # (M, Sc)
    hist_surf_refl: jnp.ndarray  # (M, Sc) curvature channel (0.1·reflectivity)
    hist_edge: jnp.ndarray  # (M, Ec, 3)
    hist_edge_mask: jnp.ndarray  # (M, Ec)
    hist_t: jnp.ndarray  # (M, 3) latest pose estimates
    hist_q: jnp.ndarray  # (M, 4)
    hist_valid: jnp.ndarray  # (M,)
    write_idx: jnp.ndarray  # () int32
    kf_count: jnp.ndarray  # () int32
    # --- mature-keyframe map tables (see FusionConfig.incremental_map;
    # shape (1,·) placeholders when disabled) ---
    msurf_cells: jnp.ndarray  # (Ts,3) int32 absolute voxel cells
    msurf_sums: jnp.ndarray  # (Ts,4) [x,y,z,refl] sums
    msurf_cnt: jnp.ndarray  # (Ts,)
    msurf_valid: jnp.ndarray  # (Ts,)
    medge_cells: jnp.ndarray  # (Te,3)
    medge_sums: jnp.ndarray  # (Te,3)
    medge_cnt: jnp.ndarray  # (Te,)
    medge_valid: jnp.ndarray  # (Te,)
    # --- IMU chaining ---
    acc0: jnp.ndarray  # (3,) last consumed sample
    gyr0: jnp.ndarray  # (3,)


class FusionOut(NamedTuple):
    t_latest: jnp.ndarray  # (3,) newest keyframe pose (post-opt)
    q_latest: jnp.ndarray
    t_mature: jnp.ndarray  # (3,) oldest window keyframe pose — /odom_mapped
    q_mature: jnp.ndarray  # (publishOdometry :2313-2387)
    v_latest: jnp.ndarray
    ba_latest: jnp.ndarray
    bg_latest: jnp.ndarray
    n_surf_corr: jnp.ndarray  # () int32 total surf correspondences
    n_edge_corr: jnp.ndarray


def init_fusion_state(cfg: FusionConfig, noise: ImuNoise,
                      t0=None, q0=None, v0=None, dtype=jnp.float32) -> FusionState:
    """Fresh state; ``q0`` seeds the first orientation (the reference reads it
    from the IMU's orientation quaternion, imuHandler :624-665)."""
    W, M = cfg.window, cfg.local_map_width + cfg.map_slots_pad
    Sc, Ec = cfg.kf_surf_cap, cfg.kf_edge_cap
    qid = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    t0 = jnp.zeros(3, dtype) if t0 is None else jnp.asarray(t0, dtype)
    q0 = qid if q0 is None else jnp.asarray(q0, dtype)
    v0 = jnp.zeros(3, dtype) if v0 is None else jnp.asarray(v0, dtype)
    pre0 = init_preint(jnp.zeros(3, dtype), jnp.zeros(3, dtype), noise, dtype=dtype)
    preints = jax.tree.map(lambda a: jnp.broadcast_to(a, (W - 1,) + a.shape), pre0)
    D = 15 * (W - 1)
    prior = MarginalPrior(
        J=jnp.zeros((D, D), dtype), r0=jnp.zeros((D,), dtype),
        t0=jnp.zeros((W - 1, 3), dtype), q0=jnp.tile(qid, (W - 1, 1)),
        v0=jnp.zeros((W - 1, 3), dtype), ba0=jnp.zeros((W - 1, 3), dtype),
        bg0=jnp.zeros((W - 1, 3), dtype), valid=jnp.zeros((), bool),
    )
    Ts, Te = _table_caps(cfg)
    return FusionState(
        t=jnp.tile(t0, (W, 1)), q=jnp.tile(q0, (W, 1)), v=jnp.tile(v0, (W, 1)),
        ba=jnp.zeros((W, 3), dtype), bg=jnp.zeros((W, 3), dtype),
        preints=preints, prior=prior, sb_anchor_on=jnp.zeros((), bool),
        hist_surf=jnp.zeros((M, Sc, 3), dtype), hist_surf_mask=jnp.zeros((M, Sc), bool),
        hist_surf_refl=jnp.zeros((M, Sc), dtype),
        hist_edge=jnp.zeros((M, Ec, 3), dtype), hist_edge_mask=jnp.zeros((M, Ec), bool),
        hist_t=jnp.zeros((M, 3), dtype), hist_q=jnp.tile(qid, (M, 1)),
        hist_valid=jnp.zeros((M,), bool),
        write_idx=jnp.zeros((), jnp.int32), kf_count=jnp.zeros((), jnp.int32),
        msurf_cells=jnp.zeros((Ts, 3), jnp.int32),
        msurf_sums=jnp.zeros((Ts, 4), dtype),
        msurf_cnt=jnp.zeros((Ts,), dtype), msurf_valid=jnp.zeros((Ts,), bool),
        medge_cells=jnp.zeros((Te, 3), jnp.int32),
        medge_sums=jnp.zeros((Te, 3), dtype),
        medge_cnt=jnp.zeros((Te,), dtype), medge_valid=jnp.zeros((Te,), bool),
        acc0=jnp.zeros(3, dtype), gyr0=jnp.zeros(3, dtype),
    )


def _table_caps(cfg: FusionConfig):
    """(surf, edge) mature-table capacities — the match-map caps plus slack
    for hash-rank shifts (see OdometryConfig.map_table_cap note); (1, 1)
    placeholders when the incremental build is disabled."""
    if not cfg.incremental_map:
        return 1, 1
    return (cfg.map_surf_cap + 2 * cfg.kf_surf_cap,
            cfg.map_edge_cap + 2 * cfg.kf_edge_cap)


def clamp_accel(accs: jnp.ndarray) -> jnp.ndarray:
    """Reference accel clamping: ±15 m/s² on x/y, ±18 on z (:1717-1723)."""
    lo = jnp.array([-15.0, -15.0, -18.0], accs.dtype)
    hi = jnp.array([15.0, 15.0, 18.0], accs.dtype)
    return jnp.clip(accs, lo, hi)


# ---------------------------------------------------------------------------
# Correspondence search (batched over all window keyframes at once)
# ---------------------------------------------------------------------------


def _surf_correspondences(pts_b, pw, pts_mask, refl, map_pts, map_mask, map_refl,
                          cfg: FusionConfig):
    """Reflectivity-weighted plane correspondences (flattened over ALL window
    keyframes: one kNN launch instead of a vmapped per-keyframe search —
    the queries share the map, so stacking them is free parallelism).

    Mirrors findCorrespondingSurfFeatures (:1601-1681); all quirks kept:
    the weight normalization ``(1/Δc_j)/Σ|Δc_k|`` (:1625-1631), the
    world-origin-normed decay weight (:1655), the score
    ``lidar_const·(weight+exp(−sum_w))`` multiplying the weight-scaled
    normal (:1658-1676).

    ``pts_b``: (N,3) body-frame points; ``pw``: (N,3) the same points under
    the current per-keyframe world poses.
    """
    d2, idx = knn_auto(pw, map_pts, k=cfg.k, p_mask=map_mask)
    nbrs = map_pts[idx]
    return surf_fit_and_gate(pts_b, pw, pts_mask, refl, d2, nbrs,
                             map_refl[idx], cfg)


def surf_fit_and_gate(pts_b, pw, pts_mask, refl, d2, nbrs, nbr_refl,
                      cfg: FusionConfig) -> PlaneFactorBatch:
    """Plane fit + gates given precomputed k-NN candidates — shared by the
    single-chip search above and the map-sharded path (which merges
    candidates across the mesh first, parallel/map_fusion.py).

    ``d2`` (Q,k) ascending squared distances; ``nbrs`` (Q,k,3) neighbor
    coordinates; ``nbr_refl`` (Q,k) their curvature channel."""
    nn_ok = d2[:, cfg.k - 1] < cfg.kd_max_radius

    if cfg.use_reflectivity:
        dcurv = jnp.abs(refl[:, None] - nbr_refl)  # (Q,k)
        dcurv = jnp.maximum(dcurv, 1e-6)
        sum_w = jnp.sum(dcurv, axis=-1)
        vec_w = (1.0 / dcurv) / sum_w[:, None]
        refl_ok = sum_w <= cfg.reflect_thres
    else:
        sum_w = jnp.zeros(pts_b.shape[0], pts_b.dtype)
        vec_w = jnp.ones(d2.shape, pts_b.dtype)
        refl_ok = jnp.ones(pts_b.shape[0], bool)

    if cfg.plane_fit == "centered":
        # reflectivity-weighted centroid + covariance (weights w², matching
        # the weighted-LS row scaling of the reference's form)
        w2 = vec_w * vec_w
        wsum = jnp.maximum(jnp.sum(w2, axis=-1, keepdims=True), 1e-12)
        ctr = jnp.einsum("qk,qki->qi", w2, nbrs) / wsum
        dd = nbrs - ctr[:, None, :]
        cov = jnp.einsum("qk,qki,qkj->qij", w2, dd, dd)
        _, evecs = eig3_symmetric(cov)
        normal = evecs[..., :, 0]
        d_off = -jnp.sum(normal * ctr, axis=-1)
    else:
        # the reference's weighted A·n=−1 form (rows scaled by w → normal
        # equations carry w²), via the shared fit library
        fp = fit_plane(nbrs, jnp.ones(nbrs.shape[:-1], bool),
                       dist_thres=cfg.surf_dist_thres, weights=vec_w * vec_w)
        normal, d_off = fp.normal, fp.d
    pd_nbr = jnp.abs(jnp.einsum("qki,qi->qk", nbrs, normal) + d_off[:, None])
    plane_ok = jnp.all(pd_nbr <= cfg.surf_dist_thres, axis=-1)

    pd = jnp.sum(normal * pw, axis=-1) + d_off
    pw_norm = jnp.sqrt(jnp.maximum(jnp.linalg.norm(pw, axis=-1), 1e-9))
    weight = 1.0 - 0.9 * jnp.abs(pd) / pw_norm
    keep = pts_mask & nn_ok & refl_ok & plane_ok & (weight > cfg.weight_gate)
    if cfg.use_reflectivity:
        score = cfg.lidar_const * (weight + jnp.exp(-sum_w)) * weight
    else:
        score = cfg.lidar_const * weight  # ROT: plain (BackendFusion ROT:1464-1521)
    return PlaneFactorBatch(
        pts=pts_b, normals=normal, offsets=d_off,
        scores=jnp.where(keep, score, 0.0), mask=keep,
    )


def _edge_correspondences(pts_b, pw, pts_mask, map_pts, map_mask, cfg: FusionConfig):
    """Line correspondences (findCorrespondingCornerFeatures :1531-1599):
    5-NN, covariance eigendecomposition, λ₂>3·λ₁ gate, virtual points at
    centroid ± 0.1·direction; factor weight = lidar_const. Flattened over
    the window like the surf search."""
    d2, idx = knn_auto(pw, map_pts, k=cfg.k, p_mask=map_mask)
    return edge_fit_and_gate(pts_b, pts_mask, d2, map_pts[idx], cfg)


def edge_fit_and_gate(pts_b, pts_mask, d2, nbrs, cfg: FusionConfig) -> EdgeFactorBatch:
    """Line fit + gates given precomputed k-NN candidates (see
    :func:`surf_fit_and_gate`). Fit + λ₂>3λ₁ gate via the shared
    :func:`ops.fitting.fit_line` (gate ratio is scale-invariant)."""
    nn_ok = d2[:, cfg.k - 1] < cfg.edge_nn_gate
    fl = fit_line(nbrs, jnp.ones(nbrs.shape[:-1], bool), ratio_thres=3.0)
    keep = pts_mask & nn_ok & fl.valid
    return EdgeFactorBatch(
        pts=pts_b,
        point_a=fl.centroid + 0.1 * fl.direction,
        point_b=fl.centroid - 0.1 * fl.direction,
        scores=jnp.where(keep, cfg.lidar_const, 0.0),
        mask=keep,
    )



def _edge_query_world(ts, qs, win_edge_b, cfg: FusionConfig):
    """World-frame EDGE query positions for the corner search. The
    reference searches corners with the extrinsic-COMPOSED pose
    (Q2 = Q·q_lb⁻¹, T2 = T − Q2·t_lb, BackendFusion.cpp:929-936 feeds
    findCorrespondingCornerFeatures with the same pose as the surf
    search), i.e. queries live in the BODY frame like the edge map built
    here — only the FACTOR ignores the stored extrinsic
    (LidarKeyframeFactor.h:37-43, the cited quirk, still preserved: the
    factor consumes the raw sensor points). Searching with raw sensor
    points displaced every edge query from its map position by the
    extrinsic — fatal under the ROT 90°-about-x mount."""
    dtype = win_edge_b.dtype
    t_lb = jnp.asarray(cfg.t_lb, dtype)
    q_lb = jnp.asarray(cfg.q_lb, dtype)
    eb = jax.vmap(lambda p: body_points(p, t_lb, q_lb))(win_edge_b)
    return quat_rotate(qs[:, None, :], eb) + ts[:, None, :]


def _incremental_maps(state: FusionState, cfg: FusionConfig, rebuild: bool):
    """Match maps + updated mature tables from ONE merge per feature kind
    (see FusionConfig.incremental_map). Runs on the PRE-insert state.

    * match map = mature table ∪ the W previous-window keyframes at their
      current ring poses — exactly the batch pre-insert union
      (buildLocalMapWithLandMark :1387-1484);
    * table' = table + slot (wi−W) (newly matured, pose frozen at the last
      write-back) − the old content of slot wi (evicted by this insert);
    * ``rebuild`` (static): recompute the table from the full ring instead
      (loop closures rewrite mature poses — the host flags the next step).
    """
    M, W = cfg.local_map_width, cfg.window
    Sc, Ec = cfg.kf_surf_cap, cfg.kf_edge_cap
    dtype = state.t.dtype
    wi = state.write_idx
    Ts, Te = _table_caps(cfg)
    prevwin = (wi - W + jnp.arange(W)) % M  # last W inserted slots, oldest first

    def world(slots, clouds):
        return (quat_rotate(state.hist_q[slots][:, None, :], clouds[slots])
                + state.hist_t[slots][:, None, :])

    def build(clouds, masks, refl, table, leaf, Tcap, map_cap):
        # SENSOR-frame ring clouds → body before the pose (the reference's
        # pose ∘ (q_bl, t_bl) map transform — see the _build_maps note)
        clouds = jax.vmap(lambda p: body_points(
            p, jnp.asarray(cfg.t_lb, dtype), jnp.asarray(cfg.q_lb, dtype)))(
                clouds)
        Mp = clouds.shape[0]  # physical slots (M + map_slots_pad)
        if rebuild:
            pts = (quat_rotate(state.hist_q[:, None, :], clouds)
                   + state.hist_t[:, None, :]).reshape(Mp * clouds.shape[1], 3)
            msk = (masks & state.hist_valid[:, None]).reshape(-1)
            # the rebuilt table is the NEXT step's mature set: everything
            # except the post-insert window slots {wi−W+1..wi} (slot wi's
            # pre-insert content is evicted by this step's insert)
            nextwin = (prevwin + 1) % M
            in_next = jnp.any(jnp.arange(Mp)[:, None] == nextwin[None, :], axis=1)
            sel_table = jnp.broadcast_to((~in_next)[:, None],
                                         masks.shape).reshape(-1)
            sums = pts if refl is None else jnp.concatenate(
                [pts, refl.reshape(-1, 1)], axis=1)
            sums = sums * msk[:, None].astype(dtype)
            cells = jnp.floor(pts / leaf).astype(jnp.int32)
            cnt = msk.astype(dtype)
            (mc, ms, mn, mv), (tc, tsum, tn, tv) = merge_voxel_entries(
                cells, sums, cnt, msk, Tcap, second_sel=sel_table)
        else:
            K = W * clouds.shape[1]
            live = world(prevwin, clouds).reshape(K, 3)
            live_mask = (masks[prevwin]
                         & state.hist_valid[prevwin, None]).reshape(-1)
            ev = world(wi[None], clouds).reshape(clouds.shape[1], 3)
            ev_mask = masks[wi] & state.hist_valid[wi]
            if refl is None:
                live_sums, ev_sums = live, ev
                tbl_sums = table[1]
            else:
                live_sums = jnp.concatenate(
                    [live, refl[prevwin].reshape(-1, 1)], axis=1)
                ev_sums = jnp.concatenate(
                    [ev, refl[wi].reshape(-1, 1)], axis=1)
                tbl_sums = table[1]
            cells = jnp.concatenate([
                table[0],
                jnp.floor(live / leaf).astype(jnp.int32),
                jnp.floor(ev / leaf).astype(jnp.int32)])
            sums = jnp.concatenate([
                tbl_sums,
                live_sums * live_mask[:, None].astype(dtype),
                -(ev_sums * ev_mask[:, None].astype(dtype))])
            cnt = jnp.concatenate([table[2], live_mask.astype(dtype),
                                   -ev_mask.astype(dtype)])
            valid = jnp.concatenate([table[3], live_mask, ev_mask])
            # match = table + live; table' = table + slot(wi−W) − evicted
            S1 = clouds.shape[1]
            live_rows = jnp.arange(K) < S1  # prevwin[0] = the maturing slot
            sel_match = jnp.concatenate([
                jnp.ones((Tcap,), bool), jnp.ones((K,), bool),
                jnp.zeros((S1,), bool)])
            sel_table = jnp.concatenate([
                jnp.ones((Tcap,), bool), live_rows, jnp.ones((S1,), bool)])
            (mc, ms, mn, mv), (tc, tsum, tn, tv) = merge_voxel_entries(
                cells, sums, cnt, valid, Tcap,
                primary_sel=sel_match, second_sel=sel_table)
        den = jnp.maximum(mn, 1.0)[:, None]
        map_pts = (ms[:, :3] / den)[:map_cap].astype(dtype)
        map_mask = mv[:map_cap]
        map_refl = ((ms[:, 3] / den[:, 0])[:map_cap].astype(dtype)
                    if refl is not None else None)
        return map_pts, map_refl, map_mask, (tc, tsum.astype(dtype),
                                             tn.astype(dtype), tv)

    map_surf, map_refl, map_surf_mask, surf_table = build(
        state.hist_surf, state.hist_surf_mask, state.hist_surf_refl,
        (state.msurf_cells, state.msurf_sums, state.msurf_cnt,
         state.msurf_valid), cfg.surf_leaf, Ts, cfg.map_surf_cap)
    map_edge, _, map_edge_mask, edge_table = build(
        state.hist_edge, state.hist_edge_mask, None,
        (state.medge_cells, state.medge_sums, state.medge_cnt,
         state.medge_valid), cfg.edge_leaf, Te, cfg.map_edge_cap)
    enough_map = (jnp.sum(map_surf_mask.astype(jnp.int32)) > 50) & (
        jnp.sum(map_edge_mask.astype(jnp.int32)) > 0)  # (:936)
    return (map_surf, map_refl, map_surf_mask, map_edge, map_edge_mask,
            enough_map, surf_table, edge_table)


def _build_maps(state: FusionState, cfg: FusionConfig):
    """Local feature maps from the keyframe ring buffer
    (buildLocalMapWithLandMark :1387-1484, downSampleCloud :1486-1528)."""
    M = state.hist_surf.shape[0]  # physical slots (M + map_slots_pad)
    dtype = state.t.dtype
    # ring clouds are SENSOR-frame; the reference's map transform composes
    # pose ∘ (q_bl, t_bl) — the lidar→body conversion — for BOTH feature
    # kinds (transformCloud(·, q_po·q_bl, q_po·t_bl + t_po),
    # BackendFusion.cpp:1423-1426 / ROT :1308-1309). Dropping it leaves the
    # map off from the (extrinsic-converted) surf queries by the extrinsic
    # — catastrophic for non-commuting mounts (measured: 97 m backend ATE
    # at the ROT 90°-about-x extrinsic under fast yaw).
    hist_b = jax.vmap(lambda p: body_points(
        p, jnp.asarray(cfg.t_lb, dtype), jnp.asarray(cfg.q_lb, dtype)))(
            state.hist_surf)
    hist_world = quat_rotate(state.hist_q[:, None, :], hist_b) + state.hist_t[:, None, :]
    hmask = state.hist_surf_mask & state.hist_valid[:, None]
    map_surf, map_refl, map_surf_mask = voxel_downsample(
        hist_world.reshape(M * cfg.kf_surf_cap, 3),
        hmask.reshape(-1), cfg.surf_leaf, cfg.map_surf_cap,
        feats=state.hist_surf_refl.reshape(-1, 1),
    )
    map_refl = map_refl[:, 0]
    hist_edge_b = jax.vmap(lambda p: body_points(
        p, jnp.asarray(cfg.t_lb, dtype), jnp.asarray(cfg.q_lb, dtype)))(
            state.hist_edge)
    hist_edge_world = quat_rotate(state.hist_q[:, None, :], hist_edge_b) + state.hist_t[:, None, :]
    emask = state.hist_edge_mask & state.hist_valid[:, None]
    map_edge, map_edge_mask = voxel_downsample(
        hist_edge_world.reshape(M * cfg.kf_edge_cap, 3),
        emask.reshape(-1), cfg.edge_leaf, cfg.map_edge_cap,
    )
    enough_map = (jnp.sum(map_surf_mask.astype(jnp.int32)) > 50) & (
        jnp.sum(map_edge_mask.astype(jnp.int32)) > 0
    )  # (:936)
    return map_surf, map_refl, map_surf_mask, map_edge, map_edge_mask, enough_map


def default_map_and_match(state: FusionState, ts, qs,
                          win_surf_b, win_surf_mask, win_surf_refl,
                          win_edge_b, win_edge_mask, cfg: FusionConfig):
    """Phase C+E of the per-keyframe step: build the local feature maps from
    the ring buffer and run the flattened-window correspondence searches.

    Split out so the multi-chip path can inject a map-sharded variant
    (parallel/map_fusion.py) — the map is the big operand; sharding it over
    the mesh scales both its HBM footprint and the O(Q·P) kNN distance work.

    Returns (surf_batches, edge_batches, enough_map).
    """
    W = cfg.window
    map_surf, map_refl, map_surf_mask, map_edge, map_edge_mask, enough_map = \
        _build_maps(state, cfg)

    # flatten the window: (W,S,3) → (W·S,3); one kNN launch for all
    # window keyframes (they share the map)
    Sc, Ec = cfg.kf_surf_cap, cfg.kf_edge_cap
    pw_surf = (quat_rotate(qs[:, None, :], win_surf_b) + ts[:, None, :]).reshape(W * Sc, 3)
    sb_flat = _surf_correspondences(
        win_surf_b.reshape(W * Sc, 3), pw_surf,
        win_surf_mask.reshape(W * Sc), win_surf_refl.reshape(W * Sc),
        map_surf, map_surf_mask, map_refl, cfg)
    surf_batches = PlaneFactorBatch(*[a.reshape((W, Sc) + a.shape[1:])
                                      for a in sb_flat])
    pw_edge = _edge_query_world(ts, qs, win_edge_b, cfg).reshape(W * Ec, 3)
    eb_flat = _edge_correspondences(
        win_edge_b.reshape(W * Ec, 3), pw_edge,
        win_edge_mask.reshape(W * Ec), map_edge, map_edge_mask, cfg)
    edge_batches = EdgeFactorBatch(*[a.reshape((W, Ec) + a.shape[1:])
                                     for a in eb_flat])
    return surf_batches, edge_batches, enough_map


# ---------------------------------------------------------------------------
# Window problem assembly
# ---------------------------------------------------------------------------


def _assemble(ts, qs, vs, bas, bgs, preints, preint_Ws, prior, sb_on, sb_anchor,
              surf_batches, edge_batches, noise, cfg: FusionConfig,
              imu_first_only: bool = False):
    """Build (H, g) of the full-window GN system (D = 15·W) at the given
    states. g uses the +ΣJᵀr sign convention (as the reference's
    marginalization does, MarginalizationFactor.cpp:151-174).

    ``imu_first_only``: restrict the IMU factors to the 0→1 interval — the
    marginalization problem includes ONLY that IMU factor (the one touching
    the exiting keyframe, BackendFusion.cpp:1069-1082), while prior,
    speed-bias priors, and the lidar factors of *all* window frames are
    included (:1031-1066, :1087-1147, drop-set on frame-0 blocks only).
    Folding the other IMU factors in would double-count them when they are
    re-added to the next window solve."""
    W = cfg.window
    D = 15 * W
    dtype = ts.dtype
    H = jnp.zeros((D, D), dtype)
    g = jnp.zeros((D,), dtype)

    # marginalization prior over window[0..W-2]
    rp, Jp = marginal_prior_residual(prior, ts[:-1], qs[:-1], vs[:-1], bas[:-1], bgs[:-1])
    Dp = 15 * (W - 1)
    H = H.at[:Dp, :Dp].add(Jp.T @ Jp)
    g = g.at[:Dp].add(Jp.T @ rp)

    # speed-bias priors (post-loop re-anchoring, :892-904)
    v0a, ba0a, bg0a = sb_anchor
    on = sb_on.astype(dtype)
    sbw = jnp.asarray(cfg.sb_weights, dtype)
    for i in range(W - 1):
        rsb, Jsb = speed_bias_prior(vs[i], bas[i], bgs[i], v0a[i], ba0a[i], bg0a[i],
                                    weights=sbw)
        o = 15 * i + 6
        H = H.at[o:o + 9, o:o + 9].add(on * (Jsb.T @ Jsb))
        g = g.at[o:o + 9].add(on * (Jsb.T @ rsb))

    # IMU factors between consecutive keyframes (:906-917); only 0→1 when
    # assembling the marginalization problem (:1069-1082)
    for i in range(1 if imu_first_only else W - 1):
        pre_i = jax.tree.map(lambda a: a[i], preints)
        r, Ji, Jj = imu_factor_analytic(
            pre_i, noise,
            ts[i], qs[i], vs[i], bas[i], bgs[i],
            ts[i + 1], qs[i + 1], vs[i + 1], bas[i + 1], bgs[i + 1],
            W=preint_Ws[i],
        )
        oi, oj = 15 * i, 15 * (i + 1)
        H = H.at[oi:oi + 15, oi:oi + 15].add(Ji.T @ Ji)
        H = H.at[oj:oj + 15, oj:oj + 15].add(Jj.T @ Jj)
        H = H.at[oi:oi + 15, oj:oj + 15].add(Ji.T @ Jj)
        H = H.at[oj:oj + 15, oi:oi + 15].add(Jj.T @ Ji)
        g = g.at[oi:oi + 15].add(Ji.T @ r)
        g = g.at[oj:oj + 15].add(Jj.T @ r)

    # lidar factors per window keyframe, Cauchy-1.0 IRLS (:938-974)
    for j in range(W):
        o = 15 * j
        sb = jax.tree.map(lambda a: a[j], surf_batches)
        r, J = plane_residual(ts[j], qs[j], sb)
        w = cauchy_weight(r * r, cfg.cauchy_c)
        Jw = J * w[:, None]
        rw = r * w
        H = H.at[o:o + 6, o:o + 6].add(Jw.T @ Jw)
        g = g.at[o:o + 6].add(Jw.T @ rw)

        eb = jax.tree.map(lambda a: a[j], edge_batches)
        re, Je = edge_residual(ts[j], qs[j], eb)
        we = cauchy_weight(re * re, cfg.cauchy_c)
        Jew = Je * we[:, None]
        rew = re * we
        H = H.at[o:o + 6, o:o + 6].add(Jew.T @ Jew)
        g = g.at[o:o + 6].add(Jew.T @ rew)

    return H, g


def _retract_window(ts, qs, vs, bas, bgs, delta):
    """Apply the stacked 15·W tangent step to all window states."""
    W = ts.shape[0]
    d = delta.reshape(W, 15)
    out = jax.vmap(retract_state)(ts, qs, vs, bas, bgs, d)
    return out


# ---------------------------------------------------------------------------
# The per-keyframe step
# ---------------------------------------------------------------------------


class FusionMid(NamedTuple):
    """Device-resident intermediates between the ingest phase (A–E) and the
    solve phase (F–I) of the per-keyframe step — lets the split-dispatch
    variant run the kNN launches standalone between two jitted programs."""

    ts: jnp.ndarray  # (W,3) shifted window states, new keyframe appended
    qs: jnp.ndarray
    vs: jnp.ndarray
    bas: jnp.ndarray
    bgs: jnp.ndarray
    preints: Preint
    hist_surf: jnp.ndarray  # ring buffer post-insert
    hist_surf_mask: jnp.ndarray
    hist_surf_refl: jnp.ndarray
    hist_edge: jnp.ndarray
    hist_edge_mask: jnp.ndarray
    hist_valid: jnp.ndarray
    win_surf_b: jnp.ndarray  # (W,Sc,3) window clouds, extrinsic pre-applied
    win_surf_mask: jnp.ndarray
    win_surf_refl: jnp.ndarray
    win_edge_b: jnp.ndarray
    win_edge_mask: jnp.ndarray
    # incremental match maps + updated mature tables (placeholders when
    # cfg.incremental_map is off — the batch _build_maps path runs instead)
    map_surf: jnp.ndarray
    map_refl: jnp.ndarray
    map_surf_mask: jnp.ndarray
    map_edge: jnp.ndarray
    map_edge_mask: jnp.ndarray
    enough_map: jnp.ndarray
    surf_table: tuple  # (cells, sums, cnt, valid)
    edge_table: tuple
    acc0: jnp.ndarray
    gyr0: jnp.ndarray


def _ingest(state: FusionState, surf_pts, surf_mask, surf_refl,
            edge_pts, edge_mask, imu_dts, imu_accs, imu_gyrs, imu_valid,
            cfg: FusionConfig, noise: ImuNoise,
            rebuild: bool = False) -> FusionMid:
    """Phases A–E: IMU propagate/preintegrate, window shift, ring-buffer
    insert, window cloud gather + extrinsic pre-apply (+ the incremental
    match-map/table merge, which must see the PRE-insert ring)."""
    W, M = cfg.window, cfg.local_map_width
    dtype = state.t.dtype
    q_lb = jnp.asarray(cfg.q_lb, dtype)
    t_lb = jnp.asarray(cfg.t_lb, dtype)

    if cfg.incremental_map:
        (map_surf, map_refl, map_surf_mask, map_edge, map_edge_mask,
         enough_map, surf_table, edge_table) = _incremental_maps(
            state, cfg, rebuild)
    else:
        z1 = jnp.zeros((1,), dtype)
        map_surf = map_edge = jnp.zeros((1, 3), dtype)
        map_refl = z1
        map_surf_mask = map_edge_mask = jnp.zeros((1,), bool)
        enough_map = jnp.zeros((), bool)
        surf_table = (state.msurf_cells, state.msurf_sums, state.msurf_cnt,
                      state.msurf_valid)
        edge_table = (state.medge_cells, state.medge_sums, state.medge_cnt,
                      state.medge_valid)

    accs = clamp_accel(imu_accs)

    # --- A: IMU propagation from the newest window state (:801-827).
    # Log-depth parallel forms: the sequential scans cost imu_cap dependent
    # 15×15-matmul rounds of pure latency per keyframe; the associative-scan
    # forms run the same recursions in ⌈log₂ N⌉ batched rounds
    # (equivalence-tested vs the scans in tests/test_preintegration.py) ---
    t_new, q_new, v_new, acc0, gyr0 = propagate_world_parallel(
        state.t[-1], state.q[-1], state.v[-1], state.ba[-1], state.bg[-1],
        noise, state.acc0, state.gyr0, imu_dts, accs, imu_gyrs, imu_valid,
    )
    pre_new = integrate_parallel(
        noise, state.ba[-1], state.bg[-1], state.acc0, state.gyr0,
        imu_dts, accs, imu_gyrs, imu_valid)
    # first keyframe: no propagation (no previous interval)
    first = state.kf_count == 0
    t_new = jnp.where(first, state.t[-1], t_new)
    q_new = jnp.where(first, state.q[-1], q_new)
    v_new = jnp.where(first, state.v[-1], v_new)

    # --- B: shift window, append new keyframe state ---
    roll = lambda a: jnp.roll(a, -1, axis=0)
    ts = roll(state.t).at[-1].set(t_new)
    qs = roll(state.q).at[-1].set(q_new)
    vs = roll(state.v).at[-1].set(v_new)
    bas = roll(state.ba).at[-1].set(state.ba[-1])
    bgs = roll(state.bg).at[-1].set(state.bg[-1])
    preints = jax.tree.map(
        lambda a, n: jnp.roll(a, -1, axis=0).at[-1].set(n), state.preints, pre_new
    )

    # --- D: insert incoming keyframe into the ring buffer, voxel-downsampled
    # in the sensor frame (the reference stores surf_lasts_ds/edge_lasts_ds,
    # its 0.4/0.2-leaf per-keyframe clouds — downSampleCloud :1486-1528).
    # Input capacities may exceed the storage capacities; the downsample is
    # what makes the smaller fixed storage (and thus the kNN query cost)
    # sufficient.
    wi = state.write_idx
    sp_ds, refl_ds, sm_ds = voxel_downsample(
        surf_pts, surf_mask, cfg.surf_leaf, cfg.kf_surf_cap,
        feats=surf_refl[:, None])
    ep_ds, em_ds = voxel_downsample(edge_pts, edge_mask, cfg.edge_leaf, cfg.kf_edge_cap)
    hist_surf = state.hist_surf.at[wi].set(sp_ds)
    hist_surf_mask = state.hist_surf_mask.at[wi].set(sm_ds)
    hist_surf_refl = state.hist_surf_refl.at[wi].set(refl_ds[:, 0])
    hist_edge = state.hist_edge.at[wi].set(ep_ds)
    hist_edge_mask = state.hist_edge_mask.at[wi].set(em_ds)
    hist_valid = state.hist_valid.at[wi].set(True)

    # --- E: window keyframe clouds (gathered from the ring buffer) ---
    # window keyframe j sits at slot (wi - (W-1) + j) mod M, post-insert
    slots = (wi - (W - 1) + jnp.arange(W)) % M
    win_surf = hist_surf[slots]  # (W, Sc, 3)
    win_surf_mask = hist_surf_mask[slots]
    win_surf_refl = hist_surf_refl[slots]
    win_edge = hist_edge[slots]
    win_edge_mask = hist_edge_mask[slots]

    # pre-apply the lidar→body extrinsic to the SURF points (their factor
    # applies it — LidarKeyframeFactor.h:92-96). Edge points stay RAW: the
    # edge FACTOR ignores its stored extrinsic (the :37-43 quirk), but the
    # edge SEARCH must still query in the body frame like the reference's
    # composed pose — _edge_query_world applies the extrinsic at the
    # query sites only.
    win_surf_b = jax.vmap(lambda p: body_points(p, t_lb, q_lb))(win_surf)
    win_edge_b = win_edge

    return FusionMid(
        ts=ts, qs=qs, vs=vs, bas=bas, bgs=bgs, preints=preints,
        hist_surf=hist_surf, hist_surf_mask=hist_surf_mask,
        hist_surf_refl=hist_surf_refl,
        hist_edge=hist_edge, hist_edge_mask=hist_edge_mask,
        hist_valid=hist_valid,
        win_surf_b=win_surf_b, win_surf_mask=win_surf_mask,
        win_surf_refl=win_surf_refl,
        win_edge_b=win_edge_b, win_edge_mask=win_edge_mask,
        map_surf=map_surf, map_refl=map_refl, map_surf_mask=map_surf_mask,
        map_edge=map_edge, map_edge_mask=map_edge_mask,
        enough_map=enough_map, surf_table=surf_table, edge_table=edge_table,
        acc0=acc0, gyr0=gyr0,
    )


def _zero_batches(mid: FusionMid, dtype):
    """Empty correspondence batches for the warmup (unfilled-window) path."""
    zero_plane = PlaneFactorBatch(
        pts=mid.win_surf_b, normals=jnp.zeros_like(mid.win_surf_b),
        offsets=jnp.zeros(mid.win_surf_b.shape[:2], dtype),
        scores=jnp.zeros(mid.win_surf_b.shape[:2], dtype),
        mask=jnp.zeros(mid.win_surf_b.shape[:2], bool))
    zero_edge = EdgeFactorBatch(
        pts=mid.win_edge_b, point_a=jnp.zeros_like(mid.win_edge_b),
        point_b=jnp.zeros_like(mid.win_edge_b),
        scores=jnp.zeros(mid.win_edge_b.shape[:2], dtype),
        mask=jnp.zeros(mid.win_edge_b.shape[:2], bool))
    return zero_plane, zero_edge


def _finish(state: FusionState, mid: FusionMid, surf_batches, edge_batches,
            cfg: FusionConfig, noise: ImuNoise, warmup: bool):
    """Phases F–I: window GN, guarded write-back, marginalization,
    ring-buffer pose write-back."""
    W, M = cfg.window, cfg.local_map_width
    ts, qs, vs, bas, bgs = mid.ts, mid.qs, mid.vs, mid.bas, mid.bgs
    preints = mid.preints
    wi = state.write_idx
    slots = (wi - (W - 1) + jnp.arange(W)) % M

    # --- F: Gauss-Newton over the window tangent ---
    sb_anchor = (vs[:-1], bas[:-1], bgs[:-1])  # pre-solve anchors (:896-903)
    # whitening matrices depend only on the preintegrated covariances —
    # computed once, reused across all GN iterations and marginalization
    preint_Ws = jax.vmap(sqrt_info)(preints)

    def gn_iter(_, carry):
        ts, qs, vs, bas, bgs = carry
        H, g = _assemble(ts, qs, vs, bas, bgs, preints, preint_Ws, state.prior,
                         state.sb_anchor_on, sb_anchor,
                         surf_batches, edge_batches, noise, cfg)
        delta = solve_normal(H, -g, cfg.damping)
        return _retract_window(ts, qs, vs, bas, bgs, delta)

    if warmup:
        ts1, qs1, vs1, bas1, bgs1 = ts, qs, vs, bas, bgs
    elif cfg.gn_tol > 0.0:
        # step-norm early exit (see FusionConfig.gn_tol): the 15 sequential
        # 45-dim assemble+Cholesky rounds are pure latency depth — converged
        # windows exit after 2-4. With lm_lam0 > 0 the damping adapts per
        # iteration (see FusionConfig.lm_lam0 — Ceres' LM is the reference
        # behavior): λ grows when the step norm grows (overshoot), decays
        # on contraction.
        adaptive = cfg.lm_lam0 > 0.0

        def cond(carry):
            i, step = carry[0], carry[1]
            return (i < cfg.max_num_iter) & (step > cfg.gn_tol)

        def body(carry):
            i, prev_step, lam = carry[0], carry[1], carry[2]
            ts, qs, vs, bas, bgs = carry[3:]
            H, g = _assemble(ts, qs, vs, bas, bgs, preints, preint_Ws,
                             state.prior, state.sb_anchor_on, sb_anchor,
                             surf_batches, edge_batches, noise, cfg)
            if adaptive:
                delta = solve_normal_lm(H, -g, lam)
            else:
                delta = solve_normal(H, -g, cfg.damping)
            step = jnp.linalg.norm(delta)
            grew = step > prev_step
            lam1 = jnp.clip(jnp.where(grew, lam * cfg.lm_up,
                                      lam * cfg.lm_down),
                            1e-8, cfg.lm_max)
            new = _retract_window(ts, qs, vs, bas, bgs, delta)
            return (i + 1, step, lam1) + tuple(new)

        carry = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf, ts.dtype),
             jnp.asarray(cfg.lm_lam0, ts.dtype), ts, qs, vs, bas, bgs))
        ts1, qs1, vs1, bas1, bgs1 = carry[3:]
    else:
        ts1, qs1, vs1, bas1, bgs1 = jax.lax.fori_loop(
            0, cfg.max_num_iter, gn_iter, (ts, qs, vs, bas, bgs))
    qs1 = unify_quaternion(qs1)

    # --- G: guarded write-back (:1215-1283) ---
    def gate(new, old, thresh, per_component=False):
        if per_component:
            ok = jnp.abs(new - old) < thresh
        else:
            ok = (jnp.linalg.norm(new - old, axis=-1) < thresh)[..., None]
        return jnp.where(ok, new, old)

    ts1 = gate(ts1, ts, 10.0)
    vs1 = gate(vs1, vs, 10.0)
    bas1 = gate(bas1, bas, 22.0, per_component=True)
    bgs1 = gate(bgs1, bgs, 22.0, per_component=True)
    dq_vec = jnp.linalg.norm(quat_mul(quat_conj(qs1), qs)[..., 1:], axis=-1)
    qs1 = jnp.where((dq_vec < 10.0)[:, None], qs1, qs)  # always true in practice
    qs1 = quat_normalize(qs1)

    # --- H: marginalize the exiting keyframe into the new prior ---
    if warmup:
        prior = state.prior
        sb_anchor_on = state.sb_anchor_on
    else:
        # the reference REBUILDS the marginalization problem after the
        # solve, so its speed-bias priors anchor at the POST-solve values
        # (tmps pushed from the solved tmpSpeedBias, BackendFusion.cpp:
        # 1045-1048 — Ceres solved in place at :993) and the marginalized
        # sb residual is zero at the linearization point. Anchoring at the
        # pre-solve values here injected a spurious gradient into the new
        # prior on the one post-loop-closure step where sb_anchor_on holds.
        sb_anchor_post = (vs1[:-1], bas1[:-1], bgs1[:-1])
        H, g = _assemble(ts1, qs1, vs1, bas1, bgs1, preints, preint_Ws, state.prior,
                         state.sb_anchor_on, sb_anchor_post,
                         surf_batches, edge_batches, noise, cfg,
                         imu_first_only=True)
        J, r0 = schur_marginalize(H, g, 15)
        prior = MarginalPrior(
            J=J, r0=r0, t0=ts1[1:], q0=qs1[1:], v0=vs1[1:],
            ba0=bas1[1:], bg0=bgs1[1:], valid=jnp.ones((), bool),
        )
        sb_anchor_on = jnp.zeros((), bool)

    # --- I: write optimized window poses back into the ring buffer
    # (wi == slots[-1], so the window write covers the new keyframe slot) ---
    hist_t = state.hist_t.at[slots].set(ts1)
    hist_q = state.hist_q.at[slots].set(qs1)

    new_state = FusionState(
        t=ts1, q=qs1, v=vs1, ba=bas1, bg=bgs1,
        preints=preints, prior=prior, sb_anchor_on=sb_anchor_on,
        hist_surf=mid.hist_surf, hist_surf_mask=mid.hist_surf_mask,
        hist_surf_refl=mid.hist_surf_refl,
        hist_edge=mid.hist_edge, hist_edge_mask=mid.hist_edge_mask,
        hist_t=hist_t, hist_q=hist_q, hist_valid=mid.hist_valid,
        write_idx=(wi + 1) % M, kf_count=state.kf_count + 1,
        msurf_cells=mid.surf_table[0], msurf_sums=mid.surf_table[1],
        msurf_cnt=mid.surf_table[2], msurf_valid=mid.surf_table[3],
        medge_cells=mid.edge_table[0], medge_sums=mid.edge_table[1],
        medge_cnt=mid.edge_table[2], medge_valid=mid.edge_table[3],
        acc0=mid.acc0, gyr0=mid.gyr0,
    )
    out = FusionOut(
        t_latest=ts1[-1], q_latest=qs1[-1],
        t_mature=ts1[0], q_mature=qs1[0],
        v_latest=vs1[-1], ba_latest=bas1[-1], bg_latest=bgs1[-1],
        n_surf_corr=jnp.sum(surf_batches.mask.astype(jnp.int32)).astype(jnp.int32),
        n_edge_corr=jnp.sum(edge_batches.mask.astype(jnp.int32)).astype(jnp.int32),
    )
    return new_state, out


def _match_with_maps(mid: FusionMid, cfg: FusionConfig):
    """Flattened-window correspondence search against the incremental match
    maps carried in ``mid`` (the phase-C half of default_map_and_match)."""
    W = cfg.window
    Sc, Ec = cfg.kf_surf_cap, cfg.kf_edge_cap
    pw_surf = (quat_rotate(mid.qs[:, None, :], mid.win_surf_b)
               + mid.ts[:, None, :]).reshape(W * Sc, 3)
    sb_flat = _surf_correspondences(
        mid.win_surf_b.reshape(W * Sc, 3), pw_surf,
        mid.win_surf_mask.reshape(W * Sc), mid.win_surf_refl.reshape(W * Sc),
        mid.map_surf, mid.map_surf_mask, mid.map_refl, cfg)
    surf_batches = PlaneFactorBatch(*[a.reshape((W, Sc) + a.shape[1:])
                                      for a in sb_flat])
    pw_edge = _edge_query_world(mid.ts, mid.qs, mid.win_edge_b,
                                cfg).reshape(W * Ec, 3)
    eb_flat = _edge_correspondences(
        mid.win_edge_b.reshape(W * Ec, 3), pw_edge,
        mid.win_edge_mask.reshape(W * Ec), mid.map_edge, mid.map_edge_mask,
        cfg)
    edge_batches = EdgeFactorBatch(*[a.reshape((W, Ec) + a.shape[1:])
                                     for a in eb_flat])
    return surf_batches, edge_batches, mid.enough_map


@partial(jax.jit, static_argnames=("cfg", "noise", "warmup", "match_fn",
                                   "rebuild"))
def fusion_step(
    state: FusionState,
    surf_pts: jnp.ndarray,  # (Sc,3) lidar frame (frontend-downsampled)
    surf_mask: jnp.ndarray,
    surf_refl: jnp.ndarray,  # (Sc,) curvature channel
    edge_pts: jnp.ndarray,  # (Ec,3)
    edge_mask: jnp.ndarray,
    imu_dts: jnp.ndarray,  # (imu_cap,)
    imu_accs: jnp.ndarray,  # (imu_cap,3)
    imu_gyrs: jnp.ndarray,  # (imu_cap,3)
    imu_valid: jnp.ndarray,  # (imu_cap,)
    cfg: FusionConfig = FusionConfig(),
    noise: ImuNoise = ImuNoise(),
    warmup: bool = False,
    match_fn=None,
    rebuild: bool = False,
):
    """Ingest one keyframe: IMU propagate + preintegrate, window shift,
    local-map correspondence, sliding-window GN, guarded write-back,
    marginalization, ring-buffer update.

    ``warmup`` (static): pass True while the window is not yet full
    (kf_count+1 < window, the reference's :833 early-out) — the caller
    knows the keyframe count, so start-up is a separate small compiled
    program instead of a traced ``cond`` doubling the main program.

    ``match_fn`` (static): map-build + correspondence phase; defaults to
    the incremental-table maps (FusionConfig.incremental_map) or
    :func:`default_map_and_match`. The multi-chip path injects the
    map-sharded variant (parallel/map_fusion.py), which bypasses the
    incremental tables.

    ``rebuild`` (static): batch-rebuild the mature map tables from the ring
    — pass True for the first step after a loop-closure pose correction.
    """
    dtype = state.t.dtype
    mid = _ingest(state, surf_pts, surf_mask, surf_refl, edge_pts, edge_mask,
                  imu_dts, imu_accs, imu_gyrs, imu_valid, cfg, noise,
                  rebuild=rebuild)

    if warmup:
        surf_batches, edge_batches = _zero_batches(mid, dtype)
    else:
        # correspondence search — the map comes from the PRE-insert ring
        # buffer (the reference's local map excludes the incoming keyframe,
        # :1387-1484); injectable for the sharded path
        if match_fn is None and cfg.incremental_map:
            surf_batches, edge_batches, enough_map = _match_with_maps(mid, cfg)
        else:
            mf = match_fn or default_map_and_match
            surf_batches, edge_batches, enough_map = mf(
                state, mid.ts, mid.qs, mid.win_surf_b, mid.win_surf_mask,
                mid.win_surf_refl, mid.win_edge_b, mid.win_edge_mask, cfg)
        # disable lidar factors when the map is too sparse (:936, start-up)
        surf_batches = surf_batches._replace(
            mask=surf_batches.mask & enough_map,
            scores=surf_batches.scores * enough_map.astype(dtype))
        edge_batches = edge_batches._replace(
            mask=edge_batches.mask & enough_map,
            scores=edge_batches.scores * enough_map.astype(dtype))

    return _finish(state, mid, surf_batches, edge_batches, cfg, noise, warmup)


# ---------------------------------------------------------------------------
# Split-dispatch variant: the two kNN launches (surf + edge) run standalone
# between a pre- and a post-program. Numerically identical to ``fusion_step``
# (same traced ops, same order); exists so the fused Pallas kNN kernel can be
# dispatched top-level — embedding tpu_custom_call inside the single big
# program blows XLA:TPU compile times through the remote toolchain
# (docs/PERFORMANCE.md). Intermediates stay on device; dispatch is async.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "noise", "rebuild"))
def _fusion_pre(state: FusionState, surf_pts, surf_mask, surf_refl,
                edge_pts, edge_mask, imu_dts, imu_accs, imu_gyrs, imu_valid,
                cfg: FusionConfig, noise: ImuNoise, rebuild: bool = False):
    """Phases A–E + local-map build + world-frame query flattening."""
    W = cfg.window
    Sc, Ec = cfg.kf_surf_cap, cfg.kf_edge_cap
    mid = _ingest(state, surf_pts, surf_mask, surf_refl, edge_pts, edge_mask,
                  imu_dts, imu_accs, imu_gyrs, imu_valid, cfg, noise,
                  rebuild=rebuild)
    if cfg.incremental_map:
        maps = (mid.map_surf, mid.map_refl, mid.map_surf_mask,
                mid.map_edge, mid.map_edge_mask, mid.enough_map)
    else:
        maps = _build_maps(state, cfg)
    pw_surf = (quat_rotate(mid.qs[:, None, :], mid.win_surf_b)
               + mid.ts[:, None, :]).reshape(W * Sc, 3)
    pw_edge = _edge_query_world(mid.ts, mid.qs, mid.win_edge_b,
                                cfg).reshape(W * Ec, 3)
    return mid, maps, pw_surf, pw_edge


@partial(jax.jit, static_argnames=("cfg", "noise"))
def _fusion_post(state: FusionState, mid: FusionMid,
                 map_surf, map_refl, map_edge, enough_map,
                 pw_surf, d2_surf, idx_surf, d2_edge, idx_edge,
                 cfg: FusionConfig, noise: ImuNoise):
    """Fit + gate on the precomputed k-NN candidates, then phases F–I."""
    W = cfg.window
    Sc, Ec = cfg.kf_surf_cap, cfg.kf_edge_cap
    dtype = state.t.dtype

    sb_flat = surf_fit_and_gate(
        mid.win_surf_b.reshape(W * Sc, 3), pw_surf,
        mid.win_surf_mask.reshape(W * Sc), mid.win_surf_refl.reshape(W * Sc),
        d2_surf, map_surf[idx_surf], map_refl[idx_surf], cfg)
    surf_batches = PlaneFactorBatch(*[a.reshape((W, Sc) + a.shape[1:])
                                      for a in sb_flat])
    eb_flat = edge_fit_and_gate(
        mid.win_edge_b.reshape(W * Ec, 3), mid.win_edge_mask.reshape(W * Ec),
        d2_edge, map_edge[idx_edge], cfg)
    edge_batches = EdgeFactorBatch(*[a.reshape((W, Ec) + a.shape[1:])
                                     for a in eb_flat])
    surf_batches = surf_batches._replace(
        mask=surf_batches.mask & enough_map,
        scores=surf_batches.scores * enough_map.astype(dtype))
    edge_batches = edge_batches._replace(
        mask=edge_batches.mask & enough_map,
        scores=edge_batches.scores * enough_map.astype(dtype))
    return _finish(state, mid, surf_batches, edge_batches, cfg, noise,
                   warmup=False)


def fusion_step_split(
    state: FusionState,
    surf_pts, surf_mask, surf_refl, edge_pts, edge_mask,
    imu_dts, imu_accs, imu_gyrs, imu_valid,
    cfg: FusionConfig = FusionConfig(),
    noise: ImuNoise = ImuNoise(),
    rebuild: bool = False,
):
    """``fusion_step`` with the surf/edge kNN as standalone launches
    (host-chained jitted programs; see the section comment above). Main-path
    only — the unfilled-window warmup stays on ``fusion_step(warmup=True)``
    (it runs no correspondence search, so there is nothing to split)."""
    mid, maps, pw_surf, pw_edge = _fusion_pre(
        state, surf_pts, surf_mask, surf_refl, edge_pts, edge_mask,
        imu_dts, imu_accs, imu_gyrs, imu_valid, cfg, noise, rebuild=rebuild)
    map_surf, map_refl, map_surf_mask, map_edge, map_edge_mask, enough_map = maps
    d2s, idxs, d2e, idxe = knn_pair_auto(
        pw_surf, map_surf, map_surf_mask,
        pw_edge, map_edge, map_edge_mask, k=cfg.k,
        qm1=mid.win_surf_mask.reshape(-1), qm2=mid.win_edge_mask.reshape(-1))
    return _fusion_post(state, mid, map_surf, map_refl, map_edge, enough_map,
                        pw_surf, d2s, idxs, d2e, idxe, cfg, noise)
