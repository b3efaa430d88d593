"""Frontend scan-to-map odometry — the TPU-native re-design of
``LiLi-OM/src/LidarOdometry.cpp`` (shared by both variants).

One jitted program per frame ("odometry_step") replaces the ROS node loop:

* constant-velocity pose prior (poseInitialization, :415-442);
* local map = ring buffer of the 20 most recent frames' surf clouds in world
  (buildLocalMap, :280-303), voxel-downsampled at 0.4 m (:315-323);
* correspondence rounds (updateTransformationWithCeres, :483-586): batched
  exact 5-NN (MXU-tiled) → vmapped plane fits with the reference's gates
  (5th-NN < 1 m, per-neighbor plane distance ≤ 0.06, distance-decay weight
  ``1 − 0.9·|pd|/√‖p_w‖`` kept if > 0.4, :352-413) → Gauss-Newton iterations
  with Huber-0.1 IRLS weights on the point-to-plane factors
  (LidarPlaneNormIncreFactor);
* keyframe trigger (>0.2 m ∨ >0.1 rad with ≥1-frame gap, or every 3rd frame,
  :573-585).

Everything is fixed-shape; the "deque" is a ring buffer with masks; the
first-2-frames 8-round schedule (:500-504) is a masked ``fori_loop``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors.lidar import PlaneFactorBatch, huber_weight, plane_residual
from ..ops.fitting import eig3_symmetric, fit_plane
from ..ops.knn import knn_auto, world_knn_auto
from ..ops.voxel import merge_voxel_entries, voxel_downsample
from ..solver.gn import gn_update
from ..utils.math import (
    exp_so3,
    pose_relative,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    unify_quaternion,
)


class OdometryConfig(NamedTuple):
    """Static knobs (hashable → usable as a jit static arg). Defaults mirror
    the reference's hardcodes and FR_IOSB config."""

    n_recent_frames: int = 20  # local-map deque length (:290)
    scan_cap: int = 8192  # surf features per frame (static capacity)
    query_cap: int = 4096  # downsampled scan queries
    map_cap: int = 32768  # downsampled local-map points
    # per-frame storage in the local-map ring buffer: frames are voxel-
    # downsampled at ``ds_leaf`` when INSERTED (the reference concats raw
    # surf clouds and downsamples the union per frame, :280-323; pre-
    # downsampling each frame at the same leaf halves the N of that
    # per-frame union downsample — the dominant device cost — at a
    # centroid-of-centroids approximation the backend path already makes
    # for its keyframe ring buffer)
    frame_cap: int = 4096
    ds_leaf: float = 0.4  # voxel leaf for both map & scan (:155-156)
    # persistent local-map voxel-table capacity (0 → map_cap + 2·frame_cap).
    # The frontend's local map is INCREMENTAL: frame poses never change
    # after insertion (the frontend is its own trajectory), so the
    # 20-frame union downsample — the dominant per-scan sort at 82k points
    # — is replaced by a persistent (cell, sums, count) table updated with
    # ±frame_cap entries per frame (one ~T+2·frame_cap sort instead;
    # ops/voxel.py:merge_voxel_entries). The match map is the table's first
    # map_cap hash-ordered voxels — the same capacity semantics as the
    # batch union downsample. Slack above map_cap absorbs hash-rank shifts
    # so capacity-overflow drops never lose voxels the match map could
    # later expose.
    map_table_cap: int = 0
    k: int = 5  # kNN fan-in (:360)
    nn_gate: float = 1.0  # 5th-NN squared... distance gate (d<1.0, :365)
    plane_tol: float = 0.06  # per-neighbor plane validity (:389)
    min_weight: float = 0.4  # correspondence keep gate (:400)
    huber: float = 0.1  # robust loss (:508)
    max_rounds: int = 8  # first-2-frames schedule (:501)
    scan_match_cnt: int = 2  # steady-state rounds (config_fr_iosb.yaml)
    # inner GN iterations per matching round — the reference's per-dataset
    # ``lidar_odometry/max_num_iter`` Ceres budget (15 Livox
    # config_fr_iosb.yaml:9; 12 ROT config_fr_iosb.yaml:17), wired through
    # the presets. Ceres additionally early-exits on its own tolerances and
    # a 0.015 s wall budget (:530-531); ``gn_tol`` recovers the adaptive
    # cost so carrying the full reference budget stays cheap.
    gn_iters: int = 4
    # step-norm early exit for the inner GN loop; 0 = fixed fori_loop
    gn_tol: float = 1e-5
    kf_dist: float = 0.2  # keyframe translation gate (:571)
    kf_angle: float = 0.1  # keyframe rotation gate (:571)
    max_step_t: float = 0.5  # GN trust region: per-iteration step clamps
    max_step_r: float = 0.2
    max_frame_jump: float = 2.0  # divergence gate vs the motion prior
    # "centered": normal from the neighbor covariance (eig3), offset through
    # the centroid — f32-stable and geometrically unbiased. "ref": the
    # reference's origin-dependent A·n=−1 QR form (LidarOdometry.cpp:362-377),
    # whose normal-equation cancellation amplifies f32 drift ~3×.
    plane_fit: str = "centered"


class OdometryState(NamedTuple):
    """Per-run carried state (pytree)."""

    frames_pts: jnp.ndarray  # (F, S, 3) recent surf clouds, world frame
    frames_mask: jnp.ndarray  # (F, S)
    # persistent local-map voxel table (see OdometryConfig.map_table_cap):
    # partial aggregates of the ring frames' union downsample, hash-ordered
    map_cells: jnp.ndarray  # (T, 3) int32 absolute voxel cells
    map_sums: jnp.ndarray  # (T, 3) xyz sums
    map_cnt: jnp.ndarray  # (T,)
    map_valid: jnp.ndarray  # (T,)
    write_idx: jnp.ndarray  # () int32 ring-buffer cursor
    frame_id: jnp.ndarray  # () int32 frames processed so far
    t: jnp.ndarray  # (3,) current world pose
    q: jnp.ndarray  # (4,)
    t_prev: jnp.ndarray  # (3,) previous frame pose
    q_prev: jnp.ndarray  # (4,)
    kf_t: jnp.ndarray  # (3,) last keyframe pose
    kf_q: jnp.ndarray  # (4,)
    kf_frame: jnp.ndarray  # () int32 frame id of last keyframe


def _table_cap(cfg: OdometryConfig) -> int:
    return cfg.map_table_cap or (cfg.map_cap + 2 * cfg.frame_cap)


class OdometryOut(NamedTuple):
    t: jnp.ndarray  # (3,) world pose of this frame
    q: jnp.ndarray  # (4,)
    rel_t: jnp.ndarray  # (3,) pose relative to previous frame (/each_odom)
    rel_q: jnp.ndarray  # (4,)
    is_keyframe: jnp.ndarray  # () bool
    n_corr: jnp.ndarray  # () int32 surviving correspondences (diagnostic)


def init_state(cfg: OdometryConfig, dtype=jnp.float32) -> OdometryState:
    F, S, T = cfg.n_recent_frames, cfg.frame_cap, _table_cap(cfg)
    qid = jnp.array([1.0, 0.0, 0.0, 0.0], dtype)
    z3 = jnp.zeros(3, dtype)
    return OdometryState(
        frames_pts=jnp.zeros((F, S, 3), dtype),
        frames_mask=jnp.zeros((F, S), bool),
        map_cells=jnp.zeros((T, 3), jnp.int32),
        map_sums=jnp.zeros((T, 3), dtype),
        map_cnt=jnp.zeros((T,), dtype),
        map_valid=jnp.zeros((T,), bool),
        write_idx=jnp.zeros((), jnp.int32),
        frame_id=jnp.zeros((), jnp.int32),
        t=z3, q=qid, t_prev=z3, q_prev=qid,
        kf_t=z3, kf_q=qid, kf_frame=jnp.zeros((), jnp.int32),
    )


def _map_from_table(state: OdometryState, cfg: OdometryConfig):
    """Match map = the table's first map_cap hash-ordered voxel centroids."""
    cnt = jnp.maximum(state.map_cnt[: cfg.map_cap], 1.0)
    pts = state.map_sums[: cfg.map_cap] / cnt[:, None]
    return pts.astype(state.map_sums.dtype), state.map_valid[: cfg.map_cap]


def _update_map_table(state: OdometryState, ws_ds, wm_ds, cfg: OdometryConfig):
    """Merge the new frame in and the evicted ring frame out of the
    persistent table (one T+2·frame_cap-entry sort — see
    OdometryConfig.map_table_cap). Must run BEFORE the ring-slot overwrite;
    entry aggregation is linear, so the evicted frame subtracts as its
    points with −1 counts."""
    leaf = cfg.ds_leaf
    ev_pts = state.frames_pts[state.write_idx]
    ev_mask = state.frames_mask[state.write_idx]
    one = jnp.ones((), ws_ds.dtype)
    cells = jnp.concatenate([
        state.map_cells,
        jnp.floor(ws_ds / leaf).astype(jnp.int32),
        jnp.floor(ev_pts / leaf).astype(jnp.int32)])
    sums = jnp.concatenate([state.map_sums, ws_ds, -ev_pts])
    cnt = jnp.concatenate([state.map_cnt, wm_ds.astype(ws_ds.dtype),
                           -ev_mask.astype(ws_ds.dtype)])
    valid = jnp.concatenate([state.map_valid, wm_ds, ev_mask])
    # NOTE: an occupancy-adaptive tiered variant exists
    # (ops/voxel.py:merge_voxel_entries_tiered) but measured SLOWER here —
    # lax.cond overhead exceeds the sort saving (docs/PERFORMANCE.md
    # "Negative result: occupancy-tiered table merges")
    return merge_voxel_entries(cells, sums, cnt, valid, _table_cap(cfg))


def _find_and_solve(t, q, scan_q, scan_q_mask, map_pts, map_mask, cfg: OdometryConfig):
    """One correspondence round: kNN + plane fits + ``gn_iters`` GN steps."""
    # world-frame query positions under the current estimate
    pw = quat_rotate(q[None, :], scan_q) + t[None, :]
    d2, idx = knn_auto(pw, map_pts, k=cfg.k, p_mask=map_mask)
    return _fit_and_gn(t, q, scan_q, scan_q_mask, pw, map_pts[idx], d2, cfg)


def plane_correspondences(scan_q, scan_q_mask, pw, nbrs, d2,
                          cfg: OdometryConfig) -> PlaneFactorBatch:
    """Production plane fits + gates on precomputed k-NN candidates
    (findCorrespondingSurfFeatures, :352-413) — shared by the single-chip
    round tail and the query-sharded mesh round (parallel/sharded.py)."""
    nn_ok = d2[:, cfg.k - 1] < cfg.nn_gate  # 5th-NN distance gate (:365)

    # plane fit over the k neighbors (all valid: masked kNN padding yields
    # +inf dists which fail nn_ok anyway)
    if cfg.plane_fit == "centered":
        ctr = jnp.mean(nbrs, axis=-2)
        dd = nbrs - ctr[:, None, :]
        cov = jnp.einsum("qki,qkj->qij", dd, dd)
        _, evecs = eig3_symmetric(cov)
        normal = evecs[..., :, 0]
        d_off = -jnp.sum(normal * ctr, axis=-1)
    else:  # the reference's A·n = −1 form, via the shared fit library
        fp = fit_plane(nbrs, jnp.ones(nbrs.shape[:-1], bool),
                       dist_thres=cfg.plane_tol)
        normal, d_off = fp.normal, fp.d
    pd_nbr = jnp.abs(jnp.einsum("qki,qi->qk", nbrs, normal) + d_off[:, None])
    plane_ok = jnp.all(pd_nbr <= cfg.plane_tol, axis=-1)

    pd = jnp.sum(normal * pw, axis=-1) + d_off
    # reference quirk kept: the decay length is √‖p_world‖ (distance from the
    # *world origin*, not sensor range) — LidarOdometry.cpp:397
    pw_norm = jnp.sqrt(jnp.maximum(jnp.linalg.norm(pw, axis=-1), 1e-9))
    weight = 1.0 - 0.9 * jnp.abs(pd) / pw_norm
    keep = scan_q_mask & nn_ok & plane_ok & (weight > cfg.min_weight)

    return PlaneFactorBatch(
        pts=scan_q, normals=normal, offsets=d_off,
        scores=jnp.where(keep, weight, 0.0), mask=keep,
    )


def clamp_step(delta, cfg: OdometryConfig):
    """Trust region: an ill-conditioned system (feature dropout, fast
    motion) must not produce unbounded steps — Ceres bounds these via its
    trust-region radius; we clamp per-step norms equivalently."""
    tn = jnp.linalg.norm(delta[:3])
    rn = jnp.linalg.norm(delta[3:6])
    scale = jnp.minimum(1.0, jnp.minimum(
        cfg.max_step_t / jnp.maximum(tn, 1e-12),
        cfg.max_step_r / jnp.maximum(rn, 1e-12)))
    return delta * scale


def _fit_and_gn(t, q, scan_q, scan_q_mask, pw, nbrs, d2, cfg: OdometryConfig):
    """Plane fits + gates + ``gn_iters`` GN steps given precomputed k-NN
    candidates — the round tail shared by the single-program step and the
    split-dispatch step (which runs the kNN as its own launch)."""
    batch = plane_correspondences(scan_q, scan_q_mask, pw, nbrs, d2, cfg)
    keep = batch.mask

    def gn_step(t, q):
        r, J = plane_residual(t, q, batch)
        w = huber_weight(r * r, cfg.huber)
        delta = clamp_step(gn_update(J, r, damping=1e-8, w=w), cfg)
        t = t + delta[:3]
        q = quat_normalize(quat_mul(q, exp_so3(delta[3:6])))
        return t, q, jnp.linalg.norm(delta)

    if cfg.gn_tol > 0.0:
        # step-norm early exit — carries the reference's full max_num_iter
        # budget at the adaptive cost Ceres pays (see OdometryConfig)
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
        def fori_body(_, carry):
            t, q, _step = gn_step(*carry[:2])
            return (t, q)

        t, q = jax.lax.fori_loop(0, cfg.gn_iters, fori_body, (t, q))
    return t, q, jnp.sum(keep.astype(jnp.int32)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "n_rounds"))
def odometry_step(state: OdometryState, surf_pts: jnp.ndarray, surf_mask: jnp.ndarray,
                  cfg: OdometryConfig = OdometryConfig(), n_rounds: int | None = None):
    """Process one frame's surf-feature cloud (sensor frame at scan start).

    ``n_rounds``: static matching-round count. The reference runs 8 rounds
    for the first two frames, then ``scan_match_cnt`` (:500-504) — the HOST
    knows the frame counter, so it picks the static count per call (two
    compiled variants) instead of tracing a data-dependent ``cond`` whose
    branches double the program (compile time matters through remote
    compilers). Defaults to ``cfg.scan_match_cnt``.

    Returns (new_state, OdometryOut).
    """
    F, S = cfg.n_recent_frames, cfg.frame_cap
    dtype = surf_pts.dtype

    # --- pose prior: propagate last relative motion (:415-442) ---
    rel_t, rel_q = pose_relative(state.t_prev, state.q_prev, state.t, state.q)
    t_guess = state.t + quat_rotate(state.q, rel_t)
    q_guess = quat_normalize(quat_mul(state.q, rel_q))

    # --- local map (:280-323): the persistent voxel table replaces the
    # per-scan 82k-point union re-downsample — frontend frame poses are
    # fixed at insertion, so the union only changes by ±1 frame per scan
    # (see OdometryConfig.map_table_cap) ---
    map_pts, map_mask = _map_from_table(state, cfg)

    # --- downsample the scan (sensor frame) into the query set ---
    scan_q, scan_q_mask = voxel_downsample(surf_pts, surf_mask, cfg.ds_leaf, cfg.query_cap)

    # --- matching rounds (static count, see docstring). An empty start-up
    # map degrades gracefully: no correspondences → singular H → zero step
    # (solve_normal guards), matching the reference's <10-points early-out
    # (:485-488) without a traced branch. ---
    if n_rounds is None:
        n_rounds = cfg.scan_match_cnt
    t, q, n_corr = t_guess, q_guess, jnp.zeros((), jnp.int32)
    for _ in range(n_rounds):
        t, q, n_corr = _find_and_solve(t, q, scan_q, scan_q_mask, map_pts, map_mask, cfg)
    # divergence gate: a solution far from the constant-velocity prior means
    # matching collapsed — fall back to the prior (the backend's
    # update-rejection analog, BackendFusion.cpp:1215-1283)
    diverged = jnp.linalg.norm(t - t_guess) > cfg.max_frame_jump
    t = jnp.where(diverged, t_guess, t)
    q = jnp.where(diverged, q_guess, q)
    q = unify_quaternion(q)

    # --- keyframe decision (:573-585) ---
    dis = jnp.linalg.norm(t - state.kf_t)
    dq = quat_mul(quat_conj(state.kf_q), q)
    ang = 2.0 * jnp.arccos(jnp.clip(jnp.abs(dq[0]), -1.0, 1.0))
    since = state.frame_id - state.kf_frame
    is_kf = (
        (((dis > cfg.kf_dist) | (ang > cfg.kf_angle)) & (since > 1))
        | (since > 2)
        | (state.frame_id <= 1)
    )
    kf_t = jnp.where(is_kf, t, state.kf_t)
    kf_q = jnp.where(is_kf, q, state.kf_q)
    kf_frame = jnp.where(is_kf, state.frame_id, state.kf_frame)

    # --- /each_odom relative pose (:609-622) ---
    out_rel_t, out_rel_q = pose_relative(state.t, state.q, t, q)

    # --- ring-buffer insert: the SENSOR-downsampled scan (the query set)
    # transformed by the solved pose — exactly the reference's deque of
    # downsampled scans in world (buildLocalMap :280-303 concats the
    # transformed ds scans); no second world-frame downsample ---
    ws_ds, wm_ds = _frame_from_scan(scan_q, scan_q_mask, surf_pts, surf_mask,
                                    t, q, cfg)
    ws_ds = ws_ds.astype(dtype)
    map_cells, map_sums, map_cnt, map_valid = _update_map_table(
        state, ws_ds, wm_ds, cfg)
    frames_pts = state.frames_pts.at[state.write_idx].set(ws_ds)
    frames_mask = state.frames_mask.at[state.write_idx].set(wm_ds)

    new_state = OdometryState(
        frames_pts=frames_pts,
        frames_mask=frames_mask,
        map_cells=map_cells, map_sums=map_sums, map_cnt=map_cnt,
        map_valid=map_valid,
        write_idx=(state.write_idx + 1) % F,
        frame_id=state.frame_id + 1,
        t=t, q=q, t_prev=state.t, q_prev=state.q,
        kf_t=kf_t, kf_q=kf_q, kf_frame=kf_frame,
    )
    out = OdometryOut(t=t, q=q, rel_t=out_rel_t, rel_q=out_rel_q,
                      is_keyframe=is_kf, n_corr=n_corr)
    return new_state, out


def _frame_from_scan(scan_q, scan_q_mask, surf_pts, surf_mask, t, q,
                     cfg: OdometryConfig):
    """World-frame ring entry. With frame_cap == query_cap (the shipped
    configs) the sensor-downsampled query set transforms directly — the
    reference's deque holds exactly the ds scan it matched with
    (downSampleCloud output feeds both the solver and buildLocalMap,
    :315-323, :280-303). A larger frame_cap keeps the separate world-frame
    downsample so the map density is not capped by the query budget."""
    if cfg.frame_cap == cfg.query_cap:
        return quat_rotate(q[None, :], scan_q) + t[None, :], scan_q_mask
    world = quat_rotate(q[None, :], surf_pts) + t[None, :]
    return voxel_downsample(world, surf_mask, cfg.ds_leaf, cfg.frame_cap)


# ---------------------------------------------------------------------------
# Split-dispatch variant: the kNN runs as its OWN launch between smaller
# jitted programs. Numerically identical to ``odometry_step``; exists so the
# fused Pallas kNN kernel (ops/knn_pallas.py) can be dispatched standalone —
# embedding tpu_custom_call inside the big single-program step blows XLA:TPU
# compile times through the remote toolchain (docs/PERFORMANCE.md). All
# intermediates stay on device; dispatch is async, so the extra program
# boundaries cost enqueue latency only, not transfers.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def _odo_prepare(state: OdometryState, surf_pts, surf_mask, cfg: OdometryConfig):
    """Pose prior + local-map/scan voxel downsample (the pre-matching phase
    of ``odometry_step``)."""
    rel_t, rel_q = pose_relative(state.t_prev, state.q_prev, state.t, state.q)
    t_guess = state.t + quat_rotate(state.q, rel_t)
    q_guess = quat_normalize(quat_mul(state.q, rel_q))
    map_pts, map_mask = _map_from_table(state, cfg)
    scan_q, scan_q_mask = voxel_downsample(surf_pts, surf_mask, cfg.ds_leaf, cfg.query_cap)
    return t_guess, q_guess, scan_q, scan_q_mask, map_pts, map_mask


@jax.jit
def _odo_world(t, q, scan_q):
    return quat_rotate(q[None, :], scan_q) + t[None, :]


@partial(jax.jit, static_argnames=("cfg",))
def _odo_round_tail(t, q, scan_q, scan_q_mask, pw, map_pts, d2, idx,
                    cfg: OdometryConfig):
    return _fit_and_gn(t, q, scan_q, scan_q_mask, pw, map_pts[idx], d2, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _odo_finalize(state: OdometryState, scan_q, scan_q_mask,
                  surf_pts, surf_mask,
                  t_guess, q_guess, t, q, n_corr, cfg: OdometryConfig):
    """Divergence gate + keyframe decision + ring-buffer insert (the
    post-matching phase of ``odometry_step``)."""
    F = cfg.n_recent_frames
    dtype = scan_q.dtype
    diverged = jnp.linalg.norm(t - t_guess) > cfg.max_frame_jump
    t = jnp.where(diverged, t_guess, t)
    q = jnp.where(diverged, q_guess, q)
    q = unify_quaternion(q)

    dis = jnp.linalg.norm(t - state.kf_t)
    dq = quat_mul(quat_conj(state.kf_q), q)
    ang = 2.0 * jnp.arccos(jnp.clip(jnp.abs(dq[0]), -1.0, 1.0))
    since = state.frame_id - state.kf_frame
    is_kf = (
        (((dis > cfg.kf_dist) | (ang > cfg.kf_angle)) & (since > 1))
        | (since > 2)
        | (state.frame_id <= 1)
    )
    kf_t = jnp.where(is_kf, t, state.kf_t)
    kf_q = jnp.where(is_kf, q, state.kf_q)
    kf_frame = jnp.where(is_kf, state.frame_id, state.kf_frame)

    out_rel_t, out_rel_q = pose_relative(state.t, state.q, t, q)

    ws_ds, wm_ds = _frame_from_scan(scan_q, scan_q_mask, surf_pts, surf_mask,
                                    t, q, cfg)
    ws_ds = ws_ds.astype(dtype)
    map_cells, map_sums, map_cnt, map_valid = _update_map_table(
        state, ws_ds, wm_ds, cfg)
    frames_pts = state.frames_pts.at[state.write_idx].set(ws_ds)
    frames_mask = state.frames_mask.at[state.write_idx].set(wm_ds)

    new_state = OdometryState(
        frames_pts=frames_pts,
        frames_mask=frames_mask,
        map_cells=map_cells, map_sums=map_sums, map_cnt=map_cnt,
        map_valid=map_valid,
        write_idx=(state.write_idx + 1) % F,
        frame_id=state.frame_id + 1,
        t=t, q=q, t_prev=state.t, q_prev=state.q,
        kf_t=kf_t, kf_q=kf_q, kf_frame=kf_frame,
    )
    out = OdometryOut(t=t, q=q, rel_t=out_rel_t, rel_q=out_rel_q,
                      is_keyframe=is_kf, n_corr=n_corr)
    return new_state, out


def odometry_step_split(state: OdometryState, surf_pts, surf_mask,
                        cfg: OdometryConfig = OdometryConfig(),
                        n_rounds: int | None = None):
    """``odometry_step`` with the kNN as a standalone launch per matching
    round (host-chained jitted programs; see the section comment above).
    Same signature and results as the single-program step."""
    if n_rounds is None:
        n_rounds = cfg.scan_match_cnt
    t, q, scan_q, scan_q_mask, map_pts, map_mask = _odo_prepare(
        state, surf_pts, surf_mask, cfg)
    t_guess, q_guess = t, q
    n_corr = jnp.zeros((), jnp.int32)
    for _ in range(n_rounds):
        pw, d2, idx = world_knn_auto(t, q, scan_q, map_pts, k=cfg.k,
                                     p_mask=map_mask, q_mask=scan_q_mask)
        t, q, n_corr = _odo_round_tail(t, q, scan_q, scan_q_mask, pw,
                                       map_pts, d2, idx, cfg)
    return _odo_finalize(state, scan_q, scan_q_mask, surf_pts, surf_mask,
                         t_guess, q_guess, t, q, n_corr, cfg)
