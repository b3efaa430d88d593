"""Full-system orchestrator: the host-side stage pipeline replacing the
reference's 4 ROS processes + topics (SURVEY.md §1 dataflow).

Per 0.1 s scan: feature extraction → frontend odometry → (on keyframes)
backend fusion → global pose graph node. At a lower cadence (the reference's
1 Hz thread, BackendFusion.cpp:2410-2421): loop-closure detection → ICP →
graph re-solve → pose correction + marginalization-prior reset.

Host responsibilities are sequencing and the unbounded keyframe archive
(numpy); every compute step is a jitted fixed-shape device program.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.fusion import (FusionConfig, fusion_step, fusion_step_split,
                             init_fusion_state)
from ..models.odometry import (OdometryConfig, init_state as init_odo_state,
                               odometry_step, odometry_step_split)
from ..models.pose_graph import (add_loop, add_node, ensure_capacity,
                                 init_graph, optimize_graph_chain, set_loop,
                                 solve_graph_incremental)
from ..ops.features_livox import (
    LivoxFeatureConfig,
    bin_livox_image,
    extract_features_livox,
)
from ..ops.features_spin import SpinFeatureConfig, extract_features_spin, integrate_gyro, undistort
from ..factors.lidar import body_points
from ..ops.icp import icp_point_to_plane
from ..ops.preintegration import ImuNoise
from ..ops.voxel import pad_cloud, voxel_downsample, voxel_downsample_np
from ..utils.math import pose_relative, quat_mul, quat_normalize, quat_rotate
from ..utils.metrics import StageMetrics


@jax.jit
def _reskew(pts, rel_time, trans):
    """The reference's ``if_to_deskew`` republish transform: shift each
    published point by its sweep-time fraction of the frame's relative
    translation — ``undistortion(cloud, rel_trans, Identity)``
    (LidarOdometry.cpp:624-632 calls it with ``quat(1,0,0,0)``, so only the
    ``ratio·trans`` term survives; :178-199)."""
    return pts + jnp.clip(rel_time, 0.0, 1.0)[:, None] * trans[None, :]


@partial(jax.jit, static_argnames=("cfg",))
def _preprocess_spin(img, valid, rel_time, dts, gyrs, imu_mask, t_scan, q_lb,
                     cfg: SpinFeatureConfig):
    """Fused undistortion + feature extraction — one device dispatch per
    frame instead of a chain of eager reshape/undistort hops (each eager op
    is an RPC on remote-attached runtimes). ``q_lb`` is the lidar←IMU
    extrinsic: the ROT reference rotates the gyro delta into the lidar frame
    via ``q_lb·q_si·q_lb⁻¹`` (LiLi-OM-ROT/src/Preprocessing.cpp:168)."""
    q_scan = integrate_gyro(dts, gyrs, imu_mask)
    flat = undistort(img.reshape(-1, 3), rel_time.reshape(-1), q_scan,
                     q_lb=q_lb, t_scan=t_scan)
    return extract_features_spin(flat.reshape(img.shape), valid, rel_time, cfg)


@dataclasses.dataclass
class LoopClosureConfig:
    """Loop-closure knobs (config_fr_iosb.yaml:25-33 + hardcodes)."""

    enabled: bool = True
    search_radius: float = 10.0  # lc_search_radius
    time_thres: float = 25.0  # global_lc_time_thres (ROT: lc_time_thres)
    # Livox two-tier fallback (BackendFusion.cpp:2449-2467): when no
    # candidate is older than ``time_thres``, the max-|Δt| candidate with
    # local_time_thres < Δt < time_thres is taken instead. None disables
    # the tier (the ROT variant has only the global gate, ROT :2248-2254).
    local_time_thres: float | None = None
    map_width: int = 20  # lc_map_width (± keyframes in the history submap)
    latest_width: int = 1  # 1 Livox (:2474); 6 ROT (:2267)
    icp_thres: float = 0.1  # fitness gate
    icp_iters: int = 20
    # fitness trim fraction: score the best 70% of NN matches (Trimmed-ICP).
    # PCL's untrimmed getFitnessScore (trim=1.0, the reference's form:
    # :2567-2581, 100 iters) fails under view-dependent occlusion shadows —
    # see ops/icp.py docstring. Dataset parity presets pin icp_iters=100,
    # icp_trim=1.0 (utils/config.py).
    icp_trim: float = 0.7
    submap_cap: int = 16384
    submap_leaf: float = 0.4
    # ROT re-fire gate (:2259, :2403): skip when |time_last_loop −
    # time_new_odom| < debounce, where time_last_loop is the MATURE keyframe
    # stamp recorded at the previous closure — with the ~1 s detection
    # cadence this gate is nearly inert in the reference too; same-pair
    # factor growth is bounded by ``merge_width`` instead.
    debounce: float = 0.2
    # same-pair loop replacement: a new closure whose endpoints both lie
    # within ``merge_width`` keyframes of an existing loop factor REPLACES
    # it instead of appending (the reference's iSAM2 absorbs repeated
    # between-factors incrementally at ~ms cost; the batch chain+Woodbury
    # solver here is quadratic in the loop count, so L must stay
    # ~O(distinct revisited places)). 0 disables merging.
    merge_width: int = 10
    # plausibility gate on the ICP-implied correction of the latest pose
    # (beyond reference — its only protection is the fitness gate,
    # :2581): a candidate detected within ``search_radius`` of the current
    # estimate cannot need a correction much larger than that radius; a
    # bigger one is an aliased alignment (e.g. point-to-plane sliding along
    # a symmetric wall), which a fitness score cannot catch. None = auto
    # (2·search_radius); explicit 0.0 disables the gate.
    max_correction: float | None = None
    # global-graph solve budget (iSAM2 parity, BackendFusion.cpp:2625-2628:
    # the reference's per-closure cost is a ms-scale incremental update):
    # max GN iterations + step-norm early exit (warm-started re-solves
    # converge in 1-2 iterations) + affected-suffix restriction (only nodes
    # past the earliest active loop endpoint can move — see
    # pose_graph.py:solve_graph_incremental). graph_tol=0 restores the
    # fixed-iteration schedule; graph_suffix=False the full-graph solve.
    graph_iters: int = 10
    graph_tol: float = 1e-3
    graph_suffix: bool = True


class LivoxKeyframePayload(NamedTuple):
    """Deferred-backend handoff for the Livox path (the spin path hands the
    FeatureClouds itself) — everything ``_on_keyframe_clouds`` needs."""

    surf: jnp.ndarray
    surf_mask: jnp.ndarray
    surf_refl: jnp.ndarray
    edge: jnp.ndarray
    edge_mask: jnp.ndarray
    full_pts: jnp.ndarray
    full_mask: jnp.ndarray


class LiliOmSystem:
    """End-to-end LiDAR-inertial SLAM engine (spinning-LiDAR variant wiring;
    the Livox variant swaps the feature extractor)."""

    def __init__(
        self,
        odo_cfg: OdometryConfig = OdometryConfig(),
        fusion_cfg: FusionConfig = FusionConfig(),
        feat_cfg: SpinFeatureConfig = SpinFeatureConfig(),
        livox_cfg: LivoxFeatureConfig = LivoxFeatureConfig(),
        lc_cfg: LoopClosureConfig = LoopClosureConfig(),
        noise: ImuNoise = ImuNoise(),
        graph_capacity: int = 512,
        q0=None,
        dtype=jnp.float32,
        mesh=None,
        use_split: bool | None = None,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` switches the backend to the
        map-sharded multi-chip fusion step (parallel/map_fusion.py) — the
        keyframe ring buffer and local map shard over the mesh, scaling map
        HBM and kNN work 1/n. Requires local_map_width and the map caps
        divisible by the mesh size.

        ``use_split``: route odometry/fusion through the split-dispatch
        programs (models/{odometry,fusion}.py:*_split) — the kNN launches
        run standalone, enabling the fused Pallas kernel on TPU without the
        embedded-custom-call compile blowup. Numerically identical to the
        single-program path (equivalence-tested); single-chip only.
        Default (None): on for the TPU backend, off elsewhere."""
        if mesh is not None:
            # the map-sharded path shards the keyframe ring across the mesh
            # and builds its match maps from the shards — the single-chip
            # incremental tables don't apply there. Pad the slot axis and
            # round the map caps so ANY shipped config (e.g. fr_iosb_rot's
            # M=50) runs on any mesh size: the pad slots stay permanently
            # invalid (logical map width unchanged), extra map-cap rows just
            # raise the overflow threshold.
            n = mesh.devices.size
            rnd = lambda x: -(-x // n) * n
            fusion_cfg = fusion_cfg._replace(
                incremental_map=False,
                map_slots_pad=(-fusion_cfg.local_map_width) % n,
                map_surf_cap=rnd(fusion_cfg.map_surf_cap),
                map_edge_cap=rnd(fusion_cfg.map_edge_cap),
            )
            if odo_cfg.query_cap % n:
                odo_cfg = odo_cfg._replace(query_cap=rnd(odo_cfg.query_cap))
        self.odo_cfg = odo_cfg
        self.fusion_cfg = fusion_cfg
        self.feat_cfg = feat_cfg
        self.livox_cfg = livox_cfg
        self.lc_cfg = lc_cfg
        self.noise = noise
        self.dtype = dtype
        self.odo_state = init_odo_state(odo_cfg, dtype=dtype)
        self.fusion_state = init_fusion_state(fusion_cfg, noise, q0=q0, dtype=dtype)
        if use_split is None:
            use_split = jax.default_backend() == "tpu"
        self.use_split = use_split and mesh is None
        self.mesh = mesh
        self._dist_warm = self._dist_main = None
        self._sharded_odo = None
        if mesh is not None:
            from ..parallel.map_fusion import make_map_sharded_system_step
            from ..parallel.sharded import make_sharded_odometry

            self._dist_warm, self._dist_main, st_sh = \
                make_map_sharded_system_step(mesh, fusion_cfg, noise)
            self.fusion_state = jax.device_put(self.fusion_state, st_sh)
            # query-sharded frontend: the mesh twin of the production
            # matching round (docs/SCALING.md — backend-only sharding caps
            # the pipeline speedup at ~1.3×)
            self._sharded_odo = make_sharded_odometry(mesh, self.odo_cfg)
        self.graph = init_graph(graph_capacity, dtype=dtype)
        # host-side keyframe archive (unbounded, numpy)
        self.kf_stamps: list[float] = []
        self.kf_clouds: list[np.ndarray] = []  # downsampled surf clouds, sensor frame
        self.kf_edge_clouds: list[np.ndarray] = []  # edge clouds, sensor frame
        # bounded-at-insert full clouds (the reference archives full_clouds /
        # full_clouds_ds per keyframe and builds /global_map from them,
        # BackendFusion.cpp:1497-1500, 2644-2685)
        self.kf_full_clouds: list[np.ndarray] = []
        self.full_cloud_leaf = 0.3  # mapping_ds (config_fr_iosb.yaml:35)
        # long-run archive bound (see spill_archives): set a directory to
        # spill keyframe clouds older than ``archive_keep_recent`` to disk
        self.archive_spill_dir: str | None = None
        self.archive_keep_recent: int = 256
        self._spill_marks: dict[str, int] = {}
        self.full_cloud_cap = 16384
        self.kf_positions: list[np.ndarray] = []
        self.n_frames = 0
        self.trajectory: list[np.ndarray] = []  # per-frame positions (diagnostic)
        self.last_loop_stamp = -1e9
        # host mirror of the loop-factor endpoint pairs (for same-pair
        # merging) + rejection counters (aliased-closure diagnostics)
        self._loop_pairs: list[tuple[int, int]] = []
        self.lc_rejects = {"no_candidate": 0, "fitness": 0, "max_correction": 0}
        # IMU buffer (the reference's imu_buf, BackendFusion.cpp:628-631):
        # callers push samples as they arrive; undistortion slices the scan
        # period, fusion slices the inter-keyframe interval
        self._imu_stamps = np.zeros((0,))
        self._imu_accs = np.zeros((0, 3))
        self._imu_gyrs = np.zeros((0, 3))
        self._last_kf_stamp: float | None = None
        self.scan_period = 0.1
        self.metrics = StageMetrics()
        # optional translation deskew from the constant-velocity motion
        # prior — an accuracy upgrade over the reference's gyro-only
        # undistortion (see ops.features_spin.undistort); off by default
        # for exact reference parity
        self.deskew_translation = False
        # the reference's ``if_to_deskew`` republish option
        # (lidar_odometry/if_to_deskew, config yaml:11 Livox / :19 ROT —
        # false in every shipped config): re-skew the clouds handed to the
        # backend by ``ratio·rel_trans`` (LidarOdometry.cpp:624-632, identity
        # quaternion — see _reskew). Distinct from ``deskew_translation``,
        # which translation-deskews the *frontend input* with the previous
        # frame's motion; enabling both double-counts the translation.
        self.if_to_deskew = False
        # physical bound on the constant-velocity sweep-deskew translation
        # (m per sweep; 1.0 = 10 m/s at 10 Hz). Unbounded deskew is a
        # positive-feedback runaway: one bad relative estimate warps the
        # next sweep consistently, which matches the consistently-smeared
        # local map at the same wrong velocity (measured: 11 m/s frontend
        # runaway on the 2000-frame loop demo).
        self.max_sweep_translation = 1.0
        self._last_rel_t = np.zeros(3)
        # hierarchical local pose graph (buildLocalPoseGraph): densified
        # every-frame poses between consecutive keyframes
        self.densify_frames = True
        self._starved_frames = 0
        self.dense_trajectory: list[tuple[float, np.ndarray, np.ndarray]] = []
        self._frame_stamps: list[float] = []
        self._prev_kf = None  # (stamp, t, q, v) of the previous keyframe
        self._kf_count_host = 0  # mirrors fusion_state.kf_count (no sync)
        # loop-closure pose corrections invalidate the incremental mature-map
        # tables (fusion.FusionConfig.incremental_map) — the next fusion step
        # then batch-rebuilds them from the ring
        self._maps_dirty = False
        # cadenced map assembly (publishCompleteMap thread @0.02 Hz,
        # BackendFusion.cpp:2687-2696): set ``map_callback`` to receive the
        # (N,3) global map every ``map_publish_period`` seconds of scan time
        self.map_callback = None
        self.map_publish_period = 50.0
        # keyframe stride of the assembled map (backend_fusion/
        # mapping_interval, BackendFusion.cpp:2472 — per-dataset: 2 in the
        # ROT fr_iosb yaml:31, 7 in the Livox one:30; the presets carry the
        # per-yaml value on SystemConfig.mapping_interval and the example
        # runners wire it here)
        self.mapping_interval = 2
        self._last_map_pub = None

    # ------------------------------------------------------------------
    # IMU stream
    # ------------------------------------------------------------------

    def set_initial_orientation(self, q0) -> bool:
        """Seed the first pose orientation from the IMU's orientation
        quaternion (w,x,y,z) — the reference initializes ``Rs[0]`` /
        ``abs_poses[0]`` from the first IMU message (imuHandler,
        BackendFusion.cpp:624-665). Without this, any non-level start
        misprojects gravity and the fusion window diverges. No-op once a
        keyframe exists; returns whether the seed was applied."""
        if self._kf_count_host > 0:
            return False
        q = np.asarray(q0, float).reshape(4)
        n = np.linalg.norm(q)
        if not np.isfinite(n) or n < 1e-6:
            return False
        q = jnp.asarray(q / n, self.dtype)
        W = self.fusion_cfg.window
        self.fusion_state = self.fusion_state._replace(q=jnp.tile(q, (W, 1)))
        return True

    # unconsumed-backlog bound: ~14 min at 200 Hz (2.2 MB). CONSUMED samples
    # are trimmed as keyframes integrate past them (_trim_imu) — the
    # reference pops imu_buf the same way (processIMU). A push-time cap of
    # the reference's 600 (or round-1's 4096) silently discarded everything
    # but the last ~20 s when a caller pushed a whole run's stream up front,
    # starving every early keyframe interval: an EMPTY preintegration's
    # factor pins consecutive poses together with enormous confidence, so
    # the backend froze at the origin until the retained window was reached
    # (measured: diag_backend woke at exactly t_end − 4096/200 Hz).
    IMU_BACKLOG_CAP = 1 << 18

    def push_imu(self, stamps, accs, gyrs):
        """Append IMU samples (monotone stamps). Push ahead of the scans they
        cover — the reference's 2-scan delay queue exists for the same reason
        (LiLi-OM/src/Preprocessing.cpp:196-207)."""
        self._imu_stamps = np.concatenate([self._imu_stamps, np.atleast_1d(stamps)])
        self._imu_accs = np.concatenate([self._imu_accs, np.atleast_2d(accs)])
        self._imu_gyrs = np.concatenate([self._imu_gyrs, np.atleast_2d(gyrs)])
        if len(self._imu_stamps) > self.IMU_BACKLOG_CAP:
            import warnings

            warnings.warn(
                f"IMU backlog {len(self._imu_stamps)} exceeds "
                f"{self.IMU_BACKLOG_CAP} samples — dropping oldest; early "
                "keyframe intervals will integrate no IMU")
            self._imu_stamps = self._imu_stamps[-self.IMU_BACKLOG_CAP:]
            self._imu_accs = self._imu_accs[-self.IMU_BACKLOG_CAP:]
            self._imu_gyrs = self._imu_gyrs[-self.IMU_BACKLOG_CAP:]

    def _trim_imu(self, before: float):
        """Drop consumed samples (stamp ≤ ``before``): every consumer —
        keyframe preintegration, scan undistortion, densification — only
        slices forward of the last processed keyframe."""
        n_drop = int(np.searchsorted(self._imu_stamps, before, side="right"))
        if n_drop > 0:
            self._imu_stamps = self._imu_stamps[n_drop:]
            self._imu_accs = self._imu_accs[n_drop:]
            self._imu_gyrs = self._imu_gyrs[n_drop:]

    def _imu_slice(self, t0: float, t1: float):
        """Samples with t0 < stamp ≤ t1, plus dts (first dt from t0)."""
        s = self._imu_stamps
        sel = (s > t0) & (s <= t1)
        idx = np.where(sel)[0]
        if len(idx) == 0:
            return None
        stamps = s[idx]
        prev = np.concatenate([[t0], stamps[:-1]])
        dts = stamps - prev
        return dts, self._imu_accs[idx], self._imu_gyrs[idx]

    # ------------------------------------------------------------------
    # per-scan path
    # ------------------------------------------------------------------

    def _gyro_slice_padded(self, stamp, cap: int = 64):
        """Fixed-capacity (dts, gyrs, mask) over the sweep [stamp,
        stamp+period] — constant shapes so the fused preprocess program
        compiles once (Preprocessing::processIMU semantics, :129-171)."""
        np_dtype = np.dtype(jnp.zeros(0, self.dtype).dtype.name)
        dts_np = np.zeros((cap,), np_dtype)
        gyrs_np = np.zeros((cap, 3), np_dtype)
        mask_np = np.zeros((cap,), bool)
        sl = self._imu_slice(stamp, stamp + self.scan_period)
        if sl is not None:
            dts, _, gyrs = sl
            n = min(len(dts), cap)
            dts_np[:n] = dts[:n]
            gyrs_np[:n] = gyrs[:n]
            mask_np[:n] = True
        return jnp.asarray(dts_np), jnp.asarray(gyrs_np), jnp.asarray(mask_np)

    def _undistort_with_buffer(self, flat_pts, rel_flat, stamp):
        """Gyro undistortion (+ optional translation deskew: p₀ = R₀ₛ·pₛ +
        s·t_rel — the sensor advanced by s·t_rel when the point was
        measured; −t_rel would double the distortion) for the Livox path."""
        dts, gyrs, imu_mask = self._gyro_slice_padded(stamp)
        q_scan = integrate_gyro(dts, gyrs, imu_mask)
        t_scan = (jnp.asarray(self._last_rel_t, self.dtype)
                  if self.deskew_translation else None)
        return undistort(flat_pts, rel_flat, q_scan, t_scan=t_scan)

    def process_scan(self, img, valid, rel_time, stamp: float,
                     defer_backend: bool = False):
        """One organized spinning-LiDAR sweep (R,C,3). IMU samples covering
        the sweep (and since the last keyframe) must already be pushed via
        :meth:`push_imu`. Returns the frontend output for this frame.

        ``defer_backend``: skip the inline backend call and return
        ``(out, fc_or_None)`` instead — the pipelined runner hands keyframes
        to :meth:`process_keyframe` on a separate worker so preprocessing of
        scan k+1 overlaps the backend of scan k (the reference's
        process-level parallelism, SURVEY.md §1)."""
        self.metrics.count_scan()
        img = jnp.asarray(img, self.dtype)
        rel_time = jnp.asarray(rel_time, self.dtype)
        with self.metrics.stage("preprocess"):
            dts, gyrs, imu_mask = self._gyro_slice_padded(stamp)
            t_scan = jnp.asarray(
                self._last_rel_t if self.deskew_translation else np.zeros(3),
                self.dtype)
            fcfg = (self.feat_cfg._replace(carry_rel_time=True)
                    if self.if_to_deskew else self.feat_cfg)
            fc = _preprocess_spin(img, jnp.asarray(valid), rel_time,
                                  dts, gyrs, imu_mask, t_scan,
                                  jnp.asarray(self.fusion_cfg.q_lb, self.dtype),
                                  fcfg)
        with self.metrics.stage("odometry"):
            # 8 bootstrap rounds for the first two frames (:500-504)
            rounds = self.odo_cfg.max_rounds if self.n_frames < 2 else self.odo_cfg.scan_match_cnt
            if self._sharded_odo is not None:
                self.odo_state, out = self._sharded_odo(
                    self.odo_state, fc.surf_pts, fc.surf_mask, n_rounds=rounds)
            else:
                step = odometry_step_split if self.use_split else odometry_step
                self.odo_state, out = step(
                    self.odo_state, fc.surf_pts, fc.surf_mask, self.odo_cfg,
                    n_rounds=rounds)
        self.n_frames += 1
        # ONE host transfer for everything this frame's control flow needs
        summary = np.asarray(jnp.concatenate([
            out.t, out.rel_t,
            jnp.stack([out.is_keyframe.astype(self.dtype),
                       out.n_corr.astype(self.dtype)]),
        ]))
        out = out._replace(is_keyframe=bool(summary[6] > 0.5))
        self.trajectory.append(summary[0:3])
        self._frame_stamps.append(stamp)
        if self.deskew_translation:
            rt = summary[3:6]
            nrm = float(np.linalg.norm(rt))
            if nrm > self.max_sweep_translation:  # see __init__ note
                rt = rt * (self.max_sweep_translation / nrm)
            self._last_rel_t = rt
        # feature-starvation watchdog: zero correspondences for several
        # consecutive frames means a mis-configured ring/column mapping (or a
        # degenerate scene) — the reference only prints "Not enough feature
        # points" (LidarOdometry.cpp:486); we make it persistent and loud
        if int(summary[7]) == 0 and self.n_frames > 2:
            self._starved_frames += 1
            if self._starved_frames in (3, 50, 500):
                import warnings

                warnings.warn(
                    f"no surf correspondences for {self._starved_frames} frames — "
                    "check n_cols/ring mapping and feature thresholds")
        else:
            self._starved_frames = 0

        if self.if_to_deskew and out.is_keyframe:
            # re-skew the clouds the backend consumes by this frame's
            # relative translation (publishCloudLast, LidarOdometry.cpp:
            # 624-632 — the reference republishes re-skewed feature clouds,
            # which BackendFusion then subscribes to)
            rt = jnp.asarray(summary[3:6], self.dtype)
            fc = fc._replace(
                surf_pts=_reskew(fc.surf_pts, fc.surf_rel_time, rt),
                edge_pts=_reskew(fc.edge_pts, fc.edge_rel_time, rt),
                full_pts=_reskew(fc.full_pts, fc.full_rel_time, rt))

        if defer_backend:
            return out, (fc if out.is_keyframe else None)
        if out.is_keyframe:
            with self.metrics.stage("backend"):
                self._on_keyframe(fc, stamp)
        self._maybe_publish_map(stamp)
        return out

    def process_keyframe(self, fc, stamp: float):
        """Backend half of a deferred keyframe (see ``defer_backend``) —
        accepts the spin path's FeatureClouds or the Livox path's
        LivoxKeyframePayload."""
        with self.metrics.stage("backend"):
            if isinstance(fc, LivoxKeyframePayload):
                self._on_keyframe_clouds(
                    fc.surf, fc.surf_mask, fc.surf_refl, fc.edge, fc.edge_mask,
                    stamp, full=(fc.full_pts, fc.full_mask))
            else:
                self._on_keyframe(fc, stamp)
        self._maybe_publish_map(stamp)

    def _maybe_publish_map(self, stamp: float):
        """Invoke ``map_callback`` with the assembled global map at the
        publish cadence (scan-time clock; 50 s default = the reference's
        0.02 Hz map thread, BackendFusion.cpp:2689)."""
        if self.map_callback is None:
            return
        if self._last_map_pub is None:
            self._last_map_pub = stamp
            return
        if stamp - self._last_map_pub >= self.map_publish_period:
            self._last_map_pub = stamp
            self.map_callback(self.build_global_map(
                interval=self.mapping_interval))

    def process_scan_livox(self, pts, line, ratio, refl, valid, stamp: float,
                           defer_backend: bool = False):
        """One Livox sweep as flat point arrays (N,·): xyz, line id 0..5,
        time ratio, reflectivity. Mirrors the FormatConvert → Preprocessing
        Livox path (curvature = 0.1·reflectivity, FormatConvert.cpp:19-21).

        ``defer_backend``: like :meth:`process_scan` — return
        ``(out, LivoxKeyframePayload_or_None)`` so the pipelined runner can
        overlap this path's backend too (the reference's process-level
        parallelism applies to both variants, SURVEY.md §1)."""
        self.metrics.count_scan()
        pts = jnp.asarray(pts, self.dtype)
        ratio = jnp.asarray(ratio, self.dtype)
        with self.metrics.stage("preprocess"):
            pts = self._undistort_with_buffer(pts, ratio, stamp)
            curv = 0.1 * jnp.asarray(refl, self.dtype)
            img, img_curv, img_valid = bin_livox_image(
                pts, jnp.asarray(line, jnp.int32), ratio,
                curv, jnp.asarray(valid), self.livox_cfg)
            lf = extract_features_livox(img, img_curv, img_valid, self.livox_cfg)
            # bound the surf set to the odometry capacity by voxel
            # downsampling; under if_to_deskew the per-point time rides as a
            # second averaged channel (PCL VoxelGrid averages intensity)
            feats = (jnp.stack([lf.surf_curv, lf.surf_rel_time], axis=1)
                     if self.if_to_deskew else lf.surf_curv[:, None])
            surf, surf_refl, surf_mask = voxel_downsample(
                lf.surf_pts, lf.surf_mask, 0.3, self.odo_cfg.scan_cap,
                feats=feats)
        with self.metrics.stage("odometry"):
            rounds = self.odo_cfg.max_rounds if self.n_frames < 2 else self.odo_cfg.scan_match_cnt
            if self._sharded_odo is not None:
                self.odo_state, out = self._sharded_odo(
                    self.odo_state, surf, surf_mask, n_rounds=rounds)
            else:
                step = odometry_step_split if self.use_split else odometry_step
                self.odo_state, out = step(self.odo_state, surf, surf_mask,
                                           self.odo_cfg, n_rounds=rounds)
        self.n_frames += 1
        # ONE host transfer for everything this frame's control flow needs
        # (the spin path's single-transfer trick — each extra sync is a ~30 ms
        # RPC on remote-attached runtimes)
        summary = np.asarray(jnp.concatenate([
            out.t, out.rel_t,
            jnp.stack([out.is_keyframe.astype(self.dtype),
                       out.n_corr.astype(self.dtype)]),
        ]))
        out = out._replace(is_keyframe=bool(summary[6] > 0.5))
        self.trajectory.append(summary[0:3])
        self._frame_stamps.append(stamp)
        if self.deskew_translation:
            rt = summary[3:6]
            nrm = float(np.linalg.norm(rt))
            if nrm > self.max_sweep_translation:  # see __init__ note
                rt = rt * (self.max_sweep_translation / nrm)
            self._last_rel_t = rt
        if int(summary[7]) == 0 and self.n_frames > 2:
            self._starved_frames += 1
            if self._starved_frames in (3, 50, 500):
                import warnings

                warnings.warn(
                    f"no surf correspondences for {self._starved_frames} frames — "
                    "check feature thresholds and scan binning")
        else:
            self._starved_frames = 0

        kf_clouds = None
        if out.is_keyframe:
            edge, edge_mask = pad_cloud(lf.edge_pts, lf.edge_mask,
                                        self.fusion_cfg.kf_edge_cap)
            full = pts
            surf_kf = surf
            if self.if_to_deskew:
                # republish re-skew (LidarOdometry.cpp:624-632) — see
                # process_scan; the Livox variant has the same option
                rt = jnp.asarray(summary[3:6], self.dtype)
                surf_kf = _reskew(surf, surf_refl[:, 1], rt)
                edge_rel, _ = pad_cloud(
                    jnp.broadcast_to(lf.edge_rel_time[:, None], (lf.edge_rel_time.shape[0], 3)),
                    lf.edge_mask, self.fusion_cfg.kf_edge_cap)
                edge = _reskew(edge, edge_rel[:, 0], rt)
                full = _reskew(pts, ratio, rt)
            kf_clouds = (surf_kf, surf_mask, surf_refl[:, 0], edge, edge_mask,
                         full, jnp.asarray(valid))

        if defer_backend:
            payload = (LivoxKeyframePayload(*kf_clouds)
                       if kf_clouds is not None else None)
            return out, payload
        if kf_clouds is not None:
            with self.metrics.stage("backend"):
                self._on_keyframe_clouds(*kf_clouds[:5], stamp,
                                         full=kf_clouds[5:])
        self._maybe_publish_map(stamp)
        return out

    def _on_keyframe(self, fc, stamp):
        self._on_keyframe_clouds(fc.surf_pts, fc.surf_mask,
                                 jnp.zeros_like(fc.surf_pts[:, 0]),
                                 fc.edge_pts, fc.edge_mask, stamp,
                                 full=(fc.full_pts, fc.full_mask))

    def _on_keyframe_clouds(self, sp, sm, s_refl, ep, em, stamp, full=None):
        # clouds pass at their native capacity; fusion_step voxel-downsamples
        # into its storage capacities at insert
        cfg = self.fusion_cfg
        if s_refl.shape[0] != sp.shape[0]:
            s_refl = jnp.zeros_like(sp[:, 0])
        cap = cfg.imu_cap
        # IMU interval since the last keyframe (saveKeyFramesAndFactors
        # consumes imu_buf up to the keyframe stamp, :1700-1771)
        if self._last_kf_stamp is None:
            # first keyframe: seed the midpoint chain with the sample at the
            # keyframe stamp (dt=0 no-op step that just sets acc0/gyr0)
            sl = None
            near = np.searchsorted(self._imu_stamps, stamp)
            if len(self._imu_stamps) > 0:
                j = min(max(near - 1, 0), len(self._imu_stamps) - 1)
                sl = (np.zeros(1), self._imu_accs[j:j + 1], self._imu_gyrs[j:j + 1])
        else:
            sl = self._imu_slice(self._last_kf_stamp, stamp)
        self._last_kf_stamp = stamp
        # batch assembly in numpy: one host→device transfer per array instead
        # of a chain of eager device ops (each eager op is an RPC round-trip
        # on remote-attached TPUs)
        np_dtype = np.dtype(jnp.zeros(0, self.dtype).dtype.name)
        dts_np = np.zeros((cap,), np_dtype)
        accs_np = np.zeros((cap, 3), np_dtype)
        gyrs_np = np.zeros((cap, 3), np_dtype)
        vmask_np = np.zeros((cap,), bool)
        if sl is not None:
            imu_dts, imu_accs, imu_gyrs = sl
            n = min(len(imu_dts), cap)
            dts_np[:n] = imu_dts[:n]
            accs_np[:n] = imu_accs[:n]
            gyrs_np[:n] = imu_gyrs[:n]
            vmask_np[:n] = True
        dts, accs, gyrs, vmask = (jnp.asarray(dts_np), jnp.asarray(accs_np),
                                  jnp.asarray(gyrs_np), jnp.asarray(vmask_np))

        warm = self._kf_count_host + 1 < cfg.window
        self._kf_count_host += 1
        rebuild = self._maps_dirty
        self._maps_dirty = False
        if self._dist_main is not None:
            fn = self._dist_warm if warm else self._dist_main
            self.fusion_state, fout = fn(self.fusion_state, sp, sm, s_refl,
                                         ep, em, dts, accs, gyrs, vmask)
        elif self.use_split and not warm:
            self.fusion_state, fout = fusion_step_split(
                self.fusion_state, sp, sm, s_refl, ep, em,
                dts, accs, gyrs, vmask, cfg, self.noise, rebuild=rebuild)
        else:
            self.fusion_state, fout = fusion_step(
                self.fusion_state, sp, sm, s_refl, ep, em,
                dts, accs, gyrs, vmask, cfg, self.noise, warmup=warm,
                rebuild=rebuild)

        self.last_fusion_out = fout  # device refs; diagnostics materialize on use
        self.graph = ensure_capacity(self.graph, len(self.kf_stamps) + 1)
        self.graph = add_node(self.graph, fout.t_latest, fout.q_latest)
        if self.densify_frames:
            self._densify_interval(stamp, fout)
        # keep device references — nothing on the per-keyframe hot path
        # forces a host round-trip; consumers materialize on demand
        self._prev_kf = (stamp, fout.t_latest, fout.q_latest, fout.v_latest)
        self.kf_stamps.append(stamp)
        self.kf_positions.append(fout.t_latest)
        # archive lazily: keep the DEVICE arrays (no transfer on the hot
        # path); materialize to numpy on first use (loop closure / export)
        self.kf_clouds.append((sp, sm))
        self.kf_edge_clouds.append((ep, em))
        # full cloud, voxel-bounded at insert (the reference's full_clouds_ds)
        if full is not None:
            fp, fm = voxel_downsample(full[0], full[1], self.full_cloud_leaf,
                                      self.full_cloud_cap)
            self.kf_full_clouds.append((fp, fm))
        else:
            self.kf_full_clouds.append((sp, sm))
        # consume the integrated samples (reference pops imu_buf the same
        # way); one scan period of margin for sweep-boundary undistortion
        self._trim_imu(stamp - self.scan_period)
        self.spill_archives()  # no-op unless archive_spill_dir is set

    def _kf_cloud_np(self, i: int, archive=None) -> np.ndarray:
        """Materialize archived keyframe cloud i (lazy device→host; spilled
        entries — see :meth:`spill_archives` — reload from disk). Concurrent
        calls race benignly on the VALUE (every representation materializes
        identically; list item assignment is atomic); with spilling enabled
        this method never writes the archive, so it cannot clobber a spill
        path after the spill watermark passed — the memory bound holds."""
        if archive is None:
            archive = self.kf_clouds
        c = archive[i]
        if isinstance(c, tuple):
            sp, sm = c
            c = np.asarray(sp)[np.asarray(sm)]
            if self.archive_spill_dir is None:
                archive[i] = c  # cache-in-place only when nothing spills
        elif isinstance(c, str):
            return np.load(c)  # spilled — do not re-cache (stay bounded)
        return c

    def spill_archives(self) -> int:
        """Bound host+device archive memory on long runs: move keyframe
        clouds older than ``archive_keep_recent`` to ``archive_spill_dir``
        as .npy files (device refs materialize + free HBM; host numpy
        frees RAM). No-op unless ``archive_spill_dir`` is set. Amortized
        O(1)/keyframe via per-archive watermarks; called automatically
        per keyframe when enabled. Returns the number of clouds spilled.

        The reference archives every keyframe's full cloud forever
        (full_clouds push_back, BackendFusion.cpp:1497-1500 — unbounded
        there too); this policy is the long-context bound the north star
        asks for: resident archive ≈ keep_recent · ~250 KB, independent
        of trajectory length. Loop closure & map export reload spilled
        entries transparently (`_kf_cloud_np`)."""
        if self.archive_spill_dir is None:
            return 0
        import os

        os.makedirs(self.archive_spill_dir, exist_ok=True)
        n_spilled = 0
        hi = len(self.kf_stamps) - self.archive_keep_recent
        for name, archive in (("surf", self.kf_clouds),
                              ("edge", self.kf_edge_clouds),
                              ("full", self.kf_full_clouds)):
            lo = self._spill_marks.get(name, 0)
            for i in range(lo, min(hi, len(archive))):
                c = archive[i]
                if not isinstance(c, str):
                    path = os.path.join(self.archive_spill_dir,
                                        f"{name}_{i:07d}.npy")
                    np.save(path, self._kf_cloud_np(i, archive))
                    archive[i] = path
                    n_spilled += 1
            self._spill_marks[name] = max(lo, min(hi, len(archive)))
        return n_spilled

    def _world_cloud_np(self, i: int, g_t, g_q, archive=None) -> np.ndarray:
        """Archived sensor-frame cloud i → world, applying the lidar→body
        extrinsic before the keyframe pose — the reference composes
        ``q_pose·q_bl`` (= pose ∘ extrinsic⁻¹) when assembling submaps and
        the global map (transformCloud calls at BackendFusion.cpp:2492-2494,
        2661-2672)."""
        c = self._kf_cloud_np(i, archive)
        if len(c) == 0:
            return c.reshape(0, 3)
        cfg = self.fusion_cfg
        # pure numpy: this runs per keyframe per submap per closure (and
        # over every keyframe in build_global_map) — each eager jnp op here
        # was a device RPC on remote-attached runtimes
        from ..utils.math import quat_conj_np, quat_rotate_np

        q_lb = np.asarray(cfg.q_lb, c.dtype)
        t_lb = np.asarray(cfg.t_lb, c.dtype)
        cb = quat_rotate_np(quat_conj_np(q_lb)[None, :], c - t_lb[None, :])
        return quat_rotate_np(np.broadcast_to(np.asarray(g_q[i], c.dtype),
                                              (cb.shape[0], 4)), cb) \
            + np.asarray(g_t[i], c.dtype)

    # ------------------------------------------------------------------
    # failure detection / elastic recovery (absent in the reference,
    # SURVEY.md §5 — its robustness is numeric gates only)
    # ------------------------------------------------------------------

    def health_check_and_recover(self) -> bool:
        """Detect a non-finite estimator state and elastically recover:
        re-seed the fusion window from the last finite keyframe pose while
        keeping the map history. Returns True when a recovery happened."""
        fs = self.fusion_state
        bad = not (np.all(np.isfinite(np.asarray(fs.t)))
                   and np.all(np.isfinite(np.asarray(fs.q)))
                   and np.all(np.isfinite(np.asarray(fs.v))))
        if not bad:
            return False
        # last finite keyframe pose from the host archive
        t_seed = np.zeros(3)
        q_seed = np.array([1.0, 0, 0, 0])
        for i in range(len(self.kf_positions) - 1, -1, -1):
            if np.all(np.isfinite(np.asarray(self.kf_positions[i]))):
                t_seed = np.asarray(self.kf_positions[i])
                q_seed = np.asarray(self.graph.q[i])
                break
        W = self.fusion_cfg.window
        qs = jnp.tile(jnp.asarray(q_seed, self.dtype), (W, 1))
        ts = jnp.tile(jnp.asarray(t_seed, self.dtype), (W, 1))
        self.fusion_state = fs._replace(
            t=ts, q=qs, v=jnp.zeros((W, 3), self.dtype),
            ba=jnp.zeros((W, 3), self.dtype), bg=jnp.zeros((W, 3), self.dtype),
            prior=fs.prior._replace(valid=jnp.zeros((), bool)),
            sb_anchor_on=jnp.ones((), bool),
        )
        return True

    def _densify_interval(self, stamp, fout, cap: int = 8):
        """Hierarchical local pose graph (buildLocalPoseGraph/
        optimizeLocalGraph, :1892-2175): IMU-propagate the non-keyframe
        frames between the previous and current keyframes, then chain-solve
        anchored at both (optimized) keyframe poses."""
        if self._prev_kf is None:
            self.dense_trajectory.append(
                (stamp, np.asarray(fout.t_latest), np.asarray(fout.q_latest)))
            return
        s0, t0, q0, v0 = self._prev_kf
        mids = [f for f in self._frame_stamps if s0 < f < stamp]
        if not mids:
            self.dense_trajectory.append(
                (stamp, np.asarray(fout.t_latest), np.asarray(fout.q_latest)))
            return
        from .local_graph import optimize_local_chain, propagate_interval

        sl = self._imu_slice(s0, stamp)
        if sl is None:
            return
        dts, accs, gyrs = sl
        icap = 64
        n = min(len(dts), icap)
        np_dtype = np.dtype(jnp.zeros(0, self.dtype).dtype.name)
        d = np.zeros((icap,), np_dtype); d[:n] = dts[:n]
        a = np.zeros((icap, 3), np_dtype); a[:n] = accs[:n]
        g = np.zeros((icap, 3), np_dtype); g[:n] = gyrs[:n]
        vm = np.zeros((icap,), bool); vm[:n] = True
        # sample index of each frame boundary within the IMU slice
        stamps_abs = s0 + np.cumsum(d)
        frames = (mids + [stamp])[:cap]
        fidx = np.minimum(np.searchsorted(stamps_abs[:n], np.asarray(frames)),
                          max(n - 1, 0)).astype(np.int32)
        fmask = np.zeros((cap,), bool); fmask[:len(frames)] = True
        fidx_a = np.zeros((cap,), np.int32); fidx_a[:len(frames)] = fidx
        t_init, q_init = propagate_interval(
            jnp.asarray(t0, self.dtype), jnp.asarray(q0, self.dtype),
            jnp.asarray(v0, self.dtype),
            jnp.asarray(d), jnp.asarray(a), jnp.asarray(g), jnp.asarray(vm),
            jnp.asarray(fidx_a), jnp.asarray(fmask), self.noise)
        chain = optimize_local_chain(
            t_init, q_init, jnp.asarray(fmask),
            jnp.asarray(t0, self.dtype), jnp.asarray(q0, self.dtype),
            fout.t_latest, fout.q_latest, n_iters=8)
        packed = np.asarray(jnp.concatenate(
            [chain.t.reshape(-1), chain.q.reshape(-1),
             fout.t_latest, fout.q_latest]))  # one transfer
        F = chain.t.shape[0]
        ct = packed[:3 * F].reshape(F, 3)
        cq = packed[3 * F:7 * F].reshape(F, 4)
        for i, f in enumerate(frames[:-1]):
            self.dense_trajectory.append((f, ct[i], cq[i]))
        self.dense_trajectory.append((stamp, packed[7 * F:7 * F + 3],
                                      packed[7 * F + 3:7 * F + 7]))

    # ------------------------------------------------------------------
    # loop-closure path (call at ~1 Hz, detectLoopClosure :2423-2550)
    # ------------------------------------------------------------------

    def try_loop_closure(self, lock=None) -> bool:
        """One detection + closure attempt (performLoopClosure,
        :2552-2642). Reference-parity semantics:

        * the closure anchors at the MATURE keyframe ``n − slide_window_width``
          — the pose that has exited the active optimization window
          (``latest_frame_idx_loop``, :2475; the radius search centers on the
          same published mature pose, ``select_pose`` ← ``last_pose``,
          :1839-1841 → :2437);
        * candidates are distance-ordered; the first with
          |t_kf − t_newest_odom| > ``time_thres`` wins (:2440-2447), with the
          Livox ``local_time_thres`` max-|Δt| fallback tier (:2449-2467);
        * ICP corrects the mature pose; the loop between-factor connects
          mature → candidate with fitness-scaled noise (:2588-2628).

        ``lock``: optional mutex protecting the shared estimator state. When
        given, it is held only for the short snapshot/update phases — the ICP
        alignment and the O(N) graph solve (the expensive parts; the
        reference's iSAM2 update is ms-scale *inside* its mutex, ours is not)
        run unlocked so the backend keeps fusing keyframes. Keyframes
        appended during the solve are re-chained by the correction delta of
        the last solved node before ``_correct_poses``.
        """
        import contextlib

        lc = self.lc_cfg
        held = (lambda: lock) if lock is not None else contextlib.nullcontext

        # ---- phase 1a (locked, O(1)): snapshot refs only. The graph arrays
        # are immutable jax values and the keyframe archives are append-only
        # (fully populated for indices < n before kf_stamps grows under the
        # backend's lock), so candidate detection AND the submap
        # materialize/downsample — device→host transfers + host voxel grids
        # over ~50 keyframe clouds — run off-lock on the snapshot (VERDICT
        # r4 task 5; previously the submap build held the mutex). ----
        with held():
            with self.metrics.stage("lc_inlock"):
                n = len(self.kf_stamps)
                W = self.fusion_cfg.window
                mature = n - W  # latest_frame_idx_loop (:2475)
                if not lc.enabled or mature < 1:
                    return False
                stamps = np.asarray(self.kf_stamps)
                newest_stamp = float(stamps[-1])  # time_new_odom
                # re-fire gate (ROT :2259): previous closure's MATURE stamp
                if abs(self.last_loop_stamp - newest_stamp) < lc.debounce:
                    return False
                graph_snap = self.graph

        # ---- phase 1b (unlocked): candidate detection + submap build ----
        # graph poses are the authoritative (corrected) keyframe poses
        # (whole-array fetch with overlapped copies — device slices would
        # add a dispatch + a second RTT per leaf)
        for a in (graph_snap.t, graph_snap.q):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        g_t = np.asarray(graph_snap.t)[:n]
        g_q = np.asarray(graph_snap.q)[:n]
        d = np.linalg.norm(g_t - g_t[mature], axis=1)
        dt_all = np.abs(newest_stamp - stamps)
        in_r = np.where(d < lc.search_radius)[0]
        order = in_r[np.argsort(d[in_r])]  # radiusSearch: ascending dist
        old_enough = order[dt_all[order] > lc.time_thres]
        if len(old_enough):
            his = int(old_enough[0])  # nearest sufficiently-old (:2443)
        elif lc.local_time_thres is not None:
            band = order[(dt_all[order] > lc.local_time_thres)
                         & (dt_all[order] < lc.time_thres)]
            if len(band) == 0:
                self.lc_rejects["no_candidate"] += 1
                return False
            his = int(band[np.argmax(dt_all[band])])  # max Δt (:2457-2463)
        else:
            self.lc_rejects["no_candidate"] += 1
            return False

        # latest submap: [mature−latest_width+1, mature] (:2477, ROT :2266)
        src = self._submap(mature - lc.latest_width + 1, mature, g_t, g_q)
        # history: [his−map_width, his+map_width] capped at the mature
        # index (:2502-2505 skips j > latest_frame_idx_loop)
        tgt = self._submap(his - lc.map_width,
                           min(his + lc.map_width, mature), g_t, g_q)

        # ---- phase 2 (unlocked): ICP alignment on the snapshots ----
        if src[0].shape[0] == 0 or tgt[0].shape[0] == 0 \
                or not bool(np.asarray(src[1]).any()) \
                or not bool(np.asarray(tgt[1]).any()):
            return False
        res = icp_point_to_plane(
            src[0], src[1], tgt[0], tgt[1],
            jnp.zeros(3, self.dtype), jnp.array([1.0, 0, 0, 0], self.dtype),
            n_iters=lc.icp_iters, trim=lc.icp_trim)
        if not np.isfinite(float(res.fitness)) or float(res.fitness) > lc.icp_thres:
            self.lc_rejects["fitness"] += 1
            return False

        # corrected mature pose = ΔT_icp ∘ T_mature (:2588-2599)
        t_mat = jnp.asarray(g_t[mature], self.dtype)
        q_mat = jnp.asarray(g_q[mature], self.dtype)
        t_corr = quat_rotate(res.q, t_mat) + res.t
        q_corr = quat_normalize(quat_mul(res.q, q_mat))
        # plausibility gate (see LoopClosureConfig.max_correction);
        # explicit 0.0 disables, None means auto
        max_corr = (2.0 * lc.search_radius if lc.max_correction is None
                    else lc.max_correction)
        corr_norm = float(np.linalg.norm(np.asarray(t_corr) - g_t[mature]))
        if max_corr > 0.0 and corr_norm > max_corr:
            self.lc_rejects["max_correction"] += 1
            import warnings

            warnings.warn(
                f"loop candidate {mature}->{his} rejected: ICP correction "
                f"{corr_norm:.2f} m exceeds max_correction {max_corr:.2f} m "
                f"(fitness {float(res.fitness):.3f} — likely aliased)")
            return False
        # measured relative pose mature→his from the corrected mature pose
        rel_t, rel_q = pose_relative(t_corr, q_corr,
                                     jnp.asarray(g_t[his], self.dtype),
                                     jnp.asarray(g_q[his], self.dtype))

        # ---- phase 3 (locked): record the factor, snapshot the graph ----
        with held():
            with self.metrics.stage("lc_inlock"):
                n0 = len(self.kf_stamps)
                self._record_loop(mature, his, rel_t, rel_q, res.fitness)
                snapshot = self.graph
                pairs = list(self._loop_pairs)

        # ---- phase 4 (unlocked): incremental-fast solve — affected-suffix
        # restriction + step-norm early exit gives iSAM2-scale per-closure
        # cost (pose_graph.py:solve_graph_incremental); the dense (6N)²
        # program would not survive a full-length sequence. Pure function of
        # the snapshot; the backend keeps appending nodes meanwhile. ----
        with self.metrics.stage("graph_solve"):
            if lc.graph_suffix:
                solved_t, solved_q = solve_graph_incremental(
                    snapshot, n0, pairs, n_iters=lc.graph_iters,
                    tol=lc.graph_tol)
            else:
                solved = optimize_graph_chain(snapshot, n_iters=lc.graph_iters,
                                              tol=lc.graph_tol)
                solved_t = np.asarray(solved.t[:n0])  # forces completion
                solved_q = np.asarray(solved.q[:n0])

        # ---- phase 5 (locked): apply + correct ----
        with held():
            with self.metrics.stage("lc_inlock"):
                self._apply_solved_graph(solved_t, solved_q, n0)
                self._correct_poses()
                self.last_loop_stamp = float(stamps[mature])  # ROT :2403
        return True

    def _record_loop(self, i: int, j: int, rel_t, rel_q, fitness):
        """Add or same-pair-replace a loop factor (see
        LoopClosureConfig.merge_width) — the factor count stays
        O(distinct revisited places), which bounds the chain+Woodbury
        solve's 6L-dim Woodbury system on multi-lap runs."""
        slot = self._find_mergeable_loop(i, j)
        if slot is None:
            self.graph = ensure_capacity(self.graph, len(self.kf_stamps),
                                         int(self.graph.n_loops) + 1)
            self._loop_pairs.append((i, j))
            self.graph = add_loop(self.graph, i, j, rel_t, rel_q, fitness)
        else:
            self.graph = set_loop(self.graph, slot, i, j, rel_t, rel_q,
                                  fitness)
            self._loop_pairs[slot] = (i, j)

    def _find_mergeable_loop(self, i: int, j: int):
        """Slot of an existing loop factor whose endpoints both lie within
        ``merge_width`` keyframes of (i, j), else None (see
        LoopClosureConfig.merge_width)."""
        w = self.lc_cfg.merge_width
        if w <= 0:
            return None
        for slot, (pi, pj) in enumerate(self._loop_pairs):
            if abs(pi - i) <= w and abs(pj - j) <= w:
                return slot
        return None

    def _apply_solved_graph(self, solved_t, solved_q, n0: int):
        """Write the solved poses for nodes [0, n0) back into the live graph;
        nodes appended while the solve ran (the unlocked phase 4) are
        re-chained by the left correction delta of the last solved node —
        they were added relative to its pre-solve pose (correctPoses applies
        the same relative re-chaining to the active window, :2211-2307)."""
        from ..utils.math import (quat_conj_np, quat_mul_np,
                                  quat_normalize_np, quat_rotate_np)

        g = self.graph
        n = len(self.kf_stamps)
        # overlap the two device→host copies (this runs UNDER the backend
        # mutex — each blocking transfer is a tunnel RTT; see
        # pose_graph._prefetch_graph)
        for a in (g.t, g.q):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        new_t = np.array(g.t)
        new_q = np.array(g.q)
        if n > n0:
            t_old = np.asarray(new_t[n0 - 1])
            q_old = np.asarray(new_q[n0 - 1])
            dq = quat_normalize_np(quat_mul_np(
                solved_q[n0 - 1][None], quat_conj_np(q_old[None])))
            dt = solved_t[n0 - 1] - quat_rotate_np(dq, t_old[None])[0]
            tail_q = np.broadcast_to(dq, (n - n0, 4))
            new_t[n0:n] = quat_rotate_np(tail_q, new_t[n0:n]) + dt
            new_q[n0:n] = quat_normalize_np(quat_mul_np(tail_q, new_q[n0:n]))
        new_t[:n0] = solved_t
        new_q[:n0] = solved_q
        self.graph = g._replace(t=jnp.asarray(new_t, self.dtype),
                                q=jnp.asarray(new_q, self.dtype))

    def _submap(self, lo: int, hi: int, g_t, g_q):
        """World-frame downsampled submap of keyframes [lo, hi] (inclusive):
        surf + edge features, like the reference's latest/history loop
        submaps (build…KeyFrames, :2474-2548 adds both edge_frames and
        surf_frames)."""
        lo = max(0, lo)
        hi = min(len(self.kf_clouds), hi + 1)
        pts = []
        for i in range(lo, hi):
            for archive in (self.kf_clouds, self.kf_edge_clouds):
                if i >= len(archive):
                    continue  # archives populated out-of-band (tests, tools)
                w = self._world_cloud_np(i, g_t, g_q, archive)
                if len(w):
                    pts.append(w)
        if not pts:
            return np.zeros((0, 3)), np.zeros((0,), bool)
        # host-side exact downsample: the device kernel's capacity overflow
        # drops voxels in KEY order — a spatially contiguous chunk of the
        # room vanishes from the submap and ICP fitness explodes on the
        # uncovered region (measured: fitness 10 m² on a full-overlap
        # revisit). Over capacity, decimate by stride over the key-sorted
        # voxel list instead — uniform over the whole extent.
        cap = self.lc_cfg.submap_cap
        ds = voxel_downsample_np(np.concatenate(pts), self.lc_cfg.submap_leaf)
        if len(ds) > cap:
            ds = ds[:: -(-len(ds) // cap)][:cap]
        out = np.zeros((cap, 3), np.asarray(ds).dtype)
        out[: len(ds)] = ds
        out_mask = np.zeros((cap,), bool)
        out_mask[: len(ds)] = True
        return jnp.asarray(out, self.dtype), jnp.asarray(out_mask)

    # ------------------------------------------------------------------
    # map export (publishCompleteMap :2644-2685 + save_pcd :2697-2722)
    # ------------------------------------------------------------------

    def build_global_map(self, leaf: float = 0.3, cap: int | None = None,
                         interval: int = 1, features_only: bool = False) -> np.ndarray:
        """Assemble the global map: every archived keyframe **full cloud**
        transformed by its (loop-corrected) graph pose ∘ lidar extrinsic,
        voxel-downsampled at ``leaf`` (publishCompleteMap builds /global_map
        from ``full_clouds`` at mapping_interval, BackendFusion.cpp:2644-2685;
        mapping_ds=0.3, config_fr_iosb.yaml:35). The downsample runs host-side
        with unbounded-extent keys (trajectories can span kilometres — far
        past the device kernel's axis budget). Returns (N,3) numpy.

        ``features_only``: use the sparse surf archive instead (the round-1
        behavior; much sparser, kept for diagnostics). ``cap``: optional
        random subsample of the result."""
        archive = self.kf_full_clouds
        if features_only or len(archive) < len(self.kf_clouds):
            archive = self.kf_clouds  # archives populated out-of-band
        n = len(archive)
        if n == 0:
            return np.zeros((0, 3))
        g_t = np.asarray(self.graph.t[:n])
        g_q = np.asarray(self.graph.q[:n])
        parts = [w for i in range(0, n, max(interval, 1))
                 if len(w := self._world_cloud_np(i, g_t, g_q, archive))]
        if not parts:
            return np.zeros((0, 3))
        from ..ops.voxel import voxel_downsample_np

        out = voxel_downsample_np(np.concatenate(parts), leaf)
        if cap is not None and len(out) > cap:
            sel = np.random.default_rng(0).choice(len(out), cap, replace=False)
            out = out[np.sort(sel)]
        return out

    def export_map(self, path: str, leaf: float = 0.3) -> int:
        """Write the global map as a binary PCD (the reference hardcodes its
        output path, BackendFusion.cpp:2718 — here it's an argument).
        Uses the native C++ writer when available. Returns point count."""
        pts = self.build_global_map(leaf=leaf)
        try:
            from ..runtime import native

            if native.available() and native.pcd_write_native(path, pts):
                return len(pts)
        except Exception:
            pass
        from ..io.pcd import write_pcd

        write_pcd(path, pts)
        return len(pts)

    def _correct_poses(self):
        """correctPoses (:2177-2311): rewrite keyframe poses from the graph,
        update the fusion ring buffer + window, drop the marginalization
        prior (marg=false → speed-bias re-priors next solve)."""
        n = len(self.kf_stamps)
        fs = self.fusion_state
        # overlap the device→host copies this in-lock phase needs (each
        # blocking transfer is a tunnel RTT; see pose_graph._prefetch_graph)
        for a in (self.graph.t, self.graph.q, fs.hist_t, fs.hist_q,
                  fs.t, fs.q):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        g_t = np.asarray(self.graph.t)[:n]
        g_q = np.asarray(self.graph.q)[:n]
        self.kf_positions = [g_t[i] for i in range(n)]
        if self._prev_kf is not None:
            pass  # updated below with graph-corrected values

        cfg = self.fusion_cfg
        M = cfg.local_map_width
        W = cfg.window
        # ring slots of the last min(n, M) keyframes
        wi = int(fs.write_idx)
        hist_t = np.array(fs.hist_t)  # writable copies
        hist_q = np.array(fs.hist_q)
        for j in range(min(n, M)):
            kf_id = n - 1 - j
            slot = (wi - 1 - j) % M
            hist_t[slot] = g_t[kf_id]
            hist_q[slot] = g_q[kf_id]
        win_t = np.array(fs.t)
        win_q = np.array(fs.q)
        for j in range(min(n, W)):
            win_t[W - 1 - j] = g_t[n - 1 - j]
            win_q[W - 1 - j] = g_q[n - 1 - j]

        self.fusion_state = fs._replace(
            t=jnp.asarray(win_t, self.dtype), q=jnp.asarray(win_q, self.dtype),
            hist_t=jnp.asarray(hist_t, self.dtype), hist_q=jnp.asarray(hist_q, self.dtype),
            prior=fs.prior._replace(valid=jnp.zeros((), bool)),  # drop prior (:2635-2638)
            sb_anchor_on=jnp.ones((), bool),  # marg=false (:2309)
        )
        # mature keyframe poses moved — the incremental map tables are stale
        self._maps_dirty = True
        if self._prev_kf is not None:
            i = len(self.kf_stamps) - 1
            self._prev_kf = (self._prev_kf[0], g_t[i], g_q[i], self._prev_kf[3])

        # re-chain the densified every-frame poses by each interval's
        # keyframe correction (correctPoses rewrites pose_each_frame from
        # the updated estimate, :2211-2307). Fully vectorized in NUMPY —
        # per-frame eager jnp quat ops are one device RPC each on
        # remote-attached runtimes (measured ~25 s per correction at ~900
        # dense frames through the tunnel).
        if self.dense_trajectory:
            from ..utils.math import (quat_conj_np, quat_mul_np,
                                      quat_normalize_np, quat_rotate_np)

            kf_stamps = np.asarray(self.kf_stamps)
            stamps = np.array([s for s, _, _ in self.dense_trajectory])
            tts = np.stack([np.asarray(t) for _, t, _ in self.dense_trajectory])
            qqs = np.stack([np.asarray(q) for _, _, q in self.dense_trajectory])
            # each keyframe's OLD pose = its own entry in the dense set
            at_kf = np.abs(stamps[:, None] - kf_stamps[None, :]) < 1e-9  # (F,n)
            kf_dense_row = np.argmax(at_kf, axis=0)  # dense row of kf j
            kf_has_old = np.any(at_kf, axis=0)  # (n,)
            t_old = tts[kf_dense_row]  # (n,3)
            q_old = qqs[kf_dense_row]
            # ΔT_j = T_new_j ∘ T_old_j⁻¹ (left correction), per keyframe
            dq = quat_normalize_np(quat_mul_np(g_q, quat_conj_np(q_old)))
            dtc = g_t - quat_rotate_np(dq, t_old)
            # owning keyframe = previous keyframe at or before each frame
            j = np.clip(np.searchsorted(kf_stamps, stamps + 1e-9) - 1, 0, n - 1)
            apply = kf_has_old[j]  # frames whose owner has an old pose
            dq_f = np.where(apply[:, None], dq[j], [1.0, 0, 0, 0])
            dtc_f = np.where(apply[:, None], dtc[j], 0.0)
            tts = quat_rotate_np(dq_f, tts) + dtc_f
            qqs = quat_normalize_np(quat_mul_np(dq_f, qqs))
            self.dense_trajectory = [(float(s), tts[i], qqs[i])
                                     for i, s in enumerate(stamps)]
