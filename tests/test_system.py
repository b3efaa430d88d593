"""Full-system orchestrator wiring + loop-closure machinery."""
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.fusion import FusionConfig
from lili_om_tpu.models.odometry import OdometryConfig
from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig
from lili_om_tpu.ops.features_spin import SpinFeatureConfig
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
from lili_om_tpu.sim.world import make_room_world
from lili_om_tpu.utils.math import exp_so3

R, C = 16, 720
PERIOD = 0.1


def make_system(**lc_kwargs):
    return LiliOmSystem(
        odo_cfg=OdometryConfig(n_recent_frames=6, scan_cap=2048, query_cap=512, map_cap=8192),
        fusion_cfg=FusionConfig(window=3, local_map_width=6, kf_surf_cap=2048,
                                kf_edge_cap=1024, map_surf_cap=8192, map_edge_cap=1024,
                                use_reflectivity=False, weight_gate=0.3,
                                lidar_const=7.5, max_num_iter=3, imu_cap=64),
        feat_cfg=SpinFeatureConfig(surf_cap=2048),
        lc_cfg=LoopClosureConfig(**lc_kwargs),
        graph_capacity=64,
        dtype=jnp.float64,
    )


@pytest.fixture(scope="module")
def short_run():
    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)
    t0w, q0w = pose_at(traj, 0.0)
    sys_ = make_system()
    sys_.fusion_state = sys_.fusion_state._replace(
        q=jnp.tile(jnp.asarray(q0w, jnp.float64), (3, 1)))
    # stream the IMU for the whole run up front (200 Hz)
    imu = simulate_imu(traj, 0.0, 9 * PERIOD + PERIOD, rate=200.0)
    sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs), np.asarray(imu.gyrs))
    gts = []
    for k in range(9):
        ts = k * PERIOD
        scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
        sys_.process_scan(
            scan.pts.reshape(R, C, 3), scan.valid.reshape(R, C),
            scan.rel_time.reshape(R, C), ts)
        from lili_om_tpu.utils.math import pose_relative

        tg, qg = pose_at(traj, ts)
        # odometry's world frame is the first body pose
        rt, _ = pose_relative(t0w, q0w, tg, qg)
        gts.append(np.asarray(rt))
    return sys_, gts


class TestSystemWiring:
    def test_frames_and_keyframes_flow(self, short_run):
        sys_, _ = short_run
        assert sys_.n_frames == 9
        assert 3 <= len(sys_.kf_stamps) <= 9
        assert int(sys_.graph.n_nodes) == len(sys_.kf_stamps)

    def test_trajectory_tracks_ground_truth(self, short_run):
        # wiring-level sanity: drift bound is loose — the small capacities
        # used here trade accuracy for CI speed; accuracy itself is asserted
        # by test_odometry/test_fusion at realistic capacities
        sys_, gts = short_run
        err = [np.linalg.norm(t - g) for t, g in zip(sys_.trajectory, gts)]
        assert np.sqrt(np.mean(np.square(err))) < 0.3, err

    def test_archive_consistency(self, short_run):
        sys_, _ = short_run
        assert len(sys_.kf_clouds) == len(sys_.kf_stamps) == len(sys_.kf_positions)
        # archives are lazy (device refs) until first use
        for i in range(len(sys_.kf_clouds)):
            c = sys_._kf_cloud_np(i)
            assert c.ndim == 2 and c.shape[1] == 3 and len(c) > 0

    def test_no_loop_closure_on_short_run(self, short_run):
        sys_, _ = short_run
        assert not sys_.try_loop_closure()  # time gate (25 s) can't pass
        assert int(sys_.graph.n_loops) == 0


class TestSplitWiring:
    def test_use_split_system_matches_monolith(self):
        """LiliOmSystem(use_split=True) — the TPU default wiring — must
        reproduce the single-program trajectory (here forced on CPU, where
        knn_auto stays on the XLA path, so this isolates the system-level
        split wiring from the Pallas kernel)."""
        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        imu = simulate_imu(traj, 0.0, 8 * PERIOD + PERIOD, rate=200.0)
        trajs = []
        for use_split in (False, True):
            sys_ = make_system()
            sys_.use_split = use_split
            sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                          np.asarray(imu.gyrs))
            for k in range(8):
                ts = k * PERIOD
                scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
                sys_.process_scan(scan.pts.reshape(R, C, 3),
                                  scan.valid.reshape(R, C),
                                  scan.rel_time.reshape(R, C), ts)
            trajs.append(np.asarray(sys_.trajectory))
        np.testing.assert_allclose(trajs[0], trajs[1], atol=1e-9)


class TestLivoxPipeline:
    def test_livox_end_to_end(self):
        """Livox variant: rosette scans → eigen-patch features → odometry →
        fusion keyframes. Slow circular motion in the room world."""
        from lili_om_tpu.ops.features_livox import LivoxFeatureConfig
        from lili_om_tpu.sim.lidar import livox_pattern
        from lili_om_tpu.sim.trajectory import circle_trajectory as circ

        world = make_room_world()
        traj = circ(radius=8.0, period=40.0)
        pattern = livox_pattern(pts_per_line=2000)
        sys_ = make_system()
        sys_.livox_cfg = LivoxFeatureConfig(n_cols=2000)
        imu = simulate_imu(traj, 0.0, 0.8, rate=200.0)
        sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs), np.asarray(imu.gyrs))
        t0w, q0w = pose_at(traj, 0.0)
        errs = []
        for k in range(6):
            ts = k * PERIOD
            scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
            out = sys_.process_scan_livox(
                scan.pts, scan.line, scan.rel_time, scan.reflectivity,
                scan.valid, ts)
            from lili_om_tpu.utils.math import pose_relative

            tg, qg = pose_at(traj, ts)
            rt, _ = pose_relative(t0w, q0w, tg, qg)
            errs.append(float(np.linalg.norm(np.asarray(out.t) - np.asarray(rt))))
        assert len(sys_.kf_stamps) >= 2
        assert np.sqrt(np.mean(np.square(errs))) < 0.15, errs


class TestLoopClosure:
    def test_detect_align_correct(self):
        """Handcrafted revisit: keyframe clouds from a real room scan; the
        last keyframe revisits the first with a small pose drift. The loop
        must be detected, ICP-aligned, and the graph corrected."""
        world = make_room_world()
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        from lili_om_tpu.sim.trajectory import static_trajectory

        scan = simulate_scan(world, static_trajectory((0.0, 0.0, 1.0)), 0.0,
                             pattern, period=PERIOD)
        pts = np.asarray(scan.pts[np.asarray(scan.valid)])
        # subsample to keep ICP small
        pts = pts[:: max(1, len(pts) // 4000)]

        sys_ = make_system(time_thres=5.0, search_radius=5.0, icp_thres=0.2,
                           map_width=2, latest_width=1)
        from lili_om_tpu.models.pose_graph import add_node

        qid = jnp.array([1.0, 0, 0, 0.0])
        # kf0 at origin with the real cloud. The closure anchors at the
        # MATURE keyframe n − slide_window_width (BackendFusion.cpp:2475) —
        # the drifted revisit sits at index 4 = 7 − 3, with two newer
        # keyframes still inside the active window.
        drift = np.array([0.35, -0.2, 0.1])
        poses = [
            (np.zeros(3), qid),  # kf 0
            (np.array([20.0, 0, 0]), qid),  # far away
            (np.array([20.0, 20.0, 0]), qid),
            (np.array([0.0, 20.0, 0]), qid),
            (drift, qid),  # revisit of kf0, drifted — the MATURE keyframe
            (drift + np.array([0.5, 0.0, 0.0]), qid),  # window keyframes
            (drift + np.array([1.0, 0.0, 0.0]), qid),
        ]
        stamps = [0.0, 3.0, 6.0, 9.0, 12.0, 13.0, 14.0]
        for (t, q), s in zip(poses, stamps):
            sys_.graph = add_node(sys_.graph, jnp.asarray(t, jnp.float64), q)
            sys_.kf_stamps.append(s)
            sys_.kf_positions.append(np.asarray(t, np.float64))
            sys_.kf_clouds.append(pts.astype(np.float64))

        fired = sys_.try_loop_closure()
        assert fired
        assert int(sys_.graph.n_loops) == 1
        # the drifted node must have moved back toward the true revisit pose
        # (cloud identical ⇒ true pose of kf4 = kf0 = origin)
        t4 = np.asarray(sys_.graph.t[4])
        assert np.linalg.norm(t4) < 0.6 * np.linalg.norm(drift), t4
        # marginalization prior dropped (marg=false semantics)
        assert not bool(sys_.fusion_state.prior.valid)
        assert bool(sys_.fusion_state.sb_anchor_on)


class TestDenseTrajectory:
    def test_densified_frames_cover_all(self, short_run):
        """The hierarchical local graph produces a pose for every frame up to
        the last keyframe (buildLocalPoseGraph coverage)."""
        sys_, _ = short_run
        assert len(sys_.dense_trajectory) >= len(sys_.kf_stamps)
        stamps = [s for s, _, _ in sys_.dense_trajectory]
        assert stamps == sorted(stamps)
        # keyframe entries carry the fusion-optimized poses
        kf_entries = {round(s, 6): t for s, t, _ in sys_.dense_trajectory}
        for i, ks in enumerate(sys_.kf_stamps):
            assert round(ks, 6) in kf_entries
        # densified intermediates stay near the frontend trajectory (loose)
        for s, t, q in sys_.dense_trajectory:
            k = int(round(s / PERIOD))
            if k < len(sys_.trajectory):
                assert np.linalg.norm(t - sys_.trajectory[k]) < 1.0


class TestElasticRecovery:
    def test_nan_state_recovers(self):
        """Inject NaN into the fusion window; the watchdog must re-seed from
        the last finite keyframe and drop the (poisoned) prior."""
        sys_ = make_system()
        assert not sys_.health_check_and_recover()  # healthy state: no-op
        from lili_om_tpu.models.pose_graph import add_node

        sys_.graph = add_node(sys_.graph, jnp.array([1.0, 2.0, 0.0]),
                              jnp.array([1.0, 0, 0, 0.0]))
        sys_.kf_positions.append(np.array([1.0, 2.0, 0.0]))
        sys_.kf_stamps.append(0.0)
        fs = sys_.fusion_state
        sys_.fusion_state = fs._replace(t=fs.t.at[1, 0].set(jnp.nan))
        assert sys_.health_check_and_recover()
        fs2 = sys_.fusion_state
        assert np.all(np.isfinite(np.asarray(fs2.t)))
        np.testing.assert_allclose(np.asarray(fs2.t[0]), [1.0, 2.0, 0.0])
        assert not bool(fs2.prior.valid)


class TestImuBuffer:
    def test_bulk_push_ahead_is_not_truncated(self):
        """Regression: a push-time cap (round-1: newest 4096 samples)
        silently discarded all but the last ~20 s when a caller pushed a
        whole run's IMU stream up front — every early keyframe interval got
        an EMPTY slice, and an empty preintegration's factor pins
        consecutive poses together with enormous confidence (the backend
        froze at the origin until the retained window was reached).
        Consumption now trims the buffer as keyframes integrate past it."""
        sys_ = make_system()
        t = np.arange(0, 30.0, 0.005)  # 6000 samples, 30 s at 200 Hz
        sys_.push_imu(t, np.zeros((len(t), 3)), np.zeros((len(t), 3)))
        assert sys_._imu_slice(0.1, 0.2) is not None  # old cap dropped these
        assert sys_._imu_slice(25.0, 25.1) is not None
        # consumption trimming: keyframe at t=1.0 drops integrated samples
        sys_._trim_imu(1.0)
        assert sys_._imu_slice(0.1, 0.2) is None
        assert sys_._imu_slice(1.0, 1.1) is not None
