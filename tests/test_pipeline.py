"""Async pipeline runner: threaded feeds, bounded-queue drops, mutex
discipline with the loop-closure thread."""
import time

import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.fusion import FusionConfig
from lili_om_tpu.models.odometry import OdometryConfig
from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig
from lili_om_tpu.ops.features_livox import LivoxFeatureConfig
from lili_om_tpu.ops.features_spin import SpinFeatureConfig
from lili_om_tpu.runtime.pipeline import PipelineRunner
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
from lili_om_tpu.sim.world import make_room_world

R, C, PERIOD = 16, 360, 0.1


def tiny_system():
    return LiliOmSystem(
        odo_cfg=OdometryConfig(n_recent_frames=4, scan_cap=1024, query_cap=256, map_cap=2048),
        fusion_cfg=FusionConfig(window=3, local_map_width=4, kf_surf_cap=1024,
                                kf_edge_cap=256, map_surf_cap=2048, map_edge_cap=512,
                                use_reflectivity=False, max_num_iter=2, imu_cap=32),
        feat_cfg=SpinFeatureConfig(surf_cap=1024),
        # density-matched Livox binning for the 400-pt/line sim (see
        # LivoxFeatureConfig.n_cols — the default 4000 starves the extractor)
        livox_cfg=LivoxFeatureConfig(n_cols=400),
        lc_cfg=LoopClosureConfig(enabled=True, time_thres=1e9),  # detection runs, never fires
        graph_capacity=32, dtype=jnp.float64,
    )


class TestPipelineRunner:
    def test_threaded_run_processes_all(self):
        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        sys_ = tiny_system()
        runner = PipelineRunner(sys_, queue_size=16, loop_period_s=0.2)
        imu = simulate_imu(traj, 0.0, 8 * PERIOD, rate=200.0)
        runner.feed_imu(np.asarray(imu.stamps), np.asarray(imu.accs), np.asarray(imu.gyrs))
        runner.start()
        for k in range(6):
            ts = k * PERIOD
            scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
            runner.feed_scan(np.asarray(scan.pts).reshape(R, C, 3),
                             np.asarray(scan.valid).reshape(R, C),
                             np.asarray(scan.rel_time).reshape(R, C), ts)
        runner.stop(drain=True)
        assert runner.n_processed == 6
        assert sys_.n_frames == 6
        assert len(sys_.kf_stamps) >= 2

    def test_bounded_queue_drops(self):
        sys_ = tiny_system()
        runner = PipelineRunner(sys_, queue_size=2)
        # no worker started: the sequencer releases IMU-covered scans into
        # the ready queue, which fills and drops oldest
        z = np.zeros((R, C, 3))
        v = np.zeros((R, C), bool)
        r = np.zeros((R, C))
        stamps = np.arange(0.0, 1.0, 0.005)
        runner.feed_imu(stamps, np.zeros((len(stamps), 3)), np.zeros((len(stamps), 3)))
        for k in range(5):
            runner.feed_scan(z, v, r, 0.1 * k)
        assert runner.n_dropped == 3
        assert runner._ready.qsize() == 2

    def test_sequencer_gates_on_imu_coverage(self):
        """A scan must not reach the frontend before IMU samples cover its
        sweep (the reference's ±0.1 s input gates, LidarOdometry.cpp:653-655)."""
        sys_ = tiny_system()
        runner = PipelineRunner(sys_, queue_size=8)
        z = np.zeros((R, C, 3))
        v = np.zeros((R, C), bool)
        r = np.zeros((R, C))
        runner.feed_scan(z, v, r, 1.0)
        assert runner._ready.qsize() == 0  # no IMU yet
        t = np.arange(0.9, 1.05, 0.005)  # covers only up to 1.05 < 1.0+period
        runner.feed_imu(t, np.zeros((len(t), 3)), np.zeros((len(t), 3)))
        assert runner._ready.qsize() == 0
        t = np.arange(1.05, 1.25, 0.005)  # past the sweep end
        runner.feed_imu(t, np.zeros((len(t), 3)), np.zeros((len(t), 3)))
        assert runner._ready.qsize() == 1

    def test_overlap_matches_serial(self):
        """Backend overlap must not change the estimate: the frontend and
        backend touch disjoint state, so pipelined == serial results."""
        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        imu = simulate_imu(traj, 0.0, 9 * PERIOD, rate=200.0)
        scans = [simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
                 for k in range(7)]

        results = []
        for overlap in (False, True):
            sys_ = tiny_system()
            sys_.lc_cfg.enabled = False
            runner = PipelineRunner(sys_, queue_size=16, overlap=overlap,
                                    loop_period_s=10.0)
            runner.feed_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                            np.asarray(imu.gyrs))
            runner.start()
            for k, scan in enumerate(scans):
                runner.feed_scan(np.asarray(scan.pts).reshape(R, C, 3),
                                 np.asarray(scan.valid).reshape(R, C),
                                 np.asarray(scan.rel_time).reshape(R, C),
                                 k * PERIOD)
            runner.stop(drain=True)
            assert runner.n_processed == 7
            results.append((np.asarray(sys_.fusion_state.t),
                            np.asarray(sys_.fusion_state.q),
                            len(sys_.kf_stamps)))
        np.testing.assert_array_equal(results[0][0], results[1][0])
        np.testing.assert_array_equal(results[0][1], results[1][1])
        assert results[0][2] == results[1][2]

    def test_livox_overlap_matches_serial(self):
        """The Livox path pipelines like the spin path (defer_backend +
        feed_scan_livox): overlapped == serial results."""
        from lili_om_tpu.sim.lidar import livox_pattern

        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = livox_pattern(pts_per_line=400)
        imu = simulate_imu(traj, 0.0, 9 * PERIOD, rate=200.0)
        scans = [simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
                 for k in range(7)]

        results = []
        for overlap in (False, True):
            sys_ = tiny_system()
            sys_.lc_cfg.enabled = False
            runner = PipelineRunner(sys_, queue_size=16, overlap=overlap,
                                    loop_period_s=10.0)
            runner.feed_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                            np.asarray(imu.gyrs))
            runner.start()
            for k, scan in enumerate(scans):
                ratio = np.clip(np.asarray(scan.rel_time), 0, 0.999)
                runner.feed_scan_livox(np.asarray(scan.pts),
                                       np.asarray(scan.line, np.int32),
                                       ratio,
                                       np.asarray(scan.reflectivity),
                                       np.asarray(scan.valid), k * PERIOD)
            runner.stop(drain=True)
            assert runner.n_processed == 7
            results.append((np.asarray(sys_.fusion_state.t),
                            np.asarray(sys_.fusion_state.q),
                            len(sys_.kf_stamps)))
        np.testing.assert_array_equal(results[0][0], results[1][0])
        np.testing.assert_array_equal(results[0][1], results[1][1])
        assert results[0][2] == results[1][2]

    def test_fault_injection_recovery(self):
        """A NaN'd fusion state mid-run is detected and re-seeded by the
        backend worker (health_check_and_recover wired into the runner) —
        processing continues with finite estimates."""
        import jax.numpy as jnp

        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        sys_ = tiny_system()
        sys_.lc_cfg.enabled = False
        runner = PipelineRunner(sys_, queue_size=16, loop_period_s=10.0)
        imu = simulate_imu(traj, 0.0, 12 * PERIOD, rate=200.0)
        runner.feed_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                        np.asarray(imu.gyrs))
        runner.start()
        for k in range(4):
            scan = simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
            runner.feed_scan(np.asarray(scan.pts).reshape(R, C, 3),
                             np.asarray(scan.valid).reshape(R, C),
                             np.asarray(scan.rel_time).reshape(R, C), k * PERIOD)
        # wait for the first batch to clear, then poison the estimator
        t0 = time.time()
        while runner.n_processed < 4 and time.time() - t0 < 60:
            time.sleep(0.01)
        with runner._sys_lock:
            fs = sys_.fusion_state
            sys_.fusion_state = fs._replace(t=fs.t * jnp.nan)
        for k in range(4, 8):
            scan = simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
            runner.feed_scan(np.asarray(scan.pts).reshape(R, C, 3),
                             np.asarray(scan.valid).reshape(R, C),
                             np.asarray(scan.rel_time).reshape(R, C), k * PERIOD)
        runner.stop(drain=True)
        assert runner.n_recoveries >= 1
        assert np.all(np.isfinite(np.asarray(sys_.fusion_state.t)))
        assert np.all(np.isfinite(np.asarray(sys_.fusion_state.q)))
