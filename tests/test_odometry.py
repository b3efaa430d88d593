"""End-to-end frontend slice: synthetic spinning-LiDAR scans → LOAM feature
extraction → scan-to-map Gauss-Newton odometry (SURVEY.md §7 step 3).

This is the integration test replacing the reference's rosbag validation
(SURVEY.md §4): a deterministic room world, a ramped circular trajectory,
gyro undistortion from simulated IMU, and an ATE bound on the estimate.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.odometry import OdometryConfig, init_state, odometry_step
from lili_om_tpu.ops.features_spin import (
    SpinFeatureConfig,
    extract_features_spin,
    integrate_gyro,
    undistort,
)
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
from lili_om_tpu.sim.world import make_room_world
from lili_om_tpu.utils.math import pose_relative


R, C = 16, 720
PERIOD = 0.1


@pytest.fixture(scope="module")
def pipeline_run():
    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)
    # capacities must exceed the scene's voxel occupancy — undersized caps
    # silently truncate the map (see voxel_downsample) and degrade accuracy
    fcfg = SpinFeatureConfig(surf_cap=4096)
    ocfg = OdometryConfig(n_recent_frames=8, scan_cap=4096, query_cap=1024, map_cap=16384)

    state = init_state(ocfg, dtype=jnp.float64)
    t0w, q0w = pose_at(traj, 0.0)
    est, gt, kfs, ncorr = [], [], [], []
    for k in range(12):
        ts = k * PERIOD
        scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
        imu = simulate_imu(traj, ts, ts + PERIOD, rate=200.0)
        q_scan = integrate_gyro(jnp.diff(imu.stamps), imu.gyrs[1:])
        pts_u = undistort(scan.pts, scan.rel_time, q_scan)
        fc = extract_features_spin(
            pts_u.reshape(R, C, 3), scan.valid.reshape(R, C),
            scan.rel_time.reshape(R, C), fcfg,
        )
        state, out = odometry_step(state, fc.surf_pts.astype(jnp.float64), fc.surf_mask, ocfg)
        tg, qg = pose_at(traj, ts)
        rt, _ = pose_relative(t0w, q0w, tg, qg)
        est.append(np.asarray(out.t))
        gt.append(np.asarray(rt))
        kfs.append(bool(out.is_keyframe))
        ncorr.append(int(out.n_corr))
    return est, gt, kfs, ncorr


class TestFrontendSlice:
    def test_ate_bound(self, pipeline_run):
        est, gt, _, _ = pipeline_run
        err = np.array([np.linalg.norm(e - g) for e, g in zip(est, gt)])
        assert np.sqrt((err**2).mean()) < 0.08, f"ATE too large: {err}"

    def test_first_two_frames_are_keyframes(self, pipeline_run):
        # reference: pose_cloud_frame->size() <= 1 forces kf (LidarOdometry.cpp:578)
        _, _, kfs, _ = pipeline_run
        assert kfs[0] and kfs[1]

    def test_keyframe_cadence(self, pipeline_run):
        # every-3rd-frame fallback: no gap larger than 3 (LidarOdometry.cpp:578)
        _, _, kfs, _ = pipeline_run
        idx = [i for i, k in enumerate(kfs) if k]
        assert max(np.diff(idx)) <= 3

    def test_correspondence_counts_grow(self, pipeline_run):
        # once the local map exists, most queries should match
        _, _, _, ncorr = pipeline_run
        assert ncorr[0] == 0  # empty map on the first frame
        assert ncorr[-1] > 200
