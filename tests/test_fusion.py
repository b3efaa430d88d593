"""Backend sliding-window fusion end-to-end on synthetic data: IMU + surf +
edge factors, marginalization, guarded write-back (BackendFusion semantics).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.fusion import FusionConfig, fusion_step, init_fusion_state
from lili_om_tpu.ops.features_spin import SpinFeatureConfig, extract_features_spin, integrate_gyro, undistort
from lili_om_tpu.ops.preintegration import ImuNoise
from lili_om_tpu.ops.voxel import pad_cloud
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
from lili_om_tpu.sim.world import make_room_world

R, C = 16, 720
PERIOD = 0.1
IMU_RATE = 200.0
IMU_CAP = 64
N_KF = 8


@pytest.fixture(scope="module")
def fusion_run():
    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)
    fcfg = SpinFeatureConfig(surf_cap=2048)
    cfg = FusionConfig(window=3, local_map_width=8, kf_surf_cap=2048, kf_edge_cap=1024,
                       map_surf_cap=8192, map_edge_cap=2048, use_reflectivity=False,
                       weight_gate=0.3, lidar_const=7.5, max_num_iter=4, imu_cap=IMU_CAP)
    noise = ImuNoise()
    t0w, q0w = pose_at(traj, 0.0)
    state = init_fusion_state(cfg, noise, q0=q0w, dtype=jnp.float64)

    est, gt, vels, priors, nsurf = [], [], [], [], []
    for k in range(N_KF):
        ts = k * PERIOD
        scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
        imu_scan = simulate_imu(traj, ts, ts + PERIOD, rate=IMU_RATE)
        q_scan = integrate_gyro(jnp.diff(imu_scan.stamps), imu_scan.gyrs[1:])
        pts_u = undistort(scan.pts, scan.rel_time, q_scan)
        fc = extract_features_spin(pts_u.reshape(R, C, 3), scan.valid.reshape(R, C),
                                   scan.rel_time.reshape(R, C), fcfg)
        # IMU batch for the keyframe interval
        if k == 0:
            imu0 = simulate_imu(traj, 0.0, 0.0, rate=IMU_RATE)
            dts = jnp.zeros((IMU_CAP,))
            accs = jnp.zeros((IMU_CAP, 3)).at[0].set(imu0.accs[0])
            gyrs = jnp.zeros((IMU_CAP, 3)).at[0].set(imu0.gyrs[0])
            valid = jnp.zeros((IMU_CAP,), bool).at[0].set(True)
        else:
            imu = simulate_imu(traj, ts - PERIOD, ts, rate=IMU_RATE)
            n = len(imu.stamps) - 1
            dts = jnp.zeros((IMU_CAP,)).at[:n].set(jnp.diff(imu.stamps))
            accs = jnp.zeros((IMU_CAP, 3)).at[:n].set(imu.accs[1:])
            gyrs = jnp.zeros((IMU_CAP, 3)).at[:n].set(imu.gyrs[1:])
            valid = jnp.zeros((IMU_CAP,), bool).at[:n].set(True)

        sp, sm = pad_cloud(fc.surf_pts.astype(jnp.float64), fc.surf_mask, cfg.kf_surf_cap)
        ep, em = pad_cloud(fc.edge_pts.astype(jnp.float64), fc.edge_mask, cfg.kf_edge_cap)
        state, out = fusion_step(state, sp, sm, jnp.zeros(sp.shape[0]), ep, em,
                                 dts, accs, gyrs, valid, cfg, noise,
                                 warmup=(int(state.kf_count) + 1 < cfg.window))
        tg, _ = pose_at(traj, ts)
        est.append(np.asarray(out.t_latest))
        gt.append(np.asarray(tg))
        vels.append(np.asarray(out.v_latest))
        priors.append(bool(state.prior.valid))
        nsurf.append(int(out.n_surf_corr))
    return est, gt, vels, priors, nsurf


class TestBackendFusion:
    def test_ate_bound(self, fusion_run):
        est, gt, _, _, _ = fusion_run
        err = np.array([np.linalg.norm(e - g) for e, g in zip(est, gt)])
        assert np.sqrt((err ** 2).mean()) < 0.05, f"ATE too large: {err}"

    def test_prior_becomes_valid_after_window_fills(self, fusion_run):
        _, _, _, priors, _ = fusion_run
        # window=3: first marginalization on the 3rd keyframe
        assert not priors[0] and not priors[1]
        assert all(priors[2:])

    def test_velocity_tracks_motion(self, fusion_run):
        _, _, vels, _, _ = fusion_run
        assert np.all(np.isfinite(np.stack(vels)))
        # ramped circle: speed grows from ~0; final speed ≈ |dp/dt| > 0
        assert np.linalg.norm(vels[-1]) > 0.05

    def test_correspondences_accumulate(self, fusion_run):
        _, _, _, _, nsurf = fusion_run
        assert nsurf[0] == 0  # empty map at the first keyframe
        assert nsurf[-1] > 1000


class TestReflectivityPath:
    def test_livox_reflectivity_weighting(self):
        """use_reflectivity=True (Livox variant): the sum_w/reflect_thres
        gates and (weight+exp(−sum_w)) scores must run and produce
        correspondences when map and scan reflectivities are consistent."""
        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        fcfg = SpinFeatureConfig(surf_cap=2048)
        cfg = FusionConfig(window=3, local_map_width=6, kf_surf_cap=1024, kf_edge_cap=512,
                           map_surf_cap=4096, map_edge_cap=1024,
                           use_reflectivity=True, reflect_thres=15.0,
                           lidar_const=20.0, max_num_iter=3, imu_cap=IMU_CAP)
        noise = ImuNoise()
        t0w, q0w = pose_at(traj, 0.0)
        state = init_fusion_state(cfg, noise, q0=q0w, dtype=jnp.float64)
        outs = []
        for k in range(4):
            ts = k * PERIOD
            scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
            fc = extract_features_spin(scan.pts.reshape(R, C, 3),
                                       scan.valid.reshape(R, C),
                                       scan.rel_time.reshape(R, C), fcfg)
            # synthetic reflectivity channel: smooth function of position so
            # scan and map agree (curvature = 0.1·refl packing)
            refl = 0.1 * (5.0 + jnp.linalg.norm(fc.surf_pts, axis=1) % 7.0)
            if k == 0:
                dts = jnp.zeros((IMU_CAP,)); accs = jnp.zeros((IMU_CAP, 3))
                gyrs = jnp.zeros((IMU_CAP, 3)); valid = jnp.zeros((IMU_CAP,), bool)
            else:
                imu = simulate_imu(traj, ts - PERIOD, ts, rate=IMU_RATE)
                n = len(imu.stamps) - 1
                dts = jnp.zeros((IMU_CAP,)).at[:n].set(jnp.diff(imu.stamps))
                accs = jnp.zeros((IMU_CAP, 3)).at[:n].set(imu.accs[1:])
                gyrs = jnp.zeros((IMU_CAP, 3)).at[:n].set(imu.gyrs[1:])
                valid = jnp.zeros((IMU_CAP,), bool).at[:n].set(True)
            state, out = fusion_step(
                state, fc.surf_pts.astype(jnp.float64), fc.surf_mask, refl,
                fc.edge_pts.astype(jnp.float64), fc.edge_mask,
                dts, accs, gyrs, valid, cfg, noise,
                warmup=(int(state.kf_count) + 1 < cfg.window))
            outs.append(out)
        assert int(outs[-1].n_surf_corr) > 200
        assert np.all(np.isfinite(np.asarray(outs[-1].t_latest)))
        # stored reflectivity actually flows through the ring buffer
        assert float(jnp.abs(state.hist_surf_refl).max()) > 0
