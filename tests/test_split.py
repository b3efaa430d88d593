"""Split-dispatch equivalence: odometry_step_split / fusion_step_split run
the kNN as standalone launches between smaller jitted programs (so the fused
Pallas kernel can dispatch top-level on TPU) and must produce the same
results as the single-program steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.fusion import (FusionConfig, fusion_step,
                                       fusion_step_split, init_fusion_state)
from lili_om_tpu.models.odometry import (OdometryConfig, init_state,
                                         odometry_step, odometry_step_split)
from lili_om_tpu.ops.features_spin import SpinFeatureConfig, extract_features_spin
from lili_om_tpu.ops.preintegration import ImuNoise
from lili_om_tpu.ops.voxel import pad_cloud
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
from lili_om_tpu.sim.world import make_room_world

R, C = 16, 720
PERIOD = 0.1
IMU_CAP = 64


@pytest.fixture(scope="module")
def scans():
    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)
    fcfg = SpinFeatureConfig(surf_cap=2048)
    frames = []
    for k in range(6):
        ts = k * PERIOD
        scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
        fc = extract_features_spin(scan.pts.reshape(R, C, 3),
                                   scan.valid.reshape(R, C),
                                   scan.rel_time.reshape(R, C), fcfg)
        if k == 0:
            imu = simulate_imu(traj, 0.0, 0.0, rate=200.0)
            n = 1
        else:
            imu = simulate_imu(traj, ts - PERIOD, ts, rate=200.0)
            n = len(imu.stamps) - 1
        dts = jnp.zeros((IMU_CAP,)).at[:n].set(
            jnp.diff(imu.stamps) if k else jnp.zeros(1))
        accs = jnp.zeros((IMU_CAP, 3)).at[:n].set(imu.accs[1:n + 1] if k else imu.accs[:1])
        gyrs = jnp.zeros((IMU_CAP, 3)).at[:n].set(imu.gyrs[1:n + 1] if k else imu.gyrs[:1])
        vm = jnp.zeros((IMU_CAP,), bool).at[:n].set(True)
        frames.append((fc, dts, accs, gyrs, vm, ts))
    return frames, traj


def _tree_close(a, b, atol):
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(la, np.float64),
                                   np.asarray(lb, np.float64), atol=atol)


class TestOdometrySplitEquivalence:
    def test_matches_single_program(self, scans):
        frames, _ = scans
        cfg = OdometryConfig(scan_cap=2048, query_cap=1024, map_cap=8192,
                             n_recent_frames=6)
        s_mono = init_state(cfg, dtype=jnp.float64)
        s_split = init_state(cfg, dtype=jnp.float64)
        for i, (fc, *_rest) in enumerate(frames):
            rounds = cfg.max_rounds if i < 2 else cfg.scan_match_cnt
            sp = fc.surf_pts.astype(jnp.float64)
            s_mono, o_mono = odometry_step(s_mono, sp, fc.surf_mask, cfg,
                                           n_rounds=rounds)
            s_split, o_split = odometry_step_split(s_split, sp, fc.surf_mask,
                                                   cfg, n_rounds=rounds)
        _tree_close(s_mono, s_split, atol=1e-9)
        _tree_close(o_mono, o_split, atol=1e-9)


class TestFusionSplitEquivalence:
    def test_matches_single_program(self, scans):
        frames, traj = scans
        cfg = FusionConfig(window=3, local_map_width=6, kf_surf_cap=2048,
                           kf_edge_cap=1024, map_surf_cap=8192,
                           map_edge_cap=2048, use_reflectivity=False,
                           weight_gate=0.3, lidar_const=7.5, max_num_iter=4,
                           imu_cap=IMU_CAP)
        noise = ImuNoise()
        _, q0w = pose_at(traj, 0.0)
        s_mono = init_fusion_state(cfg, noise, q0=q0w, dtype=jnp.float64)
        s_split = init_fusion_state(cfg, noise, q0=q0w, dtype=jnp.float64)
        for fc, dts, accs, gyrs, vm, _ts in frames:
            sp, sm = pad_cloud(fc.surf_pts.astype(jnp.float64), fc.surf_mask,
                               cfg.kf_surf_cap)
            ep, em = pad_cloud(fc.edge_pts.astype(jnp.float64), fc.edge_mask,
                               cfg.kf_edge_cap)
            refl = jnp.zeros(sp.shape[0], jnp.float64)
            warm = int(s_mono.kf_count) + 1 < cfg.window
            s_mono, o_mono = fusion_step(s_mono, sp, sm, refl, ep, em,
                                         dts, accs, gyrs, vm, cfg, noise,
                                         warmup=warm)
            if warm:
                s_split, o_split = fusion_step(s_split, sp, sm, refl, ep, em,
                                               dts, accs, gyrs, vm, cfg,
                                               noise, warmup=True)
            else:
                s_split, o_split = fusion_step_split(s_split, sp, sm, refl,
                                                     ep, em, dts, accs, gyrs,
                                                     vm, cfg, noise)
        assert int(o_mono.n_surf_corr) > 0  # the comparison exercised matching
        _tree_close(s_mono, s_split, atol=1e-8)
        _tree_close(o_mono, o_split, atol=1e-8)
