"""Aggressive-motion golden sequence (VERDICT r2 item 7): ≥1.5 rad/s yaw
bursts + speed-varying translation — the regime real handheld data lives in.
The frontend's gyro-only undistortion degrades here (matching the
reference's design, LiLi-OM-ROT/src/Preprocessing.cpp:153-177); the
IMU-fused backend must stay bounded where the frontend drifts. Bounds are
asserted for the shipped fr_iosb_rot (spin) and fr_iosb (Livox) presets —
preset thresholds/widths/noises as shipped, reduced ring counts/caps only
(the presets carry no image size; CI budget).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.system import LiliOmSystem
from lili_om_tpu.sim.lidar import livox_pattern, simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import (aggressive_trajectory, body_rates,
                                        pose_at, simulate_imu)
from lili_om_tpu.sim.world import make_room_world
from lili_om_tpu.utils.config import load_config
from lili_om_tpu.utils.evaluation import ate_rmse
from lili_om_tpu.utils.math import pose_relative

PERIOD = 0.1
N_FRAMES = 60


def test_trajectory_has_fast_yaw_bursts():
    traj = aggressive_trajectory()
    ts = np.linspace(5.0, 6.0 + 0.1 * N_FRAMES, 300)
    rates = [float(np.linalg.norm(np.asarray(body_rates(traj, t)[0])))
             for t in ts]
    assert max(rates) > 1.5, max(rates)  # the bursts exist


def _sensor_frame_gt(traj, stamps):
    """Ground truth in the first-pose frame — the FRONTEND's world (odometry
    starts at identity in the first sensor pose)."""
    t0, q0 = pose_at(traj, float(stamps[0]))
    out = []
    for s in stamps:
        tg, qg = pose_at(traj, float(s))
        rt, _ = pose_relative(t0, q0, tg, qg)
        out.append(np.asarray(rt))
    return np.stack(out)


def _world_axes_gt(traj, stamps):
    """Ground truth in WORLD axes shifted to start at the origin — the
    BACKEND's world (fusion seeds t=0 with the true initial orientation
    q0, so its positions live in world axes)."""
    p0 = np.asarray(pose_at(traj, float(stamps[0]))[0])
    return np.stack([np.asarray(pose_at(traj, float(s))[0]) - p0
                     for s in stamps])


def _rig(fusion_cfg, sensor_traj):
    """Simulated rig for a preset's lidar→body extrinsic
    (p_sensor = q_lb·p_body + t_lb). The SENSOR flies ``sensor_traj``
    (level, spinning about its own z, like the physical mounting); the
    BODY/IMU trajectory follows through the extrinsic:
    T_world_body = T_world_sensor ∘ (q_lb, t_lb). Returns
    (body_traj for IMU+ground truth, (t_sl, q_sl) sensor-in-body for
    simulate_scan). Feeding body-frame scans to an extrinsic-configured
    system corrupts the geometry — violently under fast yaw."""
    from lili_om_tpu.utils.math import (quat_conj_np, quat_mul,
                                        quat_normalize, quat_rotate,
                                        quat_rotate_np)

    q_lb = jnp.asarray(fusion_cfg.q_lb, jnp.float64)
    t_lb = jnp.asarray(fusion_cfg.t_lb, jnp.float64)

    def body_traj(t):
        p, q = sensor_traj(t)
        return (p + quat_rotate(q, t_lb),
                quat_normalize(quat_mul(q, q_lb)))

    q_lb_np = np.asarray(fusion_cfg.q_lb, float)
    t_lb_np = np.asarray(fusion_cfg.t_lb, float)
    q_sl = quat_conj_np(q_lb_np[None])[0]
    t_sl = -quat_rotate_np(q_sl[None], t_lb_np[None])[0]
    return body_traj, (t_sl, q_sl)


def _run(preset: str):
    cfg = load_config(preset)
    world = make_room_world()
    sensor_traj = aggressive_trajectory()
    traj, (t_sl, q_sl) = _rig(cfg.fusion, sensor_traj)
    # reduced capacities for CI; preset gates/weights/noises as shipped
    odo = cfg.odometry._replace(scan_cap=4096, query_cap=1024, map_cap=8192,
                                frame_cap=1024, n_recent_frames=10)
    fus = cfg.fusion._replace(kf_surf_cap=1024, kf_edge_cap=512,
                              map_surf_cap=8192, map_edge_cap=1024,
                              local_map_width=12, imu_cap=64)
    # the Livox binning width MUST match the simulated point density: the
    # eigen-patch classifier needs ≥25 valid cells per 6×6 patch
    # (Preprocessing.cpp:287-298), so a 680-pt/line sim binned into the
    # default 4000-column image (~6/36 filled) starves the extractor to
    # zero features — the round-4 "aggressive-motion starvation" was
    # exactly this rig artifact (VERDICT r4 task 3), not a matching failure
    livox_cfg = cfg.livox_features._replace(n_cols=680)
    sys_ = LiliOmSystem(odo_cfg=odo, fusion_cfg=fus,
                        feat_cfg=cfg.spin_features._replace(surf_cap=4096),
                        livox_cfg=livox_cfg,
                        lc_cfg=cfg.loop_closure, noise=cfg.imu_noise,
                        dtype=jnp.float64)
    sys_.lc_cfg.enabled = False
    t0w, q0w = pose_at(traj, 0.0)
    sys_.fusion_state = sys_.fusion_state._replace(
        q=jnp.tile(jnp.asarray(q0w, jnp.float64), (fus.window, 1)))
    imu = simulate_imu(traj, 0.0, N_FRAMES * PERIOD + PERIOD, rate=200.0)
    sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                  np.asarray(imu.gyrs))

    n_corr = []
    if cfg.variant == "livox":
        pattern = livox_pattern(pts_per_line=680)
        for k in range(N_FRAMES):
            ts = k * PERIOD
            scan = simulate_scan(world, traj, ts, pattern, period=PERIOD,
                                 t_sl=t_sl, q_sl=q_sl)
            out = sys_.process_scan_livox(
                np.asarray(scan.pts), np.asarray(scan.line, np.int32),
                np.clip(np.asarray(scan.rel_time), 0, 0.999),
                np.asarray(scan.reflectivity), np.asarray(scan.valid), ts)
            n_corr.append(int(np.asarray(out.n_corr)))
    else:
        R, C = 16, 720
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        for k in range(N_FRAMES):
            ts = k * PERIOD
            scan = simulate_scan(world, traj, ts, pattern, period=PERIOD,
                                 t_sl=t_sl, q_sl=q_sl)
            out = sys_.process_scan(np.asarray(scan.pts).reshape(R, C, 3),
                                    np.asarray(scan.valid).reshape(R, C),
                                    np.asarray(scan.rel_time).reshape(R, C),
                                    ts)
            n_corr.append(int(np.asarray(out.n_corr)))

    stamps = np.arange(N_FRAMES) * PERIOD
    gt_front = _sensor_frame_gt(sensor_traj, stamps)
    front = np.stack([np.asarray(t) for t in sys_.trajectory])
    front_ate = ate_rmse(stamps, front, stamps, gt_front, align=False)["rmse"]
    nk = len(sys_.kf_stamps)
    kf_gt = _world_axes_gt(traj, np.asarray(sys_.kf_stamps))
    back_ate = ate_rmse(np.asarray(sys_.kf_stamps),
                        np.asarray(sys_.graph.t[:nk]),
                        np.asarray(sys_.kf_stamps), kf_gt,
                        align=False)["rmse"]
    return front_ate, back_ate, n_corr


class TestAggressiveMotionGolden:
    @pytest.mark.parametrize("preset,bound", [("fr_iosb_rot", 0.6),
                                              ("fr_iosb", 0.6)])
    def test_backend_bounded_and_frontend_acquires(self, preset, bound):
        front_ate, back_ate, n_corr = _run(preset)
        # the IMU-fused backend stays bounded under the yaw bursts; the
        # frontend is allowed to degrade (gyro-only undistortion), matching
        # the diag_backend split (docs/STATUS.md: 0.35 m vs 1.9 m)
        assert np.isfinite(back_ate)
        assert back_ate < bound, (preset, front_ate, back_ate)
        # the frontend must keep MATCHING through the bursts — it may drift,
        # but it must not run open-loop on the constant-velocity prior
        # (VERDICT r4 task 3: the round-4 Livox rig starved the extractor by
        # binning 680 pts/line into 4000 columns; with a density-matched
        # image both variants hold correspondences on ≥90 % of frames)
        acquired = np.mean([c > 0 for c in n_corr[2:]])  # skip bootstrap
        assert acquired >= 0.9, (preset, acquired, n_corr)
