"""ATE-parity harness: run the golden synthetic "campus" sequence through
every requested preset and print ATE/RPE per preset — the stand-in for the
reference's rosbag validation until real FR_IOSB bags are reachable
(README.md:31-34 hosts them externally).

One command, one table:

  python examples/evaluate_presets.py                 # default preset set, TPU
  python examples/evaluate_presets.py --cpu --frames 120 --presets synthetic
  python examples/evaluate_presets.py --presets all --tum-dir /tmp/tum

The golden sequence is a deterministic closed loop (circle at walking speed
in the room world, fixed pattern per sensor family) with IMU at 200 Hz and
a revisit that fires loop closure. Trajectories export in TUM format for
external tooling parity (utils/evaluation.py).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, ".")

DEFAULT_PRESETS = ["synthetic", "fr_iosb_rot", "fr_iosb"]
# ATE bound (m) on the golden sequence per preset family — loose enough for
# f32 + small-capacity CI runs, tight enough to catch mis-wiring
BOUNDS = {"default": 1.0}


def run_preset(name: str, frames: int, dtype, tum_dir=None):
    import jax.numpy as jnp
    import numpy as np

    from lili_om_tpu.models.system import LiliOmSystem
    from lili_om_tpu.sim.lidar import livox_pattern, simulate_scan, spinning_pattern
    from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
    from lili_om_tpu.sim.world import make_room_world
    from lili_om_tpu.utils.config import load_config
    from lili_om_tpu.utils.evaluation import ate_rmse, export_system_tum, rpe
    from lili_om_tpu.utils.math import pose_relative

    cfg = load_config(name)
    PERIOD = cfg.scan_period
    rings = {"fr_iosb_rot": 64, "urban_hk_rot": 32, "utbm_rot": 32}.get(name, 16)

    # Livox internal-IMU degraded mode: feed the harness IMU the way the
    # sensor reports it (accel in g) and run it through the
    # InternalImuUnitConverter path — g→m/s² rescale + gravity-aligned
    # initial orientation (io/livox.py:convert_internal_imu, reference
    # scripts/InternalImuUnitConverter.py:30-58) — so the degraded mode is
    # measured end-to-end, not just unit-tested.
    internal_imu = name == "fr_iosb_internal_imu"

    sys_ = LiliOmSystem(
        odo_cfg=cfg.odometry, fusion_cfg=cfg.fusion, feat_cfg=cfg.spin_features,
        livox_cfg=cfg.livox_features, lc_cfg=cfg.loop_closure, noise=cfg.imu_noise,
        dtype=dtype)
    sys_.deskew_translation = True
    sys_.mapping_interval = cfg.mapping_interval  # yaml backend_fusion/mapping_interval
    # golden campus loop: walking-speed circle closing inside the run
    world = make_room_world()
    period_s = max((frames - 30) * PERIOD, 10.0)
    radius = min(6.0, 1.3 * period_s / (2 * 3.14159))
    traj = circle_trajectory(radius=radius, period=period_s, speed_up=3.0)
    sys_.lc_cfg.time_thres = min(sys_.lc_cfg.time_thres, period_s / 3)
    sys_.lc_cfg.search_radius = max(sys_.lc_cfg.search_radius, 5.0)

    imu = simulate_imu(traj, 0.0, frames * PERIOD + PERIOD, rate=200.0)
    if internal_imu:
        from lili_om_tpu.io.livox import convert_internal_imu

        # the internal IMU reports accel in g — rescale the sim stream the
        # way the sensor would emit it, then convert back through the
        # production path and gravity-align the first orientation
        accs, gyrs, q0 = convert_internal_imu(
            np.asarray(imu.accs) / 9.8, np.asarray(imu.gyrs))
        sys_.push_imu(np.asarray(imu.stamps), accs, gyrs)
        sys_.set_initial_orientation(q0)
    else:
        sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                      np.asarray(imu.gyrs))
    t0w, q0w = pose_at(traj, 0.0)

    livox = cfg.variant == "livox"
    pattern = (livox_pattern() if livox
               else spinning_pattern(n_rings=rings, n_cols=900))
    # place rays at the SENSOR pose implied by the preset's lidar->body
    # extrinsic (p_body = q_lb^-1 (p_sensor - t_lb)); feeding body-frame
    # scans to an extrinsic-configured system corrupts the geometry
    from lili_om_tpu.utils.math import quat_conj_np, quat_rotate_np

    q_lb = np.asarray(cfg.fusion.q_lb, float)
    t_lb = np.asarray(cfg.fusion.t_lb, float)
    q_sl = quat_conj_np(q_lb[None])[0]
    t_sl = -quat_rotate_np(q_sl[None], t_lb[None])[0]
    gt_t, gt_q, loops = [], [], 0
    t_start = time.time()
    for k in range(frames):
        ts = k * PERIOD
        scan = simulate_scan(world, traj, ts, pattern, period=PERIOD,
                             t_sl=t_sl, q_sl=q_sl)
        if livox:
            sys_.process_scan_livox(scan.pts, scan.line, scan.rel_time,
                                    scan.reflectivity, scan.valid, ts)
        else:
            R = rings
            C = scan.pts.shape[0] // R
            sys_.process_scan(scan.pts.reshape(R, C, 3),
                              scan.valid.reshape(R, C),
                              scan.rel_time.reshape(R, C), ts)
        tg, qg = pose_at(traj, ts)
        rt, rq = pose_relative(t0w, q0w, tg, qg)
        gt_t.append(np.asarray(rt))
        gt_q.append(np.asarray(rq))
        if k % 10 == 0 and k > 0 and sys_.try_loop_closure():
            loops += 1
    wall = time.time() - t_start

    gt_stamps = np.arange(frames) * PERIOD
    gt_t = np.stack(gt_t)
    gt_q = np.stack(gt_q)
    est_t = np.stack([np.asarray(t) for t in sys_.trajectory])
    frame_ate = ate_rmse(gt_stamps, est_t, gt_stamps, gt_t, align=False)
    nk = len(sys_.kf_stamps)
    kf_ate = ate_rmse(np.asarray(sys_.kf_stamps), np.asarray(sys_.graph.t[:nk]),
                      gt_stamps, gt_t, align=False)
    kf_rpe = rpe(np.asarray(sys_.kf_stamps), np.asarray(sys_.graph.t[:nk]),
                 np.asarray(sys_.graph.q[:nk]), gt_stamps, gt_t, gt_q, delta=5)
    if tum_dir:
        os.makedirs(tum_dir, exist_ok=True)
        export_system_tum(sys_, os.path.join(tum_dir, f"{name}_frames.tum"),
                          os.path.join(tum_dir, f"{name}_keyframes.tum"))
        from lili_om_tpu.utils.evaluation import export_tum

        export_tum(os.path.join(tum_dir, f"{name}_gt.tum"), gt_stamps, gt_t, gt_q)
    return {"preset": name, "frames": frames, "keyframes": nk, "loops": loops,
            "frame_ate": frame_ate["rmse"], "kf_ate": kf_ate["rmse"],
            "kf_rpe5": kf_rpe["rmse"], "scans_per_s": frames / wall}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--presets", default=",".join(DEFAULT_PRESETS),
                    help="comma list or 'all'")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tum-dir", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lili_om_tpu.utils.config import PRESETS

    names = (list(PRESETS) if args.presets == "all"
             else [p.strip() for p in args.presets.split(",")])
    rows = []
    failed = 0
    for name in names:
        print(f"== {name} ==", flush=True)
        r = run_preset(name, args.frames, jnp.float32, args.tum_dir)
        bound = BOUNDS.get(name, BOUNDS["default"])
        r["ok"] = r["kf_ate"] < bound
        failed += 0 if r["ok"] else 1
        rows.append(r)
        print(f"   frame ATE {r['frame_ate']:.3f} m | kf ATE {r['kf_ate']:.3f} m "
              f"(bound {bound}) | RPE@5kf {r['kf_rpe5']:.3f} m | "
              f"loops {r['loops']} | {r['scans_per_s']:.1f} scans/s", flush=True)

    print(f"\n{'preset':24s} {'kf_ATE':>8s} {'fr_ATE':>8s} {'RPE@5':>8s} "
          f"{'kf':>4s} {'loops':>5s}  ok")
    for r in rows:
        print(f"{r['preset']:24s} {r['kf_ate']:8.3f} {r['frame_ate']:8.3f} "
              f"{r['kf_rpe5']:8.3f} {r['keyframes']:4d} {r['loops']:5d}  "
              f"{'✓' if r['ok'] else '✗'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
