"""Full-loop demo: drive a closed circle through the complete system
(frontend → backend fusion → global graph), fire loop closure on revisit,
and report ATE before/after the graph correction.

This is the synthetic counterpart of the reference's campus-loop rosbag
validation (README.md:57-76). Run on TPU (default) or CPU (--cpu).

Usage: python examples/run_loop_closure.py [--cpu] [--frames N]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=220)
    ap.add_argument("--export-dir", default=None,
                    help="write TUM trajectory + PCD/PLY map + overview PNG")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from lili_om_tpu.models.fusion import FusionConfig
    from lili_om_tpu.models.odometry import OdometryConfig
    from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig
    from lili_om_tpu.ops.features_spin import SpinFeatureConfig
    from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
    from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
    from lili_om_tpu.sim.world import make_room_world
    from lili_om_tpu.utils.math import pose_relative

    R, C, PERIOD = 16, 720, 0.1
    n = args.frames
    # circle period chosen so the trajectory returns to the start within the
    # run, at walking speed (~1.3 m/s — the reference's datasets; gyro-only
    # undistortion leaves translation distortion uncorrected, so faster
    # motion degrades the frontend, same as the reference)
    world = make_room_world()
    # cap the lap time so long runs do MULTIPLE laps — each revisit is a
    # loop-closure opportunity that bounds drift (one lap spanning the whole
    # run would only revisit the start in the final frames, after drift has
    # escaped the search radius)
    period_s = min((n - 30) * PERIOD, 75.0)
    radius = min(6.0, 1.3 * period_s / (2 * 3.14159))
    traj = circle_trajectory(radius=radius, period=period_s, speed_up=3.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)

    sys_ = LiliOmSystem(
        odo_cfg=OdometryConfig(n_recent_frames=10, scan_cap=4096, query_cap=1024,
                               map_cap=16384),
        fusion_cfg=FusionConfig(window=3, local_map_width=20, kf_surf_cap=4096,
                                kf_edge_cap=1024, map_surf_cap=32768, map_edge_cap=4096,
                                use_reflectivity=False, weight_gate=0.3,
                                lidar_const=7.5, max_num_iter=6, imu_cap=64),
        feat_cfg=SpinFeatureConfig(surf_cap=4096),
        lc_cfg=LoopClosureConfig(time_thres=max(10.0, period_s / 3),
                                 search_radius=5.0, icp_thres=0.3, map_width=6,
                                 latest_width=1),
        graph_capacity=max(256, n),
        dtype=jnp.float32,
    )
    sys_.deskew_translation = True  # constant-velocity translation deskew

    imu = simulate_imu(traj, 0.0, n * PERIOD + PERIOD, rate=200.0)
    sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs), np.asarray(imu.gyrs))
    t0w, q0w = pose_at(traj, 0.0)

    gts = []
    loops = 0
    t_start = time.time()
    for k in range(n):
        ts = k * PERIOD
        scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
        sys_.process_scan(scan.pts.reshape(R, C, 3), scan.valid.reshape(R, C),
                          scan.rel_time.reshape(R, C), ts)
        tg, qg = pose_at(traj, ts)
        rt, _ = pose_relative(t0w, q0w, tg, qg)
        gts.append(np.asarray(rt))
        if k % 10 == 0 and k > 0:  # the reference's 1 Hz loop thread
            if sys_.try_loop_closure():
                loops += 1
                print(f"  loop closure fired at frame {k}")
        if k % 50 == 0:
            print(f"frame {k:4d}  kf={len(sys_.kf_stamps):3d}  "
                  f"est={np.asarray(sys_.trajectory[-1]).round(2)}  gt={np.asarray(rt).round(2)}")

    wall = time.time() - t_start
    # per-frame frontend ATE
    err = np.array([np.linalg.norm(e - g) for e, g in zip(sys_.trajectory, gts)])
    # keyframe ATE against the (possibly loop-corrected) graph
    nk = len(sys_.kf_stamps)
    g_t = np.asarray(sys_.graph.t[:nk])
    kf_frames = [int(round(s / PERIOD)) for s in sys_.kf_stamps]
    kf_err = np.array([np.linalg.norm(g_t[i] - gts[f]) for i, f in enumerate(kf_frames)])

    print(f"\nframes: {n}, keyframes: {nk}, loop closures: {loops}")
    print(f"frontend ATE RMSE: {np.sqrt((err**2).mean()):.3f} m (max {err.max():.3f})")
    print(f"graph keyframe ATE RMSE: {np.sqrt((kf_err**2).mean()):.3f} m (max {kf_err.max():.3f})")
    print(f"throughput: {n / wall:.1f} scans/s wall ({wall:.1f}s total incl. sim+compile)")
    print("\nstage timing:\n" + sys_.metrics.pretty())

    if args.export_dir:
        from lili_om_tpu.utils.viz import export_run

        paths = export_run(args.export_dir, sys_,
                           est_t=np.asarray(sys_.trajectory),
                           gt_t=np.asarray(gts))
        for k_, v_ in paths.items():
            print(f"exported {k_}: {v_}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
