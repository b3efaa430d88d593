"""Diagnostic: backend (fusion) vs frontend (odometry) drift over a medium
synthetic run, with per-keyframe velocity/bias traces — hunts down why the
IMU-fused backend can lag the gyro-deskewed frontend on long sequences.

Usage: python examples/diag_backend.py [--cpu] [--frames N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=600)
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
    world = make_room_world()
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
        lc_cfg=LoopClosureConfig(enabled=False),
        graph_capacity=max(256, n),
        dtype=jnp.float32,
    )
    sys_.deskew_translation = True

    imu = simulate_imu(traj, 0.0, n * PERIOD + PERIOD, rate=200.0)
    sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs), np.asarray(imu.gyrs))
    t0w, q0w = pose_at(traj, 0.0)

    fe_err, be_err = [], []
    gts_f = []
    for k in range(n):
        ts = k * PERIOD
        scan = simulate_scan(world, traj, ts, pattern, period=PERIOD)
        sys_.process_scan(scan.pts.reshape(R, C, 3), scan.valid.reshape(R, C),
                          scan.rel_time.reshape(R, C), ts)
        tg, qg = pose_at(traj, ts)
        rt, _ = pose_relative(t0w, q0w, tg, qg)
        gts_f.append(np.asarray(rt))
        fe_err.append(float(np.linalg.norm(sys_.trajectory[-1] - np.asarray(rt))))
        if k % 50 == 0 and k > 0:
            fs = sys_.fusion_state
            vals = np.asarray(jnp.concatenate([
                fs.t[-1], fs.v[-1], fs.ba[-1], fs.bg[-1]]))
            fo = getattr(sys_, "last_fusion_out", None)
            nsc = int(fo.n_surf_corr) if fo is not None else -1
            nec = int(fo.n_edge_corr) if fo is not None else -1
            print(f"frame {k:4d}: fe_err={fe_err[-1]:.2f}  "
                  f"be_t={vals[0:3].round(2)}  gt={np.asarray(rt).round(2)}  "
                  f"|v|={np.linalg.norm(vals[3:6]):.2f}  "
                  f"ba={vals[6:9].round(4)}  bg={vals[9:12].round(5)}  "
                  f"corr={nsc}/{nec}", flush=True)

    # per-keyframe backend error
    nk = len(sys_.kf_stamps)
    g_t = np.asarray(sys_.graph.t[:nk])
    kf_frames = [int(round(s / PERIOD)) for s in sys_.kf_stamps]
    be = np.array([np.linalg.norm(g_t[i] - gts_f[f]) for i, f in enumerate(kf_frames)])
    fe = np.array(fe_err)
    print(f"\nfrontend ATE RMSE {np.sqrt((fe**2).mean()):.3f} m (max {fe.max():.3f})")
    print(f"backend  ATE RMSE {np.sqrt((be**2).mean()):.3f} m (max {be.max():.3f})")
    # error at deciles to see growth shape
    for q in (0.25, 0.5, 0.75, 1.0):
        i = min(int(q * nk) - 1, nk - 1)
        print(f"  backend err at kf {i}/{nk}: {be[i]:.2f} m  "
              f"(frontend at same frame: {fe[kf_frames[i]]:.2f})")


if __name__ == "__main__":
    main()
