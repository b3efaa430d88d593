"""End-to-end synthetic SLAM run: spinning-LiDAR frontend on a simulated
room, printing per-frame progress, final ATE, and throughput.

This is the executable counterpart of the reference's
``roslaunch … + rosbag play`` validation flow (README.md:57-76) — the world
and trajectory are simulated (sim/), so the run is deterministic and needs
no external datasets.

Usage:  python examples/run_synthetic.py [n_frames] [--corridor]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces the TPU tunnel

import jax.numpy as jnp
import numpy as np

from lili_om_tpu.models.odometry import OdometryConfig, init_state, odometry_step
from lili_om_tpu.ops.features_spin import (
    SpinFeatureConfig,
    extract_features_spin,
    integrate_gyro,
    undistort,
)
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu, straight_trajectory
from lili_om_tpu.sim.world import make_corridor_world, make_room_world
from lili_om_tpu.utils.math import pose_relative


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_frames", nargs="?", type=int, default=20)
    ap.add_argument("--corridor", action="store_true")
    args = ap.parse_args()

    R, C, period = 16, 900, 0.1
    if args.corridor:
        world = make_corridor_world()
        traj = straight_trajectory(speed=1.5)
    else:
        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)

    pattern = spinning_pattern(n_rings=R, n_cols=C)
    fcfg = SpinFeatureConfig(surf_cap=4096)
    ocfg = OdometryConfig(n_recent_frames=10, scan_cap=4096, query_cap=1024, map_cap=16384)

    state = init_state(ocfg, dtype=jnp.float32)
    t0w, q0w = pose_at(traj, 0.0)
    est, gt = [], []
    t_start = time.time()
    odo_time = 0.0
    for k in range(args.n_frames):
        ts = k * period
        scan = simulate_scan(world, traj, ts, pattern, period=period)
        imu = simulate_imu(traj, ts, ts + period, rate=200.0)
        q_scan = integrate_gyro(jnp.diff(imu.stamps), imu.gyrs[1:])
        pts_u = undistort(scan.pts, scan.rel_time, q_scan)
        fc = extract_features_spin(
            pts_u.reshape(R, C, 3).astype(jnp.float32),
            scan.valid.reshape(R, C),
            scan.rel_time.reshape(R, C).astype(jnp.float32),
            fcfg,
        )
        t1 = time.time()
        rounds = ocfg.max_rounds if k < 2 else ocfg.scan_match_cnt
        state, out = odometry_step(state, fc.surf_pts, fc.surf_mask, ocfg,
                                   n_rounds=rounds)
        out.t.block_until_ready()
        if k >= 2:  # skip compile frames
            odo_time += time.time() - t1
        tg, qg = pose_at(traj, ts)
        rt, _ = pose_relative(t0w, q0w, tg, qg)
        est.append(np.asarray(out.t))
        gt.append(np.asarray(rt, dtype=np.float64))
        if k % 5 == 0:
            print(f"frame {k:3d}  est={np.asarray(out.t).round(3)}  gt={np.asarray(rt).round(3)}  "
                  f"kf={bool(out.is_keyframe)}  corr={int(out.n_corr)}")

    err = np.array([np.linalg.norm(e - g) for e, g in zip(est, gt)])
    ate = float(np.sqrt((err ** 2).mean()))
    n_timed = max(args.n_frames - 2, 1)
    print(f"\nATE RMSE: {ate:.4f} m  (max {err.max():.4f} m) over {args.n_frames} frames")
    print(f"odometry throughput: {n_timed / max(odo_time, 1e-9):.1f} scans/s "
          f"(total wall {time.time() - t_start:.1f}s incl. sim+features+compile)")
    return 0 if ate < 0.3 else 1


if __name__ == "__main__":
    sys.exit(main())
