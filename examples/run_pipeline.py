"""Pipelined-runtime demo: the same scan stream through the overlapped
(frontend ∥ backend) PipelineRunner vs the serial single-worker mode, with
throughput and p50/p95 per-stage latency.

The reference overlaps its stages across 4 OS processes — Preprocessing and
LidarOdometry keep ingesting scan k+1 while BackendFusion chews keyframe k
(SURVEY.md §1). The overlapped runner reproduces that: when keyframes are
sparse, pipeline throughput approaches pure frontend throughput because the
backend's keyframe cost hides behind the next scans' frontend work.

Usage: python examples/run_pipeline.py [--cpu] [--frames N]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--rings", type=int, default=16)
    ap.add_argument("--cols", type=int, default=900)
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
    from lili_om_tpu.runtime.pipeline import PipelineRunner
    from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
    from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
    from lili_om_tpu.sim.world import make_room_world

    R, C, PERIOD = args.rings, args.cols, 0.1
    n = args.frames

    world = make_room_world()
    traj = circle_trajectory(radius=6.0, period=max(40.0, n * PERIOD * 1.2))
    pattern = spinning_pattern(n_rings=R, n_cols=C)
    imu = simulate_imu(traj, 0.0, n * PERIOD + PERIOD, rate=200.0)
    print("simulating scans...", flush=True)
    scans = [simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
             for k in range(n)]
    scans = [(np.asarray(s.pts).reshape(R, C, 3),
              np.asarray(s.valid).reshape(R, C),
              np.asarray(s.rel_time).reshape(R, C)) for s in scans]

    def make_system():
        return LiliOmSystem(
            odo_cfg=OdometryConfig(n_recent_frames=10, scan_cap=4096,
                                   query_cap=1024, map_cap=16384),
            fusion_cfg=FusionConfig(window=3, local_map_width=20,
                                    kf_surf_cap=2048, kf_edge_cap=1024,
                                    map_surf_cap=16384, map_edge_cap=4096,
                                    use_reflectivity=False, weight_gate=0.3,
                                    lidar_const=7.5, max_num_iter=6,
                                    imu_cap=64),
            feat_cfg=SpinFeatureConfig(surf_cap=4096),
            lc_cfg=LoopClosureConfig(enabled=False),
            graph_capacity=max(64, n), dtype=jnp.float32)

    results = {}
    for overlap in (False, True):
        sys_ = make_system()
        runner = PipelineRunner(sys_, queue_size=max(16, n), overlap=overlap,
                                loop_period_s=1e9)
        runner.feed_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                        np.asarray(imu.gyrs))
        # warm the compiles outside the timed window
        runner.start()
        for k in range(2):
            runner.feed_scan(*scans[k], k * PERIOD)
        while runner.n_processed < 2:
            time.sleep(0.01)
        t0 = time.perf_counter()
        for k in range(2, n):
            runner.feed_scan(*scans[k], k * PERIOD)
        runner.stop(drain=True)
        dt = time.perf_counter() - t0
        mode = "overlap" if overlap else "serial "
        results[overlap] = (n - 2) / dt
        print(f"\n[{mode}] {n - 2} scans in {dt:.1f}s = "
              f"{(n - 2) / dt:.1f} scans/s  (kf={len(sys_.kf_stamps)}, "
              f"dropped={runner.n_dropped})")
        print(sys_.metrics.pretty())

    print(f"\noverlap speedup: {results[True] / results[False]:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
