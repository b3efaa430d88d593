"""Driver benchmark: full per-scan SLAM pipeline throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The timed path per scan = LOAM feature extraction + scan-to-map GN odometry
+ backend sliding-window fusion (IMU factors + lidar correspondence search +
marginalization). That is *stricter* than the reference, which runs the
backend only on keyframes (~every 2-3 scans); here every scan pays the full
backend too.

Baseline: the reference's real-time envelope is 10 Hz scan processing
(README.md:32; BASELINE.md) — ``vs_baseline`` = scans/s ÷ 10.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.models.fusion import FusionConfig, fusion_step, init_fusion_state
from lili_om_tpu.models.odometry import OdometryConfig, init_state, odometry_step
from lili_om_tpu.ops.features_spin import SpinFeatureConfig, extract_features_spin
from lili_om_tpu.ops.preintegration import ImuNoise
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
from lili_om_tpu.sim.world import make_room_world

R, C, PERIOD = 16, 900, 0.1
N_WARM = 3
N_TIMED = 20


def main():
    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)
    fcfg = SpinFeatureConfig(surf_cap=4096)
    ocfg = OdometryConfig(n_recent_frames=10, scan_cap=4096, query_cap=1024, map_cap=16384)
    bcfg = FusionConfig(window=3, local_map_width=40, kf_surf_cap=2048, kf_edge_cap=1024,
                        map_surf_cap=32768, map_edge_cap=8192, use_reflectivity=False,
                        weight_gate=0.3, lidar_const=7.5, max_num_iter=6, imu_cap=32)
    noise = ImuNoise()

    # pre-stage sim inputs on device (sensor I/O is not the benchmarked path)
    scans = []
    for k in range(N_WARM + N_TIMED):
        s = simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
        imu = simulate_imu(traj, max(k - 1, 0) * PERIOD, k * PERIOD, rate=200.0)
        n = min(len(imu.stamps) - 1, 32)
        dts = jnp.zeros((32,), jnp.float32).at[:n].set(jnp.diff(imu.stamps)[:n].astype(jnp.float32))
        accs = jnp.zeros((32, 3), jnp.float32).at[:n].set(imu.accs[1:n + 1].astype(jnp.float32))
        gyrs = jnp.zeros((32, 3), jnp.float32).at[:n].set(imu.gyrs[1:n + 1].astype(jnp.float32))
        vm = jnp.zeros((32,), bool).at[:n].set(True)
        scans.append((
            jnp.asarray(np.asarray(s.pts), jnp.float32).reshape(R, C, 3),
            jnp.asarray(np.asarray(s.valid)).reshape(R, C),
            jnp.asarray(np.asarray(s.rel_time), jnp.float32).reshape(R, C),
            dts, accs, gyrs, vm,
        ))

    ostate = init_state(ocfg, dtype=jnp.float32)
    fstate = init_fusion_state(bcfg, noise, dtype=jnp.float32)

    def frame(ostate, fstate, img, valid, rel, dts, accs, gyrs, vm, warmup=False):
        fc = extract_features_spin(img, valid, rel, fcfg)
        ostate, out = odometry_step(ostate, fc.surf_pts, fc.surf_mask, ocfg)
        fstate, fout = fusion_step(
            fstate, fc.surf_pts, fc.surf_mask, jnp.zeros_like(fc.surf_pts[:, 0]),
            fc.edge_pts, fc.edge_mask, dts, accs, gyrs, vm, bcfg, noise, warmup=warmup)
        return ostate, fstate, fout

    for k in range(N_WARM):
        # the main fusion program handles an unfilled window gracefully
        # (no correspondences -> prior+IMU only), so the bench compiles ONE
        # fusion variant instead of warmup+main (halves driver compile time)
        ostate, fstate, fout = frame(ostate, fstate, *scans[k])
    fout.t_latest.block_until_ready()

    t0 = time.perf_counter()
    for k in range(N_WARM, N_WARM + N_TIMED):
        ostate, fstate, fout = frame(ostate, fstate, *scans[k])
    np.asarray(fout.t_latest)  # host sync
    dt = time.perf_counter() - t0

    scans_per_s = N_TIMED / dt
    print(json.dumps({
        "metric": "full_pipeline_scans_per_sec",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
