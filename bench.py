"""Driver benchmark: frontend scan-to-map odometry throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's real-time envelope is 10 Hz scan processing
(README.md:32; BASELINE.md) — ``vs_baseline`` = scans/s ÷ 10.

Runs on whatever backend JAX selects (the real TPU chip under the driver;
CPU elsewhere). The timed region is the per-scan compute path: LOAM feature
extraction + scan-to-map GN odometry, on pre-staged device inputs.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.models.odometry import OdometryConfig, init_state, odometry_step
from lili_om_tpu.ops.features_spin import SpinFeatureConfig, extract_features_spin
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory
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

    # pre-simulate scans on CPU (not part of the timed pipeline)
    scans = []
    for k in range(N_WARM + N_TIMED):
        s = simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
        scans.append((
            jnp.asarray(np.asarray(s.pts), jnp.float32).reshape(R, C, 3),
            jnp.asarray(np.asarray(s.valid)).reshape(R, C),
            jnp.asarray(np.asarray(s.rel_time), jnp.float32).reshape(R, C),
        ))

    state = init_state(ocfg, dtype=jnp.float32)

    def frame(state, img, valid, rel):
        fc = extract_features_spin(img, valid, rel, fcfg)
        return odometry_step(state, fc.surf_pts, fc.surf_mask, ocfg)

    # warmup / compile
    for k in range(N_WARM):
        state, out = frame(state, *scans[k])
    out.t.block_until_ready()

    t0 = time.perf_counter()
    for k in range(N_WARM, N_WARM + N_TIMED):
        state, out = frame(state, *scans[k])
    out.t.block_until_ready()
    dt = time.perf_counter() - t0

    scans_per_s = N_TIMED / dt
    print(json.dumps({
        "metric": "frontend_scans_per_sec",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
