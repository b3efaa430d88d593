"""Dev benchmark: single-program vs split-dispatch (and split+Pallas-kNN)
per-scan pipeline at the parity config, on whatever backend is live.

Usage: python examples/bench_variants.py [monolith|split|split_pallas ...]
(defaults to all three). Run ONE at a time on the tunnel TPU if compile
time matters; each variant compiles its own programs.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R, C, PERIOD = 64, 1800, 0.1
N_WARM = 3
N_TIMED = 20


def make_inputs():
    from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
    from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
    from lili_om_tpu.sim.world import make_room_world

    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)
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
    return scans


def run_variant(name, scans):
    from lili_om_tpu.models.fusion import (fusion_step, fusion_step_split,
                                           init_fusion_state)
    from lili_om_tpu.models.odometry import (init_state, odometry_step,
                                             odometry_step_split)
    from lili_om_tpu.ops.features_spin import extract_features_spin
    from lili_om_tpu.utils.config import load_config

    cfg = load_config("fr_iosb_rot")
    fcfg = cfg.spin_features
    ocfg = cfg.odometry
    bcfg = cfg.fusion._replace(max_num_iter=15, imu_cap=32)
    noise = cfg.imu_noise

    split = name.startswith("split")
    ostate = init_state(ocfg, dtype=jnp.float32)
    fstate = init_fusion_state(bcfg, noise, dtype=jnp.float32)

    def frame(ostate, fstate, img, valid, rel, dts, accs, gyrs, vm):
        fc = extract_features_spin(img, valid, rel, fcfg)
        ostep = odometry_step_split if split else odometry_step
        ostate, out = ostep(ostate, fc.surf_pts, fc.surf_mask, ocfg,
                            n_rounds=ocfg.scan_match_cnt)
        if split:
            fstate, fout = fusion_step_split(
                fstate, fc.surf_pts, fc.surf_mask,
                jnp.zeros_like(fc.surf_pts[:, 0]),
                fc.edge_pts, fc.edge_mask, dts, accs, gyrs, vm, bcfg, noise)
        else:
            fstate, fout = fusion_step(
                fstate, fc.surf_pts, fc.surf_mask,
                jnp.zeros_like(fc.surf_pts[:, 0]),
                fc.edge_pts, fc.edge_mask, dts, accs, gyrs, vm, bcfg, noise)
        return ostate, fstate, fout

    t_c0 = time.perf_counter()
    for k in range(N_WARM):
        ostate, fstate, fout = frame(ostate, fstate, *scans[k])
    np.asarray(fout.t_latest)
    t_compile = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for k in range(N_WARM, N_WARM + N_TIMED):
        ostate, fstate, fout = frame(ostate, fstate, *scans[k])
    np.asarray(fout.t_latest)
    dt = time.perf_counter() - t0
    print(f"{name}: {N_TIMED / dt:.2f} scans/s ({1e3 * dt / N_TIMED:.1f} ms/scan; "
          f"warm+compile {t_compile:.0f}s)", flush=True)
    return N_TIMED / dt


def main():
    variants = sys.argv[1:] or ["monolith", "split", "split_pallas"]
    scans = make_inputs()
    for v in variants:
        import lili_om_tpu.ops.knn as knn_mod
        knn_mod._PALLAS_KNN = "1" if v == "split_pallas" else "0"
        run_variant(v, scans)


if __name__ == "__main__":
    main()
