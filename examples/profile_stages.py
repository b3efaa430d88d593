"""Per-program device timing at the parity config (split-dispatch phases).

Each jitted program is dispatched REPS times back-to-back with one sync at
the end — amortizes the tunnel RTT, so the per-call figure is device time
plus enqueue overhead. Usage: python examples/profile_stages.py [reps]
"""
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
R, C, PERIOD = 64, 1800, 0.1


def timeit(name, fn, *args, sync=None, reps=REPS):
    out = fn(*args)  # compile
    s = sync(out) if sync else np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    s = sync(out) if sync else np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {1e3 * dt:8.2f} ms", flush=True)
    return dt


import jax  # noqa: E402  (after sys.path fix)


def main():
    from lili_om_tpu.models import fusion as F
    from lili_om_tpu.models import odometry as O
    from lili_om_tpu.ops import knn as K
    from lili_om_tpu.ops.features_spin import extract_features_spin
    from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
    from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
    from lili_om_tpu.sim.world import make_room_world
    from lili_om_tpu.utils.config import load_config

    cfg = load_config("fr_iosb_rot")
    fcfg = cfg.spin_features
    ocfg = cfg.odometry
    bcfg = cfg.fusion._replace(max_num_iter=15, imu_cap=32)
    noise = cfg.imu_noise

    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)

    # warm a few frames so states/maps are realistic
    ostate = O.init_state(ocfg, dtype=jnp.float32)
    fstate = F.init_fusion_state(bcfg, noise, dtype=jnp.float32)
    frames = []
    for k in range(4):
        s = simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
        imu = simulate_imu(traj, max(k - 1, 0) * PERIOD, k * PERIOD, rate=200.0)
        n = min(len(imu.stamps) - 1, 32)
        dts = jnp.zeros((32,), jnp.float32).at[:n].set(jnp.diff(imu.stamps)[:n].astype(jnp.float32))
        accs = jnp.zeros((32, 3), jnp.float32).at[:n].set(imu.accs[1:n + 1].astype(jnp.float32))
        gyrs = jnp.zeros((32, 3), jnp.float32).at[:n].set(imu.gyrs[1:n + 1].astype(jnp.float32))
        vm = jnp.zeros((32,), bool).at[:n].set(True)
        frames.append((
            jnp.asarray(np.asarray(s.pts), jnp.float32).reshape(R, C, 3),
            jnp.asarray(np.asarray(s.valid)).reshape(R, C),
            jnp.asarray(np.asarray(s.rel_time), jnp.float32).reshape(R, C),
            dts, accs, gyrs, vm))

    fc = None
    for k, (img, valid, rel, dts, accs, gyrs, vm) in enumerate(frames):
        fc = extract_features_spin(img, valid, rel, fcfg)
        ostate, _ = O.odometry_step(ostate, fc.surf_pts, fc.surf_mask, ocfg,
                                    n_rounds=ocfg.scan_match_cnt)
        if k < 3:
            fstate, _ = F.fusion_step(
                fstate, fc.surf_pts, fc.surf_mask,
                jnp.zeros_like(fc.surf_pts[:, 0]), fc.edge_pts, fc.edge_mask,
                dts, accs, gyrs, vm, bcfg, noise,
                warmup=(k + 1 < bcfg.window))
    np.asarray(fstate.t)

    img, valid, rel, dts, accs, gyrs, vm = frames[-1]

    # --- stage timings ---
    timeit("features (per-ring ds)", lambda: extract_features_spin(img, valid, rel, fcfg),
           sync=lambda o: np.asarray(o.surf_pts[0]))
    fcfg_g = fcfg._replace(per_ring_ds=False)
    timeit("features (global ds)", lambda: extract_features_spin(img, valid, rel, fcfg_g),
           sync=lambda o: np.asarray(o.surf_pts[0]))

    # features internals
    from lili_om_tpu.ops import features_spin as FS
    from lili_om_tpu.ops.voxel import voxel_downsample
    curv_j = jax.jit(FS.curvature_image, static_argnames=("window",))
    timeit("  curvature stencil", lambda: curv_j(img, valid, window=5),
           sync=lambda o: np.asarray(o[0][0, 0]))
    curv, win_ok = curv_j(img, valid, window=5)
    nms_j = jax.jit(FS._local_extremum, static_argnames=("radius", "mode"))
    timeit("  NMS (one mode)", lambda: nms_j(curv, win_ok, radius=5, mode="max"),
           sync=lambda o: np.asarray(o[0, 0]))
    ring_ids = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None],
                                (R, C)).reshape(-1)
    timeit("  per-ring voxel ds 115k",
           lambda: voxel_downsample(img.reshape(-1, 3), valid.reshape(-1),
                                    fcfg.ds_leaf, fcfg.surf_cap,
                                    groups=ring_ids),
           sync=lambda o: np.asarray(o[0][0]))

    prep = O._odo_prepare(ostate, fc.surf_pts, fc.surf_mask, ocfg)
    t_g, q_g, scan_q, scan_m, map_pts, map_mask = prep
    timeit("odo prepare (2 voxel ds)",
           lambda: O._odo_prepare(ostate, fc.surf_pts, fc.surf_mask, ocfg),
           sync=lambda o: np.asarray(o[0]))
    pw = O._odo_world(t_g, q_g, scan_q)
    timeit("odo knn 4096x32768 XLA",
           lambda: K.knn(pw, map_pts, k=5, p_mask=map_mask),
           sync=lambda o: np.asarray(o[0][0]))
    if jax.default_backend() == "tpu":
        from lili_om_tpu.ops.knn_pallas import knn_pallas, knn_pallas_counted
        timeit("odo knn 4096x32768 Pallas",
               lambda: knn_pallas(pw, map_pts, k=5, p_mask=map_mask),
               sync=lambda o: np.asarray(o[0][0]))
        # the production default when masks are available: work scales
        # with the fill, not the capacities
        timeit("odo knn Pallas counted (prod)",
               lambda: knn_pallas_counted(pw, map_pts, k=5, p_mask=map_mask,
                                          q_mask=scan_m),
               sync=lambda o: np.asarray(o[0][0]))
    d2, idx = K.knn(pw, map_pts, k=5, p_mask=map_mask)
    timeit("odo round tail (fit+GN)",
           lambda: O._odo_round_tail(t_g, q_g, scan_q, scan_m, pw, map_pts,
                                     d2, idx, ocfg),
           sync=lambda o: np.asarray(o[0]))
    timeit("odo finalize (+table merge)",
           lambda: O._odo_finalize(ostate, scan_q, scan_m, fc.surf_pts,
                                   fc.surf_mask, t_g, q_g, t_g, q_g,
                                   jnp.zeros((), jnp.int32), ocfg),
           sync=lambda o: np.asarray(o[1].t))

    refl = jnp.zeros_like(fc.surf_pts[:, 0])
    ingest_j = jax.jit(F._ingest, static_argnames=("cfg", "noise"))
    timeit("fusion ingest only (A-E)",
           lambda: ingest_j(fstate, fc.surf_pts, fc.surf_mask, refl,
                            fc.edge_pts, fc.edge_mask, dts, accs, gyrs, vm,
                            cfg=bcfg, noise=noise),
           sync=lambda o: np.asarray(o.ts))
    maps_j = jax.jit(F._build_maps, static_argnames=("cfg",))
    timeit("fusion map build only",
           lambda: maps_j(fstate, cfg=bcfg),
           sync=lambda o: np.asarray(o[0][0]))
    pre = F._fusion_pre(fstate, fc.surf_pts, fc.surf_mask, refl,
                        fc.edge_pts, fc.edge_mask, dts, accs, gyrs, vm,
                        bcfg, noise)
    mid, maps, pw_s, pw_e = pre
    map_surf, map_refl, map_sm, map_edge, map_em, enough = maps
    timeit("fusion pre (ingest+maps)",
           lambda: F._fusion_pre(fstate, fc.surf_pts, fc.surf_mask, refl,
                                 fc.edge_pts, fc.edge_mask, dts, accs, gyrs,
                                 vm, bcfg, noise),
           sync=lambda o: np.asarray(o[0].ts))
    timeit("fusion surf knn 6144x32768 XLA",
           lambda: K.knn(pw_s, map_surf, k=5, p_mask=map_sm),
           sync=lambda o: np.asarray(o[0][0]))
    timeit("fusion edge knn 3072x8192 XLA",
           lambda: K.knn(pw_e, map_edge, k=5, p_mask=map_em),
           sync=lambda o: np.asarray(o[0][0]))
    if jax.default_backend() == "tpu":
        from lili_om_tpu.ops.knn_pallas import knn_pallas, knn_pallas_counted
        timeit("fusion surf knn Pallas",
               lambda: knn_pallas(pw_s, map_surf, k=5, p_mask=map_sm),
               sync=lambda o: np.asarray(o[0][0]))
        timeit("fusion edge knn Pallas",
               lambda: knn_pallas(pw_e, map_edge, k=5, p_mask=map_em),
               sync=lambda o: np.asarray(o[0][0]))
        timeit("fusion surf knn counted (prod)",
               lambda: knn_pallas_counted(pw_s, map_surf, k=5, p_mask=map_sm,
                                          q_mask=mid.win_surf_mask.reshape(-1)),
               sync=lambda o: np.asarray(o[0][0]))
        timeit("fusion edge knn counted (prod)",
               lambda: knn_pallas_counted(pw_e, map_edge, k=5, p_mask=map_em,
                                          q_mask=mid.win_edge_mask.reshape(-1)),
               sync=lambda o: np.asarray(o[0][0]))
    d2s, idxs = K.knn(pw_s, map_surf, k=5, p_mask=map_sm)
    d2e, idxe = K.knn(pw_e, map_edge, k=5, p_mask=map_em)
    timeit("fusion post (fits+15 GN+marg)",
           lambda: F._fusion_post(fstate, mid, map_surf, map_refl, map_edge,
                                  enough, pw_s, d2s, idxs, d2e, idxe, bcfg,
                                  noise),
           sync=lambda o: np.asarray(o[1].t_latest))


if __name__ == "__main__":
    main()
