"""Dev ablation bench: attribute the per-scan cost of the split-dispatch
parity pipeline by removing/shrinking one stage at a time, measured the only
way the tunnel allows — whole-loop amortized wall time (CLAUDE.md: per-call
micro-timings under ~1 ms are unreliable through the RPC tunnel).

Variants (pass names as argv, default all):
  base       production split pipeline (= bench.py path)
  nofeat     feature extraction precomputed outside the timed loop
  fus_iter1  fusion max_num_iter=1 (GN loop cost)
  odo_gn1    odometry gn_iters=1 (frontend GN loop cost)
  dispatch   base + 8 extra trivial dispatches/frame (per-dispatch cost)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.bench_variants import make_inputs  # noqa: E402

N_WARM, N_TIMED, N_REP = 3, 20, 4


def run(name, scans, *, ocfg_mod=None, bcfg_mod=None, prefeat=False,
        extra_dispatch=0):
    from lili_om_tpu.models.fusion import fusion_step_split, init_fusion_state
    from lili_om_tpu.models.odometry import init_state, odometry_step_split
    from lili_om_tpu.ops.features_spin import extract_features_spin
    from lili_om_tpu.utils.config import load_config

    cfg = load_config("fr_iosb_rot")
    fcfg = cfg.spin_features
    ocfg = cfg.odometry
    bcfg = cfg.fusion._replace(max_num_iter=15, imu_cap=32)
    noise = cfg.imu_noise
    if ocfg_mod:
        ocfg = ocfg._replace(**ocfg_mod)
    if bcfg_mod:
        bcfg = bcfg._replace(**bcfg_mod)

    ostate = init_state(ocfg, dtype=jnp.float32)
    fstate = init_fusion_state(bcfg, noise, dtype=jnp.float32)

    feats = None
    if prefeat:
        feats = [extract_features_spin(s[0], s[1], s[2], fcfg)
                 for s in scans]
        np.asarray(feats[-1].surf_pts)

    tiny = jax.jit(lambda x: x + 1.0)
    tx = jnp.ones((8, 128), jnp.float32)

    def frame(ostate, fstate, k):
        img, valid, rel, dts, accs, gyrs, vm = scans[k]
        fc = feats[k] if prefeat else extract_features_spin(img, valid, rel, fcfg)
        ostate, out = odometry_step_split(ostate, fc.surf_pts, fc.surf_mask,
                                          ocfg, n_rounds=ocfg.scan_match_cnt)
        fstate, fout = fusion_step_split(
            fstate, fc.surf_pts, fc.surf_mask,
            jnp.zeros_like(fc.surf_pts[:, 0]),
            fc.edge_pts, fc.edge_mask, dts, accs, gyrs, vm, bcfg, noise)
        for _ in range(extra_dispatch):
            nonlocal_tx = tiny(tx)
        return ostate, fstate, fout

    t_c0 = time.perf_counter()
    for k in range(N_WARM):
        ostate, fstate, fout = frame(ostate, fstate, k)
    np.asarray(fout.t_latest)
    t_compile = time.perf_counter() - t_c0

    per = []
    for _ in range(N_REP):
        t0 = time.perf_counter()
        for k in range(N_WARM, N_WARM + N_TIMED):
            ostate, fstate, fout = frame(ostate, fstate, k)
        np.asarray(fout.t_latest)
        per.append((time.perf_counter() - t0) / N_TIMED * 1e3)
    best = min(per)
    print(f"{name:12s}: best {1e3 / best:6.2f} scans/s  ({best:5.2f} ms/scan; "
          f"reps {' '.join(f'{p:.2f}' for p in per)}; compile {t_compile:.0f}s)",
          flush=True)


VARIANTS = {
    "base": {},
    "nofeat": {"prefeat": True},
    "fus_iter1": {"bcfg_mod": {"max_num_iter": 1}},
    "fus_nolm": {"bcfg_mod": {"lm_lam0": 0.0}},
    "odo_gn1": {"ocfg_mod": {"gn_iters": 1}},
    "dispatch": {"extra_dispatch": 8},
}


def make_livox_inputs():
    """Livox-Horizon rosette sweeps (6×4000) + IMU windows — the
    `fr_iosb` (LiLi-OM Livox) measured config, BASELINE.md."""
    from lili_om_tpu.sim.lidar import livox_pattern, simulate_scan
    from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
    from lili_om_tpu.sim.world import make_room_world

    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = livox_pattern()
    scans = []
    for k in range(N_WARM + N_TIMED):
        s = simulate_scan(world, traj, k * 0.1, pattern, period=0.1)
        imu = simulate_imu(traj, max(k - 1, 0) * 0.1, k * 0.1, rate=200.0)
        n = min(len(imu.stamps) - 1, 32)
        dts = jnp.zeros((32,), jnp.float32).at[:n].set(
            jnp.diff(imu.stamps)[:n].astype(jnp.float32))
        accs = jnp.zeros((32, 3), jnp.float32).at[:n].set(
            imu.accs[1:n + 1].astype(jnp.float32))
        gyrs = jnp.zeros((32, 3), jnp.float32).at[:n].set(
            imu.gyrs[1:n + 1].astype(jnp.float32))
        vm = jnp.zeros((32,), bool).at[:n].set(True)
        scans.append((jnp.asarray(np.asarray(s.pts), jnp.float32),
                      jnp.asarray(np.asarray(s.line), jnp.int32),
                      jnp.asarray(np.asarray(s.rel_time), jnp.float32),
                      jnp.asarray(np.asarray(s.reflectivity), jnp.float32),
                      jnp.asarray(np.asarray(s.valid)),
                      dts, accs, gyrs, vm))
    return scans


def run_livox():
    """Full per-scan Livox pipeline (eigen-patch features, reflectivity-
    weighted fusion) at the `fr_iosb` preset — backend on EVERY scan, same
    strictness as bench.py's ROT config."""
    import jax as _jax

    from lili_om_tpu.models.fusion import fusion_step_split, init_fusion_state
    from lili_om_tpu.models.odometry import init_state, odometry_step_split
    from lili_om_tpu.ops.features_livox import (bin_livox_image,
                                                extract_features_livox)
    from lili_om_tpu.ops.voxel import voxel_downsample
    from lili_om_tpu.utils.config import load_config

    cfg = load_config("fr_iosb")
    lcfg, ocfg = cfg.livox_features, cfg.odometry
    bcfg = cfg.fusion._replace(max_num_iter=15, imu_cap=32)
    noise = cfg.imu_noise
    scans = make_livox_inputs()
    ostate = init_state(ocfg, dtype=jnp.float32)
    fstate = init_fusion_state(bcfg, noise, dtype=jnp.float32)

    @_jax.jit
    def pre(pts, line, ratio, refl, valid):
        # FormatConvert packing: curvature = 0.1·reflectivity
        # (FormatConvert.cpp:19-21); system.process_scan_livox mirrors this
        img, img_curv, img_valid = bin_livox_image(
            pts, line, ratio, 0.1 * refl, valid, lcfg)
        lf = extract_features_livox(img, img_curv, img_valid, lcfg)
        surf, sr, sm = voxel_downsample(lf.surf_pts, lf.surf_mask, 0.3,
                                        ocfg.scan_cap,
                                        feats=lf.surf_curv[:, None])
        return surf, sr[:, 0], sm, lf.edge_pts, lf.edge_mask

    def frame(ostate, fstate, k):
        pts, line, ratio, refl, valid, dts, accs, gyrs, vm = scans[k]
        surf, sr, sm, ep, em = pre(pts, line, ratio, refl, valid)
        ostate, _ = odometry_step_split(ostate, surf, sm, ocfg,
                                        n_rounds=ocfg.scan_match_cnt)
        fstate, fout = fusion_step_split(fstate, surf, sm, sr, ep, em,
                                         dts, accs, gyrs, vm, bcfg, noise)
        return ostate, fstate, fout

    t_c0 = time.perf_counter()
    for k in range(N_WARM):
        ostate, fstate, fout = frame(ostate, fstate, k)
    np.asarray(fout.t_latest)
    t_compile = time.perf_counter() - t_c0
    per = []
    for _ in range(N_REP):
        t0 = time.perf_counter()
        for k in range(N_WARM, N_WARM + N_TIMED):
            ostate, fstate, fout = frame(ostate, fstate, k)
        np.asarray(fout.t_latest)
        per.append((time.perf_counter() - t0) / N_TIMED * 1e3)
    best = min(per)
    print(f"{'livox':12s}: best {1e3 / best:6.2f} scans/s  ({best:5.2f} ms/scan; "
          f"reps {' '.join(f'{p:.2f}' for p in per)}; compile {t_compile:.0f}s)",
          flush=True)


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(VARIANTS)
    scans = None
    for n in names:
        if n == "livox":
            run_livox()
            continue
        if scans is None:
            scans = make_inputs()
        run(n, scans, **VARIANTS[n])


if __name__ == "__main__":
    main()
