"""Driver benchmark: full per-scan SLAM pipeline throughput on one chip,
at the FR_IOSB-ROT **reference-parity** configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} with
FLOP/byte-accounted utilization figures alongside the throughput.

Parity config (vs round-1's reduced bench): 64-ring scan image (FR_IOSB-ROT
is a 64-line sensor, LiLi-OM-ROT/config/config_fr_iosb.yaml:12), odometry at
full capacities (scan 8192 / query 4096 / map 32768 — OdometryConfig
defaults mirroring the reference), backend window 3 × local map 50 keyframes
(ROT config:21) with max_num_iter=15 GN iterations (ROT config:22), ds_rate 4
(ROT config:13).

The timed path per scan = LOAM feature extraction + scan-to-map GN odometry
+ backend sliding-window fusion (IMU factors + lidar correspondence search +
marginalization). That is *stricter* than the reference, which runs the
backend only on keyframes (~every 2-3 scans); here every scan pays the full
backend too.

Baseline: the reference's real-time envelope is 10 Hz scan processing
(README.md:32; BASELINE.md) — ``vs_baseline`` = scans/s ÷ 10.

Utilization accounting (docs/MFU.md has the per-kernel derivation): the
pipeline's hot kernels are kNN distance matmuls + top-k extraction —
arithmetic intensity ~1.5 flop/byte, i.e. HBM-bound, so the meaningful
roofline is memory bandwidth; MFU is reported for completeness.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.models.fusion import (fusion_step, fusion_step_split,
                                       init_fusion_state)
from lili_om_tpu.models.odometry import (init_state, odometry_step,
                                         odometry_step_split)
from lili_om_tpu.ops.features_spin import extract_features_spin
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
from lili_om_tpu.sim.world import make_room_world
from lili_om_tpu.utils.config import load_config

R, C, PERIOD = 64, 1800, 0.1
N_WARM = 3
N_TIMED = 20

# chip peaks for utilization accounting (TPU v5e / "v5 lite")
PEAK_F32_FLOPS = 49.2e12  # MXU f32
PEAK_HBM_BYTES = 819e9


def hot_path_accounting(ocfg, bcfg, n_odo_rounds: int, pallas_knn: bool):
    """Analytic FLOPs + HBM bytes per scan for the hot kernels. Each entry:
    (flops, bytes, where). Distance matmuls count 2·Q·P·3. HBM bytes depend
    on the kNN backend: the XLA path writes the Q×P distance tile once and
    re-reads it (k+1)× for the min-extractions; the fused Pallas kernel
    (ops/knn_pallas.py) keeps tiles in VMEM — HBM traffic is just the
    operands + outputs, and the cost moves to VPU min-extraction passes."""
    k = 5
    ks = {}

    def knn(Q, P):
        flops = 6 * Q * P  # |q−p|² via the Q×3×P matmul
        if pallas_knn:
            # operands + (d,i) out. The full (3,P) points block has a
            # constant index map over the q-block grid, so Mosaic's pipeline
            # keeps it VMEM-resident across grid steps (it fits: 3·P·4 B ≤
            # 0.4 MB); if it were re-fetched per step the points term would
            # be ×ceil(Q/q_block). We count the resident (single-fetch)
            # model and flag the assumption here.
            bytes_ = 4 * (3 * Q + 3 * P + 2 * k * Q)
        else:
            bytes_ = 4 * Q * P * (1 + (k + 1))  # write D once, re-read (k+1)×
        return flops, bytes_

    f, b = knn(ocfg.query_cap, ocfg.map_cap)
    ks["odometry_knn"] = (n_odo_rounds * f, n_odo_rounds * b,
                          "frontend 5-NN, per matching round")
    W = bcfg.window
    f, b = knn(W * bcfg.kf_surf_cap, bcfg.map_surf_cap)
    ks["fusion_surf_knn"] = (f, b, "window-flattened surf 5-NN")
    f, b = knn(W * bcfg.kf_edge_cap, bcfg.map_edge_cap)
    ks["fusion_edge_knn"] = (f, b, "window-flattened edge 5-NN")
    # plane/line fits: eig3+solve3 ≈ 250 flop per query; GN assembly ≈
    # 6×6 outer products per correspondence
    q_all = n_odo_rounds * ocfg.query_cap + W * (bcfg.kf_surf_cap + bcfg.kf_edge_cap)
    ks["fits_and_gn"] = (q_all * 400 * max(bcfg.max_num_iter, ocfg.gn_iters),
                         q_all * 4 * 40, "closed-form fits + IRLS-GN assembly")
    ks["features"] = (R * C * 150, R * C * 4 * 30, "curvature stencil + NMS + top-k")
    return ks


def effective_knn_accounting(ks, counts, pallas_knn: bool,
                             q_block: int = 256, tile_p: int = 4096,
                             k: int = 5):
    """Replace the kNN rows of ``ks`` with fill-dependent figures.

    ``counts[name] = (q_valid, p_valid, q_cap, p_cap, rounds)``. The counted
    kernel (ops/knn_pallas.py:knn_pallas_counted) walks only
    ceil(p_valid/tile_p) map tiles and skips all-invalid query blocks, so
    effective work rounds the valid counts up to those granularities (and
    never exceeds capacity). Fit/GN/feature programs still run at capacity
    shapes — only the kNN rows change.

    Assumes FRONT-COMPACTED masks: p_eff rounds the popcount up, but the
    counted kernel walks tiles up to the LAST valid row, so a sparse
    non-compacted table would make these figures an underestimate. The
    production voxel tables emit valid-first (ops/voxel.py), so the
    assumption holds for everything measured here.

    Only the Pallas counted kernel has fill-dependent work — the XLA tiled
    fallback computes the full capacity-shaped Q×P distance tile regardless
    of fill, so when ``pallas_knn`` is False the capacity figures are
    returned unchanged."""
    if not pallas_knn:
        return dict(ks)
    eff = dict(ks)
    for name, (qv, pv, qcap, pcap, rounds) in counts.items():
        q_eff = min(-(-qv // q_block) * q_block, qcap)
        p_eff = min(-(-pv // tile_p) * tile_p, pcap)
        f = rounds * 6 * q_eff * p_eff
        b = rounds * 4 * (3 * q_eff + 3 * p_eff + 2 * k * q_eff)
        eff[name] = (f, b, ks[name][2])
    return eff


def main():
    cfg = load_config("fr_iosb_rot")
    fcfg = cfg.spin_features  # ds_rate=4, surf_cap 8192
    ocfg = cfg.odometry  # scan 8192 / query 4096 / map 32768, scan_match_cnt 1
    bcfg = cfg.fusion._replace(max_num_iter=15, imu_cap=32)  # ROT yaml:22
    noise = cfg.imu_noise

    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)

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

    # production path: split dispatch on TPU (standalone kNN launches →
    # fused Pallas kernel via knn_auto's top-level policy), single-program
    # on other backends — exactly LiliOmSystem's default wiring
    split = jax.default_backend() == "tpu"
    ostep = odometry_step_split if split else odometry_step
    fstep = fusion_step_split if split else fusion_step

    def frame(ostate, fstate, img, valid, rel, dts, accs, gyrs, vm):
        fc = extract_features_spin(img, valid, rel, fcfg)
        ostate, out = ostep(ostate, fc.surf_pts, fc.surf_mask, ocfg,
                            n_rounds=ocfg.scan_match_cnt)
        fstate, fout = fstep(
            fstate, fc.surf_pts, fc.surf_mask, jnp.zeros_like(fc.surf_pts[:, 0]),
            fc.edge_pts, fc.edge_mask, dts, accs, gyrs, vm, bcfg, noise)
        return ostate, fstate, fout

    for k in range(N_WARM):
        # the main fusion program handles an unfilled window gracefully
        # (no correspondences -> prior+IMU only), so the bench compiles ONE
        # fusion variant instead of warmup+main (halves driver compile time)
        ostate, fstate, fout = frame(ostate, fstate, *scans[k])
    np.asarray(fout.t_latest)  # real sync (block_until_ready is a tunnel no-op)

    # Variance-hardened timing (the tunnel's RTT and per-session windows
    # swing reps ±50 %, CLAUDE.md): per-scan time is the DIFFERENCE of a
    # short and a long block — each block carries exactly one host sync, so
    # the fixed RTT + sync overhead cancels. The MEDIAN over 3 pairs is the
    # estimator: a MIN would systematically select cross-window artifacts
    # (short block in a slow window next to a long block in a fast one
    # yields a per-scan time faster than either window — an underestimate
    # the hardware never achieved). State persists across blocks (the sim
    # scans cycle; cost is shape-dependent, and the map fill is saturated
    # after warmup, so re-visiting frames does not change the measured
    # work).
    timed = scans[N_WARM:]

    def run_block(ostate, fstate, n):
        t0 = time.perf_counter()
        for k in range(n):
            ostate, fstate, fout = frame(ostate, fstate, *timed[k % N_TIMED])
        np.asarray(fout.t_latest)  # host sync (one per block)
        return time.perf_counter() - t0, ostate, fstate

    N_LONG = 3 * N_TIMED
    pairs = []
    for _ in range(3):
        t_short, ostate, fstate = run_block(ostate, fstate, N_TIMED)
        t_long, ostate, fstate = run_block(ostate, fstate, N_LONG)
        per_scan = (t_long - t_short) / (N_LONG - N_TIMED)
        if per_scan > 0:
            pairs.append(per_scan)
    if pairs:
        est = float(np.median(pairs))
    else:  # pathological timing window — fall back to one plain block
        t_long, ostate, fstate = run_block(ostate, fstate, N_LONG)
        est = t_long / N_LONG

    scans_per_s = 1.0 / est
    pallas = split  # knn_auto dispatches Pallas on top-level TPU calls
    ks = hot_path_accounting(ocfg, bcfg, ocfg.scan_match_cnt, pallas_knn=pallas)
    flops_per_scan = sum(v[0] for v in ks.values())
    bytes_per_scan = sum(v[1] for v in ks.values())
    mfu = flops_per_scan * scans_per_s / PEAK_F32_FLOPS
    hbm_util = bytes_per_scan * scans_per_s / PEAK_HBM_BYTES

    # Effective (fill-dependent) kNN accounting: the production counted
    # kernel (ops/knn_pallas.py:knn_pallas_counted) walks only the tiles
    # holding valid map entries and skips all-invalid query blocks, so its
    # work scales with the FILL at these granularities (q_block 256,
    # tile_p 4096), not the static capacities the table above assumes.
    # Measured by re-running the (cached) prepare programs on the POST-RUN
    # state — i.e. the fills a hypothetical next frame would see (the map
    # fill is saturated by then, so it differs from the last timed frame by
    # at most one keyframe's worth of centroids). Fit/GN/feature programs
    # still run at capacity shapes, so only the kNN rows change; on the
    # XLA fallback backend the rows keep their capacity figures (see
    # effective_knn_accounting).
    fills, eff = {}, dict(ks)
    try:
        from lili_om_tpu.models.fusion import _fusion_pre
        from lili_om_tpu.models.odometry import _odo_prepare
        img, valid, rel, dts, accs, gyrs, vm = scans[N_WARM + N_TIMED - 1]
        fc = extract_features_spin(img, valid, rel, fcfg)
        _, _, _, sq_mask, _, omap_mask = _odo_prepare(
            ostate, fc.surf_pts, fc.surf_mask, ocfg)
        mid, maps, _, _ = _fusion_pre(
            fstate, fc.surf_pts, fc.surf_mask,
            jnp.zeros_like(fc.surf_pts[:, 0]), fc.edge_pts, fc.edge_mask,
            dts, accs, gyrs, vm, bcfg, noise)
        counts = {
            "odometry_knn": (int(np.asarray(sq_mask.sum())),
                             int(np.asarray(omap_mask.sum())),
                             ocfg.query_cap, ocfg.map_cap,
                             ocfg.scan_match_cnt),
            "fusion_surf_knn": (int(np.asarray(mid.win_surf_mask.sum())),
                                int(np.asarray(maps[2].sum())),
                                bcfg.window * bcfg.kf_surf_cap,
                                bcfg.map_surf_cap, 1),
            "fusion_edge_knn": (int(np.asarray(mid.win_edge_mask.sum())),
                                int(np.asarray(maps[4].sum())),
                                bcfg.window * bcfg.kf_edge_cap,
                                bcfg.map_edge_cap, 1),
        }
        fills = {n: {"q": c[0], "q_cap": c[2], "p": c[1], "p_cap": c[3]}
                 for n, c in counts.items()}
        eff = effective_knn_accounting(ks, counts, pallas_knn=pallas)
    except Exception as e:  # accounting must never take the bench down
        fills = {"error": repr(e)}
    flops_eff = sum(v[0] for v in eff.values())
    bytes_eff = sum(v[1] for v in eff.values())

    print(json.dumps({
        "metric": "full_pipeline_scans_per_sec_parity64",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / 10.0, 2),
        "ms_per_scan": round(1e3 / scans_per_s, 2),
        "config": "fr_iosb_rot 64x1800, odo 4096x32768, fusion W3xM50 iter15",
        "knn_backend": "pallas_fused" if pallas else "xla_tiled",
        "hot_flops_per_scan": round(flops_per_scan / 1e9, 3),
        "hot_bytes_per_scan_gb": round(bytes_per_scan / 1e9, 3),
        "hot_flops_per_scan_effective": round(flops_eff / 1e9, 3),
        "hot_bytes_per_scan_effective_gb": round(bytes_eff / 1e9, 3),
        "fills": fills,
        "mfu": round(mfu, 5),
        "hbm_utilization": round(hbm_util, 3),
        "bound": ("vpu min-extraction + voxel sorts (kNN tiles stay in VMEM)"
                  if pallas else
                  "hbm (knn intensity ~1.5 flop/byte; see docs/MFU.md)"),
    }))


if __name__ == "__main__":
    main()
