"""Dataset-log pipeline run — the `roslaunch … + rosbag play` equivalent:
stream a .lom record log (native C++ readahead reader) through the full
system, print trajectory + timing, optionally export the map.

Usage:
  python examples/run_dataset.py record out.lom [n_frames]   # synth dataset
  python examples/run_dataset.py play out.lom [--preset synthetic] [--map out.pcd]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["record", "play"])
    ap.add_argument("path")
    ap.add_argument("n_frames", nargs="?", type=int, default=50)
    ap.add_argument("--preset", default="synthetic")
    ap.add_argument("--variant", default="rot", choices=["rot", "livox"],
                    help="sensor variant of the log (record AND play; the "
                         "livox play path bins at 2000 cols to match "
                         "record_synthetic's 2000-pt/line rosette)")
    ap.add_argument("--map", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.cmd == "record":
        from lili_om_tpu.io.dataset import record_synthetic

        t0 = time.time()
        record_synthetic(args.path, n_frames=args.n_frames,
                         variant=args.variant)
        print(f"recorded {args.n_frames} frames to {args.path} in {time.time()-t0:.1f}s")
        return 0

    import jax.numpy as jnp
    import numpy as np

    from lili_om_tpu.io.dataset import ImuRecord, ScanRecord, organize_scan, read_dataset
    from lili_om_tpu.models.system import LiliOmSystem
    from lili_om_tpu.utils.config import load_config

    cfg = load_config(args.preset)
    # density-matched Livox binning for the recorded 2000-pt/line rosette
    # (see LivoxFeatureConfig.n_cols — the default 4000 starves extraction)
    livox_cfg = (cfg.livox_features._replace(n_cols=2000)
                 if args.variant == "livox" else cfg.livox_features)
    sys_ = LiliOmSystem(
        odo_cfg=cfg.odometry, fusion_cfg=cfg.fusion, feat_cfg=cfg.spin_features,
        livox_cfg=livox_cfg, lc_cfg=cfg.loop_closure, noise=cfg.imu_noise,
        dtype=jnp.float32,
    )
    R, C = 16, 720
    t0 = time.time()
    n_scans = 0
    for rec in read_dataset(args.path):
        if isinstance(rec, ImuRecord):
            sys_.push_imu(np.array([rec.stamp]), rec.acc[None], rec.gyr[None])
        elif isinstance(rec, ScanRecord):
            if args.variant == "livox":
                out = sys_.process_scan_livox(
                    rec.pts, rec.line.astype(np.int32),
                    np.clip(rec.rel_time, 0, 0.999), rec.refl,
                    np.isfinite(rec.pts).all(axis=1), rec.stamp)
            else:
                img, valid, rel = organize_scan(rec, R, C)
                out = sys_.process_scan(img, valid, rel, rec.stamp)
            n_scans += 1
            if n_scans % 10 == 0:
                sys_.try_loop_closure()
                print(f"scan {n_scans:4d}  t={np.asarray(out.t).round(2)}  "
                      f"kf={len(sys_.kf_stamps)}")
    wall = time.time() - t0
    print(f"\nprocessed {n_scans} scans in {wall:.1f}s ({n_scans/wall:.1f} scans/s)")
    print(sys_.metrics.pretty())
    if args.map:
        n = sys_.export_map(args.map)
        print(f"exported global map: {n} points -> {args.map}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
