"""Run the pipeline on a real ROS1 bag — the direct migration path from the
reference (`roslaunch lili_om run_*.launch` + `rosbag play seq.bag`,
README.md:57-76):

  python examples/run_bag.py seq.bag --preset fr_iosb_rot \
      --lidar /velodyne_points --imu /imu/data --map out.pcd

Livox bags (livox_ros_driver/CustomMsg) use the Livox extractor; PointCloud2
bags use the spinning extractor with the ring field (or the per-sensor
vertical-angle formulas when absent).
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("--preset", default="fr_iosb_rot")
    ap.add_argument("--lidar", default=None, help="lidar topic (default: auto)")
    ap.add_argument("--imu", default=None, help="imu topic (default: auto)")
    ap.add_argument("--map", default=None)
    ap.add_argument("--rings", type=int, default=None)
    ap.add_argument("--cols", type=int, default=1800)
    ap.add_argument("--max-scans", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--internal-imu", action="store_true",
                    help="Livox internal IMU: g→m/s² + gravity-align init")
    ap.add_argument("--serial", action="store_true",
                    help="inline single-thread processing (no pipeline overlap)")
    ap.add_argument("--ingest-hosts", type=int, default=1,
                    help="decode the raw scan stream on N parallel ingest "
                         "workers (runtime/ingest.py — the multi-host DCN "
                         "ingest split, SURVEY.md §2.3)")
    ap.add_argument("--live-viz", default=None, metavar="DIR",
                    help="live viewer directory (utils/live_viz.py — the "
                         "rviz-session analog; refreshes at the map-publish "
                         "cadence)")
    ap.add_argument("--live-port", type=int, default=0,
                    help="with --live-viz: serve DIR over HTTP on this port")
    ap.add_argument("--export-dir", default=None,
                    help="write TUM trajectory + PCD/PLY map + overview PNG")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from lili_om_tpu.io.livox import convert_internal_imu
    from lili_om_tpu.io.rosbag import ImuMsg, LivoxCustomMsg, PointCloud2Msg, read_bag
    from lili_om_tpu.io.velodyne import VelodyneScanMsg, decode_packets
    from lili_om_tpu.models.system import LiliOmSystem
    from lili_om_tpu.ops.features_spin import ring_from_angle
    from lili_om_tpu.runtime.ingest import ShardedIngest
    from lili_om_tpu.utils.config import load_config

    cfg = load_config(args.preset)
    rings = args.rings or (64 if "fr_iosb_rot" in args.preset else
                           32 if ("utbm" in args.preset or "hk" in args.preset)
                           else 16)
    from lili_om_tpu.runtime.pipeline import PipelineRunner

    sys_ = LiliOmSystem(
        odo_cfg=cfg.odometry, fusion_cfg=cfg.fusion, feat_cfg=cfg.spin_features,
        livox_cfg=cfg.livox_features, lc_cfg=cfg.loop_closure, noise=cfg.imu_noise,
        dtype=jnp.float32,
    )
    sys_.if_to_deskew = cfg.if_to_deskew  # yaml lidar_odometry/if_to_deskew
    sys_.mapping_interval = cfg.mapping_interval  # yaml backend_fusion/mapping_interval
    if args.live_viz:
        from lili_om_tpu.utils.live_viz import LiveViewer

        viewer = LiveViewer(args.live_viz, sys_)
        port = viewer.serve(args.live_port)  # 0 → ephemeral, printed below
        print(f"live viewer: http://localhost:{port}/ -> {args.live_viz}")
    # ingest, backend fusion, and loop closure overlap on the runner's
    # workers (the reference's 4-process topology + 1 Hz loop thread);
    # drop_when_full=False — offline replay must not drop scans
    runner = PipelineRunner(sys_, overlap=not args.serial,
                            drop_when_full=False, loop_period_s=1.0,
                            scan_period=cfg.scan_period)
    runner.start()

    def decode_scan(msg):
        """Per-scan decode (the host-side ingest cost): packet parse +
        ring/azimuth binning into the organized image. Runs on the ingest
        workers under --ingest-hosts > 1."""
        if isinstance(msg, LivoxCustomMsg):
            period = 0.1
            ratio = np.clip(msg.offset_time.astype(np.float32) * 1e-9 / period,
                            0, 0.999)
            return "livox", (msg.pts, msg.line.astype(np.int32), ratio,
                             msg.reflectivity.astype(np.float32),
                             np.isfinite(msg.pts).all(axis=1))
        if isinstance(msg, VelodyneScanMsg):
            # UTBM raw packets: the reference decodes with a
            # velodyne_pointcloud cloud_node (run_utbm.launch:6-14)
            dec = decode_packets(msg.packets,
                                 "HDL32E" if rings == 32 else "VLP16")
            pts, ring = dec.pts[dec.valid], dec.ring[dec.valid]
            finite = np.isfinite(pts).all(axis=1)
        else:
            pts = msg.xyz()
            finite = np.isfinite(pts).all(axis=1)
            if "ring" in msg.fields:
                ring = msg.field("ring").astype(np.int32)
            else:
                r, ok = ring_from_angle(jnp.asarray(pts, jnp.float32), rings)
                ring = np.asarray(r)
                finite &= np.asarray(ok)
        az = np.arctan2(pts[:, 1], pts[:, 0])
        rel = ((az + np.pi) / (2 * np.pi)).astype(np.float32)
        col = np.clip((rel * args.cols).astype(np.int64), 0, args.cols - 1)
        ring = np.clip(ring, 0, rings - 1)
        img = np.zeros((rings, args.cols, 3), np.float32)
        valid = np.zeros((rings, args.cols), bool)
        relimg = np.zeros((rings, args.cols), np.float32)
        img[ring[finite], col[finite]] = pts[finite]
        valid[ring[finite], col[finite]] = True
        relimg[ring[finite], col[finite]] = rel[finite]
        return "spin", (img, valid, relimg)

    ingest = ShardedIngest(runner, decode_scan, n_hosts=args.ingest_hosts)

    n_scans = 0
    t0 = time.time()
    imu_init = []
    q0_seeded = False
    for topic, msg in read_bag(args.bag):
        if isinstance(msg, ImuMsg) and (args.imu is None or topic == args.imu):
            acc, gyr = msg.acc, msg.gyr
            if args.internal_imu:
                imu_init.append(msg.acc)
                acc, gyr, q_grav = convert_internal_imu(msg.acc[None], msg.gyr[None])
                acc, gyr = acc[0], gyr[0]
                # gravity-aligned init, averaged over the first 3 samples
                # (InternalImuUnitConverter.py:34-58)
                if not q0_seeded and len(imu_init) == 3:
                    _, _, q_grav = convert_internal_imu(
                        np.stack(imu_init), np.zeros((3, 3)))
                    q0_seeded = sys_.set_initial_orientation(q_grav)
            elif not q0_seeded:
                # first IMU message's orientation quaternion seeds R₀
                # (imuHandler, BackendFusion.cpp:624-665)
                q0_seeded = sys_.set_initial_orientation(msg.orientation)
            runner.feed_imu(np.array([msg.stamp]), acc[None], gyr[None])
        elif isinstance(msg, (LivoxCustomMsg, PointCloud2Msg, VelodyneScanMsg)) \
                and (args.lidar is None or topic == args.lidar):
            ingest.feed_raw(msg, msg.stamp)
            n_scans += 1
        if n_scans and n_scans % 50 == 0 and sys_.trajectory:
            print(f"fed {n_scans} (done {runner.n_processed})  "
                  f"kf={len(sys_.kf_stamps)}  "
                  f"loops={runner.loop_closures}  "
                  f"t={np.asarray(sys_.trajectory[-1]).round(2)}")
        if args.max_scans and n_scans >= args.max_scans:
            break

    ingest.close()
    runner.stop(drain=True)
    wall = time.time() - t0
    print(f"\n{runner.n_processed} scans, {len(sys_.kf_stamps)} keyframes, "
          f"{int(sys_.graph.n_loops)} loop factors "
          f"({runner.loop_closures} closures, {runner.n_recoveries} recoveries), "
          f"{wall:.1f}s ({runner.n_processed/max(wall,1e-9):.1f} scans/s)")
    print(sys_.metrics.pretty())
    if args.map:
        n = sys_.export_map(args.map)
        print(f"map: {n} points -> {args.map}")
    if args.export_dir:
        from lili_om_tpu.utils.viz import export_run

        est = np.asarray(sys_.trajectory) if sys_.trajectory else None
        for k, v in export_run(args.export_dir, sys_, est_t=est).items():
            print(f"exported {k}: {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
