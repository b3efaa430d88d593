"""Velodyne raw-packet decoder (the UTBM path): encode/decode roundtrip,
bag parsing, and end-to-end ingestion through examples/run_bag.py —
replacing the reference's velodyne_pointcloud cloud_node
(LiLi-OM-ROT/launch/run_utbm.launch:6-14)."""
import struct
import subprocess
import sys

import numpy as np
import pytest

from lili_om_tpu.io.velodyne import (MODELS, VelodyneScanMsg, decode_packets,
                                     encode_packets)

from test_rosbag import _imu_msg, _ros_header, _write_bag


def _grid_points(model="HDL32E", n=200, seed=0):
    """Points exactly on the packet quantization grid (0.01° az, 2 mm range),
    generated per (azimuth, laser) so encode→decode is lossless."""
    vert, ring_of_laser, n_lasers = MODELS[model]
    rng = np.random.default_rng(seed)
    az_deg = rng.integers(0, 36000, n) * 0.01
    laser = rng.integers(0, n_lasers, n)
    dist = rng.integers(500, 25000, n) * 0.002
    v = np.deg2rad(vert[laser])
    a = np.deg2rad(az_deg)
    pts = np.stack([dist * np.cos(v) * np.cos(a),
                    -dist * np.cos(v) * np.sin(a),
                    dist * np.sin(v)], axis=1)
    return pts, ring_of_laser[laser].astype(np.int32)


class TestPacketCodec:
    @pytest.mark.parametrize("model", ["HDL32E", "VLP16"])
    def test_roundtrip(self, model):
        pts, ring = _grid_points(model)
        pkts = encode_packets(pts, ring, model=model)
        assert pkts.shape[1] == 1206
        dec = decode_packets(pkts, model=model)
        got = dec.pts[dec.valid]
        # encoder may merge duplicate (block, laser) slots — dedup expected
        uniq = {tuple(np.round(p, 6)) for p in pts}
        assert len(got) <= len(pts)
        assert len(got) >= 0.9 * len(uniq)
        # every decoded point matches one of the encoded ones on the grid
        d = np.linalg.norm(got[:, None, :] - pts[None, :, :], axis=-1)
        assert d.min(axis=1).max() < 3e-3

    def test_geometry(self):
        # a single known return: laser at ring 16 (0° for HDL-32E, fires at
        # slot 15), azimuth 90° → x≈0 (cos 90), y = −d (ROS frame)
        vert, ring_of_laser, _ = MODELS["HDL32E"]
        pts = np.array([[0.0, -10.0, 0.0]])
        ring = np.array([np.argsort(np.argsort(vert))[15]], np.int32)  # 0° laser
        pkts = encode_packets(pts, ring, model="HDL32E")
        dec = decode_packets(pkts, model="HDL32E")
        got = dec.pts[dec.valid]
        assert len(got) == 1
        np.testing.assert_allclose(got[0], [0.0, -10.0, 0.0], atol=2e-2)

    def test_intensity_and_valid(self):
        pts, ring = _grid_points(n=50, seed=3)
        inten = np.linspace(10, 200, 50)
        pkts = encode_packets(pts, ring, inten)
        dec = decode_packets(pkts)
        assert dec.valid.sum() <= 50
        assert dec.intensity[dec.valid].max() <= 255
        assert dec.intensity[dec.valid].min() >= 0
        # empty slots are invalid
        assert (~dec.valid).sum() == dec.valid.shape[0] - dec.valid.sum()


def _velodyne_scan_msg(stamp: float, packets: np.ndarray) -> bytes:
    body = _ros_header(stamp, b"velodyne")
    body += struct.pack("<I", len(packets))
    for p in packets:
        sec = int(stamp)
        nsec = int((stamp - sec) * 1e9)
        body += struct.pack("<II", sec, nsec) + p.tobytes()
    return body


class TestVelodyneBag:
    def test_bag_roundtrip(self, tmp_path):
        from lili_om_tpu.io.rosbag import read_bag

        pts, ring = _grid_points(n=100, seed=1)
        pkts = encode_packets(pts, ring)
        p = str(tmp_path / "v.bag")
        _write_bag(p, [
            (0, "/imu/data", "sensor_msgs/Imu",
             _imu_msg(0.5, [1.0, 0, 0, 0], [0, 0, 0], [0, 0, 9.8])),
            (1, "/velodyne_packets", "velodyne_msgs/VelodyneScan",
             _velodyne_scan_msg(0.6, pkts)),
        ])
        out = list(read_bag(p))
        assert len(out) == 2
        vs = out[1][1]
        assert isinstance(vs, VelodyneScanMsg)
        assert vs.packets.shape == pkts.shape
        np.testing.assert_array_equal(vs.packets, pkts)
        dec = decode_packets(vs.packets)
        assert dec.valid.sum() >= 90

    def test_run_bag_ingests_packets(self, tmp_path):
        """End-to-end: a packet-format bag flows through examples/run_bag.py
        (the reference needs an external decoder node; we don't)."""
        from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
        from lili_om_tpu.sim.trajectory import static_trajectory
        from lili_om_tpu.sim.world import make_room_world

        world = make_room_world()
        pattern = spinning_pattern(n_rings=32, n_cols=720)
        msgs = [(0, "/imu/data", "sensor_msgs/Imu",
                 _imu_msg(0.0, [1.0, 0, 0, 0], [0, 0, 0], [0, 0, 9.8]))]
        vert, ring_of_laser, _ = MODELS["HDL32E"]
        for k in range(3):
            ts = k * 0.1
            scan = simulate_scan(world, static_trajectory((0.0, 0.0, 1.0)),
                                 ts, pattern, period=0.1)
            pts = np.asarray(scan.pts[np.asarray(scan.valid)])
            pts = pts[:: max(1, len(pts) // 1500)]
            # assign rings by nearest HDL-32E laser elevation
            el = np.rad2deg(np.arctan2(pts[:, 2] - 0.0,
                                       np.linalg.norm(pts[:, :2], axis=1)))
            laser = np.abs(el[:, None] - vert[None, :]).argmin(axis=1)
            ring = ring_of_laser[laser].astype(np.int32)
            pkts = encode_packets(pts, ring)
            msgs.append((1, "/velodyne_packets", "velodyne_msgs/VelodyneScan",
                         _velodyne_scan_msg(ts, pkts)))
            msgs.append((0, "/imu/data", "sensor_msgs/Imu",
                         _imu_msg(ts + 0.05, [1.0, 0, 0, 0], [0, 0, 0],
                                  [0, 0, 9.8])))
        p = str(tmp_path / "utbm.bag")
        _write_bag(p, msgs)
        p_exp = str(tmp_path / "exp")
        r = subprocess.run(
            [sys.executable, "examples/run_bag.py", p, "--preset", "utbm_rot",
             "--cpu", "--max-scans", "3", "--export-dir", p_exp],
            capture_output=True, text=True, timeout=540, cwd=".")
        assert r.returncode == 0, r.stderr[-2000:]
        assert "3 scans" in r.stdout, r.stdout
        # the run-export bundle (TUM + PCD + PLY + overview PNG) was written
        import os
        for f in ("trajectory_kf.tum", "global_map.pcd", "global_map.ply",
                  "overview.png"):
            assert os.path.exists(os.path.join(p_exp, f)), f
