"""ROS1 bag reader: roundtrip against a programmatically written bag
(format per https://wiki.ros.org/Bags/Format/2.0)."""
import bz2
import struct

import numpy as np
import pytest

from lili_om_tpu.io.rosbag import ImuMsg, LivoxCustomMsg, PointCloud2Msg, read_bag


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        entry = k.encode() + b"=" + v
        out += struct.pack("<I", len(entry)) + entry
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _ros_header(stamp: float, frame: bytes = b"map") -> bytes:
    sec = int(stamp)
    nsec = int(round((stamp - sec) * 1e9))
    return struct.pack("<III", 0, sec, nsec) + struct.pack("<I", len(frame)) + frame


def _imu_msg(stamp, q_wxyz, gyr, acc) -> bytes:
    body = _ros_header(stamp)
    w, x, y, z = q_wxyz
    vals = [x, y, z, w] + [0.0] * 9 + list(gyr) + [0.0] * 9 + list(acc) + [0.0] * 9
    return body + struct.pack("<" + "d" * len(vals), *vals)


def _pc2_msg(stamp, pts: np.ndarray, intensity: np.ndarray) -> bytes:
    n = len(pts)
    body = _ros_header(stamp)
    body += struct.pack("<II", 1, n)  # height, width
    fields = [(b"x", 0, 7, 1), (b"y", 4, 7, 1), (b"z", 8, 7, 1), (b"intensity", 12, 7, 1)]
    body += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        body += struct.pack("<I", len(name)) + name + struct.pack("<IBI", off, dt, cnt)
    step = 16
    body += struct.pack("<BII", 0, step, step * n)
    raw = np.concatenate([pts.astype("<f4"), intensity.astype("<f4")[:, None]], axis=1)
    data = raw.tobytes()
    body += struct.pack("<I", len(data)) + data
    body += struct.pack("<B", 1)  # is_dense
    return body


def _livox_msg(stamp, pts, offs, refl, line) -> bytes:
    body = _ros_header(stamp, b"livox")
    body += struct.pack("<Q", 123456789)
    body += struct.pack("<I", len(pts))
    body += b"\x00\x00\x00\x00"  # lidar_id + rsvd
    body += struct.pack("<I", len(pts))
    for i in range(len(pts)):
        body += struct.pack("<Ifff", int(offs[i]), *pts[i])
        body += struct.pack("<BBB", int(refl[i]), 0, int(line[i]))
    return body


def _write_bag(path, messages, compression="none"):
    """messages: list of (conn_id, topic, type, payload)."""
    chunk = b""
    conns = {}
    for conn, topic, mtype, payload in messages:
        if conn not in conns:
            conns[conn] = (topic, mtype)
            conn_hdr = _header({"topic": topic.encode(), "type": mtype.encode(),
                                "md5sum": b"0" * 32, "message_definition": b""})
            chunk += _record({"op": b"\x07", "conn": struct.pack("<I", conn),
                              "topic": topic.encode()}, conn_hdr)
        chunk += _record({"op": b"\x02", "conn": struct.pack("<I", conn),
                          "time": struct.pack("<II", 0, 0)}, payload)
    if compression == "bz2":
        payload = bz2.compress(chunk)
    else:
        payload = chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", len(conns)),
                         "chunk_count": struct.pack("<I", 1)}, b"\x20" * 4096))
        f.write(_record({"op": b"\x05", "compression": compression.encode(),
                         "size": struct.pack("<I", len(chunk))}, payload))


def _write_bag_chunked(path, chunks, compression="none", index_pad=0):
    """Many-chunk writer (rosbag's real layout: one chunk per ~768 KB, with
    index-data records interleaved after each chunk)."""
    conns_written = set()
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                         "conn_count": struct.pack("<I", 1),
                         "chunk_count": struct.pack("<I", len(chunks))},
                        b"\x20" * 4096))
        for messages in chunks:
            chunk = b""
            for conn, topic, mtype, payload in messages:
                if conn not in conns_written:
                    conns_written.add(conn)
                    conn_hdr = _header({"topic": topic.encode(),
                                        "type": mtype.encode(),
                                        "md5sum": b"0" * 32,
                                        "message_definition": b""})
                    chunk += _record({"op": b"\x07",
                                      "conn": struct.pack("<I", conn),
                                      "topic": topic.encode()}, conn_hdr)
                chunk += _record({"op": b"\x02", "conn": struct.pack("<I", conn),
                                  "time": struct.pack("<II", 0, 0)}, payload)
            payload = bz2.compress(chunk) if compression == "bz2" else chunk
            f.write(_record({"op": b"\x05", "compression": compression.encode(),
                             "size": struct.pack("<I", len(chunk))}, payload))
            # index-data record after each chunk (op 0x04) — the streaming
            # reader must seek past these without loading them
            f.write(_record({"op": b"\x04", "ver": struct.pack("<I", 1),
                             "conn": struct.pack("<I", 0),
                             "count": struct.pack("<I", len(messages))},
                            b"\x00" * max(index_pad, 12 * len(messages))))


class _ReadTracker:
    """open() wrapper recording the largest single read — a proxy for the
    reader's peak buffer (a slurping reader's first read is the whole file)."""

    def __init__(self, f):
        self._f = f
        self.max_read = 0

    def read(self, n=-1):
        out = self._f.read(n)
        self.max_read = max(self.max_read, len(out))
        return out

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self._f.close()
        return False

    def __getattr__(self, k):
        return getattr(self._f, k)


class TestStreamingReader:
    def test_many_chunks_constant_memory(self, tmp_path, monkeypatch):
        """A multi-chunk bag parses correctly while the reader never issues
        a read larger than one chunk (streaming, not slurping — the real
        FR_IOSB/UTBM bags are multi-GB, VERDICT round 2 item 3)."""
        rng = np.random.default_rng(3)
        n_chunks, per_chunk = 40, 5
        chunks = []
        for c in range(n_chunks):
            msgs = []
            for m in range(per_chunk):
                stamp = c * per_chunk + m
                pts = rng.normal(size=(400, 3)).astype(np.float32)
                inten = rng.uniform(0, 100, 400).astype(np.float32)
                msgs.append((0, "/pts", "sensor_msgs/PointCloud2",
                             _pc2_msg(stamp, pts, inten)))
            chunks.append(msgs)
        p = str(tmp_path / "many.bag")
        _write_bag_chunked(p, chunks, index_pad=4096)
        chunk_bytes = 5 * (400 * 16 + 200)  # payloads + headers, generous

        import builtins
        trackers = []
        real_open = builtins.open

        def tracking_open(path_, *a, **kw):
            f = real_open(path_, *a, **kw)
            if str(path_) == p:
                tr = _ReadTracker(f)
                trackers.append(tr)
                return tr
            return f

        import lili_om_tpu.io.rosbag as rb
        monkeypatch.setattr("builtins.open", tracking_open)
        out = list(rb.read_bag(p))
        assert len(out) == n_chunks * per_chunk
        stamps = [m.stamp for _, m in out]
        assert stamps == sorted(stamps) and stamps[-1] == 199
        assert trackers and trackers[0].max_read <= chunk_bytes, \
            trackers[0].max_read

    def test_bz2_many_chunks(self, tmp_path):
        chunks = [[(0, "/imu/data", "sensor_msgs/Imu",
                    _imu_msg(float(c), [1.0, 0, 0, 0], [0, 0, 0], [0, 0, 9.8]))]
                  for c in range(10)]
        p = str(tmp_path / "bz.bag")
        _write_bag_chunked(p, chunks, compression="bz2")
        out = list(read_bag(p))
        assert len(out) == 10
        assert out[-1][1].stamp == pytest.approx(9.0)


class TestRosbagReader:
    def _roundtrip(self, tmp_path, compression):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        inten = rng.uniform(0, 100, 50).astype(np.float32)
        lpts = rng.normal(size=(30, 3)).astype(np.float32)
        offs = (np.arange(30) * 1000).astype(np.uint32)
        refl = rng.integers(0, 255, 30).astype(np.uint8)
        line = rng.integers(0, 6, 30).astype(np.uint8)
        msgs = [
            (0, "/imu/data", "sensor_msgs/Imu",
             _imu_msg(1.5, [1.0, 0, 0, 0], [0.1, 0.2, 0.3], [0, 0, 9.8])),
            (1, "/velodyne_points", "sensor_msgs/PointCloud2", _pc2_msg(1.6, pts, inten)),
            (2, "/livox/lidar", "livox_ros_driver/CustomMsg",
             _livox_msg(1.7, lpts, offs, refl, line)),
        ]
        p = str(tmp_path / f"t_{compression}.bag")
        _write_bag(p, msgs, compression)
        out = list(read_bag(p))
        assert [t for t, _ in out] == ["/imu/data", "/velodyne_points", "/livox/lidar"]
        imu = out[0][1]
        assert isinstance(imu, ImuMsg)
        assert imu.stamp == pytest.approx(1.5)
        np.testing.assert_allclose(imu.gyr, [0.1, 0.2, 0.3])
        np.testing.assert_allclose(imu.acc, [0, 0, 9.8])
        pc = out[1][1]
        assert isinstance(pc, PointCloud2Msg)
        np.testing.assert_allclose(pc.xyz(), pts, rtol=1e-6)
        np.testing.assert_allclose(pc.field("intensity"), inten, rtol=1e-6)
        lv = out[2][1]
        assert isinstance(lv, LivoxCustomMsg)
        np.testing.assert_allclose(lv.pts, lpts, rtol=1e-6)
        np.testing.assert_array_equal(lv.line, line)
        np.testing.assert_array_equal(lv.offset_time, offs)

    def test_uncompressed(self, tmp_path):
        self._roundtrip(tmp_path, "none")

    def test_bz2_chunks(self, tmp_path):
        self._roundtrip(tmp_path, "bz2")

    def test_topic_filter(self, tmp_path):
        msgs = [(0, "/imu/data", "sensor_msgs/Imu",
                 _imu_msg(1.0, [1.0, 0, 0, 0], [0, 0, 0], [0, 0, 9.8]))] * 3
        p = str(tmp_path / "f.bag")
        _write_bag(p, msgs, "none")
        assert len(list(read_bag(p, topics={"/other"}))) == 0
        assert len(list(read_bag(p, topics={"/imu/data"}))) == 3
