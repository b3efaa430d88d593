"""Sustained-ingest benchmark (VERDICT r4 task 8): generate a multi-GB
synthetic rosbag, stream it through the record-by-record reader
(io/rosbag.py) + the per-scan decode + the ``ShardedIngest`` worker split,
and record sustained scans/s and the resident-memory profile over the full
pass. This isolates the INGEST half of the system (reader + decode + DCN
split) from the sequential SLAM filter — the claim under test is
">10 Hz sustained ingest at constant RSS over a bag far larger than RAM
would allow a slurping reader".

Usage:
  python examples/bench_ingest.py gen /tmp/big.bag --scans 2000   (~1 GB)
  python examples/bench_ingest.py run /tmp/big.bag --ingest-hosts 4
"""
import argparse
import resource
import struct
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

PTS_PER_SCAN = 32768  # ~512 KB PointCloud2 payload per scan at 10 Hz
RINGS, COLS = 32, 1800


def _hdr(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        e = k.encode() + b"=" + v
        out += struct.pack("<I", len(e)) + e
    return out


def _rec(fields: dict, data: bytes) -> bytes:
    h = _hdr(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _pc2(stamp: float, pts: np.ndarray, intensity: np.ndarray) -> bytes:
    """Vectorized PointCloud2 encode (same wire format as the reference's
    /velodyne_points stream)."""
    sec = int(stamp)
    body = struct.pack("<III", 0, sec, int((stamp - sec) * 1e9))
    body += struct.pack("<I", 3) + b"map"
    n = len(pts)
    body += struct.pack("<II", 1, n)
    fields = [(b"x", 0), (b"y", 4), (b"z", 8), (b"intensity", 12)]
    body += struct.pack("<I", len(fields))
    for name, off in fields:
        body += struct.pack("<I", len(name)) + name + struct.pack("<IBI", off, 7, 1)
    body += struct.pack("<BII", 0, 16, 16 * n)
    raw = np.concatenate([pts.astype("<f4"),
                          intensity.astype("<f4")[:, None]], axis=1).tobytes()
    body += struct.pack("<I", len(raw)) + raw + struct.pack("<B", 1)
    return body


def _imu(stamp: float, gyr, acc) -> bytes:
    sec = int(stamp)
    body = struct.pack("<III", 0, sec, int((stamp - sec) * 1e9))
    body += struct.pack("<I", 3) + b"map"
    vals = [0.0, 0.0, 0.0, 1.0] + [0.0] * 9 + list(gyr) + [0.0] * 9 \
        + list(acc) + [0.0] * 9
    return body + struct.pack("<" + "d" * len(vals), *vals)


def gen(path: str, n_scans: int):
    """One ~1 MB chunk per scan (rosbag's real granularity), IMU at 200 Hz
    interleaved, index records after each chunk — the layout the streaming
    reader must seek through."""
    rng = np.random.default_rng(0)
    t0 = time.time()
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_rec({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                      "conn_count": struct.pack("<I", 2),
                      "chunk_count": struct.pack("<I", n_scans)},
                     b"\x20" * 4096))
        conns = b""
        for cid, (topic, mtype) in enumerate(
                [("/velodyne_points", "sensor_msgs/PointCloud2"),
                 ("/imu/data", "sensor_msgs/Imu")]):
            ch = _hdr({"topic": topic.encode(), "type": mtype.encode(),
                       "md5sum": b"0" * 32, "message_definition": b""})
            conns += _rec({"op": b"\x07", "conn": struct.pack("<I", cid),
                           "topic": topic.encode()}, ch)
        for k in range(n_scans):
            stamp = k * 0.1
            pts = rng.uniform(-40, 40, (PTS_PER_SCAN, 3)).astype(np.float32)
            inten = rng.uniform(0, 100, PTS_PER_SCAN).astype(np.float32)
            chunk = conns if k == 0 else b""
            for j in range(20):  # 200 Hz IMU
                ts = stamp + j * 0.005
                chunk += _rec({"op": b"\x02", "conn": struct.pack("<I", 1),
                               "time": struct.pack("<II", int(ts), 0)},
                              _imu(ts, [0, 0, 0.1], [0, 0, 9.805]))
            chunk += _rec({"op": b"\x02", "conn": struct.pack("<I", 0),
                           "time": struct.pack("<II", int(stamp), 0)},
                          _pc2(stamp, pts, inten))
            f.write(_rec({"op": b"\x05", "compression": b"none",
                          "size": struct.pack("<I", len(chunk))}, chunk))
            f.write(_rec({"op": b"\x04", "ver": struct.pack("<I", 1),
                          "conn": struct.pack("<I", 0),
                          "count": struct.pack("<I", 21)}, b"\x00" * 256))
    import os

    print(f"wrote {path}: {os.path.getsize(path) / 2**30:.2f} GiB, "
          f"{n_scans} scans + {20 * n_scans} IMU msgs "
          f"({time.time() - t0:.1f}s)")


class _CountingSink:
    """Runner stand-in: counts decoded scans (the SLAM filter is benched
    separately — bench.py; here the ingest path is the system under test)."""

    def __init__(self):
        self.n = 0
        self.checksum = 0.0

    def feed_scan(self, img, valid, rel, stamp):
        self.n += 1
        # touch the arrays so the decode cannot be elided
        self.checksum += float(img[0, 0, 0]) + float(valid.sum() % 7)

    def feed_scan_livox(self, *a):
        self.n += 1


def rss_mb():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * resource.getpagesize() / 2**20


def decode(msg):
    """Module-level, numpy-only, PICKLABLE (required for --processes; and
    jax-free so worker processes stay lightweight). Ring from the vertical
    angle (HDL-32E band), azimuth → column — the run_bag.py decode shape."""
    pts = msg.xyz()
    finite = np.isfinite(pts).all(axis=1)
    rng_xy = np.linalg.norm(pts[:, :2], axis=1)
    vert = np.degrees(np.arctan2(pts[:, 2], np.maximum(rng_xy, 1e-9)))
    ring = np.clip(((vert + 30.67) / (41.34 / (RINGS - 1))).astype(np.int64),
                   0, RINGS - 1)
    az = np.arctan2(pts[:, 1], pts[:, 0])
    rel = ((az + np.pi) / (2 * np.pi)).astype(np.float32)
    col = np.clip((rel * COLS).astype(np.int64), 0, COLS - 1)
    img = np.zeros((RINGS, COLS, 3), np.float32)
    valid = np.zeros((RINGS, COLS), bool)
    relimg = np.zeros((RINGS, COLS), np.float32)
    img[ring[finite], col[finite]] = pts[finite]
    valid[ring[finite], col[finite]] = True
    relimg[ring[finite], col[finite]] = rel[finite]
    return "spin", (img, valid, relimg)


def run(path: str, n_hosts: int, processes: bool = False):
    from lili_om_tpu.io.rosbag import ImuMsg, PointCloud2Msg, read_bag
    from lili_om_tpu.runtime.ingest import ShardedIngest

    sink = _CountingSink()
    ingest = ShardedIngest(sink, decode, n_hosts=n_hosts,
                           processes=processes)
    n_imu = 0
    rss_samples = [rss_mb()]
    t0 = time.time()
    for topic, msg in read_bag(path):
        if isinstance(msg, ImuMsg):
            n_imu += 1
        elif isinstance(msg, PointCloud2Msg):
            ingest.feed_raw(msg, msg.stamp)
            if ingest._seq % 200 == 0:
                rss_samples.append(rss_mb())
    ingest.close()
    wall = time.time() - t0
    rss_samples.append(rss_mb())
    sps = sink.n / wall
    drift = max(rss_samples) - rss_samples[1] if len(rss_samples) > 2 else 0.0
    mode = "processes" if processes else "threads"
    print(f"{sink.n} scans + {n_imu} imu in {wall:.1f}s -> "
          f"{sps:.1f} scans/s sustained ({n_hosts} ingest hosts, {mode})")
    print(f"rss: start {rss_samples[0]:.0f} MB, after-warm "
          f"{rss_samples[1]:.0f} MB, max {max(rss_samples):.0f} MB "
          f"(drift past warmup {drift:.0f} MB)")
    ok = sps > 10.0 and drift < 200.0
    print("INGEST " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen", "run"])
    ap.add_argument("bag")
    ap.add_argument("--scans", type=int, default=2000)
    ap.add_argument("--ingest-hosts", type=int, default=4)
    ap.add_argument("--processes", action="store_true",
                    help="decode workers as OS processes (ShardedIngest"
                         " process mode)")
    args = ap.parse_args()
    if args.cmd == "gen":
        gen(args.bag, args.scans)
        return 0
    return run(args.bag, args.ingest_hosts, processes=args.processes)


if __name__ == "__main__":
    sys.exit(main())
