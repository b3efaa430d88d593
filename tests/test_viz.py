"""Run-export visualization utilities (headless)."""
import os

import numpy as np

from lili_om_tpu.utils.viz import save_overview_png, write_ply


def test_overview_png_written(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "overview.png")
    save_overview_png(p, map_pts=rng.normal(size=(500, 3)) * 10,
                      est_t=np.cumsum(rng.normal(size=(50, 3)), axis=0),
                      graph_t=np.cumsum(rng.normal(size=(20, 3)), axis=0),
                      gt_t=np.cumsum(rng.normal(size=(50, 3)), axis=0))
    assert os.path.getsize(p) > 10_000  # a real rendered figure, not a stub


def test_ply_roundtrip_header_and_payload(tmp_path):
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    p = str(tmp_path / "m.ply")
    n = write_ply(p, pts)
    assert n == 10
    raw = open(p, "rb").read()
    hdr, _, payload = raw.partition(b"end_header\n")
    assert b"element vertex 10" in hdr
    got = np.frombuffer(payload, "<f4").reshape(10, 3)
    np.testing.assert_array_equal(got, pts)


def test_ply_with_colors(tmp_path):
    pts = np.zeros((4, 3), np.float32)
    cols = np.array([[255, 0, 0]] * 4, np.uint8)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts, cols)
    raw = open(p, "rb").read()
    assert b"property uchar red" in raw
    _, _, payload = raw.partition(b"end_header\n")
    assert len(payload) == 4 * (12 + 3)
