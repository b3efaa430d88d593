"""Dataset record-log roundtrip (the rosbag replacement)."""
import numpy as np
import pytest

from lili_om_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


class TestDatasetLog:
    def test_scan_imu_roundtrip(self, tmp_path):
        from lili_om_tpu.io.dataset import (
            DatasetWriter,
            ImuRecord,
            ScanRecord,
            read_dataset,
        )

        p = str(tmp_path / "run.lom")
        rng = np.random.default_rng(0)
        w = DatasetWriter(p)
        scans, imus = [], []
        for i in range(5):
            imu = ImuRecord(0.005 * i, rng.normal(size=3).astype(np.float32),
                            rng.normal(size=3).astype(np.float32))
            imus.append(imu)
            w.write_imu(imu)
        for i in range(3):
            n = int(rng.integers(100, 500))
            rec = ScanRecord(0.1 * i,
                             rng.normal(size=(n, 3)).astype(np.float32),
                             rng.uniform(size=n).astype(np.float32),
                             rng.uniform(1, 200, size=n).astype(np.float32),
                             rng.integers(0, 16, size=n).astype(np.int32))
            scans.append(rec)
            w.write_scan(rec)
        w.close()

        got_scans, got_imus = [], []
        for rec in read_dataset(p):
            (got_imus if isinstance(rec, ImuRecord) else got_scans).append(rec)
        assert len(got_scans) == 3 and len(got_imus) == 5
        for a, b in zip(scans, got_scans):
            assert a.stamp == b.stamp
            np.testing.assert_array_equal(a.pts, b.pts)
            np.testing.assert_array_equal(a.line, b.line)
        for a, b in zip(imus, got_imus):
            np.testing.assert_array_equal(a.acc, b.acc)

    def test_organize_scan(self):
        from lili_om_tpu.io.dataset import ScanRecord, organize_scan

        pts = np.array([[1.0, 0, 0], [0, 1, 0]], np.float32)
        rec = ScanRecord(0.0, pts, np.array([0.0, 0.5], np.float32),
                         np.ones(2, np.float32), np.array([0, 3], np.int32))
        img, valid, rel = organize_scan(rec, 4, 10)
        assert valid[0, 0] and valid[3, 5]
        np.testing.assert_array_equal(img[3, 5], pts[1])
