"""Native runtime (C++ ring buffer, sequencer, PCD, record log)."""
import numpy as np
import pytest

from lili_om_tpu.runtime import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


class TestRing:
    def test_push_pop_fifo(self):
        r = native.Ring(record_size=16, capacity=4)
        recs = [np.arange(16, dtype=np.uint8) + i for i in range(3)]
        for rec in recs:
            assert r.push(rec)
        assert len(r) == 3
        for rec in recs:
            np.testing.assert_array_equal(r.pop(), rec)
        assert r.pop() is None

    def test_full_rejects(self):
        r = native.Ring(record_size=8, capacity=2)
        z = np.zeros(8, np.uint8)
        assert r.push(z) and r.push(z)
        assert not r.push(z)  # full (bounded queue drop, like ROS queue_size)


class TestSequencer:
    def test_aligned_bundle(self):
        s = native.Sequencer(3, tol=0.1)
        s.push(0, 1.00, 10)
        s.push(1, 1.05, 20)
        assert s.try_pop() is None  # stream 2 missing
        s.push(2, 0.98, 30)
        stamps, handles = s.try_pop()
        assert handles == [10, 20, 30]
        assert s.try_pop() is None

    def test_stale_entries_dropped(self):
        s = native.Sequencer(2, tol=0.05)
        s.push(0, 0.0, 1)  # stale
        s.push(0, 1.0, 2)
        s.push(1, 1.02, 3)
        stamps, handles = s.try_pop()
        assert handles == [2, 3]


class TestPcdNative:
    def test_write_read(self, tmp_path):
        from lili_om_tpu.io.pcd import read_pcd

        pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
        inten = np.linspace(0, 1, 50).astype(np.float32)
        p = str(tmp_path / "native.pcd")
        assert native.pcd_write_native(p, pts, inten)
        back = read_pcd(p)
        np.testing.assert_allclose(back[:, :3], pts, rtol=1e-6)
        np.testing.assert_allclose(back[:, 3], inten, rtol=1e-6)


class TestRecordLog:
    def test_roundtrip_with_readahead(self, tmp_path):
        p = str(tmp_path / "run.lom")
        w = native.LogWriter(p)
        payloads = []
        rng = np.random.default_rng(2)
        for i in range(50):
            kind = native.KIND_SCAN if i % 5 else native.KIND_IMU
            data = rng.integers(0, 255, size=rng.integers(10, 2000), dtype=np.uint8)
            payloads.append((kind, data))
            w.append(kind, data)
        w.close()

        r = native.LogReader(p, readahead=8)
        got = list(r)
        r.close()
        assert len(got) == 50
        for (k0, d0), (k1, d1) in zip(payloads, got):
            assert k0 == k1
            np.testing.assert_array_equal(d0, d1)


class TestRingConcurrency:
    def test_spsc_threaded_stress(self):
        """Single-producer single-consumer hammering: every record that was
        accepted must come out exactly once, in order."""
        import threading

        r = native.Ring(record_size=8, capacity=64)
        N = 20000
        sent = []
        got = []

        def producer():
            i = 0
            while i < N:
                rec = np.frombuffer(np.uint64(i).tobytes(), np.uint8).copy()
                if r.push(rec):
                    sent.append(i)
                    i += 1

        def consumer():
            while len(got) < N:
                rec = r.pop()
                if rec is not None:
                    got.append(int(np.frombuffer(rec.tobytes(), np.uint64)[0]))

        tp = threading.Thread(target=producer)
        tc = threading.Thread(target=consumer)
        tp.start(); tc.start()
        tp.join(timeout=60); tc.join(timeout=60)
        assert got == list(range(N))
