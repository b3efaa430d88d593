"""ShardedIngest: host-count-aware decode split with an order-restoring
merge (SURVEY.md §2.3 data-sharding north star, DCN ingest half)."""
import threading
import time

import numpy as np
import pytest

from lili_om_tpu.io.velodyne import decode_packets, encode_packets
from lili_om_tpu.runtime.ingest import ShardedIngest


class StubRunner:
    """Records the feed calls (thread-safe)."""

    def __init__(self):
        self.calls = []
        self._lock = threading.Lock()

    def feed_scan(self, *args):
        with self._lock:
            self.calls.append(("spin",) + args)

    def feed_scan_livox(self, *args):
        with self._lock:
            self.calls.append(("livox",) + args)


def _slow_decode(raw):
    # deliberately skewed decode times → out-of-order completion across
    # workers; the merge must still forward in submission order
    seq, dur = raw
    time.sleep(dur)
    return "spin", (np.full((2, 2, 3), seq, np.float32),
                    np.ones((2, 2), bool), np.zeros((2, 2), np.float32))


@pytest.mark.parametrize("n_hosts", [1, 4])
def test_order_restored(n_hosts):
    rng = np.random.default_rng(0)
    runner = StubRunner()
    ing = ShardedIngest(runner, _slow_decode, n_hosts=n_hosts)
    N = 24
    for s in range(N):
        ing.feed_raw((s, float(rng.uniform(0, 0.01))), stamp=0.1 * s)
    ing.close()
    assert ing.n_decoded == ing.n_forwarded == N
    assert len(runner.calls) == N
    # strict submission order, stamps intact, payload matches the seq
    for s, call in enumerate(runner.calls):
        kind, img, valid, rel, stamp = call
        assert kind == "spin"
        assert stamp == pytest.approx(0.1 * s)
        assert img[0, 0, 0] == s


def test_decode_error_propagates():
    def bad(raw):
        raise ValueError("boom")

    ing = ShardedIngest(StubRunner(), bad, n_hosts=2)
    ing.feed_raw(0, 0.0)
    with pytest.raises(RuntimeError):
        # either the next feed or close observes the worker failure
        for _ in range(50):
            ing.feed_raw(1, 0.1)
            time.sleep(0.01)
        ing.close()


def test_sharded_velodyne_decode_equals_serial():
    """Real decode path: raw HDL-32E packets through 3 'hosts' equal the
    single-host decode, scan for scan."""
    rng = np.random.default_rng(2)

    def make_raw(seed):
        r = np.random.default_rng(seed)
        n = 512
        pts = r.uniform(-20, 20, (n, 3)).astype(np.float32)
        ring = r.integers(0, 32, n).astype(np.int32)
        return encode_packets(pts, ring, model="HDL32E")

    def dec(raw):
        d = decode_packets(raw, "HDL32E")
        pts = d.pts[d.valid]
        return "livox", (pts, d.ring[d.valid], np.zeros(len(pts), np.float32),
                         np.zeros(len(pts), np.float32),
                         np.isfinite(pts).all(axis=1))

    raws = [make_raw(i) for i in range(6)]
    serial, sharded = StubRunner(), StubRunner()
    ing1 = ShardedIngest(serial, dec, n_hosts=1)
    ing3 = ShardedIngest(sharded, dec, n_hosts=3)
    for i, raw in enumerate(raws):
        ing1.feed_raw(raw, 0.1 * i)
        ing3.feed_raw(raw, 0.1 * i)
    ing1.close()
    ing3.close()
    assert len(serial.calls) == len(sharded.calls) == len(raws)
    for a, b in zip(serial.calls, sharded.calls):
        assert a[0] == b[0]
        np.testing.assert_array_equal(a[1], b[1])
        assert a[-1] == b[-1]


def _bad_decode(raw):
    raise ValueError("boom")


class TestProcessMode:
    """ShardedIngest(processes=True): decode workers as OS processes — the
    concrete process-level worker split (VERDICT r4 missing #3). Same
    order/count contract as the thread mode."""

    def test_order_and_counts(self):
        runner = StubRunner()
        ing = ShardedIngest(runner, _slow_decode, n_hosts=3, processes=True)
        rng = np.random.default_rng(1)
        N = 12
        for s in range(N):
            ing.feed_raw((s, float(rng.uniform(0, 0.01))), stamp=0.1 * s)
        ing.close()
        assert ing.n_decoded == ing.n_forwarded == N
        assert len(runner.calls) == N
        for s, call in enumerate(runner.calls):
            kind, img, valid, rel, stamp = call
            assert kind == "spin"
            assert stamp == pytest.approx(0.1 * s)
            assert img[0, 0, 0] == s

    def test_error_propagates(self):
        ing = ShardedIngest(StubRunner(), _bad_decode, n_hosts=2,
                            processes=True)
        ing.feed_raw(0, 0.0)
        with pytest.raises(RuntimeError):
            ing.close()
