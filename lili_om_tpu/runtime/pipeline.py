"""Async pipeline runner — the in-process equivalent of the reference's
4-ROS-process topology (SURVEY.md §1):

* sensor feeds arrive asynchronously from producer threads;
* the native **Sequencer** (native/lili_runtime.cc) gates each scan until the
  IMU stream covers its sweep — the ±0.1 s stamp gates of
  ``LidarOdometry::run`` (LidarOdometry.cpp:653-655) and
  ``BackendFusion::run`` (BackendFusion.cpp:2727-2733);
* a **frontend worker** runs preprocessing + scan-to-map odometry;
* a **backend worker** consumes keyframes from a bounded handoff ring, so
  the frontend keeps ingesting scan k+1 while the backend fuses keyframe k —
  the reference's process-level overlap (Preprocessing/LidarOdometry run
  while BackendFusion chews), which round 1 lacked (one serial worker);
* the loop-closure cadence runs on its own thread (the 1 Hz
  ``loopClosureThread``, BackendFusion.cpp:2410-2421), sharing the backend
  mutex — the reference's ``mutual_exclusion`` discipline (:131, 2430, 2620).

Backpressure is the bounded queue (ROS ``queue_size``): when a worker falls
behind, the oldest scans drop — real-time semantics rather than unbounded
lag.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import numpy as np

SCAN_STREAM = 0
IMU_STREAM = 1


class _PySequencer:
    """Pure-python fallback mirroring native Sequencer semantics."""

    def __init__(self, n_streams: int, tol: float):
        self.q = [[] for _ in range(n_streams)]
        self.tol = tol

    def push(self, stream: int, stamp: float, handle: int):
        self.q[stream].append((stamp, handle))

    def try_pop(self):
        if any(not q for q in self.q):
            return None
        pivot = max(q[0][0] for q in self.q)
        for q in self.q:
            while q and q[0][0] < pivot - self.tol:
                q.pop(0)
            if not q or q[0][0] > pivot + self.tol:
                return None
        out = [q.pop(0) for q in self.q]
        return [s for s, _ in out], [h for _, h in out]


def _make_sequencer(n_streams: int, tol: float):
    try:
        from . import native

        if native.available():
            return native.Sequencer(n_streams, tol)
    except Exception:
        pass
    return _PySequencer(n_streams, tol)


_IMU_REC = np.dtype([("stamp", "<f8"), ("acc", "<f8", 3), ("gyr", "<f8", 3)])


def _make_imu_ring(capacity: int = 8192):
    """Native lock-free SPSC ring for the 200 Hz IMU stream (56-byte
    records) — producer thread → frontend worker without a Python lock on
    the hot sample path. None when the native runtime is unavailable."""
    try:
        from . import native

        if native.available():
            return native.Ring(_IMU_REC.itemsize, capacity)
    except Exception:
        pass
    return None


class PipelineRunner:
    """Drives a LiliOmSystem from asynchronous scan/IMU feeds.

    feed_imu() / feed_scan() may be called from any producer thread;
    frontend processing happens on the frontend worker in stamp order, and
    keyframe fusion overlaps on the backend worker.
    """

    def __init__(self, system, queue_size: int = 100, loop_period_s: float = 1.0,
                 scan_period: float = 0.1, overlap: bool = True,
                 drop_when_full: bool = True):
        """``drop_when_full``: True = real-time semantics (oldest scans drop
        under backpressure, the reference's bounded topic queues); False =
        lossless offline replay — ``feed_scan*`` blocks the producer instead
        (bag processing must not drop scans)."""
        self.system = system
        self.drop_when_full = drop_when_full
        self._scan_store: dict[int, tuple] = {}
        self._scan_seq = 0
        self._store_lock = threading.Lock()
        self._seq = _make_sequencer(2, scan_period)
        self._seq_lock = threading.Lock()
        self._scan_period = scan_period
        self._ready: queue.Queue = queue.Queue(maxsize=queue_size)
        self._kf_queue: queue.Queue = queue.Queue(maxsize=8)
        self._stop = threading.Event()
        self._front: Optional[threading.Thread] = None
        self._back: Optional[threading.Thread] = None
        self._loop_thread: Optional[threading.Thread] = None
        self._loop_period = loop_period_s
        self._imu_lock = threading.Lock()
        self._imu_ring = _make_imu_ring()
        self.overlap = overlap
        self.n_processed = 0
        self.n_keyframes = 0
        self.n_dropped = 0
        self.loop_closures = 0
        self.n_recoveries = 0  # elastic recoveries (health_check_and_recover)
        # backend mutex: keyframe fusion + loop closure + pose correction
        self._sys_lock = threading.Lock()

    # ---- producers -----------------------------------------------------
    def feed_imu(self, stamps, accs, gyrs):
        stamps = np.atleast_1d(stamps)
        accs = np.atleast_2d(accs)
        gyrs = np.atleast_2d(gyrs)
        routed = False
        if self._imu_ring is not None and \
                len(self._imu_ring) + len(stamps) < 8192:
            # consumer pops only free space, so this producer-side check is
            # conservative-safe for the SPSC ring
            recs = np.empty(len(stamps), _IMU_REC)
            recs["stamp"] = stamps
            recs["acc"] = accs
            recs["gyr"] = gyrs
            routed = all(self._imu_ring.push(r) for r in recs)
        if not routed:
            # ring unavailable or full — push directly under the lock
            with self._imu_lock:
                self.system.push_imu(stamps, accs, gyrs)
        with self._seq_lock:
            # an IMU sample at t certifies sweep coverage up to t. The gate
            # accepts entries within ±tol of the scan stamp, so shift by
            # 2·period (tol = period): entry t−2p ≥ s−tol ⇔ t ≥ s+p, i.e. a
            # scan pops only once samples past its sweep end exist
            # (processIMU consumes through the scan end,
            # Preprocessing.cpp:135-171). One entry per sample — each popped
            # bundle consumes one; stale entries are dropped by the gate.
            for s in stamps:
                self._seq.push(IMU_STREAM, float(s) - 2 * self._scan_period, 0)
            self._drain_sequencer()

    def feed_scan(self, img, valid, rel_time, stamp: float):
        """Organized spinning-LiDAR sweep (R,C)."""
        self._feed(("spin", (np.asarray(img), np.asarray(valid),
                             np.asarray(rel_time)), float(stamp)))

    def feed_scan_livox(self, pts, line, ratio, refl, valid, stamp: float):
        """Flat Livox point stream (N,·) — routed to
        ``process_scan_livox`` on the frontend worker."""
        self._feed(("livox", (np.asarray(pts), np.asarray(line),
                              np.asarray(ratio), np.asarray(refl),
                              np.asarray(valid)), float(stamp)))

    def _feed(self, item):
        with self._store_lock:
            h = self._scan_seq
            self._scan_seq += 1
            self._scan_store[h] = item
        with self._seq_lock:
            self._seq.push(SCAN_STREAM, item[2], h)
            self._drain_sequencer()

    def _drain_sequencer(self):
        """Move every aligned bundle into the frontend queue (bounded drop —
        or producer backpressure when ``drop_when_full`` is off)."""
        while True:
            out = self._seq.try_pop()
            if out is None:
                return
            h = out[1][SCAN_STREAM]
            with self._store_lock:
                item = self._scan_store.pop(h, None)
            if item is None:
                continue
            if not self.drop_when_full:
                while not self._stop.is_set():
                    try:
                        self._ready.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                continue
            try:
                self._ready.put_nowait(item)
            except queue.Full:
                try:
                    self._ready.get_nowait()
                    self.n_dropped += 1
                    self._ready.put_nowait(item)
                except queue.Empty:
                    pass

    # ---- lifecycle -----------------------------------------------------
    def start(self):
        self._stop.clear()
        self._front = threading.Thread(target=self._front_work, daemon=True)
        self._front.start()
        if self.overlap:
            self._back = threading.Thread(target=self._back_work, daemon=True)
            self._back.start()
        self._loop_thread = threading.Thread(target=self._loop_closure_loop, daemon=True)
        self._loop_thread.start()
        # pre-compile the graph-solver buckets off the closure path: the
        # first closure of a run otherwise pays a multi-second per-bucket
        # XLA:CPU compile as first-correction lag (pose_graph.py:
        # warm_graph_solver). Best-effort background work.
        def _prewarm():
            try:
                from ..models.pose_graph import warm_graph_solver

                lc = self.system.lc_cfg
                warm_graph_solver(self.system.graph.t.shape[0],
                                  n_iters=lc.graph_iters, tol=lc.graph_tol,
                                  dtype=self.system.dtype)
            except Exception:
                pass  # warming is an optimization, never a failure mode

        threading.Thread(target=_prewarm, daemon=True).start()

    def flush(self):
        """End-of-stream: release every scan still gated in the sequencer,
        in stamp order. Offline-replay semantics — once the producer is done
        no further IMU coverage can arrive, so the gate would strand the
        tail scans forever (the reference's nodes simply stop when ``rosbag
        play`` ends; an offline tool must process everything it was fed).
        Undistortion of a flushed scan uses whatever IMU samples exist."""
        with self._seq_lock:
            with self._store_lock:
                items = sorted(self._scan_store.values(), key=lambda it: it[2])
                self._scan_store.clear()
        # later sequencer pops of these handles find the store empty and
        # skip (see _drain_sequencer) — no double delivery
        for item in items:
            while not self._stop.is_set():
                try:
                    self._ready.put(item, timeout=0.2)
                    break
                except queue.Full:
                    if self.drop_when_full:
                        self.n_dropped += 1
                        break

    def stop(self, drain: bool = True, timeout: float = 300.0):
        if drain:
            self.flush()
            t0 = time.time()
            while ((not self._ready.empty() or not self._kf_queue.empty())
                   and time.time() - t0 < timeout):
                time.sleep(0.01)
        self._stop.set()
        for th in (self._front, self._back, self._loop_thread):
            if th:
                th.join(timeout=30)

    def _drain_imu(self):
        """Consumer side of the IMU ring: batch the pending samples into the
        system buffer (one push_imu per drain, not per sample)."""
        if self._imu_ring is None:
            return
        recs = []
        while True:
            r = self._imu_ring.pop()
            if r is None:
                break
            recs.append(r)
        if recs:
            batch = np.stack(recs).view(_IMU_REC).reshape(-1)
            with self._imu_lock:
                self.system.push_imu(np.ascontiguousarray(batch["stamp"]),
                                     np.ascontiguousarray(batch["acc"]),
                                     np.ascontiguousarray(batch["gyr"]))

    # ---- threads -------------------------------------------------------
    def _front_work(self):
        while not self._stop.is_set():
            try:
                kind, payload, stamp = self._ready.get(timeout=0.05)
            except queue.Empty:
                continue
            self._drain_imu()
            step = (self.system.process_scan if kind == "spin"
                    else self.system.process_scan_livox)
            if self.overlap:
                out, fc = step(*payload, stamp, defer_backend=True)
                if fc is not None:
                    # bounded handoff; block briefly — keyframes must not
                    # drop (they carry the map), so backpressure stalls the
                    # frontend instead (the reference's bounded topic queue)
                    while not self._stop.is_set():
                        try:
                            self._kf_queue.put((fc, stamp), timeout=0.1)
                            break
                        except queue.Full:
                            continue
            else:
                with self._sys_lock:
                    step(*payload, stamp)
                    if self.system.health_check_and_recover():
                        self.n_recoveries += 1
            self.n_processed += 1

    def _back_work(self):
        while not self._stop.is_set():
            try:
                fc, stamp = self._kf_queue.get(timeout=0.05)
            except queue.Empty:
                continue
            with self._sys_lock:
                self.system.process_keyframe(fc, stamp)
                # elastic recovery (absent in the reference, SURVEY.md §5):
                # a NaN'd fusion state — IMU glitch, degenerate solve — is
                # detected and re-seeded from the last finite keyframe right
                # here on the backend worker, so a mid-run fault degrades to
                # a re-anchored window instead of poisoning every subsequent
                # keyframe
                if self.system.health_check_and_recover():
                    self.n_recoveries += 1
            self.n_keyframes += 1

    def _loop_closure_loop(self):
        while not self._stop.is_set():
            time.sleep(self._loop_period)
            # the mutex discipline mirrors the reference's mutual_exclusion
            # (BackendFusion.cpp:131, 2430, 2620) but the lock is passed IN:
            # try_loop_closure holds it only for the snapshot/update phases —
            # the ICP and the O(N) graph solve (its expensive parts; the
            # reference's iSAM2 update is ms-scale inside the lock, a batch
            # re-solve is not) run unlocked, so keyframe fusion never stalls
            # behind a closure and the scan queue cannot back up into drops.
            try:
                if self.system.try_loop_closure(lock=self._sys_lock):
                    self.loop_closures += 1
            except Exception:
                pass
