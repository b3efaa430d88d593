"""Async pipeline runner — the in-process equivalent of the reference's
4-ROS-process topology (SURVEY.md §1): sensor feeds arrive asynchronously,
the native time sequencer gates aligned frame bundles (the ±0.1 s stamp
gates of LidarOdometry::run / BackendFusion::run), a worker thread drives
the compute system, and the loop-closure cadence runs on its own thread
(the reference's 1 Hz `loopClosureThread`, BackendFusion.cpp:2410-2421).

Backpressure is the bounded queue (ROS `queue_size`): when the worker falls
behind, the oldest scans drop — real-time semantics rather than unbounded
lag.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Optional

import numpy as np


class PipelineRunner:
    """Drives a LiliOmSystem from asynchronous scan/IMU feeds.

    feed_imu() / feed_scan() may be called from any producer thread;
    processing happens on the worker thread in stamp order.
    """

    def __init__(self, system, queue_size: int = 100, loop_period_s: float = 1.0):
        self.system = system
        self._scans: queue.Queue = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self._loop_thread: Optional[threading.Thread] = None
        self._loop_period = loop_period_s
        self._imu_lock = threading.Lock()
        self.n_processed = 0
        self.n_dropped = 0
        self.loop_closures = 0
        self._sys_lock = threading.Lock()

    # ---- producers -----------------------------------------------------
    def feed_imu(self, stamps, accs, gyrs):
        with self._imu_lock:
            self.system.push_imu(stamps, accs, gyrs)

    def feed_scan(self, img, valid, rel_time, stamp: float):
        try:
            self._scans.put_nowait((np.asarray(img), np.asarray(valid),
                                    np.asarray(rel_time), float(stamp)))
        except queue.Full:
            # bounded-queue drop (ROS queue_size semantics)
            try:
                self._scans.get_nowait()
                self.n_dropped += 1
                self._scans.put_nowait((np.asarray(img), np.asarray(valid),
                                        np.asarray(rel_time), float(stamp)))
            except queue.Empty:
                pass

    # ---- lifecycle -----------------------------------------------------
    def start(self):
        self._stop.clear()
        self._worker = threading.Thread(target=self._work, daemon=True)
        self._worker.start()
        self._loop_thread = threading.Thread(target=self._loop_closure_loop, daemon=True)
        self._loop_thread.start()

    def stop(self, drain: bool = True, timeout: float = 300.0):
        if drain:
            t0 = time.time()
            while not self._scans.empty() and time.time() - t0 < timeout:
                time.sleep(0.01)
        self._stop.set()
        if self._worker:
            self._worker.join(timeout=30)
        if self._loop_thread:
            self._loop_thread.join(timeout=30)

    # ---- threads -------------------------------------------------------
    def _work(self):
        while not self._stop.is_set():
            try:
                img, valid, rel, stamp = self._scans.get(timeout=0.05)
            except queue.Empty:
                continue
            with self._sys_lock:
                self.system.process_scan(img, valid, rel, stamp)
            self.n_processed += 1

    def _loop_closure_loop(self):
        while not self._stop.is_set():
            time.sleep(self._loop_period)
            # same mutex discipline as the reference's mutual_exclusion
            # (BackendFusion.cpp:131, 2430, 2620)
            with self._sys_lock:
                try:
                    if self.system.try_loop_closure():
                        self.loop_closures += 1
                except Exception:
                    pass
