"""Round-3 regression tests: loop-closure reference-parity semantics
(mature-keyframe anchoring, the Livox local-band time tier, same-pair factor
merging, the non-blocking solve's tail re-chaining) and the max_correction
gate fixes.

Clouds are handcrafted (three orthogonal planes — fully constrains the ICP)
so these run without the lidar simulator.
"""
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.fusion import FusionConfig
from lili_om_tpu.models.odometry import OdometryConfig
from lili_om_tpu.models.pose_graph import add_node
from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig

QID = jnp.array([1.0, 0.0, 0.0, 0.0])


def corner_cloud(n=3000, seed=0):
    """Points on three orthogonal planes (x=0, y=0, z=0 patches)."""
    rng = np.random.default_rng(seed)
    m = n // 3
    a = rng.uniform(0.5, 6.0, (m, 2))
    p1 = np.column_stack([np.zeros(m), a[:, 0], a[:, 1]])
    p2 = np.column_stack([a[:, 0], np.zeros(m), a[:, 1]])
    p3 = np.column_stack([a[:, 0], a[:, 1], np.zeros(m)])
    return np.concatenate([p1, p2, p3])


def make_system(**lc_kwargs):
    # small ICP shapes — the CPU kNN inside ICP is O(cap²) per iteration
    lc_kwargs.setdefault("submap_cap", 4096)
    lc_kwargs.setdefault("icp_iters", 10)
    return LiliOmSystem(
        odo_cfg=OdometryConfig(n_recent_frames=4, scan_cap=1024, query_cap=256,
                               map_cap=4096),
        fusion_cfg=FusionConfig(window=3, local_map_width=6, kf_surf_cap=1024,
                                kf_edge_cap=512, map_surf_cap=4096,
                                map_edge_cap=512, use_reflectivity=False,
                                max_num_iter=2, imu_cap=16),
        lc_cfg=LoopClosureConfig(**lc_kwargs),
        graph_capacity=64,
        dtype=jnp.float64,
    )


def populate(sys_, poses, stamps, cloud):
    for (t, q), s in zip(poses, stamps):
        sys_.graph = add_node(sys_.graph, jnp.asarray(t, jnp.float64), q)
        sys_.kf_stamps.append(float(s))
        sys_.kf_positions.append(np.asarray(t, float))
        sys_.kf_clouds.append(cloud.astype(np.float64))


DRIFT = np.array([0.3, -0.2, 0.1])


def revisit_setup(sys_, stamps):
    """7 keyframes; index 4 (= 7 − window) revisits keyframe 0 with a small
    drift — the reference's mature-anchor configuration."""
    poses = [
        (np.zeros(3), QID),
        (np.array([20.0, 0, 0]), QID),
        (np.array([20.0, 20.0, 0]), QID),
        (np.array([0.0, 20.0, 0]), QID),
        (DRIFT, QID),
        (DRIFT + np.array([0.5, 0, 0]), QID),
        (DRIFT + np.array([1.0, 0, 0]), QID),
    ]
    populate(sys_, poses, stamps, corner_cloud())


class TestLocalBandFallback:
    """The Livox two-tier time gate (BackendFusion.cpp:2449-2467): when no
    candidate is older than global_lc_time_thres, the max-|Δt| candidate in
    (local_lc_time_thres, global_lc_time_thres) closes instead."""

    STAMPS = [0.0, 5.0, 10.0, 15.0, 30.0, 31.0, 32.0]  # Δt(kf0) = 32

    def test_global_only_does_not_fire(self):
        sys_ = make_system(time_thres=50.0, local_time_thres=None,
                           search_radius=5.0, map_width=2, latest_width=1)
        revisit_setup(sys_, self.STAMPS)
        assert not sys_.try_loop_closure()
        assert sys_.lc_rejects["no_candidate"] == 1

    def test_local_band_fires(self):
        sys_ = make_system(time_thres=50.0, local_time_thres=10.0,
                           search_radius=5.0, map_width=2, latest_width=1)
        revisit_setup(sys_, self.STAMPS)
        assert sys_.try_loop_closure()
        assert int(sys_.graph.n_loops) == 1
        # the factor anchors at the MATURE keyframe (index 4), not the newest
        assert int(sys_.graph.loop_i[0]) == 4
        assert int(sys_.graph.loop_j[0]) == 0
        # correction pulled the drifted mature node back toward the origin
        t4 = np.asarray(sys_.graph.t[4])
        assert np.linalg.norm(t4) < 0.6 * np.linalg.norm(DRIFT)


class TestSamePairMerge:
    STAMPS = [0.0, 5.0, 10.0, 15.0, 40.0, 41.0, 42.0]

    def _fire_twice(self, merge_width):
        sys_ = make_system(time_thres=20.0, search_radius=5.0, map_width=2,
                           latest_width=1, merge_width=merge_width)
        revisit_setup(sys_, self.STAMPS)
        assert sys_.try_loop_closure()
        # one more keyframe arrives: the mature index advances to 5, still at
        # the revisited place → same-pair closure
        populate(sys_, [(DRIFT + np.array([1.5, 0, 0]), QID)], [43.0],
                 corner_cloud())
        assert sys_.try_loop_closure()
        return sys_

    def test_merges_same_pair(self):
        sys_ = self._fire_twice(merge_width=10)
        assert int(sys_.graph.n_loops) == 1  # replaced, not appended
        assert int(sys_.graph.loop_i[0]) == 5  # superseding measurement

    def test_merge_disabled(self):
        sys_ = self._fire_twice(merge_width=0)
        assert int(sys_.graph.n_loops) == 2


class TestLoopFactorHygieneAtScale:
    def test_500_closures_bounded_by_places(self):
        """A multi-lap run re-fires closures at the same few places every
        pass; with merging the factor count — and thus the 6L-dim Woodbury
        block of every graph solve — stays O(distinct places), not
        O(closures) (VERDICT r2 item 8)."""
        import jax.numpy as jnp

        from lili_om_tpu.models.pose_graph import add_node

        sys_ = make_system(merge_width=10)
        n_places, laps, per_lap = 3, 10, 60
        refires = 19  # detection keeps firing while the robot passes a place
        qid = jnp.asarray(QID, jnp.float64)
        kf = 0
        attempts = 0
        for lap in range(laps):
            for step in range(per_lap):
                t = np.array([float(step % per_lap), 3.0 * lap, 0.0])
                sys_.graph = add_node(sys_.graph, jnp.asarray(t, jnp.float64),
                                      qid)
                sys_.kf_stamps.append(float(kf))
                kf += 1
                if lap > 0 and (step % (per_lap // n_places)) < refires:
                    his = (step // (per_lap // n_places)) * (per_lap // n_places)
                    sys_._record_loop(kf - 1, his, jnp.zeros(3, jnp.float64),
                                      qid, jnp.asarray(0.05))
                    attempts += 1
        assert attempts >= 500, attempts
        # consecutive re-fires of one pass merge into ONE factor: the count
        # is bounded by distinct (lap, place) pairs, not attempts
        distinct_pairs = (laps - 1) * n_places
        assert int(sys_.graph.n_loops) <= distinct_pairs + n_places, \
            int(sys_.graph.n_loops)
        # loop capacity (per-solve Woodbury cost) stays at the pairs scale
        assert sys_.graph.loop_i.shape[0] <= 64


class TestMaxCorrectionGate:
    STAMPS = [0.0, 5.0, 10.0, 15.0, 40.0, 41.0, 42.0]

    def test_tiny_threshold_rejects_and_counts(self):
        sys_ = make_system(time_thres=20.0, search_radius=5.0, map_width=2,
                           latest_width=1, max_correction=1e-9)
        revisit_setup(sys_, self.STAMPS)
        with pytest.warns(UserWarning, match="max_correction"):
            assert not sys_.try_loop_closure()
        assert sys_.lc_rejects["max_correction"] == 1

    def test_explicit_zero_disables_gate(self):
        # 0.0 must mean "gate off", not silently fall back to the auto value
        # (the old `or` treated any falsy value as unset)
        sys_ = make_system(time_thres=20.0, search_radius=5.0, map_width=2,
                           latest_width=1, max_correction=0.0)
        revisit_setup(sys_, self.STAMPS)
        assert sys_.try_loop_closure()
        assert sys_.lc_rejects["max_correction"] == 0


class TestIncrementalOdometryMap:
    def test_table_matches_batch_union(self):
        """The persistent voxel table reproduces the batch ring-union
        downsample at every step (same voxel set, same centroids) while the
        ring slides — including evictions after the ring wraps."""
        import jax.numpy as jnp

        from lili_om_tpu.models.odometry import (OdometryConfig, init_state,
                                                 odometry_step)
        from lili_om_tpu.ops.voxel import voxel_downsample

        cfg = OdometryConfig(n_recent_frames=3, scan_cap=512, query_cap=256,
                             map_cap=2048, frame_cap=256, scan_match_cnt=1,
                             gn_iters=2)
        state = init_state(cfg, dtype=jnp.float64)
        rng = np.random.default_rng(7)
        for k in range(8):  # ring wraps at 3 — evictions exercised
            base = np.array([0.4 * k, 0.1 * k, 0.0])
            cc = corner_cloud(400, seed=k)
            surf = np.zeros((512, 3))
            surf[: len(cc)] = base + cc
            mask = np.zeros(512, bool)
            mask[: len(cc) - 10] = True  # a few masked-out tail points
            state, _ = odometry_step(state, jnp.asarray(surf),
                                     jnp.asarray(mask), cfg, n_rounds=1)
            # batch union of the post-insert ring
            all_pts = state.frames_pts.reshape(-1, 3)
            all_mask = state.frames_mask.reshape(-1)
            bm, bmask = voxel_downsample(all_pts, all_mask, cfg.ds_leaf,
                                         cfg.map_cap)
            batch = np.asarray(bm)[np.asarray(bmask)]
            cnt = np.maximum(np.asarray(state.map_cnt), 1.0)
            table = (np.asarray(state.map_sums) / cnt[:, None])[
                np.asarray(state.map_valid)]
            assert len(batch) == len(table), (k, len(batch), len(table))
            bs = batch[np.lexsort(np.round(batch / 1e-6).T)]
            ts_ = table[np.lexsort(np.round(table / 1e-6).T)]
            np.testing.assert_allclose(bs, ts_, atol=1e-6)


class TestIncrementalFusionMap:
    def _run(self, incremental, n_kf=7, perturb_at=None):
        """Feed n_kf keyframes through fusion_step; optionally perturb the
        ring poses mid-run (a loop-correction stand-in) and pass
        rebuild=True on the following step."""
        import jax.numpy as jnp

        from lili_om_tpu.models.fusion import (FusionConfig, fusion_step,
                                               init_fusion_state)
        from lili_om_tpu.ops.preintegration import ImuNoise

        cfg = FusionConfig(window=3, local_map_width=4, kf_surf_cap=512,
                           kf_edge_cap=256, map_surf_cap=2048,
                           map_edge_cap=512, use_reflectivity=False,
                           max_num_iter=3, imu_cap=8, gn_tol=0.0,
                           incremental_map=incremental)
        noise = ImuNoise()
        state = init_fusion_state(cfg, noise, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        outs = []
        for k in range(n_kf):
            cc = corner_cloud(480, seed=k) + np.array([0.3 * k, 0.05 * k, 0])
            sp = np.zeros((512, 3))
            sp[: len(cc)] = cc
            sm = np.zeros(512, bool)
            sm[: len(cc)] = True
            ec = cc[:240] + [0.01, 0, 0]
            ep = np.zeros((256, 3))
            ep[: len(ec)] = ec
            em = np.zeros(256, bool)
            em[: len(ec)] = True
            dts = jnp.zeros(8).at[:4].set(0.025)
            accs = jnp.zeros((8, 3)).at[:4, 2].set(9.805)
            gyrs = jnp.zeros((8, 3))
            vm = jnp.zeros(8, bool).at[:4].set(True)
            # the correction mutates poses BETWEEN steps; the first step
            # after it runs with rebuild=True (system._maps_dirty)
            rebuild = incremental and perturb_at is not None and k == perturb_at
            if perturb_at is not None and k == perturb_at:
                state = state._replace(hist_t=state.hist_t + 0.01)
            state, out = fusion_step(
                state, jnp.asarray(sp), jnp.asarray(sm),
                jnp.zeros(512), jnp.asarray(ep), jnp.asarray(em),
                dts, accs, gyrs, vm, cfg, noise,
                warmup=(int(state.kf_count) + 1 < cfg.window),
                rebuild=rebuild)
            outs.append(np.asarray(out.t_latest))
        return np.stack(outs), np.asarray(state.hist_t)

    def test_matches_batch_build(self):
        """incremental_map=True reproduces the batch _build_maps pipeline:
        same maps → same correspondences → same window estimates (through
        ring eviction at M=4 < n_kf)."""
        a_out, a_hist = self._run(incremental=False)
        b_out, b_hist = self._run(incremental=True)
        np.testing.assert_allclose(a_out, b_out, atol=1e-6)
        np.testing.assert_allclose(a_hist, b_hist, atol=1e-6)

    def test_rebuild_after_pose_correction(self):
        """After mature ring poses move (loop correction), rebuild=True
        restores agreement with the batch path."""
        a_out, a_hist = self._run(incremental=False, perturb_at=4)
        b_out, b_hist = self._run(incremental=True, perturb_at=4)
        np.testing.assert_allclose(a_out, b_out, atol=1e-6)
        np.testing.assert_allclose(a_hist, b_hist, atol=1e-6)


class TestNonBlockingSolve:
    def test_lock_passed_in_fires(self):
        """try_loop_closure(lock=…) acquires/releases the caller's mutex
        around the snapshot/update phases only; result identical to inline."""
        sys_ = make_system(time_thres=20.0, search_radius=5.0, map_width=2,
                           latest_width=1)
        revisit_setup(sys_, TestSamePairMerge.STAMPS)
        lock = threading.Lock()
        assert sys_.try_loop_closure(lock=lock)
        assert not lock.locked()  # released
        assert int(sys_.graph.n_loops) == 1

    def test_tail_rechain(self):
        """Nodes appended while the (unlocked) solve runs are re-chained by
        the correction delta of the last solved node."""
        sys_ = make_system()
        poses = [(np.array([float(i), 0, 0]), QID) for i in range(5)]
        populate(sys_, poses, [0.0, 1.0, 2.0, 3.0, 4.0], corner_cloud(300))
        # pretend the solve covered only the first 3 nodes and shifted the
        # anchor node (index 2) by +1 in y
        solved_t = np.array([[0.0, 1, 0], [1, 1, 0], [2, 1, 0]])
        solved_q = np.tile(np.array([1.0, 0, 0, 0]), (3, 1))
        sys_._apply_solved_graph(solved_t, solved_q, n0=3)
        g_t = np.asarray(sys_.graph.t[:5])
        np.testing.assert_allclose(g_t[:3], solved_t, atol=1e-9)
        # tail nodes keep their relative offsets to the anchor → also +1 in y
        np.testing.assert_allclose(g_t[3], [3.0, 1.0, 0.0], atol=1e-9)
        np.testing.assert_allclose(g_t[4], [4.0, 1.0, 0.0], atol=1e-9)
