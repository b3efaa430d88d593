"""Round-5 regression tests: the incremental-fast global graph solve
(step-norm early exit + affected-suffix restriction — the iSAM2-parity gap,
VERDICT r4 task 1) and the off-lock loop-closure submap build (task 5).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lili_om_tpu.models.pose_graph import (add_loop, affected_base,
                                           extract_suffix, init_graph,
                                           optimize_graph_chain,
                                           solve_graph_incremental)
from lili_om_tpu.utils.math import pose_relative


def drifted_chain(N, cap, seed=0, drift=0.002):
    """Chain graph with accumulated odometry noise."""
    rng = np.random.default_rng(seed)
    ts = np.cumsum(np.full((N, 3), [0.1, 0, 0])
                   + drift * rng.standard_normal((N, 3)), axis=0)
    g = init_graph(cap)
    return g._replace(
        t=g.t.at[:N].set(jnp.asarray(ts, jnp.float32)),
        node_valid=g.node_valid.at[:N].set(True),
        rel_valid=g.rel_valid.at[:N - 1].set(True),
        rel_t=g.rel_t.at[:N - 1].set(jnp.asarray(np.diff(ts, axis=0),
                                                 jnp.float32)),
        rel_weight=g.rel_weight.at[:N].set(100.0),
        n_nodes=jnp.asarray(N, jnp.int32))


def with_loop(g, i, j, fitness=0.05):
    return add_loop(g, i, j,
                    *pose_relative(g.t[i], g.q[i], g.t[j], g.q[j]), fitness)


class TestEarlyExit:
    def test_tol_matches_fixed_schedule(self):
        """tol early exit converges to the same optimum as the fixed
        10-iteration schedule (it only skips no-op iterations)."""
        g = with_loop(drifted_chain(120, 128), 115, 10)
        full = optimize_graph_chain(g, n_iters=10)
        tol = optimize_graph_chain(g, n_iters=10, tol=1e-4)
        assert float(jnp.max(jnp.abs(full.t[:120] - tol.t[:120]))) < 5e-3
        assert float(jnp.max(jnp.abs(full.q[:120] - tol.q[:120]))) < 5e-3

    def test_warm_start_exits_immediately(self):
        """Re-solving an already-solved graph must not change it (the early
        exit fires after one iteration with a tiny step)."""
        g = with_loop(drifted_chain(120, 128), 115, 10)
        solved = optimize_graph_chain(g, n_iters=10, tol=1e-3)
        again = optimize_graph_chain(solved, n_iters=10, tol=1e-3)
        assert float(jnp.max(jnp.abs(solved.t[:120] - again.t[:120]))) < 1e-3


class TestAffectedSuffix:
    def test_affected_base(self):
        assert affected_base([]) == -1
        assert affected_base([(190, 10)]) == 9
        assert affected_base([(190, 10), (300, 150)]) == 9
        assert affected_base([(5, 0)]) == 0

    def test_incremental_matches_full(self):
        N = 300
        g = with_loop(drifted_chain(N, 512), N - 5, 40)
        full = optimize_graph_chain(g, n_iters=10)
        st, sq = solve_graph_incremental(g, N, [(N - 5, 40)],
                                         n_iters=10, tol=1e-4)
        # suffix solution matches the full batch solve (anchor stiffness +
        # early-exit tolerance account for the residual difference)
        assert float(np.max(np.abs(np.asarray(full.t[:N]) - st))) < 2e-2
        assert float(np.max(np.abs(np.asarray(full.q[:N]) - sq))) < 1e-2

    def test_prefix_bit_unchanged(self):
        N = 300
        g = with_loop(drifted_chain(N, 512), N - 5, 40)
        st, sq = solve_graph_incremental(g, N, [(N - 5, 40)])
        base = affected_base([(N - 5, 40)])
        assert np.array_equal(st[:base], np.asarray(g.t[:base]))
        assert np.array_equal(sq[:base], np.asarray(g.q[:base]))

    def test_no_loops_is_identity(self):
        N = 50
        g = drifted_chain(N, 64)
        st, sq = solve_graph_incremental(g, N, [])
        assert np.array_equal(st, np.asarray(g.t[:N]))

    def test_extract_suffix_remaps(self):
        N = 300
        g = with_loop(drifted_chain(N, 512), N - 5, 40)
        sub = extract_suffix(g, 39, N)
        assert int(sub.n_nodes) == N - 39
        assert int(sub.loop_i[0]) == N - 5 - 39
        assert int(sub.loop_j[0]) == 1
        # last suffix node has no outgoing chain factor
        assert not bool(sub.rel_valid[N - 39 - 1])
        assert np.allclose(np.asarray(sub.t[0]), np.asarray(g.t[39]))


class TestChunkedWoodbury:
    def test_chunked_matches_full(self):
        """The memory-lean chunked Woodbury (streams U's column blocks
        against a reused block-Thomas factorization) must match the
        one-shot solve bit-for-float-assoc — forced via loop_chunk at a
        size where the auto heuristic would not chunk."""
        g = drifted_chain(200, 256)
        for (i, j) in [(195, 20), (150, 60), (120, 21), (90, 40)]:
            g = with_loop(g, i, j)
        full = optimize_graph_chain(g, n_iters=6)
        for chunk in (1, 2, 3):
            ck = optimize_graph_chain(g, n_iters=6, loop_chunk=chunk)
            assert float(jnp.max(jnp.abs(full.t[:200] - ck.t[:200]))) < 1e-4, chunk
            assert float(jnp.max(jnp.abs(full.q[:200] - ck.q[:200]))) < 1e-4, chunk

    def test_zero_loop_capacity_solves(self):
        """A pure-chain graph (loop_capacity=0) must still solve — the
        chunked rewrite initially raised range(0,0,0) here."""
        g = init_graph(64, loop_capacity=0)
        N = 30
        rng = np.random.default_rng(1)
        ts = np.cumsum(np.full((N, 3), [0.1, 0, 0])
                       + 0.01 * rng.standard_normal((N, 3)), axis=0)
        g = g._replace(
            t=g.t.at[:N].set(jnp.asarray(ts, jnp.float32)),
            node_valid=g.node_valid.at[:N].set(True),
            rel_valid=g.rel_valid.at[:N - 1].set(True),
            rel_t=g.rel_t.at[:N - 1].set(
                jnp.asarray(np.diff(ts, axis=0), jnp.float32)),
            rel_weight=g.rel_weight.at[:N].set(100.0),
            n_nodes=jnp.asarray(N, jnp.int32))
        out = optimize_graph_chain(g, n_iters=3)
        assert np.all(np.isfinite(np.asarray(out.t[:N])))

    def test_factor_resolve_roundtrip(self):
        """block_tridiag_factor + resolve == one-shot solve."""
        from lili_om_tpu.models.pose_graph import (block_tridiag_factor,
                                                   block_tridiag_resolve,
                                                   block_tridiag_solve)

        rng = np.random.default_rng(3)
        N, R = 17, 5
        A = rng.standard_normal((N, 6, 6))
        D = jnp.asarray(A @ A.transpose(0, 2, 1) + 12 * np.eye(6), jnp.float64)
        B = jnp.asarray(0.3 * rng.standard_normal((N, 6, 6)), jnp.float64)
        rhs = jnp.asarray(rng.standard_normal((N, 6, R)), jnp.float64)
        one = block_tridiag_solve(D, B, rhs)
        two = block_tridiag_resolve(block_tridiag_factor(D, B), rhs)
        np.testing.assert_allclose(np.asarray(one), np.asarray(two),
                                   rtol=1e-10, atol=1e-10)
        # split rhs into chunks against the same factorization
        f = block_tridiag_factor(D, B)
        parts = [block_tridiag_resolve(f, rhs[..., i:i + 2])
                 for i in range(0, R, 2)]
        np.testing.assert_allclose(np.asarray(jnp.concatenate(parts, -1)),
                                   np.asarray(one), rtol=1e-10, atol=1e-10)


class TestArchiveSpill:
    def test_spill_bounds_residency_and_stays_readable(self, tmp_path):
        """spill_archives moves old keyframe clouds to disk; loop closure /
        export reload them transparently through _kf_cloud_np (VERDICT r4
        task 4 — the long-context memory bound)."""
        from tests.test_round3_fixes import corner_cloud, make_system, QID

        sys_ = make_system()
        sys_.archive_spill_dir = str(tmp_path / "spill")
        sys_.archive_keep_recent = 3
        cloud = corner_cloud()
        for i in range(10):
            from lili_om_tpu.models.pose_graph import add_node
            sys_.graph = add_node(sys_.graph,
                                  jnp.asarray([float(i), 0, 0], jnp.float64),
                                  jnp.asarray(QID, jnp.float64))
            sys_.kf_stamps.append(float(i))
            sys_.kf_positions.append(np.array([float(i), 0, 0]))
            sys_.kf_clouds.append(cloud.astype(np.float64))
            sys_.kf_full_clouds.append(cloud.astype(np.float64))
            sys_.spill_archives()
        # everything older than keep_recent is a path now
        n_paths = sum(isinstance(c, str) for c in sys_.kf_clouds)
        assert n_paths == 10 - 3
        # reloads bit-identical, without re-caching into memory
        got = sys_._kf_cloud_np(0)
        np.testing.assert_array_equal(got, cloud)
        assert isinstance(sys_.kf_clouds[0], str)
        # global map assembly still sees every keyframe
        m = sys_.build_global_map(leaf=0.5)
        assert len(m) > 0

    def test_spill_disabled_is_noop(self):
        from tests.test_round3_fixes import corner_cloud, make_system

        sys_ = make_system()
        sys_.kf_stamps.append(0.0)
        sys_.kf_clouds.append(corner_cloud())
        assert sys_.spill_archives() == 0
        assert isinstance(sys_.kf_clouds[0], np.ndarray)


class TestSystemWiring:
    def test_closure_uses_incremental_and_records_inlock(self):
        """End-to-end: a revisit closure goes through the suffix solve and
        the in-lock phases are timed (lc_inlock stage, VERDICT r4 task 5)."""
        from tests.test_round3_fixes import (DRIFT, make_system,
                                             revisit_setup)

        sys_ = make_system(time_thres=20.0, search_radius=5.0, map_width=2,
                           latest_width=1)
        revisit_setup(sys_, [0.0, 5.0, 10.0, 15.0, 40.0, 41.0, 42.0])
        assert sys_.lc_cfg.graph_suffix and sys_.lc_cfg.graph_tol > 0
        assert sys_.try_loop_closure()
        t4 = np.asarray(sys_.graph.t[4])
        assert np.linalg.norm(t4) < 0.6 * np.linalg.norm(DRIFT)
        assert "lc_inlock" in sys_.metrics.samples
        assert "graph_solve" in sys_.metrics.samples
        # the in-lock phases exclude the submap build + ICP + solve; on this
        # tiny fixture they are sub-ms, but CI boxes jitter — assert a loose
        # ceiling that still catches the submap build re-entering the lock
        assert max(sys_.metrics.samples["lc_inlock"]) < 0.25


def test_warm_graph_solver_buckets():
    """Prewarm compiles the pow2 bucket ladder without error and reports
    what it warmed (PipelineRunner.start runs this in the background so the
    first closure skips the per-bucket compile)."""
    from lili_om_tpu.models.pose_graph import warm_graph_solver

    warmed = warm_graph_solver(256, n_iters=2, tol=1e-3)
    assert warmed == [64, 128, 256]


class TestEdgeQueryExtrinsic:
    def test_edge_search_matches_under_rot_extrinsic(self):
        """The corner SEARCH must query in the body frame like the
        reference's composed pose (BackendFusion.cpp:929-936) — only the
        edge FACTOR ignores the extrinsic (LidarKeyframeFactor.h:37-43).
        Pre-fix, raw-frame queries sat an extrinsic away from the
        body-frame-built edge map and found ~nothing under the ROT
        90°-about-x mount (measured: 1.4 vs 21.8 mean correspondences on
        the golden rig)."""
        from lili_om_tpu.models.fusion import (FusionConfig, fusion_step,
                                               init_fusion_state)
        from lili_om_tpu.ops.preintegration import ImuNoise

        cfg = FusionConfig(window=3, local_map_width=6, kf_surf_cap=256,
                           kf_edge_cap=128, map_surf_cap=2048,
                           map_edge_cap=512, use_reflectivity=False,
                           weight_gate=0.3, lidar_const=7.5, max_num_iter=2,
                           imu_cap=16,
                           q_lb=(0.7071, 0.0, 0.0, 0.7071),  # ROT mount
                           t_lb=(-0.18, 0.0, -0.095))
        noise = ImuNoise()
        rng = np.random.default_rng(0)
        st = init_fusion_state(cfg, noise, dtype=jnp.float64)
        M, Sc, Ec = cfg.local_map_width, cfg.kf_surf_cap, cfg.kf_edge_cap
        # SENSOR-frame clouds (the ring stores sensor frame; the map build
        # applies the extrinsic): a plane patch + an edge line
        sp = np.stack([rng.uniform(0, 4, Sc), rng.uniform(0, 4, Sc),
                       0.02 * rng.standard_normal(Sc)], axis=1)
        ep = np.stack([rng.uniform(0, 2, Ec), np.full(Ec, 1.0),
                       rng.uniform(0, 4, Ec)], axis=1)
        st = st._replace(
            hist_surf=jnp.tile(jnp.asarray(sp)[None], (M, 1, 1)),
            hist_surf_mask=jnp.ones((M, Sc), bool),
            hist_edge=jnp.tile(jnp.asarray(ep)[None], (M, 1, 1)),
            hist_edge_mask=jnp.ones((M, Ec), bool),
            hist_valid=jnp.ones((M,), bool),
            kf_count=jnp.asarray(M, jnp.int32))
        dts = jnp.full((cfg.imu_cap,), 0.005, jnp.float64)
        accs = jnp.zeros((cfg.imu_cap, 3), jnp.float64).at[:, 2].set(noise.g_norm)
        gyrs = jnp.zeros((cfg.imu_cap, 3), jnp.float64)
        vm = jnp.ones((cfg.imu_cap,), bool)
        # same sensor-frame clouds as the incoming scan (identity poses →
        # queries must land exactly on the map)
        _, out = fusion_step(
            st, jnp.asarray(sp), jnp.ones((Sc,), bool), jnp.zeros((Sc,)),
            jnp.asarray(ep), jnp.ones((Ec,), bool), dts, accs, gyrs, vm,
            cfg=cfg, noise=noise, rebuild=True)
        assert int(out.n_edge_corr) > Ec // 2, int(out.n_edge_corr)
        assert int(out.n_surf_corr) > Sc
