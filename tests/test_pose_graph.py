"""Global pose graph + ICP loop closure (replacing GTSAM/iSAM2 and PCL ICP,
BackendFusion.cpp:1820-1878, :2552-2642)."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.models.pose_graph import add_loop, add_node, init_graph, optimize_graph
from lili_om_tpu.ops.icp import icp_point_to_plane
from lili_om_tpu.utils.math import exp_so3, pose_relative, quat_mul, quat_normalize, quat_rotate


def square_trajectory(n_side=5, side=10.0):
    """Ground-truth poses around a closed square (returns to start)."""
    ts, qs = [], []
    yaw = 0.0
    pos = np.zeros(3)
    for leg in range(4):
        for k in range(n_side):
            ts.append(pos.copy())
            qs.append(np.asarray(exp_so3(jnp.array([0.0, 0.0, yaw]))))
            step = np.array([np.cos(yaw), np.sin(yaw), 0.0]) * (side / n_side)
            pos = pos + step
        yaw += np.pi / 2
    return np.stack(ts), np.stack(qs)


class TestPoseGraph:
    def test_chain_only_reproduces_odometry(self):
        ts, qs = square_trajectory()
        g = init_graph(capacity=32, loop_capacity=4, dtype=jnp.float64)
        for t, q in zip(ts, qs):
            g = add_node(g, jnp.asarray(t), jnp.asarray(q))
        g2 = optimize_graph(g, n_iters=5)
        n = int(g.n_nodes)
        np.testing.assert_allclose(np.asarray(g2.t[:n]), ts, atol=1e-6)

    def test_loop_closure_corrects_drift(self):
        """Inject odometry drift, close the loop with the true relative pose,
        check the final node snaps back (correctPoses semantics)."""
        ts, qs = square_trajectory()
        n = len(ts)
        # drifted odometry: accumulate relative poses with a yaw bias
        g = init_graph(capacity=32, loop_capacity=4, dtype=jnp.float64)
        t_d = jnp.asarray(ts[0])
        q_d = jnp.asarray(qs[0])
        g = add_node(g, t_d, q_d)
        drift_rot = exp_so3(jnp.array([0.0, 0.0, 0.004]))  # per-step yaw bias
        for k in range(1, n):
            dt, dq = pose_relative(jnp.asarray(ts[k - 1]), jnp.asarray(qs[k - 1]),
                                   jnp.asarray(ts[k]), jnp.asarray(qs[k]))
            dq = quat_normalize(quat_mul(dq, drift_rot))
            t_d = t_d + quat_rotate(q_d, dt)
            q_d = quat_normalize(quat_mul(q_d, dq))
            g = add_node(g, t_d, q_d)
        drift_before = float(jnp.linalg.norm(g.t[n - 1] - jnp.asarray(ts[n - 1])))
        assert drift_before > 0.3  # the bias produced real drift

        # loop factor: true relative pose between last node and node 0
        rel_t, rel_q = pose_relative(jnp.asarray(ts[n - 1]), jnp.asarray(qs[n - 1]),
                                     jnp.asarray(ts[0]), jnp.asarray(qs[0]))
        g = add_loop(g, n - 1, 0, rel_t, rel_q, fitness=jnp.asarray(0.05))
        g2 = optimize_graph(g, n_iters=15)
        # loop constraint satisfied: relative pose last→first ≈ measured
        rt2, rq2 = pose_relative(g2.t[n - 1], g2.q[n - 1], g2.t[0], g2.q[0])
        assert float(jnp.linalg.norm(rt2 - rel_t)) < 0.05
        # and the total error vs ground truth shrinks substantially
        err_after = np.linalg.norm(np.asarray(g2.t[:n]) - ts, axis=1)
        err_before = np.linalg.norm(np.asarray(g.t[:n]) - ts, axis=1)
        assert err_after.mean() < 0.5 * err_before.mean()


class TestIcp:
    def _cloud(self, key, n=512):
        # box-ish structured cloud: three orthogonal planes + noise-free
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.uniform(k1, (n // 3, 2), minval=-5.0, maxval=5.0)
        p1 = jnp.stack([a[:, 0], a[:, 1], jnp.zeros(n // 3)], axis=1)
        p2 = jnp.stack([a[:, 0], -5.0 * jnp.ones(n // 3), a[:, 1] + 5.0], axis=1)
        p3 = jnp.stack([5.0 * jnp.ones(n // 3), a[:, 0], a[:, 1] + 5.0], axis=1)
        pts = jnp.concatenate([p1, p2, p3])
        return pts

    def test_recovers_known_transform(self):
        pts = self._cloud(jax.random.PRNGKey(0)).astype(jnp.float64)
        t_true = jnp.array([0.4, -0.3, 0.2])
        q_true = quat_normalize(jnp.array([1.0, 0.02, -0.015, 0.03]))
        src = quat_rotate(jnp.broadcast_to(quat_normalize(jnp.array([1.0, -0.02, 0.015, -0.03])), (pts.shape[0], 4)), pts)
        from lili_om_tpu.utils.math import pose_inverse

        ti, qi = pose_inverse(t_true, q_true)
        src = quat_rotate(jnp.broadcast_to(qi, (pts.shape[0], 4)), pts) + ti
        mask = jnp.ones(pts.shape[0], bool)
        res = icp_point_to_plane(src, mask, pts, mask,
                                 jnp.zeros(3), jnp.array([1.0, 0, 0, 0.0]), n_iters=15)
        # cm-level: plane-boundary correspondences in a sparse random
        # sampling bias the fit slightly; loop-closure noise is fitness-scaled
        # so this is well inside the usable envelope (lc_icp_thres=0.1)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_true), atol=2e-2)
        assert float(res.fitness) < 1e-3

    def test_fitness_high_for_bad_alignment(self):
        pts = self._cloud(jax.random.PRNGKey(1)).astype(jnp.float64)
        other = pts + jnp.array([50.0, 0.0, 0.0])  # far off, beyond planes
        mask = jnp.ones(pts.shape[0], bool)
        res = icp_point_to_plane(pts, mask, other, mask,
                                 jnp.zeros(3), jnp.array([1.0, 0, 0, 0.0]), n_iters=3)
        assert float(res.fitness) > 0.1  # reference gate lc_icp_thres=0.1

    def test_trimmed_fitness_survives_partial_overlap(self):
        """Occlusion shadows make ~25% of a revisit's points unmatched (a
        viewpoint shift moves shadow boundaries by meters at range). The
        PCL untrimmed fitness (trim=1) explodes on an aligned pair; the
        trimmed default scores the overlapping region."""
        pts = self._cloud(jax.random.PRNGKey(2)).astype(jnp.float64)
        mask = jnp.ones(pts.shape[0], bool)
        # src = tgt plus a 25% disjoint "shadow" cluster meters away
        n_shadow = pts.shape[0] // 3
        shadow = pts[:n_shadow] + jnp.array([0.0, 8.0, 3.0])
        src = jnp.concatenate([pts, shadow])
        smask = jnp.ones(src.shape[0], bool)
        ident = (jnp.zeros(3), jnp.array([1.0, 0, 0, 0.0]))
        res_pcl = icp_point_to_plane(src, smask, pts, mask, *ident,
                                     n_iters=0, trim=1.0)
        res_trim = icp_point_to_plane(src, smask, pts, mask, *ident,
                                      n_iters=0, trim=0.7)
        assert float(res_pcl.fitness) > 1.0  # shadows dominate the PCL score
        assert float(res_trim.fitness) < 0.05  # overlap region is aligned
        # a genuinely misaligned pair still fails the trimmed gate
        res_bad = icp_point_to_plane(src + 2.0, smask, pts, mask, *ident,
                                     n_iters=0, trim=0.7)
        assert float(res_bad.fitness) > 0.3


class TestChainSolver:
    """The linear-time block-tridiagonal + Woodbury solver must match the
    dense reference solver (same GN problem) and scale past the dense
    solver's feasible size."""

    def _noisy_graph(self, n=24, n_loops=2, seed=7):
        from lili_om_tpu.models.pose_graph import ensure_capacity

        rng = np.random.default_rng(seed)
        g = init_graph(32, loop_capacity=4, dtype=jnp.float64)
        t = np.zeros(3)
        q = np.array([1.0, 0, 0, 0])
        qs = [q]
        for i in range(n):
            g = ensure_capacity(g, i + 1)
            g = add_node(g, jnp.asarray(t), jnp.asarray(qs[-1]))
            t = t + rng.normal(size=3) * 0.5
            qs.append(np.asarray(quat_normalize(quat_mul(
                jnp.asarray(qs[-1]), exp_so3(jnp.asarray(rng.normal(size=3) * 0.1))))))
        for l in range(n_loops):
            g = add_loop(g, n - 1 - l, 2 + l,
                         jnp.asarray(rng.normal(size=3) * 0.1),
                         jnp.asarray([1.0, 0, 0, 0], jnp.float64), 0.05)
        # perturb the estimate so GN has work to do
        return g._replace(t=g.t + jnp.asarray(rng.normal(size=g.t.shape) * 0.05))

    def test_matches_dense_solver(self):
        from lili_om_tpu.models.pose_graph import optimize_graph_chain

        g = self._noisy_graph()
        gd = optimize_graph(g, n_iters=8)
        gc = optimize_graph_chain(g, n_iters=8)
        np.testing.assert_allclose(np.asarray(gc.t), np.asarray(gd.t), atol=1e-9)
        np.testing.assert_allclose(np.asarray(gc.q), np.asarray(gd.q), atol=1e-10)

    def test_no_loops_matches_dense(self):
        from lili_om_tpu.models.pose_graph import optimize_graph_chain

        g = self._noisy_graph(n_loops=0)
        gd = optimize_graph(g, n_iters=5)
        gc = optimize_graph_chain(g, n_iters=5)
        np.testing.assert_allclose(np.asarray(gc.t), np.asarray(gd.t), atol=1e-9)

    def test_large_graph_solves(self):
        # 2048 nodes — the dense solver would build a 12288² H; the chain
        # solver runs it in O(N)
        from lili_om_tpu.models.pose_graph import optimize_graph_chain

        N = 2048
        rng = np.random.default_rng(0)
        g = init_graph(N, loop_capacity=8, dtype=jnp.float64)
        g = g._replace(
            n_nodes=jnp.asarray(N, jnp.int32),
            node_valid=jnp.ones((N,), bool),
            rel_valid=jnp.ones((N,), bool),
            t=jnp.asarray(np.cumsum(rng.normal(size=(N, 3)), axis=0) * 0.1))
        out = optimize_graph_chain(g, n_iters=2)
        assert np.all(np.isfinite(np.asarray(out.t)))
        assert np.all(np.isfinite(np.asarray(out.q)))

    def test_block_tridiag_solve_exact(self):
        from lili_om_tpu.models.pose_graph import block_tridiag_solve

        rng = np.random.default_rng(11)
        N = 12
        # random SPD block-tridiagonal system
        Bs = rng.normal(size=(N, 6, 6)) * 0.1
        Ds = np.stack([np.eye(6) * 4 + rng.normal(size=(6, 6)) * 0.05
                       for _ in range(N)])
        Ds = 0.5 * (Ds + Ds.transpose(0, 2, 1))
        T = np.zeros((6 * N, 6 * N))
        for i in range(N):
            T[6*i:6*i+6, 6*i:6*i+6] = Ds[i]
            if i + 1 < N:
                T[6*i:6*i+6, 6*i+6:6*i+12] = Bs[i]
                T[6*i+6:6*i+12, 6*i:6*i+6] = Bs[i].T
        rhs = rng.normal(size=(N, 6, 3))
        X = block_tridiag_solve(jnp.asarray(Ds), jnp.asarray(Bs), jnp.asarray(rhs))
        expect = np.linalg.solve(T, rhs.reshape(6 * N, 3))
        np.testing.assert_allclose(np.asarray(X).reshape(6 * N, 3), expect,
                                   rtol=1e-8, atol=1e-8)
