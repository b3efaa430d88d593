"""Factor residual/Jacobian checks against autodiff (SURVEY.md §4 strategy:
every analytic Jacobian is compared with ``jax.jacfwd`` through the same
residual expressed via retraction)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.factors.lidar import (
    EdgeFactorBatch,
    PlaneFactorBatch,
    cauchy_weight,
    edge_residual,
    huber_weight,
    plane_residual,
    relative_pose_residual,
)
from lili_om_tpu.utils.math import exp_so3, quat_mul, quat_normalize, quat_rotate


def random_pose(key):
    k1, k2 = jax.random.split(key)
    t = jax.random.normal(k1, (3,))
    q = quat_normalize(jax.random.normal(k2, (4,)))
    return t, q


def retract(t, q, delta):
    return t + delta[:3], quat_normalize(quat_mul(q, exp_so3(delta[3:6])))


class TestPlaneFactor:
    def _batch(self, key, n=7):
        ks = jax.random.split(key, 4)
        pts = jax.random.normal(ks[0], (n, 3))
        normals = jax.random.normal(ks[1], (n, 3))
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        offsets = jax.random.normal(ks[2], (n,))
        scores = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=1.0)
        mask = jnp.array([True] * (n - 2) + [False, True])
        return PlaneFactorBatch(pts, normals, offsets, scores, mask)

    def test_residual_value(self):
        key = jax.random.PRNGKey(0)
        t, q = random_pose(key)
        b = self._batch(jax.random.PRNGKey(1))
        r, _ = plane_residual(t, q, b)
        pw = quat_rotate(jnp.broadcast_to(q, (b.pts.shape[0], 4)), b.pts) + t
        expected = b.scores * (jnp.sum(b.normals * pw, axis=-1) + b.offsets)
        expected = jnp.where(b.mask, expected, 0.0)
        np.testing.assert_allclose(np.asarray(r), np.asarray(expected), atol=1e-10)

    def test_jacobian_vs_autodiff(self):
        t, q = random_pose(jax.random.PRNGKey(2))
        b = self._batch(jax.random.PRNGKey(3))
        _, J = plane_residual(t, q, b)

        def res(delta):
            t2, q2 = retract(t, q, delta)
            return plane_residual(t2, q2, b)[0]

        J_ad = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-8)

    def test_masked_rows_zero(self):
        t, q = random_pose(jax.random.PRNGKey(4))
        b = self._batch(jax.random.PRNGKey(5))
        r, J = plane_residual(t, q, b)
        assert float(jnp.abs(r[~b.mask]).max()) == 0.0
        assert float(jnp.abs(J[~b.mask]).max()) == 0.0


class TestEdgeFactor:
    def _batch(self, key, n=6):
        ks = jax.random.split(key, 4)
        pts = jax.random.normal(ks[0], (n, 3))
        centroid = jax.random.normal(ks[1], (n, 3))
        direction = jax.random.normal(ks[2], (n, 3))
        direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
        # virtual points at centroid ± 0.1·dir (BackendFusion.cpp:1583-1597)
        a = centroid + 0.1 * direction
        bpt = centroid - 0.1 * direction
        scores = jax.random.uniform(ks[3], (n,), minval=0.2, maxval=1.0)
        mask = jnp.ones((n,), bool)
        return EdgeFactorBatch(pts, a, bpt, scores, mask)

    def test_residual_is_point_line_distance(self):
        t, q = random_pose(jax.random.PRNGKey(6))
        b = self._batch(jax.random.PRNGKey(7))
        r, _ = edge_residual(t, q, b)
        y = quat_rotate(jnp.broadcast_to(q, (b.pts.shape[0], 4)), b.pts) + t
        # reference formula ‖(y−a)×(y−b)‖/‖a−b‖ (LidarKeyframeFactor.h:30-35)
        num = jnp.linalg.norm(jnp.cross(y - b.point_a, y - b.point_b), axis=-1)
        den = jnp.linalg.norm(b.point_a - b.point_b, axis=-1)
        np.testing.assert_allclose(np.asarray(r), np.asarray(b.scores * num / den), atol=1e-9)

    def test_jacobian_vs_autodiff(self):
        t, q = random_pose(jax.random.PRNGKey(8))
        b = self._batch(jax.random.PRNGKey(9))
        _, J = edge_residual(t, q, b)

        def res(delta):
            t2, q2 = retract(t, q, delta)
            return edge_residual(t2, q2, b)[0]

        J_ad = jax.jacfwd(res)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), atol=1e-7)


class TestRelativePoseFactor:
    def test_zero_at_truth(self):
        t1, q1 = random_pose(jax.random.PRNGKey(10))
        t2, q2 = random_pose(jax.random.PRNGKey(11))
        from lili_om_tpu.utils.math import pose_relative

        dt, dq = pose_relative(t1, q1, t2, q2)
        r = relative_pose_residual(t1, q1, t2, q2, dt, dq)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)

    def test_weight_scaling(self):
        t1, q1 = random_pose(jax.random.PRNGKey(12))
        t2, q2 = random_pose(jax.random.PRNGKey(13))
        r1 = relative_pose_residual(t1, q1, t2, q2, jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), weight=1.0)
        r02 = relative_pose_residual(t1, q1, t2, q2, jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), weight=0.2)
        np.testing.assert_allclose(np.asarray(r02), 0.2 * np.asarray(r1), atol=1e-12)


class TestRobustWeights:
    def test_huber(self):
        # below delta: weight 1; above: sqrt(delta/|r|)
        assert float(huber_weight(jnp.array(0.05**2), 0.1)) == pytest.approx(1.0)
        assert float(huber_weight(jnp.array(0.4**2), 0.1)) == pytest.approx(np.sqrt(0.1 / 0.4))

    def test_cauchy(self):
        assert float(cauchy_weight(jnp.array(0.0), 1.0)) == pytest.approx(1.0)
        assert float(cauchy_weight(jnp.array(3.0**2), 1.0)) == pytest.approx(1.0 / np.sqrt(10.0))

    def test_huber_irls_matches_loss_gradient(self):
        # IRLS weight w satisfies w²·r = ρ'(r²)·r for the scaled Huber used by Ceres
        delta = 0.1
        for rv in [0.03, 0.5]:
            w = float(huber_weight(jnp.array(rv * rv), delta))
            rho_prime = 1.0 if rv <= delta else delta / rv  # dρ/d(r²)·2 ... normalized
            assert w * w == pytest.approx(rho_prime, rel=1e-9)


class TestGnSolver:
    def test_converges_on_synthetic_planes(self):
        """GN over plane factors recovers a known pose from perfect planes."""
        from lili_om_tpu.solver.gn import gn_update

        key = jax.random.PRNGKey(42)
        t_true = jnp.array([0.3, -0.2, 0.1])
        q_true = quat_normalize(jnp.array([1.0, 0.05, -0.03, 0.08]))
        n = 64
        ks = jax.random.split(key, 2)
        normals = jax.random.normal(ks[0], (n, 3))
        normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
        pts_world = jax.random.normal(ks[1], (n, 3)) * 5.0
        offsets = -jnp.sum(normals * pts_world, axis=-1)  # planes through pts_world
        # body points that land exactly on the planes under the true pose
        pts_body = quat_rotate(jnp.broadcast_to(quat_normalize(jnp.array([1.0, -0.05, 0.03, -0.08])), (n, 4)), pts_world)  # approx inverse — not exact; instead:
        from lili_om_tpu.utils.math import pose_inverse

        ti, qi = pose_inverse(t_true, q_true)
        pts_body = quat_rotate(jnp.broadcast_to(qi, (n, 4)), pts_world) + ti
        batch = PlaneFactorBatch(pts_body, normals, offsets, jnp.ones(n), jnp.ones(n, bool))

        t = jnp.zeros(3)
        q = jnp.array([1.0, 0.0, 0.0, 0.0])
        for _ in range(10):
            r, J = plane_residual(t, q, batch)
            d = gn_update(J, r, damping=1e-10)
            t, q = retract(t, q, d)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-6)
        assert float(jnp.abs(quat_mul(jnp.array([1.0, 0, 0, 0]), q) - q_true).max()) < 1e-6 or \
            float(jnp.abs(q + q_true).max()) < 1e-6

    def test_singular_system_returns_zero_step(self):
        from lili_om_tpu.solver.gn import solve_normal

        H = jnp.zeros((6, 6))
        b = jnp.ones(6)
        d = solve_normal(H, b, 0.0)
        np.testing.assert_allclose(np.asarray(d), 0.0)
