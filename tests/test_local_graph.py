"""Local pose graph densification (buildLocalPoseGraph/optimizeLocalGraph)."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.models.local_graph import optimize_local_chain, propagate_interval
from lili_om_tpu.ops.preintegration import ImuNoise
from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
from lili_om_tpu.utils.math import exp_so3, pose_relative, quat_mul, quat_normalize


class TestPropagateInterval:
    def test_matches_ground_truth_on_exact_imu(self):
        traj = circle_trajectory(radius=10.0, period=30.0)
        t0, t1 = 6.0, 6.3
        imu = simulate_imu(traj, t0, t1, rate=200.0)
        dts = jnp.diff(imu.stamps)
        eps = 1e-4
        p0m, _ = pose_at(traj, t0 - eps)
        p0p, _ = pose_at(traj, t0 + eps)
        v0 = (p0p - p0m) / (2 * eps)
        tl, ql = pose_at(traj, t0)
        # frames at 0.1 and 0.2 s into the interval (= samples 20, 40)
        fidx = jnp.array([19, 39], jnp.int32)
        ts, qs = propagate_interval(tl, ql, v0, dts, imu.accs[1:], imu.gyrs[1:],
                                    jnp.ones(dts.shape, bool), fidx,
                                    jnp.ones(2, bool), ImuNoise())
        for i, toff in enumerate([0.1, 0.2]):
            tg, _ = pose_at(traj, t0 + toff)
            assert float(jnp.linalg.norm(ts[i] - tg)) < 5e-3, (i, ts[i], tg)


class TestOptimizeLocalChain:
    def test_anchors_distribute_correction(self):
        """A straight-line chain whose right end is anchored 0.3 m away from
        the propagated end: the correction must spread over the chain and
        the last node must land on the anchor."""
        F = 4
        t_init = jnp.stack([jnp.array([0.25 * (i + 1), 0.0, 0.0]) for i in range(F)])
        q_init = jnp.tile(jnp.array([1.0, 0, 0, 0.0]), (F, 1))
        mask = jnp.ones(F, bool)
        t_left = jnp.zeros(3)
        q_left = jnp.array([1.0, 0, 0, 0.0])
        t_right = jnp.array([1.0, 0.3, 0.0])  # anchor pulled sideways
        q_right = quat_normalize(quat_mul(q_left, exp_so3(jnp.array([0, 0, 0.05]))))

        out = optimize_local_chain(t_init, q_init, mask, t_left, q_left,
                                   t_right, q_right, n_iters=15)
        # all factors share one weight (reference LidarPose*Factor weight 1.0)
        # so the endpoint balances between the chain and the anchor: it must
        # move most of the way toward the anchor, and the correction must
        # distribute monotonically along the chain
        y = np.asarray(out.t[:, 1])
        assert y[-1] > 0.6 * 0.3, y
        assert np.all(np.diff(y) > -1e-6)
        assert 0.0 < y[0] < y[-1]

    def test_identity_when_consistent(self):
        """If the anchors agree with the propagated chain, nothing moves."""
        F = 3
        t_init = jnp.stack([jnp.array([0.5 * (i + 1), 0.0, 0.0]) for i in range(F)])
        q_init = jnp.tile(jnp.array([1.0, 0, 0, 0.0]), (F, 1))
        mask = jnp.ones(F, bool)
        out = optimize_local_chain(
            t_init, q_init, mask,
            jnp.zeros(3), jnp.array([1.0, 0, 0, 0.0]),
            t_init[-1], q_init[-1], n_iters=8)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(t_init), atol=1e-8)

    def test_masked_chain(self):
        """Only the first 2 of 4 slots valid: the last valid node takes the
        right anchor."""
        F = 4
        t_init = jnp.stack([jnp.array([0.5 * (i + 1), 0.0, 0.0]) for i in range(F)])
        q_init = jnp.tile(jnp.array([1.0, 0, 0, 0.0]), (F, 1))
        mask = jnp.array([True, True, False, False])
        t_right = jnp.array([1.0, 0.2, 0.0])
        out = optimize_local_chain(
            t_init, q_init, mask,
            jnp.zeros(3), jnp.array([1.0, 0, 0, 0.0]),
            t_right, q_init[0], n_iters=12)
        # the last VALID node (index 1) moves toward the right anchor
        assert float(out.t[1, 1]) > 0.08
        # frozen nodes unchanged
        np.testing.assert_allclose(np.asarray(out.t[2:]), np.asarray(t_init[2:]), atol=1e-6)
