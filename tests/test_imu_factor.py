"""IMU factor consistency: the whitened residual must vanish at states that
exactly satisfy the preintegrated motion (Preintegration::evaluate semantics,
LiLi-OM/include/factors/Preintegration.h:175-211)."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.factors.imu import imu_factor
from lili_om_tpu.ops.preintegration import ImuNoise, integrate
from lili_om_tpu.sim.trajectory import circle_trajectory, pose_at, simulate_imu
from lili_om_tpu.utils.math import quat_rotate, quat_conj


def _interval_states(traj, t0, t1, rate=200.0):
    noise = ImuNoise()
    imu = simulate_imu(traj, t0, t1, rate=rate)
    dts = jnp.diff(imu.stamps)
    ba = jnp.zeros(3)
    bg = jnp.zeros(3)
    pre = integrate(noise, ba, bg, imu.accs[0], imu.gyrs[0], dts, imu.accs[1:], imu.gyrs[1:])

    def vel(t):
        eps = 1e-4
        p0, _ = pose_at(traj, t - eps)
        p1, _ = pose_at(traj, t + eps)
        return (p1 - p0) / (2 * eps)

    Pi, Qi = pose_at(traj, t0)
    Pj, Qj = pose_at(traj, t1)
    return noise, pre, (Pi, Qi, vel(t0), ba, bg), (Pj, Qj, vel(t1), ba, bg)


class TestImuFactor:
    def test_residual_small_at_truth(self):
        traj = circle_trajectory(radius=10.0, period=30.0)
        noise, pre, si, sj = _interval_states(traj, 5.0, 5.3)
        r, Ji, Jj = imu_factor(pre, noise, *si, *sj)
        # whitened residual: should be small relative to the information scale
        # (velocity by central difference + 200 Hz discretization)
        unwhitened_scale = 1e-3
        from lili_om_tpu.ops.preintegration import residual

        raw = residual(pre, noise, *si, *sj)
        assert float(jnp.abs(raw[:9]).max()) < unwhitened_scale, raw

    def test_jacobian_shapes_and_finiteness(self):
        traj = circle_trajectory(radius=10.0, period=30.0)
        noise, pre, si, sj = _interval_states(traj, 2.0, 2.2)
        r, Ji, Jj = imu_factor(pre, noise, *si, *sj)
        assert r.shape == (15,) and Ji.shape == (15, 15) and Jj.shape == (15, 15)
        assert np.all(np.isfinite(np.asarray(Ji)))
        assert np.all(np.isfinite(np.asarray(Jj)))

    def test_residual_detects_position_error(self):
        traj = circle_trajectory(radius=10.0, period=30.0)
        noise, pre, si, sj = _interval_states(traj, 5.0, 5.3)
        Pj, Qj, Vj, Baj, Bgj = sj
        r0, _, _ = imu_factor(pre, noise, *si, Pj, Qj, Vj, Baj, Bgj)
        r1, _, _ = imu_factor(pre, noise, *si, Pj + jnp.array([0.5, 0, 0]), Qj, Vj, Baj, Bgj)
        assert float(jnp.linalg.norm(r1)) > float(jnp.linalg.norm(r0)) + 1.0

    def test_analytic_matches_autodiff(self):
        """The hand-derived Jacobians must agree with jacfwd through the
        retraction (first-order; normalize treated as identity)."""
        from lili_om_tpu.factors.imu import imu_factor_analytic

        traj = circle_trajectory(radius=10.0, period=30.0)
        noise, pre, si, sj = _interval_states(traj, 3.0, 3.25)
        # non-trivial biases at the linearization point
        si = (si[0], si[1], si[2], jnp.array([0.02, -0.01, 0.03]), jnp.array([0.001, 0.002, -0.001]))
        sj = (sj[0], sj[1], sj[2], jnp.array([0.02, -0.01, 0.03]), jnp.array([0.001, 0.002, -0.001]))
        r_ad, Ji_ad, Jj_ad = imu_factor(pre, noise, *si, *sj)
        r_an, Ji_an, Jj_an = imu_factor_analytic(pre, noise, *si, *sj)
        np.testing.assert_allclose(np.asarray(r_an), np.asarray(r_ad), rtol=1e-9, atol=1e-12)
        scale = np.abs(np.asarray(Ji_ad)).max()
        np.testing.assert_allclose(np.asarray(Ji_an), np.asarray(Ji_ad),
                                   atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(Jj_an), np.asarray(Jj_ad),
                                   atol=2e-4 * scale)

    def test_gravity_consistency(self):
        """Static trajectory: accelerometer reads −g in body, propagation
        holds position (the reference convention g_vec=(0,0,−9.805))."""
        noise = ImuNoise()
        n = 100
        dts = jnp.full((n,), 0.005)
        accs = jnp.tile(jnp.array([0.0, 0.0, noise.g_norm]), (n, 1))
        gyrs = jnp.zeros((n, 3))
        from lili_om_tpu.ops.preintegration import propagate_world

        t, q, v, _, _ = propagate_world(
            jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3), noise,
            accs[0], gyrs[0], dts, accs, gyrs,
        )
        np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-9)
