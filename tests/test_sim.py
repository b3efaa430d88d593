"""Simulation substrate tests: IMU consistency with trajectories, ray-cast
geometry, scan patterns."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops import preintegration as pre
from lili_om_tpu.sim import lidar, trajectory as tj, world as w
from lili_om_tpu.utils import math as m


def test_imu_preintegration_recovers_trajectory():
    """Integrating simulated IMU between two stamps lands on the true pose —
    closes the loop between sim and preintegration."""
    traj = tj.circle_trajectory(radius=15.0, period=40.0)
    noise = pre.ImuNoise()
    t0, t1 = 5.0, 5.5
    seq = tj.simulate_imu(traj, t0, t1, rate=400.0, noise=noise)
    p0, q0 = tj.pose_at(traj, t0)
    p1, q1 = tj.pose_at(traj, t1)
    # true velocity by autodiff
    v0 = jax.jacfwd(lambda t: traj(t)[0])(jnp.asarray(t0))
    dts = jnp.diff(seq.stamps)
    tP, tQ, tV, _, _ = pre.propagate_world(
        p0, q0, v0, jnp.zeros(3), jnp.zeros(3), noise,
        seq.accs[0], seq.gyrs[0], dts, seq.accs[1:], seq.gyrs[1:],
    )
    np.testing.assert_allclose(tP, p1, atol=2e-4)
    assert jnp.linalg.norm(m.log_so3(m.quat_mul(m.quat_conj(tQ), q1))) < 1e-4

    # the preintegration residual on true states is ~0
    v1 = jax.jacfwd(lambda t: traj(t)[0])(jnp.asarray(t1))
    p = pre.integrate(noise, jnp.zeros(3), jnp.zeros(3), seq.accs[0], seq.gyrs[0], dts, seq.accs[1:], seq.gyrs[1:])
    r = pre.residual(p, noise, p0, q0, v0, jnp.zeros(3), jnp.zeros(3), p1, q1, v1, jnp.zeros(3), jnp.zeros(3))
    assert jnp.max(jnp.abs(r)) < 5e-4


def test_ray_cast_plane_distance():
    b = w.WorldBuilder()
    b.add_plane((10.0, 0.0, 0.0), (-1, 0, 0), (0, 1, 0), 5.0, 5.0)
    world = b.build(jnp.float64)
    origins = jnp.zeros((3, 3))
    dirs = jnp.array([[1.0, 0, 0], [1.0, 0.9, 0.0], [-1.0, 0, 0]])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    r = w.ray_cast(world, origins, dirs)
    np.testing.assert_allclose(r[0], 10.0, atol=1e-9)
    # oblique ray exits patch bounds (10*0.9=9 > half_u=5 at x=10) → miss
    assert jnp.isinf(r[1])
    assert jnp.isinf(r[2])  # behind


def test_ray_cast_cylinder():
    b = w.WorldBuilder()
    b.add_pole((5.0, 0.0, 0.0), radius=0.5, height=10.0)
    world = b.build(jnp.float64)
    r = w.ray_cast(world, jnp.zeros((2, 3)), jnp.array([[1.0, 0, 0], [0, 1.0, 0]]))
    np.testing.assert_allclose(r[0], 4.5, atol=1e-9)
    assert jnp.isinf(r[1])


def test_room_scan_hits_everything():
    world = w.make_room_world()
    pat = lidar.spinning_pattern(n_rings=16, n_cols=360)
    traj = tj.static_trajectory((0.0, 0.0, 1.0))
    scan = lidar.simulate_scan(world, lambda t: traj(t), 0.0, pat)
    frac = float(jnp.mean(scan.valid))
    assert frac > 0.95, f"only {frac:.2%} rays hit in a closed room"
    rng = jnp.linalg.norm(scan.pts, axis=-1)
    assert float(jnp.max(jnp.where(scan.valid, rng, 0.0))) < 100.0


def test_scan_distortion_matches_motion():
    """A wall point measured late in the sweep shifts by the motion during
    the sweep when naively accumulated — verify the simulator distorts."""
    b = w.WorldBuilder()
    b.add_plane((20.0, 0.0, 0.0), (-1, 0, 0), (0, 1, 0), 50.0, 50.0)
    world = b.build()
    speed = 10.0

    def traj(t):
        return jnp.stack([speed * t, 0.0 * t, 0.0 * t]), jnp.array([1.0, 0.0, 0.0, 0.0])

    # two rays straight ahead: one at t=0, one at end of sweep
    pat = lidar.ScanPattern(
        dirs=jnp.array([[1.0, 0, 0], [1.0, 0, 0]]),
        rel_time=jnp.array([0.0, 0.9]),
        line=jnp.array([0, 0], jnp.int32),
    )
    scan = lidar.simulate_scan(world, traj, 0.0, pat, period=0.1)
    # ranges: 20 at t=0; 20 − speed·0.09 at t=0.009s... (0.9 of 0.1s)
    np.testing.assert_allclose(scan.pts[0, 0], 20.0, atol=1e-4)
    np.testing.assert_allclose(scan.pts[1, 0], 20.0 - speed * 0.09, atol=1e-3)


def test_livox_pattern_shape():
    pat = lidar.livox_pattern(pts_per_line=500)
    assert pat.dirs.shape == (3000, 3)
    np.testing.assert_allclose(jnp.linalg.norm(pat.dirs, axis=-1), 1.0, atol=1e-5)
    # all within FOV
    az = jnp.arctan2(pat.dirs[:, 1], pat.dirs[:, 0])
    assert float(jnp.max(jnp.abs(az))) <= np.deg2rad(81.7 / 2) + 1e-3
    assert jnp.all(pat.line == jnp.repeat(jnp.arange(6), 500))
