"""Analytic ground-truth trajectories + exact IMU synthesis via autodiff.

The reference validates end-to-end against recorded rosbags (README.md:57-76,
not vendored); this module is the deterministic substrate that replaces them
(SURVEY.md §4). Trajectories are smooth closures ``t → (p(3), q(4))``; IMU
measurements fall out exactly by differentiating through the closure:

  gyro_body = 2 · vec(q(t)⁻¹ ⊗ q̇(t))          (body angular rate)
  acc_body  = R(t)ᵀ (p̈(t) − g_vec)             (specific force)

with the reference gravity convention ``g_vec = (0,0,−9.805)``
(Preintegration.h:46).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.preintegration import ImuNoise
from ..utils.math import exp_so3, quat_conj, quat_mul, quat_normalize, quat_to_rotmat

Trajectory = Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def circle_trajectory(radius: float = 20.0, period: float = 60.0, height_amp: float = 0.5,
                      speed_up: float = 8.0) -> Trajectory:
    """Closed-loop circular trajectory with gentle height oscillation, yaw
    tangent to the path. Returns to the start pose each ``period`` — used by
    loop-closure tests. ``speed_up`` ramps velocity smoothly from rest so
    t=0 starts stationary (friendlier to odometry initialization)."""
    omega = 2.0 * jnp.pi / period

    def phase(t):
        # smooth ramp: s(t) = t - speed_up*(1-exp(-t/speed_up)) has s(0)=0, s'(0)=0
        return omega * (t - speed_up * (1.0 - jnp.exp(-t / speed_up)))

    def traj(t):
        th = phase(t)
        p = jnp.stack([radius * jnp.cos(th) - radius, radius * jnp.sin(th), height_amp * jnp.sin(2.0 * th)])
        yaw = th + jnp.pi / 2.0
        q = exp_so3(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw]))
        return p, q

    return traj


def straight_trajectory(speed: float = 2.0, wiggle_amp: float = 0.5, wiggle_period: float = 8.0,
                        yaw_amp: float = 0.08) -> Trajectory:
    """Corridor-style forward motion with small lateral wiggle and yaw
    oscillation (keeps the problem observably 6-dof)."""

    def traj(t):
        w = 2.0 * jnp.pi / wiggle_period
        p = jnp.stack([speed * t, wiggle_amp * jnp.sin(w * t), 0.1 * jnp.sin(0.5 * w * t)])
        ang = jnp.stack([0.02 * jnp.sin(w * t), 0.02 * jnp.cos(0.7 * w * t), yaw_amp * jnp.sin(0.8 * w * t)])
        return p, exp_so3(ang)

    return traj


def aggressive_trajectory(speed: float = 1.5, yaw_amp: float = 1.0,
                          burst_amp: float = 0.8, burst_freq: float = 2.2,
                          ramp: float = 4.0) -> Trajectory:
    """Fast-rotation, speed-varying handheld-style trajectory — the golden
    stand-in for aggressive real sequences (the regime where the frontend's
    gyro-only undistortion degrades and the IMU-fused backend must stay
    bounded; see tests/test_golden_motion.py). Peak yaw rate ≈
    ``yaw_amp·0.8 + burst_amp·burst_freq`` ≈ 2.6 rad/s at the defaults
    (≥ 1.5 rad/s bursts), with ±50 % speed modulation and gentle
    roll/pitch rocking. Smooth everywhere (exact IMU via autodiff); starts
    at rest via the same ramp as :func:`circle_trajectory`."""

    def s(t):  # smooth start ramp: s(0)=0, s'(0)=0, s'(∞)=1
        return t - ramp * (1.0 - jnp.exp(-t / ramp))

    def traj(t):
        u = s(t)
        p = jnp.stack([
            speed * u + 1.0 * jnp.sin(0.6 * u),
            2.0 * jnp.sin(0.35 * u),
            0.3 * jnp.sin(0.9 * u),
        ])
        yaw = yaw_amp * jnp.sin(0.8 * u) + burst_amp * jnp.sin(burst_freq * u)
        roll = 0.08 * jnp.sin(1.3 * u)
        pitch = 0.08 * jnp.sin(1.1 * u + 0.7)
        q = quat_mul(exp_so3(jnp.stack([jnp.zeros_like(yaw),
                                        jnp.zeros_like(yaw), yaw])),
                     exp_so3(jnp.stack([roll, pitch, jnp.zeros_like(yaw)])))
        return p, quat_normalize(q)

    return traj


def static_trajectory(p0=(0.0, 0.0, 0.0)) -> Trajectory:
    def traj(t):
        return jnp.asarray(p0) * jnp.ones_like(t)[..., None] if jnp.ndim(t) else jnp.asarray(p0), \
               jnp.array([1.0, 0.0, 0.0, 0.0])

    return traj


def pose_at(traj: Trajectory, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
    p, q = traj(jnp.asarray(t, jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(t))
    return p, quat_normalize(q)


def body_rates(traj: Trajectory, t):
    """Exact (gyro_body, acc_body) at time t via autodiff through the closure."""
    t = jnp.asarray(t)

    def pos(tt):
        return traj(tt)[0]

    def quat(tt):
        return quat_normalize(traj(tt)[1])

    a_world = jax.jacfwd(jax.jacfwd(pos))(t)
    q = quat(t)
    qdot = jax.jacfwd(quat)(t)
    # ω_body = 2 · vec(q⁻¹ ⊗ q̇)
    gyro = 2.0 * quat_mul(quat_conj(q), qdot)[1:]
    return gyro, a_world, q


class ImuSequence(NamedTuple):
    """A fixed-rate IMU stream (arrays over samples)."""

    stamps: jnp.ndarray  # (N,)
    accs: jnp.ndarray  # (N,3) specific force, body frame
    gyrs: jnp.ndarray  # (N,3) angular rate, body frame


def simulate_imu(
    traj: Trajectory,
    t0: float,
    t1: float,
    rate: float = 200.0,
    noise: ImuNoise = ImuNoise(),
    acc_bias=(0.0, 0.0, 0.0),
    gyr_bias=(0.0, 0.0, 0.0),
    noise_scale: float = 0.0,
    key=None,
) -> ImuSequence:
    """Generate IMU measurements on [t0, t1] at ``rate`` Hz.

    ``noise_scale`` scales white noise with the densities in ``noise``
    (0 → exact measurements). Biases are constant additive offsets.
    """
    n = int(round((t1 - t0) * rate)) + 1
    stamps = t0 + jnp.arange(n) / rate
    g = noise.g_vec(stamps.dtype)

    def one(t):
        gyro, a_world, q = body_rates(traj, t)
        R = quat_to_rotmat(q)
        acc_body = R.T @ (a_world - g)
        return acc_body, gyro

    accs, gyrs = jax.vmap(one)(stamps)
    accs = accs + jnp.asarray(acc_bias)
    gyrs = gyrs + jnp.asarray(gyr_bias)
    if noise_scale > 0.0 and key is not None:
        k1, k2 = jax.random.split(key)
        sqrt_rate = jnp.sqrt(rate)
        accs = accs + noise_scale * noise.acc_n * sqrt_rate * jax.random.normal(k1, accs.shape, accs.dtype)
        gyrs = gyrs + noise_scale * noise.gyr_n * sqrt_rate * jax.random.normal(k2, gyrs.shape, gyrs.dtype)
    return ImuSequence(stamps, accs, gyrs)
