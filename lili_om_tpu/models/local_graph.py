"""Hierarchical local pose graph — densifies non-keyframe poses inside a
keyframe interval (buildLocalPoseGraph / optimizeLocalGraph,
LiLi-OM/src/BackendFusion.cpp:1892-2175, :1309-1384).

Reference semantics, kept exactly:

* intermediate frame poses are initialized by midpoint IMU propagation from
  the older keyframe's optimized state (zero biases, :1908-2108);
* the chain-factor *measurements* are the relative poses between those
  IMU-propagated intermediates (:2110-2144);
* the chain is anchored at both ends to the two bounding (optimized)
  keyframe poses (LidarPoseLeft/RightFactorAutoDiff), so the keyframe
  corrections are distributed over the interval while preserving the
  IMU-propagated relative shape;
* factor weight 1.0 (Livox) or 0.2 (ROT PoseFactor) — uniform, so it only
  matters if priors are mixed in (they aren't).

One jitted fixed-capacity program: GN over the 6·F-dim tangent of the
intermediate frames (replaces the Ceres DOGLEG solve, 15 iters, :1365-1370).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.preintegration import ImuNoise
from ..models.pose_graph import _between_block
from ..solver.gn import solve_normal
from ..utils.math import exp_so3, pose_relative, quat_mul, quat_normalize


class DensifiedInterval(NamedTuple):
    t: jnp.ndarray  # (F,3) optimized intermediate frame poses
    q: jnp.ndarray  # (F,4)
    mask: jnp.ndarray  # (F,)


@partial(jax.jit, static_argnames=("noise",))
def propagate_interval(
    t0, q0, v0,
    imu_dts, imu_accs, imu_gyrs, imu_valid,
    frame_idx: jnp.ndarray,  # (F,) index into the IMU stream where each frame ends
    frame_mask: jnp.ndarray,  # (F,)
    noise: ImuNoise = ImuNoise(),
):
    """Midpoint world propagation from the left keyframe state, sampling the
    pose at each intermediate frame boundary (zero biases, :1903-1907).

    ``frame_idx[i]`` = number of IMU samples before frame i's stamp.
    Returns (t (F,3), q (F,4)) — IMU-propagated frame poses.
    """
    z3 = jnp.zeros(3, t0.dtype)

    def step(carry, inp):
        t, q, v, a0, g0 = carry
        dt, a1, g1, valid = inp
        dt = jnp.where(valid, dt, 0.0)
        g = noise.g_vec(t.dtype)
        from ..utils.math import quat_rotate

        un_acc_0 = quat_rotate(q, a0) + g
        un_gyr = 0.5 * (g0 + g1)
        q1 = quat_normalize(quat_mul(q, exp_so3(un_gyr * dt)))
        un_acc_1 = quat_rotate(q1, a1) + g
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        t1 = t + v * dt + 0.5 * un_acc * dt * dt
        v1 = v + un_acc * dt
        q1 = jnp.where(valid, q1, q)
        return (t1, q1, v1, jnp.where(valid, a1, a0), jnp.where(valid, g1, g0)), (t1, q1)

    a_first = imu_accs[0]
    g_first = imu_gyrs[0]
    (_, _, _, _, _), (ts, qs) = jax.lax.scan(
        step, (t0, q0, v0, a_first, g_first),
        (imu_dts, imu_accs, imu_gyrs, imu_valid))
    # sample at frame boundaries
    idx = jnp.clip(frame_idx, 0, ts.shape[0] - 1)
    return ts[idx], qs[idx]


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_local_chain(
    t_init: jnp.ndarray,  # (F,3) IMU-propagated intermediates (last = right-kf stamp)
    q_init: jnp.ndarray,  # (F,4)
    mask: jnp.ndarray,  # (F,) valid intermediates
    t_left, q_left,  # fixed left keyframe pose
    t_right, q_right,  # fixed right keyframe pose
    weight: float = 1.0,
    n_iters: int = 10,
    damping: float = 1e-8,
) -> DensifiedInterval:
    """GN chain solve (optimizeLocalGraph :1309-1384). Variables are the F
    intermediate poses; measurements are the relative poses between the
    *initial* (IMU-propagated) intermediates; both ends anchor to the
    keyframe poses."""
    F = t_init.shape[0]
    dtype = t_init.dtype
    D = 6 * F

    # measured relatives from the initial chain (:2110-2144); entry 0 is
    # left-kf → frame0 — the reference seeds from the left keyframe state so
    # the first propagated relative starts there
    prev_t = jnp.concatenate([t_left[None], t_init[:-1]], axis=0)
    prev_q = jnp.concatenate([q_left[None], q_init[:-1]], axis=0)
    rel_t, rel_q = jax.vmap(pose_relative)(prev_t, prev_q, t_init, q_init)
    # right anchor: relative from last valid intermediate to the right kf is
    # implied by making the final chain node equal the right keyframe: the
    # last intermediate IS the right-kf stamp (:2146-2171), so anchor it.

    w = jnp.asarray(weight, dtype)

    def gn_iter(_, carry):
        t, q = carry
        H = jnp.zeros((D, D), dtype)
        g = jnp.zeros((D,), dtype)

        # left anchor: factor between fixed left kf and node 0
        r0, _, J0 = _between_block(t_left, q_left, t[0], q[0], rel_t[0], rel_q[0], w)
        on0 = mask[0].astype(dtype)
        H = H.at[0:6, 0:6].add(on0 * (J0.T @ J0))
        g = g.at[0:6].add(on0 * (J0.T @ r0))

        # chain factors i-1 → i
        def chain(i, Hg):
            H, g = Hg
            r, Ji, Jj = _between_block(t[i - 1], q[i - 1], t[i], q[i],
                                       rel_t[i], rel_q[i], w)
            on = (mask[i] & mask[i - 1]).astype(dtype)
            oi = (i - 1) * 6
            oj = i * 6
            Hii = on * (Ji.T @ Ji)
            Hjj = on * (Jj.T @ Jj)
            Hij = on * (Ji.T @ Jj)
            upd = lambda H, o1, o2, B: jax.lax.dynamic_update_slice(
                H, jax.lax.dynamic_slice(H, (o1, o2), (6, 6)) + B, (o1, o2))
            H = upd(H, oi, oi, Hii)
            H = upd(H, oj, oj, Hjj)
            H = upd(H, oi, oj, Hij)
            H = upd(H, oj, oi, Hij.T)
            gupd = lambda g, o, b: jax.lax.dynamic_update_slice(
                g, jax.lax.dynamic_slice(g, (o,), (6,)) + b, (o,))
            g = gupd(g, oi, on * (Ji.T @ r))
            g = gupd(g, oj, on * (Jj.T @ r))
            return H, g

        H, g = jax.lax.fori_loop(1, F, chain, (H, g))

        # right anchor: pin the LAST VALID node to the right keyframe pose
        # (identity-measurement between-factor; J w.r.t. the node is the
        # first argument's Jacobian)
        last = jnp.maximum(jnp.sum(mask.astype(jnp.int32)) - 1, 0)
        rr2, Jl2, _ = _between_block(
            t[last], q[last], t_right, q_right,
            jnp.zeros(3, dtype), jnp.array([1.0, 0, 0, 0], dtype), w)
        ol = last * 6
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (ol, ol), (6, 6)) + Jl2.T @ Jl2, (ol, ol))
        g = jax.lax.dynamic_update_slice(
            g, jax.lax.dynamic_slice(g, (ol,), (6,)) + Jl2.T @ rr2, (ol,))

        # freeze invalid nodes
        freeze = jnp.repeat(jnp.where(mask, 0.0, 1e12).astype(dtype), 6)
        H = H + jnp.diag(freeze)
        delta = solve_normal(H, -g, damping)
        d = delta.reshape(F, 6)
        t = t + d[:, :3]
        q = quat_normalize(quat_mul(q, exp_so3(d[:, 3:6])))
        return (t, q)

    t, q = jax.lax.fori_loop(0, n_iters, gn_iter, (t_init, q_init))
    return DensifiedInterval(t=t, q=q, mask=mask)
