"""IMU preintegration factor — residual + tangent-space Jacobians.

Replaces the reference's hand-derived analytic Ceres factor
(``LiLi-OM/include/factors/ImuFactor.h``: SizedCostFunction<15, 3,4,9, 3,4,9>).
The residual math is identical (Preintegration::evaluate, whitened by the
covariance sqrt-information); the Jacobians come from ``jax.jacfwd`` through
the exact retraction instead of transcribed formulas — for a 15×30 block XLA
generates the same handful of fused ops, and correctness is structural rather
than transcription-dependent. (The reference's quaternion-parameterization
Jacobian chain, ImuFactor.h:44-141, is exactly what autodiff of
``q ⊗ Exp(δθ)`` produces.)

Keyframe state tangent ordering (15): [δt, δθ, δv, δba, δbg] — matching the
preintegration state order (Preintegration.h:14-20).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.preintegration import ImuNoise, Preint, residual as preint_residual, sqrt_info
from ..utils.math import exp_so3, quat_mul, quat_normalize


class KeyframeState:
    """Not a class used at runtime — documents the per-keyframe state layout
    used across the backend: t(3), q(4), v(3), ba(3), bg(3); tangent dim 15."""


def retract_state(t, q, v, ba, bg, delta):
    """Apply a 15-dof tangent to a keyframe state."""
    return (
        t + delta[0:3],
        quat_normalize(quat_mul(q, exp_so3(delta[3:6]))),
        v + delta[6:9],
        ba + delta[9:12],
        bg + delta[12:15],
    )


def imu_factor(p: Preint, noise: ImuNoise,
               ti, qi, vi, bai, bgi,
               tj, qj, vj, baj, bgj,
               W=None):
    """Whitened residual (15,) + Jacobians (15,15)×2 w.r.t. the tangents of
    keyframes i and j. Matches ImuFactor::Evaluate (ImuFactor.h:30-141) up to
    an orthogonal whitening factor (objective-identical).

    ``W``: optionally precomputed :func:`sqrt_info` — it depends only on the
    preintegrated covariance, so callers iterating GN should hoist it out of
    the loop (a 15×15 Cholesky + triangular solve per call otherwise).
    """
    if W is None:
        W = sqrt_info(p)

    def res(di, dj):
        si = retract_state(ti, qi, vi, bai, bgi, di)
        sj = retract_state(tj, qj, vj, baj, bgj, dj)
        return W @ preint_residual(p, noise, *si, *sj)

    z = jnp.zeros(15, dtype=p.dp.dtype)
    r = res(z, z)
    Ji = jax.jacfwd(res, argnums=0)(z, z)
    Jj = jax.jacfwd(res, argnums=1)(z, z)
    return r, Ji, Jj


# Batched over a window of consecutive intervals.
imu_factor_batch = jax.vmap(imu_factor, in_axes=(0, None) + (0,) * 10)


def imu_factor_analytic(p: Preint, noise: ImuNoise,
                        ti, qi, vi, bai, bgi,
                        tj, qj, vj, baj, bgj,
                        W=None):
    """Hand-derived Jacobians (the reference's ImuFactor.h:44-141 forms,
    re-expressed for the right-retraction tangent). Produces a much smaller
    traced graph than the jacfwd version — used in the fusion hot loop;
    equality with autodiff is asserted by tests/test_imu_factor.py.

    First-order approximations shared with the reference: the quaternion
    normalize in the residual is treated as identity (exact at unit
    quaternions), and bias corrections enter through the preintegration
    Jacobian blocks.
    """
    from ..ops.preintegration import (
        O_BA,
        O_BG,
        O_P,
        O_R,
        O_V,
        bias_corrected_deltas,
        residual as preint_residual,
    )
    from ..utils.math import (
        hat,
        quat_conj,
        quat_left_matrix,
        quat_right_matrix,
        quat_to_rotmat,
    )

    if W is None:
        W = sqrt_info(p)
    dtype = p.dp.dtype
    g = noise.g_vec(dtype)
    dt = p.sum_dt
    r = preint_residual(p, noise, ti, qi, vi, bai, bgi, tj, qj, vj, baj, bgj)

    Ri_T = quat_to_rotmat(quat_conj(qi))
    alpha = -0.5 * g * dt * dt + tj - ti - vi * dt
    beta = -g * dt + vj - vi
    dp, dq_corr, dv = bias_corrected_deltas(p, bai, bgi)
    q_ij = quat_mul(quat_conj(qi), qj)
    J_p_ba = p.jacobian[O_P:O_P + 3, O_BA:O_BA + 3]
    J_p_bg = p.jacobian[O_P:O_P + 3, O_BG:O_BG + 3]
    J_v_ba = p.jacobian[O_V:O_V + 3, O_BA:O_BA + 3]
    J_v_bg = p.jacobian[O_V:O_V + 3, O_BG:O_BG + 3]
    J_q_bg = p.jacobian[O_R:O_R + 3, O_BG:O_BG + 3]

    Z = jnp.zeros((3, 3), dtype)
    I3 = jnp.eye(3, dtype=dtype)

    # rotation-residual blocks (vec parts of quaternion product matrices)
    Lbr = lambda q: quat_left_matrix(q)[1:, 1:]
    Rbr = lambda q: quat_right_matrix(q)[1:, 1:]
    dq_inv = quat_conj(dq_corr)
    Jq_ti = -(quat_left_matrix(dq_inv) @ quat_right_matrix(q_ij))[1:, 1:]
    Jq_tj = Lbr(quat_mul(dq_inv, q_ij))
    Jq_bg = -Rbr(quat_mul(dq_inv, q_ij)) @ J_q_bg

    def rows(*blocks):
        return jnp.concatenate([jnp.concatenate(b, axis=1) for b in blocks], axis=0)

    Ji = rows(
        (-Ri_T, hat(Ri_T @ alpha), -Ri_T * dt, -J_p_ba, -J_p_bg),
        (Z, Jq_ti, Z, Z, Jq_bg),
        (Z, hat(Ri_T @ beta), -Ri_T, -J_v_ba, -J_v_bg),
        (Z, Z, Z, -I3, Z),
        (Z, Z, Z, Z, -I3),
    )
    Jj = rows(
        (Ri_T, Z, Z, Z, Z),
        (Z, Jq_tj, Z, Z, Z),
        (Z, Z, Ri_T, Z, Z),
        (Z, Z, Z, I3, Z),
        (Z, Z, Z, Z, I3),
    )
    return W @ r, W @ Ji, W @ Jj
