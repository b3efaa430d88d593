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
