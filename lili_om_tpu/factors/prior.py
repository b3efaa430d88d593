"""Prior factors: the marginalization (Schur-complement) prior and the
speed-bias prior used after loop closures.

* :func:`marginal_prior_residual` — evaluates the linearized prior
  ``r = r₀ + J·(x ⊟ x₀)`` kept from the last marginalization
  (MarginalizationFactor::Evaluate, LiLi-OM/src/MarginalizationFactor.cpp:233-287),
  with the quaternion box-minus ``2·vec(q₀⁻¹ ⊗ q)`` including the sign fix.
* :func:`speed_bias_prior` — 9-dof prior pinning v/ba/bg
  (SpeedBiasPriorFactorAutoDiff, LiLi-OM/include/factors/PriorFactor.h:13-25,
  weight 15 uniform; the ROT variant weights (8,8,1,...), PriorFactor.h ROT:40).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.math import quat_conj, quat_mul


class MarginalPrior(NamedTuple):
    """Linearized prior over the tangent stack of the remaining window states.

    Produced by ``ops/marginalization.py``; consumed by the sliding-window
    solver. Dimensions are static: D = 15·(window−1) retained dofs.
    """

    J: jnp.ndarray  # (D, D) linearized sqrt-information Jacobian
    r0: jnp.ndarray  # (D,) linearized residual at the linearization point
    # linearization points, stacked per retained keyframe:
    t0: jnp.ndarray  # (K, 3)
    q0: jnp.ndarray  # (K, 4)
    v0: jnp.ndarray  # (K, 3)
    ba0: jnp.ndarray  # (K, 3)
    bg0: jnp.ndarray  # (K, 3)
    valid: jnp.ndarray  # () bool — false until the first marginalization


def box_minus(t, q, v, ba, bg, t0, q0, v0, ba0, bg0):
    """Per-keyframe 15-dof tangent x ⊟ x₀ with the reference's quaternion
    convention ``2·vec(q₀⁻¹ ⊗ q)`` and w<0 sign flip
    (MarginalizationFactor.cpp:258-264). Batched over leading dims."""
    dq = quat_mul(quat_conj(q0), q)
    sign = jnp.where(dq[..., :1] >= 0.0, 1.0, -1.0)
    dth = 2.0 * sign * dq[..., 1:]
    return jnp.concatenate([t - t0, dth, v - v0, ba - ba0, bg - bg0], axis=-1)


def marginal_prior_residual(prior: MarginalPrior, t, q, v, ba, bg):
    """r = r₀ + J·dx over the stacked retained keyframes (K,·) → ((D,), (D,D)).

    Returns (residual, jacobian) — the Jacobian w.r.t. the current tangent is
    J itself (the prior is linear); rows are zeroed while ``prior.valid`` is
    false (before the first marginalization, matching `marg=false` phases).
    """
    dx = box_minus(t, q, v, ba, bg, prior.t0, prior.q0, prior.v0, prior.ba0, prior.bg0)
    dx = dx.reshape(-1)
    r = prior.r0 + prior.J @ dx
    on = prior.valid.astype(r.dtype)
    return r * on, prior.J * on


def speed_bias_prior(v, ba, bg, v0, ba0, bg0, weights=None):
    """9-dof residual + (constant identity-scaled) Jacobian.

    ``weights``: per-component (9,) weight vector; defaults to the Livox
    variant's uniform 15 (PriorFactor.h:13-25).
    """
    if weights is None:
        weights = jnp.full((9,), 15.0, dtype=v.dtype)
    r = weights * jnp.concatenate([v - v0, ba - ba0, bg - bg0])
    J = jnp.diag(weights)
    return r, J


ROT_SPEED_BIAS_WEIGHTS = jnp.array([8.0, 8.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0])
"""ROT-variant component weights (LiLi-OM-ROT PriorFactor.h: vx,vy weight 8)."""


def identity_prior(window_k: int, dtype=jnp.float32) -> MarginalPrior:
    """An inert prior placeholder (valid=False) for pipeline start-up."""
    D = 15 * window_k
    return MarginalPrior(
        J=jnp.zeros((D, D), dtype),
        r0=jnp.zeros((D,), dtype),
        t0=jnp.zeros((window_k, 3), dtype),
        q0=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype), (window_k, 1)),
        v0=jnp.zeros((window_k, 3), dtype),
        ba0=jnp.zeros((window_k, 3), dtype),
        bg0=jnp.zeros((window_k, 3), dtype),
        valid=jnp.zeros((), bool),
    )
