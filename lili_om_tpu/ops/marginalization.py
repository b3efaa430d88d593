"""Schur-complement marginalization as a single XLA program.

Re-design of the VINS-style machinery in
``LiLi-OM/src/MarginalizationFactor.cpp``: the reference evaluates every
factor, builds the Gauss-Newton system H = ΣJᵀJ, g = ΣJᵀr with a 4-pthread
fan-in (:151-174), Schur-complements the marginalized block using an
eigendecomposition pseudo-inverse (:176-190), and factorizes the reduced
system into a linear "prior factor" via sqrt eigenvalues (:192-201).

Here the batched factor evaluation happens upstream (one vmapped program per
factor family feeding dense (H, g) via MXU matmuls — see solver/gn.py), and
this module performs the reduction:

    H = [[Amm, Amr],  g = [gm,     A = Arr − Arm·Amm⁺·Amr
         [Arm, Arr]]       gr]     b = gr  − Arm·Amm⁺·gm
    A = S·Λ·Sᵀ  →  J = √Λ⁺·Sᵀ,  r₀ = (√Λ⁺)⁻¹·Sᵀ·b

so that ‖r₀ + J·δx‖² reproduces the marginal cost ½·δxᵀA δx + bᵀδx up to a
constant. Eigenvalues below ``eps`` are truncated exactly like the
reference (:181-201, eps=1e-8).
"""
from __future__ import annotations

import jax.numpy as jnp


def _eig_pinv_apply(M: jnp.ndarray, X: jnp.ndarray, eps: float):
    """M⁺·X via symmetric eigendecomposition with eigenvalue threshold."""
    M = 0.5 * (M + M.T)
    lam, V = jnp.linalg.eigh(M)
    inv = jnp.where(lam > eps, 1.0 / jnp.where(lam > eps, lam, 1.0), 0.0)
    return V @ (inv[:, None] * (V.T @ X))


def schur_marginalize(H: jnp.ndarray, g: jnp.ndarray, m: int, eps: float = 1e-8):
    """Marginalize the LEADING ``m`` tangent dims of (H, g).

    Args:
      H: (D, D) Gauss-Newton Hessian ΣJᵀJ (robust weights pre-applied).
      g: (D,) gradient ΣJᵀr (note the + sign, as in the reference).
      m: static count of leading dims to drop.

    Returns:
      (J (D−m, D−m), r0 (D−m,)) — the linearized prior pair such that the
      prior residual at tangent dx is ``r0 + J·dx``.
    """
    Amm = H[:m, :m]
    Amr = H[:m, m:]
    Arm = H[m:, :m]
    Arr = H[m:, m:]
    gm = g[:m]
    gr = g[m:]

    Amm_inv_Amr = _eig_pinv_apply(Amm, Amr, eps)
    Amm_inv_gm = _eig_pinv_apply(Amm, gm[:, None], eps)[:, 0]
    A = Arr - Arm @ Amm_inv_Amr
    b = gr - Arm @ Amm_inv_gm

    A = 0.5 * (A + A.T)
    lam, V = jnp.linalg.eigh(A)
    ok = lam > eps
    s = jnp.sqrt(jnp.where(ok, lam, 1.0))
    sqrt_lam = jnp.where(ok, s, 0.0)
    inv_sqrt_lam = jnp.where(ok, 1.0 / s, 0.0)
    J = sqrt_lam[:, None] * V.T
    r0 = inv_sqrt_lam * (V.T @ b)
    return J, r0
