"""Dense batched Gauss-Newton / Levenberg-Marquardt building blocks — the
TPU-native replacement for Ceres (LiLi-OM/src/LidarOdometry.cpp:506-537,
BackendFusion.cpp:984-992).

Philosophy: the reference hands Ceres a bag of residual blocks and lets it
assemble sparse normal equations on the CPU. On TPU we instead *batch*: all
residuals of a kind are evaluated in one vmapped program, their (r, J) rows
feed one ``JᵀJ`` matmul on the MXU, and the resulting small dense system
(6 dof frontend, 15·W dof backend window) is solved by Cholesky on-chip.
Robust losses enter as IRLS sqrt-weights applied to rows (the first-order
Triggs corrector, matching Ceres' behavior at convergence).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def block_hessian(J: jnp.ndarray, r: jnp.ndarray, w: jnp.ndarray | None = None):
    """Accumulate (H, b) = (JᵀJ, −Jᵀr) over N residual rows.

    Args:
      J: (N, D) Jacobian rows (invalid rows must already be zeroed).
      r: (N,) residuals.
      w: optional (N,) extra sqrt-weights (robust/IRLS) applied to rows.

    Returns (H (D,D), b (D,)). One MXU matmul; this is the TPU equivalent of
    the reference's 4-pthread Hessian fan-in (MarginalizationFactor.cpp:151-174).
    """
    if w is not None:
        J = J * w[:, None]
        r = r * w
    H = J.T @ J
    b = -(J.T @ r)
    return H, b


def solve_normal(H: jnp.ndarray, b: jnp.ndarray, damping: jnp.ndarray | float = 0.0):
    """Solve (H + λ·diag-damped) δ = b via Cholesky; falls back to a
    pseudo-inverse-free λ bump by clamping the diagonal positive."""
    D = H.shape[-1]
    lam = jnp.asarray(damping, H.dtype)
    Hd = H + lam * jnp.eye(D, dtype=H.dtype)
    L = jnp.linalg.cholesky(Hd)
    # guard: if H is singular the cholesky has NaNs → return zero step
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    delta = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    bad = ~jnp.all(jnp.isfinite(delta))
    return jnp.where(bad, jnp.zeros_like(delta), delta)


def solve_normal_lm(H: jnp.ndarray, b: jnp.ndarray, lam_rel):
    """Marquardt-scaled damped solve: (H + λ·diag(H)) δ = b.

    Scale-aware damping (Ceres' LM form): λ multiplies each diagonal entry
    instead of adding an absolute λ·I, so one λ works across blocks whose
    curvatures differ by orders of magnitude (position vs bias rows).
    Same NaN guard as :func:`solve_normal`."""
    d = jnp.clip(jnp.diagonal(H), 1e-12, None)
    Hd = H + jnp.asarray(lam_rel, H.dtype) * jnp.diag(d)
    L = jnp.linalg.cholesky(Hd)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    delta = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    bad = ~jnp.all(jnp.isfinite(delta))
    return jnp.where(bad, jnp.zeros_like(delta), delta)


def gn_update(J: jnp.ndarray, r: jnp.ndarray, damping: float = 1e-6,
              w: jnp.ndarray | None = None) -> jnp.ndarray:
    """One Gauss-Newton step δ = (JᵀJ)⁻¹·(−Jᵀr) from batched rows."""
    H, b = block_hessian(J, r, w)
    return solve_normal(H, b, damping)


def scatter_block(H: jnp.ndarray, b: jnp.ndarray, Hij: jnp.ndarray, bi: jnp.ndarray,
                  i: int, j: int, bs: int):
    """Add a (bs×bs) block into the (i,j) slot of a big dense H (static idx)."""
    H = H.at[i * bs:(i + 1) * bs, j * bs:(j + 1) * bs].add(Hij)
    if b is not None and bi is not None:
        b = b.at[i * bs:(i + 1) * bs].add(bi)
    return H, b
