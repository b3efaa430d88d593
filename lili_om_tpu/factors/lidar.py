"""LiDAR scan-to-map factors: residuals + analytic tangent-space Jacobians,
batched over all correspondences at once.

TPU-native re-design of the reference's Ceres factors
(``LiLi-OM/include/factors/LidarKeyframeFactor.h``):

* ``LidarPlaneNormIncreFactor`` (:111-139) → :func:`plane_residual` without
  extrinsic (frontend odometry).
* ``LidarPlaneNormFactor`` (:65-108) → :func:`plane_residual` with the
  body←lidar extrinsic applied (backend).
* ``LidarEdgeFactor`` (:12-62) → :func:`edge_residual`. The reference factor
  stores the extrinsic but does not apply it (:37-43, a documented quirk);
  we replicate that by defaulting the extrinsic to identity for edges.

Pose tangent convention: right perturbation ``q ⊞ δθ = q ⊗ Exp(δθ)``,
``t ⊞ δt = t + δt`` (see utils.math). For a world point
``y = q·(q_lb⁻¹·(p − t_lb)) + t``:

  ∂y/∂δt = I
  ∂y/∂δθ = −R(q)·hat(q_lb⁻¹·(p − t_lb))

Robust losses are applied as IRLS weights (sqrt of the Triggs correction),
matching Ceres' corrector to first order.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..utils.math import hat, quat_conj, quat_rotate, quat_to_rotmat


def huber_weight(r2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS sqrt-weight for the Huber loss with parameter ``delta``
    (frontend uses delta=0.1: LidarOdometry.cpp:508)."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-24))
    return jnp.where(r <= delta, 1.0, jnp.sqrt(delta / r))


def cauchy_weight(r2: jnp.ndarray, c: float) -> jnp.ndarray:
    """IRLS sqrt-weight for the Cauchy loss ``c²·log(1+r²/c²)``
    (backend uses c=1.0: BackendFusion.cpp:938-974)."""
    return 1.0 / jnp.sqrt(1.0 + r2 / (c * c))


def body_points(pts: jnp.ndarray, t_lb: Optional[jnp.ndarray], q_lb: Optional[jnp.ndarray]):
    """Lidar-frame points → body (IMU) frame via the L→B extrinsic
    ``p_b = q_lb⁻¹ (p − t_lb)`` (LidarKeyframeFactor.h:92-96)."""
    if q_lb is None:
        return pts
    return quat_rotate(quat_conj(q_lb)[None, :], pts - t_lb[None, :])


class PlaneFactorBatch(NamedTuple):
    """Fixed-capacity batch of point-to-plane correspondences, all tied to
    one (or per-entry indexed) pose."""

    pts: jnp.ndarray  # (N,3) feature points (body frame if extrinsic pre-applied)
    normals: jnp.ndarray  # (N,3) world-frame plane unit normals
    offsets: jnp.ndarray  # (N,) plane d: n·x + d = 0
    scores: jnp.ndarray  # (N,) per-correspondence weight s
    mask: jnp.ndarray  # (N,) validity


def plane_residual(t: jnp.ndarray, q: jnp.ndarray, batch: PlaneFactorBatch):
    """Residuals + Jacobians of all plane factors at pose (t, q).

    r_i = s_i · (n_i · (q·p_i + t) + d_i)           (LidarKeyframeFactor.h:121-126)

    Returns (r (N,), J (N,6)) with J columns [∂/∂δt, ∂/∂δθ]; invalid rows 0.
    """
    R = quat_to_rotmat(q)
    pw = (R @ batch.pts.T).T + t
    r = batch.scores * (jnp.sum(batch.normals * pw, axis=-1) + batch.offsets)
    Jt = batch.scores[:, None] * batch.normals  # (N,3)
    # ∂(q·p)/∂δθ = −R·hat(p):  nᵀ(−R·hat(p)) row per point
    Rp = jnp.einsum("ab,nbc->nac", R, hat(batch.pts))  # R @ hat(p_i)
    Jth = -jnp.einsum("ni,nij->nj", Jt, Rp)
    m = batch.mask
    r = jnp.where(m, r, 0.0)
    J = jnp.where(m[:, None], jnp.concatenate([Jt, Jth], axis=-1), 0.0)
    return r, J


class EdgeFactorBatch(NamedTuple):
    """Point-to-line correspondences: the two virtual points a, b sit at
    centroid ± 0.1·direction (BackendFusion.cpp:1583-1597)."""

    pts: jnp.ndarray  # (N,3)
    point_a: jnp.ndarray  # (N,3) world
    point_b: jnp.ndarray  # (N,3) world
    scores: jnp.ndarray  # (N,)
    mask: jnp.ndarray  # (N,)


def edge_residual(t: jnp.ndarray, q: jnp.ndarray, batch: EdgeFactorBatch):
    """Scalar point-to-line distance residuals + Jacobians.

    The reference's ``LidarEdgeFactor`` (:12-62) returns the 3-vector
    ``(y−a)×(y−b)/‖a−b‖`` scaled by s; we use its norm (the actual distance)
    as a scalar residual — same minimizer, one residual row instead of three.

    Returns (r (N,), J (N,6)).
    """
    R = quat_to_rotmat(q)
    y = (R @ batch.pts.T).T + t
    ab = batch.point_a - batch.point_b
    ab_n = jnp.linalg.norm(ab, axis=-1, keepdims=True)
    u = ab / jnp.maximum(ab_n, 1e-9)  # line direction
    ya = y - batch.point_a
    c = jnp.cross(ya, u)  # distance vector magnitude = point-line distance
    dist = jnp.linalg.norm(c, axis=-1)
    r = batch.scores * dist
    # ∂dist/∂y = (y − a − ((y−a)·u)u) / dist  (projection residual direction)
    perp = ya - jnp.sum(ya * u, axis=-1, keepdims=True) * u
    g = perp / jnp.maximum(dist, 1e-9)[:, None]  # (N,3) = ∂dist/∂y
    Jt = batch.scores[:, None] * g
    Rp = jnp.einsum("ab,nbc->nac", R, hat(batch.pts))
    Jth = -jnp.einsum("ni,nij->nj", Jt, Rp)
    m = batch.mask
    r = jnp.where(m, r, 0.0)
    J = jnp.where(m[:, None], jnp.concatenate([Jt, Jth], axis=-1), 0.0)
    return r, J


def relative_pose_residual(t1, q1, t2, q2, dt, dq, weight: float = 1.0):
    """6-dof relative-pose residual (LidarPoseFactor.h:8-43):

    r = w·[ q₁⁻¹(p₂−p₁) − δp ; 2·vec(δq⁻¹ ⊗ q₁⁻¹ ⊗ q₂) ]

    (translation first, to match our tangent order). Returns r (6,).
    Jacobians are taken by autodiff at the call site (small problems).
    """
    from ..utils.math import quat_mul, quat_normalize

    qi = quat_conj(q1)
    r_t = quat_rotate(qi, t2 - t1) - dt
    r_q = 2.0 * quat_normalize(quat_mul(quat_conj(dq), quat_mul(qi, q2)))[1:]
    return weight * jnp.concatenate([r_t, r_q])
