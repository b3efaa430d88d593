"""Batched geometric fits over fixed-size neighbor sets: plane fits (QR-style
``A·n = −1`` and weighted), line fits via 3×3 eigendecomposition.

These replace the per-correspondence Eigen solves inside the reference's
matching loops (LiLi-OM/src/LidarOdometry.cpp:352-413,
BackendFusion.cpp:1531-1681) with single vmapped XLA programs over all
queries at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PlaneFit(NamedTuple):
    normal: jnp.ndarray  # (...,3) unit
    d: jnp.ndarray  # (...,) plane offset: n·x + d = 0
    valid: jnp.ndarray  # (...,) all points within dist_thres of the plane


def fit_plane(neighbors: jnp.ndarray, mask: jnp.ndarray, dist_thres: float = 0.2,
              weights: jnp.ndarray | None = None) -> PlaneFit:
    """Fit n·x = −1 by (weighted) least squares over the k neighbors.

    Mirrors the reference's 5-NN plane fit (LidarOdometry.cpp:362-377; the
    reflectivity-weighted variant BackendFusion.cpp:1601-1681 passes
    ``weights``). Solved via 3×3 normal equations instead of QR — equivalent
    solution, far better batching.

    Args:
      neighbors: (..., k, 3); mask: (..., k) validity.
      dist_thres: per-point plane-distance validity gate.
      weights: optional (..., k) nonnegative weights.
    """
    w = mask.astype(neighbors.dtype)
    if weights is not None:
        w = w * weights
    A = neighbors * w[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", A, neighbors)
    Atb = -jnp.sum(A, axis=-2)
    eye = jnp.eye(3, dtype=neighbors.dtype)
    n_raw = jnp.linalg.solve(AtA + 1e-9 * eye, Atb[..., None])[..., 0]
    norm = jnp.linalg.norm(n_raw, axis=-1, keepdims=True)
    norm = jnp.maximum(norm, 1e-12)
    normal = n_raw / norm
    d = 1.0 / norm[..., 0]
    # validity: every masked-in neighbor lies within dist_thres of the plane
    pd = jnp.abs(jnp.einsum("...ki,...i->...k", neighbors, normal) + d[..., None])
    ok = jnp.all(jnp.where(mask, pd <= dist_thres, True), axis=-1)
    ok = ok & (jnp.sum(mask, axis=-1) >= 3)
    return PlaneFit(normal=normal, d=d, valid=ok)


class LineFit(NamedTuple):
    direction: jnp.ndarray  # (...,3) unit principal direction
    centroid: jnp.ndarray  # (...,3)
    valid: jnp.ndarray  # (...,) λ_max > ratio_thres·λ_mid


def fit_line(neighbors: jnp.ndarray, mask: jnp.ndarray, ratio_thres: float = 3.0) -> LineFit:
    """Principal-direction line fit with eigenvalue gate λ₂ > 3·λ₁
    (BackendFusion.cpp:1531-1599 corner correspondence)."""
    w = mask.astype(neighbors.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(neighbors * w[..., None], axis=-2, keepdims=True) / cnt[..., None]
    ctr = (neighbors - mean) * w[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", ctr, ctr) / cnt[..., None]
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    direction = evecs[..., :, 2]
    valid = (evals[..., 2] > ratio_thres * evals[..., 1]) & (jnp.sum(mask, axis=-1) >= 3)
    return LineFit(direction=direction, centroid=mean[..., 0, :], valid=valid)


def eig3_symmetric(cov: jnp.ndarray):
    """Batched symmetric 3×3 eigendecomposition (ascending eigenvalues).

    Thin wrapper for the Livox eigen-patch feature test
    (LiLi-OM/src/Preprocessing.cpp:287-298). XLA lowers small-batch `eigh`
    well; kept as a seam for a closed-form Pallas kernel later.
    """
    return jnp.linalg.eigh(cov)
