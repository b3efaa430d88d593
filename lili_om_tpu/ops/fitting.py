"""Batched geometric fits over fixed-size neighbor sets: plane fits (QR-style
``A·n = −1`` and weighted), line fits via 3×3 eigendecomposition.

These replace the per-correspondence Eigen solves inside the reference's
matching loops (LiLi-OM/src/LidarOdometry.cpp:352-413,
BackendFusion.cpp:1531-1681) with single vmapped XLA programs over all
queries at once.
"""
from __future__ import annotations

from typing import NamedTuple

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
    n_raw = solve3(AtA, Atb, damping=1e-9)
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
    evals, evecs = eig3_symmetric(cov)  # ascending, closed form
    direction = evecs[..., :, 2]
    valid = (evals[..., 2] > ratio_thres * evals[..., 1]) & (jnp.sum(mask, axis=-1) >= 3)
    return LineFit(direction=direction, centroid=mean[..., 0, :], valid=valid)


def solve3(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Batched 3×3 linear solve by Cramer's rule (adjugate) — pure
    elementwise math, no LAPACK-style loop, ideal for the VPU. Replaces
    ``jnp.linalg.solve`` in the per-correspondence plane fits."""
    if damping:
        A = A + damping * jnp.eye(3, dtype=A.dtype)
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    adjT = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return jnp.einsum("...ij,...j->...i", adjT, b) / det[..., None]


def eig3_symmetric(A: jnp.ndarray):
    """Batched closed-form symmetric 3×3 eigendecomposition, ascending.

    Replaces LAPACK-lowered ``jnp.linalg.eigh`` in the hot paths (line fits,
    Livox eigen patches — LiLi-OM/src/Preprocessing.cpp:287-298,
    BackendFusion.cpp:1568): eigenvalues via the trigonometric (Cardano)
    formula, eigenvectors via cross products of rows of (A − λI), picking
    the best-conditioned pair. All elementwise → VPU-friendly and exactly
    shape-polymorphic over batches.
    """
    dtype = A.dtype
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    # r = det(B)/2 with B = (A − qI)/p
    detB = (d0 * (d1 * d2 - a12 * a12)
            - a01 * (a01 * d2 - a12 * a02)
            + a02 * (a01 * a12 - d1 * a02)) / (p * p * p)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam2 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam2 - lam0
    # near-isotropic guard: p2 ≈ 0 → all eigenvalues = q
    iso = p2 < 1e-24
    lam0 = jnp.where(iso, q, lam0)
    lam1 = jnp.where(iso, q, lam1)
    lam2 = jnp.where(iso, q, lam2)
    evals = jnp.stack([lam0, lam1, lam2], axis=-1)

    def eigvec(lam, fallback_axis):
        # rows of (A − λI)
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        best = jnp.where(n01 >= jnp.maximum(n02, n12), c01,
                         jnp.where(n02 >= n12, c02, c12))
        nrm = jnp.sqrt(jnp.maximum(jnp.sum(best * best, axis=-1, keepdims=True), 1e-30))
        v = best / nrm
        # isotropic fallback: any orthonormal basis works — use distinct axes
        # per eigenvector so the basis stays orthonormal
        return jnp.where(iso[..., None],
                         jnp.zeros_like(v).at[..., fallback_axis].set(1.0), v)

    v0 = eigvec(lam0, 0)
    v2 = eigvec(lam2, 2)
    # enforce orthogonality: v1 = v2 × v0 (exact for distinct eigenvalues;
    # well-defined under near-degeneracy too)
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    v0 = v0 / jnp.sqrt(jnp.maximum(jnp.sum(v0 * v0, axis=-1, keepdims=True), 1e-30))
    v1 = jnp.cross(v2, v0)
    evecs = jnp.stack([v0, v1, v2], axis=-1)  # columns, like eigh
    return evals, evecs
