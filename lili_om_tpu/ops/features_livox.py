"""Livox-Horizon feature extraction (eigenvalue patch method) as fixed-shape
tensor ops — the TPU-native re-design of ``LiLi-OM/src/Preprocessing.cpp``.

Pipeline (reference mapping):

* range-image binning: points carry ``line`` 0..5 and a time ratio; column
  = ``round(ratio·(H−1))`` with depth gate 2–200 m and reflectivity gate
  ``0.05 < curv < 25.45`` (:259-267);
* per 6-col × 6-row patch (stride 6, i = 5 … H−13): scatter-matrix
  eigendecomposition over the ≥25 valid points (:270-298);
* **edges**: per-line 9-tap depth-gradient ``g1 = (Σ±4 − 8·d)/(8·d+1e-3)``,
  per-line max if > 0.06 (:302-331); accept the patch's candidate set if its
  scatter has λ₂ > edge_thres·λ₁ and > 3 lines contributed (:353-365);
  direction stored per point;
* **planes**: patch is planar if λ₀ < surf_thres·λ₁ → all (non-edge) valid
  patch points become surf features carrying the plane normal (:367-382).

All quirks kept: empty neighbor cells contribute depth 0 to the gradient
kernel; edge points are excluded from the surf set of the same patch (the
``curvature *= −1`` marking, :360,380); scatter matrices are unnormalized.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .fitting import eig3_symmetric


class LivoxFeatureConfig(NamedTuple):
    n_lines: int = 6  # N_SCANS
    # H_SCANS. MUST roughly match the sensor's points-per-line-per-sweep
    # (Livox Horizon: 24k pts / 0.1 s / 6 lines = 4000, the reference's
    # hardcode, Preprocessing.cpp:239): the eigen-patch classifier needs
    # ≥25 valid cells per 6×6 patch, so binning a sparser stream into this
    # width (< ~70 % column fill) silently starves extraction to zero
    # features. Reduced-density sims must reduce n_cols to match.
    n_cols: int = 4000
    surf_thres: float = 0.28  # config_fr_iosb.yaml
    edge_thres: float = 4.0
    min_depth: float = 2.0  # dep² gates 4..40000 (:260)
    max_depth: float = 200.0
    min_curv: float = 0.05  # reflectivity gates (:260)
    max_curv: float = 25.45
    grad_thres: float = 0.06  # edge kernel gate (:321)
    patch: int = 6
    col_start: int = 5  # i = 5 … H−13 step 6 (:270)
    col_margin: int = 12


class LivoxFeatures(NamedTuple):
    surf_pts: jnp.ndarray  # (P·36, 3)
    surf_normal: jnp.ndarray  # (P·36, 3) patch plane normal (λ₀ eigenvector)
    surf_curv: jnp.ndarray  # (P·36,) reflectivity channel
    surf_mask: jnp.ndarray  # (P·36,)
    edge_pts: jnp.ndarray  # (P·L, 3)
    edge_dir: jnp.ndarray  # (P·L, 3) line direction (λ₂ eigenvector)
    edge_mask: jnp.ndarray  # (P·L,)
    full_pts: jnp.ndarray  # (N, 3) cutted cloud (pass-through of input)
    full_mask: jnp.ndarray  # (N,)
    # per-point relative sweep times, recovered from the image column (the
    # column IS the time bin: col = round(ratio·(H−1)), bin_livox_image).
    # Used by the ``if_to_deskew`` republish (LidarOdometry.cpp:624-632,
    # which reads the time back out of ``intensity``).
    surf_rel_time: jnp.ndarray | None = None  # (P·L·S,)
    edge_rel_time: jnp.ndarray | None = None  # (P·L,)


def bin_livox_image(pts: jnp.ndarray, line: jnp.ndarray, ratio: jnp.ndarray,
                    curv: jnp.ndarray, valid: jnp.ndarray, cfg: LivoxFeatureConfig):
    """Scatter a (N,·) Livox point stream into the (L, H) range image with
    the reference's gates (:259-267). Cell collisions: the reference keeps
    the first writer; we keep an arbitrary one (collisions are rare since
    columns encode time)."""
    L, H = cfg.n_lines, cfg.n_cols
    dep2 = jnp.sum(pts * pts, axis=-1)
    ok = (
        valid
        & (line >= 0) & (line < L)
        & (dep2 > cfg.min_depth**2) & (dep2 < cfg.max_depth**2)
        & (curv > cfg.min_curv) & (curv < cfg.max_curv)
    )
    col = jnp.round(ratio * (H - 1)).astype(jnp.int32)
    ok = ok & (col >= 0) & (col < H)
    li = jnp.where(ok, line, 0).astype(jnp.int32)
    ci = jnp.where(ok, col, 0)
    img = jnp.zeros((L, H, 3), pts.dtype).at[li, ci].set(
        jnp.where(ok[:, None], pts, 0.0), mode="drop")
    img_curv = jnp.zeros((L, H), pts.dtype).at[li, ci].set(
        jnp.where(ok, curv, 0.0), mode="drop")
    img_valid = jnp.zeros((L, H), bool).at[li, ci].max(ok, mode="drop")
    return img, img_curv, img_valid


def _depth_gradient(depth: jnp.ndarray, cfg: LivoxFeatureConfig):
    """g1 image: 9-tap second difference along columns (:305-311), empty
    cells contributing 0 exactly as ``getDepth`` of an empty point does."""
    acc = -8.0 * depth
    for s in range(-4, 5):
        if s == 0:
            continue
        acc = acc + jnp.roll(depth, -s, axis=1)
    # no-wrap: zero the 4 border columns' out-of-range pulls — matches the
    # reference reading mat[k][i+j±4] only for i≥5, j≤H−13 (gates below)
    return acc / (8.0 * depth + 1e-3)


@partial(jax.jit, static_argnames=("cfg",))
def extract_features_livox(img: jnp.ndarray, img_curv: jnp.ndarray, img_valid: jnp.ndarray,
                           cfg: LivoxFeatureConfig = LivoxFeatureConfig()) -> LivoxFeatures:
    """Feature extraction over a binned (L,H) image (see bin_livox_image)."""
    L, H = cfg.n_lines, cfg.n_cols
    S = cfg.patch
    i0 = cfg.col_start
    n_patches = len(range(i0, H - cfg.col_margin, S))
    dtype = img.dtype

    depth = jnp.where(img_valid, jnp.linalg.norm(img, axis=-1), 0.0)
    g1 = _depth_gradient(depth, cfg)

    # (L, P, S, ·) patch views
    span = n_patches * S
    ppts = img[:, i0:i0 + span].reshape(L, n_patches, S, 3)
    pval = img_valid[:, i0:i0 + span].reshape(L, n_patches, S)
    pcurv = img_curv[:, i0:i0 + span].reshape(L, n_patches, S)
    pg1 = g1[:, i0:i0 + span].reshape(L, n_patches, S)

    # --- patch scatter matrix over all L·S cells (:277-298) ---
    w = pval.astype(dtype)  # (L,P,S)
    num = jnp.sum(w, axis=(0, 2))  # (P,)
    ctr = jnp.sum(ppts * w[..., None], axis=(0, 2)) / jnp.maximum(num, 1.0)[:, None]
    d0 = (ppts - ctr[None, :, None, :]) * w[..., None]
    cov = jnp.einsum("lpsi,lpsj->pij", d0, d0)  # unnormalized, like the reference
    evals, evecs = eig3_symmetric(cov)  # ascending, closed form
    patch_has_pts = num >= 25  # (:286)

    # --- edge candidates: per line, max g1 > thres (:302-331) ---
    g1m = jnp.where(pval, pg1, -jnp.inf)  # invalid cells can't win
    best_j = jnp.argmax(g1m, axis=-1)  # (L,P)
    best_g = jnp.take_along_axis(g1m, best_j[..., None], axis=-1)[..., 0]
    line_has = jnp.isfinite(best_g) & (best_g > cfg.grad_thres)
    cand_pts = jnp.take_along_axis(ppts, best_j[..., None, None], axis=2)[:, :, 0, :]  # (L,P,3)
    cand_curv = jnp.take_along_axis(pcurv, best_j[..., None], axis=2)[..., 0]

    wl = line_has.astype(dtype)  # (L,P)
    n_lines_hit = jnp.sum(wl, axis=0)  # (P,)
    ectr = jnp.sum(cand_pts * wl[..., None], axis=0) / jnp.maximum(n_lines_hit, 1.0)[:, None]
    ed = (cand_pts - ectr[None]) * wl[..., None]
    ecov = jnp.einsum("lpi,lpj->pij", ed, ed)
    eevals, eevecs = eig3_symmetric(ecov)
    edge_patch_ok = (eevals[:, 2] > cfg.edge_thres * eevals[:, 1]) & (n_lines_hit > 3)  # (:353)
    edge_dir = eevecs[:, :, 2]  # (P,3)

    edge_mask = line_has & edge_patch_ok[None, :] & patch_has_pts[None, :]  # (L,P)

    # --- surf patches: λ₀ < surf_thres·λ₁, excluding edge-marked cells (:367-382) ---
    surf_patch_ok = (evals[:, 0] < cfg.surf_thres * evals[:, 1]) & patch_has_pts
    surf_normal = evecs[:, :, 0]  # (P,3)
    # edge-cell exclusion within the same patch (curvature*=−1 marking :360)
    edge_cell = jnp.zeros(pval.shape, bool)
    li = jnp.arange(L)[:, None]
    pi = jnp.arange(n_patches)[None, :]
    edge_cell = edge_cell.at[li, pi, best_j].set(edge_mask)
    surf_mask = pval & surf_patch_ok[None, :, None] & ~edge_cell  # (L,P,S)

    surf_pts = ppts.transpose(1, 0, 2, 3).reshape(-1, 3)  # (P·L·S, 3)
    surf_nrm = jnp.broadcast_to(surf_normal[:, None, None, :], (n_patches, L, S, 3)).reshape(-1, 3)
    surf_cv = pcurv.transpose(1, 0, 2).reshape(-1)
    surf_m = surf_mask.transpose(1, 0, 2).reshape(-1)

    edge_out_pts = cand_pts.transpose(1, 0, 2).reshape(-1, 3)  # (P·L, 3)
    edge_out_dir = jnp.broadcast_to(edge_dir[:, None, :], (n_patches, L, 3)).reshape(-1, 3)
    edge_out_mask = edge_mask.T.reshape(-1)
    del cand_curv

    # relative times from column positions: cell (l,p,s) sits at column
    # i0 + p·S + s → ratio = col/(H−1) (inverse of bin_livox_image's binning)
    cols_ps = (i0 + jnp.arange(n_patches, dtype=dtype)[:, None] * S
               + jnp.arange(S, dtype=dtype)[None, :]) / (H - 1)  # (P,S)
    surf_rel = jnp.broadcast_to(cols_ps[:, None, :],
                                (n_patches, L, S)).reshape(-1)
    edge_rel = ((i0 + pi * S + best_j.astype(jnp.int32)).astype(dtype)
                / (H - 1)).T.reshape(-1)  # (P·L,)

    return LivoxFeatures(
        surf_pts=surf_pts, surf_normal=surf_nrm, surf_curv=surf_cv, surf_mask=surf_m,
        edge_pts=edge_out_pts, edge_dir=edge_out_dir, edge_mask=edge_out_mask,
        full_pts=img.reshape(-1, 3), full_mask=img_valid.reshape(-1),
        surf_rel_time=surf_rel, edge_rel_time=edge_rel,
    )
