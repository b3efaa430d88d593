"""k-nearest-neighbor map association — the TPU-native replacement for the
reference's PCL kd-trees (LiLi-OM/src/LidarOdometry.cpp:360,490;
BackendFusion.cpp:839-840,1541,1611).

Design: *exact* kNN by tiled brute force. The (Q×P) squared-distance matrix
is an MXU matmul (‖q−p‖² = ‖q‖² + ‖p‖² − 2 q·pᵀ); a `lax.scan` over P-tiles
keeps memory at O(Q·T) and merges a running top-k per query. For the map
sizes LiLi-OM works with (10⁴–10⁵ downsampled map points, ~10³–10⁴ queries)
this is far below speed-of-light FLOPs on a TPU chip and — unlike the
kd-tree — exact, branch-free, batchable, and differentiable-adjacent.

All shapes static; invalid entries are masked with +inf distances.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

INF = jnp.inf


def _pad_to(x: jnp.ndarray, n: int, axis: int = 0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _merge_topk_sort(cat_d, cat_i, k):
    """Merge via lax.top_k (sort-based lowering on TPU)."""
    neg_top, arg = jax.lax.top_k(-cat_d, k)
    return -neg_top, jnp.take_along_axis(cat_i, arg, axis=1)


def _merge_topk_extract(cat_d, cat_i, k):
    """Merge via k iterative min-extractions — k·(reduce + compare-select)
    VPU passes instead of a sort. Uses a broadcast compare against the
    argmin column (scatter-free; scatters are slow on TPU)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 1)
    ds = []
    is_ = []
    for _ in range(k):
        j = jnp.argmin(cat_d, axis=1)
        ds.append(jnp.min(cat_d, axis=1))
        is_.append(jnp.take_along_axis(cat_i, j[:, None], axis=1)[:, 0])
        cat_d = jnp.where(cols == j[:, None], INF, cat_d)
    return jnp.stack(ds, axis=1), jnp.stack(is_, axis=1)


@partial(jax.jit, static_argnames=("k", "tile_p", "merge"))
def knn(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    k: int = 5,
    q_mask: Optional[jnp.ndarray] = None,
    p_mask: Optional[jnp.ndarray] = None,
    tile_p: int = 8192,
    merge: str = "extract",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact k-NN of each query among the (masked) points.

    Args:
      queries: (Q,3). points: (P,3).
      q_mask: (Q,) — invalid queries still produce outputs but are garbage.
      p_mask: (P,) — invalid points never match.
      tile_p: P-tile size for the scanned distance computation.

    Returns:
      (dists² (Q,k), idx (Q,k)) — sorted ascending; masked/insufficient
      neighbors have dist=+inf and idx=0.
    """
    Q = queries.shape[0]
    P = points.shape[0]
    dtype = queries.dtype
    if p_mask is None:
        p_mask = jnp.ones((P,), bool)

    # Re-center by the valid-map centroid: ‖q−p‖² is shift-invariant, but
    # its matmul expansion ‖q‖²+‖p‖²−2q·p cancels catastrophically — the
    # error is ~ε·‖q‖·‖p‖ against a signal of ~1 m², so far-from-origin
    # operation (any long trajectory) corrupts the metric gates. Centering
    # bounds ‖·‖ by the local-map extent instead of the absolute position.
    c = (jnp.sum(jnp.where(p_mask[:, None], points, 0.0), axis=0)
         / jnp.maximum(jnp.sum(p_mask.astype(dtype)), 1.0))
    queries = queries - c
    points = points - c

    P_pad = ((P + tile_p - 1) // tile_p) * tile_p
    pts = _pad_to(points, P_pad)
    pm = _pad_to(p_mask, P_pad, value=False)
    n_tiles = P_pad // tile_p

    pts_t = pts.reshape(n_tiles, tile_p, 3)
    pm_t = pm.reshape(n_tiles, tile_p)
    q_norm = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (Q,1)

    def tile_step(carry, inp):
        best_d, best_i = carry  # (Q,k), (Q,k)
        tile_pts, tile_mask, tile_idx0 = inp
        # ‖q−p‖² via MXU matmul. precision=HIGHEST: the TPU default runs
        # f32 matmuls in reduced-precision passes (~2⁻¹² relative), which
        # the cancellation above amplifies to meters² — measured indices
        # right but distances off by ~2 m² at ±40 m coordinates.
        cross = jnp.matmul(queries, tile_pts.T,
                           precision=jax.lax.Precision.HIGHEST)  # (Q,T)
        p_norm = jnp.sum(tile_pts * tile_pts, axis=-1)[None, :]  # (1,T)
        d = q_norm + p_norm - 2.0 * cross
        d = jnp.where(tile_mask[None, :], d, INF)
        # merge with running top-k
        cat_d = jnp.concatenate([best_d, d], axis=1)
        idx_tile = tile_idx0 + jax.lax.broadcasted_iota(jnp.int32, (Q, tile_pts.shape[0]), 1)
        cat_i = jnp.concatenate([best_i, idx_tile], axis=1)
        merge_fn = _merge_topk_extract if merge == "extract" else _merge_topk_sort
        new_d, new_i = merge_fn(cat_d, cat_i, k)
        return (new_d, new_i), None

    # derive the carry init from `queries` AND `points` so it inherits any
    # varying manual axes under shard_map from either input (constants would
    # fail the vma check in the scan)
    vary0 = queries[:, :1] * 0.0 + pts[:1, :1] * 0.0
    init = (
        jnp.broadcast_to(vary0, (Q, k)) + INF,
        jnp.broadcast_to(vary0.astype(jnp.int32), (Q, k)),
    )
    tile_idx0 = (jnp.arange(n_tiles) * tile_p).astype(jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(tile_step, init, (pts_t, pm_t, tile_idx0))
    best_d = jnp.maximum(best_d, 0.0)  # clamp matmul round-off
    best_i = jnp.where(jnp.isfinite(best_d), best_i, 0)
    return best_d, best_i


def gather_neighbors(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(P,3), (Q,k) → (Q,k,3)."""
    return points[idx]


# LILI_OM_PALLAS_KNN: "auto" (default) = fused Pallas kernel whenever the
# call is a TOP-LEVEL dispatch on TPU (the split-dispatch paths); "1" =
# also inside traced programs; "0" = never.
_PALLAS_KNN = os.environ.get("LILI_OM_PALLAS_KNN", "auto")
# LILI_OM_KNN_PRUNED=1: the Morton-sorted bound-pruned kernel
# (knn_pallas_pruned) instead of the dense one. Exact (identical distances;
# index ties may resolve differently). Opt-in, not default: measured on the
# parity bench's room-world geometry it wins only ~5-15 % (bounding boxes of
# 256-query blocks overlap most 2048-point tile boxes, so ~2/3 of tiles
# survive the cull, and the Morton pre-sorts offset the savings); open-sky
# outdoor maps with larger spatial separation should prune far better.
_KNN_PRUNED = os.environ.get("LILI_OM_KNN_PRUNED", "0") == "1"
# LILI_OM_KNN_COUNTED: "1" (default) = the count-bounded kernel
# (knn_pallas_counted) whenever a mask is available — work scales with the
# VALID data (tail tiles past the last valid map row and empty query blocks
# are skipped; bit-identical results). "0" = always the dense kernel.
_KNN_COUNTED = os.environ.get("LILI_OM_KNN_COUNTED", "1") != "0"
# resident-map VMEM budget of the counted kernel; beyond this fall back to
# the tiled dense kernel (the hash-grid path owns truly huge maps anyway)
_COUNTED_MAX_P = 65536


def _dispatch_pallas(queries, points, k, p_mask, q_mask):
    """Pick the Pallas kernel variant (called only on the TPU top-level
    dispatch path)."""
    if _KNN_PRUNED:
        from .knn_pallas import knn_pallas_pruned

        return knn_pallas_pruned(queries, points, k=k, p_mask=p_mask)
    if (_KNN_COUNTED and points.shape[0] <= _COUNTED_MAX_P
            and (p_mask is not None or q_mask is not None)):
        from .knn_pallas import knn_pallas_counted

        return knn_pallas_counted(queries, points, k=k, p_mask=p_mask,
                                  q_mask=q_mask)
    from .knn_pallas import knn_pallas

    return knn_pallas(queries, points, k=k, p_mask=p_mask)


def knn_auto(queries, points, k: int = 5, p_mask=None, q_mask=None):
    """Backend-dispatching kNN. The fused Pallas kernel (ops/knn_pallas.py)
    is ~2× the XLA path (4.0 vs 8.2 ms for 4096×32768, 6.0 vs 11.4 for
    6144×32768 on one v5e), but embedding tpu_custom_call inside the large
    jitted pipeline programs blows XLA:TPU compile times from ~30 s to many
    minutes under the current toolchain. Default policy: Pallas on TPU when
    dispatched at top level (``queries`` is a concrete array — the
    split-dispatch production paths), tiled-XLA min-extraction when traced
    inside a larger program. Override via LILI_OM_PALLAS_KNN=0/1.

    ``q_mask`` (optional) marks valid queries; it does not change any valid
    query's result, but lets the count-bounded kernel skip all-invalid
    query blocks (invalid rows then return (+inf, 0) instead of garbage)."""
    if _PALLAS_KNN != "0" and queries.dtype == jnp.float32:
        top_level = not isinstance(queries, jax.core.Tracer)
        if (top_level or _PALLAS_KNN == "1") and jax.default_backend() == "tpu":
            return _dispatch_pallas(queries, points, k, p_mask, q_mask)
    return knn(queries, points, k=k, p_mask=p_mask)


# --- fused-launch variants for the split-dispatch paths ------------------
# Each host-chained dispatch costs enqueue latency through the remote
# runtime (~0.3-0.5 ms effective). These helpers fold trivially small
# neighbors of the kNN into ITS launch — still small programs (the
# compile-time hazard is embedding tpu_custom_call in the LARGE pipeline
# programs, not in dedicated ones).


@partial(jax.jit, static_argnames=("k",))
def _world_knn_pallas(t, q, scan_q, points, p_mask, q_mask, k: int):
    from ..utils.math import quat_rotate

    pw = quat_rotate(q[None, :], scan_q) + t[None, :]
    d2, idx = _dispatch_pallas(pw, points, k, p_mask, q_mask)
    return pw, d2, idx


def world_knn_auto(t, q, scan_q, points, k: int = 5, p_mask=None,
                   q_mask=None):
    """``pw = R(q)·scan_q + t`` fused into the kNN launch (one dispatch
    instead of world-transform + kNN). Returns (pw, d², idx) with the
    ``knn_auto`` backend policy."""
    if _PALLAS_KNN != "0" and scan_q.dtype == jnp.float32 \
            and not isinstance(scan_q, jax.core.Tracer) \
            and jax.default_backend() == "tpu":
        return _world_knn_pallas(t, q, scan_q, points, p_mask, q_mask, k)
    from ..utils.math import quat_rotate

    pw = quat_rotate(q[None, :], scan_q) + t[None, :]
    d2, idx = knn(pw, points, k=k, p_mask=p_mask)
    return pw, d2, idx


@partial(jax.jit, static_argnames=("k",))
def _knn_pair_pallas(q1, p1, m1, qm1, q2, p2, m2, qm2, k: int):
    return (_dispatch_pallas(q1, p1, k, m1, qm1)
            + _dispatch_pallas(q2, p2, k, m2, qm2))


def knn_pair_auto(q1, p1, m1, q2, p2, m2, k: int = 5, qm1=None, qm2=None):
    """Two independent kNN searches in ONE launch (the fusion surf+edge
    pair). Returns (d²₁, idx₁, d²₂, idx₂) with the ``knn_auto`` policy."""
    if _PALLAS_KNN != "0" and q1.dtype == jnp.float32 \
            and not isinstance(q1, jax.core.Tracer) \
            and jax.default_backend() == "tpu":
        return _knn_pair_pallas(q1, p1, m1, qm1, q2, p2, m2, qm2, k)
    return (knn(q1, p1, k=k, p_mask=m1) + knn(q2, p2, k=k, p_mask=m2))
