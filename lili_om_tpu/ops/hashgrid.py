"""Voxel-hash-grid kNN — the large-map association path (SURVEY.md §7:
"voxel-hash grid kNN with a fixed candidate budget per query, masked").

The brute-force MXU path (ops/knn.py) is O(Q·P): at P ≈ 32k it takes a few
ms on one chip, but a production-scale global map (10⁶+ points) would cost
hundreds of ms. This grid makes the cost O(Q·27·B), independent of P:

* build: points hash into C buckets by voxel cell (open hashing — colliding
  *cells* share a bucket, which only adds far-away candidates that lose the
  distance race; bucket overflow drops points, bounded by ``bucket_cap``);
* query: each query gathers the 27 neighbor-cell buckets and runs the same
  k-min-extraction merge as the dense path.

Exactness: every true neighbor within ``cell_size`` of the query is found
(the 3×3×3 neighborhood covers that radius), matching the reference's
kd-tree + 1 m NN gates (kd_max_radius, BackendFusion.cpp:1543/1616) as long
as ``cell_size ≥ gate``. Beyond the gate the result may be approximate —
exactly the regime the gates discard anyway.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

_P1, _P2, _P3 = 73856093, 19349669, 83492791  # classic spatial-hash primes


class VoxelHashGrid(NamedTuple):
    bucket_pts: jnp.ndarray  # (C, B, 3)
    bucket_mask: jnp.ndarray  # (C, B)
    bucket_idx: jnp.ndarray  # (C, B) int32 original point indices
    cell_size: jnp.ndarray  # ()


def _hash_cells(cells: jnp.ndarray, n_buckets: int) -> jnp.ndarray:
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return jnp.abs(h) % n_buckets


@partial(jax.jit, static_argnames=("n_buckets", "bucket_cap"))
def build_grid(pts: jnp.ndarray, mask: jnp.ndarray, cell_size: float,
               n_buckets: int = 65536, bucket_cap: int = 8) -> VoxelHashGrid:
    """Scatter points into hash buckets (one sort + rank computation)."""
    N = pts.shape[0]
    cells = jnp.floor(pts / cell_size).astype(jnp.int32)
    h = _hash_cells(cells, n_buckets).astype(jnp.int32)
    h = jnp.where(mask, h, n_buckets)  # invalid → overflow bucket
    order = jnp.argsort(h)
    h_s = h[order]
    arange = jnp.arange(N, dtype=jnp.int32)
    starts = jnp.concatenate([jnp.ones((1,), bool), h_s[1:] != h_s[:-1]])
    seg_start = jax.lax.cummax(jnp.where(starts, arange, 0))
    rank = arange - seg_start
    ok = (h_s < n_buckets) & (rank < bucket_cap)
    b = jnp.where(ok, h_s, n_buckets)  # drop → scratch bucket via mode=drop
    r = jnp.where(ok, rank, 0)
    pts_s = pts[order]
    bucket_pts = jnp.zeros((n_buckets, bucket_cap, 3), pts.dtype).at[b, r].set(
        jnp.where(ok[:, None], pts_s, 0.0), mode="drop")
    bucket_mask = jnp.zeros((n_buckets, bucket_cap), bool).at[b, r].max(ok, mode="drop")
    bucket_idx = jnp.zeros((n_buckets, bucket_cap), jnp.int32).at[b, r].set(
        jnp.where(ok, order.astype(jnp.int32), 0), mode="drop")
    return VoxelHashGrid(bucket_pts, bucket_mask, bucket_idx,
                         jnp.asarray(cell_size, pts.dtype))


@partial(jax.jit, static_argnames=("k",))
def hashgrid_knn(queries: jnp.ndarray, grid: VoxelHashGrid, k: int = 5):
    """kNN among the 27-cell neighborhood candidates of each query.

    Returns (d² (Q,k) ascending, idx (Q,k)) — same contract as ops.knn.knn;
    queries with < k candidates pad with +inf / idx 0.
    """
    Q = queries.shape[0]
    C = grid.bucket_pts.shape[0]
    cells_q = jnp.floor(queries / grid.cell_size).astype(jnp.int32)

    best_d = jnp.full((Q, k), jnp.inf, queries.dtype)
    best_i = jnp.zeros((Q, k), jnp.int32)

    def merge(best_d, best_i, cand_d, cand_i):
        cat_d = jnp.concatenate([best_d, cand_d], axis=1)
        cat_i = jnp.concatenate([best_i, cand_i], axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 1)
        out_d, out_i = [], []
        for _ in range(k):
            j = jnp.argmin(cat_d, axis=1)
            out_d.append(jnp.min(cat_d, axis=1))
            out_i.append(jnp.take_along_axis(cat_i, j[:, None], axis=1)[:, 0])
            cat_d = jnp.where(cols == j[:, None], jnp.inf, cat_d)
        return jnp.stack(out_d, axis=1), jnp.stack(out_i, axis=1).astype(jnp.int32)

    # static unroll over the 27 neighbor offsets
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off = jnp.array([dx, dy, dz], jnp.int32)
                hb = _hash_cells(cells_q + off, C)
                cand = grid.bucket_pts[hb]  # (Q, B, 3)
                cmask = grid.bucket_mask[hb]
                cidx = grid.bucket_idx[hb]
                d = jnp.sum((queries[:, None, :] - cand) ** 2, axis=-1)
                d = jnp.where(cmask, d, jnp.inf)
                best_d, best_i = merge(best_d, best_i, d, cidx)

    return best_d, best_i
