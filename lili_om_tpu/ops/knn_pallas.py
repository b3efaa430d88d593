"""Fused kNN Pallas kernel: distance computation + running top-k merge in
VMEM, so the (Q×P) distance matrix never touches HBM.

The XLA-only path (ops/knn.py) materializes each (Q, tile) distance block in
HBM and re-reads it for every min-extraction pass (~1.3 GB of traffic for
4096×32768, ≈6 ms on one v5e chip). This kernel streams the map through
VMEM once per query block: HBM traffic drops to a few MB and the k·O(QB·TB)
min-extraction runs entirely on-chip (measured ~2-3× the XLA path).

Layout notes (Mosaic tiling): a (P, 3) VMEM block is physically padded to
(P, 128) lanes — 42× memory waste that OOMs scoped VMEM. Points and masks
are therefore stored transposed, (3, P) / (1, P), which pads only the
sublane dim (8). No gathers inside the kernel (slow on the VPU) — index
selection uses broadcast compares.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _extract_k(d, idx, k):
    """k min-extraction passes over lanes; selection via broadcast compare
    (no gathers). d, idx: (QB, L). Returns (QB, k) each."""
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    best_d = []
    best_i = []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)  # (QB,1)
        j = jnp.argmin(d, axis=1).astype(jnp.int32)  # (QB,)
        hit = cols == j[:, None]
        sel_i = jnp.sum(jnp.where(hit, idx, 0), axis=1).astype(jnp.int32)
        best_d.append(m[:, 0])
        best_i.append(sel_i)
        d = jnp.where(hit, jnp.inf, d)
    return jnp.stack(best_d, axis=1), jnp.stack(best_i, axis=1)


def _knn_kernel(q_ref, ptsT_ref, maskinf_ref, out_d_ref, out_i_ref, *, k, tile_p):
    """One query block vs the whole map (streamed in TB tiles).

    q_ref: (QB, 3); ptsT_ref: (3, P); maskinf_ref: (1, P) additive +inf mask.
    """
    q = q_ref[:]  # (QB, 3)
    QB = q.shape[0]
    P = ptsT_ref.shape[1]
    n_tiles = P // tile_p
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)  # (QB,1)

    def body(t, carry):
        best_d, best_i = carry  # (QB, k)
        ptsT = ptsT_ref[:, pl.ds(t * tile_p, tile_p)]  # (3, TB)
        minf = maskinf_ref[0, pl.ds(t * tile_p, tile_p)]  # (TB,)
        cross = jax.lax.dot_general(
            q, ptsT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (QB, TB)
        p_norm = jnp.sum(ptsT * ptsT, axis=0)  # (TB,)
        d = q_norm + (p_norm + minf)[None, :] - 2.0 * cross
        idx0 = t * tile_p + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        td, ti = _extract_k(d, idx0, k)
        cat_d = jnp.concatenate([best_d, td], axis=1)  # (QB, 2k)
        cat_i = jnp.concatenate([best_i, ti], axis=1)
        return _extract_k(cat_d, cat_i, k)

    init = (jnp.full((QB, k), jnp.inf, jnp.float32), jnp.zeros((QB, k), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    out_d_ref[:, :k] = best_d
    out_d_ref[:, k:] = jnp.zeros((QB, _LANE - k), jnp.float32)
    out_i_ref[:, :k] = best_i
    out_i_ref[:, k:] = jnp.zeros((QB, _LANE - k), jnp.int32)


@partial(jax.jit, static_argnames=("k", "q_block", "tile_p", "interpret"))
def knn_pallas(queries, points, k: int = 5, p_mask=None,
               q_block: int = 256, tile_p: int = 4096, interpret: bool = False):
    """Exact kNN with the fused Pallas kernel. Same contract as ops.knn.knn:
    returns (d² (Q,k) ascending, idx (Q,k)); masked points never match.

    VMEM budget ≈ 2·QB·TB·4 B (distance tile + iota) — q_block=256,
    tile_p=4096 stays ≈8 MB (measured 25 % faster than tile_p=2048: fewer
    top-k merge rounds per map pass). f32 only.
    """
    Q, P = queries.shape[0], points.shape[0]
    queries = queries.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if p_mask is None:
        p_mask = jnp.ones((P,), bool)

    Qp = -(-Q // q_block) * q_block
    Pp = -(-P // tile_p) * tile_p
    qpad = jnp.zeros((Qp, 3), jnp.float32).at[:Q].set(queries)
    ptsT = jnp.zeros((3, Pp), jnp.float32).at[:, :P].set(points.T)
    maskinf = jnp.full((1, Pp), jnp.inf, jnp.float32).at[0, :P].set(
        jnp.where(p_mask, 0.0, jnp.inf))

    grid = (Qp // q_block,)
    out_d, out_i = pl.pallas_call(
        partial(_knn_kernel, k=k, tile_p=tile_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.int32),
        ],
        interpret=interpret,
    )(qpad, ptsT, maskinf)

    d = jnp.maximum(out_d[:Q, :k], 0.0)
    i = jnp.where(jnp.isfinite(d), out_i[:Q, :k], 0)
    return d, i
