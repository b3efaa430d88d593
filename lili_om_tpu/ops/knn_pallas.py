"""Fused kNN Pallas kernel: distance computation + running top-k merge in
VMEM, so the (Q×P) distance matrix never touches HBM.

The XLA-only path (ops/knn.py) materializes each (Q, tile) distance block in
HBM and re-reads it for every min-extraction pass (~1.3 GB of traffic for
4096×32768, ≈6 ms on one v5e chip). This kernel streams the map through
VMEM once per query block: HBM traffic drops to a few MB and the k·O(QB·TB)
min-extraction runs entirely on-chip (measured ~2-3× the XLA path).

Structure: a 2-D grid (query blocks × map tiles) with the running top-k in
VMEM scratch that persists across the map-tile dimension — the canonical
Mosaic accumulation pattern. Every block slice is STATIC (computed from
program ids by the BlockSpec index maps), which lets Mosaic double-buffer
the map tiles and software-pipeline the per-tile work (the earlier
formulation — one grid step per query block, `fori_loop` + `pl.ds` dynamic
slices over a whole-map VMEM block — serialized those loads).

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


# index-packing: the low _IDX_BITS mantissa bits of each f32 distance are
# replaced by the tile-local lane index. Non-negative IEEE floats order
# identically to their int32 bit patterns, so ONE integer min-reduction per
# extraction pass yields value AND index together (the unpacked variant
# needed min + argmin + a broadcast-compare select — ~2× the VPU passes).
# Cost: distances are truncated to 2⁻¹² relative (≪ every downstream gate;
# the 5-NN selection can swap neighbors whose distances agree to 0.02 %,
# the same class as f32 tie noise).
# NOTE: all constants below stay PYTHON ints — a jnp.int32(...) scalar
# created at trace time becomes a captured jaxpr const, which pallas_call
# rejects ("captures constants"); weak python scalars fold into the ops.
_IDX_BITS = 12
_IDX_MASK = (1 << _IDX_BITS) - 1
_INT_INF = 0x7F800000  # +inf bits (index field clear)
_INT_MAX = 0x7FFFFFFF


def _extract_k_packed(packed, k):
    """k single-reduction min-extraction passes. packed: (QB, L) int32 with
    unique low-bit tags per lane (so the suppress compare hits one lane)."""
    best = []
    for _ in range(k):
        m = jnp.min(packed, axis=1, keepdims=True)  # (QB,1)
        best.append(m[:, 0])
        packed = jnp.where(packed == m, _INT_MAX, packed)
    return jnp.stack(best, axis=1)  # (QB,k)


def _knn_kernel(q_ref, ptsT_ref, maskinf_ref, out_d_ref, out_i_ref,
                acc_db_ref, acc_i_ref, *, k, tile_p):
    """Grid step (i, j): query block i vs map tile j.

    q_ref: (QB, 3); ptsT_ref: (3, TB); maskinf_ref: (1, TB) additive +inf
    mask. acc_*_ref: (QB, k) VMEM scratch carrying the running top-k across
    the j (map tile) grid dimension.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_db_ref[:] = jnp.full(acc_db_ref.shape, _INT_INF, jnp.int32)
        acc_i_ref[:] = jnp.zeros(acc_i_ref.shape, jnp.int32)

    q = q_ref[:]  # (QB, 3)
    ptsT = ptsT_ref[:]  # (3, TB)
    minf = maskinf_ref[0, :]  # (TB,)
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)  # (QB,1)
    clear = ~_IDX_MASK  # python int: -4096, folds into the bitwise ops

    # precision=HIGHEST: the TPU-default reduced-precision matmul
    # (~2⁻¹² rel) is amplified to meters² by the ‖q‖²+‖p‖²−2q·p
    # cancellation (see ops/knn.py) — full f32 passes cost ~µs here
    cross = jax.lax.dot_general(
        q, ptsT, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (QB, TB)
    p_norm = jnp.sum(ptsT * ptsT, axis=0)  # (TB,)
    d = q_norm + (p_norm + minf)[None, :] - 2.0 * cross
    db = jax.lax.bitcast_convert_type(d, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    tp = _extract_k_packed((db & clear) | lane, k)  # (QB,k)
    td = tp & clear
    ti = (tp & _IDX_MASK) + j * tile_p

    # merge with the carry: re-tag the 2k candidates by position
    best_db = acc_db_ref[:]
    best_i = acc_i_ref[:]
    cat_d = jnp.concatenate([best_db, td], axis=1)  # (QB,2k)
    cat_i = jnp.concatenate([best_i, ti], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 1)
    mp = _extract_k_packed(cat_d | pos, k)  # (QB,k)
    # decode each winner's position tag back to its global index
    # (k small 2-D passes — Mosaic-friendly, no 3-D intermediates)
    cols = []
    for jj in range(k):
        sel = (mp[:, jj:jj + 1] & _IDX_MASK) == pos  # (QB,2k)
        cols.append(jnp.sum(jnp.where(sel, cat_i, 0), axis=1,
                            dtype=jnp.int32))
    acc_db_ref[:] = mp & clear
    acc_i_ref[:] = jnp.stack(cols, axis=1)

    @pl.when(j == nj - 1)
    def _finish():
        QB = q_ref.shape[0]
        out_d_ref[:, :k] = jax.lax.bitcast_convert_type(
            acc_db_ref[:], jnp.float32)
        out_d_ref[:, k:] = jnp.zeros((QB, _LANE - k), jnp.float32)
        out_i_ref[:, :k] = acc_i_ref[:]
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
    if tile_p > 1 << _IDX_BITS:
        raise ValueError(f"tile_p {tile_p} exceeds the {_IDX_BITS}-bit "
                         "index-packing budget (max 4096)")
    Q, P = queries.shape[0], points.shape[0]
    queries = queries.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if p_mask is None:
        p_mask = jnp.ones((P,), bool)
    # re-center by the valid-map centroid — bounds the ‖q‖²+‖p‖²−2q·p
    # cancellation error by the map extent, not the absolute position
    # (see ops/knn.py)
    c = (jnp.sum(jnp.where(p_mask[:, None], points, 0.0), axis=0)
         / jnp.maximum(jnp.sum(p_mask.astype(jnp.float32)), 1.0))
    queries = queries - c
    points = points - c

    Qp = -(-Q // q_block) * q_block
    Pp = -(-P // tile_p) * tile_p
    qpad = jnp.zeros((Qp, 3), jnp.float32).at[:Q].set(queries)
    ptsT = jnp.zeros((3, Pp), jnp.float32).at[:, :P].set(points.T)
    maskinf = jnp.full((1, Pp), jnp.inf, jnp.float32).at[0, :P].set(
        jnp.where(p_mask, 0.0, jnp.inf))

    grid = (Qp // q_block, Pp // tile_p)
    out_d, out_i = pl.pallas_call(
        partial(_knn_kernel, k=k, tile_p=tile_p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile_p), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, _LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, _LANE), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_block, k), jnp.int32),
            pltpu.VMEM((q_block, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qpad, ptsT, maskinf)

    d = jnp.maximum(out_d[:Q, :k], 0.0)
    # contract (ops/knn.py:76): insufficient-neighbor slots return idx=0.
    # Masked/padded lanes carry d=+inf out of the kernel (the additive mask
    # keeps the tag-cleared +inf bit pattern through every merge), so this
    # one select also scrubs any masked-point lane index a +inf slot picked
    # up inside a tile's extraction pass.
    i = jnp.where(jnp.isfinite(d), out_i[:Q, :k], 0)
    return d, i


# ---------------------------------------------------------------------------
# Count-bounded variant: skip the padding, keep the result bit-identical
# ---------------------------------------------------------------------------
#
# Every launch in the production pipeline runs at its STATIC capacity
# (odometry map 32768, fusion surf map 32768, fusion edge map 8192 — the
# fixed-shape contract), but the VALID fraction is often small: measured on
# the parity bench, the odometry map holds ~4k valid points (12 %), the
# fusion edge map ~340 (4 %), and whole 256-query blocks of the flattened
# (window × cap) query layout are empty. The dense kernel pays k+2 VPU
# passes over all of it.
#
# This variant bounds the work by the DATA, not the capacity:
#
# * the map stays VMEM-resident (a 32k transposed map is ~0.5 MB) and an
#   in-kernel ``fori_loop`` walks only ``ceil(last_valid/tile_p)`` tiles —
#   a traced bound, so the launch shape never changes;
# * a per-query-block any-valid bitmap (scalar-prefetched) zeroes the trip
#   count of empty blocks — they cost one scalar read and output +inf/0.
#
# BIT-EXACTNESS vs knn_pallas: tiles are visited in the same ascending
# order with the same merge, so retained candidates are identical. A
# skipped tail tile is all-masked: its packed candidates are
# ``_INT_INF | lane`` ≥ every accumulator entry (the accumulator's empty
# slots are ``_INT_INF`` with a clear tag and win ties by position), so
# merging it is a no-op — skipping is lossless. Empty query blocks leave
# the accumulator at init (+inf ⇒ d=+inf, idx=0 after the contract scrub),
# which is exactly what the dense kernel returns for all-masked queries of
# an empty map and strictly more defined than the "garbage for invalid
# queries" contract (ops/knn.py:71).


def _knn_kernel_counted(qb_any_ref, n_tiles_ref, q_ref, ptsT_ref,
                        maskinf_ref, out_d_ref, out_i_ref, *, k, tile_p):
    """Grid step i: query block i vs the first n_tiles map tiles (resident
    map, dynamic trip count; see the section comment)."""
    i = pl.program_id(0)
    QB = q_ref.shape[0]
    q = q_ref[:]  # (QB, 3)
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)
    clear = ~_IDX_MASK

    def work(t, acc):
        acc_db, acc_i = acc
        start = t * tile_p
        ptsT = ptsT_ref[:, pl.ds(start, tile_p)]  # (3, TB) from VMEM
        minf = maskinf_ref[0, pl.ds(start, tile_p)]
        cross = jax.lax.dot_general(
            q, ptsT, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        p_norm = jnp.sum(ptsT * ptsT, axis=0)
        d = q_norm + (p_norm + minf)[None, :] - 2.0 * cross
        db = jax.lax.bitcast_convert_type(d, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        tp = _extract_k_packed((db & clear) | lane, k)
        td = tp & clear
        ti = (tp & _IDX_MASK) + start

        cat_d = jnp.concatenate([acc_db, td], axis=1)  # (QB, 2k)
        cat_i = jnp.concatenate([acc_i, ti], axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 1)
        mp = _extract_k_packed(cat_d | pos, k)
        cols = []
        for jj in range(k):
            sel = (mp[:, jj:jj + 1] & _IDX_MASK) == pos
            cols.append(jnp.sum(jnp.where(sel, cat_i, 0), axis=1,
                                dtype=jnp.int32))
        return mp & clear, jnp.stack(cols, axis=1)

    # empty query block ⇒ trip count 0 ⇒ accumulator stays at init
    n = n_tiles_ref[0] * qb_any_ref[i]
    acc0 = (jnp.full((QB, k), _INT_INF, jnp.int32),
            jnp.zeros((QB, k), jnp.int32))
    acc_db, acc_i = jax.lax.fori_loop(0, n, work, acc0)

    out_d_ref[:, :k] = jax.lax.bitcast_convert_type(acc_db, jnp.float32)
    out_d_ref[:, k:] = jnp.zeros((QB, _LANE - k), jnp.float32)
    out_i_ref[:, :k] = acc_i
    out_i_ref[:, k:] = jnp.zeros((QB, _LANE - k), jnp.int32)


@partial(jax.jit, static_argnames=("k", "q_block", "tile_p", "interpret"))
def knn_pallas_counted(queries, points, k: int = 5, p_mask=None, q_mask=None,
                       q_block: int = 256, tile_p: int = 4096,
                       interpret: bool = False):
    """Exact kNN, work bounded by the valid data instead of the static
    capacity (see the section comment). Same contract as :func:`knn_pallas`;
    identical results for valid queries. ``q_mask`` rows that are invalid
    may return (+inf, 0) instead of garbage — strictly more defined.

    Valid map rows should be FRONT-COMPACTED for the tile bound to bite
    (all production tables are — voxel tables emit valid-first); a
    non-compacted mask only costs speed (the bound covers up to the last
    valid row), never correctness."""
    if tile_p > 1 << _IDX_BITS:
        raise ValueError(f"tile_p {tile_p} exceeds the {_IDX_BITS}-bit "
                         "index-packing budget (max 4096)")
    Q, P = queries.shape[0], points.shape[0]
    queries = queries.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if p_mask is None:
        p_mask = jnp.ones((P,), bool)
    c = (jnp.sum(jnp.where(p_mask[:, None], points, 0.0), axis=0)
         / jnp.maximum(jnp.sum(p_mask.astype(jnp.float32)), 1.0))
    queries = queries - c
    points = points - c

    Qp = -(-Q // q_block) * q_block
    Pp = -(-P // tile_p) * tile_p
    qpad = jnp.zeros((Qp, 3), jnp.float32).at[:Q].set(queries)
    ptsT = jnp.zeros((3, Pp), jnp.float32).at[:, :P].set(points.T)
    maskinf = jnp.full((1, Pp), jnp.inf, jnp.float32).at[0, :P].set(
        jnp.where(p_mask, 0.0, jnp.inf))

    # tile bound: cover up to the LAST valid map row (robust to gaps)
    last = jnp.max(jnp.where(
        p_mask, jnp.arange(1, P + 1, dtype=jnp.int32), 0))
    n_tiles = (last + tile_p - 1) // tile_p  # 0 when the map is empty
    ni = Qp // q_block
    if q_mask is None:
        qb_any = jnp.ones((ni,), jnp.int32)
    else:
        qm = jnp.zeros((Qp,), bool).at[:Q].set(q_mask)
        qb_any = qm.reshape(ni, q_block).any(axis=1).astype(jnp.int32)

    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((q_block, 3), lambda i, a, n: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pp), lambda i, a, n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i, a, n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, _LANE), lambda i, a, n: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, _LANE), lambda i, a, n: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_d, out_i = pl.pallas_call(
        partial(_knn_kernel_counted, k=k, tile_p=tile_p),
        grid_spec=spec,
        out_shape=[
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(qb_any, n_tiles.reshape(1), qpad, ptsT, maskinf)

    d = jnp.maximum(out_d[:Q, :k], 0.0)
    i = jnp.where(jnp.isfinite(d), out_i[:Q, :k], 0)
    return d, i


# ---------------------------------------------------------------------------
# Spatially-pruned variant: Morton-sorted blocks + bound-gated extraction
# ---------------------------------------------------------------------------
#
# The plain kernel pays k+2 VPU passes over EVERY (query-block × map-tile)
# distance tile — 134M lanes for 4096×32768 — although a 5-NN's true
# neighborhood is a ~1 m ball. Sorting queries and map points along a Morton
# curve makes blocks/tiles spatially compact, so a cheap interval bound
# culls almost every pair:
#
# * outside the kernel: per query-block and per map-tile axis-aligned
#   bounding boxes → lower-bound distance lb[i,j] between block i and tile
#   j (exact box-to-box gap, zero when they overlap);
# * tiles are VISITED nearest-first per block (a prefetched per-block tile
#   order drives the BlockSpec index map — the canonical scalar-prefetch
#   pattern), so the running k-th best tightens after the first tile(s);
# * each grid step compares lb against the block's worst retained packed
#   distance and skips the matmul + extraction entirely when lb ≥ worst.
#
# EXACTNESS: distances match knn_pallas bit-for-bit. The merge replaces an
# accumulator entry only when a tile's packed value is strictly below the
# accumulator's max (ties keep the accumulator — position tags order acc
# before tile in _extract_k_packed). packed(d) ≥ bits(trunc(d)) ≥
# bits(lb·(1−2⁻¹¹)) for every point in the tile (the margin covers the
# f32 expansion error of the in-kernel distance vs the exact box bound), so
# lb_bits ≥ worst ⟹ no entry would change ⟹ skipping is lossless.
# Indices can differ from the dense kernel only where two map points share a
# truncated distance (the 2⁻¹² tie class both kernels already have): the
# changed tile-visit order resolves such ties differently.


def _spread10(x):
    """Interleave a 10-bit int into every 3rd bit (Morton component)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def _morton30(pts, valid):
    """30-bit Morton key over the valid points' bounding box (int32)."""
    big = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(valid[:, None], pts, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], pts, -big), axis=0)
    scale = 1023.0 / jnp.maximum(hi - lo, 1e-6)
    cells = jnp.clip((pts - lo) * scale, 0.0, 1023.0).astype(jnp.int32)
    return ((_spread10(cells[:, 0]) << 2) | (_spread10(cells[:, 1]) << 1)
            | _spread10(cells[:, 2]))


def _block_bounds(pts, valid, block):
    """(n_blocks, 3) lo/hi over valid rows of each contiguous block."""
    n = pts.shape[0] // block
    p = pts.reshape(n, block, 3)
    v = valid.reshape(n, block, 1)
    big = jnp.float32(jnp.inf)
    lo = jnp.min(jnp.where(v, p, big), axis=1)
    hi = jnp.max(jnp.where(v, p, -big), axis=1)
    return lo, hi, v.any(axis=(1, 2))


def _knn_kernel_pruned(order_ref, lb_ref, q_ref, ptsT_ref, maskinf_ref,
                       out_d_ref, out_i_ref, *, k, tile_p, nj):
    """Grid step i: query block i vs the WHOLE map, VMEM-resident.

    The 2-D (block × tile) grid formulation pays a fixed pipeline cost per
    grid step whether or not the tile's work is skipped (measured: pruning
    ~90 % of tiles changed nothing — the floor was the 256 grid steps, not
    the extraction). A 32k map is only ~0.5 MB transposed, so it simply
    stays resident: ONE grid dimension over query blocks, the tile loop as
    an in-kernel ``fori_loop`` whose body is a real ``lax.cond`` — a
    skipped tile costs a scalar compare, not a pipeline slot. Tiles are
    visited nearest-first (prefetched per-block order indexes the resident
    map with a dynamic slice)."""
    i = pl.program_id(0)
    QB = q_ref.shape[0]
    q = q_ref[:]  # (QB, 3)
    q_norm = jnp.sum(q * q, axis=1, keepdims=True)
    clear = ~_IDX_MASK

    def work(t, acc):
        acc_db, acc_i = acc
        tile_id = order_ref[i * nj + t]
        start = tile_id * tile_p
        ptsT = ptsT_ref[:, pl.ds(start, tile_p)]  # (3, TB) from VMEM
        minf = maskinf_ref[0, pl.ds(start, tile_p)]
        cross = jax.lax.dot_general(
            q, ptsT, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        p_norm = jnp.sum(ptsT * ptsT, axis=0)
        d = q_norm + (p_norm + minf)[None, :] - 2.0 * cross
        db = jax.lax.bitcast_convert_type(d, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        tp = _extract_k_packed((db & clear) | lane, k)
        td = tp & clear
        ti = (tp & _IDX_MASK) + start

        cat_d = jnp.concatenate([acc_db, td], axis=1)  # (QB, 2k)
        cat_i = jnp.concatenate([acc_i, ti], axis=1)
        pos = jax.lax.broadcasted_iota(jnp.int32, cat_d.shape, 1)
        mp = _extract_k_packed(cat_d | pos, k)
        cols = []
        for jj in range(k):
            sel = (mp[:, jj:jj + 1] & _IDX_MASK) == pos
            cols.append(jnp.sum(jnp.where(sel, cat_i, 0), axis=1,
                                dtype=jnp.int32))
        return mp & clear, jnp.stack(cols, axis=1)

    def step(t, acc):
        # block-level cull: worst retained packed distance vs the tile's
        # precomputed lower bound; t == 0 always runs (fills the
        # accumulator), +inf-lb (empty) tiles never run
        worst = jnp.max(acc[0][:, k - 1])
        lb = lb_ref[i * nj + t]
        return jax.lax.cond((t == 0) | (lb < worst),
                            lambda a: work(t, a), lambda a: a, acc)

    acc0 = (jnp.full((QB, k), _INT_INF, jnp.int32),
            jnp.zeros((QB, k), jnp.int32))
    acc_db, acc_i = jax.lax.fori_loop(0, nj, step, acc0)

    out_d_ref[:, :k] = jax.lax.bitcast_convert_type(acc_db, jnp.float32)
    out_d_ref[:, k:] = jnp.zeros((QB, _LANE - k), jnp.float32)
    out_i_ref[:, :k] = acc_i
    out_i_ref[:, k:] = jnp.zeros((QB, _LANE - k), jnp.int32)


@partial(jax.jit, static_argnames=("k", "q_block", "tile_p", "interpret",
                                   "sorted_p", "sorted_q"))
def knn_pallas_pruned(queries, points, k: int = 5, p_mask=None,
                      q_block: int = 256, tile_p: int = 2048,
                      interpret: bool = False,
                      sorted_p: bool = False, sorted_q: bool = False):
    """Exact kNN, Morton-sorted + bound-pruned (see the section comment).
    Same contract as :func:`knn_pallas`; the extra host-side work is two
    variadic sorts (queries, map) plus O(n_blocks·n_tiles) bound algebra.

    ``sorted_p`` / ``sorted_q``: the caller guarantees the input is already
    spatially coherent (e.g. a Morton-ordered voxel table, or a scan-ordered
    sweep) — the in-call sort is skipped. Results are EXACT regardless; a
    violated promise only costs pruning efficiency (block bounding boxes
    widen), never correctness.

    ``tile_p`` defaults smaller than the dense kernel's: pruning gets finer
    (more skippable pairs) and the extra merge rounds only run for
    surviving tiles."""
    if tile_p > 1 << _IDX_BITS:
        raise ValueError(f"tile_p {tile_p} exceeds the {_IDX_BITS}-bit "
                         "index-packing budget (max 4096)")
    Q, P = queries.shape[0], points.shape[0]
    queries = queries.astype(jnp.float32)
    points = points.astype(jnp.float32)
    if p_mask is None:
        p_mask = jnp.ones((P,), bool)
    c = (jnp.sum(jnp.where(p_mask[:, None], points, 0.0), axis=0)
         / jnp.maximum(jnp.sum(p_mask.astype(jnp.float32)), 1.0))
    queries = queries - c
    points = points - c

    # ---- Morton sort (one variadic sort each; invalid map rows go last;
    # the mask rides as the key's INT_MAX sentinel, not an extra operand) --
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    if sorted_p:
        p_sorted = points
        pidx = jnp.arange(P, dtype=jnp.int32)
        minf_s = jnp.where(p_mask, 0.0, jnp.inf).astype(jnp.float32)
    else:
        pkey = jnp.where(p_mask, _morton30(points, p_mask), big)
        pk_s, px, py, pz, pidx = jax.lax.sort(
            (pkey, points[:, 0], points[:, 1], points[:, 2],
             jnp.arange(P, dtype=jnp.int32)), num_keys=1, is_stable=False)
        minf_s = jnp.where(pk_s == big, jnp.inf, 0.0).astype(jnp.float32)
        p_sorted = jnp.stack([px, py, pz], axis=1)
    if sorted_q:
        q_sorted = queries
        qpos = jnp.arange(Q, dtype=jnp.int32)
    else:
        qkey = _morton30(queries, jnp.ones((Q,), bool))
        _, qpos = jax.lax.sort((qkey, jnp.arange(Q, dtype=jnp.int32)),
                               num_keys=1, is_stable=False)
        q_sorted = queries[qpos]

    # ---- pad to block multiples (queries: repeat the last sorted row so
    # the tail block's bbox stays tight; map: masked rows) ----------------
    Qp = -(-Q // q_block) * q_block
    Pp = -(-P // tile_p) * tile_p
    if Qp != Q:
        q_sorted = jnp.concatenate(
            [q_sorted, jnp.broadcast_to(q_sorted[-1:], (Qp - Q, 3))])
    ptsT = jnp.zeros((3, Pp), jnp.float32).at[:, :P].set(p_sorted.T)
    maskinf = jnp.full((1, Pp), jnp.inf, jnp.float32).at[0, :P].set(minf_s)
    pidx_pad = jnp.zeros((Pp,), jnp.int32).at[:P].set(pidx)
    p_valid = maskinf[0] == 0.0

    # ---- block/tile bounds → lb[i,j] → per-block nearest-first order ----
    qlo, qhi, _ = _block_bounds(q_sorted, jnp.ones((Qp,), bool), q_block)
    plo, phi, p_any = _block_bounds(ptsT.T, p_valid, tile_p)
    gap = jnp.maximum(0.0, jnp.maximum(qlo[:, None] - phi[None],
                                       plo[None] - qhi[:, None]))  # (ni,nj,3)
    lb = jnp.sum(gap * gap, axis=-1)
    lb = jnp.where(p_any[None, :], lb, jnp.inf)
    order = jnp.argsort(lb, axis=1).astype(jnp.int32)  # (ni, nj)
    lb_sorted = jnp.take_along_axis(lb, order, axis=1)
    # conservative margin for the in-kernel f32 expansion error, then match
    # the kernel's low-bit truncation
    lb_bits = jax.lax.bitcast_convert_type(
        lb_sorted * (1.0 - 2.0**-11), jnp.int32) & ~_IDX_MASK

    ni, nj = Qp // q_block, Pp // tile_p
    # 1-D grid over query blocks; the transposed map + mask stay VMEM-
    # resident across the whole launch (constant index maps; ~0.5 MB at
    # 32k points) and the in-kernel fori_loop walks tiles nearest-first
    spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ni,),
        in_specs=[
            pl.BlockSpec((q_block, 3), lambda i, o, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pp), lambda i, o, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), lambda i, o, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_block, _LANE), lambda i, o, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_block, _LANE), lambda i, o, l: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_d, out_i = pl.pallas_call(
        partial(_knn_kernel_pruned, k=k, tile_p=tile_p, nj=nj),
        grid_spec=spec,
        out_shape=[
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((Qp, _LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(order.reshape(-1), lb_bits.reshape(-1), q_sorted, ptsT, maskinf)

    # ---- un-permute: rows back to query order, lanes back to map ids ----
    d_s = jnp.maximum(out_d[:Q, :k], 0.0)
    i_s = jnp.where(jnp.isfinite(d_s), pidx_pad[out_i[:Q, :k]], 0)
    d = jnp.zeros((Q, k), jnp.float32).at[qpos].set(d_s)
    i = jnp.zeros((Q, k), jnp.int32).at[qpos].set(i_s)
    return d, i
