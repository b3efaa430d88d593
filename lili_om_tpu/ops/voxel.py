"""Fixed-shape voxel-grid downsampling — the PCL ``VoxelGrid`` replacement
(LiLi-OM/src/LidarOdometry.cpp:155-156,315-323; BackendFusion.cpp:1486-1528).

Centroid-per-voxel, computed as one sort + segment-sum XLA program with a
static output capacity and validity mask (no dynamic shapes). Keys are
packed 3×10-bit integer cells relative to the cloud's min corner: 1024
cells per axis (409 m at a 0.4 m leaf) — ample for every *device-side*
consumer (per-scan clouds, per-keyframe clouds, the local map), whose
extent is bounded by the ±200 m sensing envelope. Whole-trajectory clouds
(global map export) can exceed it; those run through
:func:`voxel_downsample_np`, the host-side exact version with unbounded
int64 keys.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_BITS = 10  # cells per axis = 1024 → extent ≤ 1024·leaf (409 m at 0.4 m leaf)


def _scramble(key: jnp.ndarray) -> jnp.ndarray:
    """Deterministic BIJECTIVE int32 bit-mix of the voxel key ("lowbias32"
    finalizer: xorshifts and odd-constant multiplies are each invertible
    mod 2³²) — hash order is spatially uniform, used as the
    capacity-overflow drop order (see :func:`voxel_downsample`).

    Bijectivity matters: distinct keys always scramble to distinct values,
    so ONE sort by the scrambled key both keeps same-key points adjacent
    and orders the voxel segments uniformly over the extent (no second
    stable sort). The sign bit is flipped so int32 comparison order equals
    uint32 order of the mix."""
    h = key.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return (h ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def voxel_keys(pts: jnp.ndarray, leaf: float, mask: jnp.ndarray) -> jnp.ndarray:
    """int32 packed voxel key per point, relative to the cloud's min cell.

    Keys are 3×10 bits (int32-safe without x64). Cells are offset by the
    masked minimum so the packing covers the cloud's actual extent; clouds
    wider than 1024·leaf per axis clamp outliers into the border voxels
    (harmless at LiDAR ranges ≤ 200 m, SURVEY.md §6)."""
    cells = jnp.floor(pts / leaf).astype(jnp.int32)
    big = jnp.int32(2**30)
    cmin = jnp.min(jnp.where(mask[..., None], cells, big), axis=-2)
    rel = jnp.clip(cells - cmin, 0, (1 << _BITS) - 1)
    return (rel[..., 0] << (2 * _BITS)) | (rel[..., 1] << _BITS) | rel[..., 2]


@partial(jax.jit, static_argnames=("max_out",))
def voxel_downsample(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    leaf: float,
    max_out: int,
    feats: Optional[jnp.ndarray] = None,
    groups: Optional[jnp.ndarray] = None,
):
    """Downsample to ≤ ``max_out`` voxel centroids.

    Args:
      pts: (N,3). mask: (N,) validity. leaf: voxel edge (leaf>0).
      max_out: static output capacity; overflow drops voxels in hash-of-key
        order (spatially uniform decimation — see the note in the body).
      feats: optional (N,F) extra channels averaged alongside xyz.
      groups: optional (N,) int32 group ids — points in different groups
        never share a voxel (the reference's PER-RING filtering, ROT
        Preprocessing.cpp:494-508). One group-mixed hash sort, not a
        vmapped program per group (vmapped sorts inflated TPU compile
        time badly). Capacity overflow drops voxels in hash order, i.e.
        ~proportionally per group — no group is starved (group-major
        order would drop the last rings outright when the scan has more
        voxels than ``max_out``).

    Returns:
      (out (max_out,3), out_mask (max_out,)) or with feats:
      (out, out_feats (max_out,F), out_mask).
    """
    N = pts.shape[0]
    key = voxel_keys(pts, leaf, mask)
    key = jnp.where(mask, key, jnp.int32(jnp.iinfo(jnp.int32).max))
    # capacity-overflow drop order: voxels beyond ``max_out`` are dropped in
    # SCRAMBLE (hash-of-key) order, not key order — key order is spatial, so
    # key-ordered drops delete a contiguous chunk of the cloud (measured:
    # loop-closure keyframe clouds each missing a different half of the
    # room, ICP fitness ~10 m² on a perfect revisit). Hash order decimates
    # uniformly over the extent — free, because the scramble is bijective:
    # ONE sort by it groups same-key points AND hash-orders the segments.
    if groups is None:
        scram = _scramble(key)
    else:
        # mix the group id AFTER a first scramble round: per group the map
        # key→scramble stays bijective (composition of bijections), so ONE
        # sort separates groups; cross-group collisions require
        # scramble(key₂) == scramble(key₁) ^ (Δg·c) — a pseudo-random
        # 32-bit coincidence, not a linear key relation (a single additive
        # pre-mix collided deterministically whenever
        # key₁−key₂ ≡ Δg·c mod 2³², e.g. Δg=2 hit in-range key deltas;
        # a collision's only effect is a split segment → one duplicated
        # centroid). Hash order stays uniform across groups as well as
        # space, so capacity overflow drops each group's voxels
        # ~proportionally — no group starvation.
        scram = _scramble(_scramble(key)
                          ^ (groups.astype(jnp.int32) * jnp.int32(-1640531527)))
    scram = jnp.where(mask, scram, jnp.int32(jnp.iinfo(jnp.int32).max))
    # ONE variadic sort carries the payload through the sort network —
    # measured ~3× cheaper than argsort + per-channel gathers at these sizes
    # (gathers at ~50-115k rows dominate the argsort formulation on TPU).
    # ``key`` rides as an operand and doubles as the validity flag
    # (invalid rows were set to int32 max above).
    ops_in = [scram, key]
    if groups is not None:
        ops_in.append(jnp.where(mask, groups.astype(jnp.int32), -1))
    fdtype = pts.dtype
    ops_in += [pts[:, 0], pts[:, 1], pts[:, 2]]
    F = 0
    if feats is not None:
        F = feats.shape[1]
        ops_in += [feats[:, j] for j in range(F)]
    sorted_ops = jax.lax.sort(tuple(ops_in), num_keys=1, is_stable=False)
    key_s = sorted_ops[1]
    base = 2 if groups is None else 3
    pts_s = jnp.stack(sorted_ops[base:base + 3], axis=1)
    valid_s = key_s != jnp.int32(jnp.iinfo(jnp.int32).max)

    if groups is None:
        starts = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    else:
        grp_s = jnp.where(valid_s, sorted_ops[2], -1)
        starts = jnp.concatenate([
            jnp.ones((1,), bool),
            (key_s[1:] != key_s[:-1]) | (grp_s[1:] != grp_s[:-1])])
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1  # 0-based voxel index
    in_cap = (seg_id < max_out) & valid_s
    seg_id_c = jnp.where(in_cap, seg_id, max_out)  # overflow bucket

    # ONE segment-sum over [xyz | feats | 1]: the count rides as an extra
    # channel instead of separate xyz/feat/count reductions
    ones = in_cap.astype(pts.dtype)
    payload = [pts_s]
    if feats is not None:
        payload.append(jnp.stack(sorted_ops[base + 3:base + 3 + F], axis=1)
                       .astype(fdtype))
    payload.append(ones[:, None])
    stacked = jnp.concatenate(payload, axis=1) * ones[:, None]
    sums = jax.ops.segment_sum(stacked, seg_id_c, num_segments=max_out + 1,
                               indices_are_sorted=True)[:max_out]
    cnt = sums[:, -1]
    out_mask = cnt > 0
    denom = jnp.maximum(cnt, 1.0)[:, None]
    out = jnp.where(out_mask[:, None], sums[:, 0:3] / denom, 0.0)
    if feats is not None:
        fout = jnp.where(out_mask[:, None], sums[:, 3:-1] / denom, 0.0)
        return out, fout, out_mask
    return out, out_mask


@partial(jax.jit, static_argnames=("max_out", "runs_cap"))
def voxel_downsample_ordered(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    leaf: float,
    max_out: int,
    feats: Optional[jnp.ndarray] = None,
    groups: Optional[jnp.ndarray] = None,
    runs_cap: Optional[int] = None,
):
    """Exact voxel downsample for SCAN-ORDERED clouds, same contract and
    results as :func:`voxel_downsample` (up to fp summation order) at a
    fraction of the cost. Two stages:

    1. **run compression** (sort-free): consecutive points with the same
       (voxel key, group) merge by ONE scan-order segment-sum. An organized
       sweep crosses each voxel in a contiguous run of columns (run length ≈
       leaf / (range · Δazimuth) — 5-10 points at typical ranges), so the
       point count drops ~6× before anything is sorted. This is a *partial
       aggregation*: it never changes which points share a voxel, only
       pre-sums them.
    2. the compressed run table runs the standard bijective-hash sort +
       segment-sum over (key, group) — non-adjacent runs of the same voxel
       (range discontinuities, ring revisits) merge here, and capacity
       overflow drops voxels in the same hash order as the exact kernel.

    ``runs_cap`` (static): run-table capacity; default
    ``min(N, max(4·max_out, N/3))`` — the run count is a property of the
    SCAN (≈ N / mean run length, typically N/5..N/8 for organized sweeps),
    not of the output cap. Overflowing it drops the TAIL of the scan
    (scan-order truncation) — size it generously; the sort cost it controls
    is the point of the two-stage split.
    """
    N = pts.shape[0]
    if runs_cap is None:
        runs_cap = min(N, max(4 * max_out, N // 3))
    key = voxel_keys(pts, leaf, mask)
    key = jnp.where(mask, key, jnp.int32(jnp.iinfo(jnp.int32).max))
    if groups is None:
        grp = jnp.zeros((N,), jnp.int32)
    else:
        grp = jnp.where(mask, groups.astype(jnp.int32), -1)
    starts = jnp.concatenate([
        jnp.ones((1,), bool),
        (key[1:] != key[:-1]) | (grp[1:] != grp[:-1])])
    run_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    in_cap = run_id < runs_cap
    run_id_c = jnp.where(in_cap, run_id, runs_cap)

    ones = (mask & in_cap).astype(pts.dtype)
    payload = [pts]
    if feats is not None:
        payload.append(feats)
    payload.append(ones[:, None])
    stacked = jnp.concatenate(payload, axis=1) * ones[:, None]
    run_sums = jax.ops.segment_sum(stacked, run_id_c,
                                   num_segments=runs_cap + 1,
                                   indices_are_sorted=True)[:runs_cap]
    # every point of a run shares (key, group): min-reduce recovers them
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    run_key = jax.ops.segment_min(jnp.where(in_cap, key, big), run_id_c,
                                  num_segments=runs_cap + 1,
                                  indices_are_sorted=True)[:runs_cap]
    run_grp = jax.ops.segment_max(jnp.where(in_cap, grp, jnp.int32(-(2**31))),
                                  run_id_c, num_segments=runs_cap + 1,
                                  indices_are_sorted=True)[:runs_cap]
    run_valid = run_sums[:, -1] > 0

    # ---- stage 2: the standard hash-ordered merge, over runs ----
    run_key = jnp.where(run_valid, run_key, big)
    if groups is None:
        scram = _scramble(run_key)
    else:
        scram = _scramble(_scramble(run_key)
                          ^ (run_grp * jnp.int32(-1640531527)))
    scram = jnp.where(run_valid, scram, big)
    # one variadic sort (see voxel_downsample) — run_key doubles as validity
    C = run_sums.shape[1]
    ops_in = [scram, run_key]
    if groups is not None:
        ops_in.append(jnp.where(run_valid, run_grp, -1))
    ops_in += [run_sums[:, j] for j in range(C)]
    sorted_ops = jax.lax.sort(tuple(ops_in), num_keys=1, is_stable=False)
    key_s = sorted_ops[1]
    base = 2 if groups is None else 3
    sums_s = jnp.stack(sorted_ops[base:base + C], axis=1)
    valid_s = key_s != big
    if groups is None:
        starts2 = jnp.concatenate([jnp.ones((1,), bool),
                                   key_s[1:] != key_s[:-1]])
    else:
        grp_s = jnp.where(valid_s, sorted_ops[2], -1)
        starts2 = jnp.concatenate([
            jnp.ones((1,), bool),
            (key_s[1:] != key_s[:-1]) | (grp_s[1:] != grp_s[:-1])])
    seg_id = jnp.cumsum(starts2.astype(jnp.int32)) - 1
    in_cap2 = (seg_id < max_out) & valid_s
    seg_id_c = jnp.where(in_cap2, seg_id, max_out)
    sums = jax.ops.segment_sum(sums_s * in_cap2[:, None].astype(sums_s.dtype),
                               seg_id_c, num_segments=max_out + 1,
                               indices_are_sorted=True)[:max_out]
    cnt = sums[:, -1]
    out_mask = cnt > 0
    denom = jnp.maximum(cnt, 1.0)[:, None]
    out = jnp.where(out_mask[:, None], sums[:, 0:3] / denom, 0.0)
    if feats is not None:
        fout = jnp.where(out_mask[:, None], sums[:, 3:-1] / denom, 0.0)
        return out, fout, out_mask
    return out, out_mask


@partial(jax.jit, static_argnames=("num_out",))
def merge_voxel_entries(cells, sums, cnt, valid, num_out: int,
                        second_sel=None, primary_sel=None):
    """Merge weighted voxel entries by ABSOLUTE cell coordinates — the
    primitive behind the incremental (persistent-table) local maps.

    An *entry* is a partial aggregate of one voxel: integer cell coords
    (N,3), channel sums (N,C), a (possibly NEGATIVE — that is how a frame's
    contribution is subtracted when it leaves the sliding map) count (N,),
    and a validity flag. Entries with equal cells merge by one
    scrambled-key sort + segment-sum; output segments are compacted in hash
    order (the same spatially-uniform capacity-overflow drop order as
    :func:`voxel_downsample`) and entries whose merged count cancels to ~0
    come out invalid.

    ``primary_sel`` / ``second_sel``: optional (N,) bool row selections —
    the primary result reduces over ``primary_sel`` (default: all valid)
    and, when ``second_sel`` is given, a second reduction over its rows is
    returned AT THE SAME segment positions. The fusion backend builds its
    match map (mature table + live window keyframes) and the updated
    mature table (table + newly-matured − evicted) from ONE sort this way.
    Segment enumeration (and thus the hash drop order) covers ALL valid
    entries regardless of selection.

    Returns (cells (num_out,3), sums (num_out,C), cnt (num_out,), valid)
    [+ the same 4-tuple for ``second_sel`` entries].

    Keys pack cells relative to the batch min cell (3×10 bit, as
    :func:`voxel_keys`): clouds wider than 1024 cells per axis clamp into
    border voxels. Note the hash order depends on that min corner — the
    overflow drop SET can differ from a from-scratch batch downsample whose
    min corner differs (both are uniform decimations; only which voxels are
    dropped past capacity varies).
    """
    N = cells.shape[0]
    C = sums.shape[1]
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    cmin = jnp.min(jnp.where(valid[:, None], cells, jnp.int32(2**30)), axis=0)
    rel = jnp.clip(cells - cmin, 0, (1 << _BITS) - 1)
    key = (rel[..., 0] << (2 * _BITS)) | (rel[..., 1] << _BITS) | rel[..., 2]
    key = jnp.where(valid, key, big)
    scram = jnp.where(valid, _scramble(key), big)
    # one variadic sort (see voxel_downsample): key doubles as validity, the
    # two row selections pack into one int operand, and cells are NOT
    # carried — they are re-derived from the per-segment key (all rows of a
    # segment share it) + the batch min corner.
    ops_in = [scram, key]
    if primary_sel is not None or second_sel is not None:
        p = jnp.ones((N,), jnp.int32) if primary_sel is None \
            else primary_sel.astype(jnp.int32)
        s = jnp.zeros((N,), jnp.int32) if second_sel is None \
            else second_sel.astype(jnp.int32)
        ops_in.append(p | (s << 1))
        sel_base = 3
    else:
        sel_base = 2
    ops_in += [sums[:, j] for j in range(C)]
    ops_in.append(cnt)
    sorted_ops = jax.lax.sort(tuple(ops_in), num_keys=1, is_stable=False)
    key_s = sorted_ops[1]
    payload = jnp.stack(sorted_ops[sel_base:sel_base + C + 1], axis=1)
    starts = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    seg_id = jnp.cumsum(starts.astype(jnp.int32)) - 1
    in_cap = (seg_id < num_out) & (key_s != big)
    seg_id_c = jnp.where(in_cap, seg_id, num_out)

    w = in_cap.astype(sums.dtype)

    def reduce(sel_w):
        s = jax.ops.segment_sum(payload * sel_w[:, None], seg_id_c,
                                num_segments=num_out + 1,
                                indices_are_sorted=True)[:num_out]
        c = s[:, -1]
        v = c > 0.5  # integer counts in f32; fp residue of add/sub ≈ 1e-5
        return s[:, :-1], c, v

    if sel_base == 3:
        selbits = sorted_ops[2]
        wp = w * (selbits & 1).astype(sums.dtype)
    else:
        wp = w
    out_sums, out_cnt, out_valid = reduce(wp)
    out_key = jax.ops.segment_min(jnp.where(in_cap, key_s, big), seg_id_c,
                                  num_segments=num_out + 1,
                                  indices_are_sorted=True)[:num_out]
    out_cells = jnp.stack([out_key >> (2 * _BITS),
                           (out_key >> _BITS) & ((1 << _BITS) - 1),
                           out_key & ((1 << _BITS) - 1)], axis=1) + cmin
    out_cells = jnp.where(out_valid[:, None], out_cells, 0)
    if second_sel is None:
        return out_cells, out_sums, out_cnt, out_valid
    s2, c2, v2 = reduce(w * ((sorted_ops[2] >> 1) & 1).astype(sums.dtype))
    cells2 = jnp.where(v2[:, None], out_cells, 0)
    return (out_cells, out_sums, out_cnt, out_valid), (cells2, s2, c2, v2)


@partial(jax.jit, static_argnames=("num_out", "table_rows", "tiers"))
def merge_voxel_entries_tiered(cells, sums, cnt, valid, num_out: int,
                               table_rows: int, tiers: tuple = (),
                               second_sel=None, primary_sel=None):
    """:func:`merge_voxel_entries` with OCCUPANCY-ADAPTIVE sort length.

    The persistent tables are sized for their worst case (map cap + slack)
    but spend most of a run far below it — the bench-measured odometry
    table holds ~4k valid entries of 40 960 rows, yet every merge sorts the
    full capacity. This wrapper slices the table to the smallest ``tier``
    that PROVABLY fits and runs the sort at that length, falling back tier
    by tier to the full merge via ``lax.cond`` — the device picks per call,
    no host round-trip, monotonicity, or staleness involved.

    NOT the production default: measured on one v5e, the cond overhead
    exceeds the sort saving at these sizes (tiered 1.61 ms vs full
    1.09 ms at 4k/40960 occupancy — the 49k-row variadic sort is only
    ~1 ms on-chip, and TPU conditionals pay operand/result buffer copies
    for the concatenated inputs). Kept tested, for much larger tables
    (≥256k rows) where the sort dominates the fixed cond cost; see
    docs/PERFORMANCE.md "Negative result: occupancy-tiered table merges".

    Layout contract: rows ``[0:table_rows)`` are the table (compacted
    segments from a previous merge — every valid row of a table with
    ≤ tier in-cap segments lies below that tier), the rest are delta rows
    (always included). A tier ``B`` is taken iff no valid table row is at
    or past ``B`` AND ``n_valid(table[:B]) + n_valid(delta) ≤ B`` — a
    conservative bound on the merged segment count, so the tiered merge
    can never drop a voxel the full merge would keep.

    EXACTNESS: when tier ``B`` fires, the sliced-away rows are all invalid
    (contribute nothing) and the batch min corner — computed over valid
    rows only — is unchanged, so keys, scramble order, and segment
    enumeration match the full merge's; the full merge's rows
    ``[B:num_out)`` are invalid zeros under the same bound, which is
    exactly the padding the tiered branch emits. Sums can differ by fp
    summation order within a segment (the unstable sort may permute
    equal-key rows differently at different lengths); cells, counts, and
    validity are exact. Mispredicted occupancy only skips tiers (perf),
    never changes results.
    """
    del_rows = cells.shape[0] - table_rows
    d_valid = jnp.sum(valid[table_rows:].astype(jnp.int32))

    def sel_slice(sel, B):
        if sel is None:
            return None
        return jnp.concatenate([sel[:B], sel[table_rows:]])

    def pad_out(out, B):
        if second_sel is None:
            outs = (out,)
        else:
            outs = out
        padded = []
        for (c, s, n, v) in outs:
            pad = num_out - B
            padded.append((
                jnp.concatenate([c, jnp.zeros((pad, 3), c.dtype)]),
                jnp.concatenate([s, jnp.zeros((pad, s.shape[1]), s.dtype)]),
                jnp.concatenate([n, jnp.zeros((pad,), n.dtype)]),
                jnp.concatenate([v, jnp.zeros((pad,), bool)]),
            ))
        return padded[0] if second_sel is None else tuple(padded)

    def tier_branch(B):
        def run(_):
            out = merge_voxel_entries(
                jnp.concatenate([cells[:B], cells[table_rows:]]),
                jnp.concatenate([sums[:B], sums[table_rows:]]),
                jnp.concatenate([cnt[:B], cnt[table_rows:]]),
                jnp.concatenate([valid[:B], valid[table_rows:]]),
                B,
                second_sel=sel_slice(second_sel, B),
                primary_sel=sel_slice(primary_sel, B))
            return pad_out(out, B)
        return run

    def full(_):
        return merge_voxel_entries(cells, sums, cnt, valid, num_out,
                                   second_sel=second_sel,
                                   primary_sel=primary_sel)

    # nest conds smallest-tier first; each predicate is a cheap mask count
    chain = full
    for B in sorted((b for b in tiers if b < num_out), reverse=True):
        t_in_slice = jnp.sum(valid[:B].astype(jnp.int32))
        t_beyond = jnp.any(valid[B:table_rows])
        fits = (~t_beyond) & (t_in_slice + d_valid <= B)
        chain = (lambda fits, this, nxt:
                 lambda _: jax.lax.cond(fits, this, nxt, 0))(
                     fits, tier_branch(B), chain)
    return chain(0)


def voxel_downsample_np(pts, leaf: float):
    """Host-side exact voxel-centroid downsample (numpy, unbounded extent).

    For whole-trajectory clouds — global map export, long submaps — whose
    span exceeds the device kernel's 1024-cell axis budget. int64 keys give
    2²¹ cells per axis; ``np.unique`` does the grouping.
    """
    import numpy as np

    pts = np.asarray(pts)
    if len(pts) == 0:
        return pts.reshape(0, 3)
    cells = np.floor(pts / leaf).astype(np.int64)
    cells -= cells.min(axis=0)
    key = (cells[:, 0] << 42) | (cells[:, 1] << 21) | cells[:, 2]
    uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    sums = np.zeros((len(uniq), 3), pts.dtype)
    np.add.at(sums, inv, pts)
    return sums / cnt[:, None]


def pad_cloud(pts: jnp.ndarray, mask: jnp.ndarray, cap: int):
    """Pad or truncate a (N,3) cloud + mask to a static capacity."""
    n = pts.shape[0]
    if n == cap:
        return pts, mask
    if n > cap:
        return pts[:cap], mask[:cap]
    pad = cap - n
    return (
        jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)]),
        jnp.concatenate([mask, jnp.zeros((pad,), bool)]),
    )


def remove_close_points(pts: jnp.ndarray, mask: jnp.ndarray, min_range: float) -> jnp.ndarray:
    """Validity update dropping points closer than ``min_range``
    (removeClosedPointCloud: LiLi-OM Preprocessing.cpp:225-226 [0.1 m],
    ROT Preprocessing.cpp:281 [3.0 m])."""
    r2 = jnp.sum(pts * pts, axis=-1)
    return mask & (r2 >= min_range * min_range) & jnp.all(jnp.isfinite(pts), axis=-1)
