"""Segmented reduction over SORTED segment ids as a Pallas TPU kernel —
the scatter-free replacement for ``jax.ops.segment_sum`` in the voxel
pipeline (ops/voxel.py), where XLA's scatter-add lowering costs ~3 ms per
call at 115k×9 channels (measured, docs/MFU.md) and is the dominant cost of
every downsample/merge.

Idea: with ids sorted (they are — every producer derives them as
``cumsum(boundary_flags) − 1`` over sorted keys), a block of B consecutive
rows touches a CONTIGUOUS id window ``[base, base + B]``. Per grid step the
kernel builds a one-hot matrix over that window and reduces the block with
ONE MXU matmul — payloadᵀ(C×B) @ onehot(B×W) — accumulating into the
VMEM-resident output at a dynamic lane offset. The scatter becomes matmul +
slice-add: ~0.1 ms of MXU/VPU work for the 115k-row shapes.

Layout: payload and output are TRANSPOSED (C on sublanes, rows on lanes) so
the big dimension pads to 128 lanes instead of multiplying the channel dim
(same trick as ops/knn_pallas.py).

Contract (matches the callers' segment_sum usage):
* ``seg_id`` monotone non-decreasing, stepping by ≤ 1 between consecutive
  rows EXCEPT for a final jump to the overflow id ``num_out`` (rows to be
  dropped); arbitrary upward jumps > B within [0, num_out) would silently
  drop those rows' contributions (no producer does this).
* rows with ``seg_id ≥ num_out`` are excluded from the result.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _segred_kernel(sid_ref, pay_ref, out_ref, *, W):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sid = sid_ref[0, :]  # (B,) int32, monotone within the block
    # window start aligned DOWN to the lane size — Mosaic requires dynamic
    # lane offsets provably 128-aligned; the window is widened by one lane
    # to cover the remainder
    wstart = pl.multiple_of((sid_ref[0, 0] // _LANE) * _LANE, _LANE)
    local = sid - wstart  # ∈ [0, B+127] for contiguous ids; ≥ W → dropped
    B = sid.shape[0]
    # one-hot (B, W): columns beyond the window never match (local ≥ W has
    # no matching iota column), which is exactly the drop semantics for
    # overflow rows
    oh = (jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
          == local[:, None]).astype(jnp.float32)
    # (C, B) @ (B, W) → (C, W); HIGHEST keeps the f32 payload exact through
    # the bf16-pass decomposition (costs µs at these shapes)
    part = jax.lax.dot_general(
        pay_ref[:], oh, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    cur = out_ref[:, pl.ds(wstart, W)]
    out_ref[:, pl.ds(wstart, W)] = cur + part


@partial(jax.jit, static_argnames=("num_out", "block", "interpret"))
def segment_sum_sorted_pallas(payload, seg_id, num_out: int,
                              block: int = 1024, interpret: bool = False):
    """``jax.ops.segment_sum(payload, seg_id, num_out)`` for sorted ids (see
    module contract). payload (N, C) f32 → (num_out, C)."""
    N, C = payload.shape
    W = block + 2 * _LANE  # worst case local ∈ [0, B+127] (every row its
    # own segment + the window-start lane alignment)
    Np = -(-N // block) * block
    payT = jnp.zeros((C, Np), jnp.float32).at[:, :N].set(
        payload.astype(jnp.float32).T)
    sid = jnp.full((1, Np), num_out, jnp.int32).at[0, :N].set(
        seg_id.astype(jnp.int32))

    out = pl.pallas_call(
        partial(_segred_kernel, W=W),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, num_out + W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, num_out + W), jnp.float32),
        interpret=interpret,
    )(sid, payT)
    return out[:, :num_out].T


# LILI_OM_PALLAS_SEGRED: "0" (default) = XLA segment_sum; "1" = the Pallas
# kernel on TPU. MEASURED (v5e, 115200×9 → 32768, chained device loops):
# XLA sorted segment_sum 1.75 ms; this kernel 1.5-1.7 ms pre-transposed
# (block 1024-4096, chunked or monolithic windows) — the dynamic-offset
# VMEM read-modify-writes and per-block overheads eat the MXU win, so the
# kernel only breaks even. Kept (a) as the scatter-free reference point for
# future Mosaic improvements, (b) because the break-even shifts in its
# favor when C grows (the RMW cost is ~C-independent, XLA's scatter is not).
_PALLAS_SEGRED = os.environ.get("LILI_OM_PALLAS_SEGRED", "0")


def segment_sum_auto(payload, seg_id, num_out: int):
    """Backend-dispatching sorted-segment sum (see module docstring)."""
    if _PALLAS_SEGRED != "0" and jax.default_backend() == "tpu" \
            and payload.dtype == jnp.float32:
        return segment_sum_sorted_pallas(payload, seg_id, num_out)
    return jax.ops.segment_sum(payload, seg_id, num_segments=num_out,
                               indices_are_sorted=True)
