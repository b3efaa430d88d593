"""LEGACY — superseded sharding axis; production multi-chip fusion is
``parallel/map_fusion.py`` (see STATUS below).

Distributed backend fusion: the full sliding-window step under GSPMD
data-parallel sharding (SURVEY.md §2.3 "distributed Gauss-Newton with psum
over ICI for the Schur reduction").

Design: the heavy axes of ``fusion_step`` are the per-keyframe point
capacities (stored clouds → correspondence queries → residual rows). We
shard those axes over the mesh and jit the *unchanged* single-chip program
with sharding annotations — XLA GSPMD partitions the kNN distance matmuls
and plane fits per shard and inserts the all-reduce where the rows contract
into the (15·W)² normal equations (the JᵀJ einsums). Per GN iteration the
cross-chip traffic is one 45×45 matrix — independent of point counts.

The same program runs on the virtual CPU mesh (tests) and a real slice; the
dense window solve and IMU factors are replicated (they are tiny).

STATUS: superseded as the production multi-chip path. This axis replicates
the map on every chip, so it scales compute but not memory;
``parallel/map_fusion.py`` (keyframe ring + local map sharded,
``LiliOmSystem(mesh=…)``) is the production design — see docs/SCALING.md.
Kept as the minimal GSPMD reference for the annotate-and-let-XLA-partition
pattern, and as the fallback when the map fits every chip anyway.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fusion import FusionConfig, FusionState, fusion_step, init_fusion_state
from ..ops.preintegration import ImuNoise


def _state_shardings(mesh: Mesh, axis: str):
    """Sharding pytree for FusionState: point-capacity axes sharded, the
    small estimator state replicated."""
    repl = NamedSharding(mesh, P())
    pts = NamedSharding(mesh, P(None, axis))  # (M, cap, ...) → shard cap
    return FusionState(
        t=repl, q=repl, v=repl, ba=repl, bg=repl,
        preints=jax.tree.map(lambda _: repl, init_preint_struct()),
        prior=jax.tree.map(lambda _: repl, prior_struct()),
        sb_anchor_on=repl,
        hist_surf=pts, hist_surf_mask=pts, hist_surf_refl=pts,
        hist_edge=pts, hist_edge_mask=pts,
        hist_t=repl, hist_q=repl, hist_valid=repl,
        write_idx=repl, kf_count=repl,
        msurf_cells=repl, msurf_sums=repl, msurf_cnt=repl, msurf_valid=repl,
        medge_cells=repl, medge_sums=repl, medge_cnt=repl, medge_valid=repl,
        acc0=repl, gyr0=repl,
    )


def init_preint_struct():
    from ..ops.preintegration import Preint

    return Preint(dp=0, dq=0, dv=0, jacobian=0, covariance=0, ba=0, bg=0, sum_dt=0)


def prior_struct():
    from ..factors.prior import MarginalPrior

    return MarginalPrior(J=0, r0=0, t0=0, q0=0, v0=0, ba0=0, bg0=0, valid=0)


def make_distributed_fusion(mesh: Mesh, cfg: FusionConfig, noise: ImuNoise,
                            axis: str | None = None, warmup: bool = False):
    """jit ``fusion_step`` with data-parallel shardings over ``mesh``.

    Returns ``(step_fn, state_shardings)``; call ``step_fn(state, surf_pts,
    surf_mask, surf_refl, edge_pts, edge_mask, dts, accs, gyrs, vmask)``
    with the cloud arrays sharded on their capacity axis (use
    ``jax.device_put`` with the returned shardings).
    """
    axis = axis or mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    cloud = NamedSharding(mesh, P(axis))
    st_sh = _state_shardings(mesh, axis)
    in_sh = (st_sh, cloud, cloud, cloud, cloud, cloud,
             repl, repl, repl, repl)

    fn = jax.jit(
        partial(fusion_step, cfg=cfg, noise=noise, warmup=warmup),
        in_shardings=in_sh,
        out_shardings=(st_sh, jax.tree.map(lambda _: repl, _out_struct())),
    )
    return fn, st_sh


def _out_struct():
    from ..models.fusion import FusionOut

    return FusionOut(t_latest=0, q_latest=0, t_mature=0, q_mature=0,
                     v_latest=0, ba_latest=0, bg_latest=0,
                     n_surf_corr=0, n_edge_corr=0)


def make_sharded_state(mesh: Mesh, cfg: FusionConfig, noise: ImuNoise,
                       dtype=jnp.float32, axis: str | None = None):
    """init_fusion_state placed with the distributed shardings."""
    axis = axis or mesh.axis_names[0]
    st = init_fusion_state(cfg, noise, dtype=dtype)
    return jax.device_put(st, _state_shardings(mesh, axis))
