"""Map-sharded backend fusion — the multi-chip axis that actually scales.

Round 1's distributed fusion (dist_fusion.py) sharded the *query* capacity
and replicated the map; at 8 devices that is 256 queries/device against a
full 32k-point map per chip — neither the map's HBM footprint nor the
O(Q·P) kNN distance work shrinks. Here the **keyframe ring buffer** (and
with it the local map, the big operand) shards over the mesh:

* each device holds ``local_map_width / n`` keyframe slots, transforms and
  voxel-downsamples *its own* keyframes into a local map shard
  (``map_surf_cap / n`` centroids) — map memory and map-build work scale
  1/n (the "keyframes + map voxel blocks sharded" north star, SURVEY §2.3);
* window queries are replicated; each device 5-NN-searches its shard —
  the O(Q·P) distance work scales 1/n;
* per-shard candidates merge with one ``all_gather`` of (Q,k) distances +
  (Q,k,3) coordinates (+ (Q,k) reflectivity) — exact global k-NN, since the
  global top-k is contained in the union of per-shard top-k;
* plane/line fits + gates run replicated on the merged candidates (tiny),
  reusing the single-chip ``surf_fit_and_gate``/``edge_fit_and_gate`` —
  so results match the single-chip search up to shard-boundary voxel
  duplicates (voxels spanning two devices' keyframes deduplicate per shard,
  not globally).

Communication per keyframe (the only collectives in the step):

  all_gather: Q_surf·k·(4+12+4) + Q_edge·k·(4+12) bytes
            = 6144·5·20 + 3072·5·16 ≈ 0.86 MB over ICI,
  psum:      2 scalars (map-population counts),

independent of the map size — vs ~5·32768·12 B ≈ 2 MB of *map build input*
work and the 6144×32768 distance matrix (0.8 GB of HBM traffic) that the
sharding divides by n. See docs/SCALING.md for the ≥70 %-at-2-hosts
derivation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.fusion import (FusionConfig, FusionState, edge_fit_and_gate,
                             fusion_step, init_fusion_state,
                             surf_fit_and_gate)
from ..factors.lidar import EdgeFactorBatch, PlaneFactorBatch
from ..ops.knn import knn
from ..ops.preintegration import ImuNoise
from ..ops.voxel import voxel_downsample
from ..utils.math import quat_rotate


class MapShardedMatch:
    """Hashable match_fn (static jit arg) closing over the mesh."""

    def __init__(self, mesh: Mesh, axis: str | None = None):
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]

    def __hash__(self):
        return hash((id(self.mesh), self.axis))

    def __eq__(self, other):
        return (isinstance(other, MapShardedMatch)
                and self.mesh is other.mesh and self.axis == other.axis)

    def __call__(self, state: FusionState, ts, qs,
                 win_surf_b, win_surf_mask, win_surf_refl,
                 win_edge_b, win_edge_mask, cfg: FusionConfig):
        mesh, axis = self.mesh, self.axis
        n = mesh.devices.size
        W = cfg.window
        Mp = cfg.local_map_width + cfg.map_slots_pad  # physical ring slots
        Sc, Ec = cfg.kf_surf_cap, cfg.kf_edge_cap
        assert Mp % n == 0, (
            f"physical ring slots {Mp} must divide the {n}-device mesh — "
            "LiliOmSystem(mesh=…) pads via FusionConfig.map_slots_pad")
        assert cfg.map_surf_cap % n == 0 and cfg.map_edge_cap % n == 0, (
            "map caps must divide the mesh (LiliOmSystem(mesh=…) rounds "
            "them up)")
        scap, ecap = cfg.map_surf_cap // n, cfg.map_edge_cap // n
        k = cfg.k

        pw_surf = (quat_rotate(qs[:, None, :], win_surf_b) + ts[:, None, :]).reshape(W * Sc, 3)
        from ..models.fusion import _edge_query_world

        pw_edge = _edge_query_world(ts, qs, win_edge_b, cfg).reshape(W * Ec, 3)

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis),
                           P(axis), P(axis), P(axis), P(), P()),
                 out_specs=(P(), P(), P(), P(), P(), P()),
                 check_vma=False)  # outputs replicated by all_gather+merge
        def gather_candidates(h_surf, h_smask, h_refl, h_edge, h_emask,
                              h_t, h_q, h_valid, pw_s, pw_e):
            # per-device local map from this shard's keyframe slots — with
            # the reference's lidar→body conversion before the pose
            # (pose ∘ (q_bl, t_bl); see models/fusion.py:_build_maps note)
            from ..factors.lidar import body_points

            m = h_surf.shape[0]
            dtype = h_surf.dtype
            t_lb = jnp.asarray(cfg.t_lb, dtype)
            q_lb = jnp.asarray(cfg.q_lb, dtype)
            h_surf_b = jax.vmap(lambda p: body_points(p, t_lb, q_lb))(h_surf)
            world = quat_rotate(h_q[:, None, :], h_surf_b) + h_t[:, None, :]
            hmask = h_smask & h_valid[:, None]
            map_s, map_refl, map_smask = voxel_downsample(
                world.reshape(m * Sc, 3), hmask.reshape(-1),
                cfg.surf_leaf, scap, feats=h_refl.reshape(-1, 1))
            h_edge_b = jax.vmap(lambda p: body_points(p, t_lb, q_lb))(h_edge)
            eworld = quat_rotate(h_q[:, None, :], h_edge_b) + h_t[:, None, :]
            emask = h_emask & h_valid[:, None]
            map_e, map_emask = voxel_downsample(
                eworld.reshape(m * Ec, 3), emask.reshape(-1),
                cfg.edge_leaf, ecap)

            # local exact k-NN over the shard
            d2s, idxs = knn(pw_s, map_s, k=k, p_mask=map_smask)
            d2e, idxe = knn(pw_e, map_e, k=k, p_mask=map_emask)
            nbr_s = map_s[idxs]
            refl_s = map_refl[:, 0][idxs]
            nbr_e = map_e[idxe]

            # merge candidates across the mesh: ONE all_gather per cloud
            cat = lambda a: jax.lax.all_gather(a, axis, axis=1, tiled=True)
            d_all, nbr_all, refl_all = cat(d2s), cat(nbr_s), cat(refl_s)
            de_all, nbre_all = cat(d2e), cat(nbr_e)
            neg, arg = jax.lax.top_k(-d_all, k)
            nbrs = jnp.take_along_axis(nbr_all, arg[..., None], axis=1)
            refls = jnp.take_along_axis(refl_all, arg, axis=1)
            nege, arge = jax.lax.top_k(-de_all, k)
            nbrse = jnp.take_along_axis(nbre_all, arge[..., None], axis=1)

            ns = jax.lax.psum(jnp.sum(map_smask.astype(jnp.int32)), axis)
            ne = jax.lax.psum(jnp.sum(map_emask.astype(jnp.int32)), axis)
            return -neg, nbrs, refls, -nege, nbrse, jnp.stack([ns, ne])

        d2s, nbrs, refls, d2e, nbrse, counts = gather_candidates(
            state.hist_surf, state.hist_surf_mask, state.hist_surf_refl,
            state.hist_edge, state.hist_edge_mask,
            state.hist_t, state.hist_q, state.hist_valid, pw_surf, pw_edge)

        sb_flat = surf_fit_and_gate(
            win_surf_b.reshape(W * Sc, 3), pw_surf,
            win_surf_mask.reshape(W * Sc), win_surf_refl.reshape(W * Sc),
            d2s, nbrs, refls, cfg)
        surf_batches = PlaneFactorBatch(*[a.reshape((W, Sc) + a.shape[1:])
                                          for a in sb_flat])
        eb_flat = edge_fit_and_gate(
            win_edge_b.reshape(W * Ec, 3), win_edge_mask.reshape(W * Ec),
            d2e, nbrse, cfg)
        edge_batches = EdgeFactorBatch(*[a.reshape((W, Ec) + a.shape[1:])
                                         for a in eb_flat])
        enough_map = (counts[0] > 50) & (counts[1] > 0)
        return surf_batches, edge_batches, enough_map


def map_sharded_state_shardings(mesh: Mesh, axis: str | None = None):
    """FusionState shardings: keyframe-slot (M) axes sharded, estimator
    state replicated."""
    axis = axis or mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    slots = NamedSharding(mesh, P(axis))
    st = init_fusion_state(FusionConfig(), ImuNoise())  # structure only
    sh = jax.tree.map(lambda _: repl, st)
    return sh._replace(
        hist_surf=slots, hist_surf_mask=slots, hist_surf_refl=slots,
        hist_edge=slots, hist_edge_mask=slots,
        hist_t=slots, hist_q=slots, hist_valid=slots,
    )


def make_map_sharded_fusion(mesh: Mesh, cfg: FusionConfig, noise: ImuNoise,
                            warmup: bool = False, axis: str | None = None):
    """jit the full fusion_step with the map-sharded match phase and
    keyframe-slot state shardings. Returns (step_fn, state_shardings)."""
    # the injected match phase builds its maps from the sharded ring — the
    # single-chip incremental tables would be dead weight inside the program
    cfg = cfg._replace(incremental_map=False)
    axis = axis or mesh.axis_names[0]
    st_sh = map_sharded_state_shardings(mesh, axis)
    repl = NamedSharding(mesh, P())
    match = MapShardedMatch(mesh, axis)

    from ..models.fusion import FusionOut

    out_sh = jax.tree.map(
        lambda _: repl,
        FusionOut(t_latest=0, q_latest=0, t_mature=0, q_mature=0,
                  v_latest=0, ba_latest=0, bg_latest=0,
                  n_surf_corr=0, n_edge_corr=0))
    fn = jax.jit(
        partial(fusion_step, cfg=cfg, noise=noise, warmup=warmup,
                match_fn=match),
        in_shardings=(st_sh,) + (repl,) * 9,
        out_shardings=(st_sh, out_sh),
    )
    return fn, st_sh


def make_map_sharded_system_step(mesh: Mesh, cfg: FusionConfig, noise: ImuNoise):
    """Both warmup and main variants, for LiliOmSystem(mesh=...)."""
    warm, sh = make_map_sharded_fusion(mesh, cfg, noise, warmup=True)
    main, _ = make_map_sharded_fusion(mesh, cfg, noise, warmup=False)
    return warm, main, sh
