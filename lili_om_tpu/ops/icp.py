"""Fixed-iteration point-to-plane ICP — the loop-closure aligner replacing
PCL's ``IterativeClosestPoint`` (LiLi-OM/src/BackendFusion.cpp:2567-2577:
max corr dist 30 m, 100 iters, fitness gate ``lc_icp_thres``).

TPU-native choices: exact kNN by tiled MXU matmul instead of a kd-tree; a
*point-to-plane* objective (plane fit over the 5-NN) instead of PCL's
point-to-point — strictly stronger per iteration, so a fixed modest
iteration count replaces PCL's convergence loop; fitness is PCL's
``getFitnessScore`` (mean squared NN distance of matched points) so the
reference's ``lc_icp_thres`` config values carry over unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..factors.lidar import PlaneFactorBatch, plane_residual
from ..ops.fitting import eig3_symmetric
from ..ops.knn import knn_auto
from ..solver.gn import gn_update
from ..utils.math import exp_so3, quat_mul, quat_normalize, quat_rotate


class IcpResult(NamedTuple):
    t: jnp.ndarray  # (3,) source→target transform
    q: jnp.ndarray  # (4,)
    fitness: jnp.ndarray  # () mean squared NN distance (PCL getFitnessScore)
    n_matched: jnp.ndarray  # () int32


@partial(jax.jit, static_argnames=("n_iters", "k"))
def icp_point_to_plane(
    src_pts: jnp.ndarray,  # (S,3)
    src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray,  # (T,3)
    tgt_mask: jnp.ndarray,
    t_init: jnp.ndarray,
    q_init: jnp.ndarray,
    n_iters: int = 20,
    k: int = 5,
    max_corr_dist: float = 30.0,  # (:2567)
    plane_tol: float = 0.3,
    damping: float = 1e-6,
) -> IcpResult:
    """Align ``src`` onto ``tgt``; returns the refined transform + fitness."""

    def one_iter(_, carry):
        t, q = carry
        pw = quat_rotate(q[None, :], src_pts) + t[None, :]
        d2, idx = knn_auto(pw, tgt_pts, k=k, p_mask=tgt_mask)
        nbrs = tgt_pts[idx]
        nn_ok = d2[:, 0] < max_corr_dist**2
        # centered covariance plane fit (smallest eigenvector): unlike the
        # odometry path's A·n=−1 form it has no degeneracy for planes
        # through the origin
        ctr = jnp.mean(nbrs, axis=-2)
        dd = nbrs - ctr[:, None, :]
        cov = jnp.einsum("qki,qkj->qij", dd, dd)
        _, evecs = eig3_symmetric(cov)
        normal = evecs[..., :, 0]
        d_off = -jnp.sum(normal * ctr, axis=-1)
        pd_nbr = jnp.abs(jnp.einsum("qki,qi->qk", nbrs, normal) + d_off[:, None])
        plane_ok = jnp.all(pd_nbr <= plane_tol, axis=-1)
        keep = src_mask & nn_ok & plane_ok
        batch = PlaneFactorBatch(src_pts, normal, d_off,
                                 jnp.where(keep, 1.0, 0.0), keep)
        r, J = plane_residual(t, q, batch)
        delta = gn_update(J, r, damping=damping)
        t = t + delta[:3]
        q = quat_normalize(quat_mul(q, exp_so3(delta[3:6])))
        return (t, q)

    t, q = jax.lax.fori_loop(0, n_iters, one_iter, (t_init, q_init))

    # fitness: mean squared 1-NN distance of in-range source points (PCL)
    pw = quat_rotate(q[None, :], src_pts) + t[None, :]
    d2, _ = knn_auto(pw, tgt_pts, k=1, p_mask=tgt_mask)
    d2 = d2[:, 0]
    ok = src_mask & (d2 < max_corr_dist**2)
    n = jnp.sum(ok.astype(jnp.int32))
    # no matches → +inf (PCL returns max double), so fitness gates reject
    fitness = jnp.where(
        n > 0, jnp.sum(jnp.where(ok, d2, 0.0)) / jnp.maximum(n, 1), jnp.inf)
    return IcpResult(t=t, q=q, fitness=fitness, n_matched=n.astype(jnp.int32))
