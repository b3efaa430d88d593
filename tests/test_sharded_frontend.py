"""Numeric equivalence of the query-sharded frontend (VERDICT r4 task 2):
``make_sharded_odometry`` must reproduce ``odometry_step`` on the 8-device
mesh (same kNN, same fits/gates, psum-reduced normal equations — the only
divergence is collective reduction order), and the full
``LiliOmSystem(mesh=…)`` trajectory must agree with the single-chip system
(looser: the mesh match phase deduplicates voxels per shard, so overlapping
keyframes contribute slightly different map centroids).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.odometry import (OdometryConfig, init_state,
                                         odometry_step)
from lili_om_tpu.ops.features_spin import (SpinFeatureConfig,
                                           extract_features_spin)
from lili_om_tpu.parallel.sharded import make_mesh, make_sharded_odometry
from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
from lili_om_tpu.sim.trajectory import circle_trajectory
from lili_om_tpu.sim.world import make_room_world

N_DEV = 8
R, C, PERIOD = 16, 720, 0.1
N_FRAMES = 20


@pytest.fixture(scope="module")
def frames():
    """N_FRAMES feature clouds from the deterministic room world."""
    world = make_room_world()
    traj = circle_trajectory(radius=8.0, period=40.0)
    pattern = spinning_pattern(n_rings=R, n_cols=C)
    fcfg = SpinFeatureConfig(surf_cap=4096)
    out = []
    for k in range(N_FRAMES):
        s = simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
        fc = extract_features_spin(
            jnp.asarray(s.pts).reshape(R, C, 3),
            jnp.asarray(s.valid).reshape(R, C),
            jnp.asarray(s.rel_time).reshape(R, C), fcfg)
        out.append((fc.surf_pts.astype(jnp.float64), fc.surf_mask))
    return out


class TestShardedOdometryEquivalence:
    def test_matches_single_chip_over_sequence(self, frames):
        """gn_tol=0 pins the GN iteration count (with early exit on, psum
        reduction-order noise near the tol boundary can flip the exit one
        iteration earlier/later — a legitimate but chaotic divergence).
        What remains is pure reduction-order noise, which discrete gates
        (voxel cells, plane/weight keeps) amplify chaotically after ~15
        frames — measured profile: 0 through frame 11, ~1e-18 → 1e-4 over
        frames 12-19, with at most ±1 correspondence flipping."""
        assert len(jax.devices()) >= N_DEV
        mesh = make_mesh(N_DEV, axis="q")
        ocfg = OdometryConfig(n_recent_frames=8, scan_cap=4096,
                              query_cap=1024, map_cap=16384, gn_tol=0.0)
        st_ref = init_state(ocfg, dtype=jnp.float64)
        st_sh = init_state(ocfg, dtype=jnp.float64)
        sharded = make_sharded_odometry(mesh, ocfg)

        max_dt = max_dq = max_dt_early = 0.0
        for k, (sp, sm) in enumerate(frames):
            n_rounds = 8 if k < 2 else ocfg.scan_match_cnt  # :500-504
            st_ref, out_ref = odometry_step(st_ref, sp, sm, ocfg,
                                            n_rounds=n_rounds)
            st_sh, out_sh = sharded(st_sh, sp, sm, n_rounds=n_rounds)
            dt = float(jnp.max(jnp.abs(out_ref.t - out_sh.t)))
            max_dt = max(max_dt, dt)
            max_dq = max(max_dq, float(jnp.max(jnp.abs(out_ref.q - out_sh.q))))
            if k < 12:
                max_dt_early = max(max_dt_early, dt)
            # same gates on (near-)identical poses: counts may flip by a
            # borderline point or two, never more
            assert abs(int(out_ref.n_corr) - int(out_sh.n_corr)) <= 2, \
                f"frame {k}: {int(out_ref.n_corr)} vs {int(out_sh.n_corr)}"
            assert bool(out_ref.is_keyframe) == bool(out_sh.is_keyframe)
        # before chaotic amplification: reduction-order noise only (the
        # floor depends on XLA:CPU thread partitioning — measured 0 in one
        # environment, ~1e-8 in another)
        assert max_dt_early < 1e-6, f"early frames diverged: {max_dt_early}"
        # over the full 20 frames: far below the frontend's own accuracy
        assert max_dt < 1e-3, f"translation diverged: {max_dt}"
        assert max_dq < 1e-3, f"rotation diverged: {max_dq}"

    def test_correspondences_found(self, frames):
        """The sharded rounds must actually match (not an empty-gate
        pass-through)."""
        mesh = make_mesh(N_DEV, axis="q")
        ocfg = OdometryConfig(n_recent_frames=4, scan_cap=4096,
                              query_cap=1024, map_cap=16384, gn_tol=0.0)
        st = init_state(ocfg, dtype=jnp.float64)
        sharded = make_sharded_odometry(mesh, ocfg)
        for k, (sp, sm) in enumerate(frames[:4]):
            st, out = sharded(st, sp, sm, n_rounds=2)
        assert int(out.n_corr) > 500


class TestSystemMeshTrajectoryAgreement:
    def test_mesh_system_tracks_single_chip(self):
        """Full per-scan path: LiliOmSystem(mesh=…) vs single-chip over a
        sim sequence — trajectory agreement, not just finiteness. The mesh
        fusion deduplicates map voxels per shard (documented divergence for
        overlapping keyframes), so the bound is centimetres, not epsilon."""
        from lili_om_tpu.models.fusion import FusionConfig
        from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig
        from lili_om_tpu.sim.trajectory import simulate_imu

        mesh = make_mesh(N_DEV, axis="kf")
        fcfg = FusionConfig(window=3, local_map_width=8, kf_surf_cap=1024,
                            kf_edge_cap=256, map_surf_cap=2048,
                            map_edge_cap=512, use_reflectivity=False,
                            max_num_iter=2, imu_cap=32)

        def build(mesh_arg):
            return LiliOmSystem(
                odo_cfg=OdometryConfig(n_recent_frames=4, scan_cap=1024,
                                       query_cap=256, map_cap=2048),
                fusion_cfg=fcfg, feat_cfg=SpinFeatureConfig(surf_cap=1024),
                lc_cfg=LoopClosureConfig(enabled=False), graph_capacity=32,
                dtype=jnp.float32, mesh=mesh_arg)

        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = spinning_pattern(n_rings=R, n_cols=360)
        n = 8
        imu = simulate_imu(traj, 0.0, (n + 2) * PERIOD, rate=200.0)
        sys_one, sys_mesh = build(None), build(mesh)
        for s in (sys_one, sys_mesh):
            s.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                       np.asarray(imu.gyrs))
        for k in range(n):
            scan = simulate_scan(world, traj, k * PERIOD, pattern,
                                 period=PERIOD)
            args = (np.asarray(scan.pts).reshape(R, 360, 3),
                    np.asarray(scan.valid).reshape(R, 360),
                    np.asarray(scan.rel_time).reshape(R, 360), k * PERIOD)
            sys_one.process_scan(*args)
            sys_mesh.process_scan(*args)
        assert len(sys_one.kf_stamps) == len(sys_mesh.kf_stamps) >= 2
        n_kf = len(sys_one.kf_stamps)
        t1 = np.asarray(sys_one.graph.t[:n_kf])
        t2 = np.asarray(sys_mesh.graph.t[:n_kf])
        err = np.linalg.norm(t1 - t2, axis=1)
        assert err.max() < 0.05, f"mesh trajectory diverged: {err}"
