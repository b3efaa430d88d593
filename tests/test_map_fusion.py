"""Map-sharded fusion (parallel/map_fusion.py): the keyframe ring buffer and
local map shard over the mesh; results must match the single-chip step when
no voxel spans two devices' keyframes (per-shard dedup == global dedup)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.fusion import FusionConfig, fusion_step, init_fusion_state
from lili_om_tpu.ops.preintegration import ImuNoise
from lili_om_tpu.parallel.map_fusion import (make_map_sharded_fusion,
                                             map_sharded_state_shardings)
from lili_om_tpu.parallel.sharded import make_mesh

N_DEV = 8


def _cfg():
    # caps sized so neither the global nor the per-shard voxel budgets
    # overflow — overflow keeps a capacity-ordered subset, which differs
    # between global and per-shard selection (documented divergence)
    return FusionConfig(window=3, local_map_width=8, kf_surf_cap=256,
                        kf_edge_cap=64, map_surf_cap=2048, map_edge_cap=1024,
                        use_reflectivity=False, weight_gate=0.3,
                        lidar_const=7.5, max_num_iter=2, imu_cap=16)


def _filled_state(cfg, noise, dtype):
    """A state whose 8 keyframe slots hold well-separated plane patches —
    each slot's voxels are disjoint from every other slot's."""
    rng = np.random.default_rng(0)
    st = init_fusion_state(cfg, noise, dtype=dtype)
    M, Sc, Ec = cfg.local_map_width, cfg.kf_surf_cap, cfg.kf_edge_cap
    hs = np.zeros((M, Sc, 3))
    hm = np.zeros((M, Sc), bool)
    he = np.zeros((M, Ec, 3))
    hem = np.zeros((M, Ec), bool)
    ht = np.zeros((M, 3))
    for i in range(M):
        base = np.array([10.0 * i, 0.0, 0.0])  # 10 m apart, 0.4 leaf
        pts = base + np.stack([rng.uniform(0, 2, Sc), rng.uniform(0, 2, Sc),
                               0.02 * rng.standard_normal(Sc)], axis=1)
        hs[i] = pts
        hm[i] = True
        epts = base + np.stack([rng.uniform(0, 1, Ec),
                                np.full(Ec, 1.0), rng.uniform(0, 2, Ec)], axis=1)
        he[i] = epts
        hem[i] = True
        ht[i] = base * 0.0  # clouds already in "world" via the offset
    return st._replace(
        hist_surf=jnp.asarray(hs, dtype), hist_surf_mask=jnp.asarray(hm),
        hist_edge=jnp.asarray(he, dtype), hist_edge_mask=jnp.asarray(hem),
        hist_t=jnp.asarray(ht, dtype), hist_valid=jnp.ones((M,), bool),
        kf_count=jnp.asarray(M, jnp.int32),
    )


def _scan_inputs(cfg, dtype, seed=5):
    """New scan overlapping keyframe slot 0's plane patch (window poses are
    identity, so body == world here)."""
    rng = np.random.default_rng(seed)
    sp = jnp.asarray(np.stack([rng.uniform(0, 2, cfg.kf_surf_cap),
                               rng.uniform(0, 2, cfg.kf_surf_cap),
                               0.02 * rng.standard_normal(cfg.kf_surf_cap)],
                              axis=1), dtype)
    sm = jnp.ones((cfg.kf_surf_cap,), bool)
    sr = jnp.zeros((cfg.kf_surf_cap,), dtype)
    ep = jnp.asarray(np.stack([rng.uniform(0, 1, cfg.kf_edge_cap),
                               np.full(cfg.kf_edge_cap, 1.0),
                               rng.uniform(0, 2, cfg.kf_edge_cap)], axis=1), dtype)
    em = jnp.ones((cfg.kf_edge_cap,), bool)
    dts = jnp.full((cfg.imu_cap,), 0.005, dtype)
    noise = ImuNoise()
    accs = jnp.zeros((cfg.imu_cap, 3), dtype).at[:, 2].set(noise.g_norm)
    gyrs = jnp.zeros((cfg.imu_cap, 3), dtype)
    vm = jnp.ones((cfg.imu_cap,), bool)
    return sp, sm, sr, ep, em, dts, accs, gyrs, vm


class TestMapShardedFusion:
    @pytest.fixture(scope="class")
    def mesh(self):
        assert len(jax.devices()) >= N_DEV
        return make_mesh(N_DEV, axis="kf")

    def test_matches_single_chip(self, mesh):
        cfg = _cfg()
        noise = ImuNoise()
        dtype = jnp.float64
        st = _filled_state(cfg, noise, dtype)
        args = _scan_inputs(cfg, dtype)

        # rebuild=True: the directly-filled ring has no incremental-table
        # history, so the single-chip reference batch-builds its maps from
        # the ring — the same source the sharded match phase uses
        st1, out1 = fusion_step(st, *args, cfg=cfg, noise=noise, rebuild=True)

        fn, st_sh = make_map_sharded_fusion(mesh, cfg, noise)
        st_d = jax.device_put(st, st_sh)
        st2, out2 = fn(st_d, *args)

        np.testing.assert_allclose(np.asarray(out1.t_latest),
                                   np.asarray(out2.t_latest), atol=1e-9)
        np.testing.assert_allclose(np.asarray(out1.q_latest),
                                   np.asarray(out2.q_latest), atol=1e-10)
        assert int(out1.n_surf_corr) == int(out2.n_surf_corr)
        assert int(out1.n_edge_corr) == int(out2.n_edge_corr)
        np.testing.assert_allclose(np.asarray(st1.t), np.asarray(st2.t), atol=1e-9)
        # the match phase is bit-identical (verified); the GN solve +
        # marginalization accumulate in GSPMD-partitioned reduction order,
        # so the linearized prior matches to reduction-order noise only
        np.testing.assert_allclose(np.asarray(st1.prior.r0),
                                   np.asarray(st2.prior.r0), atol=5e-7)

    def test_correspondences_found(self, mesh):
        """The sharded search must actually produce correspondences (not an
        empty-gate pass)."""
        cfg = _cfg()
        noise = ImuNoise()
        st = _filled_state(cfg, noise, jnp.float64)
        args = _scan_inputs(cfg, jnp.float64)
        fn, st_sh = make_map_sharded_fusion(mesh, cfg, noise)
        _, out = fn(jax.device_put(st, st_sh), *args)
        assert int(out.n_surf_corr) > 50

    def test_warmup_variant_runs(self, mesh):
        cfg = _cfg()
        noise = ImuNoise()
        st = init_fusion_state(cfg, noise, dtype=jnp.float64)
        args = _scan_inputs(cfg, jnp.float64)
        fn, st_sh = make_map_sharded_fusion(mesh, cfg, noise, warmup=True)
        st2, out = fn(jax.device_put(st, st_sh), *args)
        assert np.all(np.isfinite(np.asarray(out.t_latest)))
        assert int(st2.kf_count) == 1


class TestSystemMeshMode:
    def test_system_runs_with_mesh(self):
        """LiliOmSystem(mesh=...) drives the map-sharded fusion end-to-end."""
        from lili_om_tpu.models.odometry import OdometryConfig
        from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig
        from lili_om_tpu.ops.features_spin import SpinFeatureConfig
        from lili_om_tpu.sim.lidar import simulate_scan, spinning_pattern
        from lili_om_tpu.sim.trajectory import circle_trajectory, simulate_imu
        from lili_om_tpu.sim.world import make_room_world

        R, C, PERIOD = 16, 360, 0.1
        mesh = make_mesh(N_DEV, axis="kf")
        cfg = FusionConfig(window=3, local_map_width=8, kf_surf_cap=1024,
                           kf_edge_cap=256, map_surf_cap=2048, map_edge_cap=512,
                           use_reflectivity=False, max_num_iter=2, imu_cap=32)
        sys_ = LiliOmSystem(
            odo_cfg=OdometryConfig(n_recent_frames=4, scan_cap=1024,
                                   query_cap=256, map_cap=2048),
            fusion_cfg=cfg, feat_cfg=SpinFeatureConfig(surf_cap=1024),
            lc_cfg=LoopClosureConfig(enabled=False), graph_capacity=32,
            dtype=jnp.float32, mesh=mesh)
        world = make_room_world()
        traj = circle_trajectory(radius=8.0, period=40.0)
        pattern = spinning_pattern(n_rings=R, n_cols=C)
        imu = simulate_imu(traj, 0.0, 8 * PERIOD, rate=200.0)
        sys_.push_imu(np.asarray(imu.stamps), np.asarray(imu.accs),
                      np.asarray(imu.gyrs))
        for k in range(6):
            s = simulate_scan(world, traj, k * PERIOD, pattern, period=PERIOD)
            sys_.process_scan(np.asarray(s.pts).reshape(R, C, 3),
                              np.asarray(s.valid).reshape(R, C),
                              np.asarray(s.rel_time).reshape(R, C), k * PERIOD)
        assert sys_.n_frames == 6
        assert len(sys_.kf_stamps) >= 2
        assert np.all(np.isfinite(np.asarray(sys_.fusion_state.t)))
