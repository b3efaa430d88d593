"""io: checkpoint/resume, PCD roundtrip, Livox adapters."""
import os

import jax.numpy as jnp
import numpy as np

from lili_om_tpu.io.checkpoint import load_system, save_system
from lili_om_tpu.io.livox import convert_internal_imu, pack_custom_points, unpack_points
from lili_om_tpu.io.pcd import read_pcd, write_pcd
from lili_om_tpu.utils.math import quat_rotate


class TestPcd:
    def test_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
        inten = np.arange(100, dtype=np.float32)
        p = str(tmp_path / "map.pcd")
        write_pcd(p, pts, inten)
        back = read_pcd(p)
        np.testing.assert_allclose(back[:, :3], pts, rtol=1e-6)
        np.testing.assert_allclose(back[:, 3], inten, rtol=1e-6)


class TestLivoxAdapters:
    def test_pack_unpack_roundtrip(self):
        rng = np.random.default_rng(1)
        n = 1000
        xyz = rng.normal(size=(n, 3))
        line = rng.integers(0, 6, n)
        offset = rng.uniform(0, 0.1, n)
        refl = rng.uniform(1, 250, n)
        _, inten, curv = pack_custom_points(xyz, line, offset, refl, 0.1)
        l2, ratio, c2 = unpack_points(inten, curv)
        np.testing.assert_array_equal(l2, line)
        np.testing.assert_allclose(ratio, offset / 0.1, atol=1e-5)
        np.testing.assert_allclose(c2, 0.1 * refl, rtol=1e-5)

    def test_internal_imu_conversion(self):
        # tilted static IMU: accel reads R^T·(0,0,g) in g units
        from lili_om_tpu.utils.math import exp_so3, quat_conj

        q_true = exp_so3(jnp.array([0.15, -0.1, 0.0]))  # roll+pitch only
        g_body = np.asarray(quat_rotate(quat_conj(q_true), jnp.array([0.0, 0.0, 1.0])))
        accs_g = np.tile(g_body, (5, 1))
        gyrs = np.zeros((5, 3))
        accs, _, q0 = convert_internal_imu(accs_g, gyrs)
        np.testing.assert_allclose(np.linalg.norm(accs[0]), 9.8, rtol=1e-6)
        # the synthesized orientation must re-align gravity with +z
        up = np.asarray(quat_rotate(jnp.asarray(q0), jnp.asarray(g_body)))
        np.testing.assert_allclose(up, [0, 0, 1], atol=1e-6)


class TestCheckpoint:
    def test_roundtrip_preserves_state(self, tmp_path):
        from lili_om_tpu.models.fusion import FusionConfig
        from lili_om_tpu.models.odometry import OdometryConfig
        from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig
        from lili_om_tpu.ops.features_spin import SpinFeatureConfig

        def fresh():
            return LiliOmSystem(
                odo_cfg=OdometryConfig(n_recent_frames=4, scan_cap=256, query_cap=128, map_cap=512),
                fusion_cfg=FusionConfig(window=3, local_map_width=4, kf_surf_cap=256,
                                        kf_edge_cap=64, map_surf_cap=512, map_edge_cap=128,
                                        use_reflectivity=False, max_num_iter=2, imu_cap=16),
                feat_cfg=SpinFeatureConfig(surf_cap=256),
                lc_cfg=LoopClosureConfig(),
                graph_capacity=16,
                dtype=jnp.float64,
            )

        sys_ = fresh()
        # mutate some state
        sys_.odo_state = sys_.odo_state._replace(t=jnp.array([1.0, 2.0, 3.0]))
        sys_.fusion_state = sys_.fusion_state._replace(
            kf_count=jnp.asarray(5, jnp.int32))
        sys_.kf_stamps = [0.1, 0.4]
        sys_.kf_positions = [np.zeros(3), np.ones(3)]
        sys_.kf_clouds = [np.zeros((10, 3)), np.ones((7, 3))]
        sys_.n_frames = 9
        sys_.trajectory = [np.zeros(3)] * 9

        p = str(tmp_path / "ckpt.npz")
        save_system(p, sys_)
        sys2 = fresh()
        load_system(p, sys2)
        np.testing.assert_allclose(np.asarray(sys2.odo_state.t), [1.0, 2.0, 3.0])
        assert int(sys2.fusion_state.kf_count) == 5
        assert sys2.kf_stamps == [0.1, 0.4]
        assert len(sys2.kf_clouds) == 2 and sys2.kf_clouds[1].shape == (7, 3)
        assert sys2.n_frames == 9


class TestMapExport:
    def test_export_map_writes_pcd(self, tmp_path):
        import jax.numpy as jnp
        from lili_om_tpu.models.fusion import FusionConfig
        from lili_om_tpu.models.odometry import OdometryConfig
        from lili_om_tpu.models.pose_graph import add_node
        from lili_om_tpu.models.system import LiliOmSystem, LoopClosureConfig
        from lili_om_tpu.ops.features_spin import SpinFeatureConfig

        sys_ = LiliOmSystem(
            odo_cfg=OdometryConfig(n_recent_frames=4, scan_cap=256, query_cap=128, map_cap=512),
            fusion_cfg=FusionConfig(window=3, local_map_width=4, kf_surf_cap=256,
                                    kf_edge_cap=64, map_surf_cap=512, map_edge_cap=128,
                                    use_reflectivity=False, max_num_iter=2, imu_cap=16),
            feat_cfg=SpinFeatureConfig(surf_cap=256),
            lc_cfg=LoopClosureConfig(), graph_capacity=16, dtype=jnp.float64,
        )
        rng = np.random.default_rng(0)
        for i in range(2):
            t = jnp.asarray([float(i), 0.0, 0.0])
            sys_.graph = add_node(sys_.graph, t, jnp.array([1.0, 0, 0, 0.0]))
            sys_.kf_stamps.append(0.1 * i)
            sys_.kf_positions.append(np.asarray(t))
            sys_.kf_clouds.append(rng.normal(size=(50, 3)))
        p = str(tmp_path / "global_map.pcd")
        n = sys_.export_map(p)
        assert n > 0
        back = read_pcd(p)
        assert back.shape[0] == n
