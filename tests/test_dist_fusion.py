"""Distributed fusion step (GSPMD data-parallel shardings) vs single device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.models.fusion import FusionConfig, fusion_step, init_fusion_state
from lili_om_tpu.ops.preintegration import ImuNoise
from lili_om_tpu.parallel.dist_fusion import make_distributed_fusion, make_sharded_state
from lili_om_tpu.parallel.sharded import make_mesh

CFG = FusionConfig(window=3, local_map_width=4, kf_surf_cap=512, kf_edge_cap=128,
                   map_surf_cap=1024, map_edge_cap=256, use_reflectivity=False,
                   weight_gate=0.3, lidar_const=7.5, max_num_iter=2, imu_cap=16)
NOISE = ImuNoise()


def _inputs(key, dtype=jnp.float64):
    ks = jax.random.split(key, 3)
    sp = jax.random.normal(ks[0], (CFG.kf_surf_cap, 3), dtype) * 8
    ep = jax.random.normal(ks[1], (CFG.kf_edge_cap, 3), dtype) * 8
    dts = jnp.full((CFG.imu_cap,), 0.005, dtype)
    accs = jnp.zeros((CFG.imu_cap, 3), dtype).at[:, 2].set(NOISE.g_norm)
    gyrs = jnp.zeros((CFG.imu_cap, 3), dtype)
    return (sp, jnp.ones(CFG.kf_surf_cap, bool), jnp.zeros(CFG.kf_surf_cap, dtype),
            ep, jnp.ones(CFG.kf_edge_cap, bool),
            dts, accs, gyrs, jnp.ones(CFG.imu_cap, bool))


class TestDistributedFusion:
    def test_matches_single_device(self):
        mesh = make_mesh(8, axis="d")
        state_1 = init_fusion_state(CFG, NOISE, dtype=jnp.float64)
        state_n = make_sharded_state(mesh, CFG, NOISE, dtype=jnp.float64)
        warm_fn, _ = make_distributed_fusion(mesh, CFG, NOISE, warmup=True)
        main_fn, _ = make_distributed_fusion(mesh, CFG, NOISE, warmup=False)

        for k in range(4):
            args = _inputs(jax.random.PRNGKey(k))
            warm = k + 1 < CFG.window
            state_1, out_1 = fusion_step(state_1, *args, cfg=CFG, noise=NOISE,
                                         warmup=warm)
            fn = warm_fn if warm else main_fn
            state_n, out_n = fn(state_n, *args)

        np.testing.assert_allclose(np.asarray(out_n.t_latest),
                                   np.asarray(out_1.t_latest), atol=1e-8)
        np.testing.assert_allclose(np.asarray(out_n.q_latest),
                                   np.asarray(out_1.q_latest), atol=1e-8)
        assert int(out_n.n_surf_corr) == int(out_1.n_surf_corr)
