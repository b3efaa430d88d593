"""Device-mesh sharded kernels on the virtual 8-device CPU mesh — the same
shard_map programs that target a TPU pod slice (SURVEY.md §4 multi-host
strategy)."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops.knn import knn
from lili_om_tpu.parallel.sharded import (
    make_mesh,
    sharded_hessian_reduce,
    sharded_knn,
    sharded_scan_match_step,
)


class TestShardedKnn:
    def test_matches_single_device(self):
        mesh = make_mesh(8, axis="m")
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (64, 3)) * 5
        p = jax.random.normal(jax.random.PRNGKey(1), (1024, 3)) * 5
        pm = jnp.ones(1024, bool)
        d_ref, i_ref = knn(q, p, k=5, p_mask=pm)
        d_sh, i_sh = sharded_knn(mesh, q, p, pm, k=5)
        np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-9)
        np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))

    def test_masked_shards(self):
        mesh = make_mesh(8, axis="m")
        q = jnp.zeros((8, 3))
        p = jnp.tile(jnp.arange(800, dtype=jnp.float64)[:, None], (1, 3)) / 100.0
        pm = jnp.arange(800) % 3 != 0  # mask a third of the map
        d_ref, i_ref = knn(q, p, k=5, p_mask=pm)
        d_sh, i_sh = sharded_knn(mesh, q, p, pm, k=5)
        np.testing.assert_array_equal(np.asarray(i_sh), np.asarray(i_ref))


class TestShardedReduction:
    def test_hessian_reduce_matches_dense(self):
        mesh = make_mesh(8)
        key = jax.random.PRNGKey(2)
        J = jax.random.normal(key, (256, 6))
        r = jax.random.normal(jax.random.PRNGKey(3), (256,))
        H, g = sharded_hessian_reduce(mesh, J, r)
        np.testing.assert_allclose(np.asarray(H), np.asarray(J.T @ J), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g), np.asarray(J.T @ r), rtol=1e-10)


class TestShardedScanMatch:
    def test_converges_like_single_device(self):
        """The distributed GN step must recover a known small pose offset."""
        from lili_om_tpu.utils.math import pose_inverse, quat_normalize, quat_rotate

        mesh = make_mesh(8)
        key = jax.random.PRNGKey(4)
        # planar-ish structured map: three orthogonal walls
        n = 1024
        a = jax.random.uniform(key, (n // 2, 2), minval=-5.0, maxval=5.0)
        p1 = jnp.stack([a[:, 0], a[:, 1], jnp.zeros(n // 2)], axis=1)
        p2 = jnp.stack([a[:, 0], 5.0 * jnp.ones(n // 2), a[:, 1] + 5.0], axis=1)
        map_pts = jnp.concatenate([p1, p2])
        map_mask = jnp.ones(map_pts.shape[0], bool)

        t_true = jnp.array([0.1, -0.08, 0.12])
        q_true = quat_normalize(jnp.array([1.0, 0.01, -0.02, 0.015]))
        ti, qi = pose_inverse(t_true, q_true)
        scan = quat_rotate(jnp.broadcast_to(qi, (map_pts.shape[0], 4)), map_pts) + ti
        scan_mask = jnp.ones(scan.shape[0], bool)

        t, q, ncorr = sharded_scan_match_step(
            mesh, jnp.zeros(3), jnp.array([1.0, 0, 0, 0.0]),
            scan, scan_mask, map_pts, map_mask, n_iters=6)
        # plane fits over a sparse random sampling carry boundary bias at the
        # mm–cm level (same as the single-device path; see test_pose_graph)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=2e-2)
        assert int(ncorr) > 500
