"""Voxel-hash-grid kNN vs brute force (exact within the cell radius)."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops.hashgrid import build_grid, hashgrid_knn
from lili_om_tpu.ops.knn import knn


class TestHashGrid:
    def test_matches_brute_within_gate(self):
        key = jax.random.PRNGKey(0)
        pts = jax.random.uniform(key, (5000, 3), minval=-20.0, maxval=20.0)
        mask = jnp.ones(5000, bool)
        q = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-18.0, maxval=18.0)
        cell = 1.0  # = the reference's kd_max_radius NN gate
        grid = build_grid(pts, mask, cell, n_buckets=16384, bucket_cap=16)
        d_g, i_g = hashgrid_knn(q, grid, k=5)
        d_b, i_b = knn(q, pts, k=5, p_mask=mask)
        # wherever brute-force neighbors are within the cell radius, the
        # grid must agree exactly (the pipeline gates at d² < cell²)
        within = np.asarray(d_b) < cell * cell
        np.testing.assert_allclose(
            np.asarray(d_g)[within], np.asarray(d_b)[within], rtol=1e-5, atol=1e-7)

    def test_masked_points_excluded(self):
        pts = jnp.tile(jnp.arange(100, dtype=jnp.float32)[:, None], (1, 3)) * 0.01
        mask = jnp.arange(100) % 2 == 0
        grid = build_grid(pts, mask, 1.0, n_buckets=1024, bucket_cap=64)
        d, i = hashgrid_knn(jnp.zeros((1, 3)), grid, k=5)
        assert np.all(np.asarray(i)[0] % 2 == 0)

    def test_empty_neighborhood(self):
        pts = jnp.full((10, 3), 100.0)
        grid = build_grid(pts, jnp.ones(10, bool), 1.0, n_buckets=512, bucket_cap=8)
        d, i = hashgrid_knn(jnp.zeros((2, 3)), grid, k=5)
        assert np.all(np.isinf(np.asarray(d)))

    def test_bucket_overflow_bounded(self):
        # 100 identical points overflow one bucket of cap 8: only 8 kept
        pts = jnp.zeros((100, 3))
        grid = build_grid(pts, jnp.ones(100, bool), 1.0, n_buckets=128, bucket_cap=8)
        assert int(grid.bucket_mask.sum()) == 8
