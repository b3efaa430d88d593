"""Pallas kNN kernel vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.ops.knn import knn
from lili_om_tpu.ops.knn_pallas import (knn_pallas, knn_pallas_counted,
                                         knn_pallas_pruned)


class TestKnnPallas:
    def test_matches_xla_knn(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (300, 3), jnp.float32) * 5
        p = jax.random.normal(jax.random.PRNGKey(1), (3000, 3), jnp.float32) * 5
        d_ref, i_ref = knn(q.astype(jnp.float64), p.astype(jnp.float64), k=5)
        d_pl, i_pl = knn_pallas(q, p, k=5, q_block=128, tile_p=512, interpret=True)
        # the kernel packs the lane index into the low 12 mantissa bits of
        # each distance (one integer min-reduction per extraction pass), so
        # returned distances are truncated to 2^-12 relative and neighbor
        # selection may swap within that band — tolerance 1e-3 rel
        np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                                   rtol=1e-3, atol=1e-4)
        # indices may differ on near-ties; check distances through indices
        gathered = jnp.sum((q[:, None, :] - p[i_pl]) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(gathered), np.asarray(d_ref),
                                   rtol=1e-3, atol=1e-4)

    def test_mask_respected(self):
        q = jnp.zeros((4, 3), jnp.float32)
        p = jnp.stack([jnp.arange(512, dtype=jnp.float32)] * 3, axis=1) / 100.0
        mask = jnp.arange(512) % 2 == 0  # odd points masked out
        d, i = knn_pallas(q, p, k=5, p_mask=mask, q_block=128, tile_p=256, interpret=True)
        assert np.all(np.asarray(i) % 2 == 0)

    def test_insufficient_neighbors_idx_zero(self):
        """Contract parity with ops/knn.py:76 — when a query has fewer than
        k valid map points, the surplus slots return d=+inf AND idx=0 (never
        the lane index of a masked/padded point)."""
        pts = jnp.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0],
                         [9, 9, 9], [8, 8, 8]], jnp.float32)
        mask = jnp.array([True, True, True, False, False])
        q = jnp.array([[0.1, 0, 0], [5.0, 5, 5]], jnp.float32)
        d, i = knn_pallas(q, pts, k=5, p_mask=mask, q_block=128, tile_p=256,
                          interpret=True)
        d, i = np.asarray(d), np.asarray(i)
        assert np.all(~np.isfinite(d[:, 3:]))
        assert np.all(i[:, 3:] == 0)
        assert np.all(i[:, :3] < 3)  # finite slots never reference masked pts

    def test_padding_regions_never_match(self):
        q = jnp.zeros((10, 3), jnp.float32)  # → padded to 128
        p = jnp.ones((100, 3), jnp.float32)  # → padded to 256
        d, i = knn_pallas(q, p, k=5, q_block=128, tile_p=256, interpret=True)
        assert np.all(np.asarray(i) < 100)
        np.testing.assert_allclose(np.asarray(d), 3.0, rtol=1e-5)

    def test_far_from_origin_accuracy(self):
        """Regression: the matmul expansion ‖q‖²+‖p‖²−2q·p cancels
        catastrophically far from the origin — the TPU's default reduced-
        precision matmul (~2⁻¹² rel) turned into meters² of distance error
        at ±40 m coordinates (indices survived, metric gates did not).
        Guarded by re-centering + precision=HIGHEST in BOTH backends; this
        asserts sub-mm² fidelity vs float64 brute force at a 500 m offset
        (both backends, any device)."""
        rng = np.random.default_rng(7)
        q_np = (rng.uniform(-10, 10, (64, 3)) + 500.0).astype(np.float32)
        p_np = (rng.uniform(-10, 10, (512, 3)) + 500.0).astype(np.float32)
        d_true = np.sort(np.sum(
            (q_np[:, None].astype(np.float64) - p_np[None].astype(np.float64)) ** 2,
            axis=-1), axis=1)[:, :5]
        d_x, _ = knn(jnp.asarray(q_np), jnp.asarray(p_np), k=5)
        np.testing.assert_allclose(np.asarray(d_x), d_true, atol=2e-3)
        d_p, _ = knn_pallas(jnp.asarray(q_np), jnp.asarray(p_np), k=5,
                            q_block=128, tile_p=256, interpret=True)
        np.testing.assert_allclose(np.asarray(d_p), d_true, atol=2e-2)


class TestKnnPallasPruned:
    """Morton-sorted + bound-gated variant: distances must equal the dense
    kernel BIT FOR BIT; indices may differ only on truncated-distance ties
    (the 2⁻¹² class both kernels share)."""

    def _check(self, q, p, mask=None, **kw):
        d1, i1 = knn_pallas(q, p, k=5, p_mask=mask, q_block=128,
                            tile_p=kw.get("tile_p", 256), interpret=True)
        d2, i2 = knn_pallas_pruned(q, p, k=5, p_mask=mask, q_block=128,
                                   tile_p=kw.get("tile_p", 256),
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        # index mismatches only where another map point has the SAME
        # truncated distance (tie): re-derive each side's distance
        mm = np.asarray(i1) != np.asarray(i2)
        if mm.any():
            qn, pn = np.asarray(q, np.float64), np.asarray(p, np.float64)
            da = np.sum((qn[:, None] - pn[np.asarray(i1)]) ** 2, -1)
            db = np.sum((qn[:, None] - pn[np.asarray(i2)]) ** 2, -1)
            np.testing.assert_allclose(da[mm], db[mm], rtol=2e-3)
        return d2, i2

    def test_matches_dense(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.uniform(-30, 30, (300, 3)), jnp.float32)
        p = jnp.asarray(rng.uniform(-30, 30, (3000, 3)), jnp.float32)
        self._check(q, p)

    def test_masked_and_surface_data(self):
        rng = np.random.default_rng(4)
        # surface-concentrated map (the pruning-friendly case) + 30% masked
        p_np = rng.uniform(-20, 20, (2048, 3)).astype(np.float32)
        p_np[:700, 2] = 0.0  # floor
        p_np[700:1400, 0] = 20.0  # wall
        q = jnp.asarray(rng.uniform(-20, 20, (257, 3)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=2048) > 0.3)
        d, i = self._check(q, jnp.asarray(p_np), mask)
        assert np.all(np.asarray(mask)[np.asarray(i)[np.isfinite(np.asarray(d))]])

    def test_insufficient_neighbors_idx_zero(self):
        pts = jnp.array([[0.0, 0, 0], [1, 0, 0], [2, 0, 0],
                         [9, 9, 9], [8, 8, 8]], jnp.float32)
        mask = jnp.array([True, True, True, False, False])
        q = jnp.array([[0.1, 0, 0], [5.0, 5, 5]], jnp.float32)
        d, i = knn_pallas_pruned(q, pts, k=5, p_mask=mask, q_block=128,
                                 tile_p=256, interpret=True)
        d, i = np.asarray(d), np.asarray(i)
        assert np.all(~np.isfinite(d[:, 3:]))
        assert np.all(i[:, 3:] == 0)
        assert np.all(i[:, :3] < 3)

    def test_far_from_origin_accuracy(self):
        rng = np.random.default_rng(7)
        q_np = (rng.uniform(-10, 10, (64, 3)) + 500.0).astype(np.float32)
        p_np = (rng.uniform(-10, 10, (512, 3)) + 500.0).astype(np.float32)
        d_true = np.sort(np.sum(
            (q_np[:, None].astype(np.float64) - p_np[None].astype(np.float64)) ** 2,
            axis=-1), axis=1)[:, :5]
        d_p, _ = knn_pallas_pruned(jnp.asarray(q_np), jnp.asarray(p_np), k=5,
                                   q_block=128, tile_p=256, interpret=True)
        np.testing.assert_allclose(np.asarray(d_p), d_true, atol=2e-2)


class TestKnnPallasCounted:
    """Count-bounded variant: for valid queries the result must equal the
    dense kernel BIT FOR BIT (same tile order, same merge); skipped query
    blocks return (+inf, 0)."""

    def _check(self, q, p, p_mask=None, q_mask=None, tile_p=256):
        d1, i1 = knn_pallas(q, p, k=5, p_mask=p_mask, q_block=128,
                            tile_p=tile_p, interpret=True)
        d2, i2 = knn_pallas_counted(q, p, k=5, p_mask=p_mask, q_mask=q_mask,
                                    q_block=128, tile_p=tile_p,
                                    interpret=True)
        rows = (np.ones(q.shape[0], bool) if q_mask is None
                else np.asarray(q_mask))
        np.testing.assert_array_equal(np.asarray(d1)[rows],
                                      np.asarray(d2)[rows])
        np.testing.assert_array_equal(np.asarray(i1)[rows],
                                      np.asarray(i2)[rows])
        return d2, i2

    def test_full_fill_matches_dense(self):
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.uniform(-30, 30, (300, 3)), jnp.float32)
        p = jnp.asarray(rng.uniform(-30, 30, (3000, 3)), jnp.float32)
        self._check(q, p)

    def test_front_compacted_map(self):
        """The production case: valid map rows at the front, a long masked
        tail (here 10 of 16 tiles skippable)."""
        rng = np.random.default_rng(5)
        p_np = rng.uniform(-20, 20, (4096, 3)).astype(np.float32)
        mask = np.zeros(4096, bool)
        mask[:1500] = True
        q = jnp.asarray(rng.uniform(-20, 20, (200, 3)), jnp.float32)
        d, i = self._check(q, jnp.asarray(p_np), p_mask=jnp.asarray(mask))
        assert np.all(mask[np.asarray(i)[np.isfinite(np.asarray(d))]])

    def test_gapped_mask_still_exact(self):
        """A violated compaction promise must only cost speed: valid rows
        scattered with gaps, including one past the midpoint."""
        rng = np.random.default_rng(6)
        p_np = rng.uniform(-20, 20, (1024, 3)).astype(np.float32)
        mask = np.asarray(rng.uniform(size=1024) > 0.7)
        mask[900] = True  # force a late last-valid row
        self._check(jnp.asarray(rng.uniform(-20, 20, (100, 3)), np.float32),
                    jnp.asarray(p_np), p_mask=jnp.asarray(mask))

    def test_empty_query_blocks_skipped(self):
        """Blocks with no valid query return (+inf, 0); valid blocks match
        the dense kernel exactly (the fusion window layout: valid segments
        separated by whole empty blocks)."""
        rng = np.random.default_rng(7)
        q_np = rng.uniform(-10, 10, (512, 3)).astype(np.float32)
        qm = np.zeros(512, bool)
        qm[:100] = True   # block 0 partially valid
        qm[256:300] = True  # block 2 partially valid; blocks 1,3 empty
        p = jnp.asarray(rng.uniform(-10, 10, (700, 3)), jnp.float32)
        d, i = self._check(jnp.asarray(q_np), p, q_mask=jnp.asarray(qm))
        d, i = np.asarray(d), np.asarray(i)
        empty = slice(128, 256)
        assert np.all(~np.isfinite(d[empty]))
        assert np.all(i[empty] == 0)

    def test_empty_map(self):
        q = jnp.zeros((4, 3), jnp.float32)
        p = jnp.ones((512, 3), jnp.float32)
        d, i = knn_pallas_counted(q, p, k=5, p_mask=jnp.zeros((512,), bool),
                                  q_block=128, tile_p=256, interpret=True)
        assert np.all(~np.isfinite(np.asarray(d)))
        assert np.all(np.asarray(i) == 0)
