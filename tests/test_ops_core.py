"""Tests for kNN, plane/line fitting, and voxel downsampling."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops import fitting, knn, voxel


def brute_knn_np(q, p, k, p_mask=None):
    d = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    if p_mask is not None:
        d[:, ~np.asarray(p_mask)] = np.inf
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_knn_exact_vs_numpy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(257, 3)).astype(np.float64)
    p = rng.normal(size=(5000, 3)).astype(np.float64)
    d_ref, i_ref = brute_knn_np(q, p, 5)
    d, i = knn.knn(jnp.asarray(q), jnp.asarray(p), k=5, tile_p=1024)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-9)
    # indices can differ on exact ties; check distances via gathered points
    g = np.asarray(p)[np.asarray(i)]
    d_check = ((q[:, None, :] - g) ** 2).sum(-1)
    np.testing.assert_allclose(d_check, d_ref, atol=1e-9)


def test_knn_respects_point_mask():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(64, 3))
    p = rng.normal(size=(1000, 3))
    p_mask = rng.random(1000) > 0.5
    d_ref, _ = brute_knn_np(q, p, 5, p_mask)
    d, i = knn.knn(jnp.asarray(q), jnp.asarray(p), k=5, p_mask=jnp.asarray(p_mask), tile_p=256)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-9)
    assert np.all(np.asarray(p_mask)[np.asarray(i)])


def test_knn_more_k_than_points():
    p = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
    q = jnp.array([[0.1, 0.0, 0.0]])
    d, i = knn.knn(q, p, k=5, tile_p=8)
    assert np.isfinite(np.asarray(d[0, :2])).all()
    assert np.isinf(np.asarray(d[0, 2:])).all()


def test_fit_plane_exact():
    # points on plane z = 3 → normal ±z, n·x + d = 0 with n=(0,0,-1), d=3 scaled
    rng = np.random.default_rng(2)
    xy = rng.normal(size=(10, 5, 2))
    pts = np.concatenate([xy, np.full((10, 5, 1), 3.0)], axis=-1)
    fit = fitting.fit_plane(jnp.asarray(pts), jnp.ones((10, 5), bool), dist_thres=0.05)
    assert np.all(np.asarray(fit.valid))
    n = np.asarray(fit.normal)
    d = np.asarray(fit.d)
    # plane eq: n·x + d = 0 for all points
    res = np.abs((pts * n[:, None, :]).sum(-1) + d[:, None])
    assert res.max() < 1e-6
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-9)


def test_fit_plane_rejects_nonplanar():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(20, 5, 3))  # random blobs
    fit = fitting.fit_plane(jnp.asarray(pts), jnp.ones((20, 5), bool), dist_thres=0.05)
    assert np.asarray(fit.valid).mean() < 0.2


def test_fit_plane_weighted_pulls_towards_heavy_points():
    # 4 points on z=0, 1 outlier at z=1 with tiny weight → plane ≈ z=0
    pts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0.5, 0.5, 1.0]]], float)
    w = jnp.array([[1.0, 1.0, 1.0, 1.0, 1e-4]])
    fit = fitting.fit_plane(jnp.asarray(pts) + jnp.array([0.0, 0.0, 2.0]), jnp.ones((1, 5), bool),
                            dist_thres=10.0, weights=w)
    n = np.asarray(fit.normal)[0]
    assert abs(n[2]) > 0.99


def test_fit_line():
    t = np.linspace(-1, 1, 5)
    d = np.array([1.0, 2.0, -1.0])
    d /= np.linalg.norm(d)
    pts = (t[:, None] * d[None, :])[None] + np.array([5.0, -2.0, 1.0])
    pts = np.repeat(pts, 3, axis=0) + np.random.default_rng(4).normal(size=(3, 5, 3)) * 1e-3
    fit = fitting.fit_line(jnp.asarray(pts), jnp.ones((3, 5), bool))
    assert np.all(np.asarray(fit.valid))
    dirs = np.asarray(fit.direction)
    assert np.abs(dirs @ d).min() > 0.999


def test_fit_line_rejects_isotropic_plane_patch():
    # a square grid on a plane is isotropic (λ2 ≈ λ1) → not a line
    g = np.linspace(-1, 1, 3)
    gx, gy = np.meshgrid(g, g)
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(9)], axis=-1)[None]
    fit = fitting.fit_line(jnp.asarray(pts), jnp.ones((1, 9), bool), ratio_thres=3.0)
    assert not bool(fit.valid[0])


def test_voxel_downsample_centroids():
    pts = jnp.array([
        [0.05, 0.05, 0.05], [0.15, 0.05, 0.05],  # same voxel @ leaf 0.4
        [1.0, 1.0, 1.0], [1.1, 1.05, 1.02],      # same voxel
        [-3.0, 0.0, 0.0],
    ])
    mask = jnp.ones(5, bool)
    out, out_mask = voxel.voxel_downsample(pts, mask, 0.4, max_out=8)
    got = np.sort(np.asarray(out[out_mask]), axis=0)
    want = np.sort(np.array([[0.1, 0.05, 0.05], [1.05, 1.025, 1.01], [-3.0, 0.0, 0.0]]), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert int(out_mask.sum()) == 3


def test_voxel_downsample_respects_mask_and_cap():
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.uniform(-10, 10, size=(2000, 3)))
    mask = jnp.asarray(rng.random(2000) > 0.3)
    out, out_mask = voxel.voxel_downsample(pts, mask, 1.0, max_out=64)
    assert int(out_mask.sum()) == 64  # cap binds (20³ voxel candidates ≫ 64)
    out2, m2 = voxel.voxel_downsample(pts, jnp.zeros(2000, bool), 1.0, max_out=64)
    assert int(m2.sum()) == 0


def test_voxel_downsample_grouped_never_merges_across_groups():
    # identical xyz in two groups -> two output voxels, not one
    pts = jnp.array([[0.1, 0.1, 0.1], [0.12, 0.1, 0.1],
                     [0.1, 0.1, 0.1], [0.12, 0.1, 0.1]])
    groups = jnp.array([0, 0, 1, 1], jnp.int32)
    out, m = voxel.voxel_downsample(pts, jnp.ones(4, bool), 0.6, max_out=8,
                                    groups=groups)
    assert int(m.sum()) == 2
    np.testing.assert_allclose(np.asarray(out[m]),
                               [[0.11, 0.1, 0.1]] * 2, atol=1e-6)


def test_voxel_downsample_grouped_overflow_is_group_fair():
    """When voxel count exceeds max_out, drops are hash-ordered, i.e.
    ~proportional per group — group-major order would starve the last
    rings entirely (0 survivors)."""
    rng = np.random.default_rng(0)
    G, V = 8, 40  # 8 rings x 40 distinct voxels = 320 voxels, cap 64
    pts, groups = [], []
    for g in range(G):
        for v in range(V):
            pts.append([v * 2.0 + rng.uniform(0, 0.1), g * 0.01, 0.0])
            groups.append(g)
    pts = jnp.asarray(np.array(pts))
    groups = jnp.asarray(np.array(groups, np.int32))
    out, m = voxel.voxel_downsample(pts, jnp.ones(len(groups), bool), 1.0,
                                    max_out=64, groups=groups)
    assert int(m.sum()) == 64
    # recover each surviving voxel's group from its y coordinate
    got_groups = np.round(np.asarray(out[m])[:, 1] / 0.01).astype(int)
    counts = np.bincount(got_groups, minlength=G)
    # expected share 8/group (binomial mean); proportional fairness = every
    # group keeps a nontrivial share, none starved
    assert counts.min() >= 3, counts
    assert counts.max() <= 16, counts


def test_voxel_downsample_overflow_decimates_uniformly():
    """Capacity overflow must drop voxels spatially uniformly (hash order),
    not as a contiguous key-ordered chunk — key-ordered drops deleted whole
    regions of the room from keyframe clouds and broke loop-closure ICP."""
    # 40x40 grid of occupied voxels, cap keeps only a quarter
    xs, ys = np.meshgrid(np.arange(40), np.arange(40))
    pts = jnp.asarray(np.stack([xs.ravel() + 0.5, ys.ravel() + 0.5,
                                np.zeros(1600)], axis=1))
    out, m = voxel.voxel_downsample(pts, jnp.ones(1600, bool), 1.0, max_out=400)
    kept = np.asarray(out[m])
    assert len(kept) == 400
    # every 10x10 quadrant block must keep a fair share (~25 of 100)
    bx = (kept[:, 0] // 10).astype(int)
    by = (kept[:, 1] // 10).astype(int)
    counts = np.bincount(bx * 4 + by, minlength=16)
    assert counts.min() >= 10, counts  # uniform-ish; key order would give 0s


def test_voxel_downsample_grouped_invalid_points_ignored():
    pts = jnp.asarray(np.random.default_rng(1).uniform(-5, 5, (100, 3)))
    groups = jnp.asarray(np.arange(100, dtype=np.int32) % 4)
    mask = jnp.asarray(np.arange(100) % 2 == 0)
    out, m = voxel.voxel_downsample(pts, mask, 0.5, max_out=128, groups=groups)
    # only valid points contribute: rerun with invalid rows moved far away
    pts2 = jnp.where(mask[:, None], pts, 1e3)
    out2, m2 = voxel.voxel_downsample(pts2, mask, 0.5, max_out=128, groups=groups)
    got = np.sort(np.asarray(out[m]), axis=0)
    want = np.sort(np.asarray(out2[m2]), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def _scan_ordered_cloud(n=6000, rings=8, seed=11):
    """Synthetic organized sweep: per-ring azimuth-ordered points on a wavy
    wall (consecutive columns land in contiguous voxel runs, with range
    discontinuities that split runs and revisit voxels non-contiguously)."""
    rng = np.random.default_rng(seed)
    per = n // rings
    az = np.linspace(-1.2, 1.2, per)
    pts, ring_ids = [], []
    for r in range(rings):
        rad = 8.0 + 2.0 * np.sin(3 * az + r) + np.where(az > 0.7, 5.0, 0.0)
        z = 0.3 * r + 0.05 * np.sin(9 * az)
        pts.append(np.stack([rad * np.cos(az), rad * np.sin(az),
                             z + rng.normal(0, 0.01, per)], 1))
        ring_ids.append(np.full(per, r, np.int32))
    return (np.concatenate(pts), np.concatenate(ring_ids),
            rng.random(n) > 0.1)


def _centroid_set(out, mask):
    o = np.asarray(out)[np.asarray(mask)]
    return o[np.lexsort(o.T)]


def test_voxel_downsample_ordered_matches_exact():
    """The two-stage run-compressed kernel is EXACT: same centroids, same
    hash drop order as voxel_downsample (fp summation order aside)."""
    pts, rings, mask = _scan_ordered_cloud()
    p, m = jnp.asarray(pts), jnp.asarray(mask)
    for groups in (None, jnp.asarray(rings)):
        for max_out in (4096, 200):  # under and over capacity
            a = voxel.voxel_downsample(p, m, 0.6, max_out, groups=groups)
            b = voxel.voxel_downsample_ordered(p, m, 0.6, max_out,
                                               groups=groups)
            assert int(a[1].sum()) == int(b[1].sum())
            # same voxel set, same ORDER (identical hash drop ordering)
            np.testing.assert_allclose(np.asarray(a[0])[np.asarray(a[1])],
                                       np.asarray(b[0])[np.asarray(b[1])],
                                       atol=1e-5)


def test_voxel_downsample_ordered_feats_match():
    pts, rings, mask = _scan_ordered_cloud(3000, 4, seed=5)
    feats = np.linalg.norm(pts, axis=1, keepdims=True)
    a = voxel.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.5, 2048,
                               feats=jnp.asarray(feats))
    b = voxel.voxel_downsample_ordered(jnp.asarray(pts), jnp.asarray(mask),
                                       0.5, 2048, feats=jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))


def test_remove_close_points():
    pts = jnp.array([[0.05, 0, 0], [5.0, 0, 0], [jnp.nan, 0, 0]])
    m = voxel.remove_close_points(pts, jnp.ones(3, bool), 0.1)
    assert list(np.asarray(m)) == [False, True, False]


class TestMergeVoxelEntriesTiered:
    """Occupancy-adaptive merge must reproduce the full merge at every
    occupancy (tier hit, tier miss with valid rows beyond the tier, and
    full fallback); sums compare with fp tolerance (unstable-sort
    summation order), cells/counts/validity exactly."""

    def _make(self, occ, T=1024, D=256, seed=0):
        import numpy as np
        rng = np.random.default_rng(seed)
        cells_t = np.zeros((T, 3), np.int32)
        cells_t[:occ] = rng.integers(0, 30, (occ, 3))
        valid_t = np.zeros(T, bool)
        valid_t[:occ] = True
        sums_t = rng.normal(size=(T, 4)).astype(np.float32) * valid_t[:, None]
        cnt_t = (rng.integers(1, 5, T) * valid_t).astype(np.float32)
        cells_d = rng.integers(0, 30, (D, 3)).astype(np.int32)
        valid_d = rng.uniform(size=D) < 0.8
        sums_d = rng.normal(size=(D, 4)).astype(np.float32) * valid_d[:, None]
        cnt_d = (rng.integers(1, 3, D) * valid_d).astype(np.float32)
        return (jnp.asarray(np.concatenate([cells_t, cells_d])),
                jnp.asarray(np.concatenate([sums_t, sums_d])),
                jnp.asarray(np.concatenate([cnt_t, cnt_d])),
                jnp.asarray(np.concatenate([valid_t, valid_d])))

    @pytest.mark.parametrize("occ", [0, 50, 300, 900])
    def test_matches_full_merge(self, occ):
        from lili_om_tpu.ops.voxel import (merge_voxel_entries,
                                           merge_voxel_entries_tiered)
        cells, sums, cnt, valid = self._make(occ)
        T = 1024
        rng = np.random.default_rng(1)
        psel = jnp.asarray(rng.uniform(size=cells.shape[0]) < 0.7)
        ssel = jnp.asarray(rng.uniform(size=cells.shape[0]) < 0.5)
        ref = merge_voxel_entries(cells, sums, cnt, valid, T,
                                  second_sel=ssel, primary_sel=psel)
        out = merge_voxel_entries_tiered(cells, sums, cnt, valid, T, T,
                                         tiers=(256, 512),
                                         second_sel=ssel, primary_sel=psel)
        for r4, o4 in zip(ref, out):
            np.testing.assert_array_equal(np.asarray(r4[0]), np.asarray(o4[0]))
            np.testing.assert_allclose(np.asarray(r4[1]), np.asarray(o4[1]),
                                       rtol=2e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(r4[2]), np.asarray(o4[2]),
                                       atol=1e-5)
            np.testing.assert_array_equal(np.asarray(r4[3]), np.asarray(o4[3]))

    def test_no_selection_variant(self):
        from lili_om_tpu.ops.voxel import (merge_voxel_entries,
                                           merge_voxel_entries_tiered)
        cells, sums, cnt, valid = self._make(120)
        ref = merge_voxel_entries(cells, sums, cnt, valid, 1024)
        out = merge_voxel_entries_tiered(cells, sums, cnt, valid, 1024, 1024,
                                         tiers=(256,))
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(out[0]))
        np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(out[3]))
