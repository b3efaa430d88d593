"""Livox eigen-patch feature extraction on synthetic Horizon-style scans
(SURVEY.md §4 golden-trace strategy: planes → surf with correct normals,
poles → edges)."""
import jax.numpy as jnp
import numpy as np
import pytest

from lili_om_tpu.ops.features_livox import (
    LivoxFeatureConfig,
    bin_livox_image,
    extract_features_livox,
)
from lili_om_tpu.sim.lidar import livox_pattern, simulate_scan
from lili_om_tpu.sim.trajectory import static_trajectory
from lili_om_tpu.sim.world import make_room_world


def _extract(world):
    traj = static_trajectory((0.0, 0.0, 1.0))
    pattern = livox_pattern(pts_per_line=2000)
    scan = simulate_scan(world, traj, 0.0, pattern, period=0.1, min_range=0.5)
    cfg = LivoxFeatureConfig(n_cols=2000)
    curv = scan.reflectivity * 0.1  # FormatConvert packing (:19-21)
    img, img_curv, img_valid = bin_livox_image(
        scan.pts, scan.line, scan.rel_time, curv, scan.valid, cfg)
    feats = extract_features_livox(img, img_curv, img_valid, cfg)
    return scan, feats, cfg


@pytest.fixture(scope="module")
def livox_scan_features():
    return _extract(make_room_world(n_poles=12, seed=3))


@pytest.fixture(scope="module")
def livox_single_wall_features():
    # a single huge wall facing the sensor: every patch lies on one plane, so
    # surf normals are unambiguous (room corners/junctions legitimately pass
    # the reference's weak λ₀ < 0.28·λ₁ unnormalized-scatter gate with mixed
    # normals — same as the C++ extractor)
    from lili_om_tpu.sim.world import WorldBuilder

    w = WorldBuilder().add_plane((30.0, 0.0, 1.0), (-1, 0, 0), (0, 1, 0), 60.0, 40.0).build()
    return _extract(w)


class TestLivoxBinning:
    def test_image_occupancy(self, livox_scan_features):
        scan, feats, cfg = livox_scan_features
        assert int(feats.full_mask.sum()) > 2000

    def test_depth_gates(self, livox_scan_features):
        scan, feats, cfg = livox_scan_features
        pts = np.asarray(feats.full_pts[np.asarray(feats.full_mask)])
        d = np.linalg.norm(pts, axis=1)
        assert d.min() >= cfg.min_depth
        assert d.max() <= cfg.max_depth


class TestLivoxFeatures:
    def test_surf_found_with_valid_normals(self, livox_scan_features):
        _, feats, _ = livox_scan_features
        m = np.asarray(feats.surf_mask)
        assert m.sum() > 300, f"too few surf features: {m.sum()}"
        n = np.asarray(feats.surf_normal[m])
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)

    def test_surf_normals_match_walls(self, livox_single_wall_features):
        """On a single-plane world every surf normal must equal the wall
        normal (the λ₀ eigenvector of a planar patch)."""
        _, feats, _ = livox_single_wall_features
        m = np.asarray(feats.surf_mask)
        assert m.sum() >= 100
        nrm = np.asarray(feats.surf_normal[m])
        align = np.abs(nrm[:, 0])
        assert np.median(align) > 0.99
        assert (align > 0.9).mean() > 0.9

    def test_edges_exist_and_unit_directions(self, livox_scan_features):
        _, feats, _ = livox_scan_features
        m = np.asarray(feats.edge_mask)
        assert m.sum() > 5, f"no edges found: {m.sum()}"
        d = np.asarray(feats.edge_dir[m])
        np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)

    def test_edge_directions_vertical_on_poles(self, livox_scan_features):
        """Pole edges are vertical cylinders → direction ≈ ±z."""
        _, feats, _ = livox_scan_features
        m = np.asarray(feats.edge_mask)
        d = np.asarray(feats.edge_dir[m])
        vert = np.abs(d[:, 2])
        # majority of edge picks should be near-vertical
        assert np.median(vert) > 0.7, f"median |dz| = {np.median(vert)}"

    def test_surf_excludes_edge_cells(self, livox_scan_features):
        _, feats, _ = livox_scan_features
        sm = np.asarray(feats.surf_mask)
        em = np.asarray(feats.edge_mask)
        spts = set(map(tuple, np.asarray(feats.surf_pts[sm]).round(6)))
        epts = [tuple(p) for p in np.asarray(feats.edge_pts[em]).round(6)]
        overlap = sum(1 for p in epts if p in spts)
        assert overlap == 0
