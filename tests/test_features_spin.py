"""Golden-trace tests for the spinning-LiDAR feature extractor: synthetic
scenes with known geometry → features must land on poles/edges and planes
(SURVEY.md §4 'golden-trace tests')."""
import jax
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.ops import features_spin as fs
from lili_om_tpu.sim import lidar, trajectory as tj, world as w
from lili_om_tpu.utils import math as m

R, C = 16, 900


def make_scan(world, pos=(0.0, 0.0, 1.0)):
    pat = lidar.spinning_pattern(n_rings=R, n_cols=C)
    traj = tj.static_trajectory(pos)
    scan = lidar.simulate_scan(world, lambda t: traj(t), 0.0, pat)
    img = scan.pts.reshape(R, C, 3)
    valid = scan.valid.reshape(R, C)
    rel = scan.rel_time.reshape(R, C)
    return img, valid, rel


def dist_to_poles(pts_world, world):
    base = np.asarray(world.cyl_base)
    axis = np.asarray(world.cyl_axis)
    d = pts_world[:, None, :] - base[None, :, :]
    along = (d * axis[None]).sum(-1)
    perp = d - along[..., None] * axis[None]
    return np.linalg.norm(perp, axis=-1).min(axis=1)


def dist_to_planes(pts_world, world):
    n = np.asarray(world.plane_normal)
    c = np.asarray(world.plane_center)
    u, v = np.asarray(world.plane_u), np.asarray(world.plane_v)
    h = np.asarray(world.plane_half)
    d = pts_world[:, None, :] - c[None]
    dn = np.abs((d * n[None]).sum(-1))
    inside = (np.abs((d * u[None]).sum(-1)) <= h[None, :, 0] + 0.3) & (
        np.abs((d * v[None]).sum(-1)) <= h[None, :, 1] + 0.3)
    dn = np.where(inside, dn, np.inf)
    return dn.min(axis=1), np.sort(dn, axis=1)


def test_edges_land_on_poles_or_junctions():
    world = w.make_corridor_world()
    img, valid, rel = make_scan(world, pos=(5.0, 0.0, 1.0))
    feats = fs.extract_features_spin(img, valid, rel)
    em = np.asarray(feats.edge_mask)
    assert em.sum() > 20, "expected edge features in a pole-lined corridor"
    pts = np.asarray(feats.edge_pts)[em] + np.array([5.0, 0.0, 1.0])
    dp = dist_to_poles(pts, world)
    _, dsorted = dist_to_planes(pts, world)
    near_pole = dp < 0.6
    near_junction = dsorted[:, 1] < 0.35  # close to TWO planes simultaneously
    frac = (near_pole | near_junction).mean()
    assert frac > 0.8, f"only {frac:.2%} of edges near poles/junctions"


def test_surf_points_lie_on_planes():
    world = w.make_corridor_world()
    img, valid, rel = make_scan(world, pos=(5.0, 0.0, 1.0))
    feats = fs.extract_features_spin(img, valid, rel)
    sm = np.asarray(feats.surf_mask)
    assert sm.sum() > 500
    pts = np.asarray(feats.surf_pts)[sm] + np.array([5.0, 0.0, 1.0])
    dmin, _ = dist_to_planes(pts, world)
    # voxel centroids of a 0.6 leaf can sit slightly off-plane
    frac = (dmin < 0.15).mean()
    assert frac > 0.9, f"only {frac:.2%} of surf points on planes"


def test_flat_points_avoid_edges():
    world = w.make_corridor_world()
    img, valid, rel = make_scan(world, pos=(5.0, 0.0, 1.0))
    feats = fs.extract_features_spin(img, valid, rel)
    fm = np.asarray(feats.flat_mask)
    assert fm.sum() > 50
    pts = np.asarray(feats.flat_pts)[fm] + np.array([5.0, 0.0, 1.0])
    dp = dist_to_poles(pts, world)
    assert (dp > 0.5).mean() > 0.95
    dmin, _ = dist_to_planes(pts, world)
    assert (dmin < 0.05).mean() > 0.95


def test_feature_counts_respect_caps():
    world = w.make_room_world()
    img, valid, rel = make_scan(world)
    cfg = fs.SpinFeatureConfig()
    feats = fs.extract_features_spin(img, valid, rel, cfg)
    # per (ring,sector) caps
    em = np.asarray(feats.edge_mask).reshape(R, cfg.n_sectors, cfg.max_less_sharp)
    assert feats.edge_pts.shape == (R * cfg.n_sectors * cfg.max_less_sharp, 3)
    sm = np.asarray(feats.sharp_mask).reshape(R, cfg.n_sectors, cfg.max_less_sharp)
    assert sm.sum(axis=-1).max() <= cfg.max_sharp
    fm = np.asarray(feats.flat_mask).reshape(R, cfg.n_sectors, cfg.max_flat)
    assert fm.shape[-1] == cfg.max_flat


def test_edge_picks_are_spaced():
    """NMS must keep same-sector picks ≥ suppress_radius apart (the greedy
    suppression guarantee, ROT Preprocessing.cpp:434-451)."""
    world = w.make_room_world()
    img, valid, rel = make_scan(world)
    cfg = fs.SpinFeatureConfig()
    curv, ok = fs.curvature_image(img, valid)
    cand = fs._local_extremum(curv, ok & (curv > cfg.edge_thres), cfg.suppress_radius, "max")
    cnp = np.asarray(cand)
    curv_np = np.asarray(curv)
    for r in range(R):
        cols = np.where(cnp[r])[0]
        if len(cols) < 2:
            continue
        gaps = np.diff(cols)
        # adjacent candidates closer than the radius must be exact ties
        for a, b in zip(cols[:-1], cols[1:]):
            if b - a <= cfg.suppress_radius:
                assert curv_np[r, a] == curv_np[r, b]


def test_integrate_gyro_constant_rate():
    wvec = jnp.array([0.1, -0.2, 0.3])
    n = 20
    dts = jnp.full((n,), 0.005)
    gyrs = jnp.tile(wvec, (n, 1))
    q = fs.integrate_gyro(dts, gyrs)
    np.testing.assert_allclose(m.log_so3(q), wvec * 0.1, atol=1e-8)


def test_undistort_recovers_static_geometry():
    """Rolling sensor: raw floor points acquire off-plane error from the
    in-sweep rotation; slerp undistortion with the true scan rotation must
    put them back on the floor plane (z = −1.5)."""
    world = w.make_corridor_world()
    roll_rate = 0.6  # rad/s about x

    def traj(t):
        return jnp.stack([0.0 * t + 5.0, 0.0 * t, 0.0 * t + 1.0]), m.exp_so3(
            jnp.stack([roll_rate * t, 0.0 * t, 0.0 * t]))

    pat = lidar.spinning_pattern(n_rings=R, n_cols=C)
    scan = lidar.simulate_scan(world, traj, 0.0, pat, period=0.1)
    q_scan = m.exp_so3(jnp.array([roll_rate * 0.1, 0.0, 0.0]))
    und = fs.undistort(scan.pts, scan.rel_time, q_scan)

    # world position of each point using the SCAN-START pose (R=I, p)
    p0 = np.array([5.0, 0.0, 1.0])
    raw_w = np.asarray(scan.pts) + p0
    und_w = np.asarray(und) + p0
    late = np.asarray(scan.valid) & (np.asarray(scan.rel_time) > 0.5)
    # floor points: those the undistorted cloud puts near z=-1.5
    floor = late & (np.abs(und_w[:, 2] + 1.5) < 0.3) & (np.abs(raw_w[:, 1]) > 1.0)
    assert floor.sum() > 100
    err_und = np.abs(und_w[floor, 2] + 1.5)
    err_raw = np.abs(raw_w[floor, 2] + 1.5)
    assert np.median(err_und) < 0.2 * np.median(err_raw)


class TestTranslationDeskew:
    def test_deskew_recovers_static_world(self):
        """A sensor moving at constant velocity scans a fixed world point at
        time fraction s: the measured sensor-frame point is p_s = x − s·v·T.
        Deskew with t_scan = +v·T must recover the scan-start coordinates."""
        import jax.numpy as jnp

        from lili_om_tpu.ops.features_spin import undistort

        v_T = jnp.array([0.3, 0.1, 0.0])  # motion over one sweep (body frame)
        x0 = jnp.array([[10.0, 2.0, 1.0], [5.0, -3.0, 0.5]])  # start-frame coords
        s = jnp.array([0.25, 0.8])
        measured = x0 - s[:, None] * v_T[None, :]  # no rotation in this test
        q_id = jnp.array([1.0, 0.0, 0.0, 0.0])
        out = undistort(measured, s, q_id, t_scan=v_T)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-7)


class TestPerRingDownsample:
    def test_rings_never_merge(self):
        """The reference filters each ring separately (ROT Preprocessing.cpp
        :494-508): identical xy points on two different rings must survive as
        two output points under per_ring_ds, and merge under the global
        downsample."""
        import jax.numpy as jnp
        import numpy as np

        from lili_om_tpu.ops.features_spin import (SpinFeatureConfig,
                                                   extract_features_spin)

        R, C = 4, 120
        img = np.zeros((R, C, 3))
        valid = np.zeros((R, C), bool)
        # two rings with the SAME planar points (would share voxels globally)
        xs = np.linspace(3.0, 9.0, C)
        for r in (0, 2):
            img[r, :, 0] = xs
            img[r, :, 1] = 2.0
            img[r, :, 2] = 0.05 * r  # within one 0.6 voxel of each other
            valid[r, :] = True
        rel = np.tile(np.linspace(0, 0.999, C)[None], (R, 1))
        cfg = SpinFeatureConfig(surf_cap=512, per_ring_ds=True)
        fc = extract_features_spin(jnp.asarray(img), jnp.asarray(valid),
                                   jnp.asarray(rel), cfg)
        n_pr = int(jnp.sum(fc.surf_mask))
        cfg_g = cfg._replace(per_ring_ds=False)
        fc_g = extract_features_spin(jnp.asarray(img), jnp.asarray(valid),
                                     jnp.asarray(rel), cfg_g)
        n_gl = int(jnp.sum(fc_g.surf_mask))
        assert n_pr == 2 * n_gl, (n_pr, n_gl)
        # per-ring points keep their ring's z
        zs = np.unique(np.round(np.asarray(fc.surf_pts[np.asarray(fc.surf_mask)])[:, 2], 3))
        assert set(zs) == {0.0, 0.1}
