"""Round-4 additions: the reference's ``if_to_deskew`` republish option
(LidarOdometry.cpp:624-632 + config yaml ``lidar_odometry/if_to_deskew``) —
per-point sweep times carried on the feature clouds and the ratio·rel_trans
re-skew of the clouds handed to the backend."""
import jax.numpy as jnp
import numpy as np

from lili_om_tpu.models.system import LiliOmSystem, _reskew
from lili_om_tpu.ops import features_livox as fl
from lili_om_tpu.ops import features_spin as fs
from lili_om_tpu.sim import lidar, trajectory as tj, world as w
from lili_om_tpu.utils.config import load_config

R, C = 16, 900


def _scan(world, pos=(5.0, 0.0, 1.0)):
    pat = lidar.spinning_pattern(n_rings=R, n_cols=C)
    traj = tj.static_trajectory(pos)
    scan = lidar.simulate_scan(world, lambda t: traj(t), 0.0, pat)
    return (scan.pts.reshape(R, C, 3), scan.valid.reshape(R, C),
            scan.rel_time.reshape(R, C))


def test_reskew_is_ratio_times_trans():
    """p' = p + clip(ratio,0,1)·trans — undistortion with the identity
    quaternion (LidarOdometry.cpp:628-632 passes quat(1,0,0,0))."""
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)))
    rel = jnp.asarray(np.linspace(-0.2, 1.3, 64))  # includes the clip range
    trans = jnp.asarray([0.5, -0.25, 0.1])
    out = np.asarray(_reskew(pts, rel, trans))
    expect = np.asarray(pts) + np.clip(np.asarray(rel), 0, 1)[:, None] * np.asarray(trans)
    np.testing.assert_allclose(out, expect, rtol=1e-12)


def test_spin_carry_rel_time():
    """carry_rel_time=True emits surf (voxel-averaged) and edge (gathered)
    sweep times consistent with the scan's azimuth clock; default stays
    None (hot path unchanged)."""
    world = w.make_corridor_world()
    img, valid, rel = _scan(world)
    base = fs.extract_features_spin(img, valid, rel)
    assert base.surf_rel_time is None and base.edge_rel_time is None

    cfg = fs.SpinFeatureConfig(carry_rel_time=True)
    feats = fs.extract_features_spin(img, valid, rel, cfg)
    # identical geometry to the default config
    np.testing.assert_array_equal(np.asarray(feats.surf_mask),
                                  np.asarray(base.surf_mask))
    np.testing.assert_allclose(np.asarray(feats.surf_pts),
                               np.asarray(base.surf_pts), atol=1e-12)

    sm = np.asarray(feats.surf_mask)
    srt = np.asarray(feats.surf_rel_time)
    assert srt.shape == sm.shape
    assert (srt[sm] >= 0).all() and (srt[sm] <= 1).all()
    # the sim's rel_time is the azimuth fraction: a voxel's averaged time
    # must agree with its centroid azimuth (voxels are small → ~equal)
    pts = np.asarray(feats.surf_pts)[sm]
    az = (np.arctan2(pts[:, 1], pts[:, 0]) % (2 * np.pi)) / (2 * np.pi)
    err = np.abs(az - srt[sm])
    err = np.minimum(err, 1 - err)  # azimuth wrap
    assert np.quantile(err, 0.95) < 0.02, f"p95 rel-time err {np.quantile(err, 0.95)}"

    em = np.asarray(feats.edge_mask)
    ert = np.asarray(feats.edge_rel_time)
    epts = np.asarray(feats.edge_pts)[em]
    eaz = (np.arctan2(epts[:, 1], epts[:, 0]) % (2 * np.pi)) / (2 * np.pi)
    eerr = np.abs(eaz - ert[em])
    eerr = np.minimum(eerr, 1 - eerr)
    assert np.quantile(eerr, 0.95) < 0.01


def test_livox_rel_time_from_columns():
    """Livox extractor rel times = column/(H−1) (the column IS the time bin,
    bin_livox_image)."""
    rng = np.random.default_rng(1)
    n = 4000
    cfg = fl.LivoxFeatureConfig(n_cols=500)
    ratio = rng.uniform(0, 1, n)
    line = rng.integers(0, cfg.n_lines, n)
    # a wall at x=10 so patches are planar
    y = (ratio - 0.5) * 8.0
    z = (line.astype(float) - 2.5) * 0.4
    pts = np.stack([np.full(n, 10.0), y, z], 1)
    curv = np.full(n, 1.0)
    img, img_curv, img_valid = fl.bin_livox_image(
        jnp.asarray(pts, jnp.float32), jnp.asarray(line, jnp.int32),
        jnp.asarray(ratio, jnp.float32), jnp.asarray(curv, jnp.float32),
        jnp.ones(n, bool), cfg)
    feats = fl.extract_features_livox(img, img_curv, img_valid, cfg)
    assert feats.surf_rel_time is not None
    sm = np.asarray(feats.surf_mask)
    assert sm.sum() > 100
    srt = np.asarray(feats.surf_rel_time)[sm]
    # recover the truth: surf points are image cells; their y coordinate
    # encodes the ratio by construction
    sy = np.asarray(feats.surf_pts)[sm][:, 1]
    truth = sy / 8.0 + 0.5
    np.testing.assert_allclose(srt, truth, atol=2.0 / (cfg.n_cols - 1))


def test_system_if_to_deskew_shifts_backend_clouds():
    """With if_to_deskew on, the archived keyframe surf cloud is the
    baseline cloud shifted by ratio·rel_trans (keyframes after the first,
    whose rel_trans is nonzero under motion)."""
    cfg = load_config("synthetic")
    assert cfg.if_to_deskew is False  # every shipped config has it false

    def run(flag):
        sys_ = LiliOmSystem(odo_cfg=cfg.odometry, fusion_cfg=cfg.fusion,
                            feat_cfg=cfg.spin_features, lc_cfg=cfg.loop_closure,
                            noise=cfg.imu_noise, dtype=jnp.float32)
        sys_.if_to_deskew = flag
        world = w.make_room_world()
        traj = tj.circle_trajectory(radius=6.0, period=30.0)
        pat = lidar.spinning_pattern(n_rings=R, n_cols=C)
        for k in range(4):
            t = k * 0.1
            imu = tj.simulate_imu(traj, max(t - 0.1, 0.0), t, rate=200.0)
            sys_.push_imu(imu.stamps, imu.accs, imu.gyrs)
            scan = lidar.simulate_scan(world, traj, t, pat, period=0.1)
            sys_.process_scan(scan.pts.reshape(R, C, 3),
                              scan.valid.reshape(R, C),
                              scan.rel_time.reshape(R, C), t)
        return sys_

    s_off = run(False)
    s_on = run(True)
    assert len(s_on.kf_clouds) == len(s_off.kf_clouds) >= 2
    # keyframe 1+: moving → rel_trans nonzero → clouds must differ, and by
    # no more than |rel_trans| per point
    a = s_on._kf_cloud_np(1)
    b = s_off._kf_cloud_np(1)
    assert a.shape == b.shape
    d = np.linalg.norm(a - b, axis=1)
    assert d.max() > 1e-4, "if_to_deskew had no effect"
    speed = 2 * np.pi * 6.0 / 30.0  # m/s on the circle
    assert d.max() <= speed * 0.1 + 1e-3, "shift exceeds one sweep's motion"
