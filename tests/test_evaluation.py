"""Trajectory evaluation harness: TUM I/O roundtrip, association, Umeyama
alignment, ATE/RPE math."""
import numpy as np

from lili_om_tpu.utils.evaluation import (align_umeyama, associate, ate_rmse,
                                          export_tum, load_tum, rpe)


def _rot(axis, ang):
    axis = np.asarray(axis, float)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K


class TestTumIO:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        stamps = np.arange(10) * 0.1
        t = rng.normal(size=(10, 3))
        q = rng.normal(size=(10, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        p = str(tmp_path / "a.tum")
        export_tum(p, stamps, t, q)
        s2, t2, q2 = load_tum(p)
        np.testing.assert_allclose(s2, stamps, atol=1e-6)
        np.testing.assert_allclose(t2, t, atol=1e-6)
        np.testing.assert_allclose(q2, q, atol=1e-6)


class TestAssociation:
    def test_nearest_within_tol(self):
        est = np.array([0.0, 0.101, 0.2, 5.0])
        gt = np.arange(0.0, 1.0, 0.1)
        ie, ig = associate(est, gt, max_dt=0.02)
        np.testing.assert_array_equal(ie, [0, 1, 2])  # 5.0 unmatched
        np.testing.assert_array_equal(ig, [0, 1, 2])


class TestAlignment:
    def test_recovers_known_se3(self):
        rng = np.random.default_rng(1)
        gt = rng.normal(size=(50, 3)) * 5
        R = _rot([0.2, -0.5, 1.0], 0.7)
        t = np.array([3.0, -2.0, 1.0])
        est = (R.T @ (gt - t).T).T  # est = R⁻¹(gt − t) ⇒ gt = R·est + t
        s, R2, t2 = align_umeyama(est, gt)
        np.testing.assert_allclose(R2, R, atol=1e-10)
        np.testing.assert_allclose(t2, t, atol=1e-10)
        assert s == 1.0

    def test_ate_zero_after_alignment(self):
        rng = np.random.default_rng(2)
        stamps = np.arange(50) * 0.1
        gt = np.cumsum(rng.normal(size=(50, 3)), axis=0)
        R = _rot([0, 0, 1], 0.3)
        est = (R.T @ (gt - np.array([1.0, 2, 3])).T).T
        out = ate_rmse(stamps, est, stamps, gt, align=True)
        assert out["rmse"] < 1e-9
        out_raw = ate_rmse(stamps, est, stamps, gt, align=False)
        assert out_raw["rmse"] > 0.5

    def test_ate_measures_noise(self):
        rng = np.random.default_rng(3)
        stamps = np.arange(100) * 0.1
        gt = np.cumsum(rng.normal(size=(100, 3)), axis=0)
        est = gt + rng.normal(size=(100, 3)) * 0.05
        out = ate_rmse(stamps, est, stamps, gt, align=False)
        assert 0.03 < out["rmse"] < 0.15


class TestRpe:
    def test_drift_free_is_zero(self):
        stamps = np.arange(30) * 0.1
        t = np.cumsum(np.ones((30, 3)) * 0.1, axis=0)
        q = np.tile([1.0, 0, 0, 0], (30, 1))
        out = rpe(stamps, t, q, stamps, t, q, delta=5)
        assert out["rmse"] < 1e-12

    def test_linear_drift_detected(self):
        stamps = np.arange(30) * 0.1
        gt = np.cumsum(np.ones((30, 3)) * 0.1, axis=0)
        q = np.tile([1.0, 0, 0, 0], (30, 1))
        est = gt + np.arange(30)[:, None] * np.array([0.01, 0, 0])
        out = rpe(stamps, est, q, stamps, gt, q, delta=5)
        np.testing.assert_allclose(out["rmse"], 0.05, atol=1e-9)
