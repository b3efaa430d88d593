"""Config presets mirror the reference's per-dataset YAMLs (7 Livox + 3 ROT)."""
import warnings

import pytest

from lili_om_tpu.utils.config import PRESETS, dump_config, load_config


class TestPresets:
    @pytest.mark.parametrize("name", sorted(PRESETS))
    def test_loads_and_dumps(self, name):
        cfg = load_config(name)
        assert cfg.variant in ("livox", "rot")
        s = dump_config(cfg)
        assert "fusion" in s

    def test_fr_iosb_values(self):
        cfg = load_config("fr_iosb")
        assert cfg.fusion.lidar_const == 20.0  # config_fr_iosb.yaml:18
        assert cfg.fusion.window == 3
        assert cfg.fusion.local_map_width == 40
        assert cfg.fusion.q_lb == (0.0, 0.0, 0.0, 1.0)

    def test_rot_imu_noise_from_config(self):
        cfg = load_config("utbm_rot")
        assert cfg.imu_noise.acc_n == 18.0  # config_utbm.yaml
        assert cfg.imu_noise.init_cov == 1e-3  # ROT Preintegration seed

    def test_internal_imu_extrinsic(self):
        cfg = load_config("fr_iosb_internal_imu")
        assert cfg.fusion.q_lb == (1.0, 0.0, 0.0, 0.0)

    def test_override_and_warn(self):
        cfg = load_config("fr_iosb", overrides={"fusion": {"local_map_width": 10}})
        assert cfg.fusion.local_map_width == 10
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            load_config("fr_iosb", overrides={"fusion": {"not_a_knob": 1}})
        assert len(w) == 1
