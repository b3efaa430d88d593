"""bench.py accounting helpers: the fill-dependent (effective) kNN model
must round valid counts up to the counted kernel's granularities
(q_block / tile_p, ops/knn_pallas.py:knn_pallas_counted) and clamp at the
static capacities the dense model assumes."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def _base_ks():
    return {
        "odometry_knn": (1.0, 2.0, "where"),
        "fusion_surf_knn": (3.0, 4.0, "where"),
        "other_row": (7.0, 8.0, "untouched"),
    }


def test_effective_rounds_up_to_granularity():
    ks = _base_ks()
    counts = {"odometry_knn": (100, 5000, 4096, 32768, 1)}
    eff = bench.effective_knn_accounting(ks, counts, pallas_knn=True,
                                         q_block=256, tile_p=4096, k=5)
    q_eff, p_eff = 256, 8192  # ceil(100/256)*256, ceil(5000/4096)*4096
    assert eff["odometry_knn"][0] == 6 * q_eff * p_eff
    assert eff["odometry_knn"][1] == 4 * (3 * q_eff + 3 * p_eff + 10 * q_eff)
    # non-kNN rows pass through untouched
    assert eff["other_row"] == ks["other_row"]
    assert eff["fusion_surf_knn"] == ks["fusion_surf_knn"]


def test_effective_clamps_at_capacity_and_scales_rounds():
    ks = _base_ks()
    # full fill: effective == dense capacity model (no discount)
    counts = {"odometry_knn": (4096, 32768, 4096, 32768, 3)}
    eff = bench.effective_knn_accounting(ks, counts, pallas_knn=True)
    assert eff["odometry_knn"][0] == 3 * 6 * 4096 * 32768
    # over-count (cannot happen, but the clamp must hold)
    counts = {"odometry_knn": (4097, 32769, 4096, 32768, 1)}
    eff = bench.effective_knn_accounting(ks, counts, pallas_knn=True)
    assert eff["odometry_knn"][0] == 6 * 4096 * 32768


def test_effective_xla_keeps_capacity_figures():
    """Only the Pallas counted kernel has fill-dependent work; the XLA tiled
    fallback computes the full capacity-shaped distance tile regardless of
    fill, so the effective model must NOT discount it (ADVICE r4)."""
    ks = _base_ks()
    counts = {"fusion_surf_knn": (256, 4096, 24576, 32768, 1)}
    eff = bench.effective_knn_accounting(ks, counts, pallas_knn=False, k=5)
    assert eff == ks
