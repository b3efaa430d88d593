"""LiDAR scan-pattern simulators: spinning (Velodyne-style) and Livox
Horizon-style non-repetitive patterns.

Each simulated point is cast from the sensor's *instantaneous* pose along the
trajectory, so the output clouds carry real motion distortion — exercising
the undistortion paths (LiLi-OM/src/Preprocessing.cpp:104-127,
LiLi-OM-ROT/src/Preprocessing.cpp:153-177) honestly.

Output metadata mirrors the reference's packing:
* spinning: ring id + relative time in [0,1) of the 0.1 s sweep
  (``intensity = scanID + 0.1·relTime``, ROT Preprocessing.cpp:349-368);
* Livox: line id 0..5 + time ratio (``intensity = line + 0.1·ratio``,
  FormatConvert.cpp:19-21) and a reflectivity channel.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.math import quat_mul, quat_normalize, quat_rotate
from .world import World, ray_cast


class ScanPattern(NamedTuple):
    dirs: jnp.ndarray  # (K,3) unit ray directions, sensor frame
    rel_time: jnp.ndarray  # (K,) in [0,1): fraction of the scan period
    line: jnp.ndarray  # (K,) int32 ring / scan-line id


class Scan(NamedTuple):
    """One simulated sweep, fixed shape (K points, invalid masked)."""

    pts: jnp.ndarray  # (K,3) points in the sensor frame at measurement time
    rel_time: jnp.ndarray  # (K,)
    line: jnp.ndarray  # (K,) int32
    reflectivity: jnp.ndarray  # (K,)
    valid: jnp.ndarray  # (K,) bool
    stamp: jnp.ndarray  # () scan start time


def spinning_pattern(n_rings: int = 16, n_cols: int = 1800,
                     elev_min_deg: float = -15.0, elev_max_deg: float = 15.0,
                     dtype=jnp.float32) -> ScanPattern:
    """Classic spinning pattern: rings × azimuth columns, one full 2π sweep
    per scan period. HDL-64 ≈ (64, -24.8, 2.0); VLP-16 ≈ (16, ±15)."""
    elev = jnp.deg2rad(jnp.linspace(elev_min_deg, elev_max_deg, n_rings, dtype=dtype))
    az = jnp.linspace(0.0, 2.0 * np.pi, n_cols, endpoint=False, dtype=dtype)
    el_g, az_g = jnp.meshgrid(elev, az, indexing="ij")  # (R,C)
    ce = jnp.cos(el_g)
    dirs = jnp.stack([ce * jnp.cos(az_g), ce * jnp.sin(az_g), jnp.sin(el_g)], axis=-1)
    rel = jnp.broadcast_to(az / (2.0 * np.pi), (n_rings, n_cols))
    line = jnp.broadcast_to(jnp.arange(n_rings, dtype=jnp.int32)[:, None], (n_rings, n_cols))
    return ScanPattern(dirs.reshape(-1, 3), rel.reshape(-1).astype(dtype), line.reshape(-1))


def livox_pattern(n_lines: int = 6, pts_per_line: int = 4000,
                  fov_h_deg: float = 81.7, fov_v_deg: float = 25.1,
                  f_fast: float = 50.0, f_slow: float = 7.3, period: float = 0.1,
                  dtype=jnp.float32) -> ScanPattern:
    """Livox-Horizon-like non-repetitive rosette: each of the 6 lines traces
    an incommensurate Lissajous sweep of the 81.7°×25.1° FOV, points ordered
    in time along each line (what FormatConvert's offset_time encodes)."""
    t = jnp.linspace(0.0, 1.0, pts_per_line, endpoint=False, dtype=dtype)  # fraction of period
    li = jnp.arange(n_lines, dtype=dtype)
    phase = 2.0 * np.pi * li / n_lines
    tt = t[None, :] * period
    # all 6 beams share the azimuth sweep (they are vertically stacked and
    # move together — required for the reference's 6-line × 6-column patch
    # statistics, LiLi-OM/src/Preprocessing.cpp:270-298)
    az = jnp.deg2rad(fov_h_deg / 2) * jnp.sin(2 * np.pi * f_fast * tt) * jnp.ones_like(phase[:, None])
    band = jnp.deg2rad(fov_v_deg) * ((li + 0.5) / n_lines - 0.5)
    el = band[:, None] + jnp.deg2rad(fov_v_deg / (2 * n_lines)) * jnp.sin(
        2 * np.pi * f_slow * tt + 2.3 * phase[:, None]
    )
    ce = jnp.cos(el)
    dirs = jnp.stack([ce * jnp.cos(az), ce * jnp.sin(az), jnp.sin(el)], axis=-1)  # (L,P,3)
    rel = jnp.broadcast_to(t[None, :], (n_lines, pts_per_line))
    line = jnp.broadcast_to(jnp.arange(n_lines, dtype=jnp.int32)[:, None], (n_lines, pts_per_line))
    return ScanPattern(dirs.reshape(-1, 3), rel.reshape(-1), line.reshape(-1))


def simulate_scan(world: World, traj, t_start: float, pattern: ScanPattern,
                  period: float = 0.1, min_range: float = 0.5, max_range: float = 150.0,
                  t_sl=None, q_sl=None) -> Scan:
    """Cast one sweep. Each ray originates at the sensor pose at its own
    timestamp; the returned point is expressed in the sensor frame *at that
    instant* (raw distorted cloud, like real hardware).

    ``t_sl, q_sl``: optional sensor-in-body extrinsic (body←sensor).
    """
    stamps = t_start + pattern.rel_time * period
    ps, qs = jax.vmap(lambda ts: traj(ts))(stamps)
    qs = quat_normalize(qs)
    if t_sl is not None:
        ps = ps + quat_rotate(qs, jnp.asarray(t_sl, ps.dtype))
        qs = quat_normalize(quat_mul(qs, jnp.asarray(q_sl, qs.dtype)))

    dirs_world = quat_rotate(qs, pattern.dirs)
    rng = ray_cast(world, ps, dirs_world, min_range=min_range, max_range=max_range)
    valid = jnp.isfinite(rng)
    rng_safe = jnp.where(valid, rng, 1.0)
    pts = pattern.dirs * rng_safe[:, None]
    # synthetic reflectivity: range-dependent + line-dependent, in (0.05, 25.45)
    # to pass the reference's curvature gate (LiLi-OM/src/Preprocessing.cpp:259-261)
    refl = 5.0 + 10.0 / (1.0 + rng_safe / 20.0) + 0.3 * pattern.line.astype(pts.dtype)
    return Scan(pts=pts, rel_time=pattern.rel_time, line=pattern.line,
                reflectivity=refl, valid=valid, stamp=jnp.asarray(t_start, pts.dtype))
